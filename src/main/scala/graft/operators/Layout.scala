package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at the 100 TB design point.
  *
  * A parquet lake prunes at two granularities — files (via per-file
  * min/max stats in the table metadata) and row groups (via parquet
  * footer stats under predicate pushdown) — and BOTH only work if rows
  * that are close in predicate space are close in the layout. Sorting by
  * one column makes that column's ranges tight and every other column's
  * ranges full-width; Z-ORDERING interleaves the bits of several columns
  * so each file covers a small hyper-rectangle of the combined space, and
  * a box predicate on ANY subset of the dimensions intersects ~N^(1-1/d)
  * of N files instead of all of them. LayoutSpec measures exactly that
  * skipping ratio; SCALE.md records it.
  *
  * Everything is plain column arithmetic (shift/mask/or — codegen'd,
  * DuckDB-mirrorable for the oracle), one `repartitionByRange` shuffle,
  * and an in-partition sort: the same cost as any range-partitioned
  * write.
  */
object Layout {

  /** Morton (Z-order) value: interleave the low `bits` bits of each
    * column (col j's bit i lands at position `i*k + j` of the z-value).
    * Inputs must be non-negative after [[scaleToBits]] (or caller-scaled);
    * values are masked to `bits` so out-of-range inputs wrap rather than
    * collide across dimensions. `bits * cols.size` must fit a signed
    * 64-bit long.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue: at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"zValue: bits*dims (${bits * cols.size}) must be <= 63")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + j)
    terms.reduce(_ + _)
  }

  /** Rank-scale a column into [0, 2^bits): `floor((rank-1) · (2^bits-1)
    * / (n-1))` over a GLOBAL order computed scale-safely (range
    * repartition + per-partition offsets — `Ops.globalRank`, no
    * single-partition window). Rank scaling (rather than min-max) makes
    * z-cells equi-populated under ANY marginal distribution — skew in a
    * raw column would otherwise crowd most rows into few cells and
    * reproduce the one-dimension-sorted pathology.
    *
    * Equal input values get the SAME scaled cell (each value's rank is
    * collapsed to its minimum over the tie group): `globalRank` alone
    * ranks ties in arrival order, which would put two equal values in
    * different cells on different runs — a determinism leak into the
    * file layout. The collapse is one keyed min-aggregate + join, both
    * on the value column.
    */
  def scaleToBits(df: DataFrame, valueCol: String, outCol: String,
                  bits: Int = 16): DataFrame = {
    val n = df.count()
    require(n > 0, "scaleToBits: empty input")
    val top = (1L << bits) - 1
    val ranked = graft.core.Ops.globalRank(df, Seq(col(valueCol)), "__zrank")
    val tieMin = ranked.groupBy(col(valueCol).as("__zv"))
      .agg(min(col("__zrank")).as("__zmin"))
    ranked.join(tieMin, ranked(valueCol) <=> tieMin("__zv"))
      .withColumn(outCol,
        ((col("__zmin") - 1L) * top / math.max(n - 1L, 1L)).cast("long"))
      .drop("__zrank", "__zv", "__zmin")
  }

  /** Z-order the frame for writing: one range shuffle on the z-value into
    * `numFiles` output partitions, sorted within each so parquet row
    * groups inherit tight ranges too. Callers `.write` the result;
    * `keepZ = true` retains the z column (probes, diagnostics).
    */
  def zorderByRange(df: DataFrame, cols: Seq[String], bits: Int = 16,
                    numFiles: Int = 0, keepZ: Boolean = false): DataFrame = {
    val withZ = df.withColumn("__z", zValue(cols.map(col), bits))
    val parts = if (numFiles > 0) numFiles
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
    if (keepZ) ranged else ranged.drop("__z")
  }

  /** Write `df` as a BUCKETED table: rows pre-hash-partitioned on `keys`
    * into `buckets` files per partition and sorted within each bucket —
    * the shuffle an equi-join or aggregation on those keys would do at
    * runtime, paid ONCE at write time. Two tables bucketed the same way
    * join with NO exchange on either side (co-located sort-merge join);
    * PlanContractSpec pins exactly that. At 100 TB this is how the
    * hot-join fact tables (events by user, chunks by doc) are stored so
    * every downstream join/group on the key is shuffle-free.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable` —
    * Spark cannot express bucketing on a bare path); the in-memory
    * catalog works, no Hive needed.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
