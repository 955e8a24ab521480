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

  /** Rank-scale a column into [0, 2^bits): `floor(percent_rank * (2^bits
    * - 1) + 0.5)` over a GLOBAL order computed scale-safely (range
    * repartition + per-partition offsets — `Ops.globalRank`, no
    * single-partition window). Rank scaling (rather than min-max) makes
    * z-cells equi-populated under ANY marginal distribution — skew in a
    * raw column would otherwise crowd most rows into few cells and
    * reprod the one-dimension-sorted pathology.
    */
  def scaleToBits(df: DataFrame, valueCol: String, outCol: String,
                  bits: Int = 16): DataFrame = {
    val n = df.count()
    require(n > 0, "scaleToBits: empty input")
    val top = (1L << bits) - 1
    graft.core.Ops.globalRank(df, Seq(col(valueCol)), "__zrank")
      .withColumn(outCol,
        ((col("__zrank") - 1L) * top / math.max(n - 1L, 1L)).cast("long"))
      .drop("__zrank")
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
}
