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

  /** Append a 2-D HILBERT-curve index column: the distance along the
    * order-`bits` Hilbert curve of the cell `(x, y)` (both masked to
    * `bits`, so out-of-range inputs wrap like [[zValue]]). The Hilbert
    * curve is the strictly-better space-filling curve for layout
    * clustering: unlike Morton order it has NO long jumps — consecutive
    * curve positions are always grid neighbors — so each output file's
    * bounding rectangle is tighter and a box predicate touches fewer
    * files (LayoutSpec measures Hilbert ≤ Z-order on the same workload;
    * it is what "liquid"-style lake clustering runs under the hood).
    *
    * Shape: the classic per-bit fold (Hilbert 1891 via the standard
    * xy2d rotation recurrence) unrolled into `bits` chained projections
    * of pure CASE/shift/mask arithmetic — codegen'd end to end, no UDF,
    * no shuffle. Each step is a named projection (not one nested
    * expression: the recurrence references its inputs 2-3× per step, so
    * a single expression tree would grow 3^bits nodes; named columns
    * keep it linear and Catalyst's collapse guard leaves multiply-
    * referenced non-trivial projections alone). Mirrored term-for-term
    * in DuckDB by [[hilbertDuckCtes]].
    */
  def withHilbert(df: DataFrame, xCol: String, yCol: String, outCol: String,
                  bits: Int = 16): DataFrame = {
    require(bits > 0 && 2 * bits <= 62,
      s"withHilbert: 2*bits (${2 * bits}) must be <= 62")
    val mask = (1L << bits) - 1
    var cur = df
      .withColumn("__hx", col(xCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hy", col(yCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn(outCol, lit(0L))
    val keep = df.columns.filterNot(c => c == "__hx" || c == "__hy" || c == outCol)
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("__hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), i).bitwiseAND(lit(1L))
      val d2 = col(outCol) + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      // rotation: ry=1 → identity; ry=0,rx=0 → swap; ry=0,rx=1 → negate+swap
      val nx = when(ry === 1L, col("__hx"))
        .when(rx === 0L, col("__hy"))
        .otherwise(lit(s - 1) - col("__hy"))
      val ny = when(ry === 1L, col("__hy"))
        .when(rx === 0L, col("__hx"))
        .otherwise(lit(s - 1) - col("__hx"))
      cur = cur.select(keep.map(col) ++
        Seq(nx.as("__hx"), ny.as("__hy"), d2.as(outCol)): _*)
    }
    cur.drop("__hx", "__hy")
  }

  /** DuckDB rendering of [[withHilbert]]: the same per-bit recurrence as
    * a chain of CTEs over a base relation that must expose `hx`, `hy`
    * (already masked), `hd` (initialized 0) and the carried columns.
    * Returns the CTE bodies
    * `name_{bits-1} .. name_0`; the caller selects `hd` from `name_0`.
    * Term-for-term the engine arithmetic, so the compare is exact.
    */
  def hilbertDuckCtes(baseName: String, name: String, bits: Int,
                      carryCols: Seq[String]): String = {
    val carry = carryCols.mkString(", ")
    val steps = for (i <- bits - 1 to 0 by -1) yield {
      val s = 1L << i
      val prev = if (i == bits - 1) baseName else s"${name}_${i + 1}"
      val rx = s"((hx >> $i) & 1)"
      val ry = s"((hy >> $i) & 1)"
      s"""${name}_$i AS (SELECT $carry,
         |  CASE WHEN $ry = 1 THEN hx WHEN $rx = 0 THEN hy
         |       ELSE ${s - 1} - hy END AS hx,
         |  CASE WHEN $ry = 1 THEN hy WHEN $rx = 0 THEN hx
         |       ELSE ${s - 1} - hx END AS hy,
         |  hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |  FROM $prev)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** Hilbert-order the frame for writing — [[zorderByRange]] with the
    * Hilbert index as the range key. Same cost (one range shuffle + an
    * in-partition sort); tighter per-file rectangles.
    */
  def hilbertByRange(df: DataFrame, xCol: String, yCol: String,
                     bits: Int = 16, numFiles: Int = 0,
                     keepH: Boolean = false): DataFrame = {
    val withH = withHilbert(df, xCol, yCol, "__h", bits)
    val parts = if (numFiles > 0) numFiles
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = withH.repartitionByRange(parts, col("__h"))
      .sortWithinPartitions("__h")
    if (keepH) ranged else ranged.drop("__h")
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
