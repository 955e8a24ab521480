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
    // pinned: the ranked frame feeds TWO branches (tie-min aggregate +
    // join), and this function's contract is run-to-run layout
    // determinism — the exact shape of the globalRank cross-branch
    // hazard (Ops.scala), so the rank table is materialized once
    val ranked = graft.core.Ops.globalRank(df, Seq(col(valueCol)),
      "__zrank", pinned = true)
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

  /** d-DIMENSIONAL Hilbert index (Skilling 2004, "Programming the Hilbert
    * curve" — the transpose-form algorithm): generalizes [[withHilbert]]
    * beyond 2-D, so a 3- or 4-column layout clusters on the no-long-jump
    * curve instead of falling back to Morton. Same unrolled-projection
    * discipline: the inverse-undo sweep is (bits−1)·d chained steps of
    * CASE/XOR/mask arithmetic, then the Gray fold, the parity twist, and
    * the MSB-first transpose interleave — all codegen'd, no UDF, no
    * shuffle. Bijectivity + grid-neighbor adjacency are property-tested
    * over full grids in LayoutSpec (the same pins as the 2-D form).
    */
  def withHilbertN(df: DataFrame, cols: Seq[String], outCol: String,
                   bits: Int): DataFrame = {
    val d = cols.size
    require(d >= 2, s"withHilbertN: need >= 2 dims (got $d)")
    require(bits > 0 && bits * d <= 62,
      s"withHilbertN: bits*dims (${bits * d}) must be <= 62")
    val mask = (1L << bits) - 1
    val names = (0 until d).map(i => s"__hx$i")
    var cur = df
    for ((c, i) <- cols.zipWithIndex)
      cur = cur.withColumn(names(i), col(c).cast("long").bitwiseAND(lit(mask)))
    def sel(updates: Map[String, Column]): Unit =
      cur = cur.select(cur.columns.map(cn =>
        updates.getOrElse(cn, col(cn)).as(cn)).toIndexedSeq: _*)
    // inverse undo
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until d) {
        val x0 = col(names.head); val xi = col(names(i))
        val cond = xi.bitwiseAND(lit(q)) =!= 0L
        if (i == 0)
          sel(Map(names.head ->
            when(cond, x0.bitwiseXOR(lit(p))).otherwise(x0)))
        else {
          val t = x0.bitwiseXOR(xi).bitwiseAND(lit(p))
          sel(Map(
            names.head -> when(cond, x0.bitwiseXOR(lit(p)))
              .otherwise(x0.bitwiseXOR(t)),
            names(i) -> when(cond, xi).otherwise(xi.bitwiseXOR(t))))
        }
      }
      q >>= 1
    }
    // Gray fold (sequential: each step reads the PREVIOUS step's output)
    for (i <- 1 until d)
      sel(Map(names(i) -> col(names(i)).bitwiseXOR(col(names(i - 1)))))
    // parity twist from the last axis
    var tExpr: Column = lit(0L)
    var qq = 1L << (bits - 1)
    while (qq > 1) {
      tExpr = when(col(names(d - 1)).bitwiseAND(lit(qq)) =!= 0L,
        tExpr.bitwiseXOR(lit(qq - 1))).otherwise(tExpr)
      qq >>= 1
    }
    cur = cur.withColumn("__ht", tExpr)
    cur = cur.select(cur.columns.map(cn =>
      if (names.contains(cn)) col(cn).bitwiseXOR(col("__ht")).as(cn)
      else col(cn)).toIndexedSeq: _*)
    // transpose interleave: bit j of axis i lands at j*d + (d-1-i)
    val terms = for { j <- 0 until bits; i <- 0 until d } yield
      shiftleft(shiftright(col(names(i)), j).bitwiseAND(lit(1L)),
        j * d + (d - 1 - i))
    cur.withColumn(outCol, terms.reduce(_ + _))
      .drop(names :+ "__ht": _*)
  }

  /** DuckDB rendering of [[withHilbertN]]: the same unroll as a CTE chain
    * over a base relation exposing `x0..x{d-1}` (already masked) and the
    * carried columns; the caller selects `hd` from `name_out`.
    */
  def hilbertNDuckCtes(baseName: String, name: String, bits: Int, d: Int,
                       carryCols: Seq[String]): String = {
    val carry = carryCols.mkString(", ")
    val xs = (0 until d).map(i => s"x$i")
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = baseName
    var idx = 0
    def cte(updates: Map[String, String]): Unit = {
      val colsSql = (carryCols ++ xs).map {
        case c if updates.contains(c) => s"${updates(c)} AS $c"
        case c => c
      }.mkString(", ")
      steps += s"${name}_$idx AS (SELECT $colsSql FROM $prev)"
      prev = s"${name}_$idx"; idx += 1
    }
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until d) {
        if (i == 0)
          cte(Map("x0" ->
            s"CASE WHEN (x0 & $q) <> 0 THEN xor(x0, $p) ELSE x0 END"))
        else {
          val t = s"(xor(x0, x$i) & $p)"
          cte(Map(
            "x0" -> s"CASE WHEN (x$i & $q) <> 0 THEN xor(x0, $p) ELSE xor(x0, $t) END",
            s"x$i" -> s"CASE WHEN (x$i & $q) <> 0 THEN x$i ELSE xor(x$i, $t) END"))
        }
      }
      q >>= 1
    }
    for (i <- 1 until d)
      cte(Map(s"x$i" -> s"xor(x$i, x${i - 1})"))
    val tSql = {
      var t = "CAST(0 AS BIGINT)"
      var qq = 1L << (bits - 1)
      while (qq > 1) {
        t = s"CASE WHEN (x${d - 1} & $qq) <> 0 THEN xor($t, ${qq - 1}) ELSE $t END"
        qq >>= 1
      }
      t
    }
    steps += s"${name}_tw AS (SELECT $carry, ${xs.mkString(", ")}, $tSql AS ht FROM $prev)"
    val twisted = xs.map(x => s"xor($x, ht) AS $x").mkString(", ")
    steps += s"${name}_tx AS (SELECT $carry, $twisted FROM ${name}_tw)"
    val terms = for { j <- 0 until bits; i <- 0 until d } yield
      s"((((x$i >> $j) & 1)) << ${j * d + (d - 1 - i)})"
    steps += s"${name}_out AS (SELECT $carry, ${terms.mkString(" + ")} AS hd FROM ${name}_tx)"
    steps.mkString(",\n")
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
