package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational combinators backing the SURVEY.md §2 operator
  * inventory. Everything here is a pure `DataFrame => DataFrame` transform
  * built from Catalyst built-ins: predicate pushdown, column pruning and
  * whole-stage codegen all survive, and every shuffle is an explicit
  * `groupBy`/`join`/`Window` the optimizer can see.
  */
object Ops {

  /** OP-21/35/50/51 — idempotent incremental merge (`INSERT … ON CONFLICT DO
    * NOTHING`, db.py:792-830): append remote rows whose key is absent
    * locally. The anti-join shuffles on `keys` only after pruning the local
    * side to the key columns; at scale pass `broadcastLocalKeys = true` when
    * the local key set is small (e.g. a checksum ledger) to avoid shuffling
    * the remote fact table at all.
    */
  def antiJoinAppend(local: DataFrame, remote: DataFrame, keys: Seq[String],
                     broadcastLocalKeys: Boolean = false): DataFrame = {
    val localKeys0 = local.select(keys.map(col): _*).dropDuplicates(keys)
    val localKeys = if (broadcastLocalKeys) broadcast(localKeys0) else localKeys0
    local.unionByName(remote.join(localKeys, keys, "left_anti"))
  }

  /** OP-17 — conditional column overwrite (`UPDATE t SET c = v WHERE p`). */
  def conditionalOverwrite(df: DataFrame, column: String, cond: Column,
                           value: Column): DataFrame =
    df.withColumn(column, when(cond, value).otherwise(col(column)))

  /** OP-18 — predicate delete (`DELETE FROM t WHERE p`). */
  def predicateDelete(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** OP-18 variant — `DELETE … WHERE k IN (subquery)` as an anti-join. */
  def deleteInSubquery(df: DataFrame, keys: Seq[String],
                       victims: DataFrame): DataFrame =
    df.join(broadcast(victims.select(keys.map(col): _*).dropDuplicates(keys)),
      keys, "left_anti")

  /** OP-19 — truncate. */
  def truncate(df: DataFrame): DataFrame = df.limit(0)

  /** OP-16 — line-noise filter (db.py:832-840): drop blank lines and lines
    * starting with `NOTICE:`.
    */
  def cleanLines(df: DataFrame, lineCol: String): DataFrame =
    df.filter(trim(col(lineCol)) =!= "" &&
      !col(lineCol).startsWith("NOTICE:"))

  /** OP-20 — `ADD COLUMN IF NOT EXISTS new` backfilled from `from`. */
  def addColumnIfAbsent(df: DataFrame, name: String, from: Column): DataFrame =
    if (df.columns.contains(name)) df else df.withColumn(name, from)

  /** OP-29/24/32 — newest row per group (the `ls` top-1). One shuffle on the
    * partition keys; Catalyst plans a ranking-limit (window group limit) so
    * no full sort of each partition is materialized.
    */
  def latestPerGroup(df: DataFrame, partitionBy: Seq[String],
                     order: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(partitionBy.map(col): _*)
          .orderBy(order: _*)))
      .filter(col("__rn") === 1).drop("__rn")

  /** OP-31 — GC victims: everything except the newest per group. */
  def victimsPerGroup(df: DataFrame, partitionBy: Seq[String],
                      order: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(partitionBy.map(col): _*)
          .orderBy(order: _*)))
      .filter(col("__rn") > 1).drop("__rn")

  /** Widen an under-partitioned frame before per-row-heavy compute. Small
    * parquet inputs (one row group) arrive as a single partition, which
    * serializes expensive expression pipelines (hashing, shingling, vector
    * math) onto one core; at cluster scale inputs are already wide and this
    * is a no-op. Only repartitions when below `min` — never shrinks, never
    * shuffles an already-wide (100 TB) scan.
    *
    * Call on scan-level frames only: probing partitioning via `df.rdd`
    * finalizes the AQE plan, which EXECUTES any shuffle stages the frame
    * already contains — harmless on scans/filters/unions, eager (and
    * wasteful) on a frame with upstream exchanges.
    */
  def widen(df: DataFrame, min: Int = 0): DataFrame = {
    val target =
      if (min > 0) min else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** THE fixed-point rendering of a computed real — the one definition of
    * the oracle-compare representation rule: `floor(x·10ᵏ + 0.5)` as BIGINT.
    * Both engines hold bit-identical doubles and `floor` is exact on them;
    * DECIMAL-from-double (`round(x, k)`/CAST) proved engine-version-
    * sensitive (round 1: 11 hash mismatches). Every operator/probe emitting
    * a real goes through this (or mirrors it verbatim in oracle SQL) —
    * don't reintroduce per-site copies.
    */
  def fixedPoint(c: Column, digits: Int): Column =
    floor(c * lit(math.pow(10, digits)) + lit(0.5)).cast("long")

  /** Global 1-based rank over a total order — scale-safe. A bare
    * `row_number().over(Window.orderBy(…))` collapses the whole table into
    * ONE partition (Spark warns `No Partition Defined`), a single-task sort
    * that dies at 100×. Instead: range-repartition on the sort keys (ranges
    * are ordered, so partition i holds globally smaller rows than i+1),
    * rank within each range in parallel, then add per-range offsets. The
    * offsets come from a #partitions-row aggregate — the only narrow step,
    * bounded by partition count, broadcast back. `order` must be a total
    * order (include a unique tiebreak column) for a deterministic rank.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
                 rankName: String = "rank", numRanges: Int = 0): DataFrame = {
    val n = if (numRanges > 0) numRanges
            else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
    val within = ranged.withColumn("__r",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*))
        .cast("long"))
    // tiny frame: one row per range partition. Cumulative offsets via a
    // triangular self-join (≤ n² rows, n = partition count) rather than a
    // global window — keeps the whole plan free of single-partition windows.
    val counts = within.groupBy("__pid").agg(count(lit(1)).as("__c"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left_outer")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__c")), lit(0L)).as("__off"))
    within.join(broadcast(offsets), "__pid")
      .withColumn(rankName, col("__r") + col("__off"))
      .drop("__pid", "__r", "__off")
  }

  /** Salted equi-join for skewed keys: salt the skewed (left) side with a
    * random-free deterministic salt from a stable column, replicate the
    * build (right) side across `saltFactor` salt values, join on
    * (keys, salt). Turns one hot key's single straggler task into
    * `saltFactor` parallel tasks. AQE's skew-join handles moderate skew
    * automatically; this is the explicit tool for pathological keys.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int, saltBy: String): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** OP-37 — union of tagged slices where the highest-priority source wins
    * per key (dict-merge semantics, main.py:258-265).
    */
  def lastWins(slices: Seq[(DataFrame, Int)], keys: Seq[String],
               order: Seq[Column]): DataFrame = {
    val tagged = slices.map { case (df, pri) => df.withColumn("__src", lit(pri)) }
    val u = tagged.reduce(_ unionByName _)
    latestPerGroup(u, keys, col("__src").desc +: order).drop("__src")
  }
}
