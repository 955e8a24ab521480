package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central loaders for the driver testdata (TESTDATA.md).
  *
  * All probes read through here so scale-sensitive read settings live in one
  * place. `events.ts` has shipped in two encodings across testdata
  * generations: INT64 TIMESTAMP(NANOS) (read as a long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and, since round 7's regeneration,
  * plain `timestamp[us]`. [[events]] dispatches on the loaded column type and
  * normalizes both to a millisecond-truncated TIMESTAMP_NTZ (the determinism
  * rule from SURVEY.md §2.11 — the DuckDB oracle sees
  * `date_trunc('milliseconds', ts)` on its side).
  *
  * NTZ on output everywhere: the oracle compare reads both results as naive
  * timestamps; writing instant-typed (isAdjustedToUTC) parquet would make the
  * engine column tz-aware while the oracle's stays naive.
  *
  * [[assertSchemas]] is the loud failure at the testdata boundary: round 7
  * lost 16 queries to a silent testdata regeneration that only surfaced as
  * scattered analysis errors downstream. Verify and Bench call it at startup
  * so the NEXT format drift fails in one readable line.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    ntz(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    ntz(table(s, d, "lineitem"), "l_shipdate")

  /** Cast any instant-typed (isAdjustedToUTC) timestamp column back to
    * TIMESTAMP_NTZ. Session tz is UTC everywhere (Sessions.scala), so the
    * cast is the identity on the wall-clock value. This is what makes
    * [[typeOk]]'s TimestampType tolerance sound: a testdata regeneration
    * shipping tz-adjusted timestamps loads as the same naive values the
    * DuckDB oracle compares against, instead of passing assertSchemas and
    * then hash-mismatching downstream (the r7 failure mode).
    */
  private def ntz(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case TimestampType => d.withColumn(c, col(c).cast(TimestampNTZType))
        case _             => d
      }
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts` normalized to ms-truncated TIMESTAMP_NTZ, whatever the
    * parquet encoding of `ts` was (see object doc).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val norm = raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer-arithmetic truncate to ms, then to micros
        expr("cast(timestamp_micros((ts div 1000000) * 1000) as timestamp_ntz)")
      case TimestampNTZType =>
        date_trunc("millisecond", col("ts")).cast(TimestampNTZType)
      case TimestampType =>
        // session tz is UTC everywhere (Sessions.scala), so this cast is the
        // identity on the wall-clock value
        date_trunc("millisecond", col("ts")).cast(TimestampNTZType)
      case other =>
        throw new IllegalStateException(
          s"events.ts in $dir/events.parquet has unsupported type $other " +
            "(expected INT64 nanos-as-long, timestamp, or timestamp_ntz) — " +
            "testdata format drifted; update Tables.events")
    }
    raw.withColumn("ts", norm)
  }

  /** Expected post-load schemas for the ten fixture tables (FIXTURES.md §A).
    * `ts` is allowed any of its three historical encodings — [[events]]
    * normalizes it — so it is checked by name only.
    */
  private val expectedSchemas: Map[String, Map[String, DataType]] = Map(
    "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Map("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType,
                      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampNTZType),
    "events"   -> Map("event_id" -> LongType, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType,
                      "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType),
                        "label" -> IntegerType)
  )

  /** Timestamp columns that have drifted between testdata generations; accept
    * the encodings the loaders can normalize instead of one pinned type.
    */
  private def typeOk(table: String, col: String, actual: DataType,
                     expected: DataType): Boolean = (table, col) match {
    case ("events", _) if col == "ts" =>
      actual == LongType || actual == TimestampType || actual == TimestampNTZType
    case _ if expected == TimestampNTZType =>
      actual == TimestampNTZType || actual == TimestampType
    case _ => actual == expected
  }

  /** Assert all ten fixture tables in `dir` load with the FIXTURES.md §A
    * schema (modulo tolerated timestamp encodings). Throws one readable
    * IllegalStateException listing every mismatch; returns silently when
    * everything checks out. Cheap: reads parquet footers only.
    */
  def assertSchemas(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, want) <- expectedSchemas.toSeq.sortBy(_._1)) {
      val loaded =
        try Some(table(spark, dir, name).schema)
        catch { case e: Exception =>
          problems += s"$name: failed to load ($dir/$name.parquet): ${e.getMessage.linesIterator.next()}"
          None
        }
      loaded.foreach { schema =>
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        val wantCols = want.keySet ++ (if (name == "events") Set("ts") else Set.empty[String])
        for (colName <- wantCols.toSeq.sorted) {
          byName.get(colName) match {
            case None =>
              problems += s"$name.$colName: missing (have ${schema.fieldNames.mkString(", ")})"
            case Some(actual) =>
              val expected = want.getOrElse(colName, actual)
              if (!typeOk(name, colName, actual, expected))
                problems += s"$name.$colName: type $actual, expected $expected"
          }
        }
      }
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"testdata schema drift in $dir (FIXTURES.md §A):\n  " +
          problems.mkString("\n  "))
  }
}
