package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Sketches

/** Streaming sketch maintenance — the continuous-ingest form of
  * [[graft.operators.Sketches]]: a crawl/firehose pipeline keeps running
  * frequency (count-min) and cardinality (HyperLogLog) summaries without
  * ever re-scanning history. Both sketches are MERGEABLE (counter sums
  * and register maxes are associative + commutative), so the stream form
  * holds one tiny state cell per (row, bucket) key and the result after
  * any prefix of batches equals the batch sketch of everything ingested
  * so far — exact parity, spec-pinned, not approximate-parity.
  *
  * State sizing is the whole point: count-min state is ≤ depth×width
  * cells (256 longs at the defaults), HLL state is ≤ 64 cells —
  * CONSTANT in stream length, the smallest stateful operators in the
  * engine (compare StatefulDedup: one cell per distinct key). Keys
  * shuffle-partition by (j, bucket)/bucket, so the state store shards
  * evenly across executors regardless of key skew in the input — a
  * hot key hits the same d buckets every time but each bucket cell is
  * one long, not a list.
  */
object SketchStream {

  case class Cell(c: Long)

  /** Streaming count-min: (key, cnt) increments → running (j, bucket, c)
    * counter rows, Update-mode (each touched bucket re-emits its new
    * total every batch). Bucket mapping runs in task code
    * ([[Sketches.bucketOf]] — parity with the batch column arithmetic is
    * spec-pinned).
    */
  def cmsCounters(rows: Dataset[(String, Long)], depth: Int = 4,
                  width: Int = 64): Dataset[(Int, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows
      .flatMap { case (k, c) =>
        (0 until depth).iterator.map(j => (j, Sketches.bucketOf(k, j, width), c))
      }
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState[Cell, (Int, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), it: Iterator[(Int, Long, Long)],
         st: GroupState[Cell]) =>
          val tot = st.getOption.map(_.c).getOrElse(0L) + it.map(_._3).sum
          st.update(Cell(tot))
          (key._1, key._2, tot)
      }
  }

  /** Streaming HLL registers: keys → running (bucket, mrho) maxes,
    * Update-mode. Feed any snapshot to [[Sketches.hllEstimate]] for the
    * running cardinality estimate.
    */
  def hllRegisters(keys: Dataset[String]): Dataset[(Long, Long)] = {
    import keys.sparkSession.implicits._
    keys
      .map(Sketches.hllBucketRho _)
      .groupByKey(_._1)
      .mapGroupsWithState[Cell, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        (bucket: Long, it: Iterator[(Long, Long)], st: GroupState[Cell]) =>
          val m = math.max(st.getOption.map(_.c).getOrElse(0L),
            it.map(_._2).max)
          st.update(Cell(m))
          (bucket, m)
      }
  }
}
