package graft.core

import org.apache.spark.sql.DataFrame

/** An operator result plus the persisted intermediates it depends on.
  *
  * The near-dup family (MinHash LSH, n-gram Jaccard, RP-LSH, connected
  * components) persists signature/edge tables that several downstream
  * branches consume — correct at any scale, but a long-lived session
  * composing operators must be able to free them once the result is
  * materialized (or abandoned). `close()` unpersists every pinned
  * intermediate (non-blocking); after that the `df` plan is still valid but
  * recomputes from source if re-run — consume (write/collect) before
  * closing. Usable as `AutoCloseable` in `Using`-style scopes.
  */
final case class Managed(df: DataFrame, pinned: Seq[DataFrame])
    extends AutoCloseable {
  override def close(): Unit = pinned.foreach(_.unpersist(false))
}
