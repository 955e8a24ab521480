package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** The near-dup family persists signature/edge tables; the Managed variants
  * must hand every one of them back so a long-lived session can free them.
  * Each case consumes the result, closes, and asserts nothing stays cached
  * (VERDICT r2 item 4: "a spec proving no cached tables remain").
  */
class ManagedSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again"
  private val docB = docA + " tail words appended"
  private val docC = "completely different content about spark catalyst plans"

  /** Race-free under parallel suites sharing the session: assert on the
    * pinned Datasets' OWN storage levels (not global cache counts, which
    * sibling suites mutate concurrently). `expectedPins` pins the operator's
    * persist inventory so an unpinned persist can't silently appear.
    */
  private def assertAllFreed(expectedPins: Int)
                            (body: => graft.core.Managed): Unit = {
    val m = body
    m.df.collect() // consume: materializes every pinned intermediate
    assert(m.pinned.size == expectedPins,
      s"expected $expectedPins pinned intermediates, got ${m.pinned.size}")
    assert(m.pinned.forall(p =>
      p.storageLevel.useMemory || p.storageLevel.useDisk),
      "every pinned intermediate should be persisted before close()")
    m.close()
    assert(m.pinned.forall(_.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE),
      "close() must unpersist every pinned table")
  }

  test("minhashNearDupPairsManaged frees its shingle and band tables") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    assertAllFreed(2)(Dedup.minhashNearDupPairsManaged(df, "doc_id", "text"))
  }

  test("ngramJaccardPairsManaged frees its gram table") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    assertAllFreed(1)(Dedup.ngramJaccardPairsManaged(df, "doc_id", "text", 0.3))
  }

  test("connectedComponentsManaged frees its label table") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("idA", "idB")
    assertAllFreed(1)(Dedup.connectedComponentsManaged(pairs))
  }

  test("rpLshNearDupPairsManaged frees its bucketed table; dim skips the probe job") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.5)),
      (2L, Seq(0.99, 0.01, 0.5)),
      (3L, Seq(-1.0, 0.3, -0.2))).toDF("id", "v")
    assertAllFreed(1)(
      Similarity.rpLshNearDupPairsManaged(vecs, numPlanes = 4,
        threshold = 0.9, dim = Some(3)))
  }

  test("rpLshNearDupPairs with dim probes nothing and matches the probed path") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.5)),
      (2L, Seq(0.99, 0.01, 0.5)),
      (3L, Seq(-1.0, 0.3, -0.2))).toDF("id", "v")
    val withDim = Similarity.rpLshNearDupPairs(vecs, 4, 0.9, Some(3))
      .as[(Long, Long, Long)].collect().toSet
    val probed = Similarity.rpLshNearDupPairs(vecs, 4, 0.9)
      .as[(Long, Long, Long)].collect().toSet
    assert(withDim == probed)
    assert(withDim.map(p => (p._1, p._2)) == Set((1L, 2L)))
    spark.catalog.clearCache() // plain variants keep persists by contract
  }

  test("empty corpus yields an empty, well-typed pair frame (both paths)") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(Similarity.rpLshNearDupPairs(empty, 4, 0.9).count() == 0)
    assert(Similarity.rpLshNearDupPairs(empty, 4, 0.9, Some(3)).count() == 0)
    spark.catalog.clearCache()
  }
}
