package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion for hybrid retrieval: combine per-query rankings from
  * heterogeneous retrievers (BM25 postings, ANN cosine, phrase match …)
  * without comparing their incommensurable scores — the standard serving
  * pattern in front of a RAG stack.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack et al. 2009): each ranking
    * contributes `1/(k0 + rank)` per (query, doc); docs are re-ranked by
    * the summed contribution. Scores never cross system boundaries —
    * only RANKS do, which is what makes RRF robust to scale-mismatched
    * retrievers. Contributions are e6-rounded BEFORE the sum (the repo's
    * integer-exact discipline), ties break by doc id.
    *
    * Inputs: each DataFrame carries (qidCol, idCol, rankCol — 1-based).
    * Output: (qidCol, idCol, rrf_e6, rnk ≤ topK). Shape: one union + one
    * hash aggregate on (qid, id) + a per-query bounded window
    * (WindowGroupLimit) — rankings are already top-k-bounded, so every
    * frame here is query-count-sized, not corpus-sized.
    *
    * One retriever, one vote: duplicate (qid, id) rows WITHIN a ranking
    * (an upstream join fan-out) collapse to their best rank before the
    * union, so no system can stuff the ballot — cross-system duplicates
    * are of course the signal RRF sums.
    */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
              rankCol: String, k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: at least one ranking")
    require(k0 >= 0 && topK >= 1)
    val tagged = rankings.map(_.select(col(qidCol), col(idCol),
        floor(lit(1e6) / (lit(k0.toDouble) + col(rankCol)) + lit(0.5))
          .cast("long").as("__c_e6"))
      // best (= max-contribution) rank wins; deterministic, unlike
      // dropDuplicates' arbitrary survivor
      .groupBy(col(qidCol), col(idCol))
      .agg(max(col("__c_e6")).as("__c_e6")))
    tagged.reduce(_ unionByName _)
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c_e6")).as("rrf_e6"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(qidCol)
          .orderBy(col("rrf_e6").desc, col(idCol).asc)).cast("long"))
      .filter(col("rnk") <= topK)
  }
}
