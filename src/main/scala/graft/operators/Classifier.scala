package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** FastText-style document quality classifier — the CommonCrawl-filtering
  * method of the GPT-3 / LLaMA data pipelines (Brown et al. 2020 §A;
  * Touvron et al. 2023): score every candidate page with a linear
  * classifier over hashed bag-of-words features, trained to separate a
  * trusted "positive" corpus from raw crawl "negatives", and keep
  * high-scoring documents.
  *
  * Features are EXACTLY [[TextStats.hashFeatures]] (the q93 hashing-trick
  * buckets: `md5(word) mod dim` with a ±1 sign, signed counts) — the
  * classifier shares the embedding operator's feature space, so one
  * feature pass can feed both. The model is logistic regression trained
  * by full-batch gradient descent in the classic distributed-GD shape:
  * the DRIVER holds the (dim+1)-vector of weights (bounded — this is the
  * model, not data), each iteration broadcasts it and runs ONE
  * shuffle-aggregate job over the persisted sparse feature frame to
  * collect the (dim+1)-row gradient. Corpus-sized data never reaches the
  * driver; iterations scan the persisted frame, not re-derive it.
  *
  * Determinism (the oracle-exactness discipline of q91/q97): all hot
  * sums are over exact integers. Weights live as e6-scaled longs;
  * margins `Σ w_e6·x` are exact Long sums; the only float step is the
  * sigmoid, whose value is rounded to an e6 long per ROW before anything
  * sums it (`p_e6`), so gradients `Σ x·(p_e6 − y·1e6)` are again exact
  * integer sums — partition-order independent, identical in DuckDB. The
  * weight update rounds `lr·g/(n·1e6)` once per coordinate on the driver
  * with the same floor(x+0.5) rule the SQL mirror uses.
  *
  * Scale shape: per iteration one broadcast hash join (≤ dim+1 rows) +
  * two hash aggregates (per-doc margin, then per-bucket gradient) over a
  * frame persisted once; collect size is dim+1 rows per iteration. At
  * 100 TB the feature frame is the corpus exploded to (doc, bucket) —
  * hash-partitioned throughout, no window, no single-partition stage.
  */
object Classifier {

  /** Trained model. `weightsE6(j)` is the e6-scaled weight of feature
    * bucket `j < dim`; `weightsE6(dim)` is the bias (internally a
    * constant feature `x = 1` at position `dim`, which keeps training
    * and scoring uniform — one join, one aggregate, no special case).
    */
  case class Model(dim: Int, weightsE6: Array[Long]) {
    require(weightsE6.length == dim + 1,
      s"Model: got ${weightsE6.length} weights for dim $dim (want dim+1)")
    def biasE6: Long = weightsE6(dim)
  }

  /** Sparse hashed features plus the constant bias feature at pos = dim:
    * every doc gets the bias row, so empty-text docs still score (via
    * the bias alone) and per-doc aggregates need no outer join.
    */
  private def featuresWithBias(docs: DataFrame, idCol: String,
                               textCol: String, dim: Int): DataFrame =
    TextStats.hashFeatures(docs, idCol, textCol, dim)
      .select(col(idCol), col("pos"), col("val").as("x"))
      .unionByName(graft.core.Ops.widen(docs)
        .select(col(idCol), lit(dim).cast("int").as("pos"),
          lit(1L).as("x")))

  /** Sigmoid of an e6-scaled integer margin, rounded back to e6 — the
    * one float step, rounded per row BEFORE any sum touches it.
    */
  private def pE6(marginE6: Column): Column =
    floor(lit(1e6) / (lit(1.0) + exp(-(marginE6.cast("double") / lit(1e6))))
      + lit(0.5)).cast("long")

  /** Train by `iters` full-batch GD steps at learning rate `lrE6`/1e6
    * from zero weights. `labelCol` must be 0/1 (castable to long).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int, iters: Int,
            lrE6: Long): Model = {
    require(iters >= 1, s"train: iters ($iters) must be >= 1")
    val sp = docs.sparkSession
    import sp.implicits._
    val feats = featuresWithBias(docs, idCol, textCol, dim)
      .join(graft.core.Ops.widen(docs)
        .select(col(idCol), col(labelCol).cast("long").as("__y")), Seq(idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // every doc has exactly one bias row — count off the persisted frame
      val n = feats.filter(col("pos") === lit(dim)).count()
      require(n > 0, "train: empty corpus")
      val w = Array.fill(dim + 1)(0L)
      for (_ <- 1 to iters) {
        val wDf = w.toSeq.zipWithIndex
          .map { case (v, j) => (j, v) }.toDF("pos", "__w")
        val perDoc = feats.join(broadcast(wDf), Seq("pos"))
          .groupBy(col(idCol))
          .agg(sum(col("x") * col("__w")).as("__m"), max(col("__y")).as("__yy"))
          .select(col(idCol),
            (pE6(col("__m")) - col("__yy") * lit(1000000L)).as("__d"))
        val grads = feats
          .join(perDoc, Seq(idCol))
          .groupBy(col("pos"))
          .agg(sum(col("x") * col("__d")).as("g"))
          .collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        for (j <- 0 to dim) {
          val g = grads.getOrElse(j, 0L)
          w(j) -= math.floor(
            lrE6.toDouble * g.toDouble / (n.toDouble * 1e6) + 0.5).toLong
        }
      }
      Model(dim, w)
    } finally { feats.unpersist(); () }
  }

  /** STATELESS per-row scoring: the margin as a fold over the words
    * array against the weight vector as an array literal (dim+1 ≤ a few
    * hundred elements — model, not data). Summing `sign(w)·w_e6[bucket
    * (w)]` per WORD equals summing `x·w_e6` per BUCKET (both are the
    * same exact integer sum, order-independent), so this is numerically
    * identical to [[score]] — spec-pinned. The form streaming gates
    * need: no aggregate, no shuffle, legal anywhere a column is.
    */
  def scoreExpr(text: Column, model: Model): Column = {
    val wLit = array(model.weightsE6.map(lit).toIndexedSeq: _*)
    val words = graft.operators.Dedup.normalizeWords(text)
    val margin = aggregate(words, lit(model.biasE6), (acc, w) => {
      val h = conv(substring(md5(w), 1, 8), 16, 10).cast("long")
      val bucket = pmod(h, lit(model.dim)).cast("int")
      val sign = when(pmod(floor(h / lit(model.dim)), lit(2)) === 0,
        lit(1L)).otherwise(lit(-1L))
      acc + sign * element_at(wLit, bucket + 1)
    })
    pE6(margin)
  }

  /** Score docs under a trained model → (idCol, p_e6) with p_e6 the
    * e6-scaled P(label = 1). One broadcast join + one hash aggregate.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val wDf = model.weightsE6.toSeq.zipWithIndex
      .map { case (v, j) => (j, v) }.toDF("pos", "__w")
    featuresWithBias(docs, idCol, textCol, model.dim)
      .join(broadcast(wDf), Seq("pos"))
      .groupBy(col(idCol))
      .agg(sum(col("x") * col("__w")).as("__m"))
      .select(col(idCol), pE6(col("__m")).as("p_e6"))
  }
}
