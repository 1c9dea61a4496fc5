package graft.pipeline

import graft.ops.TextOps
import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted unigram language model — the artifact form of the CCNet
  * perplexity filter: the LM trains ONCE on a clean reference corpus and
  * then scores any candidate batch, stream, or crawl snapshot against
  * the STORED table (q108's inline query scores a corpus against
  * itself; real curation scores candidates against a reference LM, and
  * this store is that contract — the third trained artifact beside
  * [[TokenizerStore]] and the shard tables).
  *
  * Layout: `<root>/lm` — (token, cf) corpus frequencies plus one `__total`
  * row carried as (token = NULL, cf = Σcf), so a scorer needs exactly one
  * table read.
  *
  * Scale: training is one token-keyed count over the reference
  * (vocab-sized output, sublinear in corpus bytes). Scoring joins batch
  * tokens to the vocab-sized LM — broadcast at small vocab,
  * hash-shuffle at web-scale vocab, AQE's call — then one doc-keyed
  * aggregation. Unseen tokens score through add-half smoothing over the
  * stored vocab (an unsmoothed stored-LM lookup would send any OOV doc
  * to +inf), so scoring is total: every candidate gets a finite score.
  *
  * Erasure note: like trained centroids and BPE merges, the LM holds
  * corpus-WIDE token counts — aggregates, not per-subject rows — so the
  * GDPR propagate flow has nothing to delete here; retrain on the
  * scrubbed reference if the reference itself is subject to erasure.
  */
object LmStore {

  case class Paths(root: String) {
    val lm: String = s"$root/lm"
  }

  /** Train (replace) the LM from `corpus(textCol)`. Refuses an empty
    * reference: committing a vocabulary-less LM would NULL the stored
    * total and silently NULL every downstream score — the loud failure
    * belongs at train time (a mis-filtered reference slice), not in the
    * score tables. */
  def train(spark: SparkSession, root: String, corpus: DataFrame,
            textCol: String = "text"): Unit = {
    val freq = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cf"))
    require(!freq.isEmpty,
      s"refusing to train $root from an empty reference corpus")
    val withTotal = freq.unionByName(
      freq.agg(sum("cf").as("cf")).select(lit(null: String).as("token"),
        col("cf")))
    AtomicRewrite.write(spark, Paths(root).lm, withTotal)
  }

  /** Score `df(idCol, textCol)` against the stored LM: per-doc token
    * count, average add-half-smoothed negative log-probability, and the
    * perplexity proxy `exp(avg_neg_logp)` — q108's rounding recipe, so
    * scores are bit-stable across engines and runs. `oov_tokens` counts
    * the tokens the reference never saw (a useful drift signal on
    * crawls). */
  def score(spark: SparkSession, root: String, df: DataFrame,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val stored = AtomicRewrite.read(spark, Paths(root).lm)
    val lm = stored.filter(col("token").isNotNull)
    val scal = lm.agg(count(lit(1)).as("v")).crossJoin(
      stored.filter(col("token").isNull).select(col("cf").as("n_total")))
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .join(lm, Seq("token"), "left")
      .crossJoin(broadcast(scal))
      .select(col(idCol),
        col("cf").isNull.cast("long").as("oov"),
        (-log((coalesce(col("cf"), lit(0L)) + lit(0.5)) /
          (col("n_total") + lit(0.5) * col("v")))).as("nlp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum("oov").as("oov_tokens"),
        round(avg("nlp"), 6).as("avg_neg_logp"))
      .withColumn("ppl_proxy", round(exp(col("avg_neg_logp")), 6))
  }
}
