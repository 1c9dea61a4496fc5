package graft.pipeline

import graft.ops.Bpe
import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Persisted BPE tokenizer — the train-once / apply-everywhere contract
  * every pipeline has for its tokenizer: training runs over a corpus
  * snapshot and commits the learned merge list as a graft table; encoding
  * is then a pure narrow map any batch, query, or streaming micro-batch
  * can apply WITHOUT the corpus that trained it (q110 keeps the inline
  * trainer+encoder shape for the oracle; this store is its production
  * form, and a trainer's artifact is exactly this merge table).
  *
  * Layout: `<root>/merges` — (merge_rank, pair, merged), rank = training
  * order, which is also the only correct application order.
  *
  * Scale: each training round is one pair-keyed aggregation over the
  * corpus plus one merge map — linear per round (the measured q110
  * shape). The argmax is a single row COLLECTED per round — the store
  * must persist it, and rounds are the bounded driver-side set (the
  * merge list IS the artifact). Encoding chains `rounds` boundary-safe
  * string replaces inside one whole-stage-codegen projection: zero
  * shuffles, zero state, linear in batch bytes regardless of corpus
  * size. The merge count is BOUNDED at [[MaxMerges]] (enforced at both
  * train and encode, the RankLimitToTopK/RewriteMaxK convention): each
  * merge nests one more replace into the projection's expression tree,
  * and an unbounded list would eventually blow the codegen method-size
  * limit or the analyzer's stack on the driver — loud at the API
  * boundary, never deep inside Catalyst. A production vocabulary beyond
  * the bound belongs in chunked application (apply [[MaxMerges]]-sized
  * merge groups with a materialization barrier between chunks), which a
  * caller can compose from [[merges]] + [[graft.ops.Bpe.applyMerge]].
  *
  * Erasure note: like trained centroids and the unigram LM
  * ([[LmStore]]), the merge list holds corpus-WIDE pair frequencies —
  * aggregates, not per-subject rows — so the GDPR propagate flow has
  * nothing to delete here; retrain on the scrubbed corpus if the
  * training snapshot itself is subject to erasure.
  */
object TokenizerStore {

  /** Upper bound on persisted merges (train) and applied merges
    * (encode): deep-nested replace trees beyond this risk codegen /
    * analyzer limits — see the class note. */
  val MaxMerges = 256

  case class Paths(root: String) {
    val merges: String = s"$root/merges"
  }

  private val MergeSchema = StructType(Seq(
    StructField("merge_rank", IntegerType, nullable = false),
    StructField("pair", StringType, nullable = false),
    StructField("merged", StringType, nullable = false)))

  /** Train `rounds` merges over `corpus(textCol)` and commit the merge
    * table (replacing any previous training). Stops early only if the
    * corpus runs out of ADJACENT pairs entirely (every doc merged to one
    * unit — [[Bpe.bestPair]]'s sentinel); frequency-1 pairs still merge,
    * lexicographically, like any greedy BPE. Deterministic — same
    * corpus, same merges. */
  def train(spark: SparkSession, root: String, corpus: DataFrame,
            textCol: String = "text", rounds: Int = 3): Unit = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    require(rounds <= MaxMerges,
      s"rounds must be <= $MaxMerges (codegen/analyzer bound — chunk " +
        s"larger vocabularies, see TokenizerStore doc), got $rounds")
    var cur = corpus.select(Bpe.corpusString(col(textCol)).as("s")).persist()
    cur.count()
    val merges = Seq.newBuilder[org.apache.spark.sql.Row]
    var done = false
    for (r <- 1 to rounds if !done) {
      Bpe.bestPair(cur).collect().headOption match {
        case Some(row) if row.getString(0).nonEmpty =>
          val pair = row.getString(0)
          merges += org.apache.spark.sql.Row(r, pair, pair.replace(" ", ""))
          val next = cur
            .withColumn("s", Bpe.applyMerge(col("s"), lit(pair))).persist()
          next.count()
          cur.unpersist()
          cur = next
        case _ => done = true // sentinel: no adjacent pair left anywhere
      }
    }
    cur.unpersist()
    AtomicRewrite.write(spark, Paths(root).merges,
      AtomicRewrite.literalFrame(spark, merges.result(), MergeSchema))
  }

  /** The trained merge list, in application order. */
  def merges(spark: SparkSession, root: String): DataFrame =
    AtomicRewrite.read(spark, Paths(root).merges).orderBy("merge_rank")

  /** Encode arbitrary rows with the TRAINED merges: returns `idCol`,
    * the encoded token array and its length. One projection — the merge
    * list is a driver-side fold over O(rounds) rows, never a join. */
  def encode(spark: SparkSession, root: String, df: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ms = merges(spark, root).collect()
    require(ms.length <= MaxMerges,
      s"stored merge list has ${ms.length} entries, beyond the " +
        s"$MaxMerges single-projection bound — apply in chunks instead")
    val encoded = ms.foldLeft(Bpe.corpusString(col(textCol))) {
      (s, m) => Bpe.applyMerge(s, lit(m.getString(1)))
    }
    df.select(col(idCol), Bpe.streamTokens(encoded).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
