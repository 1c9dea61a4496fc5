package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the production form of the inline
  * retrieval pair (q104 posting lists, q105 BM25 scoring): postings
  * live in a graft table hive-partitioned by a TOKEN-HASH BUCKET,
  * queries read only the buckets their terms hash into, batches append
  * incrementally, and a subject's documents erase partition-aware
  * (the [[DedupStore]]/[[AnnIndexStore]] store contract applied to the
  * retrieval layer; reference analog: the gold-layer serving tables a
  * consumer queries without touching upstream state).
  *
  * Layout:
  * {{{
  *   <root>/postings   // token, doc_id, tf, dl — hive-partitioned by
  *                     // bucket = pmod(xxhash64(token), buckets)
  *   <root>/docstats   // doc_id, dl — partitioned by doc-hash bucket
  * }}}
  *
  * Scale shape:
  *  - a QUERY collects its term set (bounded by the query batch, the
  *    q83 probed-cell pattern), reads ONLY the [[PostingBuckets]]
  *    partitions those terms hash into (manifest + hive pruning), and
  *    ranks through the [[graft.plans.TopKPerKey]] heap — never a scan
  *    of the full index. `dl` is DENORMALIZED into the postings so
  *    scoring needs no corpus-sized doc-stats join.
  *  - df comes from the postings already read (one row per (token,
  *    doc)), and N/avgdl from the narrow docstats table — O(docs) rows
  *    of two columns; at true 100 TB keep a running 1-row summary
  *    beside it (the watermark-table shape) rather than re-aggregating.
  *  - APPEND first erases the batch's doc ids (replacement semantics —
  *    a re-submitted doc's OLD tokens may live in buckets its new
  *    tokens never touch, so insert-only merging would strand stale
  *    postings), then rewrites only the buckets the new postings land
  *    in: O(batch tokens + touched buckets), never O(index).
  *  - FORGET deletes by doc_id: the touched partition set is the
  *    forgotten docs' distinct token buckets — capped at
  *    [[PostingBuckets]] regardless of corpus size. N/avgdl/df shift
  *    automatically on the next query because they derive from the
  *    committed tables, matching the reference's "derived layers
  *    recompute from scrubbed state" erasure contract.
  *
  * BM25 determinism: per-term contributions are bit-identical doubles
  * (same IEEE formula both engines), summed per (query, doc) through
  * DECIMAL(38,6) — exact and order-independent, the q108 convention —
  * then rounded to 6; ranking ties break on doc_id.
  */
object IndexStore {

  case class Paths(root: String) {
    val postings: String = s"$root/postings"
    val docstats: String = s"$root/docstats"
  }

  /** Token-hash partition count of the postings table — the cap on how
    * many partitions a doc-keyed erasure can touch. */
  val PostingBuckets = 32

  /** Doc-hash partition count of the narrow docstats table. */
  val DocBuckets = 16

  /** BM25 parameters (the q105 constants). */
  val K1 = 1.2
  val B = 0.75

  private def bucketOf(token: Column): Column =
    pmod(xxhash64(token), lit(PostingBuckets.toLong)).cast("int")

  /** (token, doc_id, tf, dl, bucket) postings of a corpus batch —
    * term frequencies via one explode + keyed count, dl carried on
    * every row so scoring never joins the corpus. */
  private def postingsOf(corpus: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        graft.ops.TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .withColumn("bucket", bucketOf(col("token")))

  private def docstatsOf(corpus: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        size(graft.ops.TextOps.tokens(col(textCol))).cast("double").as("dl"))
      .withColumn("doc_bucket",
        pmod(xxhash64(col("doc_id")), lit(DocBuckets.toLong)).cast("int"))

  /** Build (replace) the index from a corpus. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val p = Paths(root)
    AtomicRewrite.write(spark, p.postings,
      postingsOf(corpus, textCol, idCol), partitionBy = Seq("bucket"))
    AtomicRewrite.write(spark, p.docstats,
      docstatsOf(corpus, textCol, idCol), partitionBy = Seq("doc_bucket"))
  }

  /** Append a batch incrementally. Replacement semantics for
    * re-submitted doc ids: their previous postings are ERASED first
    * (a changed doc's old tokens may hash into buckets the new tokens
    * never touch — merge-only would strand them as ghost hits), then
    * only the buckets the new postings land in are rewritten.
    *
    * The erase and the insert are separate commits: a crash between the
    * two loses the batch's docs from the index until the source's
    * at-least-once replay re-lands them (the streaming sink's
    * redelivery contract) — never a half-merged doc or a stale ghost,
    * which are the failure modes that can't self-heal. */
  def append(spark: SparkSession, root: String, batch: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val p = Paths(root)
    require(AtomicRewrite.exists(spark, p.postings),
      s"no index at $root — build() an index before appending to it")
    val ids = batch.select(col(idCol).as("doc_id"))
    AtomicRewrite.deleteMatching(spark, p.postings, ids, "doc_id")
    AtomicRewrite.deleteMatching(spark, p.docstats, ids, "doc_id")
    val post = postingsOf(batch, textCol, idCol).persist()
    val touched = post.select("bucket").distinct()
    val bucketIds = touched.collect().map(_.getInt(0)).toSeq
    if (bucketIds.nonEmpty) {
      val existing = AtomicRewrite.read(spark, p.postings)
        .filter(col("bucket").isin(bucketIds: _*))
      AtomicRewrite.writePartitions(spark, p.postings,
        existing.unionByName(post), Seq("bucket"),
        replaced = Some(touched.toDF()))
    }
    post.unpersist()
    val ds = docstatsOf(batch, textCol, idCol).persist()
    val touchedDs = ds.select("doc_bucket").distinct()
    val dsIds = touchedDs.collect().map(_.getInt(0)).toSeq
    if (dsIds.nonEmpty) {
      val existing = AtomicRewrite.read(spark, p.docstats)
        .filter(col("doc_bucket").isin(dsIds: _*))
      AtomicRewrite.writePartitions(spark, p.docstats,
        existing.unionByName(ds), Seq("doc_bucket"),
        replaced = Some(touchedDs.toDF()))
    }
    ds.unpersist()
  }

  /** Right-to-be-forgotten: remove the given doc ids' postings and
    * stats. Partition-aware — the postings rewrite touches only the
    * forgotten docs' distinct token buckets (≤ [[PostingBuckets]] by
    * construction), the stats rewrite only their doc buckets; N, avgdl
    * and df shift automatically on the next [[query]] because scoring
    * derives them from the committed tables. Returns whether anything
    * was rewritten; [[forgetMatched]] the matched ids for audit. */
  def forget(spark: SparkSession, root: String, ids: DataFrame): Boolean = {
    val p = Paths(root)
    val docIds = ids.toDF("doc_id")
    val a = AtomicRewrite.deleteMatching(spark, p.postings, docIds, "doc_id")
    val b = AtomicRewrite.deleteMatching(spark, p.docstats, docIds, "doc_id")
    a || b
  }

  /** [[forget]] returning the matched doc ids (empty = index untouched)
    * — the audit-precision shape for [[Gdpr.StoreErasure]]. */
  def forgetMatched(spark: SparkSession, root: String,
                    ids: DataFrame): Seq[Any] = {
    val p = Paths(root)
    val docIds = ids.toDF("doc_id")
    val matched = AtomicRewrite.deleteMatchingKeys(spark, p.postings,
      docIds, "doc_id")
    AtomicRewrite.deleteMatching(spark, p.docstats, docIds, "doc_id")
    matched
  }

  /** Top-`k` BM25 hits per query. `queries` carries (`query_id`,
    * `terms` array<string>); duplicate terms within a query count once
    * (the conjunctive-bag convention of the q105 fixed query). Reads
    * ONLY the term set's hash-bucket partitions; ranking is the
    * TopKPerKey heap. A query whose terms match nothing returns no
    * rows. */
  def query(spark: SparkSession, root: String, queries: DataFrame,
            k: Int = 5): DataFrame = {
    val p = Paths(root)
    val qt = queries.select(col("query_id"),
      explode(array_distinct(col("terms"))).as("token"))
    // the term vocabulary is bounded by the query batch — collect it to
    // prune the postings scan to its buckets at plan time (severed
    // lineage, the q83 probed-cell idiom)
    val terms = qt.select("token").distinct()
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty) return qt.select(col("query_id"),
      lit(0L).as("doc_id"), lit(0.0).as("bm25"), lit(0).as("rank")).limit(0)
    val post = AtomicRewrite.read(spark, p.postings)
      .filter(col("bucket").isin(bucketIdsOf(spark, terms): _*) &&
        col("token").isin(terms: _*))
      .persist()
    post.count()
    // df per token from the postings just read (one row per (token, doc));
    // N and avgdl from the narrow docstats table
    val df = post.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val stats = AtomicRewrite.read(spark, p.docstats)
      .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val contrib =
      log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    val scored = qt.join(post, "token")
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      // exact decimal sum of bit-identical double contributions: the
      // per-(query, doc) total must not depend on term combine order
      .select(col("query_id"), col("doc_id"),
        contrib.cast("decimal(38,6)").as("__c"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("__c")).cast("double"), 6).as("bm25"))
    val out = graft.plans.TopKPerKey.perKeyWithRank(scored,
      Seq("query_id"), Seq(col("bm25").desc, col("doc_id")), k, "rank")
      .select(col("query_id"), col("doc_id"), col("bm25"), col("rank"))
      .persist()
    out.count()
    post.unpersist()
    out
  }

  /** The distinct posting buckets a term set hashes into — computed
    * with the same xxhash64 the write path used, via a literal frame
    * through the engine (never a reimplementation of the hash on the
    * driver, which could silently diverge from the stored layout). */
  private def bucketIdsOf(spark: SparkSession, terms: Seq[String]): Seq[Any] = {
    import spark.implicits._
    terms.toDF("token").select(bucketOf(col("token")))
      .distinct().collect().map(_.getInt(0)).toSeq
  }
}
