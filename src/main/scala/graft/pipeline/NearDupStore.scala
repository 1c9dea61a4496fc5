package graft.pipeline

import graft.ops.{Graph, TextOps}
import graft.tx.AtomicRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup rejection against an all-time MinHash/LSH store —
  * the production shape of fuzzy dedup (the [[DedupStore]] analog for
  * near-duplicates): each new batch is checked against the signatures of
  * everything ever accepted, via LSH band buckets, and only survivors'
  * signatures join the store.
  *
  * Per batch:
  *  1. one-permutation MinHash signatures + band keys for the batch
  *     (1 sha256/shingle — the q36 formulation);
  *  2. in-batch collapse: band-collision candidates → signature-estimated
  *     Jaccard ≥ threshold pairs → [[Graph.connectedComponents]] → one
  *     survivor (lowest id) per component;
  *  3. store check: survivor bands equi-join the store's band table
  *     (bucketed candidate generation — the corpus is never self-joined),
  *     estimate Jaccard against matched stored signatures, reject ≥
  *     threshold;
  *  4. `land` the accepted rows durably, THEN append their signature+band
  *     rows to the store (same land-before-commit crash ordering as
  *     [[DedupStore]]: a replay re-lands idempotently, the store never
  *     marks documents that were not landed).
  *
  * Scale: the store holds S longs + B band hashes per accepted doc. The
  * batch⋈store join is an equi-join on (band_idx, band_hash) — at 100 TB
  * the store's band table pre-partitions on the band hash and a batch
  * probes only its own buckets. Estimation happens once per candidate
  * pair, not per corpus row. NULL texts are REJECTED up front (no
  * near-dup identity — DedupStore's NULL rule); empty strings are a
  * valid degenerate identity class that collapses to one survivor.
  */
object NearDupStore {

  val S = 12      // minhash rows
  val Bands = 6   // 2 rows per band

  private def sigCols: Seq[String] = (0 until S).map(i => s"m$i")

  /** Signature + band projection for a text column: doc id, m0..m11. */
  private def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val hs = TextOps.hashedShingles(array_distinct(TextOps.shingles(toks, 3)))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), hs.as("__hs"))
      .select(col("doc_id") +:
        (0 until S).map(i => TextOps.minhashFromHashes(col("__hs"), i).as(s"m$i")): _*)
  }

  private def banded(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        TextOps.band(Seq(col(s"m${2 * b}"), col(s"m${2 * b + 1}")))): _*)))
      .toDF("doc_id", "band_idx", "bh")

  private def estJaccard(a: String, b: String): Column =
    (0 until S).map(i =>
      when(col(s"$a.m$i") === col(s"$b.m$i"), 1).otherwise(0))
      .reduce(_ + _) / lit(S.toDouble)

  /** Accept the rows of `batch` that are near-dups of nothing accepted
    * before (nor of a lower-id batch row); land them, then commit their
    * signatures. Returns the accepted rows (pinned; caller's session
    * clearCache releases). */
  def acceptNew(spark: SparkSession, storeRoot: String, batch: DataFrame,
                idCol: String, textCol: String, threshold: Double = 0.5,
                land: DataFrame => Unit = _ => ()): DataFrame = {
    val sig = signatures(batch, idCol, textCol).persist()
    val bands = banded(sig)

    // -- in-batch collapse: candidates from band collisions, verified by
    //    signature estimate, components collapsed to their min id
    val inPairs = bands.alias("a").join(bands.alias("b"),
      col("a.band_idx") === col("b.band_idx") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sig.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(estJaccard("sa", "sb") >= threshold)
      .select(col("doc_a"), col("doc_b"))
    val comp = Graph.connectedComponents(inPairs, "doc_a", "doc_b")
    val batchReps = sig.join(
      comp.filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")

    // -- store check: survivors vs everything ever accepted. Candidate
    // ids are re-aliased before rejoining `sig` — reusing the original
    // attribute would be a same-lineage self-join.
    val exists = AtomicRewrite.exists(spark, storeRoot)
    val accepted =
      if (!exists) batchReps
      else {
        val store = AtomicRewrite.read(spark, storeRoot)
        val storeBands = banded(store)
          .select(col("band_idx"), col("bh"), col("doc_id").as("store_doc"))
        val dupOfStore = banded(batchReps)
          .join(storeBands, Seq("band_idx", "bh"))
          .select(col("doc_id").as("cand_doc"), col("store_doc")).distinct()
          .join(sig.alias("sa"), col("cand_doc") === col("sa.doc_id"))
          .join(store.alias("ss"), col("store_doc") === col("ss.doc_id"))
          .filter(estJaccard("sa", "ss") >= threshold)
          .select(col("cand_doc").as("doc_id")).distinct()
        batchReps.join(dupOfStore, Seq("doc_id"), "left_anti")
      }

    val acceptedIds = accepted.select(col("doc_id")).persist()
    val out = batch.join(acceptedIds.select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi").persist()
    val nOut = out.count()
    land(out) // durable consumer BEFORE the store commit — crash replays
    // append-only store commit (see DedupStore): new signatures land in
    // their own batch_seq partition, all earlier ones ride the manifest —
    // O(batch) bytes per commit even with an all-time store behind it
    val seq = AtomicRewrite.currentVersion(spark, storeRoot).map(_ + 1).getOrElse(0L)
    // nothing accepted → no store churn. acceptedIds ⊆ the batch's ids
    // (accepted derives from the batch's signatures), so the count
    // already materialized above decides without a second isEmpty job
    if (seq == 0L || nOut > 0L)
      AtomicRewrite.writePartitions(spark, storeRoot,
        accepted.select((col("doc_id") +: sigCols.map(col)): _*)
          .withColumn("batch_seq", lit(seq).cast("int")),
        Seq("batch_seq"))
    sig.unpersist()
    acceptedIds.unpersist()
    // the CC labels frame comes back pinned (an explicit persist() —
    // Graph's contract; such pins NEVER GC-reap) — every consumer is
    // materialized by now (out counted, the store committed), so this
    // unpersist is the load-bearing release that keeps a long-running
    // stream's executor storage flat
    comp.unpersist()
    out
  }

  /** Fold the per-batch partition history into ≤ `buckets` dirs — see
    * [[StoreMaintenance.rebaseBatchPartitions]] (incl. the dir-count vs
    * erasure-granularity tradeoff). Run on cadence once the
    * accepted-batch count (= partition-dir count) matters. */
  def compact(spark: SparkSession, storeRoot: String, buckets: Int = 16): Unit =
    StoreMaintenance.rebaseBatchPartitions(spark, storeRoot, buckets)

  /** Right-to-be-forgotten for the signature store: drop the given doc
    * ids' MinHash rows (one `doc_id` column) so no derived trace of a
    * deleted document survives and re-submitted content stops matching a
    * ghost signature. Partition-aware like [[DedupStore.forget]]
    * ([[AtomicRewrite.deleteMatching]]): only the `batch_seq` partitions
    * holding a forgotten id are rewritten. Returns whether anything was
    * rewritten; [[forgetMatched]] additionally returns the matched doc
    * ids for per-subject audit trails. */
  def forget(spark: SparkSession, storeRoot: String, ids: DataFrame): Boolean =
    AtomicRewrite.deleteMatching(spark, storeRoot, ids, "doc_id")

  /** [[forget]] returning the matched doc ids (empty = store untouched,
    * no version burned) — the audit-precision shape. */
  def forgetMatched(spark: SparkSession, storeRoot: String,
                    ids: DataFrame): Seq[Any] =
    AtomicRewrite.deleteMatchingKeys(spark, storeRoot, ids, "doc_id")
}
