package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup against an all-time fingerprint store — the
  * PRODUCTION shape of exact dedup: each new batch is anti-joined against
  * the fingerprints of everything ever accepted, survivors' fingerprints
  * are appended to the store, and a replayed batch contributes nothing.
  *
  * Scale: the store holds one short hash per accepted document (a few
  * bytes vs the corpus' kilobytes), so batch⋈store is a hash anti-join on
  * the fingerprint — the corpus itself is never self-joined and never
  * re-read.
  *
  * Crash ordering: the accepted rows are handed to `land` (the caller's
  * durable sink) BEFORE the store commit. A crash between the two replays
  * the batch: `land` re-lands the same survivors (it must be idempotent —
  * any [[graft.tx.Upsert]]/[[AtomicRewrite]] sink is) and the store then
  * commits. Committing the store first would be unrecoverable — the
  * fingerprints would be marked seen while the documents were never
  * landed, and every replay would return empty.
  */
object DedupStore {

  /** Accept the unseen rows of `batch` (first occurrence per fingerprint
    * inside the batch wins by ascending `idCol`): `land` the accepted
    * rows durably, then append their fingerprints to the store. Returns
    * the accepted rows (pinned in cache; released by the session's
    * clearCache between queries).
    *
    * Rows whose fingerprint evaluates to NULL are REJECTED up front: a
    * document with nothing to fingerprint has no dedup identity, and a
    * NULL key would also never match the anti-join — letting one slip
    * through per batch forever while the store silently filled with NULL
    * rows. */
  def acceptNew(spark: SparkSession, storeRoot: String, batch: DataFrame,
                idCol: String, fingerprint: Column,
                land: DataFrame => Unit = _ => ()): DataFrame =
    acceptThrough(spark, storeRoot, batch, idCol, fingerprint) { df =>
      land(df); df
    }

  /** [[acceptNew]] whose durable sink may itself REJECT rows — the
    * nested-dedup composition (e.g. a [[NearDupStore]] stage between the
    * fingerprint check and the corpus landing). `land` returns the rows
    * it actually landed, and ONLY those rows' fingerprints commit: a
    * fingerprint of never-landed content would be a ghost — it blocks
    * legitimate re-submission forever, and a corpus-driven GDPR erasure
    * (which maps subjects to fingerprints THROUGH the landed text,
    * [[graft.pipeline.CurationRunner.storeErasures]]) could never reach
    * it. Misses this creates (a rejected row's exact copy re-probes the
    * downstream stage instead of being cut here) are a cache miss, not a
    * correctness loss — the downstream stage holds the authoritative
    * reject. Returns the rows the SINK landed. */
  def acceptThrough(spark: SparkSession, storeRoot: String, batch: DataFrame,
                    idCol: String, fingerprint: Column)
                   (land: DataFrame => DataFrame): DataFrame = {
    val fp = batch.withColumn("__fp", fingerprint).filter(col("__fp").isNotNull)
    val store =
      if (AtomicRewrite.exists(spark, storeRoot))
        AtomicRewrite.read(spark, storeRoot)
      else fp.select(col("__fp").as("fingerprint")).limit(0)
    val unseen = fp.join(
      store.select(col("fingerprint").as("__fp")), Seq("__fp"), "left_anti")
    val accepted = graft.ops.Dedup.latestPerKey(unseen,
      Seq(col("__fp")), Seq(col(idCol).asc)).persist()
    // pin the result BEFORE the store commit: after it, recomputing the
    // anti-join would see its own batch's fingerprints
    val out = accepted.drop("__fp").persist()
    val nAccepted = out.count()
    val landed = land(out) // durable consumer first — crash contract above
    val committed =
      if (landed eq out) accepted
      else accepted.join(landed.select(col(idCol)), Seq(idCol), "left_semi")
    // append-only store commit: each batch's fingerprints land in their
    // own batch_seq partition and every earlier partition rides the
    // manifest by reference — O(batch) bytes per commit, never O(store).
    // Fold partition-dir growth on cadence with [[compact]] (a
    // StoreMaintenance rebase — AtomicRewrite.compact preserves the
    // hive layout, so it cannot shrink the dir count).
    val seq = AtomicRewrite.currentVersion(spark, storeRoot).map(_ + 1).getOrElse(0L)
    // nothing accepted → no store churn. The direct-sink path decides
    // from the count already materialized above (committed == accepted,
    // same cardinality as `out`) instead of paying an isEmpty job; only
    // a nested sink that may itself reject rows needs the probe.
    val commitNonEmpty =
      if (landed eq out) nAccepted > 0 else !committed.isEmpty
    if (seq == 0L || commitNonEmpty)
      AtomicRewrite.writePartitions(spark, storeRoot,
        committed.select(col("__fp").as("fingerprint"))
          .withColumn("batch_seq", lit(seq).cast("int")),
        Seq("batch_seq"))
    accepted.unpersist()
    // on the nested-sink path the returned frame is the SINK's, so the
    // intermediate pin must release here — the acceptNew path keeps it
    // pinned because `out` IS the returned frame (the caller releases)
    if (landed ne out) out.unpersist()
    landed
  }

  /** The q34-style normalized-text fingerprint. */
  def textFingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Fold the per-batch partition history into ≤ `buckets` dirs — see
    * [[StoreMaintenance.rebaseBatchPartitions]] (incl. the dir-count vs
    * erasure-granularity tradeoff). Run on cadence once the
    * accepted-batch count (= partition-dir count) matters. */
  def compact(spark: SparkSession, storeRoot: String, buckets: Int = 16): Unit =
    StoreMaintenance.rebaseBatchPartitions(spark, storeRoot, buckets)

  /** Right-to-be-forgotten for the store: remove the given fingerprints
    * (one `fingerprint` column) so (a) no derived trace of a deleted
    * document survives, and (b) a legitimate re-submission of the same
    * content is no longer blocked by a ghost fingerprint.
    *
    * Partition-aware ([[AtomicRewrite.deleteMatching]]): only the
    * `batch_seq` partitions that actually hold a forgotten fingerprint
    * are rewritten; every other partition rides the manifest by
    * reference — O(affected partitions), never O(store). Returns whether
    * anything was rewritten; [[forgetMatched]] additionally returns the
    * matched fingerprints for per-subject audit trails.
    * Reference GDPR semantics: the mobility
    * pipeline's hard-delete path (gdpr/delete_subject.py) applied to the
    * corpus-store layer. */
  def forget(spark: SparkSession, storeRoot: String,
             fingerprints: DataFrame): Boolean =
    AtomicRewrite.deleteMatching(spark, storeRoot,
      fingerprints, "fingerprint")

  /** [[forget]] returning the matched fingerprints (empty = store
    * untouched, no version burned) — the audit-precision shape. */
  def forgetMatched(spark: SparkSession, storeRoot: String,
                    fingerprints: DataFrame): Seq[Any] =
    AtomicRewrite.deleteMatchingKeys(spark, storeRoot,
      fingerprints, "fingerprint")
}
