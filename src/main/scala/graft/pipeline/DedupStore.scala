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
  * re-read. The store is an [[AtomicRewrite]] snapshot, so a crashed run
  * re-processes its batch idempotently (fingerprints are content-derived,
  * re-accepting the same survivors is a no-op union).
  */
object DedupStore {

  /** Accept the unseen rows of `batch` (first occurrence per fingerprint
    * inside the batch wins by ascending `idCol`), append their
    * fingerprints to the store, return the accepted rows. */
  def acceptNew(spark: SparkSession, storeRoot: String, batch: DataFrame,
                idCol: String, fingerprint: Column): DataFrame = {
    val fp = batch.withColumn("__fp", fingerprint)
    val store =
      if (AtomicRewrite.exists(spark, storeRoot))
        AtomicRewrite.read(spark, storeRoot)
      else fp.select(col("__fp").as("fingerprint")).limit(0)
    val unseen = fp.join(
      store.select(col("fingerprint").as("__fp")), Seq("__fp"), "left_anti")
    val accepted = graft.ops.Dedup.latestPerKey(unseen,
      Seq(col("__fp")), Seq(col(idCol).asc)).persist()
    AtomicRewrite.write(spark, storeRoot,
      store.unionByName(accepted.select(col("__fp").as("fingerprint"))))
    // pin the result BEFORE releasing the join cache: after the store
    // write commits, recomputing the anti-join would race the updated
    // snapshot (it would see its own batch's fingerprints)
    val out = accepted.drop("__fp").persist()
    out.count()
    accepted.unpersist()
    out
  }

  /** The q34-style normalized-text fingerprint. */
  def textFingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)
}
