package graft.streaming

import graft.ops.TextOps
import graft.pipeline.DedupStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming release gate — the online front door of the q114 filter
  * cascade. Each micro-batch runs the STATELESS prefix of the cascade
  * (length, then stopword quality — narrow per-row maps, same cuts and
  * order as the batch gate), and quality survivors then pass through
  * [[DedupStore.acceptNew]] against the durable all-time fingerprint
  * store with q34's exact canonical-hash recipe — so a document that
  * re-arrives from a later crawl is dropped as an exact duplicate
  * forever, across restarts. Corpus-level signals (benchmark
  * contamination) need the full corpus and stay batch operators.
  *
  * Delivery semantics by composition (the StreamingNearDup argument):
  * the quality verdict is a pure function of the row, so a replayed
  * batch re-judges identically; the store's land-before-commit ordering
  * makes the dedup leg idempotent, and fingerprints commit only after
  * `land` returns. Rejected rows are surfaced to `landRejected` WITH
  * their reason for audit — but are never stored, so a rejected row
  * re-delivered in a crash replay is simply re-judged (an append audit
  * sink may see it twice; filter on batch replay ids downstream if the
  * audit must be exactly-once).
  *
  * Scale shape: per batch, two codegen maps + the store's
  * fingerprint anti-join — O(batch) work against O(all-time) state,
  * the stream never self-joins.
  */
object StreamingCuration {

  /** The stateless quality verdict (q114's per-row prefix, exact cuts):
    * length below 100 chars, then English-stopword ratio below 5%. */
  def qualityReason(textCol: Column): Column = {
    val toks = TextOps.tokens(textCol)
    val stop = TextOps.tokenHits(toks, TextOps.StopwordsEn)
    when(length(textCol) < 100, "too_short")
      .when(stop / size(toks).cast("long") < 0.05, "low_stopword")
      .otherwise("kept")
  }

  /** q34's exact-dedup identity: sha256 of the whitespace-normalized,
    * lower-cased text. */
  def fingerprint(textCol: Column): Column =
    sha2(regexp_replace(lower(trim(textCol)), "\\s+", " "), 256)

  /** Start the gate. `land` receives each batch's accepted (kept AND
    * first-seen) rows; `landRejected` the quality-dropped rows plus a
    * `reason` column. Exact duplicates vanish inside the store leg.
    * Precedence deliberately INVERTS the batch gate's dup-first order:
    * quality must run before the store here, because the store may only
    * record fingerprints of rows that actually land — dup-first would
    * mark a quality-dropped doc's content as accepted forever. The kept
    * SET is identical under either order; only the dropped-reason label
    * of a low-quality clone differs (too_short here, exact_duplicate in
    * q114). */
  def sink(stream: DataFrame, storeRoot: String, idCol: String,
           textCol: String, landRejected: DataFrame => Unit = _ => ())
          (land: DataFrame => Unit): StreamingQuery = {
    // the gate's scratch verdict column: an input stream already carrying
    // this name would be silently overwritten and then dropped from landed
    // rows — fail loudly instead (the PrefixSum reserved-prefix contract)
    require(!stream.columns.contains("__reason"),
      "input stream may not carry a '__reason' column — it is the " +
        "curation gate's reserved scratch name")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val judged = batch.withColumn("__reason",
            qualityReason(col(textCol))).persist()
          judged.count()
          val rejected = judged.filter(col("__reason") =!= "kept")
            .withColumnRenamed("__reason", "reason")
          if (!rejected.isEmpty) landRejected(rejected)
          DedupStore.acceptNew(batch.sparkSession, storeRoot,
            judged.filter(col("__reason") === "kept").drop("__reason"),
            idCol, fingerprint(col(textCol)), land)
          judged.unpersist()
          batch.sparkSession.catalog.clearCache()
        }
        ()
      }
      .start()
  }
}
