package graft.pipeline

import graft.tx.Watermarks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Incremental GDPR request-feed wiring (reference
  * gdpr/gdpr_propagate_erasure.py:100-165 control table, :290-347
  * incremental request scan + subject normalization).
  *
  * The erasure job keeps its OWN control watermark (`last_processed_at`
  * per job, never-regress) in a dedicated control table, scans only
  * processed erasure requests newer than it, normalizes legacy
  * passenger-only rows to (subject_type, subject_id), propagates per
  * subject type through the policy catalog, and advances the watermark —
  * a FAIL records status without stepping on the previous mark, so the
  * failed batch is re-scanned next run.
  *
  * Scale: the request feed filter reaches the source scan (pushdown); the
  * per-type loop iterates over the bounded subject-type enum, never over
  * subjects; subject id-sets broadcast inside [[Gdpr.propagate]].
  */
object GdprRequests {

  val Job = "gdpr_propagate_erasure"

  /** Processed erasure requests newer than `since`, normalized to
    * (request_id, processed_at, subject_type, subject_id). Handles the
    * legacy shape where only `passenger_id` is populated. */
  def pendingRequests(requests: DataFrame, since: Option[Timestamp]): DataFrame =
    requests
      .filter(col("request_type") === "erasure" &&
        col("status") === "processed" &&
        col("processed_at").isNotNull &&
        since.map(ts => col("processed_at") > lit(ts)).getOrElse(lit(true)))
      // the passenger_id fallback applies ONLY to legacy-shape rows
      // (subject_type absent): a modern row typed 'driver' with a NULL
      // subject_id must be DROPPED, not resolved against the legacy
      // column — that would erase a passenger's id as a driver. A feed
      // without the legacy column at all (modern/streaming sources)
      // must not be forced to carry it just to satisfy the fallback.
      .withColumn("subject_id",
        when(col("subject_type").isNull,
          coalesce(col("subject_id"),
            if (requests.columns.contains("passenger_id"))
              col("passenger_id") else lit(null)))
          .otherwise(col("subject_id")).cast("long"))
      .withColumn("subject_type",
        coalesce(lower(col("subject_type")), lit("passenger")))
      .filter(col("subject_id").isNotNull)
      .select(col("request_id").cast("string").as("request_id"),
        col("processed_at").cast("timestamp").as("processed_at"),
        col("subject_type"), col("subject_id"))

  /** One incremental erasure cycle. Returns the number of requests
    * processed; the control watermark advances to max(processed_at) on
    * success, records FAIL (watermark untouched) on error.
    *
    * `storesFor` extends the propagation to the DERIVED corpus stores
    * (dedup fingerprints, MinHash signatures, ANN cells, published
    * training-shard epochs — [[TrainingShards.forgetMatched]]) per
    * subject type: one incoming erasure request then drives the
    * relational scrubs AND the store deletes in the same watermarked
    * cycle, with
    * [[Gdpr.forgetStores]]' per-store audit rows beside the table
    * rows — the reference's propagate-everywhere contract
    * (gdpr/gdpr_propagate_erasure.py) at full engine scope.
    *
    * Stores forget BEFORE propagate scrubs the tables: a
    * fingerprint-keyed store's erasure input derives from the subject's
    * CONTENT (text → fingerprint), and the only subject→content mapping
    * lives in the very tables propagate is about to rewrite — run after
    * the scrub, the closure would fingerprint '[ERASED]', match
    * nothing, and silently leave the ghost artifact matchable forever.
    * Id-keyed stores are order-insensitive, so stores-first is safe for
    * all.
    *
    * `latenessSeconds` is the bounded out-of-orderness allowance for
    * feeds whose delivery order can lag `processed_at` order (a slow
    * Kafka partition behind a fast one, a restarted source): the plain
    * watermark filter would drop a request stamped BELOW the mark a
    * faster sibling already advanced — silently, forever. With a
    * nonzero window, requests in `(wm - lateness, wm]` are also
    * considered, deduplicated against an append-only processed-request
    * log (id-level, order-insensitive), so a straggler inside the
    * window is erased exactly once and one outside it is an explicit
    * contract violation rather than a silent maybe. 0 (the default)
    * keeps the batch cycle's exact semantics and zero extra cost —
    * right when the feed is a re-scanned table whose rows never arrive
    * out of order. The anti-join filters the log to the window, so the
    * JOIN is O(window) rows; the log scan itself is O(cycles) small
    * files — fold it on cadence like the corpus stores if a deployment
    * ever runs enough cycles for the listing to matter (request feeds
    * are low-volume by nature). */
  def runIncremental(spark: SparkSession, controlRoot: String,
                     requests: DataFrame,
                     policiesFor: String => Seq[Gdpr.Policy],
                     tableRoot: String => String, auditRoot: String,
                     salt: String, now: Timestamp,
                     storesFor: String => Seq[Gdpr.StoreErasure] =
                       _ => Nil,
                     latenessSeconds: Long = 0L): Long = {
    val wm = Watermarks.read(spark, controlRoot, Job)
    val idLog = s"$controlRoot-requests"
    val fresh = pendingRequests(requests, wm)
    val pending = (wm match {
      case Some(w) if latenessSeconds > 0 =>
        val floor = new Timestamp(w.getTime - latenessSeconds * 1000)
        val inWindow = pendingRequests(requests, Some(floor))
          .filter(col("processed_at") <= lit(w))
        val stragglers =
          if (graft.tx.AppendLog.exists(spark, idLog))
            inWindow.join(
              graft.tx.AppendLog.read(spark, idLog)
                .filter(col("processed_at") > lit(floor))
                .select("request_id"),
              Seq("request_id"), "left_anti")
          else inWindow
        fresh.unionByName(stragglers)
      case _ => fresh
    }).cache()
    try {
      val stats = pending.agg(count(lit(1)), max(col("processed_at"))).head()
      if (stats.getLong(0) == 0L) {
        Watermarks.advance(spark, controlRoot, Job, None, "OK:empty", now)
        return 0L
      }
      val types = pending.select("subject_type").distinct()
        .collect().map(_.getString(0)).sorted
      types.foreach { st =>
        val subjects = pending.filter(col("subject_type") === st)
          .select("subject_id").distinct()
        val stores = storesFor(st)
        if (stores.nonEmpty)
          Gdpr.forgetStores(spark, subjects, st, stores, auditRoot, salt, now)
        Gdpr.propagate(spark, subjects, st, policiesFor(st),
          tableRoot, auditRoot, salt, now)
      }
      // the straggler dedup log records every processed request id; a
      // crash between this append and the advance is benign (fresh
      // requests re-process idempotently, stragglers dedup on the log)
      if (latenessSeconds > 0)
        graft.tx.AppendLog.append(spark, idLog,
          pending.select("request_id", "processed_at"))
      Watermarks.advance(spark, controlRoot, Job,
        Option(stats.getTimestamp(1)), "OK", now)
      stats.getLong(0)
    } catch {
      case e: Exception =>
        Watermarks.advance(spark, controlRoot, Job, None,
          s"FAIL:${e.getClass.getSimpleName}", now)
        throw e
    } finally pending.unpersist()
  }
}
