package graft.streaming

import graft.pipeline.{Gdpr, GdprRequests}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import java.sql.Timestamp

/** Streaming right-to-be-forgotten: a live erasure-request feed drives
  * [[GdprRequests.runIncremental]] per micro-batch — the online twin of
  * the reference's request-driven propagation cycle
  * (gdpr/gdpr_propagate_erasure.py run on a scheduler), with the same
  * propagation order (derived stores forget BEFORE the table scrub
  * destroys the subject→content mapping) and the same audit trail.
  *
  * Exactly-once comes from composition, exactly as the batch cycle:
  * the control watermark on `processed_at` makes a replayed micro-batch
  * a no-op (requests at/below the mark are out of scope), a crash
  * mid-cycle leaves the watermark untouched so the whole request batch
  * re-scans, and every layer's erasure is idempotent — scrubs rewrite
  * to the same values, store forgets match nothing the second time.
  * Unlike the batch cycle's re-scanned table, a live feed's delivery
  * order can lag `processed_at` order ACROSS micro-batches (a slow
  * source partition behind a fast one), so the sink runs with a
  * bounded `latenessSeconds` window by default: requests stamped below
  * an already-advanced watermark but inside the window still erase
  * exactly once (id-level dedup against the processed-request log);
  * only a request later than the window is outside the contract — and
  * that bound is explicit, not a silent drop. Scale shape is
  * runIncremental's: per batch, one broadcast-subject scrub per policy
  * table and partition-granular store deletes, plus an O(window)
  * straggler anti-join.
  */
object StreamingGdpr {

  /** Start the sink. `now` is called once per non-empty micro-batch for
    * the audit/watermark timestamps (injectable for deterministic
    * replay tests); `latenessSeconds` is the allowed cross-batch
    * out-of-orderness of `processed_at` (see [[GdprRequests
    * .runIncremental]]). */
  def sink(requests: DataFrame, controlRoot: String,
           policiesFor: String => Seq[Gdpr.Policy],
           tableRoot: String => String, auditRoot: String, salt: String,
           storesFor: String => Seq[Gdpr.StoreErasure] = _ => Nil,
           now: () => Timestamp =
             () => new Timestamp(System.currentTimeMillis()),
           latenessSeconds: Long = 3600L): StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          GdprRequests.runIncremental(batch.sparkSession, controlRoot, batch,
            policiesFor, tableRoot, auditRoot, salt, now(), storesFor,
            latenessSeconds)
        ()
      }
      .start()
}
