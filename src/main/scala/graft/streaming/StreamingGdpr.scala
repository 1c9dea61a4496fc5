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
  * Scale shape is runIncremental's: per batch, one broadcast-subject
  * scrub per policy table and partition-granular store deletes.
  */
object StreamingGdpr {

  /** Start the sink. `now` is called once per non-empty micro-batch for
    * the audit/watermark timestamps (injectable for deterministic
    * replay tests). */
  def sink(requests: DataFrame, controlRoot: String,
           policiesFor: String => Seq[Gdpr.Policy],
           tableRoot: String => String, auditRoot: String, salt: String,
           storesFor: String => Seq[Gdpr.StoreErasure] = _ => Nil,
           now: () => Timestamp =
             () => new Timestamp(System.currentTimeMillis())): StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          GdprRequests.runIncremental(batch.sparkSession, controlRoot, batch,
            policiesFor, tableRoot, auditRoot, salt, now(), storesFor)
        ()
      }
      .start()
}
