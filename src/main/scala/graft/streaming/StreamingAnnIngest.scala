package graft.streaming

import graft.pipeline.AnnIndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion into the persisted IVF index: every micro-batch
  * of (`vec_id`, `embedding`) rows flows through
  * [[AnnIndexStore.append]] — assignment against the FIXED broadcast
  * centroid set, then a partition commit of ONLY the touched cells.
  * The online half of an embedding pipeline: vectors become queryable
  * the moment their batch commits, with the same store serving batch
  * probes concurrently (readers resolve the `_LATEST` pointer, so a
  * mid-commit probe sees the previous consistent snapshot).
  *
  * Idempotence comes from the store, not the engine: a crashed batch
  * replay re-assigns the same vec_ids and [[AnnIndexStore.append]]
  * replaces rather than duplicates them inside their cells, so
  * at-least-once delivery yields exactly-once index state. Scale shape
  * is append's: per batch, a narrow argmax against K broadcast
  * centroids and O(touched cells) rewritten bytes — the stream never
  * scans the corpus. */
object StreamingAnnIngest {

  def sink(stream: DataFrame, indexRoot: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          AnnIndexStore.append(batch.sparkSession, indexRoot,
            batch.select("vec_id", "embedding"))
          batch.sparkSession.catalog.clearCache()
        }
        ()
      }
      .start()
}
