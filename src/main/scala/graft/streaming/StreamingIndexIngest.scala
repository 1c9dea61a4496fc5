package graft.streaming

import graft.pipeline.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion into the persisted BM25 index: every micro-batch
  * of (`doc_id`, `text`) rows flows through [[IndexStore.append]] —
  * the batch's doc ids are erased first (replacement semantics), then
  * only the token-hash buckets the new postings land in are rewritten.
  * The online half of a retrieval pipeline: documents become queryable
  * the moment their batch commits, with the same store serving query
  * batches concurrently (readers resolve the `_LATEST` pointer, so a
  * mid-commit search sees the previous consistent snapshot).
  *
  * Idempotence comes from the store, not the engine: a crashed batch
  * replay erases-then-reinserts the same doc ids, so at-least-once
  * delivery yields exactly-once postings — and a CORRECTED document
  * redelivered with new content replaces its old postings everywhere,
  * never ghost-matching stale tokens. Scale shape is append's: per
  * batch, one tokenize + keyed count and O(touched buckets) rewritten
  * bytes — the stream never scans the index. */
object StreamingIndexIngest {

  def sink(stream: DataFrame, indexRoot: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          IndexStore.append(batch.sparkSession, indexRoot,
            batch.select("doc_id", "text"))
          batch.sparkSession.catalog.clearCache()
        }
        ()
      }
      .start()
}
