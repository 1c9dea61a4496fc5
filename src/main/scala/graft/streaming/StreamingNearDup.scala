package graft.streaming

import graft.pipeline.NearDupStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming near-dup filter: every micro-batch flows through
  * [[NearDupStore.acceptNew]] against the durable all-time signature
  * store, and only first-seen (non-near-dup) documents reach the
  * downstream sink — the online front door of a training-data pipeline,
  * where the same document arrives again and again from different
  * crawls and only one copy may land.
  *
  * Exactly-once-per-content comes from composition, not the engine:
  * the store's land-before-commit ordering makes a crashed batch replay
  * idempotently (the sink must tolerate re-landing the same accepted
  * rows — an append sink plus the store's rejection of already-stored
  * content gives that), and signatures commit only after the sink call
  * returns. Scale shape is NearDupStore's: per batch, signature maps +
  * a band equi-join against the store — the stream never self-joins.
  */
object StreamingNearDup {

  def sink(stream: DataFrame, storeRoot: String, idCol: String,
           textCol: String, threshold: Double = 0.5)
          (land: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          NearDupStore.acceptNew(batch.sparkSession, storeRoot, batch,
            idCol, textCol, threshold, land)
          batch.sparkSession.catalog.clearCache()
        }
        ()
      }
      .start()
}
