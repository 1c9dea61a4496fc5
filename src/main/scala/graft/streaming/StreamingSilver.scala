package graft.streaming

import graft.pipeline.Scd2
import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion into the medallion's transactional tables: each
  * micro-batch folds through the SAME one-pass SCD2 merge + versioned
  * snapshot commit the batch pipeline uses — one code path for batch
  * backfill and continuous ingestion (the streaming upgrade path the
  * reference's batch watermark loop approximates).
  *
  * Exactly-once: AtomicRewrite's pointer swap commits a whole snapshot per
  * micro-batch; a replayed batch is a no-op thanks to the SCD2 hash
  * short-circuit, so at-least-once delivery still converges.
  */
object StreamingSilver {

  def scd2Sink(stream: DataFrame, root: String, keys: Seq[String],
               businessCols: Seq[String], tsCol: String,
               orderCols: Seq[String]): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val prepared = Scd2.prepare(batch, businessCols, tsCol)
          val hist =
            if (AtomicRewrite.exists(spark, root)) AtomicRewrite.read(spark, root)
            else prepared.limit(0)
          AtomicRewrite.write(spark, root,
            Scd2.apply(hist, prepared, keys, orderCols))
        }
        ()
      }
      .start()
}
