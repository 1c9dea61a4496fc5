package graft.streaming

import graft.pipeline.Medallion
import graft.tx.{AtomicRewrite, Upsert}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous gold maintenance: each micro-batch merges into the gold
  * fact snapshot and then refreshes the incremental aggregate through the
  * SAME [[Medallion.goldAggIncremental]] path the batch pipeline uses —
  * the affected-slice recompute + guarded merge is one code path whether
  * rows arrive by backfill or by stream (round-1 backlog item; the
  * reference approximates this with its batch watermark loop).
  *
  * Exactly-once: the fact merge is keyed and guarded by newer
  * raw_loaded_at, and the aggregate's own watermark skips already-folded
  * rows, so an at-least-once replayed micro-batch converges to the same
  * snapshots.
  *
  * Scale: state lives in the tables, not in streaming state — each
  * micro-batch shuffles only on the fact key and recomputes only its
  * affected grain slices.
  */
object StreamingGold {

  /** Fold `stream` (rows shaped like the gold fact, carrying
    * `raw_loaded_at`) into `factName` and keep `aggName` fresh at the
    * `grainCols` grain. */
  def aggSink(stream: DataFrame, paths: Medallion.Paths, factName: String,
              aggName: String, keys: Seq[String], grainCols: Seq[String],
              aggs: Seq[Column]): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val factRoot = paths.gold(factName)
          // latest-per-key FIRST: a micro-batch can carry several updates
          // to one key, and Upsert.scd1's full-outer join would emit one
          // output row per source duplicate — permanently duplicating the
          // key in the fact (same dedup every other fact path does)
          val latest = graft.ops.Dedup.latestPerKey(batch,
            keys.map(org.apache.spark.sql.functions.col),
            Seq(org.apache.spark.sql.functions.col("raw_loaded_at").desc))
          val fact =
            if (!AtomicRewrite.exists(spark, factRoot)) latest
            else Upsert.scd1(AtomicRewrite.read(spark, factRoot), latest, keys,
              updateWhen = (t, s) => s("raw_loaded_at") > t("raw_loaded_at"))
          AtomicRewrite.write(spark, factRoot, fact)
          Medallion.goldAggIncremental(spark, paths, aggName,
            AtomicRewrite.read(spark, factRoot), grainCols, aggs)
        }
        ()
      }
      .start()
}
