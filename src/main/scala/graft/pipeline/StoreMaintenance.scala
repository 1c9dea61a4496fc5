package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operational maintenance shared by the batch-partitioned corpus stores
  * ([[DedupStore]], [[NearDupStore]]).
  *
  * Their append-only commits put each accepted batch's rows into a fresh
  * `batch_seq` hive partition — the property that keeps a commit O(batch)
  * — but the partition-DIR count then grows by one per batch forever:
  * after 10⁵ accepted batches every read lists 10⁵ dirs before scanning a
  * byte (the small-files problem one level up). [[AtomicRewrite.compact]]
  * collapses files and manifests but preserves the hive layout, so it
  * cannot shrink the dir count; the fix is a REBASE that folds all
  * history into partition 0. */
object StoreMaintenance {

  /** Fold the historic `batch_seq` partitions into at most `buckets`
    * dirs (batch_seq mod buckets): a single O(store) rewrite, amortized
    * on cadence, after which reads list ≤ buckets dirs plus one per
    * subsequent batch. Store semantics are unchanged — `batch_seq` is
    * commit bookkeeping, not data: later accepts keep appending fresh
    * partitions (their seq derives from the table VERSION, which only
    * moves forward, and the fold only ever DECREASES a seq, so a folded
    * dir can never collide with a future batch's), and `forget` keeps
    * rewriting only the partitions that hold a match.
    *
    * `buckets` is the dir-count / erasure-granularity dial: after the
    * fold a forget that matches pre-fold data rewrites whole buckets —
    * O(store/buckets) each — where the unfolded layout rewrote only the
    * matched batch dirs. buckets=1 minimizes listing cost but makes the
    * next historic forget a full-store rewrite; the default keeps
    * listing O(16) while erasure stays ≤ 1/16 of the store per touched
    * bucket. */
  def rebaseBatchPartitions(spark: SparkSession, storeRoot: String,
                            buckets: Int = 16): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    if (!AtomicRewrite.exists(spark, storeRoot)) return
    AtomicRewrite.write(spark, storeRoot,
      AtomicRewrite.read(spark, storeRoot)
        .withColumn("batch_seq",
          pmod(col("batch_seq"), lit(buckets)).cast("int")),
      partitionBy = Seq("batch_seq"))
  }
}
