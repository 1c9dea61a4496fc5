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

  /** Fold every historic `batch_seq` partition into one (batch_seq = 0):
    * a single O(store) rewrite, amortized on cadence, after which reads
    * list one dir plus one per subsequent batch. Store semantics are
    * unchanged — `batch_seq` is commit bookkeeping, not data: later
    * accepts keep appending fresh partitions (their seq derives from the
    * table VERSION, which only moves forward), and `forget` keeps
    * rewriting only the partitions that hold a match. */
  def rebaseBatchPartitions(spark: SparkSession, storeRoot: String): Unit = {
    if (!AtomicRewrite.exists(spark, storeRoot)) return
    AtomicRewrite.write(spark, storeRoot,
      AtomicRewrite.read(spark, storeRoot)
        .withColumn("batch_seq", lit(0).cast("int")),
      partitionBy = Seq("batch_seq"))
  }
}
