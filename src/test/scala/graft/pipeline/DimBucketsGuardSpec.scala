package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** The hash-bucket count of a bucketed layout is a TABLE-LIFETIME
  * constant (hive-bucketing semantics): a partition-sliced merge
  * computed with a different count remaps keys across dirs and corrupts
  * the table silently. The manifest records the count and every bucketed
  * partition commit must declare a matching one — a mismatch must THROW
  * before anything is staged, and a full rewrite (the legal migration
  * path) must be able to change it. */
class DimBucketsGuardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("writePartitions refuses a bucket count differing from the manifest") {
    val root = Files.createTempDirectory("graft-bguard").toString + "/dim"
    val rows = Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "x", "key_bucket")
    AtomicRewrite.write(spark, root, rows, Seq("key_bucket"),
      bucketCount = Some(8))
    assert(AtomicRewrite.bucketCountOf(spark, root).contains(8))

    // complete new contents of the bucket-1 dir (partition replacement)
    val patch = Seq((2L, "b", 1), (3L, "c", 1)).toDF("id", "x", "key_bucket")
    val e = intercept[IllegalArgumentException] {
      AtomicRewrite.writePartitions(spark, root, patch, Seq("key_bucket"),
        bucketCount = Some(4))
    }
    assert(e.getMessage.contains("table-lifetime constant"), e.getMessage)
    // the refused commit staged nothing: table unchanged and readable
    assert(AtomicRewrite.read(spark, root).count() == 2)

    // the matching count commits fine and re-records itself
    AtomicRewrite.writePartitions(spark, root, patch, Seq("key_bucket"),
      bucketCount = Some(8))
    assert(AtomicRewrite.read(spark, root).count() == 3)
    assert(AtomicRewrite.bucketCountOf(spark, root).contains(8))
  }

  test("layout-oblivious full rewrite carries the recorded count; an explicit one migrates it") {
    val root = Files.createTempDirectory("graft-bguard-carry").toString + "/dim"
    val rows = Seq((1L, "a", 0)).toDF("id", "x", "key_bucket")
    AtomicRewrite.write(spark, root, rows, Seq("key_bucket"),
      bucketCount = Some(8))
    // a GDPR-scrub-shaped rewrite (no partitionBy, no bucketCount) must
    // not drop the recorded count
    AtomicRewrite.write(spark, root,
      AtomicRewrite.read(spark, root).withColumn("x", lit("scrubbed")))
    assert(AtomicRewrite.bucketCountOf(spark, root).contains(8))
    // a full rewrite DECLARING a new count is the legal migration
    AtomicRewrite.write(spark, root, rows, Seq("key_bucket"),
      bucketCount = Some(16))
    assert(AtomicRewrite.bucketCountOf(spark, root).contains(16))
  }

  test("a gold dim merge with a mismatched bucket constant throws instead of corrupting") {
    val root = Files.createTempDirectory("graft-bguard-dim").toString
    val paths = Medallion.Paths(root)
    val conf = Medallion.SilverConf(entity = "thing", keys = Seq("id"),
      businessCols = Seq("x"))
    def batch(n: Int, day: String): Unit = {
      val now = ts(s"2024-01-0$day 10:00:00")
      Medallion.bronzeLoad(spark, paths, "thing",
        Seq((n.toLong, s"v$n", s"2024-01-0$day 00:00:00")).toDF("id", "x", "updated_at")
          .withColumn("updated_at", to_timestamp(col("updated_at"))),
        "updated_at", s"b$n", now)
      Medallion.silverScd2(spark, paths, conf, now)
    }
    batch(1, "1")
    Medallion.goldScd1Snapshot(spark, paths, "thing", Seq("id"),
      ts("2024-01-01 10:00:00"), buckets = 8)
    batch(2, "2")
    val e = intercept[Exception] {
      Medallion.goldScd1Snapshot(spark, paths, "thing", Seq("id"),
        ts("2024-01-02 10:00:00"), buckets = 4)
    }
    assert(e.getMessage.contains("table-lifetime constant"),
      s"expected the bucket guard, got: ${e.getMessage}")
    // correct constant still merges
    Medallion.goldScd1Snapshot(spark, paths, "thing", Seq("id"),
      ts("2024-01-02 10:00:00"), buckets = 8)
    val dim = AtomicRewrite.read(spark, paths.gold("dim_thing_snapshot"))
    assert(dim.count() == 2)
  }
}
