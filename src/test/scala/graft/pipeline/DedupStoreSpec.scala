package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental dedup against the all-time fingerprint store: in-batch
  * dups collapse to the lowest id, cross-batch repeats are rejected, a
  * replayed batch is empty, and the store grows by exactly the accepted
  * fingerprints. */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  test("acceptNew rejects previously-seen text across batches and replays") {
    val root = Files.createTempDirectory("graft-fps").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))

    val b1 = Seq((1L, "Hello   World"), (2L, "unique one"),
      (3L, "hello world")) // 3 normalizes to the same text as 1
      .toDF("doc_id", "text")
    val a1 = DedupStore.acceptNew(spark, root, b1, "doc_id", fp)
    assert(a1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    val b2 = Seq((4L, "HELLO WORLD"), (5L, "brand new")).toDF("doc_id", "text")
    val a2 = DedupStore.acceptNew(spark, root, b2, "doc_id", fp)
    assert(a2.select("doc_id").as[Long].collect().toSet == Set(5L))

    // full replay of batch 2 contributes nothing
    assert(DedupStore.acceptNew(spark, root, b2, "doc_id", fp).isEmpty)

    val stored = AtomicRewrite.read(spark, root)
    assert(stored.count() == 3 && stored.distinct().count() == 3)
    spark.catalog.clearCache()
  }

  test("acceptThrough commits fingerprints only for rows the sink landed") {
    val root = Files.createTempDirectory("graft-fpt").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))
    val b1 = Seq((1L, "keep me"), (2L, "drop me downstream"))
      .toDF("doc_id", "text")
    // a nested stage (near-dup, policy filter...) rejects doc 2
    val landed = DedupStore.acceptThrough(spark, root, b1, "doc_id", fp) {
      df => df.filter(col("doc_id") =!= 2L)
    }
    assert(landed.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(AtomicRewrite.read(spark, root).count() == 1,
      "a never-landed row must leave no ghost fingerprint")
    // doc 2's content under a new id re-probes the pipeline instead of
    // being cut by a ghost — the downstream stage owns that reject
    val b2 = Seq((9L, "drop me downstream")).toDF("doc_id", "text")
    val a2 = DedupStore.acceptNew(spark, root, b2, "doc_id", fp)
    assert(a2.select("doc_id").as[Long].collect().toSet == Set(9L))
    spark.catalog.clearCache()
  }

  test("NULL-fingerprint rows are rejected and never pollute the store") {
    val root = Files.createTempDirectory("graft-fps3").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))
    val b1 = Seq((1L, Some("real doc")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val a1 = DedupStore.acceptNew(spark, root, b1, "doc_id", fp)
    assert(a1.select("doc_id").as[Long].collect().toSet == Set(1L))
    // a second NULL-text batch is also rejected — no once-per-batch leak —
    // and the store holds only real fingerprints
    val b2 = Seq((3L, None: Option[String])).toDF("doc_id", "text")
    assert(DedupStore.acceptNew(spark, root, b2, "doc_id", fp).isEmpty)
    val stored = AtomicRewrite.read(spark, root)
    assert(stored.count() == 1 && stored.filter(col("fingerprint").isNull).count() == 0)
    spark.catalog.clearCache()
  }

  test("forget removes a fingerprint, unblocks resubmission, carries untouched partitions") {
    val root = Files.createTempDirectory("graft-fps4").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))
    DedupStore.acceptNew(spark, root,
      Seq((1L, "doc alpha")).toDF("doc_id", "text"), "doc_id", fp)
    DedupStore.acceptNew(spark, root,
      Seq((2L, "doc beta")).toDF("doc_id", "text"), "doc_id", fp)
    // alpha lives in batch_seq=0 (v=0), beta in batch_seq=1
    val betaDir = new java.io.File(s"$root/v=1/batch_seq=1")
    assert(betaDir.exists())
    val betaFiles = betaDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet

    val alphaFp = Seq("doc alpha").toDF("text")
      .select(fp.as("fingerprint"))
    DedupStore.forget(spark, root, alphaFp)
    val stored = AtomicRewrite.read(spark, root)
    assert(stored.count() == 1, "only beta's fingerprint remains")
    // beta's partition was NOT restaged — its files are byte-untouched
    assert(betaDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet == betaFiles,
      "untouched batch partition was rewritten by forget")
    // resubmission of the forgotten content is accepted again
    val re = DedupStore.acceptNew(spark, root,
      Seq((9L, "DOC   ALPHA")).toDF("doc_id", "text"), "doc_id", fp)
    assert(re.select("doc_id").as[Long].collect().toSet == Set(9L))
    // forgetting something absent is a no-op (no new version)
    val v = AtomicRewrite.currentVersion(spark, root)
    DedupStore.forget(spark, root,
      Seq("never stored").toDF("text").select(fp.as("fingerprint")))
    assert(AtomicRewrite.currentVersion(spark, root) == v)
    spark.catalog.clearCache()
  }

  test("compact folds batch history into bounded buckets; dedup, forget and appends keep working") {
    val root = Files.createTempDirectory("graft-fps5").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))
    (1L to 4L).foreach(i => DedupStore.acceptNew(spark, root,
      Seq((i, s"doc number $i")).toDF("doc_id", "text"), "doc_id", fp))
    def liveDirs = {
      val v = AtomicRewrite.currentVersion(spark, root).get
      java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$root/v=$v/_PARTS"))
        .split("\n").filterNot(_.startsWith("#"))
        .map(_.split("\t")(1)).toSet
    }
    assert(liveDirs.size == 4, s"one dir per accepted batch: $liveDirs")

    // buckets=2: seqs fold mod 2 — dir count bounded, erasure stays
    // partition-granular at 1/buckets of the store
    DedupStore.compact(spark, root, buckets = 2)
    assert(liveDirs == Set("batch_seq=0", "batch_seq=1"),
      s"history must fold into the bucket set: $liveDirs")
    val stored = AtomicRewrite.read(spark, root)
    assert(stored.count() == 4 && stored.distinct().count() == 4)

    // buckets=1 is the full fold
    DedupStore.compact(spark, root, buckets = 1)
    assert(liveDirs == Set("batch_seq=0"), s"history must fold into one dir: $liveDirs")
    assert(AtomicRewrite.read(spark, root).count() == 4)

    // semantics survive the rebase: repeats still rejected, new accepted,
    // forget still partition-aware, later batches land in fresh dirs
    assert(DedupStore.acceptNew(spark, root,
      Seq((9L, "DOC NUMBER 2"), (10L, "post compact doc"))
        .toDF("doc_id", "text"), "doc_id", fp)
      .select("doc_id").as[Long].collect().toSet == Set(10L))
    assert(liveDirs.size == 2, "the new batch gets its own dir beside the folded one")
    assert(DedupStore.forget(spark, root,
      Seq("doc number 3").toDF("text").select(fp.as("fingerprint"))))
    assert(AtomicRewrite.read(spark, root).count() == 4)
    spark.catalog.clearCache()
  }

  test("a crash in the downstream land leaves the store unmarked — replay recovers") {
    val root = Files.createTempDirectory("graft-fps2").toString + "/store"
    def fp = DedupStore.textFingerprint(col("text"))
    val batch = Seq((1L, "only doc")).toDF("doc_id", "text")
    intercept[RuntimeException] {
      DedupStore.acceptNew(spark, root, batch, "doc_id", fp,
        land = _ => throw new RuntimeException("downstream sink died"))
    }
    // fingerprints were NOT committed before the land -> replay accepts
    val replay = DedupStore.acceptNew(spark, root, batch, "doc_id", fp)
    assert(replay.count() == 1, "crashed batch must be re-acceptable")
    assert(AtomicRewrite.read(spark, root).count() == 1)
    spark.catalog.clearCache()
  }
}
