package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental near-dup store: in-batch near-dups collapse to the lowest
  * id, cross-batch near-dups are rejected against the all-time signature
  * store, replays contribute nothing, NULL texts are rejected, and the
  * land-before-commit crash ordering recovers. */
class NearDupStoreSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val nearBase =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val other =
    "one two three four five six seven eight nine ten eleven twelve"
  private val otherNear =
    "one two three four five six seven eight nine ten eleven thirteen"

  test("in-batch collapse, cross-batch rejection, replay no-op, NULL rejection") {
    val root = Files.createTempDirectory("graft-nds").toString + "/store"

    // batch 1: 2 is a near-dup of 1; 3 is unrelated; 4 has NULL text
    val b1 = Seq((1L, Some(base)), (2L, Some(nearBase)), (3L, Some(other)),
      (4L, None: Option[String])).toDF("doc_id", "text")
    val a1 = NearDupStore.acceptNew(spark, root, b1, "doc_id", "text")
    assert(a1.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(AtomicRewrite.read(spark, root).count() == 2)

    // batch 2: 10 near-dups the stored 3; 11 is new
    val b2 = Seq((10L, Some(otherNear)), (11L, Some("completely different text " +
      "with many fresh words nobody wrote before today"))).toDF("doc_id", "text")
    val a2 = NearDupStore.acceptNew(spark, root, b2, "doc_id", "text")
    assert(a2.select("doc_id").as[Long].collect().toSet == Set(11L))

    // replay of batch 2: 11 is now its own stored near-dup (est = 1.0)
    val a3 = NearDupStore.acceptNew(spark, root, b2, "doc_id", "text")
    assert(a3.isEmpty)
    assert(AtomicRewrite.read(spark, root).count() == 3)
    spark.catalog.clearCache()
  }

  test("forget drops a signature, unblocks near-dup resubmission, carries partitions") {
    val root = Files.createTempDirectory("graft-nds3").toString + "/store"
    NearDupStore.acceptNew(spark, root,
      Seq((1L, Some(base))).toDF("doc_id", "text"), "doc_id", "text")
    NearDupStore.acceptNew(spark, root,
      Seq((2L, Some(other))).toDF("doc_id", "text"), "doc_id", "text")
    val otherDir = new java.io.File(s"$root/v=1/batch_seq=1")
    assert(otherDir.exists())
    val otherFiles = otherDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet

    // a near-dup of doc 1 is rejected while its signature is stored...
    assert(NearDupStore.acceptNew(spark, root,
      Seq((5L, Some(nearBase))).toDF("doc_id", "text"), "doc_id", "text").isEmpty)
    // ...then doc 1 exercises its right to be forgotten
    NearDupStore.forget(spark, root, Seq(1L).toDF("doc_id"))
    assert(AtomicRewrite.read(spark, root)
      .select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(otherDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet == otherFiles,
      "untouched batch partition was rewritten by forget")
    // the same near-dup content is acceptable again
    val re = NearDupStore.acceptNew(spark, root,
      Seq((6L, Some(nearBase))).toDF("doc_id", "text"), "doc_id", "text")
    assert(re.select("doc_id").as[Long].collect().toSet == Set(6L))
    // forgetting an absent id is a no-op
    val v = AtomicRewrite.currentVersion(spark, root)
    NearDupStore.forget(spark, root, Seq(999L).toDF("doc_id"))
    assert(AtomicRewrite.currentVersion(spark, root) == v)
    spark.catalog.clearCache()
  }

  test("compact folds batch partitions into one; near-dup rejection survives") {
    val root = Files.createTempDirectory("graft-nds-c").toString + "/store"
    NearDupStore.acceptNew(spark, root,
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text")
    NearDupStore.acceptNew(spark, root,
      Seq((2L, other)).toDF("doc_id", "text"), "doc_id", "text")
    NearDupStore.compact(spark, root, buckets = 1)
    val v = AtomicRewrite.currentVersion(spark, root).get
    val dirs = new java.io.File(s"$root/v=$v").listFiles()
      .filter(_.getName.startsWith("batch_seq=")).map(_.getName).toSet
    assert(dirs == Set("batch_seq=0"), s"history must fold into one dir: $dirs")
    assert(AtomicRewrite.read(spark, root).count() == 2)
    // the folded store still rejects near-dups of everything ever accepted
    assert(NearDupStore.acceptNew(spark, root,
      Seq((9L, otherNear)).toDF("doc_id", "text"), "doc_id", "text").isEmpty)
    spark.catalog.clearCache()
  }

  test("a crash in land leaves the store unmarked — replay recovers") {
    val root = Files.createTempDirectory("graft-nds2").toString + "/store"
    val batch = Seq((1L, Some(base))).toDF("doc_id", "text")
    intercept[RuntimeException] {
      NearDupStore.acceptNew(spark, root, batch, "doc_id", "text",
        land = _ => throw new RuntimeException("sink died"))
    }
    val replay = NearDupStore.acceptNew(spark, root, batch, "doc_id", "text")
    assert(replay.count() == 1)
    assert(AtomicRewrite.read(spark, root).count() == 1)
    spark.catalog.clearCache()
  }

  test("no pair-forming plan degrades to a cartesian or nested-loop join") {
    // the 100 TB property as an assertion: every candidate pair comes
    // from an EQUI-join on (band_idx, bh) — in-batch AND against the
    // store. A refactor that loses the band keys would still pass the
    // value checks above (est-Jaccard filters the blow-up away) while
    // silently going O(n^2); this listener catches it at plan level.
    val plans = scala.collection.concurrent.TrieMap.empty[Int, String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.put(System.identityHashCode(qe), qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val root = Files.createTempDirectory("graft-nds3").toString + "/store"
      // both code paths: the in-batch collapse and the store probe
      NearDupStore.acceptNew(spark, root,
        Seq((1L, base), (2L, nearBase), (3L, other)).toDF("doc_id", "text"),
        "doc_id", "text").unpersist()
      NearDupStore.acceptNew(spark, root,
        Seq((10L, otherNear), (11L, "fresh words nobody used before " +
          "in any of the earlier documents today")).toDF("doc_id", "text"),
        "doc_id", "text").unpersist()
      // QueryExecutionListener delivery is async — poll until stable
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
      }
    } finally spark.listenerManager.unregister(listener)
    assert(plans.nonEmpty, "the listener must have captured executions")
    val bad = plans.values.filter(p =>
      p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
    assert(bad.isEmpty,
      s"pair-forming degraded to a product join:\n${bad.headOption.getOrElse("").take(3000)}")
    spark.catalog.clearCache()
  }
}
