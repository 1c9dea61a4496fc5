package graft.streaming

import graft.SparkSpec
import graft.pipeline.{AnnIndexStore, IndexStore, NearDupStore, Scd2}
import graft.tx.AtomicRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.sql.Timestamp

/** The batch-vs-stream equivalence CONTRACT: a corpus ingested as
  * micro-batches through a `graft.streaming` sink must leave every
  * store table CONTENT-equal to the same slices folded through the
  * batch entry points in the same order. The sinks are thin wrappers
  * over the batch code (one code path by design) — these specs pin
  * that the wrapper never reorders, merges, splits, or re-evaluates a
  * batch, and that foreachBatch session handling (clearCache, lazy
  * frames) cannot drift the store. Content-equal, not byte-equal:
  * physical bytes differ by commit UUIDs/mtimes on ANY two runs; the
  * row multiset per table is the meaningful statement.
  *
  * One test per ingest family, per the round-15 order: silver (SCD2),
  * near-dup front door, BM25 index, ANN index. */
class BatchStreamEquivalenceSpec extends SparkSpec {
  import EventStreams.Event
  import spark.implicits._

  /** Row-multiset digest of a committed table (sorted row renderings —
    * array columns render deterministically). */
  private def digest(root: String): Seq[String] =
    AtomicRewrite.read(spark, root).collect().map(_.toString).sorted.toSeq

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-eq-$tag").toString

  test("silver SCD2: streamed slices hash-equal the batch fold") {
    val keys = Seq("user_id"); val biz = Seq("event_type")
    val tsCol = "ts"; val order = Seq("ts", "event_id")
    def ev(id: Long, t: String, user: Long, typ: String) =
      Event(id, Timestamp.valueOf(t), user, typ, 1.0)
    val slice1 = Seq(ev(1, "2024-01-01 10:00:00", 1L, "browse"),
      ev(2, "2024-01-01 10:01:00", 2L, "browse"))
    val slice2 = Seq(ev(3, "2024-01-01 11:00:00", 1L, "buy"),
      ev(4, "2024-01-01 11:30:00", 3L, "browse"))

    // batch fold: the sink's own body applied per slice
    val bRoot = tmp("silver-b") + "/t"
    Seq(slice1, slice2).foreach { s =>
      val prepared = Scd2.prepare(s.toDF(), biz, tsCol)
      val hist =
        if (AtomicRewrite.exists(spark, bRoot)) AtomicRewrite.read(spark, bRoot)
        else prepared.limit(0)
      AtomicRewrite.write(spark, bRoot, Scd2.apply(hist, prepared, keys, order))
    }

    // streamed: same slices as micro-batches
    implicit val sqlCtx = spark.sqlContext
    val sRoot = tmp("silver-s") + "/t"
    val in = MemoryStream[Event]
    val q = StreamingSilver.scd2Sink(in.toDF(), sRoot, keys, biz, tsCol, order)
    try {
      in.addData(slice1: _*); q.processAllAvailable()
      in.addData(slice2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(digest(sRoot) == digest(bRoot))
  }

  test("near-dup front door: streamed slices hash-equal the batch fold, landed sets equal") {
    val slice1 = Seq(Doc(1L, "red line trains run fast today"),
      Doc(2L, "blue line trams crawl slow today"))
    // 3 near-dups 1 (one token changed), 4 is fresh
    val slice2 = Seq(Doc(3L, "red line trains run fast tonight"),
      Doc(4L, "harbour ferries cross twice daily"))

    val bRoot = tmp("nd-b") + "/store"
    val bLanded = scala.collection.mutable.ArrayBuffer[Long]()
    Seq(slice1, slice2).foreach { s =>
      NearDupStore.acceptNew(spark, bRoot, s.toDF(), "doc_id", "text", 0.5,
        landed => bLanded ++= landed.select("doc_id").as[Long].collect())
      spark.catalog.clearCache()
    }

    implicit val sqlCtx = spark.sqlContext
    val sRoot = tmp("nd-s") + "/store"
    val sLanded = scala.collection.mutable.ArrayBuffer[Long]()
    val in = MemoryStream[Doc]
    val q = StreamingNearDup.sink(in.toDF(), sRoot, "doc_id", "text", 0.5)(
      landed => sLanded ++= landed.select("doc_id").as[Long].collect())
    try {
      in.addData(slice1: _*); q.processAllAvailable()
      in.addData(slice2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(sLanded.sorted == bLanded.sorted)
    assert(digest(sRoot) == digest(bRoot))
  }

  test("BM25 index: streamed slices hash-equal the batch fold across all three tables") {
    val base = Seq((1L, "red line trains run fast"),
      (2L, "blue line trams crawl slow"))
    val slice1 = Seq(Doc(3L, "harbour ferries cross twice daily"))
    // slice 2 corrects doc 3 and adds doc 4
    val slice2 = Seq(Doc(3L, "night owl coaches replace them"),
      Doc(4L, "weekend closures on the loop"))

    val bRoot = tmp("idx-b") + "/index"
    IndexStore.build(spark, bRoot, base.toDF("doc_id", "text"))
    Seq(slice1, slice2).foreach { s =>
      IndexStore.append(spark, bRoot, s.toDF().select("doc_id", "text"))
      spark.catalog.clearCache()
    }

    implicit val sqlCtx = spark.sqlContext
    val sRoot = tmp("idx-s") + "/index"
    IndexStore.build(spark, sRoot, base.toDF("doc_id", "text"))
    val in = MemoryStream[Doc]
    val q = StreamingIndexIngest.sink(in.toDF(), sRoot)
    try {
      in.addData(slice1: _*); q.processAllAvailable()
      in.addData(slice2: _*); q.processAllAvailable()
    } finally q.stop()

    val (bp, sp) = (IndexStore.Paths(bRoot), IndexStore.Paths(sRoot))
    assert(digest(sp.postings) == digest(bp.postings))
    assert(digest(sp.docstats) == digest(bp.docstats))
    assert(digest(sp.stats) == digest(bp.stats))
  }

  test("ANN index: streamed slices hash-equal the batch fold across all three tables") {
    def v(id: Long, seed: Int): Vec =
      Vec(id, (0 until 8).map(i => ((seed * 31 + i * 7) % 13 - 6) / 6.0f))
    val base = Seq(v(1, 1), v(2, 2), v(3, 3)).toDF()
    val cents = Seq((0, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1, Seq(-1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("centroid_id", "cv")
    val slice1 = Seq(v(10, 4), v(11, 5))
    val slice2 = Seq(v(11, 6), v(12, 7)) // 11 redelivered corrected

    val bRoot = tmp("ann-b") + "/index"
    AnnIndexStore.build(spark, bRoot, base, cents)
    Seq(slice1, slice2).foreach { s =>
      AnnIndexStore.append(spark, bRoot, s.toDF().select("vec_id", "embedding"))
      spark.catalog.clearCache()
    }

    implicit val sqlCtx = spark.sqlContext
    val sRoot = tmp("ann-s") + "/index"
    AnnIndexStore.build(spark, sRoot, base, cents)
    val in = MemoryStream[Vec]
    val q = StreamingAnnIngest.sink(in.toDF(), sRoot)
    try {
      in.addData(slice1: _*); q.processAllAvailable()
      in.addData(slice2: _*); q.processAllAvailable()
    } finally q.stop()

    val (bp, sp) = (AnnIndexStore.Paths(bRoot), AnnIndexStore.Paths(sRoot))
    assert(digest(sp.cells) == digest(bp.cells))
    assert(digest(sp.vecmap) == digest(bp.vecmap))
    assert(digest(sp.centroids) == digest(bp.centroids))
  }
}
