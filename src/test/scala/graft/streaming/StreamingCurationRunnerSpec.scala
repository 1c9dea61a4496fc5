package graft.streaming

import graft.SparkSpec
import graft.pipeline.{CurationRunner, IndexStore, TrainingShards}
import graft.tx.AtomicRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** The streaming front door of the composed curation pipeline: every
  * micro-batch ingests through the full [[CurationRunner]] cycle
  * (gate → dedup → corpus landing → BM25 append), releases ride the
  * publish cadence, and the runner's watermark contract turns the
  * engine's at-least-once delivery into exactly-once state. */
class StreamingCurationRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def longText(tag: String): String =
    s"the $tag line of the network is a story of the morning " +
      s"and the $tag crews in the yard keep it moving to a plan " +
      s"that is part of the daily schedule of the city"

  private def q1(terms: String*) =
    Seq((900L, terms)).toDF("query_id", "terms")

  test("ingest-only cadence publishes on schedule; duplicates and rejects never land") {
    val root = Files.createTempDirectory("graft-scur").toString + "/rel"
    val p = CurationRunner.Paths(root)
    // the full kept mass: this test pins the cadence/dedup semantics,
    // not the budget cut, and a doc may land in the 10% holdout split
    // by id-hash — a partial share could then select nothing
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // publish every SECOND micro-batch: epoch 0 ingest-only, epoch 1
    // releases, ... — the ingest-vs-release cadence split
    val q = StreamingCurationRunner.sink(in.toDF(), root, conf,
      publishEvery = 2)
    try {
      // epoch 0: ingest-only — corpus + index land (rejects land TOO,
      // carrying their verdict for audit), NO curated epoch yet
      in.addData(Doc(1L, longText("red")), Doc(2L, "tiny doc"))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, p.corpus)
        .filter(col("keep"))
        .select("doc_id").as[Long].collect().toSet == Set(1L),
        "only doc 1 may carry a keep verdict")
      assert(IndexStore.query(spark, root + "/index", q1("red"))
        .select("doc_id").as[Long].collect().toSet == Set(1L),
        "an ingested doc must be retrievable before any release")
      assert(AtomicRewrite.currentVersion(spark, p.curated).isEmpty,
        "an ingest-only epoch must not publish")

      // epoch 1: carries an exact dup of doc 1 plus a fresh doc, and
      // RELEASES — the curated epoch folds the epoch-0 backlog in
      in.addData(Doc(3L, longText("red")), Doc(4L, longText("blue")))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, p.corpus)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L),
        "the all-time fingerprint store must reject cross-batch dups")
      val curated = CurationRunner.readCurated(spark, root)
        .select("doc_id").as[Long].collect().toSet
      assert(curated.subsetOf(Set(1L, 4L)) && curated.nonEmpty)
      assert(AtomicRewrite.read(spark,
        TrainingShards.Paths(p.shards).manifest).count() > 0,
        "the release must publish a shard epoch")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("crash replay of a committed epoch is a byte-identical no-op") {
    val root = Files.createTempDirectory("graft-scur-r").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)
    val epoch0 = Timestamp.valueOf("2024-01-01 00:00:00")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCurationRunner.sink(in.toDF(), root, conf,
      publishEvery = 1, epoch0 = epoch0)
    try {
      in.addData(Doc(1L, longText("red")), Doc(2L, longText("blue")))
      q.processAllAvailable()
    } finally q.stop()
    val before = Seq(p.control, p.dedupStore, p.corpus, p.curated)
      .map(AtomicRewrite.currentVersion(spark, _))

    // a restarted stream re-delivers epoch 0 (at-least-once): same
    // epoch id -> same asOf -> the watermark guard makes it a FULL
    // no-op, burning zero versions anywhere
    val in2 = MemoryStream[Doc]
    val q2 = StreamingCurationRunner.sink(in2.toDF(), root, conf,
      publishEvery = 1, epoch0 = epoch0)
    try {
      in2.addData(Doc(1L, longText("red")), Doc(2L, longText("blue")))
      q2.processAllAvailable()
    } finally q2.stop()
    val after = Seq(p.control, p.dedupStore, p.corpus, p.curated)
      .map(AtomicRewrite.currentVersion(spark, _))
    assert(after == before,
      s"replayed epoch burned a version: $before -> $after")
    spark.catalog.clearCache()
  }

  test("a stream carrying embeddings rides them into the ANN store; corpus stays blob-free") {
    val root = Files.createTempDirectory("graft-scur-v").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      annK = 2, annIters = 1)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Array[Float])]
    val q = StreamingCurationRunner.sink(
      in.toDF().toDF("doc_id", "text", "embedding"), root, conf)
    try {
      in.addData((1L, longText("red"), Array(0.1f, 0.2f, 0.3f, 0.4f)),
        (2L, longText("blue"), Array(0.9f, 0.1f, 0.0f, 0.2f)))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark,
        graft.pipeline.AnnIndexStore.Paths(p.ann).cells)
        .select("vec_id").as[Long].collect().toSet == Set(1L, 2L),
        "embedding rows must land in the ANN store keyed by doc id")
      assert(!AtomicRewrite.read(spark, p.corpus).columns
        .contains("embedding"),
        "the corpus must not duplicate the embedding blob")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("near-dup armed stream suppresses fuzzy copies; maintenance rides its cadence") {
    val root = Files.createTempDirectory("graft-scur-nd").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      nearDupThreshold = Some(0.5))
    val harbor = "a harbor ferry waits for the tide while gulls drift " +
      "over the quay and the captain checks a list of cargo that must " +
      "reach the island before dark on this cold evening run"
    val valley = "when the mountain train climbs past the old mill the " +
      "children wave from a bridge and the driver sounds a horn that " +
      "echoes along the valley where the snow still sits on the stones"

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // maintain every second epoch: the stream folds its own
    // partition-dir growth between micro-batches (quiesced by
    // construction)
    val q = StreamingCurationRunner.sink(in.toDF(), root, conf,
      maintainEvery = 2)
    try {
      in.addData(Doc(1L, harbor))
      q.processAllAvailable()
      // epoch 1: a fuzzy copy of stored doc 1 + a new doc; epoch count
      // hits the maintenance cadence afterwards
      in.addData(Doc(2L, harbor + " " + harbor), Doc(3L, valley))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, p.corpus)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 3L),
        "the cross-epoch near-dup must be rejected against the store")
      val dirs = AtomicRewrite.read(spark, p.corpus)
        .select("batch_id").distinct().as[String].collect()
      assert(dirs.forall(_.startsWith(CurationRunner.FoldPrefix)),
        s"epoch-1 maintenance must fold both landings, got ${dirs.toSeq}")
      // epoch 2: the stores still bite after the fold
      in.addData(Doc(4L, valley + " " + valley), Doc(5L, longText("teal")))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, p.corpus)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L),
        "a post-fold near-dup must still be rejected; new content lands")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("a streaming cycle with maintenance leaves no pinned RDDs behind") {
    // the long-running-stream hygiene contract: every frame a
    // micro-batch pins is released on its own path, so executor storage
    // stays flat across epochs — a future pin leak fails here instead
    // of accumulating in production streams. Suites share the session,
    // so assert on the DELTA (with a short grace for stragglers).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val root = Files.createTempDirectory("graft-scur-pin").toString + "/rel"
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      nearDupThreshold = Some(0.5))
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCurationRunner.sink(in.toDF(), root, conf,
      publishEvery = 1, maintainEvery = 2)
    try {
      in.addData(Doc(1L, longText("red")), Doc(2L, longText("blue")))
      q.processAllAvailable()
      in.addData(Doc(3L, longText("green"))) // epoch 2: publish + maintain
      q.processAllAvailable()
    } finally q.stop()
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    val detail = spark.sparkContext.getRDDStorageInfo
      .filter(i => leaked.contains(i.id))
      .map(i => s"${i.id}: ${i.name}").mkString("; ")
    assert(leaked.isEmpty,
      s"streaming cycle left pinned RDDs: $leaked [$detail]")
    spark.catalog.clearCache()
  }

  test("empty micro-batches skip the runner entirely") {
    val root = Files.createTempDirectory("graft-scur-e").toString + "/rel"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingCurationRunner.sink(in.toDF(), root)
    try {
      q.processAllAvailable() // no data at all
      assert(!AtomicRewrite.exists(spark,
        CurationRunner.Paths(root).control),
        "an empty epoch must not even bootstrap the control table")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
