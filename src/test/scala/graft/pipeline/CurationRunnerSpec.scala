package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the composed curation-release job: batches are
  * incremental (dedup against all-time state, index appends, epoch
  * republish), a watermark-guarded replay is a FULL no-op (no version
  * burns anywhere), a crash-shaped replay cannot erase landed state,
  * failures record FAIL without regressing the watermark, and the gate/
  * budget/publish composition holds its invariants end-to-end.
  */
class CurationRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  // stopword-rich long text -> passes the length and stopword gates
  private def longText(tag: String): String =
    s"the $tag line of the network is a story of the morning " +
      s"and the $tag crews in the yard keep it moving to a plan " +
      s"that is part of the daily schedule of the city"

  private def batch1: DataFrame = Seq(
    (1L, longText("red")),
    (2L, longText("blue")),
    (3L, "tiny doc"), // too_short
    (4L, longText("green"))).toDF("doc_id", "text")

  private def batch2: DataFrame = Seq(
    (5L, longText("red")), // exact dup of doc 1 -> rejected by the store
    (6L, longText("amber")),
    (7L, longText("violet"))).toDF("doc_id", "text")

  private def versions(p: CurationRunner.Paths): Map[String, Option[Long]] = {
    val sp = TrainingShards.Paths(p.shards)
    val ip = IndexStore.Paths(p.index)
    Map(
      "control" -> AtomicRewrite.currentVersion(spark, p.control),
      "dedup" -> AtomicRewrite.currentVersion(spark, p.dedupStore),
      "corpus" -> AtomicRewrite.currentVersion(spark, p.corpus),
      "curated" -> AtomicRewrite.currentVersion(spark, p.curated),
      "shards" -> AtomicRewrite.currentVersion(spark, sp.shards),
      "manifest" -> AtomicRewrite.currentVersion(spark, sp.manifest),
      "postings" -> AtomicRewrite.currentVersion(spark, ip.postings),
      "stats" -> AtomicRewrite.currentVersion(spark, ip.stats))
  }

  test("two incremental batches, watermark no-op replay, crash-replay safety") {
    val root = Files.createTempDirectory("graft-cur").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)

    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    val corpus1 = AtomicRewrite.read(spark, p.corpus)
    assert(corpus1.count() == 4, "batch 1 lands every unseen doc")
    assert(corpus1.filter(col("doc_id") === 3L).select("reason")
      .as[String].head() == "too_short")

    val cur2 = CurationRunner.runBatch(spark, root, batch2, ts(2), "b2", conf)
    val corpus2 = AtomicRewrite.read(spark, p.corpus)
    // doc 5 carries doc 1's exact text -> the all-time fingerprint
    // store rejects it; only 6 and 7 land
    assert(corpus2.count() == 6, s"got ${corpus2.count()}")
    assert(corpus2.filter(col("doc_id") === 5L).isEmpty,
      "a cross-batch exact duplicate must not re-land")
    assert(corpus2.filter(col("batch_id") === "b2").count() == 2)

    // the index serves the union and never the rejected duplicate
    val hits = IndexStore.query(spark, root + "/index",
      Seq((100L, Seq("violet"))).toDF("query_id", "terms"), k = 5)
    assert(hits.select("doc_id").as[Long].collect().toSet == Set(7L))
    val redHits = IndexStore.query(spark, root + "/index",
      Seq((100L, Seq("red"))).toDF("query_id", "terms"), k = 5)
    assert(redHits.select("doc_id").as[Long].collect().toSet == Set(1L),
      "the duplicate's text must resolve to its first-accepted id only")

    // release invariants: curated is a subset of kept, the published
    // epoch mirrors it, and the manifest counts the committed shards
    val curated = AtomicRewrite.read(spark, p.curated)
    assert(curated.join(corpus2.filter(!col("keep")), Seq("doc_id"),
      "left_semi").isEmpty, "curated docs must all be gate-kept")
    val sp = TrainingShards.Paths(p.shards)
    val shardRows = AtomicRewrite.read(spark, sp.shards)
    assert(shardRows.count() == curated.count())
    val manifestDocs = AtomicRewrite.read(spark, sp.manifest)
      .agg(sum("n_docs")).as[Long].head()
    assert(manifestDocs == curated.count())
    assert(cur2.count() == curated.count())

    // watermark-guarded replay: FULL no-op — identical state, zero
    // version burns in ANY table of the root
    val before = versions(p)
    val replay = CurationRunner.runBatch(spark, root, batch2, ts(2), "b2", conf)
    assert(versions(p) == before, "a watermark no-op must burn no version")
    assert(replay.count() == curated.count())

    // crash-shaped replay: the batch re-runs under a NEW asOf (the
    // watermark had not advanced) with everything already committed —
    // dedup accepts nothing, and the landed corpus partition must
    // survive (an empty landing never names its partition as replaced)
    CurationRunner.runBatch(spark, root, batch2, ts(3), "b2", conf)
    val corpus3 = AtomicRewrite.read(spark, p.corpus)
    assert(corpus3.count() == 6,
      "an all-rejected replay must not erase its batch's landed rows")
    assert(AtomicRewrite.read(spark, p.curated).count() == curated.count())
    spark.catalog.clearCache()
  }

  test("a failed batch records FAIL:<cause> and never regresses the watermark") {
    val root = Files.createTempDirectory("graft-cur-f").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    // a batch without the text column fails at plan time
    intercept[Exception] {
      CurationRunner.runBatch(spark, root,
        Seq((9L, 1)).toDF("doc_id", "other"), ts(2), "b2", conf)
    }
    val row = AtomicRewrite.read(spark, p.control)
      .filter(col("job_name") === CurationRunner.Job).head()
    assert(row.getString(3).startsWith("FAIL:"),
      s"status was ${row.getString(3)}")
    assert(row.getTimestamp(1) == ts(1),
      "a FAIL must keep the previous watermark (never-regress)")
    // the next good batch proceeds from the kept watermark
    CurationRunner.runBatch(spark, root, batch2, ts(2), "b2", conf)
    assert(AtomicRewrite.read(spark, p.corpus).count() == 6)
    spark.catalog.clearCache()
  }

  test("ingest-only cadence (publish=false) skips the release tables") {
    val root = Files.createTempDirectory("graft-cur-i").toString + "/rel"
    val p = CurationRunner.Paths(root)
    // 0.6 of the kept mass: wide enough that the top-quality doc (3x
    // the mass of any other) fits the greedy prefix
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 0.6)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    val curatedV = AtomicRewrite.currentVersion(spark, p.curated)
    val shardsV = AtomicRewrite.currentVersion(spark,
      TrainingShards.Paths(p.shards).shards)
    // doc 6 is 3x longer than every batch-1 doc -> top quality score,
    // so the eventual budget cut MUST select it first (equal-quality
    // docs would tiebreak to the older batch's lower ids instead)
    val highQuality = batch2.withColumn("text",
      when(col("doc_id") === 6L,
        concat_ws(" ", col("text"), col("text"), col("text")))
        .otherwise(col("text")))
    CurationRunner.runBatch(spark, root, highQuality, ts(2), "b2", conf,
      publish = false)
    // ingest landed...
    assert(AtomicRewrite.read(spark, p.corpus).count() == 6)
    // ...but no epoch republish
    assert(AtomicRewrite.currentVersion(spark, p.curated) == curatedV)
    assert(AtomicRewrite.currentVersion(spark,
      TrainingShards.Paths(p.shards).shards) == shardsV)
    // the next publishing batch folds the backlog into the release
    CurationRunner.runBatch(spark, root,
      Seq((8L, longText("bronze"))).toDF("doc_id", "text"), ts(3), "b3", conf)
    assert(AtomicRewrite.read(spark, p.curated)
      .join(AtomicRewrite.read(spark, p.corpus)
        .filter(col("batch_id") === "b2" && col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi").count() > 0,
      "a later release must include the ingest-only batch's kept docs")
    spark.catalog.clearCache()
  }

  test("near-dup stage rejects in-batch and cross-batch fuzzy copies") {
    val root = Files.createTempDirectory("graft-cur-n").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2,
      nearDupThreshold = Some(0.5))
    // longText(tag) fixtures differ by ONE word — real near-dups — so
    // this test needs genuinely distinct prose for its non-dup docs
    val harbor = "a harbor ferry waits for the tide while gulls drift " +
      "over the quay and the captain checks a list of cargo that must " +
      "reach the island before dark on this cold evening run"
    val valley = "when the mountain train climbs past the old mill the " +
      "children wave from a bridge and the driver sounds a horn that " +
      "echoes along the valley where the snow still sits on the stones"
    // doc 2 doubles doc 1's text: a DIFFERENT fingerprint (exact dedup
    // passes it) but an almost identical shingle set (near-dup catches)
    val b1 = Seq(
      (1L, longText("red")),
      (2L, longText("red") + " " + longText("red")),
      (4L, harbor)).toDF("doc_id", "text")
    CurationRunner.runBatch(spark, root, b1, ts(1), "b1", conf)
    val corpus1 = AtomicRewrite.read(spark, p.corpus)
    assert(corpus1.select("doc_id").as[Long].collect().toSet == Set(1L, 4L),
      "the in-batch near-copy must collapse to its lowest id")
    assert(AtomicRewrite.read(spark, p.nearDupStore)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 4L),
      "only accepted survivors' signatures enter the store")

    // batch 2: doc 6 is a fuzzy copy of STORED doc 1 (different tail, so
    // neither fingerprint nor in-batch collapse catches it); doc 7 is new
    val b2 = Seq(
      (6L, longText("red") + " " + longText("red") + " and more"),
      (7L, valley)).toDF("doc_id", "text")
    CurationRunner.runBatch(spark, root, b2, ts(2), "b2", conf)
    val corpus2 = AtomicRewrite.read(spark, p.corpus)
    assert(corpus2.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 4L, 7L),
      "a cross-batch near-dup must be rejected against the store")
    // the released epoch never carries the suppressed near-dups
    assert(AtomicRewrite.read(spark,
      TrainingShards.Paths(p.shards).shards)
      .filter(col("doc_id").isin(2L, 6L)).isEmpty)
    spark.catalog.clearCache()
  }

  test("crash between the store commits and the index refresh converges on replay") {
    val root = Files.createTempDirectory("graft-cur-c").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)
    // construct the crashed state with the stores' own contract: rows
    // landed in the corpus partition + fingerprints committed, then a
    // crash BEFORE the index refresh (no postings, no watermark)
    DedupStore.acceptNew(spark, p.dedupStore, batch1, "doc_id",
      DedupStore.textFingerprint(col("text")),
      land = df => AtomicRewrite.writePartitions(spark, p.corpus,
        df.withColumn("batch_id", lit("b1")), Seq("batch_id"))).unpersist()
    assert(!AtomicRewrite.exists(spark, IndexStore.Paths(p.index).postings))
    // the replay: dedup accepts NOTHING (fingerprints already committed),
    // yet the landed partition must still reach the index
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf,
      publish = false)
    assert(AtomicRewrite.read(spark, p.corpus).count() == 4,
      "the replay must not disturb the landed partition")
    assert(AtomicRewrite.read(spark, IndexStore.Paths(p.index).stats)
      .select("n_docs").as[Long].head() == 4L,
      "the index refresh must derive from the durable landing, not the " +
        "(empty) replayed accept set")
    spark.catalog.clearCache()
  }

  test("embeddings orphaned by their batch's rejections never enter the ANN store") {
    val root = Files.createTempDirectory("graft-cur-o").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, annK = 2, annIters = 1)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(4)(i => (seed * 10 + i).toFloat / 100f)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf,
      embeddings = Some(Seq((1L, vec(1)), (4L, vec(4)))
        .toDF("vec_id", "embedding")))
    // batch 2: doc 5 is an exact dup (rejected) — its embedding must NOT
    // ride in; doc 6 lands; vec 2 is a LATE RIDER for batch-1's doc 2
    // (not in this batch) and passes through untouched
    val em2 = Seq((5L, vec(5)), (6L, vec(6)), (2L, vec(2)))
      .toDF("vec_id", "embedding")
    CurationRunner.runBatch(spark, root, batch2, ts(2), "b2", conf,
      embeddings = Some(em2))
    assert(AtomicRewrite.read(spark, AnnIndexStore.Paths(p.ann).cells)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 2L, 4L, 6L),
      "rejected doc 5's embedding must be dropped; late rider 2 must pass")
    spark.catalog.clearCache()
  }

  test("release enforces per-source token caps before the global budget") {
    val root = Files.createTempDirectory("graft-cur-x").toString + "/rel"
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      sourceCapShare = Some(0.5))
    // equal-length texts -> equal quality -> ties break to lower ids:
    // srcA (4 kept docs — id 4 sits in the 10% holdout split, so id 7
    // stands in) caps to its best 2, srcB (2 docs) caps to its best 1
    val b = Seq(
      (1L, longText("red"), "srcA"), (2L, longText("blue"), "srcA"),
      (3L, longText("green"), "srcA"), (7L, longText("amber"), "srcA"),
      (5L, longText("violet"), "srcB"), (6L, longText("teal"), "srcB"))
      .toDF("doc_id", "text", "source")
    CurationRunner.runBatch(spark, root, b, ts(1), "b1", conf)
    val curated = CurationRunner.readCurated(spark, root)
    assert(curated.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L),
      "each source must keep only its cap's best-quality prefix")
    // the shard epoch carries the capped selection only
    assert(AtomicRewrite.read(spark,
      TrainingShards.Paths(CurationRunner.Paths(root).shards).shards)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    // a sourceless batch under a mixture conf fails loudly
    intercept[Exception] {
      CurationRunner.runBatch(spark, root,
        Seq((9L, longText("bronze"))).toDF("doc_id", "text"), ts(2), "b2",
        conf)
    }
    spark.catalog.clearCache()
  }

  test("redaction at ingest normalizes PII variants into one duplicate class") {
    val root = Files.createTempDirectory("graft-cur-r").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      redactPii = true)
    // same base text, different emails: redaction must collapse them to
    // ONE fingerprint, and no raw PII may reach any store
    val b = Seq(
      (1L, longText("red") + " mail alice@example.com"),
      (2L, longText("red") + " mail bob@test.org"),
      (3L, longText("blue") + " from 10.1.2.3 call +1-555-0199"))
      .toDF("doc_id", "text")
    CurationRunner.runBatch(spark, root, b, ts(1), "b1", conf)
    val corpus = AtomicRewrite.read(spark, p.corpus)
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 3L),
      "PII-variant duplicates must collapse after redaction")
    val texts = corpus.select("text").as[String].collect().mkString(" ")
    assert(texts.contains("<EMAIL>") && texts.contains("<IP>") &&
      texts.contains("<PHONE>"), s"placeholders must land, got: $texts")
    assert(!texts.contains("alice") && !texts.contains("10.1.2.3") &&
      !texts.contains("555-0199"), "raw PII must never land in the corpus")
    // ...nor in the index's token space
    assert(AtomicRewrite.read(spark, IndexStore.Paths(p.index).postings)
      .filter(col("token").contains("@") || col("token").contains("alice"))
      .isEmpty, "raw PII must never enter the postings")
    spark.catalog.clearCache()
  }

  test("curriculum release interleaves sources best-first") {
    val root = Files.createTempDirectory("graft-cur-q").toString + "/rel"
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      curriculum = true)
    // two sources, two kept docs each (id 4 is holdout, 7 stands in) —
    // the interleave must alternate sources: positions 1,2 are one doc
    // of EACH source, never a single-domain block
    val b = Seq(
      (1L, longText("red"), "srcA"), (2L, longText("blue"), "srcA"),
      (5L, longText("violet"), "srcB"), (6L, longText("teal"), "srcB"))
      .toDF("doc_id", "text", "source")
    CurationRunner.runBatch(spark, root, b, ts(1), "b1", conf)
    val cur = CurationRunner.readCurated(spark, root)
      .select("train_pos", "source").as[(Long, String)].collect().toMap
    assert(cur.keySet == Set(1L, 2L, 3L, 4L), s"dense interleave, got $cur")
    assert(cur(1L) != cur(2L) && cur(3L) != cur(4L),
      s"every consecutive pair must span both sources, got $cur")
    spark.catalog.clearCache()
  }

  test("maintain folds store history and keeps every store functional") {
    val root = Files.createTempDirectory("graft-cur-m").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2,
      nearDupThreshold = Some(0.5))
    val harbor = "a harbor ferry waits for the tide while gulls drift " +
      "over the quay and the captain checks a list of cargo that must " +
      "reach the island before dark on this cold evening run"
    val valley = "when the mountain train climbs past the old mill the " +
      "children wave from a bridge and the driver sounds a horn that " +
      "echoes along the valley where the snow still sits on the stones"
    val coast = "every summer the lighthouse keeper paints the tower " +
      "white and red while seals rest on the rocks below and a cold " +
      "current carries small boats past the point toward the open sea"
    CurationRunner.runBatch(spark, root,
      Seq((1L, harbor)).toDF("doc_id", "text"), ts(1), "b1", conf,
      publish = false)
    CurationRunner.runBatch(spark, root,
      Seq((2L, valley)).toDF("doc_id", "text"), ts(2), "b2", conf,
      publish = false)
    CurationRunner.runBatch(spark, root,
      Seq((3L, coast)).toDF("doc_id", "text"), ts(3), "b3", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .select("batch_id").distinct().count() == 3)

    CurationRunner.maintain(spark, root, buckets = 2)
    val folded = AtomicRewrite.read(spark, p.corpus)
    assert(folded.count() == 3, "the fold must keep every landed row")
    val dirs = folded.select("batch_id").distinct().as[String].collect()
    assert(dirs.length <= 2 &&
      dirs.forall(_.startsWith(CurationRunner.FoldPrefix)),
      s"corpus dirs must fold under the prefix, got ${dirs.toSeq}")
    assert(AtomicRewrite.read(spark, p.dedupStore)
      .select("batch_seq").distinct().count() <= 2)
    assert(AtomicRewrite.read(spark, p.nearDupStore)
      .select("batch_seq").distinct().count() <= 2)

    // every dedup layer still bites after the fold; new content lands
    val b4 = Seq((10L, harbor), // exact dup of folded doc 1
      (11L, valley + " " + valley), // near-dup of folded doc 2
      (12L, longText("bronze"))).toDF("doc_id", "text")
    CurationRunner.runBatch(spark, root, b4, ts(4), "b4", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 12L))
    assert(AtomicRewrite.read(spark, IndexStore.Paths(p.index).stats)
      .select("n_docs").as[Long].head() == 4L)

    // the collision guard: a caller-named fold- batch id must be refused
    intercept[IllegalArgumentException] {
      CurationRunner.runBatch(spark, root,
        Seq((20L, longText("silver"))).toDF("doc_id", "text"),
        ts(5), "fold-9", conf)
    }
    spark.catalog.clearCache()
  }

  test("a second consecutive maintain is a full no-op (incremental folds)") {
    val root = Files.createTempDirectory("graft-cur-m2").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, nearDupThreshold = Some(0.5))
    CurationRunner.runBatch(spark, root,
      Seq((1L, longText("red"))).toDF("doc_id", "text"), ts(1), "b1", conf,
      publish = false)
    CurationRunner.runBatch(spark, root,
      Seq((2L, "the quick brown fox jumps over a lazy dog while the " +
        "miller grinds the wheat and the baker warms the oven for the " +
        "first loaves of the day")).toDF("doc_id", "text"), ts(2), "b2", conf)
    CurationRunner.maintain(spark, root, buckets = 2)
    val before = versions(p) +
      ("neardup" -> AtomicRewrite.currentVersion(spark, p.nearDupStore))
    // nothing pending anywhere: the second maintain must rewrite ZERO
    // bytes — no store, corpus, or index version burns
    CurationRunner.maintain(spark, root, buckets = 2)
    val after = versions(p) +
      ("neardup" -> AtomicRewrite.currentVersion(spark, p.nearDupStore))
    assert(after == before,
      s"an already-folded root burned versions: before=$before after=$after")
    // and a post-fold batch folds incrementally: the next maintain burns
    // corpus/store versions again (there IS pending work), but the
    // already-folded corpus rows stay intact
    CurationRunner.runBatch(spark, root,
      Seq((3L, "under the old bridge a slow canal carries barges of " +
        "grain toward the river port where cranes swing all night and " +
        "the lock keeper logs every vessel in a worn ledger"))
        .toDF("doc_id", "text"), ts(3), "b3", conf)
    CurationRunner.maintain(spark, root, buckets = 2)
    val corpus = AtomicRewrite.read(spark, p.corpus)
    assert(corpus.count() == 3)
    val dirs = corpus.select("batch_id").distinct().as[String].collect()
    assert(dirs.length <= 2 &&
      dirs.forall(_.startsWith(CurationRunner.FoldPrefix)),
      s"post-fold landings must fold under the prefix too, got ${dirs.toSeq}")
    // a SHRUNK bucket dial refolds fold dirs outside the new bound the
    // same incremental way (no stranded fold-K with K >= buckets)
    CurationRunner.maintain(spark, root, buckets = 1)
    val refolded = AtomicRewrite.read(spark, p.corpus)
    assert(refolded.count() == 3)
    assert(refolded.select("batch_id").distinct().as[String].collect()
      .toSeq == Seq(s"${CurationRunner.FoldPrefix}0"),
      "buckets=1 must converge every corpus dir into fold-0")
    spark.catalog.clearCache()
  }

  test("a no-change release burns no curated or shard version (bucket-diffed publish)") {
    val root = Files.createTempDirectory("graft-cur-nc").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val sp = TrainingShards.Paths(p.shards)
    val conf = CurationRunner.Conf(nShards = 2)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    val curatedV = AtomicRewrite.currentVersion(spark, p.curated)
    val shardsV = AtomicRewrite.currentVersion(spark, sp.shards)
    val manifestV = AtomicRewrite.currentVersion(spark, sp.manifest)
    assert(curatedV.isDefined && shardsV.isDefined)
    // batch of exact dups: everything rejected by the fingerprint store,
    // the selection recomputes IDENTICAL -> the publishing release must
    // burn no curated/shard/manifest version at all
    CurationRunner.runBatch(spark, root,
      Seq((9L, longText("red")), (10L, longText("blue")))
        .toDF("doc_id", "text"), ts(2), "b2", conf)
    assert(AtomicRewrite.currentVersion(spark, p.curated) == curatedV,
      "identical selection re-published the curated snapshot")
    assert(AtomicRewrite.currentVersion(spark, sp.shards) == shardsV,
      "identical selection re-published the shard epoch")
    assert(AtomicRewrite.currentVersion(spark, sp.manifest) == manifestV)
    // a landed-but-gate-rejected batch is also selection-neutral
    CurationRunner.runBatch(spark, root,
      Seq((11L, "tiny")).toDF("doc_id", "text"), ts(3), "b3", conf)
    assert(AtomicRewrite.currentVersion(spark, p.curated) == curatedV)
    assert(AtomicRewrite.currentVersion(spark, sp.shards) == shardsV)
    // a selection-moving batch still publishes
    CurationRunner.runBatch(spark, root,
      Seq((12L, longText("amber"))).toDF("doc_id", "text"), ts(4), "b4", conf)
    assert(AtomicRewrite.currentVersion(spark, p.curated) != curatedV,
      "a moved selection must commit")
    assert(AtomicRewrite.currentVersion(spark, sp.shards) != shardsV)
    spark.catalog.clearCache()
  }

  test("an nShards dial turn with an unchanged selection re-shards the epoch") {
    val root = Files.createTempDirectory("graft-cur-dial").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val sp = TrainingShards.Paths(p.shards)
    // full budget so SEVERAL docs publish: the dial turn below must
    // actually move shard assignments for the rebuild to be observable
    // (a 1-doc epoch re-shards identically under any nShards and the
    // diffed epoch write rightly no-ops)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1",
      CurationRunner.Conf(nShards = 2, budgetShare = 1.0))
    assert(TrainingShards.readManifest(spark, p.shards).count() == 2,
      "fixture must spread the selection over both shards")
    val curatedV = AtomicRewrite.currentVersion(spark, p.curated)
    val shardsV = AtomicRewrite.currentVersion(spark, sp.shards)
    // selection-neutral batch (exact dup), but the sharding conf moved:
    // the epoch skip must NOT key on the curated version alone — the
    // committed epoch would keep the stale shard count until the
    // selection next happened to move
    CurationRunner.runBatch(spark, root,
      Seq((9L, longText("red"))).toDF("doc_id", "text"), ts(2), "b2",
      CurationRunner.Conf(nShards = 1, budgetShare = 1.0))
    assert(AtomicRewrite.currentVersion(spark, p.curated) == curatedV,
      "the selection itself did not move")
    assert(AtomicRewrite.currentVersion(spark, sp.shards) != shardsV,
      "a changed nShards must rebuild the epoch even with an unchanged selection")
    val marker = AtomicRewrite.read(spark, p.shardsFrom)
      .select("n_shards", "order_col").as[(Int, String)].head()
    assert(marker == ((1, "train_pos")))
    assert(TrainingShards.readManifest(spark, p.shards).count() == 1,
      "the rebuilt epoch must carry the NEW shard count")
    // and with the SAME conf again, the skip holds
    val shardsV1 = AtomicRewrite.currentVersion(spark, sp.shards)
    CurationRunner.runBatch(spark, root,
      Seq((10L, longText("blue"))).toDF("doc_id", "text"), ts(3), "b3",
      CurationRunner.Conf(nShards = 1, budgetShare = 1.0))
    assert(AtomicRewrite.currentVersion(spark, sp.shards) == shardsV1)
    spark.catalog.clearCache()
  }

  test("a no-change release writes zero curated bytes (sidecar-diffed, data files untouched)") {
    val root = Files.createTempDirectory("graft-cur-zb").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    // the curated snapshot committed with its signature sidecar — the
    // structure that lets the next diff read O(buckets) instead of
    // re-hashing the committed selection (DiffedWriteSpec pins that the
    // diff never opens the committed data files at all)
    val curV = AtomicRewrite.currentVersion(spark, p.curated).get
    assert(new java.io.File(s"${p.curated}/v=$curV/_sigs_schema").exists(),
      "the curated publish must commit its signature sidecar")
    def files(dir: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).map(f => f.getPath -> f.lastModified).toMap
    }
    val before = files(p.curated)
    CurationRunner.runBatch(spark, root,
      Seq((9L, longText("red"))).toDF("doc_id", "text"), ts(2), "b2", conf)
    assert(files(p.curated) == before,
      "a no-change release must leave the curated table byte-untouched")
    spark.catalog.clearCache()
  }

  test("a full batch + maintain cycle leaves no pinned RDDs behind") {
    // every frame a cycle pins must be released on its own path — a pin
    // leak would accumulate executor storage forever in the streaming
    // front door's long-running foreachBatch loop. The session is
    // shared across suites, so assert on the DELTA (with a short grace
    // for another suite's transient pins).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val root = Files.createTempDirectory("graft-cur-pin").toString + "/rel"
    val conf = CurationRunner.Conf(nShards = 2,
      nearDupThreshold = Some(0.5), sourceCapShare = Some(0.8),
      curriculum = true)
    CurationRunner.runBatch(spark, root,
      batch1.withColumn("source", lit("web")), ts(1), "b1", conf)
    CurationRunner.maintain(spark, root, buckets = 2)
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    val detail = spark.sparkContext.getRDDStorageInfo
      .filter(i => leaked.contains(i.id))
      .map(i => s"${i.id}: ${i.name}").mkString("; ")
    assert(leaked.isEmpty, s"cycle left pinned RDDs: $leaked [$detail]")
    spark.catalog.clearCache()
  }

  test("a punctuation-only doc is rejected with a well-defined quality score") {
    val root = Files.createTempDirectory("graft-cur-zt").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2)
    // long enough to pass the n_chars floor. The whitespace tokenizer
    // ([[graft.ops.TextOps.tokens]]) still yields one "token" per
    // punctuation run, so n_tokens >= 1 for every cleaned doc — the
    // stopword RATIO (0) rejects it, and quality stays a real number
    // (the gate's n_tokens===0 branch is the defensive guard for a
    // word-extracting tokenizer evolution, where punctuation-only text
    // WOULD tokenize to nothing and the ratio would go NaN)
    val junk = "!?.,;:-- " * 20
    CurationRunner.runBatch(spark, root,
      Seq((50L, junk), (51L, longText("red"))).toDF("doc_id", "text"),
      ts(1), "b1", conf)
    val row = AtomicRewrite.read(spark, p.corpus)
      .filter(col("doc_id") === 50L)
      .select("reason", "keep", "quality_score")
      .as[(String, Boolean, Double)].head()
    assert(row._1 == "low_stopword" && !row._2,
      s"punctuation-only doc gated as $row")
    assert(!row._3.isNaN && row._3 >= 0.0 && row._3 <= 1.0,
      s"quality must stay a real ordered number, got ${row._3}")
    assert(AtomicRewrite.read(spark, p.curated)
      .filter(col("doc_id") === 50L).isEmpty)
    spark.catalog.clearCache()
  }

  test("maintain refuses a root whose last batch failed (awaiting replay)") {
    val root = Files.createTempDirectory("graft-cur-mf").toString + "/rel"
    val conf = CurationRunner.Conf(nShards = 2)
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf)
    CurationRunner.maintain(spark, root) // quiesced: fine
    intercept[Exception] {
      CurationRunner.runBatch(spark, root,
        Seq((9L, 1)).toDF("doc_id", "other"), ts(2), "b2", conf)
    }
    val e = intercept[IllegalArgumentException] {
      CurationRunner.maintain(spark, root)
    }
    assert(e.getMessage.contains("quiesced"))
    spark.catalog.clearCache()
  }

  test("embedding batches ride the cycle into the ANN store") {
    val root = Files.createTempDirectory("graft-cur-a").toString + "/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, annK = 2, annIters = 1)
    def vec(seed: Int): Array[Float] =
      Array.tabulate(4)(i => (seed * 10 + i).toFloat / 100f)
    val em1 = Seq((1L, vec(1)), (2L, vec(9))).toDF("vec_id", "embedding")
    CurationRunner.runBatch(spark, root, batch1, ts(1), "b1", conf,
      embeddings = Some(em1))
    assert(AtomicRewrite.exists(spark, AnnIndexStore.Paths(p.ann).centroids))
    val em2 = Seq((3L, vec(2))).toDF("vec_id", "embedding")
    CurationRunner.runBatch(spark, root, batch2, ts(2), "b2", conf,
      embeddings = Some(em2))
    val cells = AtomicRewrite.read(spark, AnnIndexStore.Paths(p.ann).cells)
    assert(cells.select("vec_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "the second embedding batch must APPEND, not replace")
    spark.catalog.clearCache()
  }
}
