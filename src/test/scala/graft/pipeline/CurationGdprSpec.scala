package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One erasure request through the COMPOSED curation pipeline's whole
  * persistent state: [[GdprRequests.runIncremental]] wired with
  * [[CurationRunner.storeErasures]] must remove the subject's rows from
  * the landed corpus, the curated selection, the published shard epoch,
  * the BM25 postings (+stats), the ANN cells and the dedup fingerprint
  * store — one audit row per store that actually held the subject —
  * leave every bystander byte-intact, unblock legitimate re-submission,
  * and stay watermark-idempotent on replay. */
class CurationGdprSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def longText(tag: String): String =
    s"the $tag line of the network is a story of the morning " +
      s"and the $tag crews in the yard keep it moving to a plan " +
      s"that is part of the daily schedule of the city"

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(4)(i => (seed * 10 + i).toFloat / 100f)

  private def requests(rows: (String, Option[String], Option[Long], String, String, Option[String])*): DataFrame =
    rows.toSeq
      .toDF("request_id", "subject_type", "subject_id",
        "request_type", "status", "processed_at")
      .withColumn("processed_at", to_timestamp(col("processed_at")))

  test("one request cycle erases a document from every curation layer") {
    val base = Files.createTempDirectory("graft-cur-gdpr").toString
    val root = s"$base/rel"
    val control = s"$base/control"
    val audit = s"$base/audit"
    val p = CurationRunner.Paths(root)
    // budgetShare 1.0: every gate-kept doc reaches curated AND the
    // published epoch, so the erasure has to touch all six layers
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      annK = 2, annIters = 1)

    CurationRunner.runBatch(spark, root,
      Seq((1L, longText("red")), (2L, longText("blue")),
        (3L, longText("green"))).toDF("doc_id", "text"),
      ts("2024-01-01 00:00:00"), "b1", conf,
      embeddings = Some(Seq((1L, vec(1)), (2L, vec(9)), (3L, vec(2)))
        .toDF("vec_id", "embedding")))
    CurationRunner.runBatch(spark, root,
      Seq((6L, longText("amber"))).toDF("doc_id", "text"),
      ts("2024-01-02 00:00:00"), "b2", conf)
    assert(AtomicRewrite.read(spark, p.corpus).count() == 4)

    val feed = requests(("r1", Some("document"), Some(2L), "erasure",
      "processed", Some("2024-01-03 10:00:00")))
    val n = GdprRequests.runIncremental(spark, control, feed,
      policiesFor = _ => Nil, tableRoot = t => s"$base/$t", audit, "s",
      ts("2024-01-04 00:00:00"),
      storesFor = _ => CurationRunner.storeErasures(spark, root, conf))
    assert(n == 1L)

    // every layer forgot doc 2; every bystander row survived
    val corpus = AtomicRewrite.read(spark, p.corpus)
    assert(corpus.filter(col("doc_id") === 2L).isEmpty)
    assert(corpus.count() == 3)
    val curated = CurationRunner.readCurated(spark, root)
    assert(curated.filter(col("doc_id") === 2L).isEmpty)
    assert(curated.count() == 3)
    val sp = TrainingShards.Paths(p.shards)
    val shards = AtomicRewrite.read(spark, sp.shards)
    assert(shards.filter(col("doc_id") === 2L).isEmpty)
    assert(shards.count() == 3)
    assert(AtomicRewrite.read(spark, sp.manifest)
      .agg(sum("n_docs")).as[Long].head() == 3L,
      "the manifest must be refreshed from the committed survivors")
    val ip = IndexStore.Paths(p.index)
    assert(AtomicRewrite.read(spark, ip.postings)
      .filter(col("doc_id") === 2L).isEmpty)
    assert(AtomicRewrite.read(spark, ip.docstats)
      .filter(col("doc_id") === 2L).isEmpty)
    assert(AtomicRewrite.read(spark, ip.stats)
      .select("n_docs").as[Long].head() == 3L,
      "the 1-row corpus summary must shift in the same erasure cycle")
    assert(AtomicRewrite.read(spark, AnnIndexStore.Paths(p.ann).cells)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L))

    // one audit row per curation layer, all under the same fingerprint
    val auditRows = Gdpr.readAudit(spark, audit)
    assert(auditRows.select("table_name").as[String].collect().sorted.toSeq ==
      Seq("curation/ann_index", "curation/bm25_index", "curation/corpus",
        "curation/curated", "curation/dedup_store",
        "curation/training_shards"))
    assert(auditRows.select("subject_fingerprint").distinct().count() == 1)

    // replay: nothing past the watermark -> 0 processed, no new audits
    val n2 = GdprRequests.runIncremental(spark, control, feed,
      policiesFor = _ => Nil, tableRoot = t => s"$base/$t", audit, "s",
      ts("2024-01-05 00:00:00"),
      storesFor = _ => CurationRunner.storeErasures(spark, root, conf))
    assert(n2 == 0L)
    assert(Gdpr.readAudit(spark, audit).count() == 6)

    // the fingerprint is gone with the subject: the SAME content under a
    // new id is a legitimate re-submission, not a duplicate
    CurationRunner.runBatch(spark, root,
      Seq((10L, longText("blue"))).toDF("doc_id", "text"),
      ts("2024-01-06 00:00:00"), "b3", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .filter(col("doc_id") === 10L).count() == 1,
      "erasure must unblock re-submission of the erased content")
    spark.catalog.clearCache()
  }

  test("near-dup signatures are erased with the subject and unblock fuzzy re-submission") {
    val base = Files.createTempDirectory("graft-cur-gdpr-nd").toString
    val root = s"$base/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      nearDupThreshold = Some(0.5))
    // genuinely distinct prose (longText variants are near-dups of
    // each other and would collapse under the enabled near-dup stage)
    val harbor = "a harbor ferry waits for the tide while gulls drift " +
      "over the quay and the captain checks a list of cargo that must " +
      "reach the island before dark on this cold evening run"
    val valley = "when the mountain train climbs past the old mill the " +
      "children wave from a bridge and the driver sounds a horn that " +
      "echoes along the valley where the snow still sits on the stones"
    CurationRunner.runBatch(spark, root,
      Seq((1L, harbor), (2L, valley)).toDF("doc_id", "text"),
      ts("2024-01-01 00:00:00"), "b1", conf)
    // a fuzzy copy of doc 1 is blocked while its signature stands
    CurationRunner.runBatch(spark, root,
      Seq((5L, harbor + " " + harbor)).toDF("doc_id", "text"),
      ts("2024-01-02 00:00:00"), "b2", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    GdprRequests.runIncremental(spark, s"$base/control",
      requests(("r1", Some("document"), Some(1L), "erasure", "processed",
        Some("2024-01-03 10:00:00"))),
      policiesFor = _ => Nil, tableRoot = t => s"$base/$t",
      s"$base/audit", "s", ts("2024-01-04 00:00:00"),
      storesFor = _ => CurationRunner.storeErasures(spark, root, conf))

    assert(AtomicRewrite.read(spark, p.nearDupStore)
      .select("doc_id").as[Long].collect().toSet == Set(2L),
      "the subject's MinHash signature must be erased; bystanders stay")
    assert(Gdpr.readAudit(spark, s"$base/audit")
      .select("table_name").as[String].collect()
      .contains("curation/neardup_store"),
      "the signature erasure must be audited")
    // with the ghost signature gone, near-identical content under a new
    // id is a legitimate re-submission
    CurationRunner.runBatch(spark, root,
      Seq((10L, harbor + " " + harbor)).toDF("doc_id", "text"),
      ts("2024-01-05 00:00:00"), "b3", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .filter(col("doc_id") === 10L).count() == 1,
      "erasure must unblock fuzzy re-submission of the erased content")
    spark.catalog.clearCache()
  }

  test("every knob armed: near-dup + mixture + curriculum + redaction + embeddings + maintain + erasure compose") {
    val base = Files.createTempDirectory("graft-cur-all").toString
    val root = s"$base/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0,
      annK = 2, annIters = 1, nearDupThreshold = Some(0.5),
      sourceCapShare = Some(0.5), curriculum = true, redactPii = true)
    val harbor = "a harbor ferry waits for the tide while gulls drift " +
      "over the quay and the captain checks a list of cargo that must " +
      "reach the island before dark on this cold evening run"
    val valley = "when the mountain train climbs past the old mill the " +
      "children wave from a bridge and the driver sounds a horn that " +
      "echoes along the valley where the snow still sits on the stones"
    val coast = "every summer the lighthouse keeper paints the tower " +
      "white and red while seals rest on the rocks below and a cold " +
      "current carries small boats past the point toward the open sea"
    val plains = "wide fields of wheat bend under the wind as harvest " +
      "trucks roll between the silos and farmers watch the clouds for " +
      "the first sign of the late rain they have waited on for weeks"
    // batch 1: srcA docs 1,2 + srcB doc 3, all with embeddings; doc 2's
    // text near-dups doc 1 -> rejected, its embedding must orphan out
    CurationRunner.runBatch(spark, root,
      Seq((1L, harbor, "srcA"), (2L, harbor + " " + harbor, "srcA"),
        (3L, valley, "srcB")).toDF("doc_id", "text", "source"),
      ts("2024-01-01 00:00:00"), "b1", conf, publish = false,
      embeddings = Some(Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)))
        .toDF("vec_id", "embedding")))
    // batch 2: fresh content per source, then the release
    CurationRunner.runBatch(spark, root,
      Seq((5L, coast, "srcA"), (6L, plains, "srcB"))
        .toDF("doc_id", "text", "source"),
      ts("2024-01-02 00:00:00"), "b2", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L, 6L))
    assert(AtomicRewrite.read(spark, AnnIndexStore.Paths(p.ann).cells)
      .select("vec_id").as[Long].collect().toSet == Set(1L, 3L),
      "the near-dup reject's embedding must never enter the ANN store")
    // mixture invariant: no source's curated token mass may exceed half
    // its kept mass (docs differ in length, so membership is the cut's
    // business — the CAP is the contract)
    val keptMass = AtomicRewrite.read(spark, p.corpus).filter(col("keep"))
      .groupBy("source").agg(sum("n_tokens").as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val curMass = CurationRunner.readCurated(spark, root)
      .groupBy("source").agg(sum("n_tokens").as("cur")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(curMass.nonEmpty, "the capped release must select something")
    curMass.foreach { case (src, cur) =>
      assert(cur <= keptMass(src) / 2,
        s"$src curated $cur tokens over its cap (kept ${keptMass(src)})")
    }

    CurationRunner.maintain(spark, root, buckets = 2)

    // erase doc 1 through every layer, post-fold
    GdprRequests.runIncremental(spark, s"$base/control",
      requests(("r1", Some("document"), Some(1L), "erasure", "processed",
        Some("2024-01-03 10:00:00"))),
      policiesFor = _ => Nil, tableRoot = t => s"$base/$t",
      s"$base/audit", "s", ts("2024-01-04 00:00:00"),
      storesFor = _ => CurationRunner.storeErasures(spark, root, conf))
    assert(AtomicRewrite.read(spark, p.corpus)
      .filter(col("doc_id") === 1L).isEmpty,
      "the folded corpus must still erase by doc id")
    assert(AtomicRewrite.read(spark, p.nearDupStore)
      .filter(col("doc_id") === 1L).isEmpty)
    assert(AtomicRewrite.read(spark, AnnIndexStore.Paths(p.ann).cells)
      .select("vec_id").as[Long].collect().toSet == Set(3L))
    // with doc 1's signature gone, its near-copy re-submits fine and the
    // next release reflects the post-erasure state
    CurationRunner.runBatch(spark, root,
      Seq((10L, harbor + " " + harbor, "srcA"))
        .toDF("doc_id", "text", "source"),
      ts("2024-01-05 00:00:00"), "b3", conf)
    assert(AtomicRewrite.read(spark, p.corpus)
      .filter(col("doc_id") === 10L).count() == 1)
    spark.catalog.clearCache()
  }

  test("a subject held nowhere burns no version and claims no audit row") {
    val base = Files.createTempDirectory("graft-cur-gdpr-n").toString
    val root = s"$base/rel"
    val p = CurationRunner.Paths(root)
    val conf = CurationRunner.Conf(nShards = 2, budgetShare = 1.0)
    CurationRunner.runBatch(spark, root,
      Seq((1L, longText("red"))).toDF("doc_id", "text"),
      ts("2024-01-01 00:00:00"), "b1", conf)
    val before = Seq(p.corpus, p.curated, p.dedupStore,
      TrainingShards.Paths(p.shards).shards,
      IndexStore.Paths(p.index).postings)
      .map(AtomicRewrite.currentVersion(spark, _))
    val n = GdprRequests.runIncremental(spark, s"$base/control",
      requests(("r1", Some("document"), Some(99L), "erasure", "processed",
        Some("2024-01-02 10:00:00"))),
      policiesFor = _ => Nil, tableRoot = t => s"$base/$t",
      s"$base/audit", "s", ts("2024-01-03 00:00:00"),
      storesFor = _ => CurationRunner.storeErasures(spark, root, conf))
    assert(n == 1L, "the request is consumed even when nothing matches")
    assert(Seq(p.corpus, p.curated, p.dedupStore,
      TrainingShards.Paths(p.shards).shards,
      IndexStore.Paths(p.index).postings)
      .map(AtomicRewrite.currentVersion(spark, _)) == before,
      "an unmatched erasure must not rewrite any store")
    assert(!Gdpr.auditExists(spark, s"$base/audit"),
      "no store held the subject, so no store may claim an audit row")
    spark.catalog.clearCache()
  }
}
