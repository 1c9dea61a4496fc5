package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** The reference's core cross-layer GDPR guarantee ("propagate erasure
  * across every derived layer", gdpr/gdpr_propagate_erasure.py) applied
  * at LLM-pipeline scope: one flow erases a subject from the relational
  * table ([[Gdpr.propagate]]) AND every derived corpus artifact — dedup
  * fingerprints, MinHash signatures, ANN cells, BM25 postings, and the
  * PUBLISHED training-shard epoch — via [[Gdpr.forgetStores]], leaving no derived
  * trace anywhere, unblocking legitimate re-submission, and appending
  * exactly one audit record per store. */
class GdprStoresE2ESpec extends SparkSpec {
  import spark.implicits._

  private val now = Timestamp.valueOf("2024-03-01 00:00:00")

  private def v(id: Long): Seq[Float] = {
    val a = Array.fill(4)(0f); a((id % 4).toInt) = 1f; a.toSeq
  }

  test("one erasure flow scrubs silver + dedup + neardup + ann; one audit row per store") {
    val root = Files.createTempDirectory("graft-gdpr-e2e").toString
    val audit = s"$root/audit"
    val docs = Seq(
      (1L, "alice reviews the northern line daily and likes it", "alice@example.com"),
      (2L, "bob commutes on the central line with a monthly pass", "bob@example.com"),
      (3L, "carol rides the western loop tram on weekends only", "carol@example.com"))
      .toDF("doc_id", "text", "author_email")
    AtomicRewrite.write(spark, s"$root/silver_docs", docs)

    val (dedupRoot, nearRoot, annRoot) =
      (s"$root/stores/dedup", s"$root/stores/neardup", s"$root/stores/ann")
    assert(DedupStore.acceptNew(spark, dedupRoot, docs, "doc_id",
      DedupStore.textFingerprint(col("text"))).count() == 3)
    assert(NearDupStore.acceptNew(spark, nearRoot, docs, "doc_id", "text")
      .count() == 3, "the three texts are not near-dups of each other")
    AnnIndexStore.build(spark, annRoot,
      Seq(1L, 2L, 3L).map(id => (id, v(id))).toDF("vec_id", "embedding"),
      Seq(1L, 2L, 3L).map(id => (id.toInt, v(id))).toDF("centroid_id", "cv"))
    // a PUBLISHED training epoch carries full doc rows — it is inside
    // the propagate-everywhere contract like any other derived layer
    val shardsRoot = s"$root/stores/shards"
    TrainingShards.build(spark, shardsRoot,
      docs.select(col("doc_id"), lit(10L).as("n_tokens"),
        col("doc_id").as("train_pos"), col("text")), nShards = 2)
    // the serving-side retrieval index is derived state too
    val idxRoot = s"$root/stores/bm25"
    IndexStore.build(spark, idxRoot, docs)

    // subject: doc 2. The dedup store keys on the CONTENT fingerprint, so
    // its erasure input derives from the subject's text — read BEFORE the
    // scrub (runIncremental runs stores-first for exactly this reason) —
    // and the matched fingerprints map back to subject ids through the
    // same (subject, fingerprint) pairing.
    val subjectFp = docs.filter(col("doc_id") === 2L)
      .select(DedupStore.textFingerprint(col("text")).as("fingerprint"))

    // stores first (the runIncremental ordering), then the table scrub
    val storeAudit = Gdpr.forgetStores(spark, Seq(2L).toDF("subject_id"),
      "document", Seq(
        Gdpr.StoreErasure("dedup_store", Seq("fingerprint"), ids => {
          val pairs = docs.join(ids, col("doc_id") === col("subject_id"))
            .select(col("subject_id"),
              DedupStore.textFingerprint(col("text")).as("fingerprint"))
          val matched =
            DedupStore.forgetMatched(spark, dedupRoot, pairs.select("fingerprint"))
          if (matched.isEmpty) Nil
          else pairs.filter(col("fingerprint").isin(matched: _*))
            .select("subject_id").distinct().collect().map(_.get(0)).toSeq
        }),
        Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
          ids => NearDupStore.forgetMatched(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("ann_index", Seq("embedding", "qv8"),
          ids => AnnIndexStore.forgetMatched(spark, annRoot,
            ids.select(col("subject_id").as("vec_id")))),
        Gdpr.StoreErasure("training_shards", Seq("text", "n_tokens"),
          ids => TrainingShards.forgetMatched(spark, shardsRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("bm25_index", Seq("postings", "dl"),
          ids => IndexStore.forgetMatched(spark, idxRoot,
            ids.select(col("subject_id").as("doc_id"))))),
      audit, "salt", now)
    assert(storeAudit.count() == 5)
    Gdpr.propagate(spark, Seq(2L).toDF("id"), "document",
      Seq(Gdpr.Policy("silver_docs", "doc_id", Map(
        "text" -> (_ => lit("[ERASED]")),
        "author_email" -> (_ => lit(null).cast("string"))))),
      t => s"$root/$t", audit, "salt", now)

    // -- no derived trace of the subject anywhere --
    val silver = AtomicRewrite.read(spark, s"$root/silver_docs")
      .filter(col("doc_id") === 2L).collect()
    assert(silver.length == 1 && silver.head.getString(1) == "[ERASED]"
      && silver.head.isNullAt(2), "silver PII must be scrubbed in place")
    assert(AtomicRewrite.read(spark, dedupRoot)
      .join(subjectFp, Seq("fingerprint"), "left_semi").isEmpty,
      "dedup store still holds the subject's fingerprint")
    assert(AtomicRewrite.read(spark, nearRoot)
      .filter(col("doc_id") === 2L).isEmpty,
      "neardup store still holds the subject's signature")
    val cells = AtomicRewrite.read(spark, AnnIndexStore.Paths(annRoot).cells)
    assert(cells.filter(col("vec_id") === 2L).isEmpty,
      "ann index still holds the subject's embedding")
    assert(AnnIndexStore.query(spark, annRoot,
      Seq((999L, v(2L))).toDF("query_id", "qv"), k = 1)
      .filter(col("neighbor_id") === 2L).isEmpty,
      "the subject's vector must be unretrievable")
    assert(AtomicRewrite.read(spark, TrainingShards.Paths(shardsRoot).shards)
      .filter(col("doc_id") === 2L).isEmpty,
      "the published epoch still holds the subject's document")
    assert(TrainingShards.readManifest(spark, shardsRoot)
      .agg(sum("n_docs")).head().getLong(0) == 2L,
      "the epoch manifest must describe only the committed survivors")
    assert(AtomicRewrite.read(spark, IndexStore.Paths(idxRoot).postings)
      .filter(col("doc_id") === 2L).isEmpty,
      "the retrieval index still holds the subject's postings")
    assert(IndexStore.query(spark, idxRoot,
      Seq((999L, Seq("bob", "central", "monthly"))).toDF("query_id", "terms"))
      .filter(col("doc_id") === 2L).isEmpty,
      "the subject's document must be unretrievable by content terms")

    // -- the ghost is gone: the same content re-submits cleanly --
    val resubmit = Seq((42L, "bob commutes on the central line with a monthly pass"))
      .toDF("doc_id", "text")
    assert(DedupStore.acceptNew(spark, dedupRoot, resubmit, "doc_id",
      DedupStore.textFingerprint(col("text"))).count() == 1,
      "re-submitted content must no longer be blocked by a ghost fingerprint")

    // -- audit: the table row from propagate + exactly one row per store --
    val a = Gdpr.readAudit(spark, audit)
    assert(a.count() == 6, s"expected 6 audit rows, got ${a.count()}")
    val perTable = a.groupBy("table_name").count()
      .as[(String, Long)].collect().toMap
    assert(perTable == Map("silver_docs" -> 1L, "dedup_store" -> 1L,
      "neardup_store" -> 1L, "ann_index" -> 1L, "training_shards" -> 1L,
      "bm25_index" -> 1L), s"got $perTable")
    // one subject, one salted fingerprint — and never the raw id
    assert(a.select("subject_fingerprint").distinct().count() == 1)
    assert(a.select("subject_fingerprint").as[String].collect()
      .forall(_.matches("[0-9a-f]{64}")),
      "audit must carry the salted fingerprint, never the raw id")

    // a subject no store holds claims NO audit rows (propagate's
    // no-false-audit contract, extended to the store path)
    val miss = Gdpr.forgetStores(spark, Seq(999L).toDF("subject_id"),
      "document", Seq(
        Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
          ids => NearDupStore.forgetMatched(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("ann_index", Seq("embedding", "qv8"),
          ids => AnnIndexStore.forgetMatched(spark, annRoot,
            ids.select(col("subject_id").as("vec_id"))))),
      audit, "salt", now)
    assert(miss.isEmpty, "an untouched store must not claim an audit row")
    assert(Gdpr.readAudit(spark, audit).count() == 6,
      "the no-op erasure must append nothing")
    spark.catalog.clearCache()
  }

  test("a partial batch audits only the subjects the store actually held") {
    val root = Files.createTempDirectory("graft-gdpr-partial").toString
    val nearRoot = s"$root/stores/neardup"
    NearDupStore.acceptNew(spark, nearRoot, Seq(
      (1L, "the western loop tram needs better evening frequency"),
      (2L, "airport express trains skip every suburban station"))
      .toDF("doc_id", "text"), "doc_id", "text")

    // batch {1, 999}: the store holds only subject 1
    val audit = Gdpr.forgetStores(spark, Seq(1L, 999L).toDF("subject_id"),
      "document", Seq(
        Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
          ids => NearDupStore.forgetMatched(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id"))))),
      s"$root/audit", "salt", now)
    assert(audit.count() == 1,
      "only the held subject may claim an audit row — 999 was never stored")
    val expected = Seq(1L).toDF("subject_id").select(
      graft.ops.ScdHash.subjectFingerprint("salt", lit("document"),
        col("subject_id"))).head().getString(0)
    assert(Gdpr.readAudit(spark, s"$root/audit")
      .select("subject_fingerprint").as[String].collect().toSeq ==
      Seq(expected), "the audited fingerprint must be subject 1's")
    spark.catalog.clearCache()
  }

  test("a later store's failure cannot lose an earlier store's audit record") {
    val root = Files.createTempDirectory("graft-gdpr-fail").toString
    val nearRoot = s"$root/stores/neardup"
    NearDupStore.acceptNew(spark, nearRoot,
      Seq((7L, "night buses replace the metro after one am"))
        .toDF("doc_id", "text"), "doc_id", "text")

    // store 1 erases and commits; store 2 throws. The delete is
    // irreversible — on a retry store 1's forget matches nothing — so
    // the audit row must have landed BEFORE the failure propagated.
    val boom = intercept[RuntimeException] {
      Gdpr.forgetStores(spark, Seq(7L).toDF("subject_id"), "document", Seq(
        Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
          ids => NearDupStore.forgetMatched(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("flaky_store", Seq("x"),
          _ => throw new RuntimeException("transient fs error"))),
        s"$root/audit", "salt", now)
    }
    assert(boom.getMessage == "transient fs error")
    assert(AtomicRewrite.read(spark, nearRoot).isEmpty,
      "store 1's delete committed before the failure")
    val a = Gdpr.readAudit(spark, s"$root/audit")
    assert(a.count() == 1 &&
      a.select("table_name").as[String].head() == "neardup_store",
      "the committed erasure must have its compliance record")
    spark.catalog.clearCache()
  }
}
