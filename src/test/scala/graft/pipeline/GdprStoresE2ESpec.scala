package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** The reference's core cross-layer GDPR guarantee ("propagate erasure
  * across every derived layer", gdpr/gdpr_propagate_erasure.py) applied
  * at LLM-pipeline scope: one flow erases a subject from the relational
  * table ([[Gdpr.propagate]]) AND all three derived corpus stores —
  * dedup fingerprints, MinHash signatures, ANN cells — via
  * [[Gdpr.forgetStores]], leaving no derived trace anywhere, unblocking
  * legitimate re-submission, and appending exactly one audit record per
  * store. */
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

    // subject: doc 2. The dedup store keys on the CONTENT fingerprint, so
    // its erasure input derives from the subject's text (captured from the
    // batch — after the scrub the table no longer holds it).
    val subjectFp = docs.filter(col("doc_id") === 2L)
      .select(DedupStore.textFingerprint(col("text")).as("fingerprint"))

    Gdpr.propagate(spark, Seq(2L).toDF("id"), "document",
      Seq(Gdpr.Policy("silver_docs", "doc_id", Map(
        "text" -> (_ => lit("[ERASED]")),
        "author_email" -> (_ => lit(null).cast("string"))))),
      t => s"$root/$t", audit, "salt", now)
    val storeAudit = Gdpr.forgetStores(spark, Seq(2L).toDF("subject_id"),
      "document", Seq(
        Gdpr.StoreErasure("dedup_store", Seq("fingerprint"),
          _ => DedupStore.forget(spark, dedupRoot, subjectFp)),
        Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
          ids => NearDupStore.forget(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("ann_index", Seq("embedding", "qv8"),
          ids => AnnIndexStore.forget(spark, annRoot,
            ids.select(col("subject_id").as("vec_id"))))),
      audit, "salt", now)
    assert(storeAudit.count() == 3)

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

    // -- the ghost is gone: the same content re-submits cleanly --
    val resubmit = Seq((42L, "bob commutes on the central line with a monthly pass"))
      .toDF("doc_id", "text")
    assert(DedupStore.acceptNew(spark, dedupRoot, resubmit, "doc_id",
      DedupStore.textFingerprint(col("text"))).count() == 1,
      "re-submitted content must no longer be blocked by a ghost fingerprint")

    // -- audit: the table row from propagate + exactly one row per store --
    val a = Gdpr.readAudit(spark, audit)
    assert(a.count() == 4, s"expected 4 audit rows, got ${a.count()}")
    val perTable = a.groupBy("table_name").count()
      .as[(String, Long)].collect().toMap
    assert(perTable == Map("silver_docs" -> 1L, "dedup_store" -> 1L,
      "neardup_store" -> 1L, "ann_index" -> 1L), s"got $perTable")
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
          ids => NearDupStore.forget(spark, nearRoot,
            ids.select(col("subject_id").as("doc_id")))),
        Gdpr.StoreErasure("ann_index", Seq("embedding", "qv8"),
          ids => AnnIndexStore.forget(spark, annRoot,
            ids.select(col("subject_id").as("vec_id"))))),
      audit, "salt", now)
    assert(miss.isEmpty, "an untouched store must not claim an audit row")
    assert(Gdpr.readAudit(spark, audit).count() == 4,
      "the no-op erasure must append nothing")
    spark.catalog.clearCache()
  }
}
