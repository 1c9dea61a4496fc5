package graft.pipeline

import graft.SparkSpec
import graft.tx.{AtomicRewrite, Watermarks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Incremental GDPR request feed: only processed erasure requests past the
  * control watermark are propagated; replay is a no-op; a FAIL run never
  * regresses last_processed_at and the failed batch is re-scanned. */
class GdprRequestsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def requests(rows: (String, Option[Long], Option[String], Option[Long], String, String, Option[String])*): DataFrame =
    rows.toSeq
      .toDF("request_id", "passenger_id", "subject_type", "subject_id",
        "request_type", "status", "processed_at")
      .withColumn("processed_at", to_timestamp(col("processed_at")))

  test("incremental scan, legacy normalization, replay no-op, FAIL keeps watermark") {
    val root = Files.createTempDirectory("graft-gdpr-req").toString
    val control = s"$root/control/gdpr_control"
    AtomicRewrite.write(spark, s"$root/silver/passengers",
      Seq((1L, "Alice"), (2L, "Bob"), (3L, "Cara")).toDF("passenger_id", "full_name"))

    def policiesFor(st: String): Seq[Gdpr.Policy] = Seq(
      Gdpr.Policy("silver/passengers", "passenger_id",
        Map("full_name" -> (_ => lit(null).cast("string")))))

    val batch1 = requests(
      // modern shape, processed -> in scope
      ("r1", None, Some("passenger"), Some(1L), "erasure", "processed", Some("2024-01-01 10:00:00")),
      // legacy shape (passenger_id only) -> normalized to passenger
      ("r2", Some(2L), None, None, "erasure", "processed", Some("2024-01-01 11:00:00")),
      // not processed / not erasure / no processed_at -> all out of scope
      ("r3", None, Some("passenger"), Some(3L), "erasure", "pending", None),
      ("r4", None, Some("passenger"), Some(3L), "access", "processed", Some("2024-01-01 12:00:00")),
      // MALFORMED modern row: typed 'driver' with NULL subject_id but a
      // passenger_id present — must be DROPPED, never resolved against
      // the legacy column (that would erase passenger 3 as a driver)
      ("r5x", Some(3L), Some("driver"), None, "erasure", "processed", Some("2024-01-01 10:30:00")))

    val n1 = GdprRequests.runIncremental(spark, control, batch1, policiesFor,
      t => s"$root/$t", s"$root/audit", "s", ts("2024-01-02 00:00:00"))
    assert(n1 == 2L)
    assert(Watermarks.read(spark, control, GdprRequests.Job)
      .contains(ts("2024-01-01 11:00:00")))
    val names = AtomicRewrite.read(spark, s"$root/silver/passengers")
      .select("passenger_id", "full_name").as[(Long, Option[String])].collect().toMap
    assert(names(1L).isEmpty && names(2L).isEmpty && names(3L).contains("Cara"))

    // replay: same feed, nothing past the watermark -> no-op
    val n2 = GdprRequests.runIncremental(spark, control, batch1, policiesFor,
      t => s"$root/$t", s"$root/audit", "s", ts("2024-01-03 00:00:00"))
    assert(n2 == 0L)
    assert(Watermarks.read(spark, control, GdprRequests.Job)
      .contains(ts("2024-01-01 11:00:00")))

    // FAIL mid-propagation: watermark must NOT advance past the old mark
    val batch2 = batch1.unionByName(requests(
      ("r5", None, Some("passenger"), Some(3L), "erasure", "processed",
        Some("2024-01-05 09:00:00"))))
    intercept[RuntimeException] {
      GdprRequests.runIncremental(spark, control, batch2,
        _ => throw new RuntimeException("boom"),
        t => s"$root/$t", s"$root/audit", "s", ts("2024-01-06 00:00:00"))
    }
    assert(Watermarks.read(spark, control, GdprRequests.Job)
      .contains(ts("2024-01-01 11:00:00")), "FAIL never regresses/advances")

    // recovery: next good run re-scans and processes the failed request
    val n3 = GdprRequests.runIncremental(spark, control, batch2, policiesFor,
      t => s"$root/$t", s"$root/audit", "s", ts("2024-01-07 00:00:00"))
    assert(n3 == 1L)
    assert(Watermarks.read(spark, control, GdprRequests.Job)
      .contains(ts("2024-01-05 09:00:00")))
    assert(AtomicRewrite.read(spark, s"$root/silver/passengers")
      .filter(col("passenger_id") === 3L).select("full_name")
      .collect()(0).isNullAt(0))
  }

  test("storesFor extends a request cycle to the derived corpus stores") {
    val root = Files.createTempDirectory("graft-gdpr-req-stores").toString
    val control = s"$root/control/gdpr_control"
    AtomicRewrite.write(spark, s"$root/silver/passengers",
      Seq((1L, "Alice"), (2L, "Bob")).toDF("passenger_id", "full_name"))
    // derived stores keyed by the subject id: signatures, a published
    // training epoch, and the serving-side retrieval index — the full
    // propagate-everywhere surface driven from ONE request cycle
    val docs = Seq((1L, "alice writes about the northern line all week"),
        (2L, "bob prefers the central line in the morning"))
      .toDF("doc_id", "text")
    val nearRoot = s"$root/stores/neardup"
    NearDupStore.acceptNew(spark, nearRoot, docs, "doc_id", "text")
    val shardsRoot = s"$root/stores/shards"
    TrainingShards.build(spark, shardsRoot,
      docs.select(col("doc_id"), lit(8L).as("n_tokens"),
        col("doc_id").as("train_pos"), col("text")), nShards = 2)
    val idxRoot = s"$root/stores/bm25"
    IndexStore.build(spark, idxRoot, docs)

    def policiesFor(st: String) = Seq(
      Gdpr.Policy("silver/passengers", "passenger_id",
        Map("full_name" -> (_ => lit(null).cast("string")))))
    def storesFor(st: String) = Seq(
      Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
        ids => NearDupStore.forgetMatched(spark, nearRoot,
          ids.select(col("subject_id").as("doc_id")))),
      Gdpr.StoreErasure("training_shards", Seq("text", "n_tokens"),
        ids => TrainingShards.forgetMatched(spark, shardsRoot,
          ids.select(col("subject_id").as("doc_id")))),
      Gdpr.StoreErasure("bm25_index", Seq("postings", "dl"),
        ids => IndexStore.forgetMatched(spark, idxRoot,
          ids.select(col("subject_id").as("doc_id")))))

    val n = GdprRequests.runIncremental(spark, control,
      requests(("r1", None, Some("passenger"), Some(1L), "erasure",
        "processed", Some("2024-01-01 10:00:00"))),
      policiesFor, t => s"$root/$t", s"$root/audit", "s",
      ts("2024-01-02 00:00:00"), storesFor)
    assert(n == 1L)
    // the request scrubbed the table AND dropped the store signatures
    assert(AtomicRewrite.read(spark, s"$root/silver/passengers")
      .filter(col("passenger_id") === 1L).head().isNullAt(1))
    assert(AtomicRewrite.read(spark, nearRoot)
      .filter(col("doc_id") === 1L).isEmpty)
    assert(AtomicRewrite.read(spark, nearRoot)
      .filter(col("doc_id") === 2L).count() == 1,
      "the bystander's signatures must survive")
    assert(AtomicRewrite.read(spark, TrainingShards.Paths(shardsRoot).shards)
      .filter(col("doc_id") === 1L).isEmpty,
      "the published epoch still holds the subject's row")
    assert(TrainingShards.readManifest(spark, shardsRoot)
      .agg(sum("n_docs")).head().getLong(0) == 1L)
    assert(AtomicRewrite.read(spark, IndexStore.Paths(idxRoot).postings)
      .filter(col("doc_id") === 1L).isEmpty,
      "the retrieval index still holds the subject's postings")
    // one audit row for the table, one per store, same fingerprint
    val audit = Gdpr.readAudit(spark, s"$root/audit")
    assert(audit.select("table_name").as[String].collect().sorted.toSeq ==
      Seq("bm25_index", "neardup_store", "silver/passengers",
        "training_shards"))
    assert(audit.select("subject_fingerprint").distinct().count() == 1)
    spark.catalog.clearCache()
  }
}
