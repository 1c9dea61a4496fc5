package graft.streaming

import graft.SparkSpec
import graft.pipeline.{Gdpr, GdprRequests, NearDupStore}
import graft.tx.{AtomicRewrite, Watermarks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

case class ErasureRequest(request_id: String, subject_type: String,
                          subject_id: Long, request_type: String,
                          status: String, processed_at: Timestamp)

/** A live erasure-request feed drives the full GDPR cycle per
  * micro-batch: table scrub + derived-store forget + audit + watermark,
  * with replayed batches no-ops and later batches incremental. */
class StreamingGdprSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("micro-batches scrub tables and stores incrementally; replay is a no-op") {
    val root = Files.createTempDirectory("graft-sgdpr").toString
    val control = s"$root/control/gdpr_control"
    AtomicRewrite.write(spark, s"$root/silver/passengers",
      Seq((1L, "Alice"), (2L, "Bob"), (3L, "Cara"))
        .toDF("passenger_id", "full_name"))
    val nearRoot = s"$root/stores/neardup"
    NearDupStore.acceptNew(spark, nearRoot, Seq(
      (1L, "alice files a complaint about the northern line gates"),
      (2L, "bob praises the central line staff every single morning"),
      (3L, "cara swaps her tram pass for a folding bicycle instead"))
      .toDF("doc_id", "text"), "doc_id", "text")

    def policiesFor(st: String) = Seq(
      Gdpr.Policy("silver/passengers", "passenger_id",
        Map("full_name" -> (_ => lit(null).cast("string")))))
    def storesFor(st: String) = Seq(
      Gdpr.StoreErasure("neardup_store", Seq("minhash_signature"),
        ids => NearDupStore.forgetMatched(spark, nearRoot,
          ids.select(col("subject_id").as("doc_id")))))

    // deterministic per-batch clock
    var clock = ts("2024-02-01 00:00:00")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ErasureRequest]
    val q = StreamingGdpr.sink(in.toDF(), control, policiesFor,
      t => s"$root/$t", s"$root/audit", "salt", storesFor, () => clock)
    try {
      // batch 1: subject 1 erased
      in.addData(ErasureRequest("r1", "passenger", 1L, "erasure",
        "processed", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val names = AtomicRewrite.read(spark, s"$root/silver/passengers")
      assert(names.filter(col("passenger_id") === 1L).head().isNullAt(1))
      assert(names.filter(col("passenger_id") === 2L).head().getString(1) == "Bob")
      assert(AtomicRewrite.read(spark, nearRoot)
        .select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
      assert(Watermarks.read(spark, control, GdprRequests.Job)
        .contains(ts("2024-01-01 10:00:00")))

      // batch 2 replays request 1 (at the watermark -> out of scope) and
      // adds subject 3 — only 3 is processed
      clock = ts("2024-02-02 00:00:00")
      in.addData(
        ErasureRequest("r1", "passenger", 1L, "erasure",
          "processed", ts("2024-01-01 10:00:00")),
        ErasureRequest("r2", "passenger", 3L, "erasure",
          "processed", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, s"$root/silver/passengers")
        .filter(col("full_name").isNotNull)
        .select("passenger_id").as[Long].collect().toSeq == Seq(2L))
      assert(AtomicRewrite.read(spark, nearRoot)
        .select("doc_id").as[Long].collect().toSet == Set(2L),
        "the bystander's signatures survive both cycles")
      assert(Watermarks.read(spark, control, GdprRequests.Job)
        .contains(ts("2024-01-01 12:00:00")))

      // audit: 2 per processed subject (table + store), none for replay
      val audit = Gdpr.readAudit(spark, s"$root/audit")
      assert(audit.count() == 4, s"got ${audit.count()}")
      assert(audit.select("subject_fingerprint").distinct().count() == 2)

      // batch 3: a STRAGGLER — processed_at 11:30 is BELOW the advanced
      // watermark (12:00) because its source partition lagged. The plain
      // watermark filter would drop it forever; the lateness window +
      // id-level dedup must erase subject 2 exactly once.
      clock = ts("2024-02-03 00:00:00")
      in.addData(ErasureRequest("r3", "passenger", 2L, "erasure",
        "processed", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, s"$root/silver/passengers")
        .filter(col("full_name").isNotNull).isEmpty,
        "the straggler's subject must be erased despite its below-watermark stamp")
      assert(AtomicRewrite.read(spark, nearRoot).isEmpty)

      // batch 4 redelivers the straggler — the id log dedups it
      clock = ts("2024-02-04 00:00:00")
      in.addData(ErasureRequest("r3", "passenger", 2L, "erasure",
        "processed", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val audit2 = Gdpr.readAudit(spark, s"$root/audit")
      assert(audit2.count() == 6,
        s"straggler adds exactly 2 rows once, got ${audit2.count()}")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
