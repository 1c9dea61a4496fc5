package graft.streaming

import graft.SparkSpec
import graft.pipeline.AnnIndexStore
import graft.tx.AtomicRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

case class Vec(vec_id: Long, embedding: Seq[Float])

/** Streaming ANN ingestion: micro-batches append into the persisted IVF
  * index through O(touched-cells) commits; vectors are queryable after
  * their batch, and a replayed batch replaces instead of duplicating. */
class StreamingAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(block: Int, noise: Float): Seq[Float] = {
    val v = Array.fill(4)(0f); v(block) = 1f; v((block + 1) % 4) = noise; v.toSeq
  }

  test("micro-batches land in cells incrementally; replay is idempotent") {
    val dir = Files.createTempDirectory("graft-sann").toString
    val root = s"$dir/index"
    // fixed centroids: one per block axis
    val cents = (0 until 4).map(b => (b + 1, vec(b, 0f)))
      .toDF("centroid_id", "cv")
    val seed = (1L to 40L).map(id =>
      (id, vec((((id - 1) / 10) % 4).toInt, (id % 7).toFloat * 0.01f)))
      .toDF("vec_id", "embedding")
    AnnIndexStore.build(spark, root, seed, cents)
    val cellsRoot = AnnIndexStore.Paths(root).cells
    val v0 = AtomicRewrite.currentVersion(spark, cellsRoot)

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Vec]
    val q = StreamingAnnIngest.sink(in.toDF(), root)
    try {
      // batch 1: two vectors into block 1's cell only
      in.addData(Vec(101L, vec(1, 0.005f)), Vec(102L, vec(1, 0.005f)))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, cellsRoot).count() == 42)
      // only the touched cell was staged in the new version
      val v1 = AtomicRewrite.currentVersion(spark, cellsRoot).get
      assert(v1 == v0.get + 1)
      val staged = new java.io.File(s"$cellsRoot/v=$v1").listFiles()
        .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSet
      assert(staged == Set("centroid_id=2"), s"staged $staged")
      // the appended vectors are immediately queryable
      val got = AnnIndexStore.query(spark, root,
        Seq((999L, vec(1, 0.005f))).toDF("query_id", "qv"), k = 2)
        .select("neighbor_id").as[Long].collect().toSet
      assert(got == Set(101L, 102L), s"got $got")
      // batch 2 replays the same vec_ids (at-least-once delivery):
      // the index must replace, never duplicate
      in.addData(Vec(101L, vec(1, 0.005f)), Vec(102L, vec(1, 0.005f)))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, cellsRoot).count() == 42)
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("forget between micro-batches: redelivery lands erased ids exactly once") {
    val dir = Files.createTempDirectory("graft-sann-forget").toString
    val root = s"$dir/index"
    val cents = (0 until 4).map(b => (b + 1, vec(b, 0f)))
      .toDF("centroid_id", "cv")
    val seed = (1L to 40L).map(id =>
      (id, vec((((id - 1) / 10) % 4).toInt, (id % 7).toFloat * 0.01f)))
      .toDF("vec_id", "embedding")
    AnnIndexStore.build(spark, root, seed, cents)
    val cellsRoot = AnnIndexStore.Paths(root).cells

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Vec]
    val q = StreamingAnnIngest.sink(in.toDF(), root)
    try {
      in.addData(Vec(201L, vec(2, 0.005f)), Vec(202L, vec(2, 0.005f)))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, cellsRoot).count() == 42)

      // a GDPR forget lands between micro-batches
      AnnIndexStore.forget(spark, root, Seq(201L).toDF("vec_id"))
      val afterForget = AtomicRewrite.read(spark, cellsRoot)
      assert(afterForget.count() == 41 &&
        afterForget.filter(col("vec_id") === 201L).isEmpty)

      // at-least-once redelivery of the SAME rows (crash replay): the
      // deleted-then-reingested edge — the erased id re-lands as fresh
      // content exactly once, and the survivor is replaced, not duplicated
      in.addData(Vec(201L, vec(2, 0.005f)), Vec(202L, vec(2, 0.005f)))
      q.processAllAvailable()
      val cells = AtomicRewrite.read(spark, cellsRoot)
      assert(cells.count() == 42, "replay after forget must not duplicate")
      assert(cells.filter(col("vec_id").isin(201L, 202L)).count() == 2)
      // and the re-ingested vector is queryable again
      val got = AnnIndexStore.query(spark, root,
        Seq((999L, vec(2, 0.005f))).toDF("query_id", "qv"), k = 2)
        .select("neighbor_id").as[Long].collect().toSet
      assert(got == Set(201L, 202L), s"got $got")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
