package graft.streaming

import graft.SparkSpec
import graft.pipeline.IndexStore
import graft.tx.AtomicRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming BM25 ingestion: micro-batches append into the persisted
  * index through O(touched-buckets) commits; documents are queryable
  * after their batch, a replayed batch replaces instead of duplicating,
  * and a CORRECTED redelivery replaces the old content everywhere —
  * stale tokens never ghost-match. */
class StreamingIndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private def q1(terms: String*) =
    Seq((900L, terms)).toDF("query_id", "terms")

  test("micro-batches become queryable; replay idempotent; correction replaces everywhere") {
    val dir = Files.createTempDirectory("graft-sidx").toString
    val root = s"$dir/index"
    IndexStore.build(spark, root, Seq(
      (1L, "red line trains run fast"),
      (2L, "blue line trams crawl slow")).toDF("doc_id", "text"))
    val postRoot = IndexStore.Paths(root).postings

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingIndexIngest.sink(in.toDF(), root)
    try {
      // batch 1: a new doc is retrievable the moment its batch commits
      in.addData(Doc(3L, "harbour ferries cross twice daily"))
      q.processAllAvailable()
      assert(IndexStore.query(spark, root, q1("harbour"))
        .select("doc_id").as[Long].collect().toSet == Set(3L))

      // batch 2 replays batch 1 verbatim (at-least-once delivery):
      // postings must replace, never duplicate
      val n = AtomicRewrite.read(spark, postRoot).count()
      in.addData(Doc(3L, "harbour ferries cross twice daily"))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, postRoot).count() == n,
        "a replayed batch duplicated postings")

      // batch 3 redelivers doc 3 CORRECTED: the old content's tokens
      // live in buckets the new tokens never touch — they must be gone
      in.addData(Doc(3L, "night owl coaches replace them"))
      q.processAllAvailable()
      assert(IndexStore.query(spark, root, q1("harbour")).isEmpty,
        "a corrected doc's stale posting still matches")
      assert(IndexStore.query(spark, root, q1("coaches"))
        .select("doc_id").as[Long].collect().toSet == Set(3L))
      assert(AtomicRewrite.read(spark, IndexStore.Paths(root).docstats)
        .filter(col("doc_id") === 3L).count() == 1)
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("forget between micro-batches: redelivery lands erased docs exactly once") {
    val dir = Files.createTempDirectory("graft-sidx-f").toString
    val root = s"$dir/index"
    IndexStore.build(spark, root,
      Seq((1L, "red line trains run fast")).toDF("doc_id", "text"))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingIndexIngest.sink(in.toDF(), root)
    try {
      in.addData(Doc(5L, "weekend closures on the loop"))
      q.processAllAvailable()
      assert(IndexStore.query(spark, root, q1("closures")).count() == 1)
      // GDPR forget mid-stream
      assert(IndexStore.forget(spark, root, Seq(5L).toDF("doc_id")))
      assert(IndexStore.query(spark, root, q1("closures")).isEmpty)
      // the source redelivers the erased doc (at-least-once): it lands
      // exactly once — the store replaces, the erasure is not undone
      // silently into duplicates
      in.addData(Doc(5L, "weekend closures on the loop"))
      q.processAllAvailable()
      assert(IndexStore.query(spark, root, q1("closures"))
        .select("doc_id").as[Long].collect().toSeq == Seq(5L))
      assert(AtomicRewrite.read(spark, IndexStore.Paths(root).docstats)
        .filter(col("doc_id") === 5L).count() == 1)
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
