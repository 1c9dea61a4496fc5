package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

case class Doc(doc_id: Long, text: String)

/** Streaming near-dup front door: cross-micro-batch near-dups are
  * rejected against the durable signature store; only first-seen content
  * reaches the downstream sink. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches reject near-dups of everything previously accepted") {
    val dir = Files.createTempDirectory("graft-snd").toString
    val store = s"$dir/store"
    val outDir = s"$dir/accepted"
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val landed = scala.collection.mutable.Buffer[Long]()
    val q = StreamingNearDup.sink(in.toDF(), store, "doc_id", "text") { a =>
      landed ++= a.select("doc_id").as[Long](spark.implicits.newLongEncoder).collect()
      a.write.mode("append").parquet(outDir)
    }
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
      in.addData(Doc(1L, base),
        Doc(2L, base.replace("mu", "nu")), // near-dup of 1, same batch
        Doc(3L, "one two three four five six seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      // a later crawl re-surfaces near-identical content + one new doc
      in.addData(Doc(10L, base.replace("alpha", "omega")),
        Doc(11L, "totally fresh words that appeared nowhere in any earlier crawl batch"))
      q.processAllAvailable()
    } finally q.stop()
    assert(landed.toSet == Set(1L, 3L, 11L))
    val out = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 11L))
    spark.catalog.clearCache()
  }
}
