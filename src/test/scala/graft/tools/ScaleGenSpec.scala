package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** ScaleGen is load-bearing for the scaling-evidence chain (BASELINE.md's
  * 10×/100× tables): if its replication invariants silently broke, every
  * probe would measure a different workload. This spec pins them at
  * factor 2 over the smallest shipped testdata.
  */
class ScaleGenSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  private lazy val dst = {
    val d = Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.run(spark, src, d, factor = 2, tables = ScaleGen.Known)
    d
  }

  test("every table doubles with globally unique ids") {
    for ((t, id) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")) {
      val srcN = spark.read.parquet(s"$src/$t.parquet").count()
      val out = spark.read.parquet(s"$dst/$t.parquet")
      assert(out.count() == 2 * srcN, s"$t must double")
      assert(out.select(id).distinct().count() == 2 * srcN,
        s"$t ids must stay unique across replicas")
    }
  }

  test("the scaled star is FK-consistent: orders and events resolve their replica's customers") {
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    val dangling = spark.read.parquet(s"$dst/orders.parquet")
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(dangling == 0, "every scaled order must find its customer")
    val danglingUsers = spark.read.parquet(s"$dst/events.parquet")
      .join(cust, col("user_id") === col("c_custkey"), "left_anti").count()
    assert(danglingUsers == 0,
      "source users ⊆ custkeys must survive the stride per replica")
  }

  test("documents: replica 0 is byte-identical, replicas never share a token") {
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text")
    val out = spark.read.parquet(s"$dst/documents.parquet")
    assert(out.select("doc_id", "text").join(srcDocs, Seq("doc_id", "text"))
      .count() == srcDocs.count(), "replica 0 must carry the source text")
    val tokens = out.select(explode(split(col("text"), " ")).as("tok"),
      (col("doc_id") >= srcDocs.agg(max("doc_id")).head().getLong(0) + 1)
        .as("is_rep1"))
    val shared = tokens.filter(col("is_rep1"))
      .join(tokens.filter(!col("is_rep1")), Seq("tok"), "left_semi")
      .count()
    assert(shared == 0, "no token (hence no shingle) may collide across replicas")
    assert(out.filter(col("n_chars") =!= length(col("text"))).count() == 0,
      "n_chars = length(text) must hold on suffixed replicas too")
  }

  test("embeddings: replica 1 is the exact cyclic shift, so within-replica cosines match the source") {
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val n = spark.read.parquet(s"$src/embeddings.parquet").count()
    val srcRow = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") === 0).head().getSeq[Float](1)
    val repRow = emb.filter(col("vec_id") === n).head().getSeq[Float](1)
    assert(repRow == srcRow.drop(1) ++ srcRow.take(1),
      "replica 1 must be the shift-by-1 permutation of the source vector")
  }
}
