package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.{LmStore, TokenizerStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Trained artifacts on a live stream: the tokenizer/LM stores are pure
  * per-batch functions of (store, batch), so foreachBatch composition is
  * direct — and the semantics under a MID-STREAM retrain are the ANN
  * forget-interplay analog: every micro-batch encodes/scores with the
  * artifact CURRENT at its landing time, already-landed rows keep the
  * version they landed with, and a crash replay re-encodes with the
  * current artifact (downstream sinks that must pin a version should
  * land the artifact's version column alongside — the manifest tables
  * version naturally via AtomicRewrite).
  */
class StreamingArtifactsSpec extends SparkSpec {
  import spark.implicits._

  test("each micro-batch encodes with the artifact current at landing time") {
    val root = Files.createTempDirectory("graft-stream-tok").toString
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: "aa bb" dominates, so rank-1 merges come from it
    val ref = Seq((1L, "aa bb aa bb aa bb cc"), (2L, "aa bb aa bb dd"))
      .toDF("doc_id", "text")
    TokenizerStore.train(spark, root, ref, rounds = 1)
    val merged1 = TokenizerStore.merges(spark, root).collect().map(_.getString(2)).toSet

    val in = MemoryStream[Doc]
    val landed = scala.collection.mutable.Buffer[(Long, Seq[String])]()
    val q = in.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        landed ++= TokenizerStore.encode(spark, root, batch)
          .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
        ()
    }.start()
    try {
      in.addData(Doc(10L, "aa bb cc"))
      q.processAllAvailable()
      // a retrain lands between micro-batches (2 more merges)
      TokenizerStore.train(spark, root, ref, rounds = 3)
      in.addData(Doc(11L, "aa bb cc"))
      q.processAllAvailable()
    } finally q.stop()
    val enc = landed.toMap
    // batch 1 encoded with the 1-merge artifact, batch 2 with the 3-merge
    // one — same input text, different (more compressed) encoding
    assert(enc(10L).exists(merged1.contains),
      s"batch 1 must use the rank-1 merge: ${enc(10L)}")
    assert(enc(11L).length < enc(10L).length,
      s"post-retrain encoding must compress further: ${enc(10L)} vs ${enc(11L)}")
    // landing-time semantics: encoding the SAME text through the store
    // NOW yields batch 2's (current-artifact) form, not the form batch 1
    // landed with — what landed is a snapshot only the sink holds
    val now = TokenizerStore.encode(spark, root,
        Seq((99L, "aa bb cc")).toDF("doc_id", "text")).head().getSeq[String](1)
    assert(now == enc(11L) && now != enc(10L),
      s"current artifact must encode like batch 2: $now vs ${enc(10L)}")
  }

  test("a stored LM scores micro-batches; OOV drift is visible per batch") {
    val root = Files.createTempDirectory("graft-stream-lm").toString
    implicit val sqlCtx = spark.sqlContext
    LmStore.train(spark, root,
      Seq((1L, "the quick brown fox")).toDF("doc_id", "text"))
    val in = MemoryStream[Doc]
    val scored = scala.collection.mutable.Buffer[(Long, Long)]()
    val q = in.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        scored ++= LmStore.score(spark, root, batch)
          .collect().map(r => (r.getLong(0), r.getLong(2)))
        ()
    }.start()
    try {
      in.addData(Doc(20L, "the quick fox"), Doc(21L, "entirely novel tokens"))
      q.processAllAvailable()
    } finally q.stop()
    val byId = scored.toMap
    assert(byId(20L) == 0, "in-vocab doc must show zero OOV")
    assert(byId(21L) == 3, "novel doc must count every token as OOV")
  }
}
