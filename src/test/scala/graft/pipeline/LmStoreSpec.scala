package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Contract of the persisted unigram LM: hand-computable smoothed scores,
  * total scoring (OOV docs finite, counted), replacement on retrain, and
  * zero-OOV self-scoring on the training corpus.
  */
class LmStoreSpec extends SparkSpec {

  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match the add-half formula on a hand-computed corpus") {
    val root = Files.createTempDirectory("graft-lm").toString
    // freqs: a=3 b=2 c=1, N=6, V=3
    val ref = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    LmStore.train(spark, root, ref)
    val out = LmStore.score(spark, root,
        Seq((10L, "a b"), (11L, "z z")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val denom = 6.0 + 0.5 * 3
    val known = out(10L)
    assert(known.getLong(1) == 2 && known.getLong(2) == 0)
    val expKnown = round6((-math.log(3.5 / denom) - math.log(2.5 / denom)) / 2)
    assert(known.getDouble(3) == expKnown, s"got ${known.getDouble(3)}, want $expKnown")
    assert(known.getDouble(4) == round6(math.exp(expKnown)))
    // OOV doc: finite, every token counted as unseen, scored at cf=0
    val oov = out(11L)
    assert(oov.getLong(2) == 2)
    val expOov = round6(-math.log(0.5 / denom))
    assert(oov.getDouble(3) == expOov)
    // rare content must score strictly worse (higher nlp) than common
    assert(oov.getDouble(3) > known.getDouble(3))
  }

  test("training on an empty reference fails loudly instead of NULLing scores") {
    val root = Files.createTempDirectory("graft-lm-empty").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LmStore.train(spark, root, empty)
    }
    assert(e.getMessage.contains("empty reference"))
  }

  test("self-scoring the training corpus has zero OOV; retrain replaces") {
    val root = Files.createTempDirectory("graft-lm2").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    LmStore.train(spark, root, docs)
    val self = LmStore.score(spark, root, docs).persist()
    assert(self.count() == docs.count())
    assert(self.filter(col("oov_tokens") > 0).count() == 0,
      "the training corpus cannot contain tokens its own LM never saw")
    assert(self.filter(col("avg_neg_logp").isNull ||
      isnan(col("avg_neg_logp"))).count() == 0)
    self.unpersist()
    // retraining on a tiny corpus replaces the artifact: the old vocab
    // is gone, so formerly-known tokens now count as OOV
    LmStore.train(spark, root, Seq((1L, "only these words")).toDF("doc_id", "text"))
    val rescored = LmStore.score(spark, root,
      Seq((2L, "key value table")).toDF("doc_id", "text")).head()
    assert(rescored.getLong(2) == 3, "retrain must fully replace the vocab")
  }
}
