package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregate equals the direct groupBy") {
    // one hot key (90% of rows) + long tail
    val df = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 37}"
      (k, i.toDouble / 7)
    }.toDF("k", "v").repartition(8)

    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 16)
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(38,6)")).cast("double").as("sum_value"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("phase-1 spreads the hot key across salt buckets") {
    val df = Seq.fill(1000)(("hot", 1.0)).toDF("k", "v")
    val buckets = df
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(16)))
      .select("__salt").distinct().count()
    // identical rows hash identically — spread needs row variety; verify
    // with varied rows instead
    val varied = (1 to 1000).map(i => ("hot", i.toDouble)).toDF("k", "v")
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(16)))
      .select("__salt").distinct().count()
    assert(varied == 16, s"expected full salt spread, got $varied (identical-row spread was $buckets)")
  }
}
