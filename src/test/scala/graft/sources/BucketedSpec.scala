package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join runs with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val dims = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    Bucketed.write(facts, "b_facts", "k", 8)
    Bucketed.write(dims, "b_dims", "k", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "b_facts")
        .join(Bucketed.read(spark, "b_dims"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, plan:\n$plan")

      // aggregation on the bucket key is also shuffle-free
      val agg = Bucketed.read(spark, "b_facts").groupBy("k").agg(sum("v"))
      assert(agg.count() == 50)
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
