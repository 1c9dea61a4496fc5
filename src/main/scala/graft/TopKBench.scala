package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: A/B the TopKPerKey heap operator against the row_number
  * window on the same top-3-per-supplier ask (lineitem, ~600k rows at
  * sf0.1, ~1000 suppliers). The window sorts every group's full row set;
  * the heap ships at most keys×k rows into the exchange. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-topk-bench")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = graft.core.Tables.load(spark, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    li.count() // warm the scan

    def time(label: String)(f: => Unit): Unit = for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      f
      println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    time("heap  ") {
      graft.plans.TopKPerKey.perKey(li, Seq("l_suppkey"), order, 3)
        .write.format("noop").mode("overwrite").save()
    }
    // window WITHOUT the rewrite (keep rn in the projection so the rule
    // cannot fire) — the plan Spark runs when the idiom isn't recognized
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    time("window") {
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
