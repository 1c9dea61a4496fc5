package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc plan auditor: builds the sf0.001 pipeline into a temp root and
  * prints the physical scan details of a month-pruned fact read — run it
  * to confirm partition filters prune the manifest-backed layout. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.fromEnv("explain-check")
    spark.sparkContext.setLogLevel("ERROR")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_explain"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    graft.pipeline.Runner.runAll(spark, "/root/testdata/sf0.001", root)
    val fact = graft.tx.AtomicRewrite.read(spark, s"$root/gold/fact_orders")
    val q = fact.filter(col("month_key") === 199801).select("o_orderkey", "o_totalprice")
    q.collect()
    println("== month-pruned fact scan ==")
    println(q.queryExecution.executedPlan.toString.split("\n")
      .filter(l => Seq("PartitionFilters", "ReadSchema", "Scan", "PushedFilters")
        .exists(l.contains)).mkString("\n").take(2500))
    println("rows=" + q.count())
    spark.stop()
  }
}
