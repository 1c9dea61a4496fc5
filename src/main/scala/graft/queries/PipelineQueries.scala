package graft.queries

import graft.pipeline.Runner
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The whole medallion pipeline as one oracle-checked query: bronze →
  * silver SCD2 → gold star → incremental daily aggregate, end-to-end over
  * the sf orders/customer tables. Because source keys are unique, the
  * pipeline's aggregate must equal a direct daily rollup of the raw input —
  * which is exactly what the DuckDB oracle states.
  */
object PipelineQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_pipeline_daily" -> ((s, dir) => {
      val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_pipe_$safe"
      val p = new Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      Runner.runAll(s, dir, root)
        .select(col("date_key"), col("orders_total"), col("sum_price"))
    }))

  val oracles: Map[String, String] = Map(
    "q26_pipeline_daily" ->
      """SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
        | count(*) AS orders_total,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin)
}
