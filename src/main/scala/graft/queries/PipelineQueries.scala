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
        .select(col("date_key"), col("orders_total"), col("sum_price"),
          col("is_weekend"), col("day_name"))
    }),

    // fact_payments through the real pipeline path (bronze → silver SCD2 →
    // stale dim_payment_method → fact build): surrogate validation sends
    // the dim-unseen '1-urgent' method to key 0. The xxhash surrogate
    // itself is not SQL-replayable (q15 proves its invariants), so the
    // oracle checks the validation OUTCOME — key==0 exactly for unseen
    // methods — plus the date-key chain and carried measures.
    "q52_fact_payments" -> ((s, dir) => {
      val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_pay_$safe"
      val p = new Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      Runner.runPayments(s, dir, root)
        .select(col("payment_id"), col("method"), col("payment_date_key"),
          (col("payment_method_key") === 0).as("method_key_unknown"),
          col("amount"))
    }))

  val oracles: Map[String, String] = Map(
    "q26_pipeline_daily" ->
      """SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
        | count(*) AS orders_total,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        | CAST(strftime(o_orderdate, '%w') AS INT) IN (0, 6) AS is_weekend,
        | dayname(o_orderdate) AS day_name
        |FROM orders GROUP BY 1, 4, 5""".stripMargin,
    "q52_fact_payments" ->
      """SELECT o_orderkey AS payment_id,
        | lower(trim(o_orderpriority)) AS method,
        | CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS payment_date_key,
        | (lower(trim(o_orderpriority)) = '1-urgent') AS method_key_unknown,
        | o_totalprice AS amount
        |FROM orders""".stripMargin)
}
