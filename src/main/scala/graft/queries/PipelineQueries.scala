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

    // The grain-repair lifecycle end-to-end, oracle-proven: an initial
    // load lands 1% of orders under a CORRUPTED date grain (one day
    // late), the incremental aggregate builds on it, a correction batch
    // (newer raw_loaded_at, true dates) flows through the SAME
    // incremental merge — which by its documented constraint rebuilds
    // only the grains the corrected rows now LAND in, stranding the
    // departed corrupted grains — and rebuildGrains then repairs exactly
    // those departed grains (deleting the ones left empty). The final
    // aggregate must equal a direct daily rollup of the TRUE orders,
    // which is what the DuckDB oracle states. Every step is the
    // production path: watermark cut, affected-grain broadcast,
    // partition-level commits, named-grain repair.
    "q95_grain_repair" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_repair_$safe"
      val p = new Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val paths = graft.pipeline.Medallion.Paths(root)
      val orders = graft.core.Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val moved = col("o_orderkey") % 100 === 0
      val grain = Seq("date_key")
      val aggs = Seq(count(lit(1)).as("orders_total"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      def dateKey(c: org.apache.spark.sql.Column) =
        (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("int")
      // initial load: moved keys carry a date one day LATE
      val corrupted = orders.select(col("o_orderkey"),
        dateKey(when(moved, date_add(col("o_orderdate"), 1))
          .otherwise(col("o_orderdate"))).as("date_key"),
        col("o_totalprice"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("raw_loaded_at"))
      graft.pipeline.Medallion.goldAggIncremental(s, paths, "agg",
        corrupted, grain, aggs)
      // correction batch: ONLY the moved keys, true dates, newer stamp —
      // the incremental merge rebuilds the landing grains and (by the
      // documented grain-immutability constraint) strands the departed
      val corrected = orders.select(col("o_orderkey"),
        dateKey(col("o_orderdate")).as("date_key"), col("o_totalprice"),
        to_timestamp(lit("2024-01-02 00:00:00")).as("raw_loaded_at"))
      graft.pipeline.Medallion.goldAggIncremental(s, paths, "agg",
        corrected.filter(moved).unionByName(corrupted.filter(!moved)),
        grain, aggs)
      // repair: the departed grains are where the moved keys USED to be
      val departed = corrupted.filter(moved).select(col("date_key")).distinct()
      graft.pipeline.Medallion.rebuildGrains(s, paths, "agg",
        corrected.filter(moved).unionByName(corrupted.filter(!moved)),
        grain, aggs, grains = departed)
      graft.tx.AtomicRewrite.read(s, paths.gold("agg"))
        .select("date_key", "orders_total", "sum_price")
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
    // after the corrupt → correct → repair lifecycle the aggregate must
    // equal a direct daily rollup of the TRUE orders — corrupted grains
    // may not survive anywhere
    "q95_grain_repair" ->
      """SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
        | count(*) AS orders_total,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
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
