package graft.pipeline

import graft.SparkSpec
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The q26 pipeline at sf0.001 with the bucketed gold fact: the
  * fact→daily-agg path must run with zero shuffle exchanges, and the
  * pipeline's aggregate must agree with a direct rollup of the input. */
class RunnerSpec extends SparkSpec {

  test("runAll: bucketed fact -> daily agg has no Exchange and matches a direct rollup") {
    val root = Files.createTempDirectory("graft-runner").toString
    val agg = Runner.runAll(spark, "/root/testdata/sf0.001", root)

    // the exact aggregation shape goldAggIncremental runs over the
    // bucketed fact (first-run path: groupBy over the full source)
    val rollup = Bucketed.read(spark, Runner.bucketedFactTable(root))
      .na.drop("any", Seq("date_key"))
      .groupBy("date_key")
      .agg(count(lit(1)).as("orders_total"))
    rollup.count()
    val physical = rollup.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed fact->agg must not shuffle:\n$physical")

    // the snapshot the pipeline wrote agrees with a direct input rollup
    val direct = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders").count()
    assert(agg.agg(sum("orders_total")).head().getLong(0) == direct)
  }

  test("compaction cycle: the zero-exchange fact->agg property survives compact + re-bucket") {
    // drive the fact through CompactEveryVersions incremental commits so
    // batch 5 compacts + rewrites the bucketed copy, then re-assert the
    // zero-exchange rollup on the REFRESHED bucketed table — the plan
    // property must hold across the table's whole maintenance lifecycle,
    // not just its first write
    val root = Files.createTempDirectory("graft-runner-compact").toString
    val sf = "/root/testdata/sf0.001"
    val customer = graft.core.Tables.load(spark, sf, "customer")
      .withColumn("updated_at", to_timestamp(lit("2020-01-01 00:00:00")))
    val orders = graft.core.Tables.load(spark, sf, "orders")
    // five ascending date slices = five watermark-advancing fact commits
    val cuts = Seq("1900-01-01", "1996-01-01", "1997-01-01", "1998-01-01",
      "1999-01-01", "2100-01-01")
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val slice = orders.filter(
        col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      // each batch gets a LATER now: raw_loaded_at is the silver->gold
      // watermark, so a repeated now would make later batches no-ops
      Runner.runBatch(spark, root, customer, slice,
        java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00"), s"b$i")
    }
    val factRoot = Medallion.Paths(root).gold("fact_orders")
    // batch 5 saw factV=4 -> compacted (one extra full-rewrite version)
    assert(graft.tx.AtomicRewrite.currentVersion(spark, factRoot).contains(5L),
      "expected 5 incremental commits + the compaction rewrite")

    val rollup = Bucketed.read(spark, Runner.bucketedFactTable(root))
      .na.drop("any", Seq("date_key"))
      .groupBy("date_key")
      .agg(count(lit(1)).as("orders_total"))
    rollup.count()
    val physical = rollup.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"post-compaction bucketed fact->agg must not shuffle:\n$physical")
    // and no row was lost or duplicated across the whole lifecycle
    val agg = graft.tx.AtomicRewrite.read(spark,
      Medallion.Paths(root).gold("agg_orders_daily"))
    assert(agg.agg(sum("orders_total")).head().getLong(0) == orders.count())
    spark.catalog.clearCache()
  }
}
