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
}
