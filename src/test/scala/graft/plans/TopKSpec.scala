package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 1000)
    .map(i => (s"g${i % 7}", i.toLong, (i * 37 % 1000).toDouble))
    .toDF("grp", "id", "score").repartition(9)

  private def windowTop3 = {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  test("perKey equals the row_number window result on a total order") {
    val got = TopKPerKey.perKey(sample, Seq("grp"),
      Seq(col("score").desc, col("id")), 3)
    assert(got.count() == 21) // 7 groups x 3
    assert(got.exceptAll(windowTop3).isEmpty && windowTop3.exceptAll(got).isEmpty)
  }

  test("plan is two-phase heap: partial + final, no sort, no window") {
    val got = TopKPerKey.perKey(sample, Seq("grp"),
      Seq(col("score").desc, col("id")), 3)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window") && !plan.contains("Sort ["), plan)
    assert(plan.contains("Exchange"), plan) // co-location by key
  }

  test("optimizer rule rewrites the rank-filter idiom to the heap operator") {
    TopKPerKey.install(spark)
    windowTop3.collect()
    val plan = windowTop3.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ["), plan)
    // and the rewritten plan still returns the right rows
    val viaHeap = windowTop3.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = sample.collect()
      .groupBy(_.getString(0)).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3)
          .map(r => (g, r.getLong(1))).toSeq
      }.toSet
    assert(viaHeap == expected)
  }

  test("rule rewrites rank-ESCAPING projections too, materializing the ordinal") {
    TopKPerKey.install(spark)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val keepRn = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("grp"), col("id"), col("rn")) // rank survives in the output
    keepRn.collect()
    val plan = keepRn.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan)
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ["), plan)
    // the heap-stamped ordinals must equal row_number's
    val got = keepRn.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val expected = sample.collect()
      .groupBy(_.getString(0)).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(3)
          .zipWithIndex.map { case (r, i) => (g, r.getLong(1), i + 1) }.toSeq
      }.toSet
    assert(got == expected)
  }

  test("rank == n idiom rewrites to a bounded n-heap plus ordinal filter") {
    TopKPerKey.install(spark)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val second = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2).drop("rn") // the SCD3 rank-2 idiom
    second.collect()
    val plan = second.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), plan)
    assert(!plan.contains("Window ["), plan)
    val got = second.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = sample.collect()
      .groupBy(_.getString(0)).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).slice(1, 2)
          .map(r => (g, r.getLong(1))).toSeq
      }.toSet
    assert(got == expected)
  }

  test("perKeyWithRank equals row_number on a total order; plan has no window") {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("grp", "id", "rn")
    val got = TopKPerKey.perKeyWithRank(sample, Seq("grp"),
      Seq(col("score").desc, col("id")), 3, "rn")
      .select("grp", "id", "rn")
    assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window ["), plan)
  }

  test("partial-phase cap passes overflow keys through; result still exact") {
    // force the cap far below the key count via a tiny k over many keys
    val many = (1 to 500).map(i => (s"k$i", i.toLong)).toDF("grp", "id")
      .repartition(3)
    val got = TopKPerKey.perKey(many, Seq("grp"), Seq(col("id")), 1)
    assert(got.count() == 500) // every key kept exactly its single row
  }

  test("empty keys = global top-k") {
    val got = TopKPerKey.perKey(sample, Nil, Seq(col("score").desc, col("id")), 5)
    val exact = sample.orderBy(col("score").desc, col("id")).limit(5)
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }
}
