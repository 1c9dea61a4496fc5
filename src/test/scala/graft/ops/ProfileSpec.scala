package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("describe: one row per column with null/distinct/min/max") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("b")),
      (Some(2L), Some("a"))).toDF("x", "s")
    val out = Profile.describe(df, Seq("x", "s"))
      .as[(String, Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out("x") == ("x", 1L, 2L, "1", "2"))
    assert(out("s") == ("s", 1L, 2L, "a", "b"))
  }

  test("histogram: max lands in the last bucket, counts sum to n") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val out = Profile.histogram(df, col("v"), 10)
      .select("bin", "n").as[(Int, Long)].collect().toMap
    assert(out.keySet == (0 to 9).toSet)
    assert(out.values.sum == 100L)
    assert(out(9) == 10L) // 90..99, with max 99 in the last bucket
  }

  test("histogram: NULL values are excluded, never counted in the last bucket") {
    // unfiltered, a null offset rides least()'s null-skipping into the
    // last bucket: least(NULL, bins-1) = bins-1
    val df = ((0 until 100).map(i => Some(i.toDouble)) ++ Seq.fill(5)(None))
      .toDF("v")
    val out = Profile.histogram(df, col("v"), 10)
      .select("bin", "n").as[(Int, Long)].collect().toMap
    assert(out.values.sum == 100L, "nulls must not be bucketed")
    assert(out(9) == 10L)
  }

  test("histogram: constant column degenerates to one bucket at bin 0") {
    // mn == mx would make the width 0/0 = NaN without the guard: NaN
    // floors to 0 in Spark but NULL->least->last bin in a SQL twin.
    val df = Seq.fill(7)(42.0).toDF("v")
    val out = Profile.histogram(df, col("v"), 20)
      .select("bin", "bin_lo", "n").as[(Int, Double, Long)].collect()
    assert(out.toSeq == Seq((0, 42.0, 7L)))
  }
}
