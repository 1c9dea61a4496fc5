package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("reduce/merge keep a sorted deduped k-truncated buffer") {
    val agg = BottomK(3)
    val b = Seq("e", "c", "a", "c", "g").foldLeft(agg.zero)(agg.reduce)
    assert(b == Vector("a", "c", "e"))
    assert(agg.merge(Vector("a", "c", "e"), Vector("b", "c", "z")) ==
      Vector("a", "b", "c"))
    assert(agg.merge(agg.zero, agg.zero) == Vector.empty)
    assert(agg.reduce(Vector("a", "b", "c"), "z") == Vector("a", "b", "c"))
  }

  test("distributed bottom-k equals the exact k smallest distinct values") {
    val vals = (1 to 500).map(i => f"v${i % 97}%04d") // dups across partitions
    val df = vals.toDF("v").repartition(7)
    val got = df.agg(BottomK.bottomK(5)(col("v"))).as[Seq[String]].head()
    assert(got == vals.distinct.sorted.take(5))
  }

  test("long variant: same contract, including negative keys and dedup") {
    val agg = BottomKLong(3)
    val b = Seq(5L, 3L, -1L, 3L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(b == Vector(-1L, 3L, 5L))
    assert(agg.merge(Vector(-1L, 3L, 5L), Vector(0L, 3L, 99L)) ==
      Vector(-1L, 0L, 3L))
    assert(agg.merge(agg.zero, agg.zero) == Vector.empty)
    // Long.MinValue is a real value, not the dedup sentinel
    assert(agg.merge(Vector(Long.MinValue), Vector(Long.MinValue, 7L)) ==
      Vector(Long.MinValue, 7L))

    val vals = (1 to 500).map(i => (i % 97).toLong)
    val df = vals.toDF("v").repartition(7)
    val got = df.agg(BottomK.bottomKLong(5)(col("v"))).as[Seq[Long]].head()
    assert(got == vals.distinct.sorted.take(5))
  }
}
