package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimate never undercounts; merge is elementwise and commutative") {
    val agg = CountMin(4, 64)
    val vals = Seq("a", "b", "a", "c", "a", "b")
    val sk = vals.foldLeft(agg.zero)(agg.reduce)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((v, n) <- exact)
      assert(CountMin.estimate(sk.toSeq, v, 4, 64) >= n, s"undercounted $v")
    // merge of split halves equals one-pass reduce (mergeability)
    val (l, r) = vals.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == sk.toSeq)
    // nulls are ignored
    assert(agg.reduce(agg.zero, null).toSeq == agg.zero.toSeq)
  }

  test("distributed sketch bounds every key's count on skewed data") {
    // zipf-ish: key k appears 500/k times — heavy hitters dominate
    val vals = (1 to 20).flatMap(k => Seq.fill(500 / k)(s"k$k"))
    val df = vals.toDF("v").repartition(7)
    val sk = df.agg(CountMin.countMin(4, 256)(col("v"))).as[Seq[Long]].head()
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = vals.size
    for ((v, c) <- exact) {
      val est = CountMin.estimate(sk, v, 4, 256)
      assert(est >= c, s"$v undercounted: $est < $c")
      assert(est <= c + 8L * n / 256, s"$v overshoot: $est vs $c (n=$n)")
    }
  }
}
