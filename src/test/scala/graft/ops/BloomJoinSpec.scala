package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every built key passes the probe") {
    val keys = (1 to 2000).map(_.toLong)
    val small = keys.toDF("k").repartition(5)
    val bits = BloomJoin.sketch(small, col("k"))
    val misses = small.filter(!BloomJoin.mightContain(col("k"), bits)).count()
    assert(misses == 0, "a bloom filter must never drop a present key")
  }

  test("false-positive rate stays low at this load factor") {
    val bits = BloomJoin.sketch((1 to 2000).map(_.toLong).toDF("k"), col("k"))
    // 2000 keys x 4 hashes over 65536 bits: expect well under 1% fp
    val absent = (1000001 to 1020000).map(_.toLong).toDF("k")
    val fp = absent.filter(BloomJoin.mightContain(col("k"), bits)).count()
    assert(fp < 200, s"false-positive rate too high: $fp / 20000")
  }

  test("bloom semi join equals the plain semi join") {
    val big = (1 to 10000).map(i => (i.toLong % 3000, i.toLong)).toDF("k", "v")
      .repartition(7)
    val small = Seq(5L, 17L, 200L, 2999L, 999999L).toDF("sk")
    val got = BloomJoin.semiJoin(big, "k", small, "sk")
    val exact = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
    assert(got.count() == exact.count())
  }

  test("mismatched key types fail fast instead of silently dropping rows") {
    // int vs bigint hash different byte widths under xxhash64 — the bloom
    // would set different bit positions on build vs probe (false negatives).
    val big = Seq((1L, "a")).toDF("k", "v")   // bigint key
    val small = Seq(1).toDF("sk")             // int key
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(big, "k", small, "sk")
    }
    assert(e.getMessage.contains("must share a type"))
  }

  test("bitmap aggregator merges by OR and splits equal one pass") {
    val agg = BloomJoin.BitsAgg(4)
    val a = agg.reduce(agg.zero, Seq(0L, 64L, 255L))
    assert((a(0) & 1L) == 1L && (a(1) & 1L) == 1L && (a(3) >>> 63) == 1L)
    val merged = agg.merge(agg.reduce(agg.zero, Seq(0L)), agg.reduce(agg.zero, Seq(64L)))
    assert((merged(0) & 1L) == 1L && (merged(1) & 1L) == 1L)
    assert(agg.reduce(agg.zero, null).toSeq == agg.zero.toSeq)
  }
}
