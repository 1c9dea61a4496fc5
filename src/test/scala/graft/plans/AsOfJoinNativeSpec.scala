package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Coverage for the native as-of join plan node (AsOfJoinExec).
  *
  * The key cases:
  *  - randomized equivalence vs the compositional graft.ops.AsOfJoin
  *    (multiple partitions, duplicate keys, unmatched probes);
  *  - a NON-NULLABLE right schema with unmatched left rows — the output
  *    projection must treat right columns as nullable or codegen skips
  *    the null check and emits 0/garbage for the null-fill row;
  *  - key-type mismatch fails fast instead of silently never matching.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("matches the compositional as-of join on randomized frames") {
    val rnd = new Random(42)
    // ~40 keys, refs and probes at random integer times; duplicate
    // (key, time) pairs are pre-deduped (operator contract).
    val refs = Seq.tabulate(600) { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, s"ref_$i")
    }.distinctBy(r => (r._1, r._2))
    val probes = Seq.tabulate(800) { i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }
    val right = refs.toDF("k", "t", "payload").repartition(7)
    val left = probes.toDF("k", "t", "probe_id").repartition(5)

    val native = AsOfJoinNative.join(left, right,
        Seq("k"), Seq("k"), "t", "t")
      .select(col("probe_id"), col("payload"))
      .as[(Long, Option[String])].collect().toMap
    val composed = graft.ops.AsOfJoin.leftAsOf(left, right,
        "k", "k", "t", "t", Seq("payload"))
      .select(col("probe_id"), col("asof_payload"))
      .as[(Long, Option[String])].collect().toMap

    assert(native.size == probes.size)
    assert(native == composed)
  }

  test("unmatched probes get NULL (not 0) for non-nullable right columns") {
    // Seq.toDF gives non-nullable Long/Double columns on the right; the
    // projection must re-bind them nullable for the null-fill row.
    val right = Seq((1L, 10L, 100L, 2.5)).toDF("k", "t", "cnt", "score")
    val left = Seq(
      (1L, 20L, "hit"),    // after the ref row -> match
      (1L, 5L, "early"),   // before any ref -> null fill
      (9L, 50L, "nokey")   // unseen key -> null fill
    ).toDF("k", "t", "tag")

    assert(!right.schema("cnt").nullable) // precondition for the test

    val out = AsOfJoinNative.join(left, right, Seq("k"), Seq("k"), "t", "t")
      .select(col("tag"), col("cnt"), col("score"))
      .as[(String, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out("hit") == (Some(100L), Some(2.5)))
    assert(out("early") == (None, None))
    assert(out("nokey") == (None, None))
  }

  test("string right columns survive unmatched probes (no NPE)") {
    val right = Seq((1L, 10L, "name")).toDF("k", "t", "nm")
    val left = Seq((2L, 10L, 7L)).toDF("k", "t", "id")
    val out = AsOfJoinNative.join(left, right, Seq("k"), Seq("k"), "t", "t")
      .select(col("id"), col("nm")).as[(Long, Option[String])].collect()
    assert(out.toSeq == Seq((7L, None)))
  }

  test("mismatched key types fail fast") {
    val right = Seq((1, 10L, "x")).toDF("k", "t", "v")   // int key
    val left = Seq((1L, 20L, 1L)).toDF("k", "t", "id")   // long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.join(left, right, Seq("k"), Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("key columns must share a type"))
  }

  test("mismatched time types fail fast") {
    val right = Seq((1L, 10, "x")).toDF("k", "t", "v")   // int time
    val left = Seq((1L, 20L, 1L)).toDF("k", "t", "id")   // long time
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.join(left, right, Seq("k"), Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("time columns must share a type"))
  }

  test("composite keys and tie-at-equal-time inclusive semantics") {
    val right = Seq(
      (1L, "a", 10L, "r1"),
      (1L, "a", 20L, "r2"),
      (1L, "b", 15L, "r3")).toDF("k1", "k2", "t", "v")
    val left = Seq(
      (1L, "a", 20L, 1L), // ties r2 -> inclusive
      (1L, "a", 19L, 2L), // r1
      (1L, "b", 14L, 3L), // before r3 -> null
      (1L, "b", 99L, 4L)  // r3
    ).toDF("k1", "k2", "t", "id")
    val out = AsOfJoinNative.join(left, right,
        Seq("k1", "k2"), Seq("k1", "k2"), "t", "t")
      .select(col("id"), col("v")).as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("r2"), 2L -> Some("r1"),
      3L -> None, 4L -> Some("r3")))
  }
}
