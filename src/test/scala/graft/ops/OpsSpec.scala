package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleansingSpec extends SparkSpec {
  import spark.implicits._

  test("scrubNullLike trims and nulls null-like tokens") {
    val out = Seq(" x ", "NULL", "n/a", "", "-", "ok").toDF("v")
      .select(Cleansing.scrubNullLike(col("v")).as("v")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("x"), None, None, None, None, Some("ok")))
  }

  test("nonNegativeOrNull and inRangeOrNull guard values") {
    val out = Seq(-1.0, 0.0, 2.5).toDF("v")
      .select(Cleansing.nonNegativeOrNull(col("v")).as("a"),
        Cleansing.inRangeOrNull(col("v"), lit(0.0), lit(2.0)).as("b"))
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq((None, None), (Some(0.0), Some(0.0)), (Some(2.5), None)))
  }

  test("validEmail accepts shape, rejects junk") {
    val out = Seq("a@b.co", "nope", "x@y", "a b@c.d").toDF("v")
      .select(Cleansing.validEmail(col("v"))).as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false, false))
  }
}

class ScdHashSpec extends SparkSpec {
  import spark.implicits._

  test("scdHash is deterministic and null-insensitive to ''") {
    val df = Seq(("a", Some(1)), ("a", None)).toDF("x", "y")
    val h = df.select(ScdHash.scdHash(Seq(col("x"), col("y")))).as[String].collect()
    assert(h(0) != h(1)) // "a||1" vs "a||"
    assert(h(0).length == 64 && h(1).length == 64)
    // null encodes as empty string: same as literal empty
    val h2 = Seq(("a", "")).toDF("x", "y")
      .select(ScdHash.scdHash(Seq(col("x"), col("y")))).as[String].head()
    assert(h2 == h(1))
  }

  test("surrogateKey is positive int, 0 reserved") {
    val ks = Seq("cash", "card", "wire").toDF("m")
      .select(ScdHash.surrogateKey(col("m"))).as[Int].collect()
    assert(ks.forall(k => k >= 1 && k <= Int.MaxValue))
    assert(ks.distinct.length == 3)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey keeps exactly one row per key, newest first") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ts", "v")
    val out = Dedup.latestPerKey(df, Seq(col("k")), Seq(col("ts").desc))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "new"), (2, "only")))
  }

  test("nthPerKey n=2 returns the previous version") {
    val df = Seq((1, 10), (1, 20), (1, 30)).toDF("k", "ts")
    val out = Dedup.nthPerKey(df, Seq(col("k")), Seq(col("ts").desc), 2)
      .select("ts").as[Int].collect().toSeq
    assert(out == Seq(20))
  }
}

class DateKeysSpec extends SparkSpec {
  import spark.implicits._

  test("dateKey uses coalesce chain with 0 fallback") {
    val df = Seq(
      (Some(java.sql.Timestamp.valueOf("2024-03-05 10:00:00")), None: Option[java.sql.Timestamp]),
      (None, Some(java.sql.Timestamp.valueOf("2023-12-31 23:59:59"))),
      (None, None)).toDF("a", "b")
    val out = df.select(DateKeys.dateKey(Seq(col("a"), col("b"))))
      .as[Int].collect().toSeq
    assert(out == Seq(20240305, 20231231, 0))
  }

  test("spine covers the range inclusive with calendar attrs") {
    val bounds = Seq(("2024-02-28", "2024-03-01")).toDF("mn", "mx")
      .select(to_date(col("mn")).as("mn"), to_date(col("mx")).as("mx"))
    val rows = DateKeys.spine(bounds).orderBy("date_key").collect()
    assert(rows.map(_.getAs[Int]("date_key")).toSeq == Seq(20240228, 20240229, 20240301))
    assert(rows.last.getAs[Boolean]("is_weekend") == false)
    assert(rows.head.getAs[Int]("quarter") == 1)
  }
}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles builds word 3-grams; short docs degrade to one shingle") {
    val df = Seq("a b c d", "x y").toDF("text")
    val out = df.select(TextOps.shingles(TextOps.tokens(col("text")), 3))
      .as[Seq[String]].collect().toSeq
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y"))
  }

  test("fingerprint/minhash are 64-hex and stable across evaluation") {
    val df = Seq("the quick brown fox jumps").toDF("text")
      .select(TextOps.tokens(col("text")).as("t"))
    val f1 = df.select(TextOps.fingerprint(col("t"))).as[String].head()
    val f2 = df.select(TextOps.fingerprint(col("t"))).as[String].head()
    assert(f1 == f2 && f1.length == 64)
    val m0 = df.select(TextOps.minhash(TextOps.shingles(col("t"), 3), 0)).as[String].head()
    val m1 = df.select(TextOps.minhash(TextOps.shingles(col("t"), 3), 1)).as[String].head()
    assert(m0 != m1) // seeds change the permutation
  }

  test("tokenBit is a 0/1 projection of the token hash") {
    val bits = Seq("alpha").toDF("t")
      .select((0 until 8).map(b => TextOps.tokenBit(col("t"), b).as(s"b$b")): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Int])
    assert(bits.forall(b => b == 0 || b == 1))
  }

  test("redactPii replaces emails, phones, IPs; counts match") {
    val text = "mail bob.smith+x@corp.example.org or +44-20-79 " +
      "tel +1-555-0042 from 192.168.1.200 done"
    val df = Seq(text).toDF("text")
    val red = df.select(TextOps.redactPii(col("text"))).as[String].head()
    assert(red == "mail <EMAIL> or +44-20-79 tel <PHONE> from <IP> done")
    val counts = df.select(
      TextOps.piiCount(col("text"), TextOps.PiiEmail),
      TextOps.piiCount(col("text"), TextOps.PiiPhone),
      TextOps.piiCount(col("text"), TextOps.PiiIp))
      .as[(Long, Long, Long)].head()
    assert(counts == ((1L, 1L, 1L))) // +44-20-79 has no 3-and-4-digit groups
    // clean text passes through untouched
    val clean = Seq("no pii here at all").toDF("text")
      .select(TextOps.redactPii(col("text"))).as[String].head()
    assert(clean == "no pii here at all")
  }

  test("wordBit (integer shifts) equals hashBit (string ops) on all 32 bits") {
    val df = Seq("alpha", "bravo", "charlie", "über 123").toDF("t")
      .select(sha2(col("t"), 256).as("h"))
      .withColumn("w", TextOps.hashWord32(col("h")))
    (0 until 32).foreach { b =>
      val mismatched = df.filter(
        TextOps.wordBit(col("w"), b) =!= TextOps.hashBit(col("h"), b)).count()
      assert(mismatched == 0, s"bit $b diverges")
    }
  }
}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("column interleave matches the reference bit-for-bit") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (7L, 200L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 8))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => ZOrder.interleave2Ref(x, y, 8) })
    // spot values: interleave(1,0)=1, interleave(0,1)=2, full byte pair = 65535
    assert(ZOrder.interleave2Ref(1, 0, 8) == 1L)
    assert(ZOrder.interleave2Ref(0, 1, 8) == 2L)
    assert(ZOrder.interleave2Ref(255, 255, 8) == 65535L)
  }

  test("z-order clustering bounds BOTH dimensions per range bucket") {
    // 32x32 grid, z-sorted, cut into 16 equal buckets: each bucket's
    // x/y min-max envelope must cover far less than the full domain —
    // the data-skipping property a plain sort only gives its lead column
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val z = grid.select(col("x"), col("y"),
      ZOrder.interleave2(col("x"), col("y"), 5).as("z"))
    val spans = z.withColumn("bucket", floor(col("z") / 64).cast("int"))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    // a 64-cell z-block is an 8x8 tile: both spans are 7, not 31
    assert(spans.forall(r => r.getLong(1) <= 7 && r.getLong(2) <= 7))
  }
}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))).toDF("a", "b")
    val out = df.select(round(VectorOps.cosine(col("a"), col("b")), 9))
      .as[Double].collect().toSeq
    assert(out == Seq(1.0, 0.0, -1.0))
  }

  test("signBucket encodes coordinate signs") {
    val out = Seq(Seq(1f, -2f, 0f, 3f)).toDF("v")
      .select(VectorOps.signBucket(col("v"), 4)).as[String].head()
    assert(out == "1011") // 0 counts as non-negative
  }
}
