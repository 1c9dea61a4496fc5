package graft

import graft.functions.BottomK
import graft.multimodal.Media
import graft.pipeline.{Medallion, Scd2}
import graft.tx.{AtomicRewrite, Watermarks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.file.Files
import java.sql.Timestamp

/** Property-based invariants (SURVEY.md §5.2): SCD2 state machine, watermark
  * monotonicity, sketch merge laws, frame tiling — random inputs, not
  * hand-picked cases. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("BottomK merge is commutative, associative, idempotent, k-bounded") {
    val agg = BottomK(5)
    val gl = Gen.listOf(Gen.alphaStr.map(_.take(6)))
      .map(l => l.distinct.sorted.take(5).toVector)
    check(Prop.forAll(gl, gl, gl) { (a, b, c) =>
      val comm = agg.merge(a, b) == agg.merge(b, a)
      val assoc = agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c))
      val idem = agg.merge(a, a) == a
      val bounded = agg.merge(a, b).length <= 5
      val exact = agg.merge(a, b) == (a ++ b).distinct.sorted.take(5)
      comm && assoc && idem && bounded && exact
    })
  }

  test("PrefixSum.runningTotal equals a local scan for any input") {
    // spark-round-trips are expensive under scalacheck — a handful of
    // random draws exercises the range/offset machinery plenty
    val gl = Gen.listOf(Gen.chooseNum(0L, 500L)).map(_.take(300))
    check(Prop.forAll(gl) { values =>
      val df = values.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val (res, cached) = graft.ops.PrefixSum.runningTotal(
        df, Seq(col("id")), col("v"), "cum")
      val got = res.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      cached.unpersist()
      val want = values.zipWithIndex
        .scanLeft((0L, 0L)) { case ((_, acc), (v, i)) => (i.toLong, acc + v) }
        .drop(1)
      got.toSeq == want
    }, n = 12)
  }

  test("frameOffsets tiles any payload exactly for any frame count") {
    check(Prop.forAll(Gen.chooseNum(0, 10000), Gen.chooseNum(1, 64)) { (n, k) =>
      val offs = Media.frameOffsets(n, k)
      offs.length == k && offs.head._1 == 0 && offs.last._2 == n &&
        offs.forall { case (s, e) => s <= e } &&
        offs.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => e1 == s2
          case _ => true
        }
    })
  }

  test("SCD2: random batch sequences keep exactly one current row per key") {
    val batchGen = Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1L, 4L)
      value <- Gen.oneOf("a", "b", "c")
    } yield (key, value))
    val seqGen = Gen.listOfN(4, batchGen)

    check(Prop.forAll(seqGen) { batches =>
      var hist: DataFrame = Scd2.prepare(
        Seq.empty[(Long, String, Timestamp)].toDF("id", "v", "t"),
        Seq("v"), "t").limit(0)
      var t = 0
      batches.foreach { rows =>
        t += 1
        val batch = Scd2.prepare(
          rows.zipWithIndex.map { case ((k, v), i) =>
            (k, v, Timestamp.valueOf(f"2024-01-01 00:$t%02d:${i % 60}%02d"))
          }.toDF("id", "v", "t"),
          Seq("v"), "t")
        hist = Scd2.apply(hist, batch, Seq("id"), Seq("t"))
      }
      val rows = hist.select("id", "valid_from", "valid_to", "is_current")
        .collect()
      val byKey = rows.groupBy(_.getLong(0))
      val oneCurrent = byKey.values.forall(_.count(_.getBoolean(3)) == 1)
      val closedOrdered = rows.filter(!_.getBoolean(3)).forall(r =>
        r.getTimestamp(1).before(r.getTimestamp(2)) ||
          r.getTimestamp(1).equals(r.getTimestamp(2)))
      val currentOpen = rows.filter(_.getBoolean(3)).forall(_.isNullAt(2))
      oneCurrent && closedOrdered && currentOpen
    }, n = 8)
  }

  test("goldScd2Hist: random silver evolutions keep hist ≡ silver per key under lag") {
    // silver evolves through random SCD2 folds across months; the hist job
    // runs on a random SUBSET of batches (it may lag several) plus once at
    // the end — after which the partition-committed hist must equal silver
    // row-for-row (dwh stamp and layout aside)
    val batchGen = Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1L, 4L)
      value <- Gen.oneOf("a", "b", "c")
    } yield (key, value))
    val seqGen = Gen.listOfN(4, Gen.zip(batchGen, Gen.oneOf(true, false)))
    check(Prop.forAll(seqGen) { batches =>
      val root = Files.createTempDirectory("graft-prop-hist").toString
      val paths = Medallion.Paths(root)
      var silver: DataFrame = Scd2.prepare(
        Seq.empty[(Long, String, Timestamp)].toDF("id", "v", "raw_loaded_at"),
        Seq("v"), "raw_loaded_at").limit(0)
      var t = 0
      batches.foreach { case (rows, runHist) =>
        t += 1
        val batch = Scd2.prepare(
          rows.zipWithIndex.map { case ((k, v), i) =>
            (k, v, Timestamp.valueOf(f"2024-$t%02d-01 00:00:${i % 60}%02d"))
          }.toDF("id", "v", "raw_loaded_at"),
          Seq("v"), "raw_loaded_at")
        silver = Scd2.apply(silver, batch, Seq("id"), Seq("raw_loaded_at"))
        AtomicRewrite.write(spark, paths.silver("e"), silver)
        silver = AtomicRewrite.read(spark, paths.silver("e"))
        if (runHist)
          Medallion.goldScd2Hist(spark, paths, "e", Seq("id"),
            Timestamp.valueOf(f"2024-$t%02d-02 00:00:00"))
      }
      Medallion.goldScd2Hist(spark, paths, "e", Seq("id"),
        Timestamp.valueOf("2024-12-31 00:00:00"))
      val cols = Seq("id", "v", "valid_from", "valid_to", "is_current")
      val got = AtomicRewrite.read(spark, paths.gold("dim_e_hist"))
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      val want = AtomicRewrite.read(spark, paths.silver("e"))
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      got == want
    }, n = 4)
  }

  test("goldScd1Snapshot: random evolutions under lag keep dim ≡ silver current") {
    // the bucketed snapshot dim runs on a random SUBSET of silver batches
    // (it may lag several, including same-hash oscillations) plus once at
    // the end — after which it must equal silver's current rows exactly
    // (content AND raw_loaded_at: the any-newer guard must always land
    // the newest version)
    val batchGen = Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1L, 4L)
      value <- Gen.oneOf("a", "b", "c")
    } yield (key, value))
    val seqGen = Gen.listOfN(4, Gen.zip(batchGen, Gen.oneOf(true, false)))
    check(Prop.forAll(seqGen) { batches =>
      val root = Files.createTempDirectory("graft-prop-snap").toString
      val paths = Medallion.Paths(root)
      var silver: DataFrame = Scd2.prepare(
        Seq.empty[(Long, String, Timestamp)].toDF("id", "v", "raw_loaded_at"),
        Seq("v"), "raw_loaded_at").limit(0)
      var t = 0
      batches.foreach { case (rows, runDim) =>
        t += 1
        val batch = Scd2.prepare(
          rows.zipWithIndex.map { case ((k, v), i) =>
            (k, v, Timestamp.valueOf(f"2024-$t%02d-01 00:00:${i % 60}%02d"))
          }.toDF("id", "v", "raw_loaded_at"),
          Seq("v"), "raw_loaded_at")
        silver = Scd2.apply(silver, batch, Seq("id"), Seq("raw_loaded_at"))
        AtomicRewrite.write(spark, paths.silver("e"), silver)
        silver = AtomicRewrite.read(spark, paths.silver("e"))
        if (runDim)
          Medallion.goldScd1Snapshot(spark, paths, "e", Seq("id"),
            Timestamp.valueOf(f"2024-$t%02d-02 00:00:00"))
      }
      Medallion.goldScd1Snapshot(spark, paths, "e", Seq("id"),
        Timestamp.valueOf("2024-12-31 00:00:00"))
      val cols = Seq("id", "v", "raw_loaded_at")
      val got = AtomicRewrite.read(spark, paths.gold("dim_e_snapshot"))
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      val want = AtomicRewrite.read(spark, paths.silver("e"))
        .filter(col("is_current"))
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      got == want
    }, n = 4)
  }

  test("goldAggIncremental: random batch folds equal a full recompute") {
    val batchGen = Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1, 3)
      v <- Gen.chooseNum(0, 100)
    } yield (key, v))
    val seqGen = Gen.listOfN(3, batchGen)
    check(Prop.forAll(seqGen) { batches =>
      val root = Files.createTempDirectory("graft-prop-agg").toString
      val paths = Medallion.Paths(root)
      var nextId = 0L
      var t = 0
      batches.foreach { rows =>
        t += 1
        val df = rows.map { case (k, v) =>
          nextId += 1
          (nextId, k, v.toDouble, Timestamp.valueOf(f"2024-01-01 00:$t%02d:00"))
        }.toDF("id", "k", "v", "raw_loaded_at")
        val factRoot = paths.gold("fact")
        val fact =
          if (AtomicRewrite.exists(spark, factRoot))
            AtomicRewrite.read(spark, factRoot).unionByName(df)
          else df
        AtomicRewrite.write(spark, factRoot, fact)
        Medallion.goldAggIncremental(spark, paths, "agg",
          AtomicRewrite.read(spark, factRoot), Seq("k"),
          Seq(count(lit(1)).as("n"),
            sum(col("v").cast("decimal(38,6)")).cast("double").as("s")))
      }
      val got = AtomicRewrite.read(spark, paths.gold("agg"))
        .select("k", "n", "s").as[(Int, Long, Double)].collect().toSet
      val want = AtomicRewrite.read(spark, paths.gold("fact"))
        .groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,6)")).cast("double").as("s"))
        .as[(Int, Long, Double)].collect().toSet
      got == want
    }, n = 4)
  }

  test("TopKPerKey equals the sort-based top-k on random frames") {
    // few Spark rounds (each is a job), many rows per round; ids unique
    // by construction so the ordering is total and sets compare cleanly
    val gRows = Gen.listOfN(300, Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 99)))
    check(Prop.forAll(gRows, Gen.chooseNum(1, 5)) { (gvs, k) =>
      val rows = gvs.zipWithIndex.map { case ((g, v), i) => (s"g$g", i.toLong, v) }
      val df = rows.toDF("grp", "id", "v").repartition(5)
      val got = graft.plans.TopKPerKey
        .perKey(df, Seq("grp"), Seq(col("v").desc, col("id")), k)
        .as[(String, Long, Int)].collect().toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k)
      }.toSet
      got == want
    }, n = 8)
  }

  test("Bloom semi join equals the plain semi join on random key sets") {
    val gBig = Gen.listOfN(400, Gen.chooseNum(0L, 300L))
    val gSmall = Gen.listOfN(20, Gen.chooseNum(0L, 600L))
    check(Prop.forAll(gBig, gSmall) { (big, small) =>
      val b = big.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "v").repartition(4)
      val s = small.toDF("sk")
      val got = graft.ops.BloomJoin.semiJoin(b, "k", s, "sk")
        .as[(Long, Long)].collect().toSet
      val want = b.join(s.select(col("sk").as("k")), Seq("k"), "left_semi")
        .as[(Long, Long)].collect().toSet
      got == want
    }, n = 8)
  }

  test("FAIL runs (null ts) never clear the stored watermark: coalesce(s,t)") {
    val stepGen = Gen.listOfN(8, Gen.option(Gen.chooseNum(0L, 1000L)))
    check(Prop.forAll(stepGen) { steps =>
      val root = Files.createTempDirectory("graft-prop-wm").toString + "/c"
      val runAt = Timestamp.valueOf("2024-01-01 00:00:00")
      var expected = Option.empty[Long] // last non-null ts survives any FAILs
      steps.zipWithIndex.forall { case (tsOpt, i) =>
        val ts = tsOpt.map(o => new Timestamp(1700000000000L + o * 1000))
        Watermarks.advance(spark, root, "job", ts,
          if (tsOpt.isDefined) "OK" else s"FAIL:$i", runAt)
        expected = tsOpt.orElse(expected)
        val stored = Watermarks.read(spark, root, "job")
          .map(t => (t.getTime - 1700000000000L) / 1000)
        stored == expected
      }
    }, n = 6)
  }
}
