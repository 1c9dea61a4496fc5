package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "ts")

  test("scd1: insert new, update matched when guard passes, keep otherwise") {
    val source = Seq((2L, "b2", 25.0), (3L, "c", 5.0), (1L, "a-stale", 1.0))
      .toDF("k", "v", "ts")
    val out = Upsert.scd1(target, source, Seq("k"),
      updateWhen = (t, s) => s("ts") > t("ts"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 5.0)))
  }

  test("scd1: per-column resolve implements watermark never-regress") {
    val t = Seq(("job", Some(100L))).toDF("job_name", "wm")
    val failRun = Seq(("job", None: Option[Long])).toDF("job_name", "wm")
    val out = Upsert.scd1(t, failRun, Seq("job_name"),
      resolve = Map("wm" -> ((tc, sc) => coalesce(sc, tc))))
      .as[(String, Option[Long])].head()
    assert(out == ("job", Some(100L))) // NULL source never regresses
  }

  test("scd1 rejects schema mismatch") {
    val bad = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Upsert.scd1(target, bad, Seq("k"))
    }
  }

  test("updateOnly redacts only matched rows, honors extraCond") {
    val ids = Seq(1L, 99L).toDF("k")
    val out = Upsert.updateOnly(target, ids, Seq("k"),
      setCols = Map("v" -> (_ => lit("REDACTED"))),
      extraCond = col("ts") > 5.0)
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "REDACTED", 10.0), (2L, "b", 20.0)))
  }
}

class AtomicRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("write/read round-trip, versioning, vacuum, exists") {
    val root = Files.createTempDirectory("graft-ar").toString + "/t"
    assert(!AtomicRewrite.exists(spark, root))
    AtomicRewrite.write(spark, root, Seq(1, 2).toDF("x"))
    assert(AtomicRewrite.exists(spark, root))
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
    AtomicRewrite.write(spark, root, Seq(3).toDF("x"), keepVersions = 1)
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    assert(AtomicRewrite.read(spark, root).as[Int].collect().toSeq == Seq(3))
    // keepVersions=1 vacuumed v=0
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("v=1"))
  }

  test("time-based vacuum floor: a commit burst inside the window keeps every version") {
    val root2 = Files.createTempDirectory("graft-ar-retain").toString + "/t"
    for (i <- 1 to 5)
      AtomicRewrite.write(spark, root2, Seq(i).toDF("x"), keepVersions = 10)
    def dirs(r: String) = new java.io.File(r).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs(root2) == (0 to 4).map(v => s"v=$v").toSet)
    // all five commits are seconds old — far inside the retention window:
    // keep=1 would drop v=0..3 by count, but the time floor protects them
    AtomicRewrite.vacuum(spark, root2, keep = 1,
      retainHours = Some(AtomicRewrite.MinRetainHours))
    assert(dirs(root2) == (0 to 4).map(v => s"v=$v").toSet,
      "versions committed inside the retention window must survive")
    // below-floor retention is refused without the unsafe override...
    intercept[IllegalArgumentException] {
      AtomicRewrite.vacuum(spark, root2, keep = 1, retainHours = Some(0.0))
    }
    // ...and with it, behaves like the count policy again
    AtomicRewrite.vacuum(spark, root2, keep = 1, retainHours = Some(0.0),
      allowUnsafeRetention = true)
    assert(dirs(root2) == Set("v=4"))
  }

  test("reader resolves the committed pointer, not in-flight writes") {
    val root = Files.createTempDirectory("graft-ar2").toString + "/t"
    AtomicRewrite.write(spark, root, Seq("committed").toDF("x"))
    // simulate an in-flight (uncommitted) staging dir
    new java.io.File(s"$root/v=9").mkdirs()
    assert(AtomicRewrite.read(spark, root).as[String].collect().toSeq == Seq("committed"))
  }

  test("time travel + change feed between retained versions") {
    val root = Files.createTempDirectory("graft-ar5").toString + "/t"
    AtomicRewrite.write(spark, root, Seq((1, "a"), (2, "b")).toDF("id", "v"),
      keepVersions = 3)
    AtomicRewrite.write(spark, root,
      Seq((1, "a"), (2, "b2"), (3, "c")).toDF("id", "v"), keepVersions = 3)
    // versionAsOf
    assert(AtomicRewrite.readVersion(spark, root, 0)
      .as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
    // CDF: update shows as delete+insert, unchanged rows absent
    val d = AtomicRewrite.diff(spark, root, 0, 1)
      .as[(Int, String, String)].collect().toSet
    assert(d == Set((2, "b2", "insert"), (3, "c", "insert"), (2, "b", "delete")))
    intercept[IllegalStateException] {
      AtomicRewrite.readVersion(spark, root, 9)
    }
  }

  test("compact rewrites many small files into few, preserving every row") {
    val root = Files.createTempDirectory("graft-ar4").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("k", col("id") % 100).repartition(16)
    AtomicRewrite.write(spark, root, df)
    val before = new java.io.File(s"$root/v=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before > 4)
    val after = AtomicRewrite.compact(spark, root, targetBytes = 1L << 30,
      clusterBy = Seq("k"))
    assert(after == 1, s"expected 1 compacted file, got $after")
    val back = AtomicRewrite.read(spark, root)
    assert(back.count() == 10000)
    assert(back.agg(sum(col("id"))).head().getLong(0) == 49995000L)
  }

  test("OPTIMIZE ZORDER analog: compact clustered by a z-order key bounds both dims per file") {
    val root = Files.createTempDirectory("graft-arz").toString + "/t"
    // 32x32 grid scattered across 16 files
    val grid = spark.range(0, 1024).toDF("id")
      .withColumn("x", col("id") % 32).withColumn("y", floor(col("id") / 32))
      .withColumn("zkey", graft.ops.ZOrder.interleave2(col("x"), col("y"), 5))
      .repartition(16)
    AtomicRewrite.write(spark, root, grid)
    // range-cluster into 16 files by the interleaved key
    val n = AtomicRewrite.compact(spark, root, targetBytes = 3000,
      clusterBy = Seq("zkey"))
    assert(n >= 8, s"expected a multi-file clustered layout, got $n")
    val back = AtomicRewrite.read(spark, root)
    assert(back.count() == 1024)
    // the data-skipping property: each FILE's x and y min/max envelopes
    // are tiles, far tighter than the 0..31 domain a random layout gives
    val v = AtomicRewrite.currentVersion(spark, root).get
    val spans = spark.read.parquet(s"$root/v=$v")
      .select(col("x"), col("y"), input_file_name().as("f"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .as[(String, Long, Long)].collect()
    assert(spans.forall { case (_, xs, ys) => xs <= 15 && ys <= 15 },
      s"z-clustered files must bound BOTH dims: ${spans.mkString(", ")}")
  }

  test("partition commit rewrites only touched partitions; untouched files carried by reference") {
    val root = Files.createTempDirectory("graft-arp").toString + "/t"
    val v0 = Seq((1, 10, "a"), (2, 10, "b"), (3, 20, "c")).toDF("id", "pk", "v")
    AtomicRewrite.writePartitions(spark, root, v0, Seq("pk"))
    val untouched = new java.io.File(s"$root/v=0/pk=20")
    val filesBefore = untouched.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    assert(filesBefore.nonEmpty)

    // replace partition pk=10 only
    val batch = Seq((1, 10, "a2"), (4, 10, "d")).toDF("id", "pk", "v")
    AtomicRewrite.writePartitions(spark, root, batch, Seq("pk"), keepVersions = 1)
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    // v=1 holds ONLY the rewritten partition; pk=20 was never staged there
    assert(!new java.io.File(s"$root/v=1/pk=20").exists())
    // pk=20's files still live — untouched, same names and mtimes — in v=0,
    // which vacuum must retain (keepVersions=1) because v=1 references it
    val filesAfter = untouched.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    assert(filesAfter == filesBefore, "untouched partition files were rewritten")
    val back = AtomicRewrite.read(spark, root)
      .select("id", "pk", "v").as[(Int, Int, String)].collect().toSet
    assert(back == Set((1, 10, "a2"), (4, 10, "d"), (3, 20, "c")))
    // time travel still resolves the pre-merge state
    assert(AtomicRewrite.readVersion(spark, root, 0)
      .select("id", "pk", "v").as[(Int, Int, String)].collect().toSet ==
      Set((1, 10, "a"), (2, 10, "b"), (3, 20, "c")))
    // CDF between the versions sees only the touched partition's rows
    val d = AtomicRewrite.diff(spark, root, 0, 1)
      .select("id", "pk", "v", "_change_type")
      .as[(Int, Int, String, String)].collect().toSet
    assert(d == Set((1, 10, "a2", "insert"), (4, 10, "d", "insert"),
      (1, 10, "a", "delete"), (2, 10, "b", "delete")))
  }

  test("partition commit with explicit replaced set deletes emptied partitions") {
    val root = Files.createTempDirectory("graft-arp2").toString + "/t"
    AtomicRewrite.writePartitions(spark, root,
      Seq((1, 10), (2, 20)).toDF("id", "pk"), Seq("pk"))
    // row 1 moves from pk=10 to pk=30: the commit declares both partitions
    // replaced but only writes pk=30 — pk=10 must vanish, not resurrect
    AtomicRewrite.writePartitions(spark, root,
      Seq((1, 30)).toDF("id", "pk"), Seq("pk"),
      replaced = Some(Seq(10, 30).toDF("pk")))
    val back = AtomicRewrite.read(spark, root)
      .select("id", "pk").as[(Int, Int)].collect().toSet
    assert(back == Set((1, 30), (2, 20)))
  }

  test("layout mismatch is refused; emptying a partitioned table stays readable") {
    val root = Files.createTempDirectory("graft-arp4").toString + "/t"
    AtomicRewrite.writePartitions(spark, root,
      Seq((1, 10), (2, 20)).toDF("id", "pk"), Seq("pk"))
    // committing with a different partition layout must fail fast
    intercept[IllegalArgumentException] {
      AtomicRewrite.writePartitions(spark, root,
        Seq((3, 30)).toDF("pk", "id"), Seq("id"))
    }
    // a full rewrite that filters out every row leaves a readable empty
    // table (plain empty snapshot, not an entry-less manifest) …
    AtomicRewrite.write(spark, root,
      AtomicRewrite.read(spark, root).filter(col("id") < 0))
    assert(AtomicRewrite.read(spark, root).isEmpty)
    // … and the next partition-level commit re-establishes the layout
    AtomicRewrite.writePartitions(spark, root,
      Seq((5, 50)).toDF("id", "pk"), Seq("pk"))
    assert(AtomicRewrite.read(spark, root)
      .select("id", "pk").as[(Int, Int)].collect().toSet == Set((5, 50)))
  }

  test("compacting a partition-committed table collapses references and keeps the layout") {
    val root = Files.createTempDirectory("graft-arp3").toString + "/t"
    AtomicRewrite.writePartitions(spark, root,
      Seq((1, 10), (2, 20)).toDF("id", "pk"), Seq("pk"))
    AtomicRewrite.writePartitions(spark, root,
      Seq((3, 10)).toDF("id", "pk"), Seq("pk"), keepVersions = 2)
    // flattening a partitioned table is an error, not silent data loss
    intercept[IllegalArgumentException] {
      AtomicRewrite.compact(spark, root)
    }
    val n = AtomicRewrite.compact(spark, root, partitionBy = Seq("pk"))
    assert(n >= 2) // at least one data file per partition dir, counted recursively
    assert(new java.io.File(s"$root/v=2/pk=10").exists())
    assert(new java.io.File(s"$root/v=2/pk=20").exists())
    val back = AtomicRewrite.read(spark, root)
      .select("id", "pk").as[(Int, Int)].collect().toSet
    assert(back == Set((3, 10), (2, 20)))
    // the compacted snapshot owns everything → old dirs vacuum away
    AtomicRewrite.vacuum(spark, root, keep = 1)
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("v=2"))
  }

  test("lost _LATEST pointer recovers to the newest committed snapshot") {
    val root = Files.createTempDirectory("graft-ar3").toString + "/t"
    AtomicRewrite.write(spark, root, Seq(1).toDF("x"))
    AtomicRewrite.write(spark, root, Seq(2).toDF("x"))
    // crash scenario: the pointer file vanishes; staged-but-uncommitted
    // v=9 (no _SUCCESS) must NOT be picked up
    new java.io.File(s"$root/_LATEST").delete()
    new java.io.File(s"$root/v=9").mkdirs()
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    assert(AtomicRewrite.read(spark, root).as[Int].collect().toSeq == Seq(2))
    // the next write resumes the version sequence instead of restarting at 0
    AtomicRewrite.write(spark, root, Seq(3).toDF("x"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(2L))
  }
}

class WatermarksSpec extends SparkSpec {

  test("advance then read; FAIL run never regresses") {
    val root = Files.createTempDirectory("graft-wm").toString + "/ctl"
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val runAt = Timestamp.valueOf("2024-01-02 00:00:00")
    assert(Watermarks.read(spark, root, "job").isEmpty)
    Watermarks.advance(spark, root, "job", Some(t1), "OK", runAt)
    assert(Watermarks.read(spark, root, "job").contains(t1))
    // failed run: None watermark must not step on t1
    Watermarks.advance(spark, root, "job", None, "FAIL:Boom", runAt)
    assert(Watermarks.read(spark, root, "job").contains(t1))
    // other jobs are independent
    Watermarks.advance(spark, root, "job2", Some(runAt), "OK", runAt)
    assert(Watermarks.read(spark, root, "job").contains(t1))
    assert(Watermarks.read(spark, root, "job2").contains(runAt))
  }

  test("concurrent advances from parallel pipeline branches never drop a watermark") {
    // Runner.runBatch fans independent entity chains out to driver
    // threads; every chain advances its jobs in the SAME control table.
    // Without the per-root lock, two read-merge-write cycles both stage
    // version v+1 and one job's row vanishes.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = Files.createTempDirectory("graft-wm").toString + "/ctl"
    val runAt = Timestamp.valueOf("2024-01-02 00:00:00")
    val jobs = (1 to 8).map(i => s"job$i")
    val fs = jobs.map { j =>
      Future(Watermarks.advance(spark, root, j,
        Some(Timestamp.valueOf("2024-01-01 00:00:00")), "OK", runAt))
    }
    fs.foreach(Await.result(_, Duration.Inf))
    jobs.foreach { j =>
      assert(Watermarks.read(spark, root, j).nonEmpty,
        s"$j lost its watermark under concurrent advances")
    }
  }
}
