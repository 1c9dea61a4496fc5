package graft.tools

import graft.pipeline.AnnIndexStore
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

/** Dev-only decade probe for the ANN erasure path (the [[ForgetFloor]]
  * protocol pointed at the IVF store): a covered
  * [[AnnIndexStore.forget]] is O(subject) — the subject ids' cells come
  * from their hash-pruned vecmap buckets and the cells delete's
  * discovery prunes to exactly those cells — so a FIXED-SIZE erasure
  * should cost the same at 1×, 10× and 100× corpus. The contrast mode
  * garbles the coverage hint first, forcing the discovery back to the
  * full-scan semi-join. Cycles INTERLEAVE the two modes (a mode that
  * only runs after the other has warmed the JIT would read faster for
  * the wrong reason); the probe re-marks the hint after each garbled
  * cycle, which is truthful here because it knows no crash happened.
  *
  * Usage: AnnForgetFloor [cyclesPerMode]; point SPARK_GRAFT_SF_DIR at a
  * [[ScaleGen]] replica for the 10×/100× rows.
  */
object AnnForgetFloor {
  def main(args: Array[String]): Unit = {
    val cycles = if (args.nonEmpty) args(0).toInt else 2
    val batch = 200
    val k = 64
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-annfloor")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-annfloor")
      .toString + "/idx"
    val e = {
      val t = graft.core.Tables.load(spark, sfDir, "embeddings")
        .select("vec_id", "embedding")
      val p = spark.sparkContext.defaultParallelism
      if (t.rdd.getNumPartitions < p) t.repartition(p) else t
    }
    val t0 = System.nanoTime()
    AnnIndexStore.build(spark, root, e,
      AnnIndexStore.trainCentroids(e, k, iters = 1))
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    val subjects = e.select("vec_id").orderBy("vec_id")
      .limit(batch * cycles * 2).as[Long].collect()
    // fail on SIZING, loudly, before any slice can come up short or
    // overlap — a small corpus would otherwise read as the misleading
    // "probe slice N erased nothing — fixture broken"
    require(subjects.length == batch * cycles * 2,
      s"corpus too small for $cycles cycles × $batch vecs × 2 modes: " +
        s"need ${batch * cycles * 2} distinct vec ids, found ${subjects.length}")
    def slice(i: Int) = subjects.slice(i * batch, (i + 1) * batch).toSeq
      .toDF("vec_id")
    def timedForget(i: Int): Double = {
      val s = System.nanoTime()
      require(AnnIndexStore.forget(spark, root, slice(i)),
        s"probe slice $i erased nothing — fixture broken")
      (System.nanoTime() - s) / 1e9
    }
    def hint(v: Long): Unit =
      AtomicRewrite.writeHint(spark, s"$root/vecmap_covers", v)
    val (covered, scan) = (0 until cycles).map { i =>
      val c = timedForget(2 * i)
      println(f"""{"mode":"covered","cycle":$i,"sec":$c%.3f}""")
      hint(-1L)
      val s = timedForget(2 * i + 1)
      println(f"""{"mode":"full_scan","cycle":$i,"sec":$s%.3f}""")
      hint(AtomicRewrite.currentVersion(spark,
        AnnIndexStore.Paths(root).cells).get)
      (c, s)
    }.unzip
    println(f"""{"tool":"ann_forget_floor","sf":"$sfDir","cycles":$cycles,""" +
      f""""covered_min":${covered.min}%.3f,"scan_min":${scan.min}%.3f}""")
    spark.stop()
  }
}
