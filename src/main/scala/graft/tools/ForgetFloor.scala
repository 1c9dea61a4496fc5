package graft.tools

import graft.pipeline.IndexStore
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

/** Dev-only decade probe for the GDPR erasure path: a clean-chain
  * [[IndexStore.forget]] is O(subject) — its docstats discovery and
  * summary delta read only the subject's doc-hash buckets, its postings
  * discovery only the subject's stored bucket lists, and the 1-row
  * summary repairs by negative deltas — so a FIXED-SIZE erasure should
  * cost the same at 1×, 10× and 100× corpus. The contrast mode garbles
  * the chain hint first, forcing the postings discovery back to the
  * full-scan semi-join (the only sound plan without the clean-chain
  * proof) — that one grows with the corpus, and the widening gap is the
  * evidence.
  *
  * Protocol per run: build the index over SPARK_GRAFT_SF_DIR's
  * documents, then alternate timed fixed-size forgets (200 docs each,
  * disjoint slices): odd cycles with the chain clean (O(subject) mode),
  * even cycles with the hint garbled (full-scan discovery). Point the
  * sf dir at a [[ScaleGen]] replica for the 10×/100× rows.
  *
  * Usage: ForgetFloor [cyclesPerMode]
  */
object ForgetFloor {
  def main(args: Array[String]): Unit = {
    val cycles = if (args.nonEmpty) args(0).toInt else 2
    val batch = 200
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-forgetfloor")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-fgtfloor")
      .toString + "/idx"
    val d = {
      val t = graft.core.Tables.load(spark, sfDir, "documents")
        .select("doc_id", "text")
      val p = spark.sparkContext.defaultParallelism
      if (t.rdd.getNumPartitions < p) t.repartition(p) else t
    }
    val t0 = System.nanoTime()
    IndexStore.build(spark, root, d)
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    // disjoint fixed-size subject slices regardless of scale (the GDPR
    // workload shape: one subject's docs, not a fraction of the corpus)
    val subjects = d.select("doc_id").orderBy("doc_id")
      .limit(batch * cycles * 2).as[Long].collect()
    // fail on SIZING, loudly, before any slice can come up short or
    // overlap — a small corpus would otherwise read as the misleading
    // "probe slice N erased nothing — fixture broken"
    require(subjects.length == batch * cycles * 2,
      s"corpus too small for $cycles cycles × $batch docs × 2 modes: " +
        s"need ${batch * cycles * 2} distinct doc ids, found ${subjects.length}")
    def slice(i: Int) = subjects.slice(i * batch, (i + 1) * batch).toSeq
      .toDF("doc_id")
    def timedForget(i: Int): Double = {
      val s = System.nanoTime()
      require(IndexStore.forget(spark, root, slice(i)),
        s"probe slice $i erased nothing — fixture broken")
      (System.nanoTime() - s) / 1e9
    }
    // INTERLEAVED modes (clean, scan, clean, scan …): a mode that only
    // runs after the other has warmed the JIT would read faster for the
    // wrong reason. The scan cycle garbles the chain hint to force the
    // full-scan postings discovery; since the probe knows no crash
    // happened, re-marking the chain at the current version afterwards
    // is truthful and restores the clean mode for the next cycle.
    def chain(v: Long): Unit =
      AtomicRewrite.writeHint(spark, s"$root/docstats_chain_clean", v)
    val (clean, scan) = (0 until cycles).map { i =>
      val c = timedForget(2 * i)
      println(f"""{"mode":"clean_chain","cycle":$i,"sec":$c%.3f}""")
      chain(-1L)
      val s = timedForget(2 * i + 1)
      println(f"""{"mode":"full_scan","cycle":$i,"sec":$s%.3f}""")
      chain(AtomicRewrite.currentVersion(spark,
        IndexStore.Paths(root).docstats).get)
      (c, s)
    }.unzip
    println(f"""{"tool":"forget_floor","sf":"$sfDir","cycles":$cycles,""" +
      f""""clean_min":${clean.min}%.3f,"scan_min":${scan.min}%.3f}""")
    spark.stop()
  }
}
