package graft.tools

import graft.pipeline.IndexStore
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

/** Dev-only decade probe for the index-maintenance shrink: the
  * clean-chain mode runs off the narrow docstats table alone
  * (`buckets := buckets_live`), while the heal mode re-derives exact
  * lists from an O(postings) keyed agg. Both are linear in corpus
  * size — the shrink's win is the CONSTANT (docstats is one row per
  * doc; postings one per (token, doc), orders of magnitude more
  * bytes) — so the evidence is the per-scale gap between the two
  * modes on the SAME store, widening with the decade.
  *
  * Protocol per run: build the index over SPARK_GRAFT_SF_DIR's
  * documents, then alternate fixed-size resubmission batches (500
  * docs, text perturbed so bucket lists accrete) with timed maintains:
  * odd cycles leave the chain clean (O(docstats) mode), even cycles
  * garble the chain hint first (postings-scan heal). Point the sf dir
  * at a [[ScaleGen]] replica for the 10x/100x rows.
  *
  * Usage: ShrinkFloor [cyclesPerMode]
  */
object ShrinkFloor {
  def main(args: Array[String]): Unit = {
    val cycles = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-shrinkfloor")
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-shrfloor")
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
    // fixed-size resubmission batch regardless of scale: `salt` varies
    // per cycle so every resubmission shifts the doc's bucket set and
    // leaves a stale bound for the next shrink to converge
    def resubmit(salt: Int): Unit =
      IndexStore.append(spark, root,
        d.orderBy("doc_id").limit(500)
          .withColumn("text", concat(col("text"), lit(s" probe$salt cycle"))))
    def timedMaintain(): Double = {
      val s = System.nanoTime()
      IndexStore.maintain(spark, root)
      (System.nanoTime() - s) / 1e9
    }
    val clean = (1 to cycles).map { i =>
      resubmit(i)
      val dt = timedMaintain()
      println(f"""{"mode":"clean_chain","cycle":$i,"sec":$dt%.3f}""")
      dt
    }
    val heal = (1 to cycles).map { i =>
      resubmit(100 + i)
      AtomicRewrite.writeHint(spark, s"$root/docstats_chain_clean", -1L)
      val dt = timedMaintain()
      println(f"""{"mode":"postings_heal","cycle":$i,"sec":$dt%.3f}""")
      dt
    }
    println(f"""{"tool":"shrink_floor","sf":"$sfDir","cycles":$cycles,""" +
      f""""clean_min":${clean.min}%.3f,"heal_min":${heal.min}%.3f}""")
    spark.stop()
  }
}
