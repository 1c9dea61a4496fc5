package graft.tools

import graft.pipeline.CurationRunner
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Dev-only decade probe for the NO-CHANGE release floor — the
  * production steady state the bucket-diffed publish exists for: a
  * release cadence fires, nothing new passed the gates since the last
  * one, the selection recomputes IDENTICAL, and the publish must cost
  * a metadata pass + an O(buckets) sidecar diff + the epoch skip — no
  * curated/shard version burned, zero committed data files read
  * (`AtomicRewrite.writePartitionsDiffed`'s sidecar; DiffedWriteSpec
  * pins the no-scan plan).
  *
  * Protocol: build the q134-shaped composed state once (ingest-only
  * batch + publishing batch over SPARK_GRAFT_SF_DIR's documents), then
  * time `runs` publish-only cycles with an EMPTY batch and an advanced
  * watermark — each one runs the full release (prefix-sum budget cut
  * over the all-time corpus signals, fresh-selection signature hash,
  * sidecar diff, epoch skip) and commits only the control-table row.
  * Point the sf dir at a [[ScaleGen]] replica for 10x/100x rows; the
  * warm-min is the anchor statistic (see [[IsoBench]]).
  *
  * Usage: ReleaseFloor [runs]
  */
object ReleaseFloor {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-releasefloor")
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-relfloor")
      .toString + "/rel"
    val d = {
      val t = graft.core.Tables.load(spark, sfDir, "documents")
      val p = spark.sparkContext.defaultParallelism
      if (t.rdd.getNumPartitions < p) t.repartition(p) else t
    }
    // the q134 conf: ~1% benchmark slice, 0.4 budget share, 8 shards
    val conf = CurationRunner.Conf(
      benchmark = Some(d.filter(col("doc_id") % 97 === 0)
        .select("doc_id", "text")),
      budgetShare = 0.4, nShards = 8)
    def ts(day: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + day * 86400000L)
    val t0 = System.nanoTime()
    CurationRunner.runBatch(spark, root, d.filter(col("doc_id") < 200),
      ts(0), "b1", conf, publish = false)
    CurationRunner.runBatch(spark, root, d.filter(col("doc_id") >= 200),
      ts(1), "b2", conf)
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"build_sec":$buildSec%.3f}""")
    val empty = d.limit(0)
    val times = (1 to runs).map { i =>
      val s0 = System.nanoTime()
      CurationRunner.runBatch(spark, root, empty, ts(1 + i), s"nc$i", conf)
      val dt = (System.nanoTime() - s0) / 1e9
      println(f"""{"run":$i,"sec":$dt%.3f}""")
      dt
    }
    val warmMin = times.drop(1).minOption.getOrElse(times.head)
    println(f"""{"tool":"release_floor","sf":"$sfDir","runs":$runs,""" +
      f""""build_sec":$buildSec%.3f,"min":${times.min}%.3f,""" +
      f""""warm_min":$warmMin%.3f}""")
    spark.stop()
  }
}
