package graft.tools

import graft.pipeline.CurationRunner
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Per-phase cost accounting for the composed curation cycle (the
  * q134-q142 family = 44% of the bench suite's min-sum): for each phase
  * — ingest (land + dedup + index refresh), the near-dup increment,
  * release, maintain, serve — emit SECONDS, COMMITS STAGED (new
  * versioned snapshot dirs across every store the cycle owns) and BYTES
  * STAGED (their on-disk size), as one JSON line per phase.
  *
  * The accounting answers the commit-count-bound vs compute-bound
  * question directly: a phase whose seconds track its commit count at
  * near-constant bytes is paying the per-commit floor (durable-commit
  * contract — each commit is a crash-consistency point the composition
  * REQUIRES); a phase whose seconds track bytes is compute/IO-bound and
  * optimizable by plan work. Commits are counted as new `v=<N>` dirs
  * (the one durable unit AtomicRewrite stages); hint/sidecar files ride
  * inside their version dirs.
  *
  * The workload mirrors q134/q137 exactly (same conf constants, same
  * two-batch split, ingest-only batch 1) so the numbers read against
  * the bench rows. Run with SPARK_GRAFT_SF_DIR at sf0.1 and at a
  * ScaleGen sf1 replica for the scaling column.
  */
object CurationBench {

  private def listVersionDirs(fs: FileSystem, root: Path): Map[String, Long] = {
    if (!fs.exists(root)) return Map.empty
    val out = scala.collection.mutable.Map[String, Long]()
    def walk(p: Path): Unit =
      fs.listStatus(p).foreach { s =>
        if (s.isDirectory) {
          if (s.getPath.getName.startsWith("v="))
            out(s.getPath.toString) = fs.getContentSummary(s.getPath).getLength
          else if (!s.getPath.getName.startsWith("."))
            walk(s.getPath)
        }
      }
    walk(root)
    out.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-curationbench")
    spark.sparkContext.setLogLevel("ERROR")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_curbench"
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rp)) fs.delete(rp, true)

    val d = graft.core.Tables.loadSpread(spark, sfDir, "documents")
    def conf(nearDup: Option[Double]) = CurationRunner.Conf(
      benchmark = Some(d.filter(col("doc_id") % 97 === 0)
        .select("doc_id", "text")),
      budgetShare = 0.4, nShards = 8, nearDupThreshold = nearDup)
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
    val b1 = d.filter(col("doc_id") < 200)
    val b2 = d.filter(col("doc_id") >= 200)

    def phase(run: String, name: String, storeRoot: String)(body: => Unit): Unit = {
      val before = listVersionDirs(fs, new Path(storeRoot))
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val after = listVersionDirs(fs, new Path(storeRoot))
      val staged = after -- before.keySet
      println(f"""{"metric":"curation_phase","run":"$run","phase":"$name","sec":$sec%.3f,"commits":${staged.size},"bytes_staged":${staged.values.sum},"sf":"$sfDir"}""")
    }

    // run A: the q134 composition (exact dedup only) through every phase
    val rootA = s"$root/a"
    val cA = conf(None)
    phase("exact", "ingest_b1", rootA) {
      CurationRunner.runBatch(spark, rootA, b1, ts(1), "b1", cA,
        publish = false)
    }
    phase("exact", "ingest_b2", rootA) {
      CurationRunner.runBatch(spark, rootA, b2, ts(2), "b2", cA,
        publish = false)
    }
    phase("exact", "release", rootA) {
      CurationRunner.publishRelease(spark, rootA, cA)
    }
    phase("exact", "release_nochange", rootA) {
      CurationRunner.publishRelease(spark, rootA, cA)
    }
    phase("exact", "maintain", rootA) {
      CurationRunner.maintain(spark, rootA, buckets = 4)
    }
    phase("exact", "serve", rootA) {
      CurationRunner.readCurated(spark, rootA)
        .agg(count(lit(1))).head()
    }

    // run B: the q137 composition (near-dup armed) — ingest phases only;
    // the delta vs run A prices the near-dup increment
    val rootB = s"$root/b"
    val cB = conf(Some(0.5))
    phase("neardup", "ingest_b1", rootB) {
      CurationRunner.runBatch(spark, rootB, b1, ts(1), "b1", cB,
        publish = false)
    }
    phase("neardup", "ingest_b2", rootB) {
      CurationRunner.runBatch(spark, rootB, b2, ts(2), "b2", cB,
        publish = false)
    }
    phase("neardup", "release", rootB) {
      CurationRunner.publishRelease(spark, rootB, cB)
    }
    spark.stop()
  }
}
