package graft.tx

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.UUID

/** Versioned-snapshot table layout replacing Delta's transaction log.
  *
  * The reference leans on Delta for MERGE/DELETE/VACUUM atomicity; our
  * environment has no Delta jars (SURVEY.md §4), so managed tables live as
  *
  * {{{
  *   <root>/v=<N>/ ...parquet files...
  *   <root>/_LATEST          // single line: N
  * }}}
  *
  * A rewrite stages the full new snapshot into `v=<N+1>` and then atomically
  * replaces the `_LATEST` pointer (HDFS/posix rename of a one-line file).
  * Readers resolve the pointer first, so they never observe a half-written
  * snapshot. Single-writer-per-table is assumed — faithful to the reference,
  * where each table is owned by exactly one job.
  *
  * VACUUM ≙ deleting version dirs older than the pointer (keepVersions).
  */
object AtomicRewrite {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_LATEST")

  def exists(spark: SparkSession, root: String): Boolean = {
    val f = fs(spark, new Path(root))
    f.exists(pointer(root))
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, new Path(root))
    val p = pointer(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"graft table does not exist: $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** Commit `df` as the next full snapshot of the table. */
  def write(spark: SparkSession, root: String, df: DataFrame,
            partitionBy: Seq[String] = Nil, keepVersions: Int = 2): Unit = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    val target = new Path(root, s"v=$next")
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(target.toString)
    // Atomic pointer swap: write sidecar then rename over _LATEST.
    val tmp = new Path(root, s"._LATEST.${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (f.exists(pointer(root))) f.delete(pointer(root), false)
    if (!f.rename(tmp, pointer(root)))
      throw new IllegalStateException(s"failed to commit pointer for $root")
    vacuum(spark, root, keepVersions)
  }

  /** Delete snapshot dirs older than the newest `keep` versions (≙ VACUUM). */
  def vacuum(spark: SparkSession, root: String, keep: Int): Unit = {
    val f = fs(spark, new Path(root))
    currentVersion(spark, root).foreach { latest =>
      val cutoff = latest - math.max(keep - 1, 0)
      val versions = f.listStatus(new Path(root)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(s => s.getPath.getName.stripPrefix("v=").toLong)
      versions.filter(_ < cutoff).foreach { v =>
        f.delete(new Path(root, s"v=$v"), true)
      }
    }
  }
}
