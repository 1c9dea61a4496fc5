package graft.tx

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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

  def exists(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root).isDefined

  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, new Path(root))
    val p = pointer(root)
    if (f.exists(p)) {
      // readFully, not a single read(): a short read would silently parse
      // a truncated version number
      val len = f.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(p)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, StandardCharsets.UTF_8).trim.toLong)
    } else {
      // crash recovery: if the pointer was lost mid-swap, fall back to the
      // newest fully-committed snapshot dir (_SUCCESS present — a staged
      // but uncommitted v=N has none until the parquet job commits; the
      // single-writer assumption means no concurrent stage is in flight
      // when recovery runs)
      val rootPath = new Path(root)
      if (!f.exists(rootPath)) None
      else f.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName.stripPrefix("v=").toLong)
        .filter(v => f.exists(new Path(root, s"v=$v/_SUCCESS")))
        .sorted.lastOption
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
    // Atomic pointer swap: write sidecar then rename OVER the live
    // _LATEST in one FS op (FileContext + Rename.OVERWRITE). A prior
    // delete-then-rename had a window where readers saw no pointer and a
    // crash lost it permanently; currentVersion's max-v recovery now also
    // backstops that, but the swap itself should never expose the window.
    val tmp = new Path(root, s"._LATEST.${UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    try {
      val fc = FileContext.getFileContext(rootPath.toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, pointer(root), Options.Rename.OVERWRITE)
    } catch {
      case e: Exception =>
        throw new IllegalStateException(s"failed to commit pointer for $root", e)
    }
    vacuum(spark, root, keepVersions)
  }

  /** Time travel (Delta `versionAsOf`): read a specific retained snapshot
    * version. Only versions the vacuum policy kept are readable. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val p = new Path(root, s"v=$version")
    if (!fs(spark, p).exists(p))
      throw new IllegalStateException(
        s"version $version of $root does not exist (vacuumed or never written)")
    spark.read.parquet(p.toString)
  }

  /** Change-data-feed analog (Delta CDF): row-level delta between two
    * retained snapshot versions as full-row anti-joins —
    * `_change_type ∈ {insert, delete}` (an update appears as its delete +
    * insert pair, which is what a full-snapshot store can know without
    * key semantics). Downstream incremental consumers read the diff
    * instead of re-scanning the snapshot. Scale: two hash anti-joins on
    * all columns — the same cost class as the snapshot write that
    * produced the versions. */
  def diff(spark: SparkSession, root: String,
           fromVersion: Long, toVersion: Long): DataFrame = {
    val from = readVersion(spark, root, fromVersion)
    val to = readVersion(spark, root, toVersion)
    import org.apache.spark.sql.functions.lit
    to.exceptAll(from).withColumn("_change_type", lit("insert"))
      .unionByName(from.exceptAll(to).withColumn("_change_type", lit("delete")))
  }

  /** OPTIMIZE analog (Delta OPTIMIZE [ZORDER BY]): rewrite the current
    * snapshot into ~`targetBytes` files, optionally range-clustered +
    * sorted by `clusterBy` so parquet min/max stats enable data skipping
    * on those columns. The small-files problem is the classic operational
    * cost of per-batch snapshot commits at scale — compaction amortizes
    * it without changing any row. Returns the new file count. */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L << 20,
              clusterBy: Seq[String] = Nil): Int = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"graft table does not exist: $root"))
    val dir = new Path(root, s"v=$v")
    val f = fs(spark, dir)
    val bytes = f.getContentSummary(dir).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val cur = read(spark, root)
    val out =
      if (clusterBy.isEmpty) cur.repartition(parts)
      else cur.repartitionByRange(parts,
        clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
    write(spark, root, out)
    val newDir = new Path(root, s"v=${v + 1}")
    f.listStatus(newDir).count(s => s.getPath.getName.endsWith(".parquet"))
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
