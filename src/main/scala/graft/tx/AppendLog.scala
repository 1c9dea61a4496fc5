package graft.tx

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only parquet log (the bronze append pattern for control-plane
  * tables): each [[append]] adds ONE new file and never touches prior
  * files, so a write is O(this batch) while the log holds O(all time);
  * the read path is a plain scan. Used for the GDPR erasure audit and
  * the per-commit CDF change log — any table whose rows are immutable
  * facts about the past. (A versioned-snapshot table is the wrong tool
  * there: its read-union-rewrite commit restages all-time content per
  * append, through one task when coalesced.)
  *
  * A log that STARTED as a versioned snapshot (pre-append layout) is
  * folded in once on first append: its rows are staged to a dot-dir
  * (invisible to parquet scans), the version machinery deleted, and the
  * staged file moved up as the log's base segment. */
object AppendLog {

  /** Append one batch as ONE new parquet file. */
  def append(spark: SparkSession, root: String, rows: DataFrame): Unit = {
    migrateLegacy(spark, root)
    // control-plane rows are tiny; one file per append, not one sliver
    // per shuffle partition
    rows.coalesce(1).write.mode("append").parquet(root)
  }

  private def migrateLegacy(spark: SparkSession, logRoot: String): Unit = {
    if (!AtomicRewrite.exists(spark, logRoot)) return
    val root = new Path(logRoot)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(logRoot, ".legacy_stage")
    AtomicRewrite.read(spark, logRoot).coalesce(1)
      .write.mode("overwrite").parquet(staged.toString)
    f.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("v=") || n == "_LATEST" || n.startsWith("._LATEST"))
        f.delete(s.getPath, true)
    }
    f.listStatus(staged).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => f.rename(s.getPath, new Path(root, s.getPath.getName)))
    f.delete(staged, true)
  }

  /** Whether any rows have ever been appended (legacy layout counts). */
  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.exists(p) &&
      (AtomicRewrite.exists(spark, root) ||
        f.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
  }

  /** Read the full log (a pre-migration legacy layout is still readable). */
  def read(spark: SparkSession, root: String): DataFrame =
    if (AtomicRewrite.exists(spark, root)) AtomicRewrite.read(spark, root)
    else spark.read.parquet(root)
}
