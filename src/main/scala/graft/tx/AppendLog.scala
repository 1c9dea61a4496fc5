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
  * Growth bound: one file per append — erasure runs / fact versions,
  * an operational cadence, not data volume. A `tag`ged append is
  * idempotent (deterministic file name, overwrite-rename), which also
  * gives writers an O(1) "already appended?" probe via [[tagged]].
  *
  * A log that STARTED as a versioned snapshot (pre-append layout) is
  * folded in once on first append, crash-safely: the legacy rows are
  * staged to a dot-dir (invisible to plain scans), renamed up under
  * DETERMINISTIC names (overwrite semantics — a retry re-stages the
  * same bytes over the same names, never duplicating), and the version
  * machinery is deleted LAST. Readers are correct in every intermediate
  * state: while `_LATEST`/`v=*` survive, [[read]] resolves the
  * versioned layout and ignores the flat files; once they are gone the
  * folded files ARE the log. */
object AppendLog {

  /** Append one batch as ONE new parquet file. With `tag`, the file
    * name is `log_<tag>.parquet` — deterministic, so replaying the same
    * tagged append overwrites rather than duplicates. */
  def append(spark: SparkSession, root: String, rows: DataFrame,
             tag: Option[String] = None): Unit = {
    migrateLegacy(spark, root)
    tag match {
      case None =>
        // control-plane rows are tiny; one file per append, not one
        // sliver per shuffle partition
        rows.coalesce(1).write.mode("append").parquet(root)
      case Some(t) =>
        require(t.matches("[A-Za-z0-9._-]+"), s"unsafe append tag: $t")
        stageAndRename(spark, root, rows, i => s"log_$t${suffix(i)}")
    }
  }

  /** Whether a `tag`ged append has already happened — one file-exists
    * probe, no log scan. */
  def tagged(spark: SparkSession, root: String, tag: String): Boolean = {
    val p = new Path(root, s"log_$tag.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def suffix(i: Int) = if (i == 0) ".parquet" else s"_$i.parquet"

  /** Stage `rows` to a dot-dir under the log root, then rename the
    * part files to `name(i)` with overwrite semantics (delete-existing
    * first). Deterministic names make a crashed attempt's retry
    * idempotent. */
  private def stageAndRename(spark: SparkSession, root: String,
                             rows: DataFrame, name: Int => String): Unit = {
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(root, ".stage")
    rows.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    f.listStatus(staged).filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName).zipWithIndex.foreach { case (s, i) =>
        val target = new Path(root, name(i))
        if (f.exists(target)) f.delete(target, false)
        if (!f.rename(s.getPath, target))
          throw new IllegalStateException(
            s"append-log rename failed: ${s.getPath} -> $target")
      }
    f.delete(staged, true)
  }

  /** One-time crash-safe fold of a pre-append-layout log (versioned
    * snapshot under `v=<N>/` + `_LATEST`) into the flat append files.
    * Ordering: stage → rename-up (deterministic `legacy_*` names,
    * overwrite) → delete version dirs OLDEST-FIRST → pointer last. A
    * crash anywhere leaves a state from which both [[read]] and a retry
    * are correct: while any committed `v=` dir survives, the versioned
    * branch of [[read]] still resolves (and a retry re-stages from the
    * NEWEST surviving snapshot — oldest-first deletion keeps that the
    * true newest); once only the stale pointer survives, the already-
    * folded `legacy_*` files are the source of truth and the pointer is
    * simply dropped. */
  private def migrateLegacy(spark: SparkSession, logRoot: String): Unit = {
    if (!AtomicRewrite.exists(spark, logRoot)) return
    val root = new Path(logRoot)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val alreadyFolded = f.exists(root) && f.listStatus(root).exists { s =>
      val n = s.getPath.getName
      n.startsWith("legacy") && n.endsWith(".parquet")
    }
    val legacyRows =
      try Some(AtomicRewrite.read(spark, logRoot))
      catch {
        // a prior attempt deleted every version dir but crashed before
        // the pointer: the folded files already hold the rows
        case _: IllegalStateException if alreadyFolded => None
      }
    legacyRows.foreach(rows =>
      stageAndRename(spark, logRoot, rows, i => s"legacy${suffix(i)}"))
    f.listStatus(root).filter(_.getPath.getName.startsWith("v="))
      .sortBy(_.getPath.getName.stripPrefix("v=").toLong)
      .foreach(s => f.delete(s.getPath, true))
    f.listStatus(root).filter { s =>
      val n = s.getPath.getName
      n == "_LATEST" || n.startsWith("._LATEST")
    }.foreach(s => f.delete(s.getPath, false))
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
