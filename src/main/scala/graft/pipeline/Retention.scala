package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Retention trims (reference: retention/bronze_retention_cleanup.py,
  * silver_retention_cleanup.py) — Delta DELETE + VACUUM replaced by a
  * filtered snapshot rewrite; old snapshot versions are the "files to
  * vacuum" and are dropped by [[AtomicRewrite.vacuum]] on commit.
  */
object Retention {

  /** Bronze retention: drop whole `load_date=<d>` partition directories
    * older than `days` — a metadata-cheap partition drop, never a row scan
    * (the correct shape for an append-only 100 TB bronze). Returns the
    * number of partitions dropped. */
  def trimBronzePartitions(spark: SparkSession, root: String, days: Int,
                           asOf: Timestamp): Int = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val cutoff = new Timestamp(asOf.getTime - days * 86400000L)
      .toLocalDateTime.toLocalDate
    val old = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("load_date="))
      .filter { s =>
        val d = s.getPath.getName.stripPrefix("load_date=")
        java.time.LocalDate.parse(d).isBefore(cutoff)
      }
    old.foreach(s => fs.delete(s.getPath, true))
    old.size
  }

  /** Keep only rows with `tsCol` within `days` of `asOf`; returns rows
    * dropped. Closed SCD2 history can additionally be bounded with
    * `onlyClosed` so current rows never expire. */
  def trim(spark: SparkSession, root: String, tsCol: String, days: Int,
           asOf: Timestamp, onlyClosed: Boolean = false): Long = {
    if (!AtomicRewrite.exists(spark, root)) return 0L
    val t = AtomicRewrite.read(spark, root)
    val cutoff = new Timestamp(asOf.getTime - days * 86400000L)
    // NULL-explicit: under 3-valued logic a NULL tsCol (or is_current)
    // would satisfy neither `expired` nor `!expired` and silently vanish
    // from the rewrite. NULL ts ⇒ never expired.
    val expired = col(tsCol).isNotNull && col(tsCol) < lit(cutoff) &&
      (if (onlyClosed) !coalesce(col("is_current"), lit(true)) else lit(true))
    val dropped = t.filter(expired).count()
    if (dropped > 0) AtomicRewrite.write(spark, root, t.filter(!expired))
    dropped
  }
}
