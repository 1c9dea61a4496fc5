package graft.tx

import graft.ops.ScdHash
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** In-place schema evolution for committed snapshot tables — the
  * Delta-less form of the reference's migration scripts
  * (migrations/000_create_control_tables.py ≙ [[Watermarks.bootstrap]],
  * 001_scd2_trips.py ≙ [[scd2Bootstrap]]).
  *
  * A migration reads the current snapshot, adds only the missing columns
  * with their backfill expressions, and commits the result as the next
  * version — re-running is a no-op, and old versions remain readable until
  * vacuumed. Scale: one scan + one write of the table, all-narrow (no
  * shuffle) since backfills are row-local expressions.
  */
object Migrations {

  /** Add the missing columns of `cols` (name → backfill expression) to the
    * table at `root` as a new snapshot version. Returns the names actually
    * added; Nil when the table is absent or already fully evolved. */
  def addColumns(spark: SparkSession, root: String,
                 cols: Seq[(String, Column)]): Seq[String] = {
    if (!AtomicRewrite.exists(spark, root)) return Nil
    val t = AtomicRewrite.read(spark, root)
    val missing = cols.filterNot { case (n, _) => t.columns.contains(n) }
    if (missing.isEmpty) return Nil
    val out = missing.foldLeft(t) { case (df, (n, e)) => df.withColumn(n, e) }
    AtomicRewrite.write(spark, root, out)
    missing.map(_._1)
  }

  /** Migration 001: backfill SCD2 columns onto a pre-SCD2 table — every
    * existing row becomes the open current version, hashed over
    * `businessCols` (reference migrations/001_scd2_trips.py:37-79). */
  def scd2Bootstrap(spark: SparkSession, root: String,
                    businessCols: Seq[String],
                    tsCol: String = "raw_loaded_at"): Seq[String] =
    addColumns(spark, root, Seq(
      "scd_hash" -> ScdHash.scdHash(businessCols.map(col)),
      "valid_from" -> col(tsCol),
      "valid_to" -> lit(null).cast("timestamp"),
      "is_current" -> lit(true)))
}
