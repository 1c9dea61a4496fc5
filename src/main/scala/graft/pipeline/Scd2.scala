package graft.pipeline

import graft.ops.{Dedup, ScdHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 versioning (reference M2 close + M3 insert, done in ONE pass).
  *
  * Reference runs two sequential Delta MERGEs — close current versions whose
  * hash changed, then insert the new versions
  * (src/silver/trips_bronze_to_silver.py:347-432). A crash between the two
  * leaves keys with no current row (the reference comments on repairing
  * that). Our join-based formulation computes closed + inserted + untouched
  * rows in one plan and commits one snapshot — idempotent by construction
  * (replaying the same batch is a no-op thanks to the hash short-circuit).
  *
  * Scale: one shuffle each for the batch-dedup window and the key join;
  * history table arrives partitioned by key from the previous snapshot, AQE
  * coalesces the small side.
  */
object Scd2 {

  val MetaCols: Seq[String] = Seq("scd_hash", "valid_from", "valid_to", "is_current")

  /** Stamp SCD2 metadata on a cleaned batch: hash over `businessCols`,
    * valid_from = event ts, open-ended, current. */
  def prepare(batch: DataFrame, businessCols: Seq[String], tsCol: String): DataFrame =
    batch
      .withColumn("scd_hash", ScdHash.scdHash(businessCols.map(col)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  /** Apply a prepared batch to existing history.
    *
    * @param history  full SCD2 table (all versions), schema ⊇ batch schema
    * @param batch    output of [[prepare]] (may contain several versions of
    *                 a key; deduped here to latest via `orderCols`)
    * @param keys     business key
    * @param orderCols total recency order within the batch (desc applied)
    * @return next full history snapshot
    */
  def apply(history: DataFrame, batch: DataFrame, keys: Seq[String],
            orderCols: Seq[String]): DataFrame = {
    val cols = history.columns.toSeq
    // archive_month (the silver partition grain: 0 = current, else yyyyMM
    // of valid_to) is maintained HERE so every SCD2 writer — batch or
    // streaming — keeps it consistent: the batch is aligned in, and the
    // merged output restamped (a closed row carries its pre-close value
    // through the join otherwise). key_bucket (the second partition
    // level: stable key hash) likewise — it is a pure function of the
    // business key, so stamping the batch once is enough (a key never
    // changes bucket).
    val hasArchive = cols.contains("archive_month")
    val aligned0 =
      if (hasArchive && !batch.columns.contains("archive_month"))
        batch.withColumn("archive_month", lit(0))
      else batch
    val aligned =
      if (cols.contains("key_bucket") && !aligned0.columns.contains("key_bucket"))
        aligned0.withColumn("key_bucket",
          Medallion.keyBucket(keys, Medallion.DimBuckets))
      else aligned0
    val latest = Dedup.latestPerKey(aligned.select(cols.map(col): _*),
      keys.map(col), orderCols.map(c => col(c).desc))

    val cur = history.filter(col("is_current")).alias("t")
    val hist = history.filter(!col("is_current"))
    val s = latest.alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = cur.join(s, joinCond, "full_outer")

    val tPresent = keys.map(k => col(s"t.$k").isNotNull).reduce(_ && _)
    val sPresent = keys.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val changed = col("s.valid_from") > col("t.valid_from") &&
      col("s.scd_hash") =!= col("t.scd_hash")

    // Closed-out previous versions (M2): hash changed → valid_to = new from.
    val closed = joined.filter(tPresent && sPresent && changed).select(
      cols.map {
        case "valid_to"   => col("s.valid_from").as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c            => col(s"t.$c").as(c)
      }: _*)
    // Surviving current rows: unmatched, or matched with same hash / older batch.
    val kept = joined.filter(tPresent && (!sPresent || !changed)).select(
      cols.map(c => col(s"t.$c").as(c)): _*)
    // New current versions (M3): brand-new keys or just-closed keys.
    val inserted = joined.filter(sPresent && (!tPresent || changed)).select(
      cols.map(c => col(s"s.$c").as(c)): _*)

    val out = hist.unionByName(closed).unionByName(kept).unionByName(inserted)
    if (hasArchive)
      out.withColumn("archive_month",
        when(col("is_current"), lit(0))
          .otherwise(date_format(col("valid_to"), "yyyyMM").cast("int")))
    else out
  }

  /** Rebuild SCD2 history from a full change log in one shot (used by the
    * oracle-checked query q18): consecutive same-hash versions collapse,
    * valid_to = next valid_from, newest row per key is current. */
  def fromChangeLog(log: DataFrame, keys: Seq[String], businessCols: Seq[String],
                    tsCol: String, tieBreak: Seq[String]): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col)).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val hashed = log.withColumn("scd_hash", ScdHash.scdHash(businessCols.map(col)))
    val dedup = hashed
      .withColumn("__prev_hash", lag("scd_hash", 1).over(w))
      .filter(col("__prev_hash").isNull || col("__prev_hash") =!= col("scd_hash"))
      .drop("__prev_hash")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    dedup
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
