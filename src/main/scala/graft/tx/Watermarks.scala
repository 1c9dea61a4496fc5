package graft.tx

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Batch high-water-mark control table (reference M1,
  * src/bronze/trips_oltp_to_bronze.py:26-94).
  *
  * Schema: job_name, last_loaded_ts, last_run_at, last_status.
  * The never-regress contract: a FAIL run records status with a NULL
  * watermark and `coalesce(source, target)` keeps the previous mark.
  */
object Watermarks {

  val schema: StructType = StructType(Seq(
    StructField("job_name", StringType, nullable = false),
    StructField("last_loaded_ts", TimestampType, nullable = true),
    StructField("last_run_at", TimestampType, nullable = true),
    StructField("last_status", StringType, nullable = true)))

  def bootstrap(spark: SparkSession, root: String): Unit =
    if (!AtomicRewrite.exists(spark, root))
      AtomicRewrite.write(spark, root,
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))

  def read(spark: SparkSession, root: String, job: String): Option[Timestamp] = {
    if (!AtomicRewrite.exists(spark, root)) None
    else AtomicRewrite.read(spark, root)
      .filter(col("job_name") === job)
      .select("last_loaded_ts").collect()
      .headOption.flatMap(r => Option(r.getTimestamp(0)))
  }

  /** Advance (or record a failed run for) one job. NULL `ts` never regresses
    * the stored watermark. */
  def advance(spark: SparkSession, root: String, job: String,
              ts: Option[Timestamp], status: String, runAt: Timestamp): Unit = {
    bootstrap(spark, root)
    val target = AtomicRewrite.read(spark, root)
    val source = spark.createDataFrame(
      java.util.Collections.singletonList(Row(job, ts.orNull, runAt, status)), schema)
    val merged = Upsert.scd1(target, source, Seq("job_name"),
      resolve = Map("last_loaded_ts" -> ((t, s) => coalesce(s, t))))
    // control tables are tiny by definition: one output file, not one per
    // shuffle partition (32 near-empty files per advance otherwise)
    AtomicRewrite.write(spark, root, merged.coalesce(1))
  }
}
