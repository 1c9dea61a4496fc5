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
      // schema-bearing empty snapshot, committed driver-side (zero jobs)
      AtomicRewrite.writeLocalRows(spark, root, Nil, schema)

  /** Version-keyed driver cache of control-table contents. The table is
    * tiny by definition (one row per job name), yet a pipeline batch
    * probes it ~2× per stage — each probe a full Spark job without the
    * cache, a pure driver lookup with it. Keyed by the table's committed
    * VERSION (an O(1) filesystem probe), so any writer going through
    * AtomicRewrite — this session or not — invalidates it for free. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Seq[Row])]()

  /** Reads serialize on the same per-root lock as [[advance]]: a read
    * resolves a version and then collects its files, while a concurrent
    * advance's housekeeping vacuum (keepVersions=2) can delete that very
    * version dir between the two steps — two quick sibling-chain advances
    * were enough to turn a reader's resolved snapshot into a spurious
    * FileNotFound that failSafe records as a batch FAIL. The table is a
    * handful of rows, so serializing reads with writes costs nothing. */
  private def tableRows(spark: SparkSession, root: String): Seq[Row] =
    locks.computeIfAbsent(root, _ => new Object).synchronized {
    AtomicRewrite.currentVersion(spark, root) match {
      case None => Nil
      case Some(v) =>
        // version + commit-marker mtime: a control table deleted and
        // rebuilt at the same path must never serve the old rows
        val f = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tok = AtomicRewrite.versionToken(f, root, v)
        val hit = cache.get(root)
        if (hit != null && hit._1 == v && hit._2 == tok) hit._3
        else {
          val rows = AtomicRewrite.read(spark, root).collect().toSeq
          cache.put(root, (v, tok, rows))
          rows
        }
    }
    }

  def read(spark: SparkSession, root: String, job: String): Option[Timestamp] =
    tableRows(spark, root).find(_.getString(0) == job)
      .flatMap(r => Option(r.getTimestamp(1)))

  /** One lock per control root, shared by reads AND advances: independent
    * pipeline branches run their Spark jobs concurrently (see
    * [[graft.pipeline.Runner.runBatch]]) but their read-merge-write on the
    * SHARED control table must serialize — two unsynchronized advances
    * would both stage version v+1 and one job's watermark would be lost —
    * and an unsynchronized read could resolve a version the other
    * advance's vacuum deletes mid-collect (see [[tableRows]]). Driver-side
    * lock is sufficient: every reader/writer of a given pipeline's control
    * table lives in this JVM. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Advance (or record a failed run for) one job. NULL `ts` never regresses
    * the stored watermark.
    *
    * The merge runs DRIVER-SIDE over the collected rows: a shuffle-join
    * upsert of a one-row source into a ten-row table costs several Spark
    * jobs per stage for no distribution benefit (round-6 q26 profile:
    * control-plane jobs were a quarter of the E2E wall). */
  def advance(spark: SparkSession, root: String, job: String,
              ts: Option[Timestamp], status: String, runAt: Timestamp): Unit =
    locks.computeIfAbsent(root, _ => new Object).synchronized {
    val rows = tableRows(spark, root)
    val prevTs = rows.find(_.getString(0) == job)
      .flatMap(r => Option(r.getTimestamp(1)))
    val next = Row(job, ts.orElse(prevTs).orNull, runAt, status)
    val merged = rows.filterNot(_.getString(0) == job) :+ next
    // control tables are tiny by definition AND the merged rows already
    // live on the driver: commit them driver-side — one file, zero
    // Spark jobs (a coalesce(1) job per advance was ~100 ms of pure
    // schedule/plan round-trip, several times per pipeline batch)
    AtomicRewrite.writeLocalRows(spark, root, merged, schema)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicRewrite.currentVersion(spark, root)
      .foreach(v => cache.put(root,
        (v, AtomicRewrite.versionToken(f, root, v), merged)))
  }
}

