package graft.tools

import graft.core.Tables
import graft.pipeline.Runner
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Write-amplification benchmark for the partition-committed pipeline:
  * batch 0 full-loads the sf orders star, batch 1 lands one extra day of
  * synthetic orders through the SAME path, and the report compares the
  * bytes each commit staged. The partition-commit contract says batch 1
  * stages O(touched partitions): one silver hot partition + one archive
  * month, one fact month — while all-time history rides the manifests.
  * Prints one JSON line. */
object IncBench {
  private def dirBytes(spark: org.apache.spark.sql.SparkSession, p: String): Long = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-incbench")
    spark.sparkContext.setLogLevel("ERROR")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_incbench"
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rp)) fs.delete(rp, true)

    val customer = Tables.load(spark, sfDir, "customer")
      .withColumn("updated_at", to_timestamp(lit("2020-01-01 00:00:00")))
    val orders = Tables.load(spark, sfDir, "orders")

    val t0 = System.nanoTime()
    Runner.runBatch(spark, root, customer, orders, Runner.FixedNow, "b0")
    val fullSec = (System.nanoTime() - t0) / 1e9

    // batch 1: 500 synthetic orders one day past the corpus max
    val maxDate = orders.agg(max(col("o_orderdate"))).head().get(0)
    val inc = orders.orderBy("o_orderkey").limit(500)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("o_orderdate",
        (lit(maxDate).cast("timestamp") + expr("INTERVAL 1 DAY")))
    val t1 = System.nanoTime()
    Runner.runBatch(spark, root, customer, inc,
      Timestamp.valueOf("2024-01-02 00:00:00"), "b1")
    val incSec = (System.nanoTime() - t1) / 1e9

    // fact: incremental commit = the touched month only. silver:
    // incremental commit = the hot current partition + the new archive
    // month — O(current+batch) by design (closed history rides the
    // manifest; the all-time-history rewrite is what was eliminated).
    val factFull = dirBytes(spark, s"$root/gold/fact_orders/v=0")
    val factInc = dirBytes(spark, s"$root/gold/fact_orders/v=1")
    val silverFull = dirBytes(spark, s"$root/silver/orders/v=0")
    val silverInc = dirBytes(spark, s"$root/silver/orders/v=1")
    val agg = graft.tx.AtomicRewrite.read(spark, s"$root/gold/agg_orders_daily")
    val rows = agg.agg(sum(col("orders_total"))).head().getLong(0)
    println(s"""{"metric":"inc_write_amplification","full_sec":$fullSec,""" +
      s""""inc_sec":$incSec,"fact_full_bytes":$factFull,""" +
      s""""fact_inc_bytes":$factInc,""" +
      s""""fact_ratio":${factFull.toDouble / math.max(factInc, 1)},""" +
      s""""silver_full_bytes":$silverFull,"silver_inc_bytes":$silverInc,""" +
      s""""silver_ratio":${silverFull.toDouble / math.max(silverInc, 1)},""" +
      s""""agg_rows_total":$rows,"sf":"$sfDir"}""")

    // batch 2: a FIVE-order correction. The 500-key batch above touches
    // every one of the 64 hot buckets (coupon collector), so its silver
    // commit is legitimately ~the hot partition; this batch touches ≤5
    // buckets — the other 59+ hot buckets and all archive months must
    // ride the manifest. Cost model: touched_buckets × bucket_size, i.e.
    // proportional to batch spread, not to table size.
    val upd = orders.orderBy("o_orderkey").limit(5)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      .withColumn("o_orderdate",
        (lit(maxDate).cast("timestamp") + expr("INTERVAL 2 DAY")))
    Runner.runBatch(spark, root, customer, upd,
      Timestamp.valueOf("2024-01-03 00:00:00"), "b2")
    val silverV2 = dirBytes(spark, s"$root/silver/orders/v=2")
    val silverTotal = silverFull + silverInc + silverV2
    println(s"""{"metric":"small_batch_silver","updated_keys":5,""" +
      s""""silver_total_bytes":$silverTotal,"silver_small_inc_bytes":$silverV2,""" +
      s""""silver_small_ratio":${silverTotal.toDouble / math.max(silverV2, 1)}}""")

    // --- hist-dim write amplification under GROWING history: the same
    // one-batch commit against 10× more closed history must stage the
    // same bytes (hot partition + the batch's archive month), proving
    // the per-batch cost is O(current + batch), independent of
    // all-time-history size. Dims: the bucketed snapshot commit stages
    // only buckets holding an affected key.
    for (versions <- Seq(10, 100)) {
      val keys = 5000
      val bump = 5
      val hroot = s"$root/hist_x$versions"
      val hp = graft.pipeline.Medallion.Paths(hroot)
      // key k: versions 1..V (+1 for bumped keys), valid_from = month v,
      // closed version v archives into month v+1; current has NULL
      // valid_to. Every closed month except the bump month is a
      // bystander for the incremental batch.
      def mkSilver(bumped: Boolean): org.apache.spark.sql.DataFrame =
        spark.range(keys).select(col("id"),
            explode(expr(s"sequence(1, ${versions} + " +
              s"(CASE WHEN id < $bump AND $bumped THEN 1 ELSE 0 END))"))
              .as("v"))
          .select(col("id"), col("v"),
            concat(lit("val"), col("v")).as("payload"),
            to_timestamp(add_months(lit("2020-01-01").cast("date"), col("v")))
              .as("valid_from"))
          .withColumn("vmax", lit(versions) +
            when(col("id") < bump && lit(bumped), 1).otherwise(0))
          .withColumn("is_current", col("v") === col("vmax"))
          .withColumn("valid_to", when(col("is_current"),
              lit(null).cast("timestamp"))
            .otherwise(to_timestamp(
              add_months(lit("2020-01-01").cast("date"), col("v") + 1))))
          .withColumn("raw_loaded_at", col("valid_from"))
          .withColumn("scd_hash",
            sha2(concat_ws("|", col("id"), col("v")), 256))
          .drop("vmax")
      graft.tx.AtomicRewrite.write(spark, hp.silver("h"), mkSilver(false))
      graft.pipeline.Medallion.goldScd2Hist(spark, hp, "h", Seq("id"),
        Timestamp.valueOf("2024-01-01 00:00:00"))
      graft.pipeline.Medallion.goldScd1Snapshot(spark, hp, "h", Seq("id"),
        Timestamp.valueOf("2024-01-01 00:00:00"))
      graft.tx.AtomicRewrite.write(spark, hp.silver("h"), mkSilver(true))
      graft.pipeline.Medallion.goldScd2Hist(spark, hp, "h", Seq("id"),
        Timestamp.valueOf("2024-01-02 00:00:00"))
      graft.pipeline.Medallion.goldScd1Snapshot(spark, hp, "h", Seq("id"),
        Timestamp.valueOf("2024-01-02 00:00:00"))
      val histFull = dirBytes(spark, s"${hp.gold("dim_h_hist")}/v=0")
      val histInc = dirBytes(spark, s"${hp.gold("dim_h_hist")}/v=1")
      val snapFull = dirBytes(spark, s"${hp.gold("dim_h_snapshot")}/v=0")
      val snapInc = dirBytes(spark, s"${hp.gold("dim_h_snapshot")}/v=1")
      println(s"""{"metric":"hist_write_amplification","history_versions":$versions,""" +
        s""""keys":$keys,"bumped_keys":$bump,""" +
        s""""hist_full_bytes":$histFull,"hist_inc_bytes":$histInc,""" +
        s""""hist_ratio":${histFull.toDouble / math.max(histInc, 1)},""" +
        s""""snap_full_bytes":$snapFull,"snap_inc_bytes":$snapInc,""" +
        s""""snap_ratio":${snapFull.toDouble / math.max(snapInc, 1)}}""")
    }
    spark.stop()
  }
}
