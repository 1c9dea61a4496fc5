package graft.streaming

import graft.SparkSpec
import graft.pipeline.Medallion
import graft.tx.AtomicRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Micro-batches keep the gold fact AND its incremental aggregate fresh
  * through the same affected-slice path the batch pipeline uses; an
  * untouched grain slice keeps its earlier watermark (not recomputed),
  * and a replayed micro-batch is a no-op. */
case class Sale(sale_id: Long, date_key: Int, amount: Double,
                raw_loaded_at: Timestamp)

class StreamingGoldSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch maintains fact + affected-slice aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-sg").toString
    val paths = Medallion.Paths(root)
    val in = MemoryStream[Sale]
    val q = StreamingGold.aggSink(in.toDF(), paths, "fact_sales", "agg_sales",
      keys = Seq("sale_id"), grainCols = Seq("date_key"),
      aggs = Seq(count(lit(1)).as("n"),
        sum(col("amount").cast("decimal(38,6)")).cast("double").as("total")))
    try {
      in.addData(
        Sale(1, 20240101, 10.0, ts("2024-01-01 10:00:00")),
        Sale(2, 20240101, 5.0, ts("2024-01-01 11:00:00")),
        Sale(3, 20240102, 7.0, ts("2024-01-02 09:00:00")))
      q.processAllAvailable()
      val agg1 = AtomicRewrite.read(spark, paths.gold("agg_sales"))
        .select("date_key", "n", "total").as[(Int, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(agg1 == Map(20240101 -> ((2L, 15.0)), 20240102 -> ((1L, 7.0))))

      // batch 2 touches only 20240102 -> the 20240101 slice keeps its
      // batch-1 max_fact watermark (not recomputed)
      in.addData(Sale(4, 20240102, 3.0, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      val agg2 = AtomicRewrite.read(spark, paths.gold("agg_sales"))
        .select("date_key", "n", "total", "max_fact_raw_loaded_at")
        .collect().map(r => r.getInt(0) -> r).toMap
      assert(agg2(20240102).getLong(1) == 2 && agg2(20240102).getDouble(2) == 10.0)
      assert(agg2(20240101).getLong(1) == 2)
      assert(agg2(20240101).getTimestamp(3) == ts("2024-01-01 11:00:00"))
      assert(agg2(20240102).getTimestamp(3) == ts("2024-01-02 12:00:00"))

      // replayed micro-batch: fact merge is guarded, agg watermark skips it
      in.addData(Sale(4, 20240102, 3.0, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, paths.gold("fact_sales")).count() == 4)
      val agg3 = AtomicRewrite.read(spark, paths.gold("agg_sales"))
        .select("date_key", "n").as[(Int, Long)].collect().toMap
      assert(agg3 == Map(20240101 -> 2L, 20240102 -> 2L))

      // one micro-batch carrying TWO updates to one key: only the latest
      // lands — no duplicate key rows, no double counting
      in.addData(Sale(5, 20240103, 1.0, ts("2024-01-03 08:00:00")),
        Sale(5, 20240103, 2.5, ts("2024-01-03 09:00:00")))
      q.processAllAvailable()
      val s5 = AtomicRewrite.read(spark, paths.gold("fact_sales"))
        .filter(col("sale_id") === 5L)
      assert(s5.count() == 1)
      assert(s5.select("amount").as[Double].head() == 2.5)
      val agg4 = AtomicRewrite.read(spark, paths.gold("agg_sales"))
        .filter(col("date_key") === 20240103)
        .select("n", "total").as[(Long, Double)].head()
      assert(agg4 == ((1L, 2.5)))
    } finally q.stop()
  }
}
