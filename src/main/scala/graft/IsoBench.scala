package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: time individual queries repeatedly (args = query names). */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same discipline as Bench: queries that persist shared subplans
      // must not hand their cache to the next run, or runs 2-3 measure
      // cache reads instead of the query
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
