package graft.tools
object WriterInitTest {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.fromEnv("writer-init")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_winit"
    def clean(p: String) = {
      val pp = new org.apache.hadoop.fs.Path(p)
      val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(pp)) fs.delete(pp, true)
    }
    for (dirs <- Seq(1, 8, 32, 81, 200)) {
      val df = spark.range(2400)
        .withColumn("month_key", (col("id") % dirs).cast("int"))
        .withColumn("v", rand(7))
      df.count()
      (1 to 2).foreach { i =>
        clean(s"$base/x")
        time(f"dirs=$dirs%3d run$i") {
          df.hint("rebalance", col("month_key"))
            .write.mode("overwrite").partitionBy("month_key").parquet(s"$base/x")
        }
      }
    }
    spark.stop()
  }
}
