package graft.tools

/** Dev-only probe of the per-TASK floor on tiny scans (the c8-vs-c32
  * inversion diagnosis): times trivial jobs at various task counts and
  * file layouts so the generic overhead (dispatch, codegen, parquet
  * reader init, broadcast deserialization) can be attributed before any
  * fix is attempted. Usage: ScanFloor [dir=/tmp/scanfloor]
  */
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SparkSessionFactory.fromEnv("scanfloor")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/tmp/scanfloor")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    // raw task dispatch, no I/O, no SQL
    spark.sparkContext.parallelize(1 to 32, 32).count()
    (1 to 3).foreach { i =>
      time(s"rdd 32 empty tasks run$i") {
        spark.sparkContext.parallelize(1 to 32, 32).count() } }
    (1 to 3).foreach { i =>
      time(s"rdd 256 empty tasks run$i") {
        spark.sparkContext.parallelize(1 to 256, 256).count() } }
    // 32-file tiny parquet dir (the store shape)
    val f32 = s"$dir/f32"
    spark.range(5000).select(col("id"),
        concat(lit("text "), col("id")).as("t"))
      .repartition(32).write.mode("overwrite").parquet(f32)
    val f1 = s"$dir/f1"
    spark.range(5000).select(col("id"),
        concat(lit("text "), col("id")).as("t"))
      .coalesce(1).write.mode("overwrite").parquet(f1)
    spark.read.parquet(f32).count()
    (1 to 3).foreach { i =>
      time(s"32-file scan noop run$i") {
        spark.read.parquet(f32).write.format("noop")
          .mode("overwrite").save() } }
    (1 to 3).foreach { i =>
      time(s"1-file scan noop run$i") {
        spark.read.parquet(f1).write.format("noop")
          .mode("overwrite").save() } }
    // the forget-discovery shape: pruned scan + broadcast semi-join + agg
    val ids = spark.range(0, 5000, 7).select(col("id"))
    (1 to 3).foreach { i =>
      time(s"32-file semijoin agg run$i") {
        spark.read.parquet(f32).join(ids, Seq("id"), "left_semi")
          .agg(count(lit(1))).collect() } }
    (1 to 3).foreach { i =>
      time(s"1-file semijoin agg run$i") {
        spark.read.parquet(f1).join(ids, Seq("id"), "left_semi")
          .agg(count(lit(1))).collect() } }
    spark.stop()
  }
}
