package graft.streaming

import graft.core.Tables
import org.apache.spark.sql.SparkSession

/** File-stream demo: stream the events table through the windowed
  * aggregate and the sessionizer, printing row counts. Usage:
  * StreamDemo <sfDir> */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // file-stream source needs an explicit schema + a directory: stage the
    // normalized events into a temp dir first
    val staged = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val events = Tables.load(spark, sfDir, "events")
    events.write.mode("overwrite").parquet(staged)

    val stream = spark.readStream.schema(events.schema).parquet(staged)
    val wc = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc_demo")
      .outputMode("append").start()
    val sess = EventStreams.sessionize(stream.as[EventStreams.Event])
      .writeStream.format("memory").queryName("sess_demo")
      .outputMode("append").start()
    wc.processAllAvailable(); sess.processAllAvailable()
    println(s"windowed rows=${spark.table("wc_demo").count()} " +
      s"sessions=${spark.table("sess_demo").count()}")
    wc.stop(); sess.stop(); spark.stop()
  }
}
