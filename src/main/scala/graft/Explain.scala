package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: dump formatted plans for queries (args = names). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { q =>
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
