package graft
import org.apache.spark.sql.SparkSession
/** Dev smoke probe mirroring the driver's t1 gate: entry() rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "t1 smoke would fail: entry() returned 0 rows")
    spark.stop()
  }
}
