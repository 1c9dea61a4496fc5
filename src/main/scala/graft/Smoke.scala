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
    // Testdata-drift canary: the driver has regenerated /root/testdata
    // mid-round (r7: events.ts flipped NANOS→MICROS and silently killed 19
    // queries). Print every table's as-loaded schema so drift shows up in
    // the round log, not as a dead bench.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    graft.core.Tables.names.foreach { n =>
      val s = graft.core.Tables.load(spark, sfDir, n).schema.simpleString
      println(s"[schema] $n ${s.take(300)}")
    }
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "t1 smoke would fail: entry() returned 0 rows")
    spark.stop()
  }
}
