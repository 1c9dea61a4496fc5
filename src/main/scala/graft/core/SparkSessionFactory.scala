package graft.core

import org.apache.spark.sql.SparkSession

/** Central session construction (SURVEY.md §7.1): UTC, AQE with skew-join
  * handling, shuffle parallelism matched to cores, graft SQL functions
  * registered. One place to retune when moving from local[32] to a real
  * cluster. */
object SparkSessionFactory {

  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      // bucketed gold tables (saveAsTable) land in tmp, never the cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .getOrCreate()
    graft.functions.GraftFunctions.registerTo(s)
    // top-k-per-key strategy + the row_number≤k rewrite: every session
    // plans the rank-filter idiom through the heap operator (the whole
    // oracle suite runs — and is hash-verified — under this rule)
    graft.plans.TopKPerKey.install(s)
    graft.plans.AsOfJoinNative.install(s)
    s
  }

  /** Cores from SPARK_GRAFT_CPUS (driver contract), default 32. */
  def fromEnv(appName: String = "graft"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, appName)
}
