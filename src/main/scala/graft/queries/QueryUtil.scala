package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers shared by the query families (one definition — TextQueries
  * and VectorQueries delegate here rather than carrying drift-prone
  * copies). */
private[queries] object QueryUtil {

  /** Per-(query, sf) scratch root for store-backed oracle queries
    * (q83/q94/q101/q119/q120): rebuilt from scratch each run so the
    * oracle always sees a fresh deterministic store. */
  def tmpStoreRoot(s: SparkSession, dir: String, tag: String): String = {
    val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_$safe"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  /** Force `out` (a small result frame) into cache — computing it is
    * what reuses the big `inputs` caches across plan branches — then
    * release those inputs so nothing heavyweight outlives the query. */
  def materializeAndRelease(out: DataFrame, inputs: DataFrame*): DataFrame = {
    val m = out.persist()
    m.count()
    inputs.foreach(_.unpersist())
    m
  }
}
