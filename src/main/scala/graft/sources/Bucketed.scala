package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so every
  * later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB the win is structural: a fact bucketed by its join key meets
  * a dimension bucketed the same way with zero exchanges — the cluster
  * never moves the big table again. Requirements Spark enforces: same
  * bucket count both sides, join on the bucket column, bucketing enabled
  * (`spark.sql.sources.bucketing.enabled`, default true).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed parquet table. Clears any
    * stale catalog entry AND warehouse directory first: the in-memory
    * catalog dies with the session but the warehouse dir persists, and
    * saveAsTable refuses a location it didn't create
    * (LOCATION_ALREADY_EXISTS). The location comes from the session
    * catalog (table metadata, or the catalog's default path for a table
    * not yet registered) — never from string-concatenating the warehouse
    * dir, which breaks on nonstandard layouts. Unqualified names only:
    * a db-qualified name would resolve outside the current database. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(!table.contains("."),
      s"Bucketed.write needs an unqualified table name, got: $table")
    val spark = df.sparkSession
    val loc = new Path(
      org.apache.spark.sql.graftshim.GraftShim.tableLocation(spark, table))
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
