package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.sql.Timestamp

/** Pluggable extraction sources for the bronze layer (reference S1/S2:
  * JDBC scans with watermark pushdown,
  * src/bronze/trips_oltp_to_bronze.py:119-128 and
  * gdpr/gdpr_propagate_erasure.py:301-326).
  *
  * The incremental filter is expressed on the DataFrame; Catalyst pushes it
  * into the scan — parquet row-group/dictionary pruning here, a JDBC WHERE
  * clause against the upstream database for [[JdbcSource]] — so "read only
  * the new rows" costs what the source can prune, not a full scan.
  */
trait Source {
  /** Full table read. */
  def read(spark: SparkSession): DataFrame

  /** Rows with `wmCol` strictly after `since` (None → full read). */
  def readIncremental(spark: SparkSession, wmCol: String,
                      since: Option[Timestamp]): DataFrame = {
    val df = read(spark)
    since.map(ts => df.filter(col(wmCol) > ts)).getOrElse(df)
  }
}

/** Parquet-backed source (the testdata environment). */
case class ParquetSource(path: String) extends Source {
  override def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** Delimited/JSON file drops — the landing-zone shape a reference user
  * migrating from CSV/JSONL exports needs. An EXPLICIT schema is required:
  * schema inference would scan the data twice and silently drift between
  * drops; bronze owns the contract. `readIncremental`'s watermark filter
  * still prunes what the format allows (CSV/JSON scan whole files, so at
  * scale pair this with date-partitioned drop directories — the `path`
  * glob then partition-prunes before any row is parsed). */
case class FileSource(path: String, format: String,
                      schema: org.apache.spark.sql.types.StructType,
                      options: Map[String, String] = Map.empty) extends Source {
  require(Set("csv", "json").contains(format), s"unsupported format: $format")
  override def read(spark: SparkSession): DataFrame =
    options.foldLeft(spark.read.format(format).schema(schema)) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)
}

/** JDBC-backed source (the reference's OLTP extraction path). `pushdown`
  * optionally inlines a server-side subquery, the S2 idiom
  * (gdpr_propagate_erasure.py:301-326). Integration-tested against
  * embedded Derby (SourceSpec), including the watermark filter reaching
  * the database as a pushed WHERE clause. */
case class JdbcSource(url: String, table: String,
                      options: Map[String, String] = Map.empty,
                      pushdown: Option[String] = None) extends Source {
  override def read(spark: SparkSession): DataFrame = {
    val dbtable = pushdown.map(q => s"($q) AS src").getOrElse(table)
    options.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
  }
}
