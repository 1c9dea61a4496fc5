package graft.tx

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Driver-side parquet writer for CONTROL-PLANE rows that already live
  * on the driver (a watermark merge, a 1-row stats summary, a marker
  * row). Committing a handful of rows through a Spark job costs a full
  * schedule/plan/launch round-trip (~100–150 ms with its driver gap —
  * ~60 such commits per bench sweep); writing the file directly costs
  * milliseconds and zero jobs. This is the Delta-log discipline: the
  * transaction-log twin of a table write is driver-side I/O, not a
  * distributed job — at cluster scale a 1-row control write from the
  * driver is exactly as correct as it is here.
  *
  * Fidelity: the file goes through Spark's own [[ParquetWriteSupport]]
  * (the same WriteSupport every executor task uses), initialized with
  * the session's effective parquet write settings — so the bytes are
  * indistinguishable from a coalesce(1) job's output and every reader
  * (Spark, DuckDB) sees the identical logical types. */
object LocalParquet {

  private class Builder(out: HadoopOutputFile)
    extends ParquetWriter.Builder[InternalRow, Builder](out) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Session SQL settings [[ParquetWriteSupport]] (and its schema
    * converter) read from the hadoop conf — they expect the write path
    * to have copied them in (a bare read `.toBoolean`s to an IAE on an
    * unset key). Taken as [[SQLConf]] ENTRIES, not key strings, so a
    * rename breaks the compile instead of the runtime; values are the
    * session's EFFECTIVE ones (defaults included) via `spark.conf.get`.
    *
    * PINNED to the confs `ParquetWriteSupport.init` +
    * `SparkToParquetSchemaConverter` read as of Spark 4.1 (the jars this
    * repo builds against): writeLegacyParquetFormat, outputTimestampType,
    * fieldId.write.enabled, variant annotation, the two rebase modes, and
    * the session timezone (int96 writer). A Spark upgrade that adds a new
    * conf read inside ParquetWriteSupport would make driver-written
    * control files silently diverge from task-written ones — re-audit
    * this list against ParquetWriteSupport.init on any Spark bump
    * (LocalParquetSpec's byte-equivalence pin is the tripwire for
    * default-value drift; non-default values of a NEW conf are the
    * residual hole). */
  private def writeConfEntries = {
    import org.apache.spark.sql.internal.SQLConf._
    Seq(PARQUET_WRITE_LEGACY_FORMAT, PARQUET_OUTPUT_TIMESTAMP_TYPE,
      PARQUET_FIELD_ID_WRITE_ENABLED, PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      PARQUET_REBASE_MODE_IN_WRITE, PARQUET_INT96_REBASE_MODE_IN_WRITE,
      SESSION_LOCAL_TIMEZONE).map(_.key)
  }

  /** Write `rows` as ONE parquet file at `file` (created, parents too),
    * schema-faithful (empty `rows` yields a schema-bearing empty file —
    * the empty-table bootstrap shape). */
  def write(spark: SparkSession, file: Path, rows: Seq[Row],
            schema: StructType): Unit = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    writeConfEntries.foreach { k =>
      try conf.set(k, spark.conf.get(k))
      catch { case _: java.util.NoSuchElementException => () }
    }
    ParquetWriteSupport.setSchema(schema, conf)
    val codec = CompressionCodecName.valueOf(
      spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
        .toUpperCase(java.util.Locale.ROOT))
    val writer = new Builder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(codec)
      .build()
    try {
      val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      rows.foreach(r => writer.write(toCatalyst(r).asInstanceOf[InternalRow]))
    } finally writer.close()
  }
}
