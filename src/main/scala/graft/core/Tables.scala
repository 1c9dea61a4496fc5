package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided testdata tables (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] receives `(spark, sfDir)` and reads
  * through here so the read path (format, options) is centralized. At 100 TB
  * these would be partitioned/bucketed table roots rather than single files;
  * the loader is the one place that would change.
  *
  * Timestamp handling is generation-proof: driver testdata regenerations
  * have shipped `events.ts` as both TIMESTAMP(NANOS) and TIMESTAMP_MICROS
  * (the r7 incident). Rather than special-casing one column, the loader
  * reads the parquet footer and rewrites exactly the columns the file
  * declares as nano-precision (which arrive as raw longs under
  * `nanosAsLong=true`); everything else falls through untouched, so a
  * genuine long column named `ts` is never corrupted.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns the parquet footer declares as TIMESTAMP with NANOS unit.
    * Probes EVERY parquet file under the root and fails loudly when any
    * two disagree: a partially regenerated table with mixed-generation
    * part files would otherwise decide the nanos rewrite from whichever
    * file happens to be probed and silently corrupt the other
    * generation's columns (div-1000 applied to micros, or nanos left
    * unrewritten). Footers are a few KB each, so the sweep is noise next
    * to the scan itself at these fixture scales; a 100 TB deployment
    * would pin the generation in table metadata instead — this loader is
    * the one place that would change. Recurses into partition
    * subdirectories so a hive-layout table root gets the same treatment
    * as a flat file; a table with no parquet file at all fails loudly
    * rather than silently skipping the rewrite.
    */
  /** Probe results memoized per (table root, file-listing signature):
    * the footer sweep guards against cross-ROUND regenerations, but
    * within one JVM the same table is loaded hundreds of times (Bench
    * runs every query's lambda through here inside its timed window) —
    * re-opening every footer on each load would tax the very numbers
    * the bench records. The signature (path+length+mtime of every data
    * file) re-probes on any rewrite that changes a file's path, length
    * or mtime — i.e. every normal regeneration; an in-place overwrite
    * preserving all three (same-length file copied with timestamps
    * preserved inside one mtime tick) is outside the guard for the
    * life of the JVM, the standard listing-signature tradeoff. */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Set[String], Long)]()

  /** Footer-derived row count of a table — zero data pages read. The
    * same cached footer sweep that decides the nanos rewrite records
    * each file's record count, so sizing decisions (e.g. K = ⌈√N⌉
    * centroid counts) cost a metadata lookup instead of a full-corpus
    * `count()` action per query. At 100 TB the catalog would carry this
    * as table statistics; the footer sum is the file-layout equivalent. */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    probe(spark, s"$sfDir/$name.parquet")._2

  private def nanosTimestampCols(spark: SparkSession, path: String): Set[String] =
    probe(spark, path)._1

  private def probe(spark: SparkSession, path: String): (Set[String], Long) = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    def parquets(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val (dirs, files) = fs.listStatus(d)
        .filterNot(_.getPath.getName.startsWith("_"))
        .partition(_.isDirectory)
      files.filter(_.getPath.getName.endsWith(".parquet")).toSeq ++
        dirs.sortBy(_.getPath.getName).toSeq.flatMap(s => parquets(s.getPath))
    }
    def footerNanos(file: org.apache.hadoop.fs.Path): (Set[String], Long) = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val nanos = reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
          case fld if Option(fld.getLogicalTypeAnnotation).exists {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
              case _ => false
            } => fld.getName
        }.toSet
        (nanos, reader.getRecordCount)
      } finally reader.close()
    }
    val statuses =
      if (fs.getFileStatus(p).isDirectory) {
        val all = parquets(p).sortBy(_.getPath.toString)
        if (all.isEmpty) throw new IllegalStateException(
          s"no parquet file found under table root $path")
        all
      } else Seq(fs.getFileStatus(p))
    val sig = statuses.map(s =>
      s"${s.getPath}:${s.getLen}:${s.getModificationTime}").mkString("\n")
    val cached = probeCache.get(path)
    if (cached != null && cached._1 == sig) return (cached._2, cached._3)
    val probed = statuses.map(_.getPath).map(f => f -> footerNanos(f))
    if (probed.map(_._2._1).distinct.size > 1)
      throw new IllegalStateException(
        s"mixed-generation table at $path: nano-timestamp columns differ " +
          probed.map { case (f, s) => s"${f.getName}=${s._1}" }.mkString("across probed files (", " vs ", ")"))
    val rows = probed.map(_._2._2).sum
    probeCache.put(path, (sig, probed.head._2._1, rows))
    (probed.head._2._1, rows)
  }

  /** Plan-free estimate of the partition count a parquet scan of `path`
    * would get: Spark's own split-size formula (maxSplitBytes +
    * greedy split packing, `FilePartition.getFilePartitions`) evaluated
    * over the FS listing. Callers deciding "is this scan
    * under-partitioned?" use this instead of `df.rdd.getNumPartitions`,
    * which constructs (and freezes) a pre-AQE physical plan per call —
    * and AQE could not repair the decision anyway: it only
    * coalesces/splits SHUFFLE partitions, never widens a scan's. */
  def scanPartitionEstimate(spark: SparkSession, path: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    def dataFiles(d: org.apache.hadoop.fs.Path): Seq[Long] = {
      val (dirs, files) = fs.listStatus(d)
        .filterNot(_.getPath.getName.startsWith("_"))
        .partition(_.isDirectory)
      files.filterNot(_.getPath.getName.startsWith(".")).map(_.getLen).toSeq ++
        dirs.flatMap(s => dataFiles(s.getPath))
    }
    val sizes =
      (if (fs.getFileStatus(p).isDirectory) dataFiles(p)
       else Seq(fs.getFileStatus(p).getLen)).filter(_ > 0)
    if (sizes.isEmpty) return 1
    val sc = org.apache.spark.sql.internal.SQLConf.get
    val openCost = sc.filesOpenCostInBytes
    val minParts = sc.filesMinPartitionNum
      .orElse(sc.getConf(
        org.apache.spark.sql.internal.SQLConf.LEAF_NODE_DEFAULT_PARALLELISM))
      .getOrElse(spark.sparkContext.defaultParallelism)
    val bytesPerCore = sizes.map(_ + openCost).sum / math.max(minParts, 1)
    val maxSplit =
      math.min(sc.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))
    // each file yields ceil(len/maxSplit) splits costed len+openCost;
    // splits pack greedily (in descending-size file order upstream —
    // ordering only shifts the estimate by ±1 bin at these shapes)
    val splitCosts = sizes.sorted(Ordering[Long].reverse).flatMap { len =>
      val n = ((len + maxSplit - 1) / maxSplit).toInt
      (0 until n).map(i =>
        math.min(maxSplit, len - i.toLong * maxSplit) + openCost)
    }
    var bins = 0
    var cur = 0L
    splitCosts.foreach { c =>
      if (bins == 0 || cur + c > maxSplit) { bins += 1; cur = c }
      else cur += c
    }
    math.max(bins, 1)
  }

  /** [[load]] with an under-partitioning guard: a small single-file
    * corpus scans into fewer partitions than cores (the openCost floor
    * caps split fan-out) and heavy per-row work downstream would
    * serialize; spread it once. At real scale the many-file scan
    * self-partitions and this is a no-op — decided from the FS listing
    * ([[scanPartitionEstimate]]), never by materializing the scan RDD. */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val d = load(spark, sfDir, name)
    val p = spark.sparkContext.defaultParallelism
    if (scanPartitionEstimate(spark, s"$sfDir/$name.parquet") < p)
      d.repartition(p)
    else d
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // Nano-precision timestamps would otherwise fail the read outright;
    // with this flag they arrive as raw longs and are rewritten below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    // the footer probe runs UNCONDITIONALLY: gating it on "some column
    // read as a long" would let a mixed-generation table whose resolved
    // schema happens to carry no LongType slip past both the rewrite and
    // the agreement check below — the probe is a few KB of footer reads,
    // the silent-skip hole it closes blacked out 19 queries in round 7
    val nanos = nanosTimestampCols(spark, path)
    // footer/schema agreement: a footer-declared nanos column can ONLY
    // arrive as a raw long under nanosAsLong=true — anything else means
    // the probed footer and the resolved schema come from different
    // generations, which must fail loudly, not silently skip the rewrite
    nanos.foreach { c =>
      val dt = df.schema.fields.find(_.name == c).map(_.dataType)
      require(dt.contains(org.apache.spark.sql.types.LongType),
        s"$path: footer declares '$c' TIMESTAMP(NANOS) but the read schema " +
          s"resolved it as ${dt.getOrElse("<absent>")} — mixed-generation drift")
    }
    val fixed = df.schema.fields.foldLeft(df) { (d, f) =>
      if (nanos(f.name) && f.dataType == org.apache.spark.sql.types.LongType)
        // nanos → micros truncation (matches DuckDB's CAST(ts AS TIMESTAMP))
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else d
    }
    // Micros-generation parquet stores TIMESTAMP_NTZ; normalize to TIMESTAMP
    // (session TZ is UTC, so the cast is value-preserving) so downstream
    // code sees one timestamp type everywhere.
    val normalized = fixed.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(fixed)((d, c) => d.withColumn(c, d(c).cast("timestamp")))
    // The embedding contract is array<float> (the native codegen vector
    // expressions bind on it); a regeneration that ships float64 must
    // narrow at the scan, not black out the vector family at bind time.
    if (name == "embeddings")
      normalized.schema.fields.collect {
        case f if f.dataType ==
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, true) ||
          f.dataType == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, false) => f.name
      }.foldLeft(normalized)((d, c) => d.withColumn(c, d(c).cast("array<float>")))
    else normalized
  }
}
