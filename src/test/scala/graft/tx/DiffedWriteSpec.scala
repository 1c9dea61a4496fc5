package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[AtomicRewrite.writePartitionsDiffed]] — the sidecar-backed diff:
  * O(buckets) committed-side reads, null-hardened signatures, the full
  * StructType schema gate, and null partition keys. */
object DiffedWriteSpec {
  /** Shared across task closures (local mode: one JVM) so each
    * EVALUATION of the nondeterministic test frame yields fresh values. */
  val tick = new java.util.concurrent.atomic.AtomicLong(0)
}

class DiffedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-diffed").toString + "/t"

  /** All committed parquet DATA files under root — every *.parquet
    * outside the _sigs sidecar dirs. */
  private def dataFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) {
        if (f.getName == "_sigs") Nil
        else f.listFiles().toSeq.flatMap(walk)
      } else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(root))
  }

  test("no-change commit is a no-op that never opens committed data files") {
    val root = tmpRoot()
    def df = Seq((0, 1L, "a"), (0, 2L, "b"), (1, 3L, "c"))
      .toDF("b", "k", "v")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, df, "b"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
    // the brutal proof that the diff reads ONLY the sidecar: make every
    // committed data file unreadable garbage. A diff that opened any of
    // them would throw; the sidecar diff must still conclude "unchanged"
    val files = dataFiles(root)
    assert(files.nonEmpty)
    files.foreach(f => Files.write(f.toPath, "garbage".getBytes))
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, df, "b"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
  }

  test("changed partitions rewrite; unchanged ride by reference") {
    val root = tmpRoot()
    val v0 = Seq((0, 1L, "a"), (1, 2L, "b"), (2, 3L, "c")).toDF("b", "k", "v")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v0, "b"))
    val before = dataFiles(root).map(f => f.getPath -> f.lastModified).toMap
    // change partition 1 only; drop partition 2
    val v1 = Seq((0, 1L, "a"), (1, 2L, "B2")).toDF("b", "k", "v")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    assert(AtomicRewrite.read(spark, root).select("b", "k", "v")
      .as[(Int, Long, String)]
      .collect().toSet == Set((0, 1L, "a"), (1, 2L, "B2")))
    // partition 0's committed file is byte-untouched (ride by reference)
    val after = dataFiles(root).map(f => f.getPath -> f.lastModified).toMap
    val b0 = before.keys.filter(_.contains("b=0"))
    assert(b0.nonEmpty && b0.forall(p => after.get(p).contains(before(p))))
    // a third, identical commit is a full no-op
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
  }

  test("same-typed NULL column migration is detected as moved") {
    val root = tmpRoot()
    // the adversarial case for a naive xxhash64(cols): Spark skips NULL
    // children without advancing the seed, so (x=5, y=NULL) and
    // (x=NULL, y=5) hash identically — count unchanged, sum unchanged —
    // and the OLD recipe declared the partition unmoved and served the
    // stale rows. The null-marker interleave makes them distinct.
    val v0 = Seq((0, Some(5), None: Option[Int])).toDF("b", "x", "y")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v0, "b"))
    val v1 = Seq((0, None: Option[Int], Some(5))).toDF("b", "x", "y")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"),
      "value migration between same-typed columns must commit")
    assert(AtomicRewrite.read(spark, root).select("b", "x", "y")
      .as[(Int, Option[Int], Option[Int])].collect().toSeq ==
      Seq((0, None, Some(5))))
  }

  test("type-only schema evolution snapshots in full, never a mixed manifest") {
    val root = tmpRoot()
    val v0 = Seq((0, 1), (1, 2)).toDF("b", "v")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v0, "b"))
    // same column NAMES, widened type int -> long, identical values: a
    // names-only gate would diff and could carry old-typed partitions
    // by reference into a mixed-schema table
    val v1 = Seq((0, 1L), (1, 2L)).toDF("b", "v")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
    val read = AtomicRewrite.read(spark, root)
    assert(read.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    // full rewrite: every partition dir exists under the NEW version
    val newDir = new java.io.File(s"$root/v=1")
    assert(Seq("b=0", "b=1").forall(d => new java.io.File(newDir, d).exists()))
    assert(read.select("b", "v").as[(Int, Long)].collect().toSet ==
      Set((0, 1L), (1, 2L)))
  }

  test("a NULL partition key replaces without silent data loss") {
    val root = tmpRoot()
    val v0 = Seq((Some("a"), 1L), (None: Option[String], 2L)).toDF("b", "k")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v0, "b"))
    // only the null-keyed partition's content changes: plain isin-based
    // membership would DROP the null rows from the staged frame while
    // the replaced set deleted the old dir — silent loss
    val v1 = Seq((Some("a"), 1L), (None: Option[String], 99L)).toDF("b", "k")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
    assert(AtomicRewrite.read(spark, root).select("b", "k")
      .as[(Option[String], Long)]
      .collect().toSet == Set((Some("a"), 1L), (None, 99L)))
    // and the "a" partition rode by reference (only null moved)
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
  }

  test("an unmoved NULL-keyed partition's signature carries through a diff") {
    val root = tmpRoot()
    val v0 = Seq((Some("a"), 1L), (None: Option[String], 2L)).toDF("b", "k")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v0, "b"))
    // only the "a" partition moves; the NULL-keyed one rides by
    // reference — its carried sidecar row must survive the moved-set
    // negation (isin yields NULL, not false, for a NULL key; a non-
    // null-safe not() would drop the row and every later diff would
    // spuriously re-rewrite the null partition)
    val v1 = Seq((Some("a"), 99L), (None: Option[String], 2L)).toDF("b", "k")
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"))
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, v1, "b"),
      "identical republish must no-op — the null partition's carried " +
        "signature vanished from the sidecar")
  }

  test("the sidecar describes committed bytes, never a re-evaluation of the input") {
    val root = tmpRoot()
    // a frame whose every EVALUATION differs (an RDD closure over a
    // shared counter — local-mode tasks share the JVM): the diff/write
    // evaluate the input independently, so a sidecar hashed from the
    // input would describe a DIFFERENT evaluation than the files on
    // disk — a lie with a valid recipe stamp that never heals
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    def nondet = spark.createDataFrame(
      spark.sparkContext.parallelize(0 until 3, 1).map(i =>
        org.apache.spark.sql.Row(i, DiffedWriteSpec.tick.incrementAndGet())),
      schema)
    def committedReplay(): org.apache.spark.sql.DataFrame = {
      val cur = AtomicRewrite.read(spark, root).select("b", "k")
      AtomicRewrite.literalFrame(spark, cur.collect().toSeq, cur.schema)
    }
    // full-snapshot path: first publish, then replay the committed bytes
    AtomicRewrite.writePartitionsDiffed(spark, root, nondet, "b")
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, committedReplay(), "b"),
      "replaying the committed bytes after a full snapshot must no-op")
    // moved path: every partition's k changes, gets rewritten, and the
    // new sidecar must again describe what actually landed
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, nondet, "b"))
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, committedReplay(), "b"),
      "replaying the committed bytes after a diffed publish must no-op")
  }

  test("a wide diff (> MaxInlinedPartitionTerms moved) stays sliced — unmoved partitions ride by reference") {
    // the r15 doctrine: a single partition column's moved-set predicate
    // is one IN→InSet at any realistic width, so a wide epoch diff
    // (4200 moved partitions here) must commit a PARTITION-LEVEL
    // rewrite — unmoved dirs byte-identical under the new manifest —
    // instead of the pre-r15 full-snapshot fallback that restaged (and
    // re-hashed) every unmoved partition too
    val root = tmpRoot()
    val nMoved = AtomicRewrite.MaxInlinedPartitionTerms + 104 // 4200
    val nStill = 60
    def frame(salt: String) =
      spark.range(nMoved + nStill).select(
        col("id").cast("int").as("p"),
        when(col("id") < nMoved, concat(lit("v"), lit(salt)))
          .otherwise(lit("const")).as("v"))
    assert(AtomicRewrite.writePartitionsDiffed(spark, root, frame("a"), "p"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
    def stillFiles() = {
      val d = new java.io.File(s"$root/v=0/p=${nMoved + 7}")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before = stillFiles()
    assert(before.nonEmpty)
    val moved = AtomicRewrite.writePartitionsDiffedMoved(
      spark, root, frame("b"), "p")
    assert(moved.isDefined && moved.get.size == nMoved,
      s"a wide diff must stay sliced (Some(4200 moved)), got " +
        s"${moved.map(_.size)} — None means the full-snapshot fallback ran")
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    // only the moved partitions were staged in v=1; the unmoved dirs'
    // v=0 files are byte-untouched and ride the new manifest
    assert(!new java.io.File(s"$root/v=1/p=${nMoved + 7}").exists(),
      "an unmoved partition must not be restaged by a wide diff")
    assert(stillFiles() == before, "unmoved partition files were rewritten")
    val got = AtomicRewrite.read(spark, root)
    assert(got.count() == (nMoved + nStill).toLong)
    assert(got.filter(col("p") === 0 && col("v") === "vb").count() == 1)
    assert(got.filter(col("p") === nMoved && col("v") === "const").count() == 1)
    // and the new sidecar is honest: a third commit with the same
    // content is a full no-op over carried + rehashed signatures
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, frame("b"), "p"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    spark.catalog.clearCache()
  }

  test("legacy table without a sidecar: one recompute heals it in place") {
    val root = tmpRoot()
    val df = Seq((0, 1L), (1, 2L)).toDF("b", "k")
    // a pre-sidecar table: committed through writePartitions directly
    AtomicRewrite.writePartitions(spark, root, df, Seq("b"))
    assert(!new java.io.File(s"$root/v=0/_sigs_schema").exists())
    // identical content: no version burns, and the recomputed committed
    // signatures persist into the CURRENT version dir so the next diff
    // is O(buckets)
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, df, "b"))
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
    assert(new java.io.File(s"$root/v=0/_sigs_schema").exists())
    // sidecar now authoritative: corrupt the data files, identical
    // re-commit still no-ops without opening them
    dataFiles(root).foreach(f => Files.write(f.toPath, "garbage".getBytes))
    assert(!AtomicRewrite.writePartitionsDiffed(spark, root, df, "b"))
  }
}
