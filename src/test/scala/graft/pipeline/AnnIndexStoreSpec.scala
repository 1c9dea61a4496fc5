package graft.pipeline

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Executor-side capture for the rebuild crash-window probe (local mode
  * shares the JVM, so a task's write is visible to the driver). */
object AnnHintProbe { @volatile var seen: String = "unread" }

/** Incremental IVF index: build partitions the corpus into centroid
  * cells, append rewrites only the touched cells, query probes only its
  * cells and matches a brute-force in-cell ranking. */
class AnnIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  // 4 blocks of 50 ids; block b's vectors point along axis b with small
  // per-id noise on the next axis — so nearest centroid == own block's
  // (centroids are ids 1, 51, 101, 151: one per block)
  private def vec(id: Long): Seq[Float] = {
    val block = (((id - 1) / 50) % 4).toInt
    val v = Array.fill(4)(0f)
    v(block) = 1f
    v((block + 1) % 4) = (id % 7).toFloat * 0.01f
    v.toSeq
  }
  private def corpus(ids: Seq[Long]) =
    ids.map(id => (id, vec(id))).toDF("vec_id", "embedding")

  test("build/append/query: cell-partitioned, O(touched-cells) appends, heap-ranked probes") {
    val root = Files.createTempDirectory("graft-ivf").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)

    // 4 centroids, every vector in its own block's cell
    assert(AtomicRewrite.read(spark, p.centroids).count() == 4)
    val cells = AtomicRewrite.read(spark, p.cells)
    assert(cells.count() == 200)
    assert(cells.filter(col("centroid_id") =!=
        floor((col("vec_id") - 1) / 50) * 50 + 1)
      .count() == 0, "every vector must land in its block's cell")

    // query a block-2 vector: neighbors are block-2 ids, ranked by cosine
    val q = Seq((103L, vec(103L))).toDF("query_id", "qv")
    val got = AnnIndexStore.query(spark, root, q, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    val expected = (101L to 150L).filter(_ != 103L)
      .map(id => id -> vec(id).zip(vec(103L)).map { case (a, b) => a * b }.sum /
        (math.sqrt(vec(id).map(x => x * x).sum) *
          math.sqrt(vec(103L).map(x => x * x).sum)))
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    assert(got == expected, s"got $got expected $expected")

    // append block-1 vectors: ONLY cell 51 restaged; cell 1 byte-untouched
    val cell1 = new java.io.File(s"${p.cells}/v=0/centroid_id=1")
    assert(cell1.exists())
    val cell1Files = cell1.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    // block-1 direction with a noise value no built vector has -> cell 51,
    // and exactly matchable by a later query
    val apVec = Seq(0f, 1f, 0.005f, 0f)
    val appendBatch = Seq((201L, apVec), (202L, apVec))
      .toDF("vec_id", "embedding")
    AnnIndexStore.append(spark, root, appendBatch)
    assert(AtomicRewrite.currentVersion(spark, p.cells).contains(1L))
    assert(!new java.io.File(s"${p.cells}/v=1/centroid_id=1").exists(),
      "untouched cell must not be restaged")
    assert(cell1.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet == cell1Files)
    assert(AtomicRewrite.read(spark, p.cells).count() == 202)

    // the appended vectors are immediately findable (exact-match cosine 1)
    val q2 = Seq((999L, apVec)).toDF("query_id", "qv")
    val found = AnnIndexStore.query(spark, root, q2, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(found.contains(201L) && found.contains(202L),
      s"appended vectors must be queryable, got $found")

    // replaying the append replaces rather than duplicates
    AnnIndexStore.append(spark, root, appendBatch)
    assert(AtomicRewrite.read(spark, p.cells).count() == 202)
    spark.catalog.clearCache()
  }

  test("fixed-K centroid build: K stays constant as the corpus doubles") {
    // explicit 16 centroids (unit axes). With centroidEvery the centroid
    // count doubles when the corpus doubles; the fixed-K path must not.
    def axis(b: Int): Seq[Float] = {
      val v = Array.fill(16)(0f); v(b) = 1f; v.toSeq
    }
    val cents = (0 until 16).map(b => (b + 1, axis(b)))
      .toDF("centroid_id", "cv")
    def vec16(id: Long): Seq[Float] = {
      val b = (((id - 1) / 25) % 16).toInt
      val v = Array.fill(16)(0f)
      v(b) = 1f
      v((b + 1) % 16) = (id % 7).toFloat * 0.01f
      v.toSeq
    }
    def corpus16(ids: Seq[Long]) =
      ids.map(id => (id, vec16(id))).toDF("vec_id", "embedding")

    val r1 = Files.createTempDirectory("graft-ivf-k1").toString + "/index"
    AnnIndexStore.build(spark, r1, corpus16(1L to 200L), cents)
    val r2 = Files.createTempDirectory("graft-ivf-k2").toString + "/index"
    AnnIndexStore.build(spark, r2, corpus16(1L to 400L), cents)
    Seq((r1, 200L), (r2, 400L)).foreach { case (r, n) =>
      val p = AnnIndexStore.Paths(r)
      assert(AtomicRewrite.read(spark, p.centroids).count() == 16,
        "centroid count must be the caller's K, not corpus-derived")
      val cells = AtomicRewrite.read(spark, p.cells)
      assert(cells.count() == n)
      assert(cells.filter(col("centroid_id") =!=
          (floor((col("vec_id") - 1) / 25) % 16 + 1)).count() == 0,
        "every vector must land in its block's cell")
    }
    // queries go through the fixed-K index unchanged
    val q = Seq((999L, vec16(30L))).toDF("query_id", "qv")
    val got = AnnIndexStore.query(spark, r2, q, k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(got.length == 1 && vec16(got.head) == vec16(30L))
    spark.catalog.clearCache()
  }

  test("trainCentroids: k-means converges onto block axes; K stable across rounds") {
    // 4 well-separated blocks: trained centroids must move toward the
    // block means, each dominated by its block's axis
    val c = corpus(1L to 200L)
    val trained = AnnIndexStore.trainCentroids(c, 4, iters = 3)
    assert(trained.count() == 4, "K must survive every round")
    val vecs = trained.select("cv").as[Seq[Float]].collect()
    // each trained centroid is dominated by exactly one axis, and all
    // 4 axes are covered (the blocks are orthogonal)
    val axes = vecs.map(v => v.indexOf(v.max)).toSet
    assert(axes == Set(0, 1, 2, 3), s"covered axes: $axes")
    // building through trained centroids yields a queryable fixed-K index
    val root = Files.createTempDirectory("graft-ivf-km").toString + "/index"
    AnnIndexStore.build(spark, root, c, trained)
    assert(AtomicRewrite.read(spark, AnnIndexStore.Paths(root).centroids)
      .count() == 4)
    val q = Seq((999L, vec(103L))).toDF("query_id", "qv")
    val got = AnnIndexStore.query(spark, root, q, k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(got.forall(id => (101L to 150L).contains(id)),
      s"neighbors must come from the query's block: ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("sampleCentroids: deterministic fixed-K draw renumbered 1..k") {
    val c = corpus(1L to 200L)
    val a = AnnIndexStore.sampleCentroids(c, 16).collect()
    val b = AnnIndexStore.sampleCentroids(c, 16).collect()
    assert(a.length == 16)
    assert(a.map(_.getInt(0)).sorted.toSeq == (1 to 16))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "same corpus must yield the same centroid draw")
    // doubling the corpus still yields exactly k centroids
    assert(AnnIndexStore.sampleCentroids(corpus(1L to 400L), 16).count() == 16)
  }

  test("quantized cells: int8 code column stored; rerank reproduces the exact float ranking") {
    val root = Files.createTempDirectory("graft-ivf-q8").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    // the code column is stored as a true int8 array
    val cellSchema = AtomicRewrite.read(spark, p.cells).schema
    assert(cellSchema.fieldNames.contains("qv8"))
    assert(cellSchema("qv8").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType),
      s"qv8 must be tinyint-encoded, got ${cellSchema("qv8").dataType}")

    // EVERY corpus vector as a query: the two-phase quantized path must
    // return exactly what brute-force float cosine ranks within the cell
    val qs = corpus(1L to 200L).toDF("query_id", "qv")
    val got = AnnIndexStore.query(spark, root, qs, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = (1L to 200L).map(id => id -> vec(id)).toMap
    def cosF(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
    (1L to 200L).foreach { q =>
      val block = (q - 1) / 50
      val expected = (block * 50 + 1 to block * 50 + 50).filter(_ != q)
        .map(id => id -> BigDecimal(cosF(all(id), all(q)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      assert(got(q) == expected, s"query $q: got ${got(q)} expected $expected")
    }
    spark.catalog.clearCache()
  }

  test("quantized probe plan: candidate scan reads codes, never embeddings") {
    // the 8x-bandwidth claim, plan-verified: the phase-1 candidate pass
    // must scan ONLY the int8 code column of the cells (embedding is
    // read by a separate scan that feeds the survivor rerank), and both
    // cell scans must prune to the probed hive partitions
    val root = Files.createTempDirectory("graft-ivf-plan").toString + "/index"
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    val q = Seq((103L, vec(103L))).toDF("query_id", "qv")
    val result = AnnIndexStore.query(spark, root, q, k = 3)
    result.collect() // materialize so the executed plan is final
    val scans = result.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).toSeq
    val codeScan = scans.find(l => l.contains("qv8") && !l.contains("embedding"))
    assert(codeScan.isDefined,
      s"phase-1 must scan qv8 WITHOUT embedding; scans:\n${scans.mkString("\n")}")
    assert(scans.forall(l => !(l.contains("qv8") && l.contains("embedding"))),
      s"no scan may read both code and embedding columns:\n${scans.mkString("\n")}")
    // rerank=0 opt-out: one-phase float path, no code column read at all
    val exact = AnnIndexStore.query(spark, root, q, k = 3, rerank = 0)
    val exactRows = exact.select("neighbor_id").as[Long].collect().toSet
    assert(exactRows == result.select("neighbor_id").as[Long].collect().toSet)
    assert(!exact.queryExecution.executedPlan.toString.contains("qv8"),
      "rerank=0 must not touch the quantized column")
    spark.catalog.clearCache()
  }

  test("pre-quantization index still queries; first append migrates it whole") {
    val root = Files.createTempDirectory("graft-ivf-legacy").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    // strip qv8 to simulate an index built before quantized cells
    AtomicRewrite.write(spark, p.cells,
      AtomicRewrite.read(spark, p.cells).drop("qv8"),
      partitionBy = Seq("centroid_id"))
    val q = Seq((103L, vec(103L))).toDF("query_id", "qv")
    val legacy = AnnIndexStore.query(spark, root, q, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    // first append migrates the whole table to quantized cells once
    AnnIndexStore.append(spark, root,
      Seq((201L, Seq(0f, 1f, 0.005f, 0f))).toDF("vec_id", "embedding"))
    assert(AtomicRewrite.read(spark, p.cells).columns.contains("qv8"))
    assert(AtomicRewrite.read(spark, p.cells).filter(col("qv8").isNull).count() == 0,
      "migration must quantize every existing row")
    val after = AnnIndexStore.query(spark, root, q, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(after == legacy, "migration must not change query results")
    spark.catalog.clearCache()
  }

  test("forget: erased ids unretrievable, untouched cells byte-identical, emptied cell vanishes") {
    val root = Files.createTempDirectory("graft-ivf-forget").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    val v0 = AtomicRewrite.currentVersion(spark, p.cells).get

    // ids nobody holds: a no-op forget must burn no version
    AnnIndexStore.forget(spark, root, Seq(9999L).toDF("vec_id"))
    assert(AtomicRewrite.currentVersion(spark, p.cells).contains(v0),
      "forgetting absent ids must not commit a version")

    // bystander cells' files must never be restaged
    def files(cell: Int) = {
      val d = new java.io.File(s"${p.cells}/v=$v0/centroid_id=$cell")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val (c51, c151) = (files(51), files(151))

    // forget id 3 (cell 1 partial) + ALL of block 2 (cell 101 empties)
    val gone = Seq(3L) ++ (101L to 150L)
    AnnIndexStore.forget(spark, root, gone.toDF("vec_id"))
    val v1 = AtomicRewrite.currentVersion(spark, p.cells).get
    assert(v1 == v0 + 1, "one forget = one commit")
    // only the touched cell was staged in the new version
    val staged = new java.io.File(s"${p.cells}/v=$v1").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSet
    assert(staged == Set("centroid_id=1"), s"staged $staged")
    assert(files(51) == c51 && files(151) == c151,
      "untouched cells' files were rewritten")

    val cells = AtomicRewrite.read(spark, p.cells)
    assert(cells.count() == 200 - gone.size)
    assert(cells.join(gone.toDF("vec_id"), Seq("vec_id"), "left_semi").count() == 0,
      "no derived trace of a forgotten id may survive")
    assert(cells.filter(col("centroid_id") === 101).count() == 0,
      "the emptied cell must vanish from the manifest")

    // an erased vector is unretrievable: the block-2 probe finds nothing
    val q2 = Seq((999L, vec(103L))).toDF("query_id", "qv")
    assert(AnnIndexStore.query(spark, root, q2, k = 3).isEmpty,
      "erased block must return no neighbors")
    // survivors' rankings are unchanged (block 3 forgot nobody)
    val q3 = Seq((998L, vec(153L))).toDF("query_id", "qv")
    val got = AnnIndexStore.query(spark, root, q3, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    val expected = (151L to 200L)
      .map(id => id -> vec(id).zip(vec(153L)).map { case (a, b) => a * b }.sum /
        (math.sqrt(vec(id).map(x => x * x).sum) *
          math.sqrt(vec(153L).map(x => x * x).sum)))
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    assert(got == expected, s"survivor ranking changed: got $got expected $expected")

    // deleted-then-reingested: a re-append of an erased id is accepted
    AnnIndexStore.append(spark, root, corpus(Seq(103L)))
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("vec_id") === 103L).count() == 1)
    spark.catalog.clearCache()
  }

  test("forget is O(subject): vecmap-pruned discovery — bystander cells' pages never read") {
    val root = Files.createTempDirectory("graft-ivf-osub").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    // the map covers a fresh build; subject = id 3 (cell 1)
    import spark.implicits._
    val subjBucket = AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 3L).select("vec_bucket").as[Int].head()
    // the brutal proof: smash every cells data page OUTSIDE cell 1 and
    // every vecmap data page OUTSIDE the subject's hash bucket. The old
    // O(index) discovery semi-join — or any unpruned vecmap read —
    // would throw on the smashed pages.
    smashParquet(p.cells, keepDirs = Set("centroid_id=1"))
    smashParquet(p.vecmap, keepDirs = Set(s"vec_bucket=$subjBucket"))
    val matched = AnnIndexStore.forgetMatched(spark, root, Seq(3L).toDF("vec_id"))
    assert(matched.map(_.asInstanceOf[Long]).toSet == Set(3L))
    // the subject really is gone (partition-pruned read — bystanders
    // stay smashed) and the map row went with it
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("centroid_id") === 1 && col("vec_id") === 3L).isEmpty)
    assert(AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_bucket") === subjBucket && col("vec_id") === 3L).isEmpty)
    // a completed forget re-marks coverage at the new cells version
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    spark.catalog.clearCache()
  }

  test("coverage discipline: appends extend the proof; a legacy/stale map falls back, maintain heals") {
    val root = Files.createTempDirectory("graft-ivf-cov").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    import spark.implicits._
    // an append keeps the map covering: the appended id is pruned-
    // forgettable (bystander pages smashed) right after
    AnnIndexStore.append(spark, root,
      Seq((201L, Seq(0f, 1f, 0.005f, 0f))).toDF("vec_id", "embedding"))
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells),
      "an append on a covered index must re-mark the proof")
    val b201 = AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 201L).select("vec_bucket").as[Int].head()
    smashParquet(p.cells, keepDirs = Set("centroid_id=51"))
    smashParquet(p.vecmap, keepDirs = Set(s"vec_bucket=$b201"))
    assert(AnnIndexStore.forget(spark, root, Seq(201L).toDF("vec_id")))
    spark.catalog.clearCache()

    // a STALE hint (crash-shaped history) must NOT be trusted: with
    // bystander pages still smashed, the fallback full-scan discovery
    // throws — proof the pruned path is gated on the proof, not on the
    // map's mere existence
    AtomicRewrite.writeHint(spark, s"$root/vecmap_covers", -1L)
    intercept[org.apache.spark.SparkException] {
      AnnIndexStore.forget(spark, root, Seq(5L).toDF("vec_id"))
    }
    spark.catalog.clearCache()

    // maintain heals: rebuild the fixture un-smashed, simulate the
    // legacy store (no map, no hint) — forget still works (full scan),
    // then ONE maintain backfills the map and the pruned path returns
    val root2 = Files.createTempDirectory("graft-ivf-cov2").toString + "/index"
    val p2 = AnnIndexStore.Paths(root2)
    AnnIndexStore.build(spark, root2, corpus(1L to 200L), centroidEvery = 50)
    val fs = new org.apache.hadoop.fs.Path(p2.vecmap)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p2.vecmap), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root2/vecmap_covers"), false)
    assert(AnnIndexStore.forget(spark, root2, Seq(3L).toDF("vec_id")),
      "a pre-vecmap index must still erase via the full-scan fallback")
    AnnIndexStore.maintain(spark, root2)
    assert(AtomicRewrite.readHint(spark, s"$root2/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p2.cells))
    val b5 = AtomicRewrite.read(spark, p2.vecmap)
      .filter(col("vec_id") === 5L).select("vec_bucket").as[Int].head()
    smashParquet(p2.cells, keepDirs = Set("centroid_id=1"))
    smashParquet(p2.vecmap, keepDirs = Set(s"vec_bucket=$b5"))
    assert(AnnIndexStore.forget(spark, root2, Seq(5L).toDF("vec_id")))
    spark.catalog.clearCache()
  }

  test("an append crashed between its vecmap and cells commits stays erasable and heals") {
    val root = Files.createTempDirectory("graft-ivf-awin").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    import spark.implicits._
    // simulate append's one crash window exactly as it stages it: the
    // batch's vecmap intent row committed, the cells commit never
    // happens. The hint still matches (the crash didn't bump cells), and
    // that is SOUND: the map is a superset — it names the cell where the
    // vector WOULD land (immutable-cell contract), never misses one.
    val hintBefore = AtomicRewrite.readHint(spark, s"$root/vecmap_covers")
    val vm = AtomicRewrite.read(spark, p.vecmap)
    val intent = Seq((777L, 51))
      .toDF("vec_id", "centroid_id")
      .withColumn("vec_bucket", pmod(xxhash64(col("vec_id")), lit(16L)).cast("int"))
    AtomicRewrite.write(spark, p.vecmap, vm.unionByName(intent),
      partitionBy = Seq("vec_bucket"))
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") == hintBefore,
      "fixture: the crash window leaves the coverage hint untouched")
    // a GDPR erasure of the crashed id still lands: no cells row to
    // delete, but the map row (derived from the subject's embedding)
    // must be audited and erased
    val matched = AnnIndexStore.forgetMatched(spark, root, Seq(777L).toDF("vec_id"))
    assert(matched.map(_.asInstanceOf[Long]).toSet == Set(777L),
      "an intent-only id must still be audited and erased")
    assert(AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 777L).isEmpty)
    // and a surviving id is still pruned-erasable afterwards — the
    // window never broke the proof
    val b3 = AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 3L).select("vec_bucket").as[Int].head()
    smashParquet(p.cells, keepDirs = Set("centroid_id=1"))
    smashParquet(p.vecmap, keepDirs = Set(s"vec_bucket=$b3"))
    assert(AnnIndexStore.forget(spark, root, Seq(3L).toDF("vec_id")))
    spark.catalog.clearCache()
  }

  test("a rebuild breaks the coverage proof before its first write (crash discipline)") {
    val root = Files.createTempDirectory("graft-ivf-bw").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    // probe the hint DURING a rebuild (the IndexStoreSpec idiom): the
    // corpus is first evaluated inside the cells-write job, which runs
    // BEFORE the vecmap commit — exactly the crash window. A stale
    // covering hint surviving to that point would vouch for a map whose
    // cells moved under it.
    val hintFile = s"$root/vecmap_covers"
    AnnHintProbe.seen = "unread"
    val base = corpus(1L to 200L)
    val probed = spark.createDataFrame(
      base.rdd.map { r =>
        AnnHintProbe.seen = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(hintFile))).trim
        r
      }, base.schema)
    AnnIndexStore.build(spark, root, probed, centroidEvery = 50)
    assert(AnnHintProbe.seen == "-1",
      s"coverage hint read '${AnnHintProbe.seen}' during the rebuild's " +
        "cells write — a crash in that window would leave a false proof")
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    // simulate the rebuild crash window exactly where build stages it:
    // hint broken at entry (what the fixed build does), new centroids +
    // cells committed, the vecmap write never happens — the map now
    // points at cells that moved. The STALE hint must read broken so
    // forget full-scans instead of trusting the wrong map.
    // Observable without injection: retrain() reassigns cells with NEW
    // centroids; interrupt it by checking the hint right after a manual
    // break — then prove a broken-hint forget ignores the (wrong) map.
    graft.tx.AtomicRewrite.writeHint(spark, s"$root/vecmap_covers", -1L)
    import spark.implicits._
    // corrupt the map on purpose: point id 3 at a cell it never lived in
    val wrong = AtomicRewrite.read(spark, p.vecmap)
      .withColumn("centroid_id",
        when(col("vec_id") === 3L, lit(151)).otherwise(col("centroid_id")))
    AtomicRewrite.write(spark, p.vecmap, wrong, partitionBy = Seq("vec_bucket"))
    // broken hint ⟹ full-scan discovery ⟹ the erase still lands
    assert(AnnIndexStore.forget(spark, root, Seq(3L).toDF("vec_id")))
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("vec_id") === 3L).isEmpty,
      "a broken-proof forget must not trust the corrupted map")
    // and retrain (a full rebuild) re-derives the map and the proof
    AnnIndexStore.retrain(spark, root, k = 4, iters = 1)
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    assert(AtomicRewrite.read(spark, p.vecmap)
      .join(AtomicRewrite.read(spark, p.cells)
        .select(col("vec_id"), col("centroid_id").as("__c")), Seq("vec_id"))
      .filter(col("centroid_id") =!= col("__c")).isEmpty,
      "after rebuild every map row must name its vec's actual cell")
    spark.catalog.clearCache()
  }

  test("retrain after forget: no centroid remains a raw corpus vector; index stays queryable") {
    val root = Files.createTempDirectory("graft-ivf-rt").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    // centroidEvery copies RAW corpus vectors (ids 1,51,101,151) into the
    // centroid table — the GDPR caveat retrain exists to close
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    val rawCentroid = vec(51L)
    assert(AtomicRewrite.read(spark, p.centroids)
      .filter(col("cv") === typedLit(rawCentroid)).count() == 1,
      "precondition: centroid 51 IS subject 51's raw embedding")

    AnnIndexStore.forget(spark, root, Seq(51L).toDF("vec_id"))
    AnnIndexStore.retrain(spark, root, k = 4, iters = 2)

    // the subject's embedding no longer exists anywhere in the index —
    // not as a cell row (forget) and not as a cluster center (retrain:
    // every centroid is now a mean over the surviving corpus)
    val cents = AtomicRewrite.read(spark, p.centroids)
    assert(cents.count() == 4)
    assert(cents.filter(col("cv") === typedLit(rawCentroid)).count() == 0,
      "a raw subject vector must not survive as a cluster center")
    val cells = AtomicRewrite.read(spark, p.cells)
    assert(cells.count() == 199 &&
      cells.filter(col("vec_id") === 51L).count() == 0)

    // the rebuilt index answers queries with block-correct neighbors
    val got = AnnIndexStore.query(spark, root,
      Seq((999L, vec(103L))).toDF("query_id", "qv"), k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(got.length == 3 && got.forall(id => (101L to 150L).contains(id)),
      s"neighbors must come from the query's block: ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("bulk-subject forget (> MaxInlinedPartitionTerms cells) stays pruned — bystander pages never read") {
    // the regulatory-erasure shape: a banned SOURCE, not one user — the
    // subject spans more cells than the inlined-literal ceiling, where
    // the pre-r15 path abandoned the prune and full-scan discovery
    // would read (and here, throw on) every bystander page. The store
    // layout is staged through the store's own writers; geometry is
    // irrelevant to forget, so one tiny vector per cell keeps the
    // fixture wide (4200+ hive partitions) but small.
    val root = Files.createTempDirectory("graft-ivf-bulk").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    val nSubject = AtomicRewrite.MaxInlinedPartitionTerms + 104 // 4200 cells
    val nBystander = 60
    val all = (1 to nSubject + nBystander)
      .map(i => (i.toLong, Seq(1f, 0f), i)).toDF("vec_id", "embedding", "centroid_id")
    AtomicRewrite.write(spark, p.cells, all, partitionBy = Seq("centroid_id"))
    AtomicRewrite.write(spark, p.vecmap,
      all.select(col("vec_id"), col("centroid_id"))
        .withColumn("vec_bucket",
          pmod(xxhash64(col("vec_id")), lit(16L)).cast("int")),
      partitionBy = Seq("vec_bucket"))
    AtomicRewrite.writeHint(spark, s"$root/vecmap_covers",
      AtomicRewrite.currentVersion(spark, p.cells).get)
    val v0 = AtomicRewrite.currentVersion(spark, p.cells).get
    def bystanderFiles() = {
      val d = new java.io.File(s"${p.cells}/v=$v0/centroid_id=${nSubject + 7}")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    // the brutal proof: every bystander cell's pages smashed — any
    // unpruned discovery or O(table) rewrite fallback would throw.
    // (Baseline captured AFTER the smash: smashing itself rewrites the
    // bystander bytes; the claim is that the FORGET never restages them.)
    smashParquet(p.cells,
      keepDirs = (1 to nSubject).map(i => s"centroid_id=$i").toSet)
    val before = bystanderFiles()
    val subject = (1 to nSubject).map(_.toLong).toDF("vec_id")
    assert(AnnIndexStore.forget(spark, root, subject))
    assert(AtomicRewrite.currentVersion(spark, p.cells).contains(v0 + 1),
      "one bulk forget = one cells commit")
    // every subject cell emptied and gone from the manifest (pruned
    // reads — bystanders stay smashed); bystander files byte-untouched
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("centroid_id") === 1 || col("centroid_id") === nSubject)
      .isEmpty)
    assert(bystanderFiles() == before,
      "bystander cells' files were restaged by a bulk forget")
    assert(AtomicRewrite.read(spark, p.vecmap).count() == nBystander.toLong,
      "every subject map row must be erased with its cells row")
    // a completed bulk forget re-marks coverage at the new cells version
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    spark.catalog.clearCache()
  }

  test("maintain audit: restores erasability after a contract violation; purges orphan intent rows") {
    val root = Files.createTempDirectory("graft-ivf-audit").toString + "/index"
    val p = AnnIndexStore.Paths(root)
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    import spark.implicits._
    // CONTRACT VIOLATION: re-append id 3 with an embedding that moves it
    // from cell 1 to cell 51 — append replaces within the TOUCHED cells
    // only, so the old cells row strands while the map row repoints
    AnnIndexStore.append(spark, root,
      Seq((3L, Seq(0f, 1f, 0.005f, 0f))).toDF("vec_id", "embedding"))
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("vec_id") === 3L).count() == 2,
      "fixture: the violation must strand the old cells row")
    // the blast radius the backstop exists for: a covered forget misses
    // the stranded row yet reports the id erased, and re-marks coverage
    // over the now-false invariant
    val matched = AnnIndexStore.forgetMatched(spark, root, Seq(3L).toDF("vec_id"))
    assert(matched.map(_.asInstanceOf[Long]).toSet == Set(3L))
    val stranded = AtomicRewrite.read(spark, p.cells).filter(col("vec_id") === 3L)
    assert(stranded.count() == 1 &&
      stranded.select("centroid_id").as[Int].head() == 1,
      "fixture: the covered forget must have missed the stranded row")
    // an orphan intent row on top (an append that crashed after its
    // vecmap commit and was never replayed)
    val vm = AtomicRewrite.read(spark, p.vecmap)
    AtomicRewrite.write(spark, p.vecmap, vm.unionByName(
      Seq((888L, 51)).toDF("vec_id", "centroid_id")
        .withColumn("vec_bucket",
          pmod(xxhash64(col("vec_id")), lit(16L)).cast("int"))),
      partitionBy = Seq("vec_bucket"))
    // the version-keyed default CANNOT see either state — the map
    // looks covering, so maintain is a no-op and both rows persist
    AnnIndexStore.maintain(spark, root)
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("vec_id") === 3L).count() == 1)
    assert(AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 888L).count() == 1)
    // the AUDIT backfill re-derives the map FROM the cells: the
    // stranded row regains a map row naming its cell, the orphan
    // (backed by no cells row) is purged
    AnnIndexStore.maintain(spark, root, audit = true)
    assert(AtomicRewrite.read(spark, p.vecmap)
      .filter(col("vec_id") === 888L).isEmpty,
      "audit must purge intent rows no cells row backs")
    assert(AnnIndexStore.forget(spark, root, Seq(3L).toDF("vec_id")),
      "after the audit the stranded row must be erasable again")
    assert(AtomicRewrite.read(spark, p.cells)
      .filter(col("vec_id") === 3L).isEmpty)
    assert(AtomicRewrite.readHint(spark, s"$root/vecmap_covers") ==
      AtomicRewrite.currentVersion(spark, p.cells))
    spark.catalog.clearCache()
  }

  test("nprobe=2 reaches a second cell when the query sits between blocks") {
    val root = Files.createTempDirectory("graft-ivf2").toString + "/index"
    AnnIndexStore.build(spark, root, corpus(1L to 200L), centroidEvery = 50)
    // between block 0 and block 1, slightly closer to 0
    val qv = Seq(1.0f, 0.9f, 0f, 0f)
    val q = Seq((999L, qv)).toDF("query_id", "qv")
    val one = AnnIndexStore.query(spark, root, q, k = 50, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    val two = AnnIndexStore.query(spark, root, q, k = 200, nprobe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(one.forall(_ <= 50), "nprobe=1 stays in the nearest cell")
    assert(two.exists(_ > 50) && two.exists(_ <= 50),
      "nprobe=2 must reach the second cell")
    spark.catalog.clearCache()
  }
}
