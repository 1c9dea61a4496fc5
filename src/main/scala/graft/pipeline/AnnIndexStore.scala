package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental IVF index — the production shape of similarity
  * search over a growing corpus (the [[DedupStore]] analog for ANN):
  * centroids + cell assignments live in graft tables, new batches
  * append by rewriting ONLY the cells they land in, and queries read
  * ONLY the cells they probe.
  *
  * Layout:
  * {{{
  *   <root>/centroids   // K rows: centroid_id, cv  (full snapshot)
  *   <root>/cells       // vec_id, embedding, centroid_id — hive-
  *                      // partitioned by centroid_id, partition-committed
  *   <root>/vecmap      // vec_id, centroid_id — the narrow per-key cell
  *                      // record, partitioned by vec_bucket =
  *                      // pmod(xxhash64(vec_id), VecBuckets). What makes
  *                      // [[forget]] O(subject): the subject ids' cells
  *                      // are read from their hash-pruned vecmap buckets
  *                      // instead of a discovery scan of the whole cells
  *                      // table (the [[IndexStore]] docstats pattern,
  *                      // radically simpler here because a vec's cell is
  *                      // IMMUTABLE — same embedding, same centroids ⟹
  *                      // same argmax — so entries are write-once, with
  *                      // no accreted upper bound and no shrink pass)
  * }}}
  *
  * Scale: assignment is a narrow map against K broadcast centroids
  * (max_by argmax — no window over the corpus). An append commits
  * O(touched cells) bytes while the index holds O(corpus); a probe
  * reads O(probed cells) — both from the `_PARTS` manifest + hive
  * partition pruning, the same machinery as the fact tables. Ranking
  * runs through [[graft.plans.TopKPerKey]] (bounded heaps, no
  * per-query sort).
  *
  * Constraint (shared with every IVF index): a vec_id's embedding is
  * immutable — re-appending the same id replaces it within its cell,
  * but an embedding CHANGE that moves the vector to a different cell
  * would strand the old row (delete + append instead). The vecmap
  * coverage proof leans on the same contract: a violating re-append
  * repoints the id's map row at the new cell, so the stranded old row
  * would also hide from a map-pruned [[forget]] — the violation's
  * blast radius, not a new obligation (the stranded row is already
  * unreachable to replacement and retained forever without it).
  */
object AnnIndexStore {

  case class Paths(root: String) {
    val centroids: String = s"$root/centroids"
    val cells: String = s"$root/cells"
    val vecmap: String = s"$root/vecmap"
  }

  /** Vec-id-hash partition count of the narrow vecmap table. */
  val VecBuckets = 16

  private def vecBucketOf(id: Column): Column =
    pmod(xxhash64(id), lit(VecBuckets.toLong)).cast("int")

  /** The COVERAGE proof: the cells version up to which every committed
    * cells row has a vecmap row naming its cell — written by [[build]],
    * [[maintain]]'s backfill, and at the END of an append/forget that
    * found it covering (both preserve coverage: append commits the
    * batch's vecmap rows BEFORE its cells rows, and deletions remove
    * cells rows before their vecmap rows). Hint == cells current
    * version ⟹ [[forget]] may prune its cells discovery to the subject
    * ids' vecmap cells, and an id absent from vecmap has no cells row.
    * Missing/stale/garbled all read as "not covering" — the full-scan
    * discovery fallback is always sound, and [[maintain]] heals by one
    * narrow backfill. Never a correctness input
    * ([[AtomicRewrite.readHint]]). */
  private def coversAt(spark: SparkSession, root: String): Option[Long] =
    AtomicRewrite.readHint(spark, s"$root/vecmap_covers")

  private def markCovers(spark: SparkSession, root: String, v: Long): Unit =
    AtomicRewrite.writeHint(spark, s"$root/vecmap_covers", v)

  private def breakCovers(spark: SparkSession, root: String): Unit =
    AtomicRewrite.writeHint(spark, s"$root/vecmap_covers", -1L)

  /** The narrow (vec_id, centroid_id, vec_bucket) frame of an
    * assignment. */
  private def vecmapOf(asg: DataFrame): DataFrame =
    asg.select(col("vec_id"), col("centroid_id"))
      .withColumn("vec_bucket", vecBucketOf(col("vec_id")))

  /** Cosine rounded to 6 digits — the same convention as every vector
    * oracle, so argmax/ranking ties resolve identically across engines. */
  private def cos(a: Column, b: Column): Column =
    round(graft.functions.GraftFunctions.cosine(a, b), 6)

  /** Int8 code column stored beside the exact embedding in every cell:
    * symmetric max-abs quantization, tinyint storage. The candidate pass
    * of a probe scans ONLY this column — ~8× less bandwidth than the
    * float32 embedding at 100 TB — and the exact embedding is read just
    * for the rerank survivors. */
  private def code(e: Column): Column =
    graft.ops.VectorOps.quantizeInt8(e).cast("array<tinyint>")

  /** Rerank window floor: the quantized prefilter keeps at least this
    * many candidates per query before the exact rerank. Int8 cosine
    * error on unit-scale embeddings is ~1e-2; re-ranking the top-3 from
    * 32 quantized candidates reproduces the exact ranking on the oracle
    * corpora at both test scales. */
  val RerankFloor = 32

  /** Nearest-centroid assignment (argmax; ties → lowest id) as a NARROW
    * MAP: the K centroids pack into ONE broadcast row and each corpus
    * row takes `array_max` over (cos, −id) structs — the same
    * (cos DESC, id ASC) order the previous `groupBy(vec_id).max_by`
    * argmax used, WITHOUT the corpus-wide exchange that groupBy paid on
    * every call (train rounds, build, append all ride this). Input
    * contract: one row per vec_id — the IVF key; [[append]]
    * canonicalizes at-least-once batches before assigning, and every
    * other caller feeds a keyed corpus. `cents` must be non-empty
    * (every caller's build/train contract). */
  private def assign(df: DataFrame, cents: DataFrame): DataFrame = {
    val packed = packedCentroids(df.sparkSession, cents)
    df.crossJoin(broadcast(packed))
      // the struct carries the id twice: negated for the (cos DESC,
      // id ASC) max ordering, verbatim as the payload — so the output
      // keeps the centroid_id's exact type (the legacy centroidEvery
      // path keys centroids by long vec_ids)
      .withColumn("__best", array_max(transform(col("__cents"),
        c => struct(cos(col("embedding"), c.getField("cv")).as("c"),
          (-c.getField("centroid_id")).as("ni"),
          c.getField("centroid_id").as("id")))))
      .select(col("vec_id"), col("embedding"),
        col("__best").getField("id").as("centroid_id"))
  }

  /** The K (centroid_id, cv) rows packed into ONE local-relation row —
    * the broadcast side of [[assign]]. Collected on the DRIVER and
    * inlined as a LocalRelation (one row, an array of K structs): a
    * local relation broadcasts without a scheduled job, where a
    * `collect_list` aggregate inside the broadcast exchange paid one
    * job per assign. For literal-frame cents (every train round) the
    * collect itself is also job-free (LocalTableScan executeCollect);
    * for table-read cents (append) it is the same single job the old
    * broadcast build ran. Shared with the inline vector family
    * ([[graft.queries.VectorQueries]]). */
  private[graft] def packedCentroids(spark: SparkSession,
                                     cents: DataFrame): DataFrame = {
    val proj = cents.select(col("centroid_id"), col("cv"))
    val rows = proj.collect()
    AtomicRewrite.literalFrame(spark,
      Seq(org.apache.spark.sql.Row(rows.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__cents",
          org.apache.spark.sql.types.ArrayType(proj.schema)))))
  }

  /** One (vec_id, embedding) row per id — an at-least-once source may
    * compact a replay into one micro-batch (the
    * [[IndexStore.canonicalBatch]] shape). Deterministic pick by content
    * hash; under the immutable-embedding contract every copy is
    * identical anyway, so this only collapses exact replays. */
  private def canonicalVecs(batch: DataFrame): DataFrame =
    batch.groupBy("vec_id")
      .agg(max_by(col("embedding"), xxhash64(col("embedding")))
        .as("embedding"))

  /** Build the index with an EXPLICIT centroid set (`centroid_id`,
    * `cv`) — the production path: K is fixed by the caller (a
    * [[sampleCentroids]] draw or a k-means-trained set, q59's shape),
    * INDEPENDENT of corpus size. A corpus-derived centroid count (the
    * `centroidEvery` overload) grows with the data — at 100 TB the
    * broadcast becomes a fixed fraction of the corpus and the
    * assignment cross product multiplies rows by an unbounded K;
    * fixed K keeps the broadcast constant and assignment linear. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            centroids: DataFrame): Unit = {
    val p = Paths(root)
    // entry discipline (the IndexStore.build pattern): a REBUILD with
    // new centroids moves vectors across cells, so a crash between the
    // cells and vecmap commits would leave a coverage hint vouching for
    // a map that points at the wrong cells — break it before the first
    // write; the mark at the end restores it at the new cells version.
    breakCovers(spark, root)
    AtomicRewrite.write(spark, p.centroids, centroids
      .select(col("centroid_id").cast("int"), col("cv")))
    val cells = assign(corpus, AtomicRewrite.read(spark, p.centroids))
      .withColumn("qv8", code(col("embedding")))
      .persist()
    // cells and vecmap both derive from the pinned assignment, and at
    // BUILD time there is no intent-ordering between them — the covers
    // hint is broken for the whole window (any crash state heals by one
    // maintain backfill) — so the two table writes run as concurrent
    // branches (the IndexStore.build pattern). Append keeps its
    // vecmap-intent-first ordering; that contract is append's, not
    // build's.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      graft.pipeline.Runner.branchEc
    val writes = Seq(
      Future(AtomicRewrite.write(spark, p.cells, cells,
        partitionBy = Seq("centroid_id"))),
      Future(AtomicRewrite.write(spark, p.vecmap, vecmapOf(cells),
        partitionBy = Seq("vec_bucket"))))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    cells.unpersist()
    Runner.settleAll(writes)
    markCovers(spark, root,
      AtomicRewrite.currentVersion(spark, p.cells).get)
  }

  /** Deterministic fixed-K centroid draw: the `k` corpus vectors with
    * the lowest salted hash of `vec_id`, re-numbered 1..k. A k-bounded
    * TakeOrdered heap over one scan — no window, no RNG state; the same
    * corpus always yields the same centroids. */
  def sampleCentroids(corpus: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"centroid count must be positive, got $k")
    corpus.select(col("vec_id"), col("embedding").as("cv"),
        sha2(concat_ws("|", lit("centroid"), col("vec_id").cast("string")), 256)
          .as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(k)
      // k rows total by now — the renumbering window is over a constant set
      .withColumn("centroid_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__h"), col("vec_id"))))
      .select(col("centroid_id"), col("cv"))
  }

  /** Lloyd-iteration k-means training for a fixed-K centroid set:
    * seeds from [[sampleCentroids]], then `iters` rounds of the shared
    * nearest-centroid [[assign]] plus a per-(centroid, dim) average
    * (q59's single step, looped). Each round shuffles ~one combined row
    * per corpus vector for the argmax and K×dims rows for the means —
    * linear in the corpus, never quadratic. Round results are COLLECTED
    * into a K-row literal frame before the next broadcast: left lazy,
    * round i's plan would re-execute rounds 1..i-1 from scratch
    * (O(iters²) corpus scans). An emptied centroid keeps its previous
    * vector (coalesce), so K is stable across rounds. Deterministic: no
    * RNG, argmax ties to the lowest id, and the mean runs through an
    * exact DECIMAL(38,6) sum rounded to 6 digits (the q59 convention) —
    * a double sum's value depends on partition order, so the same
    * corpus could otherwise train different centroids run-to-run (and
    * never match a cross-engine oracle). */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 0, s"iterations must be non-negative, got $iters")
    val spark = corpus.sparkSession
    val cents = sampleCentroids(corpus, k)
    if (iters == 0) return cents
    // rounds materialize K rows each way — the coalesce of a round's
    // means into the previous centroid list is a K-row fold that lives
    // on the DRIVER (the Watermarks merge discipline): one collected
    // action per round (the means aggregate) instead of a join whose
    // plan re-executes it plus a second collect. Values pass through
    // untouched (no arithmetic on the driver), so the merged rows are
    // bit-identical to the join's coalesce(mv, cv).
    var rows = cents.collect().toSeq
    val schema = cents.schema
    for (_ <- 0 until iters) {
      val centsDf = graft.tx.AtomicRewrite.literalFrame(spark, rows, schema)
      val asg = assign(corpus.select(col("vec_id"), col("embedding")), centsDf)
      val means = asg.select(col("centroid_id"), posexplode(col("embedding")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(round(sum(col("col").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(38, 6))).cast("double")
          / count(lit(1)), 6).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("mv"))
        .collect()
      val mv = means.map(r => r.getInt(0) -> r.get(1)).toMap
      // an emptied centroid keeps its previous vector (the coalesce)
      rows = rows.map(r => org.apache.spark.sql.Row(
        r.get(0), mv.getOrElse(r.getInt(0), r.get(1))))
    }
    graft.tx.AtomicRewrite.literalFrame(spark, rows, schema)
  }

  /** Build the index from a corpus (`vec_id`, `embedding`): every
    * `centroidEvery`-th vector (offset 1) seeds a centroid, every vector
    * lands in its nearest centroid's hive partition. LEGACY/TEST shape —
    * no oracle query pins it anymore (the whole cell family trains
    * fixed-K centroids since round 10): K grows with the corpus, which
    * makes assignment N²/centroidEvery, and the raw-vector centroids
    * carry the erasure caveat on [[forget]]. Production indexes pass an
    * explicit fixed-K centroid set ([[trainCentroids]]). */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            centroidEvery: Int): Unit =
    build(spark, root, corpus, corpus
      .filter(pmod(col("vec_id"), lit(centroidEvery)) === 1)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv")))

  /** Append a batch: assign against the EXISTING centroids, rewrite only
    * the touched cells (carried-by-reference manifest commit). A replay
    * (same vec_ids) replaces rather than duplicates. A pre-quantization
    * index (no `qv8` column) is migrated whole on first append — one
    * O(table) rewrite, after which commits are O(touched cells) again.
    *
    * The vecmap intent commits FIRST: a crash between the vecmap and
    * cells commits leaves map rows for vectors with no cells row — a
    * harmless superset for the pruned [[forget]] (the immutable-cell
    * contract means the replayed batch lands in exactly those cells),
    * never a cells row the map misses. The coverage hint re-marks at
    * the new cells version only when it was covering at entry (this
    * append can't vouch for someone else's open crash window); a crash
    * before the re-mark reads as "not covering" — the safe side,
    * healed by one [[maintain]] backfill. */
  def append(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    val p = Paths(root)
    if (!AtomicRewrite.read(spark, p.cells).columns.contains("qv8"))
      AtomicRewrite.write(spark, p.cells,
        AtomicRewrite.read(spark, p.cells)
          .withColumn("qv8", code(col("embedding"))),
        partitionBy = Seq("centroid_id"))
    val covered = AtomicRewrite.currentVersion(spark, p.cells)
      .exists(v => coversAt(spark, root).contains(v))
    val cents = AtomicRewrite.read(spark, p.centroids)
    val asg = assign(canonicalVecs(batch), cents)
      .withColumn("qv8", code(col("embedding"))).persist()
    val touched = asg.select("centroid_id").distinct().persist()
    if (!touched.isEmpty) {
      // vecmap intent first (see above); skipped on a pre-vecmap index —
      // [[maintain]] backfills the whole map in one narrow pass
      if (AtomicRewrite.exists(spark, p.vecmap)) {
        val vm = vecmapOf(asg).persist()
        val vb = vm.select("vec_bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        val survivors = AtomicRewrite.read(spark, p.vecmap)
          .filter(col("vec_bucket").isin(vb: _*))
          .join(vm.select("vec_id"), Seq("vec_id"), "left_anti")
        AtomicRewrite.writePartitions(spark, p.vecmap,
          survivors.unionByName(vm), Seq("vec_bucket"),
          replaced = Some(vm.select("vec_bucket").distinct()))
        vm.unpersist()
      }
      // collect the (few) touched cell ids: static partition pruning on
      // the existing read + severed lineage for the replaced set
      val ids = touched.collect().map(_.getInt(0)).toSeq
      val existing = AtomicRewrite.read(spark, p.cells)
        .filter(col("centroid_id").isin(ids: _*))
      val merged = existing
        .join(asg.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(asg)
      AtomicRewrite.writePartitions(spark, p.cells, merged,
        Seq("centroid_id"), replaced = Some(touched.toDF()))
      if (covered && AtomicRewrite.exists(spark, p.vecmap))
        markCovers(spark, root,
          AtomicRewrite.currentVersion(spark, p.cells).get)
    }
    asg.unpersist(); touched.unpersist()
  }

  /** Right-to-be-forgotten for the ANN index (the [[DedupStore.forget]]
    * analog): remove the given vec_ids' rows — exact embeddings AND int8
    * codes — so an erased subject's vectors stop being queryable, closing
    * the reference's propagate-everywhere erasure contract
    * (gdpr/gdpr_propagate_erasure.py:360-719) for the similarity layer.
    *
    * Partition-aware ([[AtomicRewrite.deleteMatching]]), the same bounded
    * shape as [[append]]: a semi-join finds the (few) cells holding a
    * forgotten id, only those hive partitions are rewritten, every other
    * cell rides the manifest by reference — O(touched cells), never
    * O(index). A cell emptied by the erasure vanishes from the manifest,
    * so no ghost partition lingers. Returns whether anything was
    * rewritten; [[forgetMatched]] additionally returns the matched vec
    * ids for per-subject audit trails.
    *
    * Centroids are untouched: [[trainCentroids]] vectors are corpus-wide
    * MEANS (aggregates, not personal data), so the production fixed-K
    * path erases cleanly. The convenience shapes that copy RAW corpus
    * vectors into centroids ([[sampleCentroids]], `centroidEvery`) can
    * retain a subject's embedding as a cluster center — full erasure
    * there means retraining/rebuilding the index; production indexes
    * should train their centroids for this reason too. */
  def forget(spark: SparkSession, root: String, ids: DataFrame): Boolean =
    forgetImpl(spark, root, ids, collectKeys = false)._1

  /** [[forget]] returning the matched vec ids (empty = index untouched,
    * no version burned) — the audit-precision shape. The match set is
    * the union over cells and vecmap: an id present only in the map (an
    * append that crashed between its intent and cells commits) still
    * names where a subject's vector WOULD live, so its erasure is
    * audited, not silently dropped. */
  def forgetMatched(spark: SparkSession, root: String,
                    ids: DataFrame): Seq[Any] =
    forgetImpl(spark, root, ids, collectKeys = true)._2

  /** Shared body of [[forget]]/[[forgetMatched]]. O(subject) under the
    * coverage proof: the subject ids' cells are read from their
    * hash-pruned vecmap buckets (≤ [[VecBuckets]] literal partitions)
    * and the cells delete's discovery prunes to exactly those cells —
    * never a scan of the whole cells table. Without the proof (legacy
    * index, open crash window) the cells delete falls back to the
    * full-scan discovery, which is always sound. Deletion order keeps
    * the coverage invariant: cells rows go first, their map rows second
    * (a map row may outlive its cells row — a harmless prune superset —
    * never the reverse), so a completed forget re-marks the hint at the
    * new cells version. */
  private def forgetImpl(spark: SparkSession, root: String, ids: DataFrame,
                         collectKeys: Boolean): (Boolean, Seq[Any]) = {
    val p = Paths(root)
    val vecIds = ids.toDF("vec_id")
    val covered = AtomicRewrite.exists(spark, p.vecmap) &&
      AtomicRewrite.currentVersion(spark, p.cells)
        .exists(v => coversAt(spark, root).contains(v))
    // ≤ VecBuckets literal ints — vec_bucket is a pure hash of vec_id,
    // so pruning the vecmap reads by it is always sound
    val vb =
      if (!AtomicRewrite.exists(spark, p.vecmap)) Nil
      else vecIds.select(vecBucketOf(col("vec_id")).as("vec_bucket"))
        .distinct().collect().map(_.get(0)).toSeq
    val cellPrune: Option[Column] =
      if (!covered) None
      else if (vb.isEmpty) Some(lit(false)) // empty id set: nothing anywhere
      else {
        val cellIds = AtomicRewrite.read(spark, p.vecmap)
          .filter(col("vec_bucket").isin(vb: _*))
          .join(vecIds.distinct(), Seq("vec_id"), "left_semi")
          .select("centroid_id").distinct()
          .collect().map(_.get(0)).toSeq
        // covered ⟹ an id with no map row has no cells row: an empty
        // cell set prunes the whole delete to a no-op without a read.
        // A BULK subject (a banned source, not one user) can span tens
        // of thousands of cells — isInCollection compiles to one
        // InSet, so the prune survives any subject size the driver-side
        // collect above could produce (None past the ceiling: the
        // full-scan fallback is always sound)
        if (cellIds.isEmpty) Some(lit(false))
        else if (cellIds.size > AtomicRewrite.MaxSetMembershipTerms) None
        else Some(col("centroid_id").isInCollection(cellIds))
      }
    // the two deletes touch disjoint tables and each staging reads only
    // its own committed state, so they stage CONCURRENTLY and the
    // pointer swaps keep the sequential order — cells first, map second
    // (a map row may outlive its cells row, never the reverse); both
    // stagings settle before either promote, a failure aborting with
    // zero pointers moved (the IndexStore.append stage/promote rule)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
    val cellsF = Future(AtomicRewrite.stageDeleteMatching(spark, p.cells,
      vecIds, "vec_id", collectKeys, cellPrune))
    val vmF = Future(
      if (vb.isEmpty) None
      else AtomicRewrite.stageDeleteMatching(spark, p.vecmap,
        vecIds, "vec_id", collectKeys,
        Some(col("vec_bucket").isin(vb: _*))))
    val cellsStaged = scala.util.Try(Await.result(cellsF, Duration.Inf))
    val vmStaged = scala.util.Try(Await.result(vmF, Duration.Inf))
    (cellsStaged.failed.toOption orElse vmStaged.failed.toOption).foreach { e =>
      Seq(cellsStaged, vmStaged).flatMap(_.failed.toOption)
        .filter(_ ne e).foreach(e.addSuppressed)
      throw e
    }
    cellsStaged.get.foreach(_.promote())
    vmStaged.get.foreach(_.promote())
    val (a, keysA) = (cellsStaged.get.isDefined,
      cellsStaged.get.map(_.matched).getOrElse(Nil))
    val (b, keysB) = (vmStaged.get.isDefined,
      vmStaged.get.map(_.matched).getOrElse(Nil))
    if (covered && (a || b))
      markCovers(spark, root,
        AtomicRewrite.currentVersion(spark, p.cells).get)
    (a || b, (keysA ++ keysB).distinct)
  }

  /** Maintenance: (re)establish the vecmap coverage proof. A covering
    * map is a version-keyed no-op reading zero bytes; anything else —
    * a pre-vecmap index, a crash window that left the hint stale — is
    * healed by ONE narrow backfill (vec_id + centroid_id columns of the
    * committed cells; the embedding payload is never read thanks to
    * parquet column pruning) and the hint re-marks. Safe on a quiesced
    * store only — the [[CurationRunner.maintain]] contract.
    *
    * `audit = true` runs the backfill UNCONDITIONALLY — the detection/
    * healing backstop for the two states a version-keyed skip can never
    * see, both of which re-deriving the map FROM the committed cells
    * repairs in one narrow pass:
    *  - '''orphan intent rows''': an append that crashed after its
    *    vecmap intent commit and was never replayed leaves map rows for
    *    vectors with no cells row; once any later append re-marks
    *    coverage they persist indefinitely (harmless to the prune — a
    *    superset — but subject-derived data retained forever unless
    *    that subject is individually forgotten);
    *  - '''contract-violation strandings''': a caller that violated the
    *    immutable-embedding contract (re-appended an id whose changed
    *    embedding moved cells) stranded the old cells row with NO map
    *    row naming its cell — a covered forget misses it while
    *    reporting the id erased. The audit backfill emits a map row for
    *    EVERY committed cells row (the stranded one included), so the
    *    next forget of that id erases it and the coverage proof is true
    *    again.
    * Run it on a slow cadence (the vacuum cadence —
    * [[CurationRunner.maintain]]'s `auditAnnVecmap`); per-batch, the
    * version-keyed skip stays the right default. Where raw-vector
    * centroids are in play, [[retrain]] on cadence remains the
    * compliance backstop of last resort (it rebuilds cells AND map from
    * the surviving corpus). */
  def maintain(spark: SparkSession, root: String,
               audit: Boolean = false): Unit = {
    val p = Paths(root)
    if (!AtomicRewrite.exists(spark, p.cells)) return
    val v = AtomicRewrite.currentVersion(spark, p.cells).get
    if (!audit && coversAt(spark, root).contains(v)) return // covering: zero reads
    AtomicRewrite.write(spark, p.vecmap,
      vecmapOf(AtomicRewrite.read(spark, p.cells)),
      partitionBy = Seq("vec_bucket"))
    markCovers(spark, root, v)
  }

  /** Retrain the index's centroid set from its OWN surviving corpus and
    * rebuild the cells around it — the erasure-completion step for
    * indexes whose centroids were drawn from RAW corpus vectors
    * ([[sampleCentroids]] / `centroidEvery`): after [[forget]], such a
    * centroid can still BE a deleted subject's embedding; retraining
    * replaces every centroid with a corpus-wide mean (an aggregate, not
    * personal data) computed over the post-erasure corpus only. One
    * O(index) rebuild by construction — reassignment can move any vector
    * to a new cell — which is why it runs on cadence/after erasure
    * batches, not per forget; [[trainCentroids]] keeps the heavy lifting
    * linear (broadcast-argmax rounds, K-row collects). */
  def retrain(spark: SparkSession, root: String, k: Int, iters: Int): Unit = {
    val corpus = AtomicRewrite.read(spark, Paths(root).cells)
      .select(col("vec_id"), col("embedding"))
    require(!corpus.isEmpty,
      s"cannot retrain $root from an empty index — rebuild from a corpus")
    build(spark, root, corpus, trainCentroids(corpus, k, iters))
  }

  /** Top-`k` neighbors per query (`query_id`, `qv`), probing each
    * query's `nprobe` nearest cells. Only the probed hive partitions are
    * read; ranking is the TopKPerKey heap operator.
    *
    * On a quantized index (cells carry `qv8`) the probe is two-phase:
    * the candidate pass scans ONLY the int8 code column (~8× less
    * bandwidth than float32) ranking by quantized cosine, keeps
    * `max(RerankFloor, rerank·k)` survivors per query, and the exact
    * float cosine is computed just for the survivors from the embedding
    * column — so scored results are always exact cosines, and the
    * ranking equals the one-phase float path whenever the true top-k
    * sit inside the rerank window (the window absorbs the ~1e-2 int8
    * error in cosine ORDER; both oracle corpora verify equality
    * end-to-end at two scales). The guarantee is window-relative, not
    * absolute: a cell with more than the window's worth of candidates
    * packed inside the quantization error of the k-th cosine can evict
    * a true neighbor — widen `rerank` for such near-duplicate-dense
    * corpora, or pass `rerank = 0` to force the one-phase exact float
    * scan. Pre-quantization indexes (no `qv8`) always take the
    * one-phase path. */
  def query(spark: SparkSession, root: String, queries: DataFrame,
            k: Int = 3, nprobe: Int = 1, rerank: Int = 8): DataFrame = {
    val p = Paths(root)
    val cents = AtomicRewrite.read(spark, p.centroids)
    val probeAll = queries.crossJoin(broadcast(cents))
      .withColumn("__cos", cos(col("qv"), col("cv")))
    val probes = graft.plans.TopKPerKey.perKey(probeAll,
      Seq("query_id"), Seq(col("__cos").desc, col("centroid_id")), nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val cellIds = probes.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = AtomicRewrite.read(spark, p.cells)
      .filter(col("centroid_id").isin(cellIds: _*))
    val exactCand: DataFrame =
      if (rerank <= 0 || !cells.columns.contains("qv8")) {
        cells.join(broadcast(probes), Seq("centroid_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cos(col("qv"), col("embedding")).as("cos_sim"))
      } else {
        import graft.ops.VectorOps.intDot
        // phase 1: quantized cosine over the code column only
        val probes8 = probes
          .withColumn("q8", code(col("qv")))
          .withColumn("__nq8", intDot(col("q8"), col("q8")))
          .select(col("query_id"), col("centroid_id"), col("q8"), col("__nq8"))
        val approx = cells.select(col("vec_id"), col("centroid_id"), col("qv8"))
          .join(broadcast(probes8), Seq("centroid_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            (intDot(col("q8"), col("qv8")) /
              (sqrt(col("__nq8")) * sqrt(intDot(col("qv8"), col("qv8")))))
              .as("__acos"))
        val survivors = graft.plans.TopKPerKey.perKey(approx,
          Seq("query_id"), Seq(col("__acos").desc, col("vec_id")),
          math.max(RerankFloor, rerank * k))
          .select(col("query_id"), col("vec_id"))
        // phase 2: exact cosine for survivors only (bounded: |Q|·window),
        // reading the embedding column of the probed cells
        cells.select(col("vec_id"), col("embedding"))
          .join(broadcast(survivors), Seq("vec_id"))
          .join(broadcast(queries.select(col("query_id"), col("qv"))),
            Seq("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cos(col("qv"), col("embedding")).as("cos_sim"))
      }
    graft.plans.TopKPerKey.perKey(exactCand,
      Seq("query_id"), Seq(col("cos_sim").desc, col("neighbor_id")), k)
  }
}
