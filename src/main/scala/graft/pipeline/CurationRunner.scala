package graft.pipeline

import graft.ops.{PrefixSum, TextOps}
import graft.tx.{AtomicRewrite, Watermarks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The composed curation-release job — the LLM-side [[Runner]]: one
  * batch call runs clean → exact-dedup ([[DedupStore]]) → near-dup
  * rejection ([[NearDupStore]], when `Conf.nearDupThreshold` is set) →
  * release gate (quality / holdout / contamination, the q114 cascade
  * minus the dup checks the stores already made) → token-budget
  * selection (q115's distributed prefix cut) → training-shard publish
  * ([[TrainingShards]]) → retrieval-index refresh ([[IndexStore]], and
  * [[AnnIndexStore]] when the batch carries embeddings), all against
  * PERSISTENT store roots under one root directory, guarded by the same
  * control-table watermark contract the medallion pipeline uses
  * (reference analog: the bronze→silver→gold DAG of scripts/run/,
  * src/bronze/trips_oltp_to_bronze.py:98-176 — re-keyed from trips to
  * training documents).
  *
  * Layout under `root`:
  * {{{
  *   _control       // Watermarks table, job = "curation_release"
  *   dedup_store    // all-time accepted fingerprints (DedupStore)
  *   neardup_store  // all-time accepted MinHash signatures
  *                  // (NearDupStore; only with nearDupThreshold)
  *   corpus         // accepted docs + ingest-time signals, hive-
  *                  // partitioned by batch_id (landed BEFORE the
  *                  // store commits — the DedupStore crash contract)
  *   curated        // the released selection (budget cut), one snapshot
  *   shards         // TrainingShards epoch of the curated selection
  *   index          // IndexStore over the accepted corpus
  *   ann            // AnnIndexStore over appended embedding batches
  * }}}
  *
  * Scale shape — the parts that keep a 100 TB corpus incremental:
  *  - INGEST is O(batch): tokenize/score/gate once per document at
  *    landing time, so no release ever re-tokenizes history; the dedup
  *    anti-join probes fingerprints (bytes per doc), the corpus landing
  *    and index append commit O(batch) through partition manifests.
  *  - CONTAMINATION is batch ⋈ benchmark (the eval set — small by
  *    definition), with a benchmark-side document-frequency cap
  *    bounding stop-shingle fan-out; never corpus ⋈ corpus.
  *  - RELEASE is a metadata pass: the budget cut orders precomputed
  *    (id, n_tokens, quality_score) rows via [[PrefixSum]] — the only
  *    unpartitioned window is its O(partitions) offset frame — and the
  *    snapshot commit is bucket-DIFFED against a per-bucket signature
  *    SIDECAR: the committed side of the diff reads O(buckets) sidecar
  *    rows, never the committed data files, so a near-no-change release
  *    writes O(changed buckets), and a no-change release writes nothing
  *    and skips the epoch publish entirely (the shardsFrom marker keeps
  *    that skip crash-replay-safe). Publishing every batch is the
  *    oracle shape;
  *    production runs ingest-only batches (`publish = false`) and
  *    publishes on release cadence.
  *
  * Replay contract (the M1 never-regress semantics):
  *  - a batch whose `asOf` does not advance the watermark is a FULL
  *    no-op — no store version burns anywhere, byte-identical state;
  *  - a crash anywhere before the watermark advance replays the batch:
  *    landing is idempotent (same batch_id partition, same rows), the
  *    dedup stores re-accept only what their committed state doesn't
  *    hold, the index appends have replacement semantics, and the
  *    release bucket-diffs against the committed selection — identical
  *    content is a no-op (no curated/shard version burns), changed
  *    content commits only its changed buckets. The index refresh reads
  *    the batch's DURABLE
  *    corpus partition rather than the in-flight accepted frame, so a
  *    replay where the dedup stores reject everything (crash landed
  *    after their commits) still converges the indexes to the landed
  *    rows instead of silently skipping them;
  *  - a FAILED run records `FAIL:<cause>` with a NULL watermark
  *    (never-regress), so the next run retries the same cut.
  */
object CurationRunner {

  val Job = "curation_release"

  /** The curated snapshot's id-hash partition grain: committed
    * partition-wise so GDPR erasure rewrites only the buckets holding a
    * forgotten doc ([[graft.tx.AtomicRewrite.deleteMatching]]), never
    * the whole selection — the [[IndexStore]] forget-bound shape. */
  val CuratedBuckets = 32
  val CuratedBucketCol = "sel_bucket"

  case class Paths(root: String) {
    val control: String = s"$root/_control"
    val dedupStore: String = s"$root/dedup_store"
    val nearDupStore: String = s"$root/neardup_store"
    val corpus: String = s"$root/corpus"
    val curated: String = s"$root/curated"
    val shards: String = s"$root/shards"
    /** 1-row marker: the curated version the committed shard epoch
      * derived from — what lets a no-change release skip the epoch
      * publish WITHOUT breaking crash-replay convergence (see
      * [[release]]). Holds a version number only, no subject data, so
      * it sits outside the GDPR hooks. */
    val shardsFrom: String = s"$root/shards_from"
    val index: String = s"$root/index"
    val ann: String = s"$root/ann"
  }

  /** Gate + selection knobs. Defaults mirror the oracle-pinned q114 /
    * q115 constants so the composed job and the inline queries describe
    * the same release policy. */
  case class Conf(
      idCol: String = "doc_id",
      textCol: String = "text",
      /** Eval/benchmark docs (same idCol/textCol schema) driving the
        * contamination gate; None disables that gate. */
      benchmark: Option[DataFrame] = None,
      budgetShare: Double = 0.4,
      nShards: Int = 8,
      minChars: Int = 100,
      minStopRatio: Double = 0.05,
      /** A doc sharing at least this many distinct 3-gram shingles with
        * the benchmark is contaminated. */
      contamShingles: Int = 3,
      /** Benchmark-side doc-frequency cap per shingle — bounds the
        * stop-shingle join fan-out (the q56 [2,100] cap's upper half;
        * the lower half is a dedup-join symmetry concern that does not
        * apply to a fixed reference side). */
      benchDfCap: Int = 100,
      /** ANN store training shape for the first embedding batch. */
      annK: Int = 16,
      annIters: Int = 2,
      /** Estimated-Jaccard threshold for MinHash/LSH NEAR-dup rejection
        * against the all-time [[NearDupStore]]; None (the default)
        * disables the stage. Runs AFTER exact dedup — the near-dup
        * signature pass only pays for content the fingerprint store has
        * not already rejected byte-for-byte. */
      nearDupThreshold: Option[Double] = None,
      /** Mixture enforcement at release (the q116 cut): no source may
        * keep more than this share of its OWN kept token mass —
        * best-quality-first within each source — before the global
        * budget prefix applies (whose budget then derives from the
        * CAPPED mass). Requires `sourceCol` on the landed corpus; the
        * cumsum window partitions by source, so it parallelizes
        * natively (source counts are O(thousands) in real mixes). */
      sourceCapShare: Option[Double] = None,
      sourceCol: String = "source",
      /** Curriculum training order (the q117 interleave): re-mint the
        * released `train_pos` to round-robin sources best-quality-first
        * — pos = (rank-within-source − 1) × |sources| + source-index —
        * so no epoch prefix is a single-domain block. The shard epoch
        * follows this order (token-balanced contiguous over the
        * interleave); the budget cut itself stays quality-greedy.
        * Requires `sourceCol`; positions are an ordering key, not a
        * dense index (unequal sources leave tail holes). */
      curriculum: Boolean = false,
      /** Redact PII ([[TextOps.redactPii]]: email/phone/IP → typed
        * placeholders) at INGEST, before anything derives from the text
        * — so no raw PII ever lands in the corpus, the fingerprint or
        * signature stores, the indexes, or the published shards, and
        * two documents differing only in their PII still collapse as
        * duplicates (the placeholders normalize them). One codegen
        * regex projection per batch; history is never re-scanned. */
      redactPii: Boolean = false)

  /** Run one curation batch end-to-end; returns the (possibly
    * re-)published curated selection. `embeddings` (vec_id, embedding)
    * rides the same cycle into the ANN store when present;
    * `publish = false` skips the release phase (ingest-only cadence).
    */
  def runBatch(spark: SparkSession, root: String, batch: DataFrame,
               asOf: Timestamp, batchId: String, conf: Conf = Conf(),
               embeddings: Option[DataFrame] = None,
               publish: Boolean = true): DataFrame = {
    val p = Paths(root)
    require(!batchId.startsWith(FoldPrefix),
      s"batch ids must not start with '$FoldPrefix' — [[maintain]] folds " +
        "historic corpus partitions under that prefix, and a colliding " +
        "landing would REPLACE the folded history with the new batch")
    Watermarks.bootstrap(spark, p.control)
    val wm = Watermarks.read(spark, p.control, Job)
    if (wm.exists(w => !asOf.after(w)))
      // watermark not advanced -> the batch was already fully committed
      // (or is out of order): FULL no-op, nothing burns a version
      return curatedOrEmpty(spark, p, batch, conf)
    try {
      val gated = gate(clean(batch, conf), conf)
      // commit order: corpus landing → near-dup signatures → exact
      // fingerprints. The durable landing always precedes every store
      // commit (the DedupStore/NearDupStore crash contract), so a replay
      // can re-derive everything downstream from the corpus partition.
      // With near-dup on, the fingerprint store commits ONLY what the
      // nested stage landed (acceptThrough): a ghost fingerprint of
      // never-landed content would block re-submission forever and be
      // unreachable by the corpus-driven GDPR hook below.
      val fpCol = DedupStore.textFingerprint(col(conf.textCol))
      (conf.nearDupThreshold match {
        case None =>
          DedupStore.acceptNew(spark, p.dedupStore, gated, conf.idCol,
            fpCol, land = df => land(spark, p, df, batchId, conf))
        case Some(t) =>
          DedupStore.acceptThrough(spark, p.dedupStore, gated, conf.idCol,
            fpCol) { df =>
            NearDupStore.acceptNew(spark, p.nearDupStore, df,
              conf.idCol, conf.textCol, t,
              land = rows => land(spark, p, rows, batchId, conf))
          }
      }).unpersist()
      // the index refresh derives from the DURABLE landing, never the
      // in-flight accepted frame: a replay of a batch whose stores
      // already committed (dedup accepts nothing) still re-appends the
      // landed rows — replacement semantics make that idempotent — so
      // no crash point between the store commits and here can strand
      // corpus docs outside the indexes
      val landed = landedBatch(spark, p, batchId)
      val emb = guardEmbeddings(embeddings, batch, landed, conf)
      if (!publish) refreshIndexes(spark, p, landed, emb, conf)
      else {
        // the index refresh and the release are INDEPENDENT subtrees on
        // disjoint store roots (index/ann vs curated/shards/shardsFrom),
        // both reading only durable corpus state — so they run
        // concurrently (the [[Runner.runBatch]] branch pattern): each
        // phase is a chain of small commits whose driver-side planning
        // gaps would otherwise leave the executors idle half the wall.
        // A crash with either half-done replays to convergence exactly
        // as the sequential order did (the watermark advances only after
        // BOTH complete). Both futures settle before any failure
        // propagates — never unwind while the sibling is committing.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
        val idx = Future(refreshIndexes(spark, p, landed, emb, conf))
        val rel = scala.util.Try(release(spark, p, conf))
        val idxSettled = scala.util.Try(Await.result(idx, Duration.Inf))
        Runner.settleAll(Seq(rel, idxSettled))
      }
      Watermarks.advance(spark, p.control, Job, Some(asOf), "SUCCESS", asOf)
    } catch {
      case scala.util.control.NonFatal(e) =>
        try Watermarks.advance(spark, p.control, Job, None,
          s"FAIL:${e.getClass.getSimpleName}", asOf)
        catch { case scala.util.control.NonFatal(e2) => e.addSuppressed(e2) }
        throw e
    }
    curatedOrEmpty(spark, p, batch, conf)
  }

  /** [[readCurated]], safe before the first release: an ingest-only
    * cadence (`publish = false` from the first batch — the streaming
    * front door's default) has no curated snapshot yet, so return an
    * empty frame in the snapshot's exact shape instead of throwing
    * AFTER the batch's state already committed (which would also make
    * every watermark-guarded replay of that batch crash at the no-op
    * return). The shape derives from the committed corpus when it
    * exists, else from the gate over the (lazy, zero-row) batch. */
  private def curatedOrEmpty(spark: SparkSession, p: Paths,
                             batch: DataFrame, conf: Conf): DataFrame =
    if (AtomicRewrite.exists(spark, p.curated)) readCurated(spark, p.root)
    else {
      val shape =
        if (AtomicRewrite.exists(spark, p.corpus))
          AtomicRewrite.read(spark, p.corpus)
        else gate(clean(batch, conf), conf)
          .withColumn("batch_id", lit(""))
      shape.limit(0)
        .withColumn("cum_tokens", lit(0L))
        .withColumn("train_pos", lit(0L))
    }

  /** Rows with nothing to curate never enter the pipeline: no id, no
    * text, or blank text (a blank doc has no fingerprint, no tokens and
    * no index presence — rejecting it here keeps every downstream
    * invariant trivially true). With `redactPii` armed, redaction
    * happens HERE — ahead of every derivation — so raw PII never
    * reaches a fingerprint, signature, gate signal, landing or index. */
  private def clean(batch: DataFrame, conf: Conf): DataFrame = {
    val filtered = batch.filter(
      col(conf.idCol).isNotNull && col(conf.textCol).isNotNull &&
        trim(col(conf.textCol)) =!= "")
    if (!conf.redactPii) filtered
    else filtered.withColumn(conf.textCol,
      TextOps.redactPii(col(conf.textCol)))
  }

  /** Ingest-time signals + the release-gate verdict, one row per doc:
    * `n_tokens`, `quality_score` (q31's formula), and `reason`/`keep`
    * (the q114 cascade order minus exact-dup, which [[DedupStore]]
    * enforces upstream). Everything is a narrow map or a batch-sized
    * keyed agg; the one join is batch ⋈ benchmark shingles. */
  private def gate(batch: DataFrame, conf: Conf): DataFrame = {
    val id = col(conf.idCol)
    val toks = TextOps.tokens(col(conf.textCol))
    val base = batch
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__stop", TextOps.tokenHits(toks, TextOps.StopwordsEn))
      .withColumn("quality_score",
        round(least(col("n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
          least(col("__stop") / col("n_tokens") * 5, lit(1.0)) * 0.5, 6))
      .withColumn("__nchars", length(col(conf.textCol)).cast("long"))
      .withColumn("__bucket",
        conv(substring(sha2(concat_ws("|", lit("split"),
          id.cast("string")), 256), 1, 4), 16, 10).cast("long") % 100)
    val contam = contaminated(batch, conf)
    base.join(contam, Seq(conf.idCol), "left")
      .withColumn("reason",
        when(col("__nchars") < conf.minChars, "too_short")
          // defensive, ahead of the ratio tests: with the current
          // whitespace tokenizer every cleaned doc has >= 1 token, but
          // under a word-EXTRACTING tokenizer a punctuation-only doc
          // would hit n_tokens=0, turn the stopword ratio NaN, skip
          // every reject predicate and land "kept" with an unordered
          // quality — this branch pins the invariant either way
          .when(col("n_tokens") === 0, "too_short")
          .when(col("__stop") / col("n_tokens") < conf.minStopRatio,
            "low_stopword")
          .when(col("__bucket") >= 90, "benchmark_holdout")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .otherwise("kept"))
      .withColumn("keep", col("reason") === "kept")
      .drop("__stop", "__nchars", "__bucket", "contaminated")
  }

  /** (idCol, contaminated=true) for batch docs sharing at least
    * `contamShingles` distinct 3-gram shingles with the benchmark set.
    * The benchmark side drops shingles carried by more than
    * `benchDfCap` of ITS docs before the join — the fan-out bound that
    * keeps a stop-shingle from matching every batch doc. A doc
    * identical to an eval doc is contaminated by construction,
    * including the eval doc itself leaking into ingest. */
  private def contaminated(batch: DataFrame, conf: Conf): DataFrame = {
    val empty = batch.select(col(conf.idCol)).limit(0)
      .withColumn("contaminated", lit(true))
    conf.benchmark match {
      case None => empty
      case Some(bench) =>
        val bsh = bench.select(col(conf.idCol).as("__bid"),
          explode(array_distinct(
            TextOps.shingles(TextOps.tokens(col(conf.textCol)), 3))).as("__sh"))
        val bkeep = bsh.groupBy("__sh")
          .agg(countDistinct(col("__bid")).as("__bdf"))
          .filter(col("__bdf") <= conf.benchDfCap)
          .select("__sh").distinct()
        batch.select(col(conf.idCol),
            explode(array_distinct(
              TextOps.shingles(TextOps.tokens(col(conf.textCol)), 3))).as("__sh"))
          // the benchmark is an eval set — small by definition — so its
          // shingle keep-list broadcasts rather than shuffling the
          // batch's full shingle explosion by key (pinned, not left to
          // AQE's estimate of an agg intermediate)
          .join(broadcast(bkeep), "__sh")
          .groupBy(conf.idCol)
          .agg(countDistinct(col("__sh")).as("__shared"))
          .filter(col("__shared") >= conf.contamShingles)
          .select(col(conf.idCol), lit(true).as("contaminated"))
    }
  }

  /** Land the accepted rows into the corpus, hive-partitioned by
    * batch_id: a replay of the same batch replaces its own partition
    * with identical rows (idempotent), every other batch rides the
    * manifest by reference — O(batch) bytes per commit. Skipped when
    * nothing was accepted: an empty landing must not burn a version,
    * and must NEVER name its partition as replaced (a fully-replayed
    * batch would otherwise erase its own previously landed rows). */
  private def land(spark: SparkSession, p: Paths, accepted: DataFrame,
                   batchId: String, conf: Conf): Unit =
    if (!accepted.isEmpty)
      AtomicRewrite.writePartitions(spark, p.corpus,
        accepted.withColumn("batch_id", lit(batchId)), Seq("batch_id"))

  /** The batch's DURABLY landed rows — the corpus partition written by
    * [[land]], read back partition-pruned (one `batch_id` dir, O(batch)
    * bytes). None when nothing of this batch ever landed (corpus absent,
    * or every row was rejected upstream). This is the index refresh's
    * input: durable state, identical on a fresh run and on any crash
    * replay. */
  private def landedBatch(spark: SparkSession, p: Paths,
                          batchId: String): Option[DataFrame] = {
    if (!AtomicRewrite.exists(spark, p.corpus)) None
    else {
      val rows = AtomicRewrite.read(spark, p.corpus)
        .filter(col("batch_id") === batchId).drop("batch_id")
      if (rows.isEmpty) None else Some(rows)
    }
  }

  /** Drop embeddings ORPHANED by this batch's own rejections: a vec_id
    * that rode in alongside its document but whose document was rejected
    * (dup of earlier content, null/blank text) must not enter the ANN
    * store — its canonical doc's embedding represents the content, and a
    * GDPR erasure keyed by accepted doc ids would never reach the
    * orphan. Embeddings whose vec_id is NOT in this batch pass through
    * untouched (the late-rider contract: an embedding may arrive batches
    * after its text). Both joins are O(batch). */
  private def guardEmbeddings(embeddings: Option[DataFrame],
                              batch: DataFrame, landed: Option[DataFrame],
                              conf: Conf): Option[DataFrame] =
    embeddings.map { em =>
      val batchIds = batch.filter(col(conf.idCol).isNotNull)
        .select(col(conf.idCol).as("vec_id"))
      val landedIds = landed.map(_.select(col(conf.idCol).as("vec_id")))
        .getOrElse(batchIds.limit(0))
      val rejected = batchIds.join(landedIds, Seq("vec_id"), "left_anti")
      em.join(rejected, Seq("vec_id"), "left_anti")
    }

  /** Incremental index refresh from the batch's landed rows: BM25
    * postings append (replacement semantics) and, when the batch carries
    * embeddings, the ANN cell append — both O(batch + touched
    * partitions). First batch builds; empty batches skip entirely. */
  private def refreshIndexes(spark: SparkSession, p: Paths,
                             landed: Option[DataFrame],
                             embeddings: Option[DataFrame],
                             conf: Conf): Unit = {
    landed.foreach { rows =>
      if (AtomicRewrite.exists(spark, IndexStore.Paths(p.index).postings))
        IndexStore.append(spark, p.index, rows, conf.textCol, conf.idCol)
      else
        IndexStore.build(spark, p.index, rows, conf.textCol, conf.idCol)
    }
    embeddings.filterNot(_.isEmpty).foreach { em =>
      val vecs = em.select(col("vec_id"), col("embedding"))
      if (AtomicRewrite.exists(spark, AnnIndexStore.Paths(p.ann).centroids))
        AnnIndexStore.append(spark, p.ann, vecs)
      else
        AnnIndexStore.build(spark, p.ann, vecs,
          AnnIndexStore.trainCentroids(vecs, conf.annK, conf.annIters))
    }
  }

  /** The release phase: greedy token-budget cut over the ALL-TIME kept
    * corpus (quality DESC, id — q115's distributed prefix sum, which
    * also mints the contiguous `train_pos` training order in the same
    * pass), snapshot to `curated`, then publish the epoch through
    * [[TrainingShards.build]]. A pure metadata pass over precomputed
    * ingest signals — the corpus text is read only by the shard
    * publish, which is O(selection) by definition. */
  /** Publish-only cadence: run the release phase (mixture cap → budget
    * cut → curated publish → shard epoch) against the CURRENT corpus
    * without landing anything — the decoupled-release operational shape
    * ([[runBatch]]'s `publish = false` ingests on batch cadence; this
    * publishes on release cadence), and the seam
    * [[graft.tools.CurationBench]] prices the release phase through. A
    * no-change corpus re-release is a full no-op (the diffed curated
    * commit + the shardsFrom marker). */
  def publishRelease(spark: SparkSession, root: String,
                     conf: Conf = Conf()): Unit =
    release(spark, Paths(root), conf)

  private def release(spark: SparkSession, p: Paths, conf: Conf): Unit = {
    val keptAll = AtomicRewrite.read(spark, p.corpus).filter(col("keep"))
    // mixture enforcement first (the q116 cut): per-source greedy
    // prefixes under sourceCapShare of that source's kept token mass.
    // The cut runs over a NARROW signal projection (id, source, tokens,
    // quality — pinned in cache; text never rides the window), and the
    // survivors semi-join back. The cumsum window partitions by source —
    // parallel by key, never a corpus-sized single partition.
    val (kept, sig) = conf.sourceCapShare match {
      case None => (keptAll, None)
      case Some(share) =>
        require(keptAll.columns.contains(conf.sourceCol),
          s"sourceCapShare needs a '${conf.sourceCol}' column on the " +
            "landed corpus — ingest batches must carry it")
        val sig = keptAll.select(col(conf.idCol), col(conf.sourceCol),
          col("n_tokens"), col("quality_score")).persist()
        val caps = sig.groupBy(conf.sourceCol)
          .agg(floor(sum("n_tokens") * lit(share)).cast("long").as("__cap"))
        val ids = sig.withColumn("__scum",
            sum("n_tokens").over(Window.partitionBy(conf.sourceCol)
              .orderBy(col("quality_score").desc, col(conf.idCol))))
          .join(broadcast(caps), conf.sourceCol)
          .filter(col("__scum") <= col("__cap"))
          .select(col(conf.idCol))
        (keptAll.join(ids, Seq(conf.idCol), "left_semi"), Some(sig))
    }
    val (cum, cached, totals) = PrefixSum.runningTotalsSummed(kept,
      Seq(col("quality_score").desc, col(conf.idCol)),
      Seq((col("n_tokens"), "cum_tokens"), (lit(1L), "train_pos")))
    // the budget scalar derives from the prefix pass's own exact long
    // total (floor(total × share) — the same double multiply + floor the
    // aggregate computed), so the cut is a literal predicate: no second
    // aggregate action, no broadcast build
    val totalTokens = totals.head match {
      case null => 0L
      case t: java.lang.Long => t.longValue
    }
    val budgetV = math.floor(totalTokens * conf.budgetShare).toLong
    val sel = cum.filter(col("cum_tokens") <= budgetV)
    // curriculum order (q117): the selection's train_pos round-robins
    // sources best-first. Source-keyed rank windows only; the one
    // unpartitioned window runs over the O(sources) distinct frame.
    val shipped =
      if (!conf.curriculum) sel
      else {
        require(sel.columns.contains(conf.sourceCol),
          s"curriculum needs a '${conf.sourceCol}' column on the " +
            "landed corpus — ingest batches must carry it")
        val srcs = sel.select(conf.sourceCol).distinct()
        val si = srcs.withColumn("__si",
          row_number().over(Window.orderBy(conf.sourceCol)).cast("long"))
        val ns = srcs.agg(count(lit(1)).as("__ns"))
        sel.withColumn("__rn", row_number().over(
            Window.partitionBy(conf.sourceCol)
              .orderBy(col("quality_score").desc, col(conf.idCol)))
            .cast("long"))
          .join(broadcast(si), conf.sourceCol)
          .crossJoin(broadcast(ns))
          .withColumn("train_pos",
            (col("__rn") - 1) * col("__ns") + col("__si"))
          .drop("__rn", "__si", "__ns")
      }
    // partition-committed by id-hash bucket AND partition-DIFFED
    // against the committed snapshot: only sel_buckets whose content
    // moved are rewritten (a near-no-change release is O(changed
    // buckets), a no-change release burns no curated version at all),
    // and an erasure between releases rewrites only the subject's
    // buckets (see [[storeErasures]])
    val withBucket = shipped.withColumn(CuratedBucketCol,
      pmod(xxhash64(lit("curated"), col(conf.idCol)),
        lit(CuratedBuckets.toLong)).cast("int")).persist()
    val curatedMoved = publishCurated(spark, p, withBucket)
    withBucket.unpersist()
    cached.unpersist()
    sig.foreach(_.unpersist())
    // the epoch derives from the COMMITTED selection (the
    // TrainingShards manifest discipline applied one level up), and is
    // SKIPPED when the committed epoch already derives from this exact
    // curated version UNDER THIS EXACT SHARDING CONF — the shardsFrom
    // marker records (curated version, n_shards, order_col), so a Conf
    // evolution (an nShards dial turn) with an unchanged selection
    // still re-shards instead of silently serving the stale shard
    // count. The marker commits AFTER the epoch: a crash between the
    // curated commit and the epoch publish leaves it stale, so the
    // replay's no-change release still rebuilds the epoch to
    // convergence.
    val curVer = AtomicRewrite.currentVersion(spark, p.curated).get
    if (curatedMoved || !shardsFromMatches(spark, p, curVer, conf)) {
      TrainingShards.build(spark, p.shards,
        AtomicRewrite.read(spark, p.curated).drop(CuratedBucketCol),
        conf.nShards, orderCol = ShardOrderCol)
      // the marker row lives on the driver — commit it driver-side
      AtomicRewrite.writeLocalRows(spark, p.shardsFrom,
        Seq(org.apache.spark.sql.Row(curVer, conf.nShards, ShardOrderCol)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("curated_version",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_shards",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("order_col",
            org.apache.spark.sql.types.StringType, nullable = false))))
    }
  }

  /** The training order the published epoch shards by — `train_pos` in
    * both plain and curriculum releases (curriculum re-MINTS train_pos,
    * it doesn't change the column). Recorded in the shardsFrom marker
    * so a future order evolution invalidates the epoch skip. */
  private val ShardOrderCol = "train_pos"

  /** Commit the fresh selection over the committed snapshot,
    * bucket-diffed ([[AtomicRewrite.writePartitionsDiffed]]): only
    * sel_buckets whose content moved rewrite, untouched buckets ride
    * the manifest by reference, vanished buckets drop, and ZERO moved
    * buckets is a full no-op (no version burned). Returns whether
    * anything committed. First release (or a schema change — a Conf
    * evolution) snapshots in full. */
  private def publishCurated(spark: SparkSession, p: Paths,
                             fresh: DataFrame): Boolean =
    AtomicRewrite.writePartitionsDiffed(spark, p.curated, fresh,
      CuratedBucketCol)

  /** Whether the committed shard epoch already derives from curated
    * version `curVer` under `conf`'s sharding shape. False until the
    * first epoch's marker lands, and for any legacy marker predating
    * the (n_shards, order_col) columns — a conf whose shape the marker
    * can't vouch for must rebuild, never skip. */
  private def shardsFromMatches(spark: SparkSession, p: Paths,
                                curVer: Long, conf: Conf): Boolean =
    AtomicRewrite.exists(spark, p.shardsFrom) && {
      val m = AtomicRewrite.read(spark, p.shardsFrom)
      m.columns.contains("n_shards") && m.columns.contains("order_col") &&
        m.select("curated_version", "n_shards", "order_col")
          .collect().headOption.exists(r =>
            r.getLong(0) == curVer && r.getInt(1) == conf.nShards &&
              r.getString(2) == ShardOrderCol)
    }

  /** The committed curated selection, bucket column dropped — what
    * [[runBatch]] returns. */
  def readCurated(spark: SparkSession, root: String): DataFrame =
    AtomicRewrite.read(spark, Paths(root).curated).drop(CuratedBucketCol)

  /** Partition prefix [[maintain]] folds historic corpus batches under;
    * [[runBatch]] rejects batch ids carrying it (collision guard). */
  val FoldPrefix = "fold-"

  /** Operational maintenance for a QUIESCED curation root — run between
    * batches on cadence, never concurrently with [[runBatch]]:
    *
    *  1. fold the dedup/near-dup stores' per-batch `batch_seq` dirs into
    *     ≤ `buckets` ([[StoreMaintenance.rebaseBatchPartitions]] — the
    *     small-dirs growth of append-only O(batch) commits);
    *  2. fold the corpus' per-batch `batch_id` dirs the same way (hash
    *     of the batch id, so a historic batch stays co-located).
    *     INCREMENTAL like the store rebase: only dirs not already under
    *     [[FoldPrefix]] fold — plus the fold buckets they land in —
    *     while every already-folded bucket rides the manifest by
    *     reference, and a corpus with nothing pending burns no version
    *     at all (the second consecutive maintain writes zero corpus
    *     bytes). Every watermarked batch's landing is immutable history
    *     — the watermark guard returns before [[landedBatch]] ever
    *     probes it — so the fold is only unsafe for a crashed batch
    *     still awaiting replay, which is why maintain REFUSES any root
    *     whose job's last recorded status isn't SUCCESS (and any corpus
    *     with no control row at all: a first batch that crashed
    *     mid-run);
    *  3. shrink the retrieval index's docstats bucket lists back to
    *     exact ([[IndexStore.maintain]] — the old∪new crash-replay
    *     upper bound accretes stale buckets under re-submission);
    *  4. vacuum superseded versions of every store under the root. The
    *     default retention keeps the [[AtomicRewrite.MinRetainHours]]
    *     age floor (a concurrent reader of an old snapshot — another
    *     session, a slow export — must not have its files deleted from
    *     under it); pass `retainHours = None` only on roots with no
    *     out-of-band readers, where keep-count alone governs.
    *
    * After: reads list O(buckets) dirs plus one per batch since the
    * fold, and GDPR erasure granularity coarsens from per-batch to
    * per-bucket for pre-fold rows — the [[StoreMaintenance]] dial. */
  def maintain(spark: SparkSession, root: String, buckets: Int = 16,
               keepVersions: Int = 3,
               retainHours: Option[Double] =
                 Some(AtomicRewrite.MinRetainHours),
               auditAnnVecmap: Boolean = false): Unit = {
    val p = Paths(root)
    val last =
      if (!AtomicRewrite.exists(spark, p.control)) None
      else AtomicRewrite.read(spark, p.control)
        .filter(col("job_name") === Job)
        // by NAME, never a positional Row index: a Watermarks schema
        // evolution must fail loudly here, not silently read another
        // column past the quiesce guard
        .select("last_status").collect().headOption
        .map(_.getString(0))
    require(last.forall(_ == "SUCCESS"),
      s"maintain requires a quiesced root whose last batch committed — " +
        s"job status is ${last.getOrElse("<absent>")}; a crashed batch " +
        "must replay to convergence before its landing is folded")
    require(last.nonEmpty || !AtomicRewrite.exists(spark, p.corpus),
      "corpus exists with no control row — a first batch crashed " +
        "mid-run; replay it to completion before maintenance")
    // the five per-store maintenance passes touch DISJOINT store roots
    // with no ordering contract between them (each store's internal
    // crash ordering lives inside its own pass) — run them as
    // concurrent branches (the [[Runner.runBatch]] pattern): each pass
    // is driver-gap-heavy small commits, and serializing them leaves
    // the executors idle most of the wall. All branches settle before
    // any failure propagates.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
    val passes = Seq(
      Future(StoreMaintenance.rebaseBatchPartitions(spark, p.dedupStore, buckets)),
      Future(StoreMaintenance.rebaseBatchPartitions(spark, p.nearDupStore, buckets)),
      Future(maintainCorpus(spark, p, buckets)),
      // shrink the index's docstats bucket lists back to exact (the
      // old∪new crash-replay upper bound only ever grows under
      // re-submission; maintenance is where it converges) — a no-op
      // burning no version when nothing is stale
      Future(IndexStore.maintain(spark, p.index)),
      // (re)establish the ANN vecmap coverage proof — a version-keyed
      // no-op when covering, one narrow backfill otherwise. On the slow
      // (vacuum) cadence, pass auditAnnVecmap = true: the unconditional
      // backfill purges orphan intent rows a never-replayed crashed
      // append left behind and restores erasability after an
      // immutable-embedding contract violation (AnnIndexStore.maintain's
      // audit contract) — both invisible to the version-keyed skip
      Future(AnnIndexStore.maintain(spark, p.ann, audit = auditAnnVecmap)))
    val settled = passes.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    Runner.settleAll(settled)
    val ip = IndexStore.Paths(p.index)
    val sp = TrainingShards.Paths(p.shards)
    val ap = AnnIndexStore.Paths(p.ann)
    // (TrainingShards' manifest_from, IndexStore's docstats_shrunk_at /
    // docstats_chain_clean and AnnIndexStore's vecmap_covers are plain
    // hint FILES, not versioned tables — nothing to vacuum)
    val sweeps = Seq(p.control, p.dedupStore, p.nearDupStore, p.corpus,
      p.curated, p.shardsFrom, sp.shards, sp.manifest, ip.postings,
      ip.docstats, ip.stats, ap.centroids, ap.cells, ap.vecmap)
      .filter(AtomicRewrite.exists(spark, _))
      .map(r => Future(AtomicRewrite.vacuum(spark, r, keepVersions, retainHours)))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    Runner.settleAll(sweeps)
  }

  /** Step 2 of [[maintain]]: fold the corpus' per-batch `batch_id` dirs
    * into ≤ `buckets` (see the maintain doc). */
  private def maintainCorpus(spark: SparkSession, p: Paths,
                             buckets: Int): Unit =
    if (AtomicRewrite.exists(spark, p.corpus)) {
      // incremental corpus fold: only batch dirs NOT already under
      // FoldPrefix fold (each into the fold bucket its id hashes to),
      // already-folded buckets ride the manifest by reference, and
      // nothing pending = no commit — the StoreMaintenance shape keyed
      // by batch_id strings
      val corpus = AtomicRewrite.read(spark, p.corpus)
      // pending = unfolded batch dirs, PLUS fold dirs outside the
      // current bucket bound (a shrunk `buckets` dial refolds them the
      // same incremental way — the batch_seq stores' numeric refold,
      // keyed on the fold suffix here; runBatch's collision guard makes
      // every fold-* dir ours, so the suffix is always numeric)
      val pending = corpus.select("batch_id").distinct()
        .filter(!col("batch_id").startsWith(FoldPrefix) ||
          substring(col("batch_id"), FoldPrefix.length + 1, 20)
            .cast("long") >= buckets)
        .collect().map(_.getString(0)).toSeq
      if (pending.nonEmpty) {
        val foldOf = concat(lit(FoldPrefix),
          pmod(xxhash64(col("batch_id")), lit(buckets.toLong)))
        // fold-bucket names via the engine's own hash (never a driver
        // reimplementation that could diverge from the stored layout)
        val targets = AtomicRewrite.literalFrame(spark,
            pending.map(org.apache.spark.sql.Row(_)),
            corpus.select("batch_id").schema)
          .select(foldOf.as("batch_id")).distinct()
          .collect().map(_.getString(0)).toSeq
        val folded = corpus.filter(col("batch_id").isin(pending: _*))
          .withColumn("batch_id", foldOf)
        val survivors = corpus.filter(col("batch_id").isin(targets: _*))
        AtomicRewrite.writePartitions(spark, p.corpus,
          survivors.unionByName(folded), Seq("batch_id"),
          replaced = Some(AtomicRewrite.literalFrame(spark,
            (pending ++ targets).distinct.map(org.apache.spark.sql.Row(_)),
            corpus.select("batch_id").schema)))
      }
    }

  /** Per-layer [[Gdpr.StoreErasure]] hooks covering EVERY derived
    * artifact under a curation root — wire as
    * `GdprRequests.runIncremental(..., storesFor = _ =>
    * CurationRunner.storeErasures(spark, root))` so one incoming
    * erasure request propagates through the composed pipeline's whole
    * persistent state (dedup fingerprints, near-dup signatures, landed
    * corpus, curated selection, published shard epoch, BM25 postings,
    * ANN cells) in the
    * same watermarked cycle, one audit row per store that actually held
    * the subject (the reference's propagate-everywhere contract,
    * gdpr/gdpr_propagate_erasure.py, at composed-pipeline scope).
    *
    * Order is part of the contract — [[Gdpr.forgetStores]] runs hooks
    * in sequence: the dedup store keys on CONTENT fingerprints, and the
    * only subject→content mapping lives in the corpus this same
    * sequence later deletes, so the fingerprint hook must run first.
    *
    * Subjects are DOCUMENTS here: `subject_id` carries the corpus
    * `idCol` value; the ANN hook assumes document-keyed embeddings
    * (`vec_id` = doc id, the layout [[runBatch]] ingests). Every hook
    * no-ops (Nil — no version burned, no false audit) when its store
    * doesn't exist yet or holds nothing of the subject, and every
    * delete is partition-aware: O(touched buckets/shards/batches),
    * never O(store). */
  /** [[storeErasures]] with the dependency structure made explicit for
    * [[Gdpr.forgetStoresStaged]]: stage 1 is the dedup-store hook alone
    * (it READS the corpus the later hooks delete — the ordering that
    * was the whole-sequence contract), stage 2 is every other store —
    * disjoint roots, no cross-reads — erased concurrently. */
  def storeErasureStages(spark: SparkSession, root: String,
                         conf: Conf = Conf()): Seq[Seq[Gdpr.StoreErasure]] = {
    val all = storeErasures(spark, root, conf)
    Seq(Seq(all.head), all.tail)
  }

  def storeErasures(spark: SparkSession, root: String,
                    conf: Conf = Conf()): Seq[Gdpr.StoreErasure] = {
    val p = Paths(root)
    def asCol(subjects: DataFrame, name: String): DataFrame =
      subjects.select(col("subject_id").as(name))
    Seq(
      Gdpr.StoreErasure("curation/dedup_store", Seq("fingerprint"),
        subjects =>
          if (!AtomicRewrite.exists(spark, p.corpus)) Nil
          else {
            // the subject's fingerprints derive from its landed text —
            // read BEFORE the corpus hook below deletes it; matched
            // fingerprints map back to subject ids through the same
            // (subject, fingerprint) pairing. A doc REJECTED as a dup
            // never landed, so its content exists nowhere to erase, and
            // the canon doc's fingerprint rightly survives its request.
            val pairs = AtomicRewrite.read(spark, p.corpus)
              .join(subjects, col(conf.idCol) === col("subject_id"))
              .select(col("subject_id"),
                DedupStore.textFingerprint(col(conf.textCol))
                  .as("fingerprint"))
            val matched = DedupStore.forgetMatched(spark, p.dedupStore,
              pairs.select("fingerprint"))
            if (matched.isEmpty) Nil
            else pairs.filter(col("fingerprint").isin(matched: _*))
              .select("subject_id").distinct().collect()
              .map(_.get(0)).toSeq
          }),
      Gdpr.StoreErasure("curation/neardup_store", Seq("minhash_signature"),
        subjects =>
          // content-derived like the fingerprints, but keyed directly by
          // doc id — no corpus read needed, any order is safe
          if (!AtomicRewrite.exists(spark, p.nearDupStore)) Nil
          else NearDupStore.forgetMatched(spark, p.nearDupStore,
            asCol(subjects, "doc_id"))),
      Gdpr.StoreErasure("curation/corpus",
        Seq(conf.textCol, "n_tokens", "quality_score"),
        subjects => AtomicRewrite.deleteMatchingKeys(spark, p.corpus,
          asCol(subjects, conf.idCol), conf.idCol)),
      Gdpr.StoreErasure("curation/curated",
        Seq(conf.textCol, "n_tokens", "quality_score"),
        subjects => AtomicRewrite.deleteMatchingKeys(spark, p.curated,
          asCol(subjects, conf.idCol), conf.idCol)),
      Gdpr.StoreErasure("curation/training_shards",
        Seq(conf.textCol, "n_tokens"),
        subjects =>
          if (!AtomicRewrite.exists(spark,
            TrainingShards.Paths(p.shards).manifest)) Nil
          else TrainingShards.forgetMatched(spark, p.shards,
            asCol(subjects, conf.idCol), conf.idCol)),
      Gdpr.StoreErasure("curation/bm25_index", Seq("postings", "dl"),
        subjects => IndexStore.forgetMatched(spark, p.index,
          asCol(subjects, "doc_id"))),
      Gdpr.StoreErasure("curation/ann_index", Seq("embedding"),
        subjects => AnnIndexStore.forgetMatched(spark, p.ann,
          asCol(subjects, "vec_id"))))
  }
}
