package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The final materialization step of a curation run: write the selected,
  * ordered corpus into `nShards` training shards a data loader can
  * consume independently, plus a manifest table describing each shard.
  * (The reference pipeline's analog is the gold-layer publish step —
  * partitioned tables a consumer reads without touching upstream state;
  * here the consumer is a trainer, and the contract is shard-granular.)
  *
  * Two assignment modes, both deterministic (same corpus → byte-stable
  * assignment, no RNG, no timestamps):
  *
  *  - [[build]] (range mode): shards are CONTIGUOUS blocks of the given
  *    training order (e.g. q117's `train_pos`), split at token
  *    boundaries so every shard carries ~equal token mass: shard =
  *    floor((running_tokens − 1) / ceil(total/n)). The running total is
  *    [[graft.ops.PrefixSum]] — never a single-partition window — and
  *    a shard's token overshoot is bounded by one document (the split
  *    is greedy at doc granularity).
  *  - [[buildHashed]] (hash mode): order-free balanced sharding by
  *    salted hash of the id — the shape for shuffled training, one
  *    narrow map, no prefix machinery at all.
  *
  * The write is one [[AtomicRewrite]] snapshot partitioned by
  * `shard_id` (readers see the old epoch until the pointer flips, and a
  * re-run replaces rather than appends), and the manifest is written
  * AFTER the shard data commits: a crash between the two leaves data
  * without manifest — detectable and re-runnable — never a manifest
  * promising shards that don't exist.
  *
  * Erasure: a published epoch carries FULL document rows, so unlike the
  * aggregate-only artifacts ([[LmStore]], [[TokenizerStore]], trained
  * centroids) it is inside the GDPR propagate-everywhere contract
  * (reference gdpr/gdpr_propagate_erasure.py:360-719 rewrites every
  * published downstream layer). [[forget]] removes a subject's rows
  * partition-aware — only the shard partitions holding one are
  * rewritten — and refreshes the manifest from the committed survivors,
  * so no manifest ever over-promises docs or tokens a loader won't
  * find. Wire it into `GdprRequests.storesFor` beside the corpus
  * stores (the [[graft.pipeline.Gdpr.StoreErasure]] hook).
  */
object TrainingShards {

  case class Paths(root: String) {
    val shards: String = s"$root/shards"
    val manifest: String = s"$root/manifest"
    /** Plain hint file ([[graft.tx.AtomicRewrite.readHint]]): the
      * shard-table version the committed manifest derives from — the
      * validity stamp that lets a publish carry unmoved shards'
      * manifest rows instead of re-aggregating the whole committed
      * epoch. NOT a versioned table: missing/garbled always reads as
      * "recompute in full", so it carries zero correctness weight (and
      * zero per-publish commit cost). Holds a version number only, no
      * subject data. */
    val manifestFrom: String = s"$root/manifest_from"
  }

  /** Token-balanced contiguous sharding of `corpus` by `orderCol`.
    * `corpus` must carry `orderCol` (a unique total order — q117's
    * `train_pos`) and `n_tokens`; all other columns ride along into the
    * shard files.
    *
    * The shard-table commit is partition-DIFFED
    * ([[AtomicRewrite.writePartitionsDiffed]]): a re-publish rewrites
    * only the shards whose content moved against the committed epoch —
    * a selection change confined to the tail of the training order
    * touches only the tail shards, and an IDENTICAL re-publish writes
    * zero shard bytes. The manifest derives from the COMMITTED shard
    * state (never the in-flight frame) and is maintained
    * INCREMENTALLY: a 1-row `manifest_from` marker, committed after
    * each manifest, stamps the shard version it describes — a publish
    * whose marker matches carries unmoved shards' rows verbatim and
    * re-aggregates ONLY the moved shard partitions (plan-pruned), and
    * an identical re-publish skips the manifest entirely; any stamp
    * mismatch (legacy table, a crash between the shard and manifest
    * commits or before the marker) recomputes the manifest in full and
    * heals, the IndexStore stats-summary fallback discipline. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            nShards: Int, orderCol: String = "train_pos"): Unit = {
    require(nShards > 0, s"shard count must be positive, got $nShards")
    val p = Paths(root)
    val (assigned, cached) = rangeAssign(corpus, nShards, orderCol)
    val v0 = AtomicRewrite.currentVersion(spark, p.shards)
    val moved = AtomicRewrite.writePartitionsDiffedMoved(spark, p.shards,
      assigned, "shard_id")
    cached.unpersist()
    refreshManifestIncremental(spark, root, orderCol, v0, moved)
  }

  /** The range-mode assignment frame — exposed package-private so
    * PlanAssertionsSpec can pin its physical shape (the only
    * unpartitioned window must be [[graft.ops.PrefixSum]]'s
    * O(partitions) offset frame, never a corpus-sized global cumsum).
    * Returns (assigned, cached); the caller unpersists `cached` after
    * materializing whatever it derives from `assigned`. */
  private[graft] def rangeAssign(corpus: DataFrame, nShards: Int,
                                 orderCol: String): (DataFrame, DataFrame) = {
    val (cum, cached, total) = graft.ops.PrefixSum.runningTotalSummed(corpus,
      Seq(col(orderCol)), col("n_tokens"), "__cum")
    // the per-shard target derives from the prefix pass's own exact long
    // total (the same double divide + ceil the aggregate computed; an
    // empty corpus floors at 1 like the old greatest(…, 1)), so the
    // assignment map carries a literal — no second aggregate action, no
    // broadcast build
    val totalTokens = total match {
      case null => 0L
      case t: java.lang.Long => t.longValue
    }
    val targetV =
      math.max(math.ceil(totalTokens / nShards.toDouble).toLong, 1L)
    // clamped into [0, nShards): without the floor-at-0, a zero-token
    // document at the HEAD of the order (running total still 0) would
    // compute floor(-1/target) = -1 and land in a shard no loader
    // iterating 0..n-1 ever reads
    val assigned = cum
      .withColumn("shard_id",
        greatest(least(floor((col("__cum") - 1) / lit(targetV)),
          lit(nShards - 1L)), lit(0L)).cast("int"))
      .drop("__cum")
    (assigned, cached)
  }

  /** Order-free balanced sharding by salted hash of `idCol` (`corpus`
    * must still carry `n_tokens` for the manifest). Shard commit
    * partition-diffed like [[build]]'s — here the win is even sharper,
    * since hashed assignment is order-free: new docs touch only the
    * shards they hash into, and every other shard rides by reference. */
  def buildHashed(spark: SparkSession, root: String, corpus: DataFrame,
                  nShards: Int, idCol: String = "doc_id"): Unit = {
    require(nShards > 0, s"shard count must be positive, got $nShards")
    val p = Paths(root)
    val assigned = corpus.withColumn("shard_id",
      pmod(xxhash64(lit("shard"), col(idCol)), lit(nShards.toLong))
        .cast("int"))
    val v0 = AtomicRewrite.currentVersion(spark, p.shards)
    val moved = AtomicRewrite.writePartitionsDiffedMoved(spark, p.shards,
      assigned, "shard_id")
    refreshManifestIncremental(spark, root, idCol, v0, moved)
  }

  /** One row per shard: doc/token counts and the `orderCol` span —
    * everything a loader needs to plan an epoch without listing files.
    * Carries `order_col` (the span's column name) so the manifest is
    * self-describing: [[forget]] re-derives it without being told how
    * the epoch was ordered. */
  private def manifestOf(assigned: DataFrame, orderCol: String): DataFrame =
    assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min(orderCol).as("order_min"),
        max(orderCol).as("order_max"))
      .withColumn("order_col", lit(orderCol))

  /** Right-to-be-forgotten for a PUBLISHED epoch (the
    * [[DedupStore.forget]] shape): remove the given ids' rows from the
    * shard tables, then refresh the manifest from the COMMITTED
    * survivors. Partition-aware ([[AtomicRewrite.deleteMatching]]):
    * only the shard partitions holding a forgotten doc are rewritten,
    * every other shard rides the manifest by reference — O(touched
    * shards), never O(epoch) — and untouched shards stay byte-identical
    * (loaders mid-epoch keep valid file sets; a fully-emptied shard
    * vanishes from the manifest). Returns whether anything was
    * rewritten; [[forgetMatched]] additionally returns the matched ids
    * for per-subject audit trails. */
  def forget(spark: SparkSession, root: String, docIds: DataFrame,
             idCol: String = "doc_id"): Boolean =
    forgetImpl(spark, root, docIds, idCol, collectKeys = false).nonEmpty

  /** [[forget]] returning the matched ids (empty = epoch untouched, no
    * version burned) — the audit-precision shape for
    * [[Gdpr.StoreErasure]]. */
  def forgetMatched(spark: SparkSession, root: String, docIds: DataFrame,
                    idCol: String = "doc_id"): Seq[Any] =
    forgetImpl(spark, root, docIds, idCol, collectKeys = true)

  /** Shared body of [[forget]]/[[forgetMatched]]. The delete already
    * knows exactly which shard partitions it rewrote, so the manifest
    * refresh rides [[refreshManifestIncremental]] — prev rows verbatim
    * for untouched shards, a plan-pruned re-aggregate for the touched
    * ones, O(touched shards) instead of a full-epoch re-read (any stale
    * marker still falls back to the full recompute and heals). Returns
    * the matched ids (a `true` sentinel when `collectKeys` is off). */
  private def forgetImpl(spark: SparkSession, root: String,
                         docIds: DataFrame, idCol: String,
                         collectKeys: Boolean): Seq[Any] = {
    val p = Paths(root)
    val orderCol = refreshableOrderCol(spark, root)
    // the version the delete replaces, read BEFORE it commits — the
    // incremental refresh's validity stamp
    val v0 = AtomicRewrite.currentVersion(spark, p.shards)
    AtomicRewrite.stageDeleteMatching(spark, p.shards, docIds, idCol,
      collectKeys, pruneTo = None) match {
      case None => Nil
      case Some(d) =>
        d.promote()
        refreshManifestIncremental(spark, root, orderCol, v0,
          Some(d.touched.map(_.get(0))))
        if (collectKeys) d.matched else Seq(true)
    }
  }

  /** The epoch's recorded order column — resolved (and its presence
    * REQUIRED) BEFORE any delete commits: failing after the shard
    * rewrite would leave a manifest permanently over-promising deleted
    * docs, the exact state the refresh exists to prevent, with no
    * recovery short of re-publishing from the original corpus. */
  private def refreshableOrderCol(spark: SparkSession, root: String): String = {
    val prev = AtomicRewrite.read(spark, Paths(root).manifest)
    require(prev.columns.contains("order_col"),
      s"$root manifest predates the self-describing order_col column — " +
        "re-publish the epoch (build) before erasing from it")
    prev.select("order_col").limit(1).collect()
      .headOption.map(_.getString(0))
      // a manifest can only be row-less if the epoch was ALREADY fully
      // erased, so any column yields the same empty aggregate — but the
      // fallback must be a column the shard table actually HAS (an
      // epoch keyed by something other than doc_id would otherwise hit
      // an unresolved-column error if this invariant ever shifts), so
      // take the table's first column rather than assuming a name
      .getOrElse(
        AtomicRewrite.read(spark, Paths(root).shards).columns.head)
  }

  /** Re-derive the manifest from the committed shard table in FULL and
    * stamp the marker — the repair / slow path ([[forget]] uses it;
    * [[refreshManifestIncremental]] falls back to it on any stamp
    * mismatch). */
  private def refreshManifest(spark: SparkSession, root: String,
                              orderCol: String): Unit = {
    val p = Paths(root)
    AtomicRewrite.write(spark, p.manifest,
      manifestOf(AtomicRewrite.read(spark, p.shards), orderCol))
    stampManifest(spark, p)
  }

  /** Maintain the manifest after a diffed publish, reading O(moved
    * shards) instead of the whole committed epoch. Valid only when the
    * committed manifest provably describes the shard version the diff
    * REPLACED (marker == v0) under the SAME order column: then unmoved
    * shards' rows carry verbatim (their content is byte-identical by
    * the diff's signature), moved shards re-aggregate from their
    * plan-pruned committed partitions, dropped shards vanish, and a
    * no-op publish (nothing moved, version unchanged) skips the
    * manifest write entirely. Everything else — first build, full
    * snapshot (`moved = None`), legacy/stale marker, order change —
    * recomputes in full. Marker committed AFTER the manifest, so every
    * crash window reads as "stale" and heals by recompute. */
  private def refreshManifestIncremental(spark: SparkSession, root: String,
                                         orderCol: String, v0: Option[Long],
                                         moved: Option[Seq[Any]]): Unit = {
    val p = Paths(root)
    val valid = v0.isDefined && moved.isDefined &&
      manifestFromVersion(spark, p) == v0 &&
      AtomicRewrite.exists(spark, p.manifest) && {
        val m = AtomicRewrite.read(spark, p.manifest)
        m.columns.contains("order_col") &&
          m.select("order_col").limit(1).collect()
            .headOption.forall(_.getString(0) == orderCol)
      }
    if (!valid) { refreshManifest(spark, root, orderCol); return }
    val movedIds = moved.get
    if (movedIds.isEmpty) return // no-op publish: manifest already exact
    val prev = AtomicRewrite.read(spark, p.manifest)
      .filter(!col("shard_id").isin(movedIds: _*))
    val rewritten = manifestOf(
      AtomicRewrite.read(spark, p.shards)
        .filter(col("shard_id").isin(movedIds: _*)), orderCol)
    AtomicRewrite.write(spark, p.manifest, prev.unionByName(rewritten))
    stampManifest(spark, p)
  }

  /** Stamp the hint file with the CURRENT committed shard version. */
  private def stampManifest(spark: SparkSession, p: Paths): Unit =
    AtomicRewrite.writeHint(spark, p.manifestFrom,
      AtomicRewrite.currentVersion(spark, p.shards).get)

  /** The shard version the committed manifest derives from — None for
    * a legacy table (pre-marker), a garbled file, or a crash between
    * the manifest and marker writes; all read as "recompute in full". */
  private def manifestFromVersion(spark: SparkSession, p: Paths): Option[Long] =
    AtomicRewrite.readHint(spark, p.manifestFrom)

  def readShard(spark: SparkSession, root: String, shardId: Int): DataFrame =
    AtomicRewrite.read(spark, Paths(root).shards)
      .filter(col("shard_id") === shardId)

  def readManifest(spark: SparkSession, root: String): DataFrame =
    AtomicRewrite.read(spark, Paths(root).manifest)
}
