package graft.pipeline

import graft.tx.AtomicRewrite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the production form of the inline
  * retrieval pair (q104 posting lists, q105 BM25 scoring): postings
  * live in a graft table hive-partitioned by a TOKEN-HASH BUCKET,
  * queries read only the buckets their terms hash into, batches append
  * incrementally, and a subject's documents erase partition-aware
  * (the [[DedupStore]]/[[AnnIndexStore]] store contract applied to the
  * retrieval layer; reference analog: the gold-layer serving tables a
  * consumer queries without touching upstream state).
  *
  * Layout:
  * {{{
  *   <root>/postings   // token, doc_id, tf, dl — hive-partitioned by
  *                     // bucket = pmod(xxhash64(token), buckets)
  *   <root>/docstats   // doc_id, dl, buckets, buckets_live —
  *                     // partitioned by doc-hash bucket; `buckets` is
  *                     // the doc's posting-bucket list (an UPPER
  *                     // BOUND — see append — shrunk back to exact by
  *                     // [[maintain]]), the record that keeps append
  *                     // discovery O(batch); `buckets_live` is the
  *                     // CURRENT text's exact list — with the
  *                     // chain-clean proof (see maintain) it makes the
  *                     // shrink an O(docstats) pass that never opens
  *                     // postings
  *   <root>/stats      // ONE row (n_docs, sum_dl, docstats_version) —
  *                     // the running corpus summary, maintained
  *                     // INCREMENTALLY by appends (exact long deltas,
  *                     // version-stamped against the docstats commit it
  *                     // reflects) and recomputed in full whenever the
  *                     // stamp doesn't match (crash repair, forget,
  *                     // pre-upgrade summaries)
  * }}}
  *
  * Scale shape:
  *  - a QUERY collects its term set (bounded by the query batch, the
  *    q83 probed-cell pattern), reads ONLY the [[PostingBuckets]]
  *    partitions those terms hash into (manifest + hive pruning), and
  *    ranks through the [[graft.plans.TopKPerKey]] heap — never a scan
  *    of the full index. `dl` is DENORMALIZED into the postings so
  *    scoring needs no corpus-sized doc-stats join.
  *  - df comes from the postings already read (one row per (token,
  *    doc)); N and avgdl come from the 1-row `stats` summary (the
  *    watermark-table shape) — the serving path never re-aggregates the
  *    O(docs) docstats table, and appends maintain the summary by exact
  *    O(batch) deltas ([[statsIncrement]]) so the WRITE path doesn't
  *    either. `sum_dl` is an exact LONG (document
  *    lengths are integral), so `sum_dl / n_docs` in double is
  *    bit-identical to `avg(dl)` over the committed docstats — scores
  *    cannot drift between the summary and a recompute.
  *  - APPEND replaces the batch's doc ids (replacement semantics — a
  *    re-submitted doc's OLD tokens may live in buckets its new tokens
  *    never touch, so insert-only merging would strand stale postings)
  *    in ONE atomic commit per table: the replaced partition set is the
  *    union of the buckets holding the batch ids' old postings and the
  *    buckets the new postings land in, and the committed frame is
  *    (survivors of those buckets) ∪ (new postings) — erase and insert
  *    can never be split by a crash. The commit writes O(touched
  *    buckets); finding the old buckets is O(batch) — each doc's
  *    posting-bucket list lives in docstats, so discovery reads the
  *    batch ids' doc-bucket partitions of the NARROW docstats table
  *    (partition-pruned at plan time) instead of semi-join-scanning the
  *    full postings table per batch, the hot-ingest-path analog of the
  *    watermark read that keeps bronze extracts O(increment).
  *  - FORGET deletes by doc_id: the touched partition set is the
  *    forgotten docs' distinct token buckets — capped at
  *    [[PostingBuckets]] regardless of corpus size. N/avgdl/df shift
  *    automatically on the next query because they derive from the
  *    committed tables, matching the reference's "derived layers
  *    recompute from scrubbed state" erasure contract.
  *
  * BM25 determinism: per-term contributions are bit-identical doubles
  * (same IEEE formula both engines), summed per (query, doc) through
  * DECIMAL(38,6) — exact and order-independent, the q108 convention —
  * then rounded to 6; ranking ties break on doc_id.
  */
object IndexStore {

  case class Paths(root: String) {
    val postings: String = s"$root/postings"
    val docstats: String = s"$root/docstats"
    val stats: String = s"$root/stats"
  }

  /** Token-hash partition count of the postings table — the cap on how
    * many partitions a doc-keyed erasure can touch. */
  val PostingBuckets = 32
  // forgetScope unions bucket lists as a single-Long bitmask — a bucket
  // id must fit one bit of a bigint (shiftleft wraps mod 64 past that)
  require(PostingBuckets <= 64,
    "PostingBuckets outgrew the 64-bit forgetScope mask — widen it")

  /** Doc-hash partition count of the narrow docstats table. */
  val DocBuckets = 16

  /** BM25 parameters (the q105 constants). */
  val K1 = 1.2
  val B = 0.75

  private def bucketOf(token: Column): Column =
    pmod(xxhash64(token), lit(PostingBuckets.toLong)).cast("int")

  private def docBucketOf(id: Column): Column =
    pmod(xxhash64(id), lit(DocBuckets.toLong)).cast("int")

  /** One (doc_id, text) row per doc id: a batch carrying SEVERAL
    * versions of the same id (an at-least-once source compacting a
    * correction into one micro-batch) keeps the max-content-hash
    * version — deterministic, so every derived table (postings AND
    * docstats) agrees on ONE text. Without this, postingsOf's keyed
    * count would merge both versions' tokens (old tokens ghost-match
    * forever) and docstats would double-count the doc into N/avgdl.
    * Version ORDER is the source's concern: a correction that must win
    * belongs in a later batch (the streaming replacement contract). */
  private def canonicalBatch(corpus: DataFrame, textCol: String,
                             idCol: String): DataFrame =
    corpus.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .groupBy("doc_id")
      .agg(max_by(col("__text"), sha2(col("__text"), 256)).as("__text"))
      // tokenize ONCE, here: both derived tables (postings, docstats)
      // read the pinned token arrays, so a build/append pays one
      // tokenize pass over the batch, not one per table
      .select(col("doc_id"),
        graft.ops.TextOps.tokens(col("__text")).as("__toks"))

  /** (token, doc_id, tf, dl, bucket) postings of a canonical batch —
    * term frequencies via one explode + keyed count, dl carried on
    * every row so scoring never joins the corpus. */
  private def postingsOf(canonical: DataFrame): DataFrame =
    canonical
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .withColumn("bucket", bucketOf(col("token")))

  /** (doc_id, dl, buckets, buckets_live, doc_bucket) per canonical doc.
    * `buckets` is the sorted distinct posting buckets the doc's tokens
    * hash into (≤ [[PostingBuckets]] ints) — the per-doc record that
    * lets a later re-submission find the doc's old postings WITHOUT
    * scanning the postings table (see [[append]]). `buckets_live`
    * starts equal and stays the CURRENT text's exact list while
    * `buckets` grows into the crash-replay union. */
  private def docstatsOf(canonical: DataFrame): DataFrame =
    canonical
      .select(col("doc_id"),
        size(col("__toks")).cast("double").as("dl"),
        array_sort(array_distinct(
          transform(col("__toks"), t => bucketOf(t)))).as("buckets"))
      .withColumn("buckets_live", col("buckets"))
      .withColumn("doc_bucket", docBucketOf(col("doc_id")))

  /** Build (replace) the index from a corpus. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val p = Paths(root)
    // entry discipline (the [[forget]] pattern): the postings rewrite
    // below does not bump the docstats version, so a crash between the
    // postings and docstats commits of a REBUILD would leave a chain
    // hint still matching the old docstats while postings already
    // describe the new corpus — a false proof a later clean-chain pass
    // would trust (stranding ghost postings behind the O(docstats)
    // shrink). Break both hints before the first write; the marks at
    // the end restore them at the new, provably-exact version.
    breakMaintHints(spark, root, p)
    // canon pinned: postings and docstats both derive from it (one
    // tokenize/canonicalize pass, not two), and at BUILD time the two
    // table writes have no intent-ordering contract (a crash mid-build
    // is "no complete index" either way — the hints are already broken
    // and append() requires BOTH tables) — so they run as concurrent
    // branches (the Runner.runBatch pattern)
    val canon = canonicalBatch(corpus, textCol, idCol).persist()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
    val writes = Seq(
      Future(AtomicRewrite.write(spark, p.postings,
        postingsOf(canon), partitionBy = Seq("bucket"))),
      Future(AtomicRewrite.write(spark, p.docstats,
        docstatsOf(canon), partitionBy = Seq("doc_bucket"))))
      .map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    canon.unpersist()
    Runner.settleAll(writes)
    refreshStats(spark, root)
    // a fresh build IS an exact state: lists equal the live lists equal
    // the postings — start the clean chain and the shrink convergence
    val v = AtomicRewrite.currentVersion(spark, p.docstats).get
    markChain(spark, root, v)
    markShrunk(spark, root, v)
  }

  /** Append a batch incrementally. Replacement semantics for
    * re-submitted doc ids: their previous postings are erased and the
    * new ones inserted in ONE atomic commit per table — the replaced
    * partition set is (buckets holding the batch ids' old rows) ∪
    * (buckets the new rows land in), and the committed frame is the
    * survivors of those buckets plus the new rows. A changed doc's old
    * tokens may hash into buckets the new tokens never touch, which is
    * why the old buckets must join the replaced set: merge-only would
    * strand them as ghost hits.
    *
    * Old-bucket discovery is O(batch), never O(index): each doc's
    * posting-bucket list lives in docstats ([[docstatsOf]]), and the
    * batch's doc ids hash into ≤ [[DocBuckets]] doc-bucket partitions —
    * inlined as literals so the docstats read is partition-pruned at
    * plan time. (An index built before the bucket-list column falls
    * back to the legacy full-postings semi-join; rebuild to upgrade.)
    *
    * Three commits total (docstats, postings, stats), each atomic.
    * docstats commits FIRST as the batch's INTENT record: each batch
    * doc's stored list becomes (its old list ∪ its new buckets), so a
    * crash between the docstats and postings commits — even one
    * replayed with a DIFFERENT text version — re-discovers every bucket
    * any partially-committed version's postings could occupy. The lists
    * are therefore an upper BOUND on where a doc's rows live (monotone
    * under re-submission, capped at [[PostingBuckets]] ints): a stale
    * entry costs at most one extra bucket in a later rewrite's touched
    * set, never a ghost posting. The honest crash windows: a crash
    * between the docstats and postings commits counts the batch's new
    * dl while the old postings still serve; a crash before the stats
    * commit leaves the 1-row summary one batch behind the committed
    * docstats. Both states self-heal on the source's at-least-once
    * replay (the streaming sink's redelivery contract), and any later
    * successful mutation — or [[refreshStats]] directly — repairs the
    * summary, because stats always recomputes from COMMITTED docstats.
    * What can NEVER occur is the non-healing failure mode — a
    * half-merged doc, a stale ghost posting, or a batch silently
    * dropped between an erase and its insert, none of which replay
    * would repair. */
  def append(spark: SparkSession, root: String, batch: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val p = Paths(root)
    require(AtomicRewrite.exists(spark, p.postings) &&
        AtomicRewrite.exists(spark, p.docstats),
      s"no complete index at $root (postings + docstats) — build() an " +
        "index before appending to it")
    // pinned: postings and docstats both derive from it — one
    // canonicalize + tokenize pass per append, not one per table
    val canon = canonicalBatch(batch, textCol, idCol).persist()
    val ids = canon.select("doc_id")
    val post = postingsOf(canon).persist()
    val ds = docstatsOf(canon)
    val committed = AtomicRewrite.read(spark, p.docstats)
    if (!committed.columns.contains("buckets")) {
      // pre-upgrade index (docstats without the bucket-list column):
      // the legacy full-postings discovery, legacy docstats schema.
      // build() writes the upgraded layout.
      mergeReplace(spark, p.postings, ids, post, "bucket")
      mergeReplace(spark, p.docstats,
        ids, ds.drop("buckets", "buckets_live"), "doc_bucket")
    } else {
      // ≤ DocBuckets literal ints — prune the discovery read's docstats
      // partitions at plan time (severed lineage, the probed-cell idiom)
      val docBuckets = ids.select(docBucketOf(col("doc_id")).as("doc_bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (docBuckets.isEmpty) { post.unpersist(); canon.unpersist(); return } // empty batch: no-op
      val v0 = AtomicRewrite.currentVersion(spark, p.docstats).get
      val live = committed.columns.contains("buckets_live")
      // CLEAN CHAIN: every append since the last provably-exact state
      // (build / mode-A maintain) completed fully, so each committed
      // doc's postings live in exactly its buckets_live — the old side
      // of this batch's union can be the LIVE list, not the accreted
      // crash-replay union: the stored bound stays ≤ two texts wide
      // under clean-chain resubmission instead of growing monotonically
      val chainClean = live && chainAt(spark, root).contains(v0)
      val old = oldBucketLists(spark, p, ids, docBuckets, live)
      val oldSide =
        if (chainClean) coalesce(col("__oldlive"), col("__old"))
        else col("__old")
      val joined = ds
        .join(old, Seq("doc_id"), "left")
        .withColumn("buckets", array_sort(array_distinct(concat(
          col("buckets"),
          coalesce(oldSide, array().cast("array<int>"))))))
        .drop("__old", "__oldlive")
      // a v2 store (no buckets_live committed yet): keep its schema —
      // the column arrives via the one-time [[maintain]] upgrade, never
      // a mixed-schema partition commit. __olddl rides into the pinned
      // frame so the summary delta below is ONE aggregate over it.
      val intentDl = (if (live) joined else joined.drop("buckets_live"))
        .persist()
      val intent = intentDl.drop("__olddl")
      // the summary delta, from the SAME O(batch) pruned read, in one
      // action: new docs/lengths from every intent row, old ones from
      // the rows whose docstats entry existed (docstats holds one row
      // per doc and dl is never NULL, so count/sum over __olddl are
      // exactly the old side's aggregates)
      val delta = intentDl.agg(
        count(lit(1)).as("n_new"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("dl_new"),
        count(col("__olddl")).as("n_old"),
        coalesce(sum(col("__olddl").cast("long")), lit(0L)).as("dl_old"))
        .head()
      // docstats commits FIRST (the intent record): a batch id's old row
      // lives in the SAME doc bucket its new row lands in (doc_bucket is
      // a pure hash of the id), so the replaced set needs no discovery.
      // The ordering contract binds the POINTER SWAPS, not the staging —
      // so both tables STAGE concurrently (each against its own
      // committed state, which neither staging touches) and the
      // promotes then run in intent order. A crash with only docstats
      // promoted is the designed intent-without-postings window; a
      // crash before that leaves dot-dir staging the vacuum sweep
      // reclaims.
      val dsSurvivors = committed
        .filter(col("doc_bucket").isin(docBuckets: _*))
        .join(ids, Seq("doc_id"), "left_anti")
      // postings touched set = the union of the batch docs' (old ∪ new)
      // bucket lists — read from the intent frame, never the postings
      val touched = intent.select(explode(col("buckets")).as("bucket"))
        .distinct()
      val partIds = touched.collect().map(_.getInt(0)).toSeq
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
      val dsStage = Future(AtomicRewrite.stagePartitions(spark, p.docstats,
        dsSurvivors.unionByName(intent), Seq("doc_bucket"),
        replaced = Some(intent.select("doc_bucket").distinct())))
      val postStage = Future(
        if (partIds.isEmpty) None
        else {
          val survivors = AtomicRewrite.read(spark, p.postings)
            .filter(col("bucket").isin(partIds: _*))
            .join(ids, Seq("doc_id"), "left_anti")
          Some(AtomicRewrite.stagePartitions(spark, p.postings,
            survivors.unionByName(post), Seq("bucket"),
            replaced = Some(touched.toDF())))
        })
      // both stagings settle before EITHER promote: a staging failure
      // must abort the whole merge with zero pointers moved
      val dsStaged = scala.util.Try(Await.result(dsStage, Duration.Inf))
      val postStaged = scala.util.Try(Await.result(postStage, Duration.Inf))
      Runner.settleAll(Seq(dsStaged, postStaged))
      dsStaged.get.apply()            // intent first
      postStaged.get.foreach(_.apply())
      intentDl.unpersist()
      statsIncrement(spark, root, v0,
        delta.getLong(0) - delta.getLong(2),
        delta.getLong(1) - delta.getLong(3))
      // extend the clean chain ONLY if it was clean coming in (a broken
      // link means some OTHER doc's crash window may still be open —
      // this append can't vouch for it) and every commit above landed.
      // A crash anywhere before this line leaves the hint stale, which
      // reads as "broken" — the safe side ([[maintain]] heals by one
      // postings-scan pass).
      if (chainClean)
        markChain(spark, root,
          AtomicRewrite.currentVersion(spark, p.docstats).get)
      post.unpersist()
      canon.unpersist()
      return
    }
    post.unpersist()
    canon.unpersist()
    refreshStats(spark, root)
  }

  /** The batch ids' committed bucket lists and stored lengths —
    * (doc_id, __old, __olddl) — read from the docstats partitions the
    * ids hash into. Package-private so the spec can pin the discovery
    * plan: partition-pruned to the batch's doc buckets, and never a
    * postings read. */
  private[pipeline] def oldBucketLists(spark: SparkSession, p: Paths,
                                       ids: DataFrame,
                                       docBuckets: Seq[Any],
                                       live: Boolean = false): DataFrame =
    AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_bucket").isin(docBuckets: _*))
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("buckets").as("__old"),
        (if (live) col("buckets_live") else lit(null).cast("array<int>"))
          .as("__oldlive"),
        col("dl").as("__olddl"))

  /** Legacy one-commit replace-merge (pre-bucket-list indexes only):
    * touched = partitions holding `ids`' old rows — a full semi-join
    * scan of `table` — ∪ partitions `fresh` lands in. */
  private def mergeReplace(spark: SparkSession, table: String,
                           ids: DataFrame, fresh: DataFrame,
                           partCol: String): Unit = {
    val existing = AtomicRewrite.read(spark, table)
    val touched = existing.join(ids, Seq("doc_id"), "left_semi")
      .select(partCol).union(fresh.select(partCol)).distinct()
    val partIds = touched.collect().map(_.getInt(0)).toSeq
    if (partIds.nonEmpty) {
      val survivors = existing.filter(col(partCol).isin(partIds: _*))
        .join(ids, Seq("doc_id"), "left_anti")
      AtomicRewrite.writePartitions(spark, table,
        survivors.unionByName(fresh), Seq(partCol),
        replaced = Some(touched.toDF()))
    }
  }

  /** Recompute the 1-row corpus summary (doc count, exact total token
    * length) in FULL from the COMMITTED docstats and commit it, stamped
    * with the docstats version it reflects. This is the repair / slow
    * path: [[build]] and [[forget]] call it, and [[statsIncrement]]
    * falls back to it whenever the committed summary's stamp doesn't
    * match — a summary stranded by a crash, or one predating the
    * version stamp. Callable directly any time; stats always recompute
    * exactly from committed docstats. */
  def refreshStats(spark: SparkSession, root: String): Unit = {
    val p = Paths(root)
    val v = AtomicRewrite.currentVersion(spark, p.docstats).getOrElse(
      throw new IllegalStateException(
        s"no committed docstats at ${p.docstats} to summarize"))
    AtomicRewrite.write(spark, p.stats,
      AtomicRewrite.read(spark, p.docstats)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"))
        .withColumn("docstats_version", lit(v))
        .coalesce(1))
  }

  /** The O(1) fast path of the summary maintenance: when the committed
    * summary's stamp equals the docstats version the append REPLACED
    * (`fromVersion`), the new summary is (old + exact long deltas),
    * stamped with the version the append committed — no docstats scan,
    * which together with the bucket-list discovery makes the whole
    * append path O(batch). Any stamp mismatch — a summary stranded by
    * a crash between the docstats and stats commits, a pre-stamp
    * summary, a missing stats table — falls back to [[refreshStats]]'s
    * full recompute, so correctness NEVER depends on the increment: a
    * replayed batch computes delta 0 against its own committed rows,
    * and a stale summary repairs itself on the next mutation. */
  private def statsIncrement(spark: SparkSession, root: String,
                             fromVersion: Long, dDocs: Long,
                             dDl: Long): Unit = {
    val p = Paths(root)
    val base =
      if (!AtomicRewrite.exists(spark, p.stats)) None
      else {
        val s = AtomicRewrite.read(spark, p.stats)
        if (!s.columns.contains("docstats_version")) None
        else s.select("n_docs", "sum_dl", "docstats_version")
          .collect().headOption
          .filter(_.getLong(2) == fromVersion)
      }
    base match {
      case None => refreshStats(spark, root)
      case Some(row) =>
        val toVersion = AtomicRewrite.currentVersion(spark, p.docstats).get
        // the incremented summary lives on the driver — commit it
        // driver-side, zero jobs (the O(1) fast path should not pay a
        // scheduled job to write one row)
        AtomicRewrite.writeLocalRows(spark, p.stats,
          Seq(org.apache.spark.sql.Row(
            row.getLong(0) + dDocs, row.getLong(1) + dDl, toVersion)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("n_docs",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("sum_dl",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("docstats_version",
              org.apache.spark.sql.types.LongType, nullable = false))))
    }
  }

  /** Right-to-be-forgotten: remove the given doc ids' postings and
    * stats. O(subject), never O(corpus):
    *  - the 1-row summary repairs by [[statsIncrement]] with NEGATIVE
    *    deltas — the matched docs' (count, exact dl sum), read from
    *    their partition-pruned docstats buckets BEFORE the delete —
    *    instead of [[refreshStats]]'s full docstats re-aggregate
    *    (the [[append]] pattern applied to the erasure path; reference
    *    analog: the self-describing incremental watermark of
    *    reference/src/gold/_marts/facts/fact_trips.py:43-56);
    *  - the docstats delete's discovery is pruned to the ids' doc-hash
    *    buckets (doc_bucket is a pure hash of doc_id — always sound);
    *  - under the CLEAN-CHAIN proof the postings delete's discovery is
    *    pruned to the union of the matched docs' LIVE bucket lists
    *    (chain clean ⟹ every doc's committed postings sit inside its
    *    `buckets_live` ⊆ `buckets` AND a doc absent from docstats has
    *    no postings — see [[chainAt]]; the live list is the tighter
    *    sound bound, immune to the accreted union's crash-replay
    *    inflation); a broken chain falls back to the full-scan
    *    discovery, since a crashed build/append may have left postings
    *    outside any committed list.
    * Every fast path has a full-recompute fallback, so correctness
    * never depends on a hint or a stamp. N, avgdl and df shift
    * automatically on the next [[query]] because scoring derives them
    * from the committed tables. Returns whether anything was
    * rewritten; [[forgetMatched]] the matched ids for audit. */
  def forget(spark: SparkSession, root: String, ids: DataFrame): Boolean =
    forgetImpl(spark, root, ids, collectKeys = false)._1

  /** The [[forget]] entry discipline: remember which maintenance hints
    * (clean chain, shrunk convergence) currently hold, then invalidate
    * them — returns what to restore on completion. */
  private def breakMaintHints(spark: SparkSession, root: String,
                              p: Paths): (Boolean, Boolean) = {
    val v = AtomicRewrite.currentVersion(spark, p.docstats)
    val chain = v.exists(x => chainAt(spark, root).contains(x))
    val shrunk = v.exists(x => shrunkAt(spark, root).contains(x))
    if (chain) breakChain(spark, root)
    if (shrunk) AtomicRewrite.writeHint(spark,
      s"$root/docstats_shrunk_at", -1L)
    (chain, shrunk)
  }

  /** Restore the hints a completed forget preserved (see
    * [[breakMaintHints]]): both survive a COMPLETED deletion — the
    * surviving docs' lists and postings are untouched. An absent store
    * (a forget against an index never built — the hooks' no-op
    * contract) has nothing to restore, and broke nothing at entry. */
  private def restoreMaintHints(spark: SparkSession, root: String,
                                p: Paths, marks: (Boolean, Boolean)): Unit =
    AtomicRewrite.currentVersion(spark, p.docstats).foreach { v =>
      if (marks._1) markChain(spark, root, v)
      if (marks._2) markShrunk(spark, root, v)
    }

  /** [[forget]] returning the matched doc ids (empty = index untouched)
    * — the audit-precision shape for [[Gdpr.StoreErasure]]. The match
    * set is the UNION over both tables: a doc present only in docstats
    * (an append that crashed between its erase and insert commits)
    * still carries derived subject data (its dl shifts N/avgdl), so its
    * erasure must be audited, not silently dropped. */
  def forgetMatched(spark: SparkSession, root: String,
                    ids: DataFrame): Seq[Any] =
    forgetImpl(spark, root, ids, collectKeys = true)._2

  /** What ONE partition-pruned docstats read learns before the deletes:
    * the docstats version the deletes will replace, the matched docs'
    * (count, exact dl sum) — the summary's negative delta — plus the
    * union of their stored posting-bucket lists when the clean chain
    * makes that union a sound postings prune (None = no such proof,
    * full-scan discovery). None overall = no usable docstats (absent,
    * or a pre-doc_bucket layout) → the legacy full-recompute path. */
  private case class ForgetScope(fromVersion: Long, nDocs: Long,
                                 sumDl: Long, docBuckets: Seq[Any],
                                 postBuckets: Option[Seq[Any]],
                                 dbTouched: Seq[Any],
                                 matchedKeys: Seq[Any])

  private def forgetScope(spark: SparkSession, p: Paths, docIds: DataFrame,
                          chainClean: Boolean,
                          collectKeys: Boolean): Option[ForgetScope] = {
    if (!AtomicRewrite.exists(spark, p.docstats)) return None
    val committed = AtomicRewrite.read(spark, p.docstats)
    if (!committed.columns.contains("doc_bucket")) return None
    val v0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    // ≤ DocBuckets literal ints — prune the docstats read at plan time
    // (doc_bucket is a pure hash of doc_id: every matching row is in
    // one of these partitions by construction of every write path)
    val docBuckets = docIds
      .select(docBucketOf(col("doc_id")).as("doc_bucket"))
      .distinct().collect().map(_.get(0)).toSeq
    val withLists = chainClean && committed.columns.contains("buckets")
    if (docBuckets.isEmpty)
      return Some(ForgetScope(v0, 0L, 0L, Nil,
        if (withLists) Some(Nil) else None, Nil, Nil))
    val matched = committed.filter(col("doc_bucket").isin(docBuckets: _*))
      .join(docIds.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    // the postings prune = the union of the matched docs' bucket lists,
    // folded into the SAME single-row aggregation as a 64-bit MASK:
    // buckets are pmod(·, PostingBuckets) ints (< 64, object-init
    // require), so a per-row `aggregate` folds each list into one Long
    // and `bit_or` unions across rows — O(1) aggregation state, one
    // job, where flatten(collect_list(…)) materialized O(subject ×
    // list) ints in one buffer on a bulk subject (10⁸ docs). Chain
    // clean ⟹ postings ⊆ buckets_live ⊆ buckets per doc, so the LIVE
    // list is the tighter sound bound — on a store with many
    // crash-replayed appends since the last shrink, the accreted
    // `buckets` union inflates toward all PostingBuckets (the outer
    // coalesce: a migrated store may hold pre-live NULL rows; the inner
    // one: bit_or over zero rows is NULL — an empty mask, matching the
    // "no matched docs ⟹ provably no postings" skip). The same agg
    // carries a validity flag: shiftleft wraps mod 64, so a stored list
    // entry outside [0, PostingBuckets) — corrupt or legacy docstats —
    // would alias onto a legal bucket and silently fall OUT of the
    // prune; any such entry invalidates the whole mask and the forget
    // falls back to the sound full-scan discovery instead.
    val listCol =
      if (!withLists) array().cast("array<int>")
      else if (committed.columns.contains("buckets_live"))
        coalesce(col("buckets_live"), col("buckets"))
      else col("buckets")
    val agg = matched
      .select(col("dl"), col("doc_bucket"), col("doc_id"),
        coalesce(listCol, array().cast("array<int>")).as("__l"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("dl"),
        coalesce(expr("bit_or(aggregate(__l, cast(0 as bigint), " +
          "(acc, b) -> acc | shiftleft(cast(1 as bigint), b)))"), lit(0L))
          .as("pbmask"),
        coalesce(expr("bool_or(exists(__l, " +
          s"b -> b IS NULL OR b < 0 OR b >= $PostingBuckets))"), lit(false))
          .as("pb_out_of_range"),
        // the EXACT touched doc buckets (≤ DocBuckets ints) ride the
        // same single-row aggregate — they are the docstats delete's
        // replaced set, so the delete needs no discovery scan of its
        // own; matched keys ride along only on the audit shape (bounded
        // by the erasure-request contract, like deleteMatchingKeys)
        collect_set(col("doc_bucket")).as("db_touched"),
        (if (collectKeys) collect_set(col("doc_id"))
         else array()).as("matched_keys"))
      .head()
    val mask = agg.getLong(2)
    val pb = (0 until PostingBuckets)
      .filter(b => (mask >> b & 1L) == 1L).map(x => x: Any)
    Some(ForgetScope(v0, agg.getLong(0), agg.getLong(1), docBuckets,
      if (withLists && !agg.getBoolean(3)) Some(pb) else None,
      agg.getSeq[Any](4), agg.getSeq[Any](5)))
  }

  /** The shared body of [[forget]]/[[forgetMatched]] — break hints,
    * read the scope, delete (pruned where sound), repair the summary by
    * negative deltas, restore hints. */
  private def forgetImpl(spark: SparkSession, root: String, ids: DataFrame,
                         collectKeys: Boolean): (Boolean, Seq[Any]) = {
    val p = Paths(root)
    val docIds = ids.toDF("doc_id")
    // BREAK both maintenance hints before touching anything: the
    // postings delete does not bump the docstats version, so a crash
    // between the two deletes would otherwise leave the chain hint
    // matching while a half-forgotten doc's buckets_live no longer
    // equals its (now empty) posting set — and the shrunk_at
    // convergence skip would wave the next maintain past it entirely.
    // Broken-at-entry makes every crash window heal by one
    // postings-scan maintain (back to exact); a COMPLETED forget
    // restores both below, since deletions only shrink posting sets
    // (survivors untouched, erased docs gone from docstats too).
    // marks._1 doubles as the CLEAN-CHAIN proof read at entry — we are
    // the only writer (the quiesced-store contract), so it still
    // vouches for the committed state the deletes below read.
    val marks = breakMaintHints(spark, root, p)
    val scope = forgetScope(spark, p, docIds, chainClean = marks._1,
      collectKeys)
    scope.filter(_.postBuckets.isDefined) match {
      case Some(s) =>
        // CLEAN-CHAIN fast path: the one pruned docstats read already
        // produced BOTH tables' exact touched sets — the matched docs'
        // doc buckets, and the union of their live posting-bucket lists
        // (chain clean ⟹ each listed bucket holds ≥ 1 committed posting
        // of a matched doc, so the mask is the postings delete's exact
        // replaced set, not just a prune) — so neither delete pays a
        // discovery scan, and the two stagings run concurrently against
        // their own committed state (the [[append]] stage/promote
        // discipline). Promotes keep the sequential order (postings
        // first): every crash state is one the broken-at-entry hints
        // already cover. Matched keys come from docstats alone — chain
        // clean ⟹ a doc absent from docstats has no postings, so the
        // docstats match set ⊇ the postings one (the union the
        // sequential path collected).
        if (s.dbTouched.isEmpty) {
          // nothing matched anywhere: no version burns, no stats shift
          restoreMaintHints(spark, root, p, marks)
          return (false, Nil)
        }
        val ks = docIds.select("doc_id").distinct()
        val pb = s.postBuckets.get
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext = Runner.branchEc
        // both bucket columns are int by construction of every write
        // path (bucketOf/docBucketOf cast to int) — the fast path is
        // gated on the current layout, so the replaced-set schema is a
        // constant, no relation probe needed
        def touchedRows(vals: Seq[Any], c: String) =
          Some((vals.map(org.apache.spark.sql.Row(_)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(c,
                org.apache.spark.sql.types.IntegerType)))))
        val postStage = Future(
          if (pb.isEmpty) None // zero-token matches only: no postings
          else {
            val keep = AtomicRewrite.read(spark, p.postings)
              .filter(col("bucket").isin(pb: _*))
              .join(ks, Seq("doc_id"), "left_anti")
            Some(AtomicRewrite.stagePartitionsRows(spark, p.postings,
              keep, Seq("bucket"), touchedRows(pb, "bucket")))
          })
        val dsStage = Future {
          val keep = AtomicRewrite.read(spark, p.docstats)
            .filter(col("doc_bucket").isin(s.dbTouched: _*))
            .join(ks, Seq("doc_id"), "left_anti")
          AtomicRewrite.stagePartitionsRows(spark, p.docstats,
            keep, Seq("doc_bucket"),
            touchedRows(s.dbTouched, "doc_bucket"))
        }
        // both stagings settle before EITHER promote — a staging
        // failure aborts the whole forget with zero pointers moved,
        // sibling failures attached (the append rule)
        val postStaged = scala.util.Try(Await.result(postStage, Duration.Inf))
        val dsStaged = scala.util.Try(Await.result(dsStage, Duration.Inf))
        (postStaged.failed.toOption orElse dsStaged.failed.toOption)
          .foreach { e =>
            Seq(postStaged, dsStaged).flatMap(_.failed.toOption)
              .filter(_ ne e).foreach(e.addSuppressed)
            throw e
          }
        postStaged.get.foreach(_.apply())
        dsStaged.get.apply()
        statsIncrement(spark, root, s.fromVersion, -s.nDocs, -s.sumDl)
        restoreMaintHints(spark, root, p, marks)
        (true, s.matchedKeys)
      case None =>
        // broken chain / legacy layout: the always-sound sequential
        // discovery deletes
        def del(table: String, prune: Option[Column]): (Boolean, Seq[Any]) =
          if (collectKeys) {
            val ks = AtomicRewrite.deleteMatchingKeys(spark, table, docIds,
              "doc_id", prune)
            (ks.nonEmpty, ks)
          } else
            (AtomicRewrite.deleteMatching(spark, table, docIds, "doc_id", prune),
              Nil)
        val (a, keysA) = del(p.postings, None)
        val (b, keysB) = scope match {
          case Some(s) if s.docBuckets.isEmpty => (false, Seq.empty[Any])
          case Some(s) =>
            del(p.docstats, Some(col("doc_bucket").isin(s.docBuckets: _*)))
          case None => del(p.docstats, None)
        }
        if (b) scope match {
          case Some(s) =>
            statsIncrement(spark, root, s.fromVersion, -s.nDocs, -s.sumDl)
          case None => refreshStats(spark, root)
        }
        restoreMaintHints(spark, root, p, marks)
        (a || b, (keysA ++ keysB).distinct)
    }
  }

  /** Maintenance: shrink docstats bucket lists back to EXACT. The lists
    * are deliberately an upper bound — [[append]] stores old∪new so a
    * crash replay can find every bucket a partially-committed version
    * could occupy — and this pass converges them so stale buckets never
    * inflate a later rewrite's touched set toward all
    * [[PostingBuckets]]. Doc counts and lengths are untouched, so the
    * 1-row summary only needs its version stamp moved
    * ([[statsIncrement]] with zero deltas). Safe on a quiesced store
    * only — the [[CurationRunner.maintain]] contract.
    *
    * Two modes, chosen by the CLEAN-CHAIN proof:
    *  - '''O(docstats), zero postings reads''' (the production steady
    *    state): when the `chain_clean` hint matches the current
    *    docstats version — every mutation since the last provably-exact
    *    state completed fully — each doc's committed postings occupy
    *    exactly its `buckets_live`, so the shrink is `buckets :=
    *    buckets_live` over the docs where they differ, rewriting only
    *    their doc-bucket partitions. The narrow docstats table is the
    *    only input; the postings table (orders of magnitude bigger —
    *    one row per (token, doc) vs one per doc) is never opened,
    *    spec-pinned by smashing its data pages.
    *  - '''postings-scan heal''': a broken chain (a crashed append may
    *    have left some doc's postings in its OLD buckets while
    *    buckets_live already says new) re-derives every doc's exact set
    *    from the COMMITTED postings — one O(index) keyed agg — fixes
    *    both list columns, and re-establishes the chain. A v2 store
    *    (docstats without `buckets_live`) takes this path once as its
    *    UPGRADE: a full docstats rewrite adds the column (never a
    *    mixed-schema partition commit), after which every later
    *    maintain is mode one.
    *
    * Convergence is version-keyed on top: a `shrunk_at` marker records
    * the docstats version the last pass converged at, so a maintain
    * whose marker matches skips entirely — the second consecutive
    * maintain reads zero bytes of either table. Both markers are pure
    * skip/proof hints with full-recompute fallback, never correctness
    * inputs ([[AtomicRewrite.readHint]]). */
  def maintain(spark: SparkSession, root: String): Unit = {
    val p = Paths(root)
    if (!AtomicRewrite.exists(spark, p.postings) ||
        !AtomicRewrite.exists(spark, p.docstats)) return
    val committed = AtomicRewrite.read(spark, p.docstats)
    if (!committed.columns.contains("buckets")) return // legacy layout
    val v0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    if (shrunkAt(spark, root).contains(v0)) return // converged: zero reads
    val live = committed.columns.contains("buckets_live")
    if (live && chainAt(spark, root).contains(v0)) {
      // clean chain: postings provably sit in buckets_live — shrink is
      // an O(docstats) pass, the postings table never opened
      val touched = committed.filter(col("buckets") =!= col("buckets_live"))
        .select("doc_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) { markShrunk(spark, root, v0); return }
      val fixed = committed.filter(col("doc_bucket").isin(touched: _*))
        .withColumn("buckets", col("buckets_live"))
      AtomicRewrite.writePartitions(spark, p.docstats, fixed,
        Seq("doc_bucket"),
        replaced = Some(AtomicRewrite.literalFrame(spark,
          touched.map(org.apache.spark.sql.Row(_)),
          committed.select("doc_bucket").schema)))
      statsIncrement(spark, root, v0, 0L, 0L)
      // chain BEFORE shrunk (build's order): a crash between the two
      // must not wedge a broken chain behind a converged shrunk marker
      // (maintain would early-return forever while appends accrete)
      val v = AtomicRewrite.currentVersion(spark, p.docstats).get
      markChain(spark, root, v) // only the bounds moved; still exact
      markShrunk(spark, root, v)
      return
    }
    // broken chain or pre-live store: heal from the committed postings
    val exact = AtomicRewrite.read(spark, p.postings)
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("bucket"))).as("__exact"))
    val emptyList = array().cast("array<int>")
    // a doc with no postings at all (zero-token text) has exact = []
    val joined = committed.join(exact, Seq("doc_id"), "left")
      .withColumn("__exact", coalesce(col("__exact"), emptyList))
    if (!live) {
      // v2 upgrade: one full rewrite adds buckets_live (a partition-
      // level commit would mix schemas across the manifest) — exact
      // lists in both columns, one O(docs) write, once per store
      AtomicRewrite.write(spark, p.docstats,
        joined.withColumn("buckets", col("__exact"))
          .withColumn("buckets_live", col("__exact")).drop("__exact"),
        partitionBy = Seq("doc_bucket"))
    } else {
      val touched = joined.filter(col("buckets") =!= col("__exact") ||
          col("buckets_live") =!= col("__exact"))
        .select("doc_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) {
        // verified exact against the postings themselves — the chain
        // re-establishes even though nothing needed rewriting (chain
        // before shrunk, the crash-ordering discipline)
        markChain(spark, root, v0)
        markShrunk(spark, root, v0)
        return
      }
      val fixed = joined.filter(col("doc_bucket").isin(touched: _*))
        .withColumn("buckets", col("__exact"))
        .withColumn("buckets_live", col("__exact")).drop("__exact")
      AtomicRewrite.writePartitions(spark, p.docstats, fixed,
        Seq("doc_bucket"),
        replaced = Some(AtomicRewrite.literalFrame(spark,
          touched.map(org.apache.spark.sql.Row(_)),
          committed.select("doc_bucket").schema)))
    }
    statsIncrement(spark, root, v0, 0L, 0L)
    val v = AtomicRewrite.currentVersion(spark, p.docstats).get
    markChain(spark, root, v) // healed: exact state by construction
    markShrunk(spark, root, v)
  }

  /** The docstats version the last [[maintain]] pass converged at —
    * None for a legacy store, a garbled file, or a crash mid-write (all
    * read as "rescan", the safe side). A plain hint file, not a
    * versioned table ([[AtomicRewrite.readHint]]). */
  private def shrunkAt(spark: SparkSession, root: String): Option[Long] =
    AtomicRewrite.readHint(spark, s"$root/docstats_shrunk_at")

  private def markShrunk(spark: SparkSession, root: String, v: Long): Unit =
    AtomicRewrite.writeHint(spark, s"$root/docstats_shrunk_at", v)

  /** The CLEAN-CHAIN proof: the docstats version up to which every
    * mutation since the last provably-exact state (build, a healing
    * [[maintain]]) completed fully — written only at those points and
    * at the END of a mutation that found it clean coming in. Hint ==
    * current version ⟹ every doc's committed postings sit inside its
    * `buckets_live` (the invariant the O(docstats) shrink needs), and —
    * because every completed mutation keeps the two tables describing
    * the same doc set — a doc absent from docstats has NO postings
    * (the invariant [[forget]]'s pruned postings discovery needs).
    * Missing/stale/garbled all read as "broken" — one postings-scan
    * maintain heals and re-establishes. */
  private def chainAt(spark: SparkSession, root: String): Option[Long] =
    AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")

  private def markChain(spark: SparkSession, root: String, v: Long): Unit =
    AtomicRewrite.writeHint(spark, s"$root/docstats_chain_clean", v)

  /** Explicitly invalidate the chain before a mutation whose crash
    * windows don't bump the docstats version ([[forget]]'s postings
    * delete): -1 never matches a real version, so the hint reads
    * "broken" until the mutation completes and restores it. */
  private def breakChain(spark: SparkSession, root: String): Unit =
    AtomicRewrite.writeHint(spark, s"$root/docstats_chain_clean", -1L)

  /** Ceiling on a query batch's distinct-term vocabulary: the term set
    * is collected to the driver and inlined into the postings scan's
    * pruning predicates, so it must stay plan-sized — the
    * [[AtomicRewrite.MaxInlinedPartitionTerms]] risk class, bounded
    * loudly here like [[TokenizerStore.MaxMerges]]. Batch bigger query
    * loads into several query() calls. */
  val MaxQueryTerms = 4096

  /** Top-`k` BM25 hits per query. `queries` carries (`query_id`,
    * `terms` array<string>); duplicate terms within a query count once
    * (the conjunctive-bag convention of the q105 fixed query). Reads
    * ONLY the term set's hash-bucket partitions; ranking is the
    * TopKPerKey heap. A query whose terms match nothing returns no
    * rows. The returned frame is NOT cached — the bucket-pruned
    * postings scan is cheap enough to run once per branch, and a
    * serving loop must not accumulate pinned executor memory per
    * batch. */
  def query(spark: SparkSession, root: String, queries: DataFrame,
            k: Int = 5): DataFrame = {
    val p = Paths(root)
    val qt = queries.select(col("query_id"),
      explode(array_distinct(col("terms"))).as("token"))
    // the term vocabulary is bounded by the query batch — collect it to
    // prune the postings scan to its buckets at plan time (severed
    // lineage, the q83 probed-cell idiom)
    val terms = qt.select("token").distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.size <= MaxQueryTerms,
      s"query batch carries ${terms.size} distinct terms, beyond the " +
        s"$MaxQueryTerms plan-size bound — split the batch")
    if (terms.isEmpty) {
      // the empty frame derives its doc_id type from the committed
      // postings, so an empty batch's schema can never diverge from the
      // normal path's (a corpus keyed by string ids would otherwise get
      // a LongType doc_id here and break downstream unions)
      val docIdType = AtomicRewrite.read(spark, p.postings)
        .schema("doc_id").dataType
      return qt.select(col("query_id"),
        lit(null).cast(docIdType).as("doc_id"),
        lit(0.0).as("bm25"), lit(0).as("rank")).limit(0)
    }
    val post = AtomicRewrite.read(spark, p.postings)
      .filter(col("bucket").isin(bucketIdsOf(spark, terms): _*) &&
        col("token").isin(terms: _*))
    // df per token from the postings just read (one row per (token, doc));
    // N and avgdl from the 1-ROW committed summary — the serving path
    // never aggregates the O(docs) docstats table. sum_dl is an exact
    // long, so sum_dl / n in double IS avg(dl) bit-for-bit.
    val df = post.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val stats = corpusStats(spark, p)
    val contrib =
      log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * lit(K1 + 1.0)) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))
    val scored = qt.join(post, "token")
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      // exact decimal sum of bit-identical double contributions: the
      // per-(query, doc) total must not depend on term combine order
      .select(col("query_id"), col("doc_id"),
        contrib.cast("decimal(38,6)").as("__c"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("__c")).cast("double"), 6).as("bm25"))
    graft.plans.TopKPerKey.perKeyWithRank(scored,
      Seq("query_id"), Seq(col("bm25").desc, col("doc_id")), k, "rank")
      .select(col("query_id"), col("doc_id"), col("bm25"), col("rank"))
  }

  /** The (n, avgdl) scalar frame for scoring: the committed 1-row
    * summary, or — for an index whose summary predates the stats table
    * or was stranded by a crash between the docstats and stats commits
    * of the LAST mutation before an upgrade — the docstats aggregate
    * the summary replaced. The fallback computes the identical values
    * (sum_dl is exact), so serving correctness never depends on which
    * path ran. */
  private def corpusStats(spark: SparkSession, p: Paths): DataFrame =
    if (AtomicRewrite.exists(spark, p.stats))
      AtomicRewrite.read(spark, p.stats)
        .select(col("n_docs").cast("double").as("n"),
          (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    else
      AtomicRewrite.read(spark, p.docstats)
        .agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))

  /** The distinct posting buckets a term set hashes into — computed
    * with the same xxhash64 the write path used, via a literal frame
    * through the engine (never a reimplementation of the hash on the
    * driver, which could silently diverge from the stored layout). */
  private def bucketIdsOf(spark: SparkSession, terms: Seq[String]): Seq[Any] = {
    import spark.implicits._
    terms.toDF("token").select(bucketOf(col("token")))
      .distinct().collect().map(_.getInt(0)).toSeq
  }
}
