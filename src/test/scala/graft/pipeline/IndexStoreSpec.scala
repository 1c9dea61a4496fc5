package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the persisted BM25 index: build→query parity with the
  * formula, append REPLACEMENT semantics (a changed doc's stale
  * postings never ghost-match), partition-aware erasure with shifted
  * statistics, and bounded bucket layout.
  */
/** Executor-side capture for the rebuild crash-window probe (local mode
  * shares the JVM, so a task's write is visible to the driver). */
object BuildHintProbe { @volatile var seen: String = "unread" }

class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "red line trains run fast every morning"),
    (2L, "blue line trams crawl slow every evening"),
    (3L, "red buses and red trams share the red depot"),
    (4L, "ferries cross the harbour twice daily"))
    .toDF("doc_id", "text")

  private def q(terms: String*): DataFrame =
    Seq((100L, terms)).toDF("query_id", "terms")

  test("build -> query: hits carry exact BM25 scores, ranked desc with doc_id ties") {
    val root = Files.createTempDirectory("graft-idx").toString + "/idx"
    IndexStore.build(spark, root, corpus)
    val hits = IndexStore.query(spark, root, q("red"), k = 5).collect()
    // 'red' appears in docs 1 and 3 (tf 1 and 3); doc 3 has higher tf
    // but also longer dl — verify against the hand formula
    assert(hits.map(_.getLong(1)).toSet == Set(1L, 3L))
    val byDoc = hits.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def bm25(tf: Double, dl: Double, df: Double, n: Double, avgdl: Double) =
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * (IndexStore.K1 + 1.0)) /
        (tf + IndexStore.K1 * (1.0 - IndexStore.B + IndexStore.B * dl / avgdl))
    val avgdl = (7.0 + 7.0 + 9.0 + 6.0) / 4
    assert(math.abs(byDoc(1L) - BigDecimal(bm25(1, 7, 2, 4, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(byDoc(3L) - BigDecimal(bm25(3, 9, 2, 4, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // ranks dense from 1 in score order
    assert(hits.sortBy(_.getInt(3)).map(_.getInt(3)).toSeq == Seq(1, 2))
    spark.catalog.clearCache()
  }

  test("append replaces a re-submitted doc: stale postings never ghost-match") {
    val root = Files.createTempDirectory("graft-idx-a").toString + "/idx"
    IndexStore.build(spark, root, corpus)
    assert(IndexStore.query(spark, root, q("harbour"), k = 5)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    // doc 4 re-submitted with entirely different content: its old
    // tokens live in buckets the new tokens may never touch
    IndexStore.append(spark, root,
      Seq((4L, "night owl coaches replace the ferries")).toDF("doc_id", "text"))
    assert(IndexStore.query(spark, root, q("harbour"), k = 5).isEmpty,
      "a replaced doc's stale posting still matches")
    assert(IndexStore.query(spark, root, q("coaches"), k = 5)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    // docstats replaced too, not duplicated
    assert(AtomicRewrite.read(spark, IndexStore.Paths(root).docstats)
      .filter(col("doc_id") === 4L).count() == 1)
    spark.catalog.clearCache()
  }

  test("forget: erased docs unretrievable, statistics shift, bystander buckets untouched") {
    val root = Files.createTempDirectory("graft-idx-f").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    val v0 = AtomicRewrite.currentVersion(spark, p.postings).get

    // no-op forget burns no version
    assert(!IndexStore.forget(spark, root, Seq(999L).toDF("doc_id")))
    assert(AtomicRewrite.currentVersion(spark, p.postings).contains(v0))

    val before = IndexStore.query(spark, root, q("red"), k = 5)
      .filter(col("doc_id") === 3L).select("bm25").as[Double].head()
    // bystander bucket files must survive by reference
    val doc4Buckets = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === 4L).select("bucket").as[Int].collect().toSet
    val doc1Buckets = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === 1L).select("bucket").as[Int].collect().toSet
    val bystander = (doc4Buckets -- doc1Buckets).headOption
    def files(b: Int) =
      new java.io.File(s"${p.postings}/v=$v0/bucket=$b").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val snap = bystander.map(files)

    val matched = IndexStore.forgetMatched(spark, root, Seq(1L).toDF("doc_id"))
    assert(matched.map(_.asInstanceOf[Long]).toSet == Set(1L))
    bystander.foreach(b => assert(files(b) == snap.get,
      s"bucket $b held no forgotten posting but was rewritten"))

    val after = IndexStore.query(spark, root, q("red"), k = 5)
    assert(after.filter(col("doc_id") === 1L).isEmpty,
      "an erased doc must be unretrievable")
    // N, avgdl and df all changed -> the surviving score must shift
    val shifted = after.filter(col("doc_id") === 3L)
      .select("bm25").as[Double].head()
    assert(shifted != before,
      "surviving scores must reflect the post-erasure statistics")
    spark.catalog.clearCache()
  }

  test("a batch carrying two versions of one doc id indexes exactly one, consistently") {
    val root = Files.createTempDirectory("graft-idx-d").toString + "/idx"
    IndexStore.build(spark, root, corpus)
    // an at-least-once source compacts a correction into ONE micro-batch
    IndexStore.append(spark, root, Seq(
      (9L, "harbour ferries cross twice"),
      (9L, "night owl coaches instead")).toDF("doc_id", "text"))
    // exactly one docstats row, and the postings all come from ONE
    // version — never a merged vocabulary of both
    assert(AtomicRewrite.read(spark, IndexStore.Paths(root).docstats)
      .filter(col("doc_id") === 9L).count() == 1)
    val toks = AtomicRewrite.read(spark, IndexStore.Paths(root).postings)
      .filter(col("doc_id") === 9L).select("token").as[String].collect().toSet
    val a = Set("harbour", "ferries", "cross", "twice")
    val b = Set("night", "owl", "coaches", "instead")
    assert(toks == a || toks == b,
      s"postings merged two versions' tokens: $toks")
    // the kept dl matches the kept version
    val dl = AtomicRewrite.read(spark, IndexStore.Paths(root).docstats)
      .filter(col("doc_id") === 9L).select("dl").as[Double].head()
    assert(dl == 4.0, s"dl $dl disagrees with the 4-token kept version")
    spark.catalog.clearCache()
  }

  test("query batches beyond MaxQueryTerms fail loudly at the API boundary") {
    val root = Files.createTempDirectory("graft-idx-m").toString + "/idx"
    IndexStore.build(spark, root, corpus)
    val wide = Seq((1L, (0 to IndexStore.MaxQueryTerms).map(i => s"t$i")))
      .toDF("query_id", "terms")
    val e = intercept[IllegalArgumentException] {
      IndexStore.query(spark, root, wide)
    }
    assert(e.getMessage.contains("split the batch"))
    spark.catalog.clearCache()
  }

  test("stats summary: maintained by every mutation; the serving plan never scans docstats") {
    val root = Files.createTempDirectory("graft-idx-s").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    def stats() = AtomicRewrite.read(spark, p.stats)
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(stats() == (4L, 29L)) // dls 7 + 7 + 9 + 6
    // the query plan reads postings + the 1-row summary — never the
    // O(docs) docstats table (the 100 TB serving-path contract)
    val plan = IndexStore.query(spark, root, q("red"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("docstats"),
      "serving query plan re-aggregates the docstats table")
    // forget shifts the summary in the same cycle, and the score shift
    // it implies is exactly what the forget spec above pins
    IndexStore.forget(spark, root, Seq(1L).toDF("doc_id"))
    assert(stats() == (3L, 22L))
    // append refreshes it too (replacement: doc 4's 6 tokens -> 2)
    IndexStore.append(spark, root,
      Seq((4L, "ferries retired")).toDF("doc_id", "text"))
    assert(stats() == (3L, 18L))
    // a stranded summary (crash between the docstats and stats commits)
    // is repairable in place
    IndexStore.refreshStats(spark, root)
    assert(stats() == (3L, 18L))
    spark.catalog.clearCache()
  }

  test("append is one atomic commit per table: erase+insert can never split") {
    val root = Files.createTempDirectory("graft-idx-1c").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    val v0 = AtomicRewrite.currentVersion(spark, p.postings).get
    val d0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    IndexStore.append(spark, root,
      Seq((4L, "night owl coaches replace the ferries")).toDF("doc_id", "text"))
    // exactly ONE new version per table — the old four-commit shape
    // (erase, erase, insert, insert) had a crash window that silently
    // dropped the batch's docs between its erase and insert
    assert(AtomicRewrite.currentVersion(spark, p.postings).contains(v0 + 1))
    assert(AtomicRewrite.currentVersion(spark, p.docstats).contains(d0 + 1))
    spark.catalog.clearCache()
  }

  test("append requires BOTH tables: a build crashed between its commits fails upfront") {
    val root = Files.createTempDirectory("graft-idx-r").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    // simulate the crashed-build state: postings committed, docstats not
    val fs = new org.apache.hadoop.fs.Path(p.docstats)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p.docstats), true)
    val e = intercept[IllegalArgumentException] {
      IndexStore.append(spark, root,
        Seq((9L, "late batch")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("complete index"))
    // and nothing was mutated before the failure
    assert(AtomicRewrite.currentVersion(spark, p.postings).contains(0L))
    spark.catalog.clearCache()
  }

  test("append discovery is O(batch): reads pruned docstats partitions, never postings") {
    val root = Files.createTempDirectory("graft-idx-ob").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    val ids = Seq(4L).toDF("doc_id")
    val docBuckets = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 4L).select("doc_bucket").as[Int].collect().toSeq
    val plan = IndexStore.oldBucketLists(spark, p, ids, docBuckets)
      .queryExecution.executedPlan.toString
    // the discovery plan must not touch the postings table at all — the
    // old O(index rows) semi-join scan is exactly what this replaces
    assert(!plan.contains("postings"),
      s"append discovery still scans the postings table:\n${plan.take(2000)}")
    // and its docstats read is partition-pruned to the batch's doc
    // buckets at PLAN time (hive pruning on inlined literals)
    assert("PartitionFilters: \\[[^\\]]*doc_bucket".r.findFirstIn(plan).isDefined,
      s"docstats read is not partition-pruned on doc_bucket:\n${plan.take(2000)}")
    spark.catalog.clearCache()
  }

  test("append rewrites only the batch docs' old∪new buckets; bystanders ride by reference") {
    val root = Files.createTempDirectory("graft-idx-by").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    val v0 = AtomicRewrite.currentVersion(spark, p.postings).get
    val d0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    def postingBuckets(d: Long) = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === d).select("bucket").as[Int].collect().toSet
    val oldB = postingBuckets(4L)
    val allB = AtomicRewrite.read(spark, p.postings)
      .select("bucket").distinct().as[Int].collect().toSet
    IndexStore.append(spark, root,
      Seq((4L, "night owl coaches replace the ferries")).toDF("doc_id", "text"))
    val newB = postingBuckets(4L)
    // posting partitions outside doc 4's old∪new bucket lists ride the
    // new manifest by reference: the new version dir must not
    // materialize them afresh
    val bystanders = allB -- oldB -- newB
    assert(bystanders.nonEmpty, "fixture regression: no bystander bucket")
    bystanders.foreach { b =>
      assert(new java.io.File(s"${p.postings}/v=$v0/bucket=$b").exists())
      assert(!new java.io.File(s"${p.postings}/v=${v0 + 1}/bucket=$b").exists(),
        s"bystander posting bucket $b was rewritten by the append")
    }
    // docstats: only doc 4's doc-bucket partition is rewritten
    val doc4Db = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 4L).select("doc_bucket").as[Int].head()
    val otherDb = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") =!= 4L).select("doc_bucket").as[Int]
      .collect().toSet - doc4Db
    otherDb.foreach { b =>
      assert(!new java.io.File(s"${p.docstats}/v=${d0 + 1}/doc_bucket=$b").exists(),
        s"bystander docstats bucket $b was rewritten by the append")
    }
    spark.catalog.clearCache()
  }

  test("a re-submitted doc's stored bucket list is the old∪new superset (crash-replay bound)") {
    val root = Files.createTempDirectory("graft-idx-sup").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    def storedList(d: Long) = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === d).select("buckets").as[Seq[Int]].head().toSet
    def actual(d: Long) = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === d).select("bucket").as[Int].collect().toSet
    // fresh build: the list is exactly the doc's posting buckets
    assert(storedList(4L) == actual(4L))
    val oldB = actual(4L)
    IndexStore.append(spark, root,
      Seq((4L, "night owl coaches replace the ferries")).toDF("doc_id", "text"))
    // after replacement the list covers BOTH versions' buckets — the
    // upper bound that makes a docstats-first crash replay (possibly
    // with a third text version) re-discover any partially-committed
    // version's postings
    assert(storedList(4L) == (oldB ++ actual(4L)),
      s"stored list ${storedList(4L)} is not old $oldB ∪ new ${actual(4L)}")
    spark.catalog.clearCache()
  }

  test("maintain shrinks an accreted bucket list back to exact; a second pass is a no-op") {
    val root = Files.createTempDirectory("graft-idx-shrink").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    def storedList(d: Long) = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === d).select("buckets").as[Seq[Int]].head().toSet
    def actual(d: Long) = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === d).select("bucket").as[Int].collect().toSet
    // a long-lived doc revised with disjoint vocabularies: the old∪new
    // crash-replay bound accretes buckets its CURRENT postings never
    // touch — monotone growth toward all PostingBuckets
    IndexStore.append(spark, root,
      Seq((4L, "granite quarry wagons descend the incline at dawn"))
        .toDF("doc_id", "text"))
    IndexStore.append(spark, root,
      Seq((4L, "lighthouse keepers trim seven lamps before midnight"))
        .toDF("doc_id", "text"))
    assert(storedList(4L).size > actual(4L).size,
      s"fixture must accrete stale buckets: stored ${storedList(4L)} vs " +
        s"actual ${actual(4L)}")
    val statsBefore = AtomicRewrite.read(spark, p.stats)
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    IndexStore.maintain(spark, root)
    // exact again — every doc, not just the revised one
    val ds = AtomicRewrite.read(spark, p.docstats)
      .select("doc_id", "buckets").as[(Long, Seq[Int])].collect().toMap
    ds.keys.foreach(d => assert(ds(d).toSet == actual(d),
      s"doc $d stored ${ds(d)} != exact ${actual(d)}"))
    // content untouched: the summary keeps its values, re-stamped to the
    // shrunk docstats version (the next append's fast path stays O(batch))
    val (nd, dl, sv) = AtomicRewrite.read(spark, p.stats)
      .select("n_docs", "sum_dl", "docstats_version")
      .as[(Long, Long, Long)].head()
    assert((nd, dl) == statsBefore)
    assert(sv == AtomicRewrite.currentVersion(spark, p.docstats).get)
    // serving still works over the shrunk lists
    assert(IndexStore.query(spark, root, q("lighthouse"), k = 5)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    // nothing stale left: a second maintain burns no version AND reads
    // zero postings bytes — the shrunk_at marker matches the docstats
    // version, so the scan is skipped entirely. Proof: smash every
    // postings data page (footers kept readable) and maintain again.
    val v = AtomicRewrite.currentVersion(spark, p.docstats)
    smashPostings(p)
    IndexStore.maintain(spark, root)
    assert(AtomicRewrite.currentVersion(spark, p.docstats) == v,
      "a converged docstats table must not rewrite")
    spark.catalog.clearCache()
  }

  test("append maintains the summary by O(batch) deltas; stale stamps self-heal") {
    val root = Files.createTempDirectory("graft-idx-inc").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    def stats() = AtomicRewrite.read(spark, p.stats)
      .select("n_docs", "sum_dl", "docstats_version")
      .as[(Long, Long, Long)].head()
    val (n0, dl0, v0) = stats()
    assert((n0, dl0) == ((4L, 29L)))
    // tamper the VALUES but keep the matching stamp: the next append
    // must move the summary by its delta alone — proof the fast path
    // never rescans docstats (a recompute would erase the tampering)
    AtomicRewrite.write(spark, p.stats,
      Seq((1000L, 5000L, v0)).toDF("n_docs", "sum_dl", "docstats_version")
        .coalesce(1))
    // replacement: doc 4's dl 6 -> 2, doc count unchanged
    IndexStore.append(spark, root,
      Seq((4L, "ferries retired")).toDF("doc_id", "text"))
    assert(stats() == ((1000L, 4996L, v0 + 1)),
      s"summary must move by the exact delta (0 docs, -4 dl), got ${stats()}")
    // a MISMATCHED stamp (the crash-between-commits state) heals by
    // full recompute on the next mutation
    AtomicRewrite.write(spark, p.stats,
      Seq((1000L, 5000L, v0 - 99)).toDF("n_docs", "sum_dl", "docstats_version")
        .coalesce(1))
    IndexStore.append(spark, root,
      Seq((9L, "night owl coaches")).toDF("doc_id", "text"))
    assert(stats() == ((5L, 28L, v0 + 2)),
      s"a stale-stamped summary must recompute in full, got ${stats()}")
    // and serving reads the repaired values
    assert(IndexStore.query(spark, root, q("coaches"), k = 5)
      .select("doc_id").as[Long].collect().toSet == Set(9L))
    spark.catalog.clearCache()
  }

  test("a pre-upgrade index (no bucket lists) still appends via the legacy scan") {
    val root = Files.createTempDirectory("graft-idx-leg").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    // strip the bucket-list columns: the docstats layout every index
    // built before the O(batch) discovery carried (neither the
    // crash-replay union nor the live list existed)
    AtomicRewrite.write(spark, p.docstats,
      AtomicRewrite.read(spark, p.docstats).drop("buckets", "buckets_live"),
      partitionBy = Seq("doc_bucket"))
    IndexStore.append(spark, root,
      Seq((4L, "night owl coaches replace the ferries")).toDF("doc_id", "text"))
    // replacement semantics hold on the legacy path too
    assert(IndexStore.query(spark, root, q("harbour"), k = 5).isEmpty)
    assert(IndexStore.query(spark, root, q("coaches"), k = 5)
      .select("doc_id").as[Long].collect().toSet == Set(4L))
    // and the legacy schema is preserved (no half-upgraded store)
    assert(!AtomicRewrite.read(spark, p.docstats).columns.contains("buckets"))
    spark.catalog.clearCache()
  }

  private def smashPostings(p: IndexStore.Paths): Unit =
    smashParquet(p.postings) // the SparkSpec helper

  test("forget on a store never built is a no-op (the GDPR hooks' contract)") {
    val root = Files.createTempDirectory("graft-idx-nx").toString + "/idx"
    assert(!IndexStore.forget(spark, root, Seq(1L).toDF("doc_id")))
    assert(IndexStore.forgetMatched(spark, root, Seq(1L).toDF("doc_id")).isEmpty)
    // and the no-op left no stray hint/state behind
    assert(!new java.io.File(root).exists() ||
      new java.io.File(root).listFiles().forall(f =>
        !f.getName.contains("chain_clean")))
    spark.catalog.clearCache()
  }

  test("forget is O(subject): pruned discovery + delta-repaired summary, bystander pages never read") {
    val root = Files.createTempDirectory("graft-idx-osub").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus) // fresh build: chain is clean
    val subjDb = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 1L).select("doc_bucket").as[Int].head()
    val subjPb = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 1L).select("buckets").as[Seq[Int]].head().toSet
    // tamper the summary VALUES but keep the matching stamp: the forget
    // must move it by its exact negative delta alone — proof the repair
    // never re-aggregates docstats (a recompute would erase the tamper)
    val v0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    AtomicRewrite.write(spark, p.stats,
      Seq((1000L, 5000L, v0)).toDF("n_docs", "sum_dl", "docstats_version")
        .coalesce(1))
    // the brutal proof of pruned reads: smash every docstats data page
    // OUTSIDE the subject's doc bucket and every postings data page
    // OUTSIDE the subject's stored bucket list. An unpruned discovery
    // semi-join (the old O(table) scan) or a full stats recompute would
    // throw on the smashed pages.
    smashParquet(p.docstats, keepDirs = Set(s"doc_bucket=$subjDb"))
    smashParquet(p.postings, keepDirs = subjPb.map(b => s"bucket=$b"))
    assert(IndexStore.forget(spark, root, Seq(1L).toDF("doc_id")))
    // moved by exactly (-1 doc, -7 dl), re-stamped to the new version
    val (n, dl, sv) = AtomicRewrite.read(spark, p.stats)
      .select("n_docs", "sum_dl", "docstats_version")
      .as[(Long, Long, Long)].head()
    assert((n, dl) == ((999L, 4993L)),
      s"summary must move by the subject's exact delta, got ($n, $dl)")
    assert(sv == AtomicRewrite.currentVersion(spark, p.docstats).get)
    // the subject really is gone (partition-pruned read — bystanders
    // stay smashed)
    assert(AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_bucket") === subjDb && col("doc_id") === 1L).isEmpty)
    // hints restored: the completed forget preserved the clean chain
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")
      .contains(AtomicRewrite.currentVersion(spark, p.docstats).get))
    spark.catalog.clearCache()
  }

  test("forget prunes the postings discovery to buckets_live, never the accreted union") {
    // chain clean ⟹ postings ⊆ buckets_live ⊆ buckets per doc: on a
    // store whose lists accreted under (clean-chain) re-submission, the
    // LIVE list is the tighter sound prune — the accreted union reads
    // stale buckets for nothing, inflating toward all PostingBuckets
    val root = Files.createTempDirectory("graft-idx-live").toString + "/idx"
    val p = IndexStore.Paths(root)
    // doc 1: wide text (many posting buckets); doc 2: the SAME tokens,
    // so every stale bucket keeps live rows (dirs that exist and, when
    // smashed, throw on any read)
    val wide = (1 to 48).map(i => s"w$i").mkString(" ")
    IndexStore.build(spark, root,
      Seq((1L, wide), (2L, wide)).toDF("doc_id", "text"))
    // clean-chain re-submission of doc 1 with ONE token: its stored
    // `buckets` becomes old_live ∪ new while `buckets_live` is the new
    // exact list — and the chain stays clean (append extends it)
    IndexStore.append(spark, root, Seq((1L, "zebra")).toDF("doc_id", "text"))
    val (accreted, live) = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 1L).select("buckets", "buckets_live")
      .as[(Seq[Int], Seq[Int])].head()
    assert((accreted.toSet -- live.toSet).nonEmpty,
      "fixture: the accreted union must exceed the live list")
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")
      .contains(AtomicRewrite.currentVersion(spark, p.docstats).get),
      "fixture: the clean-chain append must keep the proof")
    // smash every postings page outside the subject's LIVE list: a
    // discovery pruned by the accreted union — the pre-r15 shape —
    // reads the stale buckets (they hold doc 2's live postings) and
    // throws; the live-pruned discovery never opens them
    smashParquet(p.postings,
      keepDirs = live.toSet.map((b: Int) => s"bucket=$b"))
    assert(IndexStore.forget(spark, root, Seq(1L).toDF("doc_id")))
    assert(AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 1L).isEmpty)
    assert(AtomicRewrite.read(spark, p.postings)
      .filter(col("bucket").isin(live: _*) && col("doc_id") === 1L).isEmpty,
      "the subject's live postings must be erased")
    // the completed forget restores the clean chain
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")
      .contains(AtomicRewrite.currentVersion(spark, p.docstats).get))
    spark.catalog.clearCache()
  }

  test("a rebuild breaks the maintenance hints before its first write (crash discipline)") {
    val root = Files.createTempDirectory("graft-idx-bw").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    val v0 = AtomicRewrite.currentVersion(spark, p.docstats).get
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")
      .contains(v0), "fixture: a fresh build must mark the chain")
    // probe the hint DURING the rebuild: the corpus is first evaluated
    // inside the postings-write job, which runs BEFORE the docstats
    // commit — exactly the crash window. Had the old hints survived to
    // that point, a crash there would leave a clean-chain proof over
    // postings that already describe the new corpus.
    val hintFile = s"$root/docstats_chain_clean"
    BuildHintProbe.seen = "unread"
    val base = Seq((7L, "entirely new corpus for the rebuild"))
      .toDF("doc_id", "text")
    val probed = spark.createDataFrame(
      base.rdd.map { r =>
        BuildHintProbe.seen = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(hintFile))).trim
        r
      }, base.schema)
    IndexStore.build(spark, root, probed)
    assert(BuildHintProbe.seen == "-1",
      s"chain hint read '${BuildHintProbe.seen}' during the rebuild's " +
        "first write — a crash in that window would leave a false proof")
    // a COMPLETED rebuild restores both hints at the new exact version
    val v1 = AtomicRewrite.currentVersion(spark, p.docstats).get
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean")
      .contains(v1))
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_shrunk_at")
      .contains(v1))
    spark.catalog.clearCache()
  }

  test("clean-chain shrink is O(docstats): the postings table is never opened") {
    val root = Files.createTempDirectory("graft-idx-chain").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    // clean-chain resubmissions: the stored bound accretes past the
    // live list (old_live ∪ new per append)
    IndexStore.append(spark, root,
      Seq((4L, "granite quarry wagons descend the incline at dawn"))
        .toDF("doc_id", "text"))
    IndexStore.append(spark, root,
      Seq((4L, "lighthouse keepers trim seven lamps before midnight"))
        .toDF("doc_id", "text"))
    val stale = AtomicRewrite.read(spark, p.docstats)
      .filter(col("buckets") =!= col("buckets_live")).count()
    assert(stale > 0, "fixture must leave a stale bound to shrink")
    // the brutal proof: make every postings data page unreadable. The
    // chain is clean (every append completed), so the FIRST shrink pass
    // must already run off docstats alone — mode A would throw here.
    smashPostings(p)
    IndexStore.maintain(spark, root)
    val after = AtomicRewrite.read(spark, p.docstats)
      .select("buckets", "buckets_live").as[(Seq[Int], Seq[Int])].collect()
    assert(after.nonEmpty && after.forall { case (b, l) => b == l },
      "every stored bound must equal its live list after the shrink")
    spark.catalog.clearCache()
  }

  test("a broken chain heals by one postings scan, then the fast path resumes") {
    val root = Files.createTempDirectory("graft-idx-heal").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    IndexStore.append(spark, root,
      Seq((4L, "granite quarry wagons descend the incline at dawn"))
        .toDF("doc_id", "text"))
    // simulate a crash-shaped history: garble the chain hint — the
    // shrink may no longer trust buckets_live and must re-derive from
    // the committed postings (which stay readable here)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/docstats_chain_clean"),
      "garbage".getBytes)
    IndexStore.maintain(spark, root)
    def storedList(d: Long) = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === d).select("buckets").as[Seq[Int]].head().toSet
    def actual(d: Long) = AtomicRewrite.read(spark, p.postings)
      .filter(col("doc_id") === d).select("bucket").as[Int].collect().toSet
    assert(storedList(4L) == actual(4L), "the heal pass must shrink to exact")
    // the heal re-established the chain: a later clean append + shrink
    // runs off docstats alone again (postings smashed)
    IndexStore.append(spark, root,
      Seq((4L, "lighthouse keepers trim seven lamps before midnight"))
        .toDF("doc_id", "text"))
    smashPostings(p)
    IndexStore.maintain(spark, root)
    assert(AtomicRewrite.read(spark, p.docstats)
      .filter(col("buckets") =!= col("buckets_live")).count() == 0)
    spark.catalog.clearCache()
  }

  test("a crashed forget reads as broken; the heal converges the half-forgotten doc") {
    val root = Files.createTempDirectory("graft-idx-fcrash").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    // simulate forget's crash window exactly as forget stages it: BOTH
    // maintenance hints break at entry, the postings delete lands, the
    // docstats delete never happens — doc 4's buckets_live now claims
    // buckets its (deleted) postings no longer occupy. A shrink that
    // still trusted the chain (or a convergence skip still keyed to the
    // unchanged docstats version) would freeze that non-exact list.
    AtomicRewrite.writeHint(spark, s"$root/docstats_chain_clean", -1L)
    AtomicRewrite.writeHint(spark, s"$root/docstats_shrunk_at", -1L)
    AtomicRewrite.deleteMatching(spark, p.postings,
      Seq(4L).toDF("doc_id"), "doc_id")
    IndexStore.maintain(spark, root)
    val row = AtomicRewrite.read(spark, p.docstats)
      .filter(col("doc_id") === 4L)
      .select("buckets", "buckets_live").as[(Seq[Int], Seq[Int])].head()
    assert(row._1.isEmpty && row._2.isEmpty,
      s"the heal must converge the half-forgotten doc to its exact " +
        s"(empty) posting set, got $row")
    spark.catalog.clearCache()
  }

  test("a live-list-less store (r12 format) upgrades once at maintenance") {
    val root = Files.createTempDirectory("graft-idx-up").toString + "/idx"
    val p = IndexStore.Paths(root)
    IndexStore.build(spark, root, corpus)
    // simulate the prior format: union column only, no live list (the
    // rewrite also advances the version past both hints — realistic)
    AtomicRewrite.write(spark, p.docstats,
      AtomicRewrite.read(spark, p.docstats).drop("buckets_live"),
      partitionBy = Seq("doc_bucket"))
    IndexStore.maintain(spark, root)
    val ds = AtomicRewrite.read(spark, p.docstats)
    assert(ds.columns.contains("buckets_live"))
    assert(ds.filter(col("buckets") =!= col("buckets_live")).count() == 0)
    // upgraded and converged: the next maintain burns no version and
    // reads neither table
    val v = AtomicRewrite.currentVersion(spark, p.docstats)
    IndexStore.maintain(spark, root)
    assert(AtomicRewrite.currentVersion(spark, p.docstats) == v)
    // and appends now ride the O(docstats) chain (hint == version)
    assert(AtomicRewrite.readHint(spark, s"$root/docstats_chain_clean") ==
      AtomicRewrite.currentVersion(spark, p.docstats))
    spark.catalog.clearCache()
  }

  test("layout: postings land in at most PostingBuckets hive partitions") {
    val root = Files.createTempDirectory("graft-idx-b").toString + "/idx"
    IndexStore.build(spark, root, corpus)
    val buckets = AtomicRewrite.read(spark, IndexStore.Paths(root).postings)
      .select("bucket").distinct().as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < IndexStore.PostingBuckets))
    spark.catalog.clearCache()
  }
}
