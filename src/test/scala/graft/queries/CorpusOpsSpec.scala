package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 corpus additions (q103-q107) that
  * the row-hash oracle cannot express: internal consistency of the
  * duplication fractions, posting-list ordering, BM25 score bounds, KMV
  * estimate-vs-exact accuracy, and funnel monotonicity.
  */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q103: span counts are consistent and a cloned doc is fully duplicated") {
    val out = TextQueries.defs("q103_span_dedup")(spark, sf).persist()
    // every doc appears exactly once, dup_spans <= n_spans, fraction in [0,1]
    val n = out.count()
    assert(out.select("doc_id").distinct().count() == n)
    assert(out.filter(col("dup_spans") > col("n_spans") ||
      col("dup_fraction") < 0 || col("dup_fraction") > 1).count() == 0)
    // the generator plants near/exact duplicate docs: some doc must carry
    // cross-doc duplicated spans, and none can exceed full duplication
    assert(out.agg(max("dup_fraction")).head().getDouble(0) > 0.0,
      "corpus contains duplicate docs; span dedup must surface them")
    out.unpersist()
  }

  test("q104: posting heads are sorted, bounded by 8, and df<=collection freq") {
    val out = TextQueries.defs("q104_inverted_index")(spark, sf).persist()
    assert(out.filter(col("doc_freq") > col("coll_freq")).count() == 0)
    val bad = out.select(split(col("postings_head"), ",").as("p"))
      .filter(size(col("p")) > 8 ||
        exists(zip_with(col("p"), slice(col("p"), 2, 7),
          (a, b) => b.cast("long") <= a.cast("long")),
          x => coalesce(x, lit(false))))
      .count()
    assert(bad == 0, "posting head must be ascending and k-truncated")
    out.unpersist()
  }

  test("q105: bm25 is positive only for docs containing a query term") {
    val out = TextQueries.defs("q105_bm25")(spark, sf)
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("t"))
    val joined = out.join(docs, "doc_id")
    val noTerm = joined.filter(!TextQueries.BmQuery
      .map(q => array_contains(col("t"), q)).reduce(_ || _)).count()
    assert(noTerm == 0, "a doc with no query term cannot score > 0")
    assert(out.filter(col("bm25") <= 0).count() == 0)
  }

  test("q106: KMV estimate tracks exact Jaccard within sketch resolution") {
    val out = TextQueries.defs("q106_kmv_source_overlap")(spark, sf).persist()
    assert(out.count() > 0)
    // KMV with k=KmvK: the estimate is ±O(1/sqrt(k)); assert a loose
    // 3/sqrt(k) band so a broken sketch fails but sampling noise passes
    val tol = 3.0 / math.sqrt(TextQueries.KmvK.toDouble)
    val off = out.filter(abs(col("kmv_jaccard") - col("exact_jaccard")) > tol).count()
    assert(off == 0, s"KMV estimate strayed beyond ±$tol of exact")
    out.unpersist()
  }

  test("q108: corpus-LM scores are finite and floor at the rarest-token bound") {
    val out = TextQueries.defs("q108_lm_perplexity")(spark, sf).persist()
    val n = out.count()
    assert(n > 0 && out.select("doc_id").distinct().count() == n)
    // -ln p is positive (every p < 1 for a multi-token corpus) and no
    // doc's mean can exceed the worst single-token surprisal, so the
    // perplexity proxy is capped by 1/p(rarest token) = n_total/cf_min
    assert(out.filter(col("avg_neg_logp") <= 0).count() == 0)
    val freqs = graft.core.Tables.load(spark, sf, "documents")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cf"))
      .agg(min("cf").as("cfMin"), sum("cf").as("nTotal")).head()
    val pplCap = freqs.getLong(1).toDouble / freqs.getLong(0)
    assert(out.agg(max("ppl_proxy")).head().getDouble(0) <= pplCap,
      "unigram perplexity cannot exceed the rarest token's 1/p")
    out.unpersist()
  }

  test("q109: hard negatives never share the anchor's label and ranks are dense") {
    val out = VectorQueries.defs("q109_hard_negatives")(spark, sf).persist()
    assert(out.count() > 0)
    val lab = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
    assert(out.join(lab, "anchor_id")
      .filter(col("negative_label") === col("anchor_label")).count() == 0,
      "a negative sharing the anchor's label is not a negative")
    // per anchor: ranks are 1..k with no gaps, descending cos_sim
    val bad = out.groupBy("anchor_id")
      .agg(count(lit(1)).as("k"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("k") || col("mn") =!= 1).count()
    assert(bad == 0, "ranks must be dense from 1")
    out.unpersist()
  }

  test("q110: BPE encoding only shrinks, and the learned merges fire somewhere") {
    val out = TextQueries.defs("q110_bpe_encode")(spark, sf).persist()
    val n = out.count()
    assert(n > 0 && out.select("doc_id").distinct().count() == n)
    assert(out.filter(col("n_encoded") > col("n_subwords")).count() == 0,
      "a merge can never increase the token count")
    assert(out.filter(col("compression") <= 0 || col("compression") > 1).count() == 0)
    val saved = out.agg(sum(col("n_subwords") - col("n_encoded"))).head().getLong(0)
    assert(saved > 0, s"$BpeRoundsMsg rounds of argmax merges must merge something")
    out.unpersist()
  }
  private def BpeRoundsMsg = TextQueries.BpeRounds

  test("q111: DSIR keeps exactly K docs and target-domain docs score high") {
    val out = TextQueries.defs("q111_dsir_select")(spark, sf).persist()
    assert(out.count() == TextQueries.DsirK)
    assert(out.select("doc_id").distinct().count() == TextQueries.DsirK)
    // the target corpus defines the numerator LM: its own docs must be
    // over-represented in the selection relative to their corpus share
    // (25/500 = 5% of docs; anything above that shows the ratio works)
    val tgtKept = out.filter(col("source") === TextQueries.DsirTarget).count()
    assert(tgtKept.toDouble / TextQueries.DsirK > 0.05,
      s"only $tgtKept/${TextQueries.DsirK} selected docs come from the target domain")
    out.unpersist()
  }

  test("q112: ppl terciles are balanced per lang and ranges don't overlap") {
    val out = TextQueries.defs("q112_ppl_buckets")(spark, sf).persist()
    // every lang contributes exactly buckets 1..3
    val perLang = out.groupBy("lang").agg(
      countDistinct("bucket").as("nb"), sum("n_docs").as("nd")).collect()
    assert(perLang.nonEmpty && perLang.forall(_.getLong(1) == 3))
    // ntile balance: bucket sizes within a lang differ by at most 1
    val spread = out.groupBy("lang")
      .agg((max("n_docs") - min("n_docs")).as("d"))
      .filter(col("d") > 1).count()
    assert(spread == 0, "ntile buckets must be balanced within each lang")
    // buckets partition the nlp axis: bucket b's max <= bucket b+1's min
    val rows = out.select("lang", "bucket", "min_nlp", "max_nlp")
      .orderBy("lang", "bucket").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getString(0) == b.getString(0) =>
        assert(a.getDouble(3) <= b.getDouble(2),
          s"bucket ranges overlap for lang ${a.getString(0)}")
      case _ =>
    }
    out.unpersist()
  }

  test("q113: CSLS ranks are dense and ordered by the corrected score") {
    val out = VectorQueries.defs("q113_csls_rescore")(spark, sf).persist()
    assert(out.count() > 0)
    assert(out.filter(col("query_id") % 25 =!= 0).count() == 0)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    // dense 1..n ranks per query
    val badRanks = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(badRanks == 0, "ranks must be dense starting at 1")
    // within a query, csls never increases as rank increases
    val rows = out.select("query_id", "rank", "csls")
      .orderBy("query_id", "rank").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.getDouble(2) >= b.getDouble(2),
          s"csls out of order for query ${a.getLong(0)}")
      case _ =>
    }
    out.unpersist()
  }

  test("q114: the cascade gives every doc exactly one verdict, and clones drop") {
    val out = TextQueries.defs("q114_filter_cascade")(spark, sf).persist()
    val n = out.count()
    assert(n > 0 && out.select("doc_id").distinct().count() == n)
    val reasons = out.select("reason").distinct().collect().map(_.getString(0)).toSet
    val allowed = Set("exact_duplicate", "too_short", "low_stopword",
      "benchmark_holdout", "contaminated", "kept")
    assert(reasons.subsetOf(allowed), s"unknown reasons: ${reasons -- allowed}")
    assert(out.filter(col("keep") =!= (col("reason") === "kept")).count() == 0)
    // exact-dup flags must agree with q34's canonical-hash rule (the
    // shipped sf0.001 corpus has only NEAR dups, so this can be zero —
    // sf0.1 is where the planted exact clones live)
    val expectedDups = TextQueries.defs("q34_exact_dedup")(spark, sf)
      .agg(sum(col("n_docs") - 1)).head().getLong(0)
    assert(out.filter(col("reason") === "exact_duplicate").count() == expectedDups)
    // the cascade must actually cut something AND leave something to train on
    assert(out.filter(!col("keep")).count() > 0)
    assert(out.filter(col("keep")).count() > 0)
    out.unpersist()
  }

  test("q115: the budget cut is the exact greedy quality prefix, maximal") {
    val out = TextQueries.defs("q115_token_budget")(spark, sf)
      .orderBy(col("quality_score").desc, col("doc_id")).collect()
    assert(out.nonEmpty, "a 40% token budget must select something")
    // the distributed prefix sum must equal a local replay of the same cut
    val all = TextQueries.defs("q31_text_quality")(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .collect().sortBy(r => (-r.getDouble(2), r.getLong(0)))
    val budget = math.floor(
      all.map(_.getLong(1)).sum * TextQueries.TokenBudgetShare).toLong
    var cum = 0L
    val expect = all.takeWhile { r => cum += r.getLong(1); cum <= budget }
    assert(out.map(_.getLong(0)).toSeq == expect.map(_.getLong(0)).toSeq,
      "selection must be exactly the top-quality prefix under the budget")
    // exact running totals and greedy maximality (adding the next-ranked
    // doc would burst the budget)
    var c2 = 0L
    out.foreach { r => c2 += r.getLong(1); assert(r.getLong(3) == c2) }
    assert(c2 <= budget)
    if (out.length < all.length)
      assert(c2 + all(out.length).getLong(1) > budget,
        "cut stopped early — next doc still fits the budget")
  }

  test("q116: every source keeps its own top prefix under its own cap") {
    val out = TextQueries.defs("q116_source_caps")(spark, sf).persist()
    val bySource = out.collect().groupBy(_.getString(1))
    assert(bySource.nonEmpty)
    val full = graft.core.Tables.load(spark, sf, "documents")
      .select(col("source")).distinct().count()
    assert(bySource.size == full, "a 50% cap must keep docs in every source")
    bySource.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(0)))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(2)
        assert(r.getLong(4) == cum, "per-source running totals must be exact")
      }
    }
    out.unpersist()
  }

  test("q117: positions are unique, quality-ordered per source, interleaved") {
    val rows = TextQueries.defs("q117_curriculum")(spark, sf).collect()
    val n = rows.length
    assert(n > 0 && rows.map(_.getLong(3)).distinct.length == n,
      "train positions must be globally unique")
    // within a source, better quality (ties: lower doc_id) → earlier position
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_.getLong(3))
      val byQuality = rs.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      assert(byPos.map(_.getLong(0)).toSeq == byQuality.map(_.getLong(0)).toSeq)
    }
    // the epoch head is one doc from EVERY source before any repeats
    val nSources = rows.map(_.getString(1)).distinct.length
    val head = rows.sortBy(_.getLong(3)).take(nSources)
    assert(head.map(_.getString(1)).distinct.length == nSources,
      "the first |sources| positions must cover every source once")
  }

  test("q118: batches partition the corpus and the padding math is exact") {
    val out = TextQueries.defs("q118_length_batches")(spark, sf).persist()
    val docs = graft.core.Tables.load(spark, sf, "documents")
    assert(out.agg(sum("n_docs")).head().getLong(0) == docs.count(),
      "every doc lands in exactly one batch")
    assert(out.filter(col("pad_tokens") < 0 ||
      col("fill_ratio") <= 0 || col("fill_ratio") > 1).count() == 0)
    // bucket membership: every batch's max length fits its power-of-2 class
    assert(out.filter(col("max_len") >= pow(lit(2), col("bucket_bits")))
      .count() == 0, "a batch's longest doc must fit 2^bucket_bits")
    out.unpersist()
  }

  test("q107: funnel stages are monotonically non-increasing") {
    val rows = RelationalQueries.defs("q107_funnel")(spark, sf)
      .orderBy("stage").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click_after_view", "3_purchase_after_click"))
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel cannot gain users downstream: ${counts.toSeq}")
    assert(counts(0) > 0)
  }
}
