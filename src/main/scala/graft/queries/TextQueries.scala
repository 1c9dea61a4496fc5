package graft.queries

import graft.core.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beyond-reference text operators for training-data pipelines: stats,
  * quality scoring, language ID, fingerprinting, and the dedup suite
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash) over `documents`.
  *
  * Every query has an exactly-mirrored DuckDB oracle; all hashing is
  * sha256-string-based so both engines agree bit-for-bit. Plans are
  * narrow maps except the dedup joins, which shuffle on shingle/band/
  * signature keys — the standard scale-out shape (df-capped shingles
  * bound worst-case pair blowup on a 100 TB corpus).
  */
object TextQueries {

  /** The corpus ships as one small parquet file → one partition → the
    * heavy per-doc maps (shingling, hashing) would run on one core.
    * Spread it once — but only when the scan actually under-partitions:
    * at real scale the many-file scan self-partitions and an unconditional
    * repartition would be a pure full-corpus shuffle cost. The decision
    * reads the FS listing ([[Tables.loadSpread]]), not the scan RDD. */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(s, dir, "documents")

  private def materializeAndRelease(out: DataFrame, inputs: DataFrame*): DataFrame =
    QueryUtil.materializeAndRelease(out, inputs: _*)

  private def toks: Column = TextOps.tokens(col("text"))

  /** q31's composite quality score — the ONE definition the selection
    * and ordering cuts (q115/q116/q117) rank by; its SQL twin is
    * [[QualityScoreSql]]. */
  private def qualityScore(nTokens: Column, stopHits: Column): Column =
    round(least(nTokens / lit(100.0), lit(1.0)) * 0.5 +
      least(stopHits / nTokens * 5, lit(1.0)) * 0.5, 6)

  private def tmpStoreRoot(s: SparkSession, dir: String, tag: String): String =
    QueryUtil.tmpStoreRoot(s, dir, tag)

  /** Docs per pack group — the knob that sets cumsum window parallelism. */
  val PackGroupSize = 64

  /** Training-sequence packing over (`doc_id`, `n_tokens`): a running
    * token total within salted pack groups bins docs into 2048-token
    * sequences. The group count SCALES with input size (one group per
    * ~[[PackGroupSize]] docs, floor 8) — a fixed salt would serialize a
    * 100 TB corpus through a constant number of window chains no matter
    * how many executors exist; size-derived groups keep each window
    * partition ~constant-sized as the corpus grows. The count comes from
    * one scalar aggregate broadcast into the scan (no action, no
    * collect). */
  def sequencePack(d: DataFrame): DataFrame = {
    val groups = d.agg(greatest(lit(8L),
      ceil(count(lit(1)) / lit(PackGroupSize.toDouble)).cast("long")).as("__g"))
    d.crossJoin(broadcast(groups))
      .withColumn("pack_group",
        (conv(substring(sha2(concat_ws("|", lit("pack"),
          col("doc_id").cast("string")), 256), 1, 8), 16, 10)
          .cast("long") % col("__g")).cast("int"))
      .drop("__g")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.partitionBy("pack_group").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seq_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(2048)).cast("long"))
  }

  private val S = 12     // minhash signature rows
  private val Bands = 6  // 2 rows per band

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_text_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(toks).cast("long").as("n_tokens"),
        size(TextOps.subwordTokens(col("text"))).cast("long").as("n_subwords"),
        round(length(array_join(toks, "")) / size(toks), 6).as("avg_token_len"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.digitCount(col("text")).as("n_digits"))),

    "q31_text_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"),
        TextOps.punctCount(col("text")).as("n_punct"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("stop_hits") / col("n_tokens"), 6).as("stopword_ratio"),
          round(col("n_punct") / col("n_chars"), 6).as("punct_ratio"),
          (col("n_chars") < 100).as("too_short"),
          (col("stop_hits") / col("n_tokens") < 0.05).as("low_stopword"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score"))),

    "q32_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), col("lang"),
        TextOps.tokenHits(toks, TextOps.StopwordsEn).as("s_en"),
        TextOps.tokenHits(toks, TextOps.StopwordsDe).as("s_de"),
        TextOps.tokenHits(toks, TextOps.StopwordsEs).as("s_es"),
        TextOps.tokenHits(toks, TextOps.StopwordsFr).as("s_fr"))
        .withColumn("predicted_lang",
          when(col("s_de") > col("s_en") && col("s_de") > col("s_es") &&
            col("s_de") > col("s_fr"), "de")
            .when(col("s_es") > col("s_en") && col("s_es") > col("s_fr"), "es")
            .when(col("s_fr") > col("s_en"), "fr")
            .otherwise("en"))
        .withColumn("is_match", col("predicted_lang") === col("lang"))),

    "q33_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextOps.fingerprint(toks).as("fingerprint"))),

    "q34_exact_dedup" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          graft.pipeline.DedupStore.textFingerprint(col("text"))
            .as("text_hash"))
        .groupBy("text_hash")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_doc_id"))),

    "q35_ngram_jaccard" -> ((s, dir) => {
      // persisted: the exploded shingle set feeds four branches (df cap,
      // both join sides, per-doc sizes) — materialize once
      val sh = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(TextOps.shingles(toks, 3))).as("sh"))
        .persist()
      // stop-shingle cap: drop shingles shared by >100 docs (pair blowup
      // guard at scale), and unshared ones (can't form a pair anyway)
      val keep = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).select("sh")
      val shf = sh.join(keep, "sh")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = shf.alias("a").join(shf.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("common") / (col("na") + col("nb") - col("common")), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      materializeAndRelease(pairs, sh)
    }),

    "q36_minhash_lsh" -> ((s, dir) => {
      // one sha per shingle; the 12 signature slots are cheap integer
      // extractions from the stored digests (one-permutation MinHash)
      val sg = docs(s, dir).select(col("doc_id"),
        TextOps.hashedShingles(array_distinct(TextOps.shingles(toks, 3))).as("hs"))
      // the signature travels as ONE array column so the band join can
      // carry both sides' digests and compute est_jaccard IN PLACE —
      // no sig×sig re-join after candidate generation (that added two
      // keyed shuffles of the whole signature table per run)
      val sig = sg.select(col("doc_id"),
        array((0 until S).map(i =>
          TextOps.minhashFromHashes(col("hs"), i)): _*).as("sig"))
        .persist()
      val banded = sig.select(col("doc_id"), col("sig"),
        posexplode(array((0 until Bands).map(b =>
          TextOps.band(Seq(col("sig")(2 * b), col("sig")(2 * b + 1)))): _*)))
        .toDF("doc_id", "sig", "band_idx", "bh")
      // a pair matching several bands gets the same estimate each time —
      // distinct collapses the duplicates after the (narrow) zip_with
      val est = banded.alias("a").join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(aggregate(
            zip_with(col("a.sig"), col("b.sig"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), _ + _) / lit(S.toDouble), 6).as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= 0.5)
      materializeAndRelease(est, sig)
    }),

    // True rolling hash (Rabin-Karp polynomial mod 2^31-1) over 5-token
    // windows; fingerprint = min window hash (winnowing) + window count.
    "q44_rolling_hash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          transform(toks, TextOps.tokenValue(_)).as("vals"))
        .select(col("doc_id"),
          greatest(size(col("vals")) - lit(4), lit(1)).cast("long").as("n_windows"),
          TextOps.rollingMinHash(col("vals"), 5).as("min_window_hash"))),

    // Near-dup clustering: connected components over the Jaccard>=0.5 pair
    // graph via iterative min-label propagation (distributed union-find —
    // the canonical post-LSH step that turns candidate pairs into dedup
    // groups). Each iteration is one join+groupBy; components here have
    // tiny diameter so it converges in a couple of rounds.
    "q48_dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      val sh = d.select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(toks, 3))).as("sh"))
        .persist()
      val keep = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).select("sh")
      val shf = sh.join(keep, "sh")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = shf.alias("a").join(shf.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(round(col("common") / (col("na") + col("nb") - col("common")), 6) >= 0.5)
        .select("doc_a", "doc_b")
      // Delta-iteration min-label propagation over edge vertices only —
      // see [[graft.ops.Graph.connectedComponents]] for the scale shape
      // (per-round work is O(frontier ⋈ edges), not O(all docs)).
      val labels = graft.ops.Graph.connectedComponents(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")),
        // stderr: Bench/Verify stdout is machine-parsed by the driver
        trace = m => System.err.println(s"q48 $m"))
      sh.unpersist()
      // re-attach the isolated docs, then release every persisted frame
      // (unpersisting derived projections would be a silent no-op)
      val out = d.select(col("doc_id"))
        .join(labels.select(col("id").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
        .withColumn("is_duplicate", col("cluster_id") =!= col("doc_id"))
      materializeAndRelease(out, labels)
    }),

    // Canonical-document selection — the step after clustering in every
    // dedup pipeline: per near-dup cluster keep ONE document (longest
    // text, ties to the lowest doc_id) and count what gets dropped. One
    // keyed aggregation over the q48 labels (max_by partial-combines
    // map-side); only multi-member clusters emit.
    "q71_canonical_docs" -> ((s, dir) => {
      val labels = defs("q48_dedup_clusters")(s, dir)
        .select(col("doc_id"), col("cluster_id"))
      val stats = docs(s, dir).select(col("doc_id"), col("n_chars"))
      labels.join(stats, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
            .as("canonical_doc_id"),
          max(col("n_chars")).cast("long").as("canonical_chars"))
        .filter(col("n_members") >= 2)
    }),

    // Deterministic train/val/test split (80/10/10): salted sha256 bucket
    // per doc — the reproducible assignment a training pipeline needs (no
    // RNG; stable under reshuffle, retry and backfill). Narrow map.
    "q53_train_split" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        (conv(substring(sha2(concat_ws("|", lit("split"),
          col("doc_id").cast("string")), 256), 1, 4), 16, 10)
          .cast("long") % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))),

    // Repetition ratio: share of the most frequent 3-gram in all (non-
    // distinct) 3-grams — the standard boilerplate/template signal.
    // Two keyed aggregations, no pairwise work: linear in corpus size.
    // Token-entropy quality score: H = ln N − Σ c·ln c / N over the
    // doc's token frequencies — the information-diversity filter (word-
    // soup and boilerplate score low). Shape: explode → two keyed aggs,
    // partial-combined map-side; the per-doc token space never leaves
    // its partition group.
    "q73_token_entropy" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), explode(toks).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          count(lit(1)).cast("long").as("n_distinct"),
          sum(col("c")).cast("long").as("n_tokens"),
          round(log(sum(col("c"))) -
            sum(col("c") * log(col("c"))) / sum(col("c")), 6).as("entropy"))),

    // Domain-mixture weights: per-language corpus shares and the
    // sqrt-damped variant — the static data-mixing knob a training run
    // consumes. The per-domain rollup is a keyed agg over the corpus;
    // the normalizing window runs over one row per DOMAIN (inherently
    // few), never over documents.
    "q74_mixture_weights" -> ((s, dir) => {
      val g = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(size(toks)).cast("long").as("n_tokens"))
      val all = Window.partitionBy()
      g.select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / sum(col("n_tokens")).over(all), 6).as("tok_share"),
        round(sqrt(col("n_tokens")) / sum(sqrt(col("n_tokens"))).over(all), 6)
          .as("sqrt_weight"))
    }),

    "q54_repetition" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(TextOps.shingles(toks, 3)).as("sh"))
        .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_ngram"), sum("c").as("n_ngrams"))
        .select(col("doc_id"), col("top_ngram"), col("n_ngrams"),
          round(col("top_ngram") / col("n_ngrams"), 6).as("repetition_ratio"))),

    // Corpus vocabulary: top-100 tokens by collection frequency with doc
    // frequency — tokenizer/stopword analysis input. The deterministic
    // (freq DESC, token) total order makes the top-k set reproducible.
    "q55_vocab_topk" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100)),

    // The BPE trainer's inner statistic: adjacent SUBWORD-pair collection
    // frequencies (count symbol pairs → merge the argmax is the whole BPE
    // loop; this is one full iteration's counting step over the corpus).
    // One explode + one keyed agg + TopK — at 100 TB the pair space is the
    // shuffle key and map-side partial aggregation absorbs the heavy
    // hitters; the (freq DESC, pair) total order makes the cut exact.
    // Degenerate single-token docs produce a 1-gram from the shingle
    // helper's floor — the space filter drops them (a pair has 2 parts).
    "q102_bpe_merge_pairs" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(TextOps.shingles(TextOps.subwordTokens(col("text")), 2))
            .as("pair"))
        .filter(col("pair").contains(" "))
        .groupBy("pair")
        .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("doc_freq"))
        .orderBy(col("freq").desc, col("pair"))
        .limit(50)),

    // Benchmark decontamination: training docs sharing distinct 3-gram
    // shingles with an eval/benchmark set (every 10th doc here). Same
    // df-capped shingle equi-join shape as q35 — the [2,100] document-
    // frequency cap bounds the join fan-out on stop-shingles, which is
    // what keeps a 100 TB contamination scan from exploding.
    "q56_decontaminate" -> ((s, dir) => {
      // persisted: the exploded shingle set feeds the df cap AND both
      // sides of the contamination join (q35's idiom) — without it the
      // per-doc shingling re-runs once per branch
      val sh = docs(s, dir).select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(toks, 3))).as("sh"))
        .persist()
      val keep = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).select("sh")
      val shf = sh.join(keep, "sh")
      val bench = shf.filter(col("doc_id") % 10 === 0)
        .select(col("sh"), col("doc_id").as("bench_doc_id"))
      val out = shf.filter(col("doc_id") % 10 =!= 0)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(countDistinct(col("sh")).as("n_shared_shingles"),
          countDistinct(col("bench_doc_id")).as("n_bench_docs"))
        .withColumn("contaminated", col("n_shared_shingles") >= 3)
      materializeAndRelease(out, sh)
    }),

    // The pre-training release gate: contamination rate per train/val/
    // test split — q53's deterministic split joined with q56's eval-
    // overlap flags, rolled up per split. Three rows out; the cost is the
    // two upstream plans it composes.
    "q75_contamination_report" -> ((s, dir) => {
      val splits = defs("q53_train_split")(s, dir).select(col("doc_id"), col("split"))
      // q56's def returns a PERSISTED frame (materializeAndRelease) — the
      // composer owns releasing it once its own rollup has materialized,
      // or the sub-result stays pinned in executor memory forever
      val q56 = defs("q56_decontaminate")(s, dir)
      val contam = q56.select(col("doc_id"), col("contaminated"))
      val out = splits.join(contam, Seq("doc_id"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
        .withColumn("contamination_rate",
          round(col("n_contaminated") / col("n_docs"), 6))
      materializeAndRelease(out, q56)
    }),

    // TF-IDF: per-doc top term by tf·ln(N/df) — the classic relevance/
    // keyword-extraction weight. Two keyed aggregations + one broadcast
    // scalar (corpus size) + a per-doc window for the argmax; linear in
    // token count, shuffles on token and doc_id only.
    "q58_tfidf" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), explode(toks).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfq = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val total = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      tf.join(dfq, "token").crossJoin(broadcast(total))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs") / col("df")), 6))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("tfidf").desc, col("token"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("token").as("top_token"),
          col("tf"), col("df"), col("tfidf"))
    }),

    // Training-sequence packing: docs binned into 2048-token sequences by
    // a running total WITHIN salted pack groups. The salt keeps the cumsum
    // window partition-local — a single global running total would
    // serialize a 100 TB corpus through one partition; per-group packing
    // is the standard distributed compromise (each group packs
    // independently, groups fill executors in parallel).
    "q66_sequence_pack" -> ((s, dir) => sequencePack(
      docs(s, dir).select(col("doc_id"), size(toks).cast("long").as("n_tokens")))),

    // RAG/pretraining chunking: overlapping 32-token windows at stride 24
    // per doc, each chunk content-addressed by a sha256 over its joined
    // tokens (dedup/caching key downstream). Narrow map — one generated
    // array per doc, chunks never leave the executor unjoined.
    "q69_chunking" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(1), greatest(size(col("t")) - lit(31), lit(1)), lit(24)),
          i => struct(
            size(slice(col("t"), i, lit(32))).as("n_tokens"),
            sha2(array_join(slice(col("t"), i, lit(32)), " "), 256).as("chunk_hash")))))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          col("col.n_tokens").as("n_tokens"),
          col("col.chunk_hash").as("chunk_hash"))),

    // PII detection + redaction: deterministic synthetic PII (an email, a
    // phone, an IP derived from doc_id) is appended to each doc, then
    // counted and redacted via the shared TextOps patterns. Narrow map at
    // scan speed — regex scans inside whole-stage codegen, no UDFs, no
    // shuffle; the redaction-before-training gate on a 100 TB corpus is
    // exactly this shape. The oracle replays the injection, the counts,
    // and the sha256 of the redacted text — one character of divergence
    // between the engines' regex semantics would flip every hash.
    "q77_pii_redact" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" tel +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" host 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7")).as("text"))
        .select(col("doc_id"),
          TextOps.piiCount(col("text"), TextOps.PiiEmail).as("n_emails"),
          TextOps.piiCount(col("text"), TextOps.PiiPhone).as("n_phones"),
          TextOps.piiCount(col("text"), TextOps.PiiIp).as("n_ips"),
          sha2(TextOps.redactPii(col("text")), 256).as("redacted_sha"))),

    // Quality-proportional deterministic sampling: accept a doc iff its
    // salted-hash uniform < quality weight — the reproducible way to take
    // a quality-weighted subcorpus with no RNG state and no coordination
    // (pure map: any executor layout, retry, or re-run yields the same
    // set, the property a 1000-executor sampling job actually needs).
    "q78_weighted_sample" -> ((s, dir) => {
      val w = least(lit(1.0), size(toks) / lit(100.0))
      val u = conv(substring(sha2(concat_ws("|", lit("wsample"),
        col("doc_id").cast("string")), 256), 1, 6), 16, 10)
        .cast("double") / lit(16777216.0)
      docs(s, dir).select(col("doc_id"),
        round(w, 6).as("weight"), round(u, 6).as("u"),
        (u < w).as("accepted"))
    }),

    // SimHash near-dup pairs — what the q37 signatures are FOR: the
    // 32-bit simhash splits into 4 byte bands; by pigeonhole any pair at
    // hamming distance ≤ 3 shares at least one band, so candidates come
    // from a band equi-join (bucketed, never all-pairs) and one
    // bit_count(xor) verifies each candidate — integer ops end to end,
    // 12 sha-free bytes per doc cross the shuffle. The standard simhash
    // dedup shape at web-corpus scale.
    "q84_simhash_hamming" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), explode(toks).as("t"))
        .select(col("doc_id"), TextOps.hashWord32(sha2(col("t"), 256)).as("w"))
      val sums = tok.groupBy("doc_id").agg(
        sum(TextOps.wordBit(col("w"), 0) * 2 - lit(1)).as("b0"),
        (1 until 32).map(b =>
          sum(TextOps.wordBit(col("w"), b) * 2 - lit(1)).as(s"b$b")): _*)
      val sim = sums.select(col("doc_id"),
        (0 until 32).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim")).persist()
      val bands = sim.select(col("doc_id"), posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), 8 * b).bitwiseAND(lit(255L))): _*)))
        .toDF("doc_id", "band_idx", "bv")
      val pairs = bands.alias("x").join(bands.alias("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .join(sim.select(col("doc_id").as("doc_a"), col("sim").as("sim_a")), "doc_a")
        .join(sim.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .filter(col("hamming") <= 3)
      materializeAndRelease(pairs, sim)
    }),

    "q37_simhash" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("t"))
        // one sha AND one hex→int parse per token; the 32 bit reads below
        // are then pure integer shifts inside whole-stage codegen
        .select(col("doc_id"), TextOps.hashWord32(sha2(col("t"), 256)).as("w"))
      val sums = tok.groupBy("doc_id").agg(
        sum(TextOps.wordBit(col("w"), 0) * 2 - lit(1)).as("b0"),
        (1 until 32).map(b =>
          sum(TextOps.wordBit(col("w"), b) * 2 - lit(1)).as(s"b$b")): _*)
      sums.select(col("doc_id"),
        concat_ws("", (0 until 32).map(b =>
          when(col(s"b$b") > 0, "1").otherwise("0")): _*).as("simhash"))
    }),

    // Exact-substring cross-doc duplication at 8-gram granularity (the
    // token-window approximation of suffix-array exact dedup over a
    // training corpus): per doc, the fraction of its 8-token spans that
    // also occur verbatim in ANOTHER document. One explode + one span-
    // keyed agg + one span-keyed join — the span hash is the shuffle key,
    // so a 100 TB corpus shards by content and no doc pair ever meets.
    "q103_span_dedup" -> ((s, dir) => {
      // persisted: the exploded spans feed both the >=2-docs span set and
      // the per-position flagging join (q56's idiom)
      val sp = docs(s, dir).select(col("doc_id"),
        explode(TextOps.shingles(toks, SpanK)).as("span")).persist()
      val dup = sp.groupBy("span")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("span"), lit(1L).as("isdup"))
      val out = sp.join(dup, Seq("span"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(coalesce(col("isdup"), lit(0L))).as("dup_spans"))
        .withColumn("dup_fraction",
          round(col("dup_spans") / col("n_spans"), 6))
      materializeAndRelease(out, sp)
    }),

    // Inverted-index build (search/retrieval side of a corpus store):
    // token -> document frequency, collection frequency, and the head of
    // the sorted posting list. One explode + one token-keyed agg. The
    // posting head is a k-bounded mergeable aggregator (BottomKLong), so
    // even a stop-token's agg state is 8 longs — collect_set would hold
    // that token's ENTIRE posting list (the corpus) in one buffer.
    "q104_inverted_index" -> ((s, dir) => {
      val bk = graft.functions.BottomK.bottomKLong(8)
      docs(s, dir).select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token")
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          count(lit(1)).as("coll_freq"),
          concat_ws(",", bk(col("doc_id")).cast("array<string>"))
            .as("postings_head"))
    }),

    // BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed conjunctive
    // query — the ranking twin of q58's TF-IDF. Term frequencies are
    // narrow HOF scans; N/avgdl/df are ONE scalar aggregate broadcast
    // back into the scan, so the corpus is read twice and shuffled never.
    "q105_bm25" -> ((s, dir) => {
      val dl = docs(s, dir).select(
        (col("doc_id") +: size(toks).cast("double").as("dl") +:
          BmQuery.zipWithIndex.map { case (t, i) =>
            size(filter(toks, x => x === lit(t))).cast("double").as(s"tf$i")
          }): _*)
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n"),
        avg(col("dl")).as("avgdl") +:
          BmQuery.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i")): _*)
      val score = BmQuery.indices.map { i =>
        val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
        val tf = col(s"tf$i")
        idf * (tf * lit(BmK1 + 1.0)) /
          (tf + lit(BmK1) * (lit(1.0 - BmB) + lit(BmB) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      dl.crossJoin(broadcast(stats))
        .select(col("doc_id"), round(score, 6).as("bm25"))
        .filter(col("bm25") > 0)
    }),

    // Corpus-mix overlap: pairwise trigram-shingle Jaccard between
    // sources, estimated from mergeable KMV (bottom-k) sketches AND
    // exact, so the result itself documents the sketch's accuracy. The
    // sketch path is the 100 TB shape — per-source state is k strings
    // regardless of shingle cardinality, pairs form over S sketch rows,
    // never over shingles; the exact path shuffles on shingle, never on
    // docs. (Trigrams, not tokens: the corpus shares one token
    // vocabulary, so only word-order granularity separates sources.)
    "q106_kmv_source_overlap" -> ((s, dir) => {
      val st = docs(s, dir).select(col("source"),
        explode(TextOps.shingles(toks, 3)).as("t"))
        .distinct().persist()
      val bk = graft.functions.BottomK.bottomK(KmvK)
      val sk = st.groupBy("source")
        .agg(bk(sha2(col("t"), 256)).as("sk"), count(lit(1)).as("nt"))
      val ex = st.alias("a").join(st.alias("b"),
        col("a.t") === col("b.t") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("common"))
      val out = ex
        .join(sk.select(col("source").as("source_a"), col("sk").as("ska"),
          col("nt").as("na")), "source_a")
        .join(sk.select(col("source").as("source_b"), col("sk").as("skb"),
          col("nt").as("nb")), "source_b")
        .withColumn("u", slice(array_sort(array_distinct(
          concat(col("ska"), col("skb")))), 1, KmvK))
        .select(col("source_a"), col("source_b"),
          round(col("common") / (col("na") + col("nb") - col("common")), 6)
            .as("exact_jaccard"),
          round(size(filter(col("u"), h =>
            array_contains(col("ska"), h) && array_contains(col("skb"), h)))
            / size(col("u")).cast("double"), 6).as("kmv_jaccard"))
      materializeAndRelease(out, st)
    }),

    // Unigram-LM cross-entropy quality scoring (the perplexity-filter
    // shape CCNet/C4-style pipelines run, with the corpus itself as the
    // LM): per doc, the average negative log-probability of its tokens
    // under corpus unigram frequencies, and the perplexity proxy
    // exp(avg). Two token-keyed aggs + one token-keyed join + one scalar
    // broadcast — the LM "training" and the scoring pass are the same
    // linear scan, no per-doc state beyond the running mean.
    "q108_lm_perplexity" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("token")).persist()
      val freq = tok.groupBy("token").agg(count(lit(1)).as("cf"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      val out = tok.join(freq, "token").crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("cf") / col("n_total"))), 6).as("avg_neg_logp"))
        // exp over the ALREADY-rounded mean: deterministic across engines
        .withColumn("ppl_proxy", round(exp(col("avg_neg_logp")), 6))
      materializeAndRelease(out, tok)
    }),

    // The full BPE loop, [[BpeRounds]] iterations unrolled (q94's
    // unrolled-Lloyd pattern applied to tokenizer training): each round
    // learns the corpus-argmax adjacent pair over the CURRENT encoding
    // and greedily merges it, then the next round counts over the merged
    // stream — q102 is one round's counting step; this is the trainer
    // AND the encoder. Merges apply across the whole subword stream
    // (token-stream BPE, consistent with q102's pair space). Per round:
    // one pair-keyed agg + a 1-row broadcast + a narrow map — M rounds
    // cost M linear scans, the trainer's real shape at 100 TB. Each
    // round materializes before the next so round r's lineage doesn't
    // re-run rounds 1..r-1 once per plan branch.
    "q110_bpe_encode" -> ((s, dir) => {
      var cur = docs(s, dir)
        .select(col("doc_id"), TextOps.subwordTokens(col("text")).as("t"))
        .select(col("doc_id"),
          concat(lit(" "), array_join(col("t"), "  "), lit(" ")).as("s"),
          size(col("t")).as("n0")).persist()
      cur.count()
      for (_ <- 1 to BpeRounds) {
        val next = bpeRound(cur).persist()
        next.count()
        cur.unpersist()
        cur = next
      }
      val nEnc = size(split(trim(col("s")), "  ")).cast("long")
      val out = cur.select(col("doc_id"), col("n0").cast("long").as("n_subwords"),
        nEnc.as("n_encoded"),
        round(nEnc / col("n0"), 6).as("compression"))
      materializeAndRelease(out, cur)
    }),

    // Mixture RESAMPLING toward a uniform target (the transform behind
    // q74's observed weights and q116's per-source caps: actually DRAW
    // the training mix): every source contributes up to an equal share
    // of the [[TokenBudgetShare]] global token budget, docs taken in
    // salted-hash order (reproducible, order-free, no quality coupling —
    // the pure mixture knob). Shape: one narrow map + a SOURCE-KEYED
    // cumsum window (partitions by a real key, never a global window) +
    // a broadcast scalar; a source smaller than its slot contributes
    // everything it has.
    "q126_mixture_resample" -> ((s, dir) => {
      // persisted: the target aggregate and the cumsum branch share the
      // tokenized frame — uncached they would each re-scan and
      // re-tokenize the corpus (the q116 idiom)
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tokens"),
        sha2(concat_ws("|", lit("mix"), col("doc_id").cast("string")), 256)
          .as("__h")).persist()
      val target = d.agg(
        floor(sum("n_tokens") * lit(TokenBudgetShare) /
          countDistinct(col("source"))).cast("long").as("target"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__h"), col("doc_id"))
      val out = d.withColumn("cum_tokens", sum("n_tokens").over(w))
        .crossJoin(broadcast(target))
        .filter(col("cum_tokens") <= col("target"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"))
      materializeAndRelease(out, d)
    }),

    // Train/test vocabulary overlap (the LEAKAGE dashboard number q56's
    // shingle decontamination complements at token granularity: how
    // much of the test split's vocabulary — and token mass — does the
    // train split already cover?): q53's deterministic split, two
    // vocab-sized distinct sets, one token-keyed join. All shuffles are
    // token-keyed over VOCAB-sized frames — sublinear in corpus bytes.
    "q130_split_vocab_overlap" -> ((s, dir) => {
      val splits = defs("q53_train_split")(s, dir)
        .select(col("doc_id"), col("split"))
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("token"))
        .join(splits, "doc_id")
      val vocab = tok.groupBy(col("split"), col("token"))
        .agg(count(lit(1)).as("cf"))
      val test = vocab.filter(col("split") === "test")
        .select(col("token"), col("cf").as("test_cf"))
      val train = vocab.filter(col("split") === "train")
        .select(col("token"), lit(1).as("__in_train"))
      test.join(train, Seq("token"), "left")
        .agg(count(lit(1)).as("test_vocab"),
          sum(col("__in_train")).cast("long").as("covered_vocab"),
          sum(col("test_cf")).as("test_tokens"),
          sum(when(col("__in_train").isNotNull, col("test_cf"))
            .otherwise(0L)).as("covered_tokens"))
        .select(col("test_vocab"), col("covered_vocab"),
          round(col("covered_vocab") / col("test_vocab"), 6).as("vocab_coverage"),
          col("test_tokens"), col("covered_tokens"),
          round(col("covered_tokens") / col("test_tokens"), 6).as("token_coverage"))
    }),

    // Per-source length-distribution quantiles (the sequence-budget
    // sizing signal behind q118's batch shaping: what p50/p90/p99 doc
    // lengths is each feed actually delivering?): EXACT interpolated
    // percentiles — Spark's percentile aggregate is a per-group
    // sorted-merge of numeric values, fine for per-SOURCE groups whose
    // value sets are doc counts, and bit-compatible with the oracle's
    // quantile_cont (same (n-1)·p linear-interpolation convention).
    "q129_length_quantiles" -> ((s, dir) =>
      docs(s, dir).select(col("source"),
          size(toks).cast("double").as("n_tokens"))
        .groupBy("source")
        // ONE array-percentile aggregate: the exact Percentile buffer
        // holds every group value — three scalar calls would keep three
        // copies of each source's length set during the merge
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_tokens, array(0.5, 0.9, 0.99))").as("__p"),
          max(col("n_tokens")).cast("long").as("max_tokens"))
        .select(col("source"), col("n_docs"),
          round(col("__p")(0), 6).as("p50"),
          round(col("__p")(1), 6).as("p90"),
          round(col("__p")(2), 6).as("p99"),
          col("max_tokens"))),

    // Exact-duplicate rate per source (the curation dashboard number
    // behind q34's keep-list: which ingest feeds are actually paying
    // for dedup?): canonical = lowest doc_id per normalized-text hash,
    // everything else per source counts as a duplicate. Two keyed
    // aggregations, linear.
    "q127_dedup_rate_by_source" -> ((s, dir) => {
      val d = docs(s, dir)
      val hash = d.select(col("doc_id"), col("source"),
        graft.pipeline.DedupStore.textFingerprint(col("text")).as("h"))
      val canon = hash.groupBy("h").agg(min("doc_id").as("canon_id"))
      hash.join(canon, "h")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") =!= col("canon_id"), 1L).otherwise(0L))
            .as("n_dups"))
        .withColumn("dup_rate", round(col("n_dups") / col("n_docs"), 6))
    }),

    // Tokenizer-fertility report by source, THROUGH the persisted
    // TokenizerStore (the question a tokenizer owner actually asks
    // before committing a vocab: how many subword tokens per word does
    // each domain pay?): train once on the corpus snapshot, encode via
    // the store's single codegen projection, roll up per source. The
    // oracle replays train+encode in pure SQL (the q110 chain), so the
    // store's merge-table round-trip and the encode projection are both
    // under the hash compare — q110 proves per-doc parity, this proves
    // the train-once/apply-everywhere artifact path end-to-end.
    "q125_fertility_by_source" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "tokstore")
      val d = docs(s, dir)
      graft.pipeline.TokenizerStore.train(s, root, d, rounds = BpeRounds)
      val enc = graft.pipeline.TokenizerStore.encode(s, root, d)
        .select(col("doc_id"), col("n_tokens").as("n_encoded"))
      d.select(col("doc_id"), col("source"),
          size(toks).cast("long").as("n_words"),
          size(TextOps.subwordTokens(col("text"))).cast("long").as("n_subwords"))
        .join(enc, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"),
          sum("n_subwords").as("n_subwords"),
          sum("n_encoded").as("n_encoded"),
          round(sum("n_encoded") / sum("n_words"), 6).as("fertility"),
          round(sum("n_encoded") / sum("n_subwords"), 6).as("compression"))
    }),

    // DSIR-style data selection (importance resampling against a target
    // domain, Xie et al. 2023): score every doc by the average unigram
    // log-likelihood ratio between a small target corpus (source =
    // [[DsirTarget]]) and the raw pool, both add-half smoothed over the
    // pool vocabulary, and keep the global top-[[DsirK]]. Per-token
    // ratios are rounded then summed through DECIMAL(38,6) so the score
    // is bit-identical across engines regardless of addition order. The
    // LM table is vocab-sized (sublinear in corpus bytes) — the
    // token⋈lm join broadcasts at small SF and hash-shuffles at 100 TB,
    // AQE's call; the final cut is orderBy+limit → TakeOrderedAndProject
    // (per-partition top-K + driver merge of K·P rows, no global sort).
    "q111_dsir_select" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("source"), explode(toks).as("token"))
        .persist()
      val raw = tok.groupBy("token").agg(count(lit(1)).as("cr"))
      val tgt = tok.filter(col("source") === DsirTarget)
        .groupBy("token").agg(count(lit(1)).as("ct"))
      val lm = raw.join(tgt, Seq("token"), "left")
        .select(col("token"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      val scal = lm.agg(sum("cr").as("nr"), sum("ct").as("nt"),
        count(lit(1)).as("v"))
      val out = tok.join(lm, "token").crossJoin(broadcast(scal))
        .select(col("doc_id"), col("source"),
          round(log((col("ct") + lit(0.5)) / (col("nt") + lit(0.5) * col("v"))) -
            log((col("cr") + lit(0.5)) / (col("nr") + lit(0.5) * col("v"))), 6)
            .cast("decimal(38,6)").as("lr"))
        .groupBy("doc_id", "source")
        .agg(sum("lr").as("slr"), count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          round(col("slr").cast("double") / col("n_tokens"), 6).as("dsir_score"))
        .orderBy(col("dsir_score").desc, col("doc_id"))
        .limit(DsirK)
      materializeAndRelease(out, tok)
    }),

    // CCNet-style perplexity partitioning: bucket every doc into
    // head/middle/tail terciles of the corpus-LM negative log-prob
    // WITHIN its language, then report each bucket's population and its
    // nlp range — the cut table a curation pipeline uses to keep "head"
    // data and downsample "tail". ntile runs over per-doc rows (not
    // tokens), so the sort is one range-partitioned shuffle of O(docs)
    // narrow rows per language — the same cost class as the z-order
    // sort (q82), nowhere near the token-level heavy lifting.
    "q112_ppl_buckets" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(toks).as("token"))
        .persist()
      val freq = tok.groupBy("token").agg(count(lit(1)).as("cf"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      val perDoc = tok.join(freq, "token").crossJoin(broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(round(avg(-log(col("cf") / col("n_total"))), 6).as("nlp"),
          count(lit(1)).as("n_toks"))
      val out = perDoc
        .withColumn("bucket", ntile(3).over(
          Window.partitionBy("lang").orderBy(col("nlp"), col("doc_id"))))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("bucket_tokens"),
          min("nlp").as("min_nlp"),
          max("nlp").as("max_nlp"),
          // decimal path: exact regardless of per-engine addition order
          sum(col("nlp").cast("decimal(38,6)")).cast("double").as("sum_nlp"))
      materializeAndRelease(out, tok)
    }),

    // The release gate itself: one keep/drop verdict per document with
    // the FIRST tripped reason in pipeline order — exact-dup (q34's
    // canonical-hash rule), length and stopword quality (q31's exact
    // cuts), benchmark holdout membership (q53's deterministic
    // `split = 'test'` assignment — the REAL pipeline signal, so the
    // cascade composes the same split the release gate trains against),
    // then benchmark contamination (q56's capped-shingle overlap, reused
    // as a subquery). This is the operator a curation run actually
    // applies after all the signal queries: every signal is a doc-keyed
    // agg or equi-join, the verdict itself a narrow codegen map —
    // nothing here adds a shuffle beyond the signals it composes.
    "q114_filter_cascade" -> ((s, dir) => {
      val d = docs(s, dir)
      val hash = d.select(col("doc_id"),
        graft.pipeline.DedupStore.textFingerprint(col("text")).as("h"))
      val canon = hash.groupBy("h").agg(min("doc_id").as("canon_id"))
      val dup = hash.join(canon, "h")
        .select(col("doc_id"), (col("doc_id") =!= col("canon_id")).as("exact_dup"))
      val quality = d.select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
      val splits = defs("q53_train_split")(s, dir)
        .select(col("doc_id"), col("split"))
      // q56's def returns a PERSISTED frame — release it once the
      // cascade verdict has materialized (the q75 idiom)
      val q56 = defs("q56_decontaminate")(s, dir)
      val contam = q56.select(col("doc_id"), col("contaminated"))
      val out = quality.join(dup, "doc_id")
        .join(splits, "doc_id")
        .join(contam, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_dup"), "exact_duplicate")
            .when(col("n_chars") < 100, "too_short")
            .when(col("stop_hits") / col("n_tokens") < 0.05, "low_stopword")
            .when(col("split") === "test", "benchmark_holdout")
            .when(coalesce(col("contaminated"), lit(false)), "contaminated")
            .otherwise("kept").as("reason"))
        .withColumn("keep", col("reason") === "kept")
      materializeAndRelease(out, q56)
    }),

    // Quality-score calibration bands (the threshold-tuning table for
    // q31's score: per 0.1-wide score band, how many docs does the
    // release gate actually keep, and how contaminated is the band?):
    // fixed arithmetic bands — never a global-ntile window — so the
    // report is one doc-keyed join + one keyed agg.
    "q133_quality_bands" -> ((s, dir) => {
      val gate = defs("q114_filter_cascade")(s, dir)
      val d = docs(s, dir).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
        .select(col("doc_id"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score"))
      val out = d.join(gate.select(col("doc_id"), col("reason")), "doc_id")
        .withColumn("band", floor(col("quality_score") * 10).cast("int"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("reason") === "kept", 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("reason") === "contaminated", 1L).otherwise(0L))
            .as("n_contaminated"))
        .withColumn("keep_rate", round(col("n_kept") / col("n_docs"), 6))
      materializeAndRelease(out, gate)
    }),

    // The composed curation cut a release ACTUALLY ships: the q114
    // release-gate verdict feeds the q115 token-budget selection, so
    // only kept docs compete for the budget and the budget derives
    // from the KEPT token mass — the cascade→selection pipeline
    // end-to-end under one hash compare. Same scale shapes as its
    // parts: doc-keyed signals + one distributed prefix sum.
    "q132_curated_budget" -> ((s, dir) => {
      // q114's def returns a PERSISTED frame — released after the cut
      // materializes (the q75 idiom)
      val gate = defs("q114_filter_cascade")(s, dir)
      val keptIds = gate.filter(col("keep")).select("doc_id")
      val d = docs(s, dir).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
        .join(keptIds, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score"))
      val (cum, cached, total) = graft.ops.PrefixSum.runningTotalSummed(d,
        Seq(col("quality_score").desc, col("doc_id")), col("n_tokens"),
        "cum_tokens")
      // the budget scalar derives from the prefix pass's own exact long
      // total (same double multiply + floor the aggregate computed) —
      // literal predicate, no second aggregate action
      val budgetV = math.floor(Option(total)
        .map(_.asInstanceOf[java.lang.Long].longValue).getOrElse(0L)
        * TokenBudgetShare).toLong
      val out = cum
        .filter(col("cum_tokens") <= budgetV)
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("cum_tokens"))
      materializeAndRelease(out, cached, gate)
    }),

    // Token-budget selection (the curation cut every pretraining run
    // makes: "keep the best documents until N tokens"): order the corpus
    // by quality (q31's score), take the greedy prefix whose cumulative
    // token count fits [[TokenBudgetShare]] of the corpus. The cumulative
    // sum is a DISTRIBUTED prefix sum — a bare
    // `Window.orderBy(score)` would funnel the whole corpus through ONE
    // partition (the classic global-window scale killer); instead the
    // corpus is range-repartitioned on the order key, each partition
    // cumsums locally (window keyed by partition id), and per-partition
    // totals — one row per partition, never corpus rows — are offset-
    // summed and broadcast back. Range partitioning guarantees partition
    // i's keys all precede partition i+1's, so local cumsum + offset IS
    // the global cumsum. All counters are longs: the prefix sum is exact
    // regardless of partitioning, so the budget cut is bit-stable across
    // cluster sizes.
    "q115_token_budget" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
        .select(col("doc_id"), col("n_tokens"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score"))
      val (cum, cached, total) = graft.ops.PrefixSum.runningTotalSummed(d,
        Seq(col("quality_score").desc, col("doc_id")), col("n_tokens"),
        "cum_tokens")
      // the budget scalar rides the prefix pass's own exact long total
      // (never a second tokenize scan, and no second aggregate action)
      val budgetV = math.floor(Option(total)
        .map(_.asInstanceOf[java.lang.Long].longValue).getOrElse(0L)
        * TokenBudgetShare).toLong
      val out = cum
        .filter(col("cum_tokens") <= budgetV)
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("cum_tokens"))
      materializeAndRelease(out, cached)
    }),

    // Per-source token caps (the mixture-ENFORCEMENT transform behind
    // q74's mixture weights: no domain may exceed [[SourceCapShare]] of
    // its own token mass, best-first): the same greedy prefix cut as
    // q115 but per source, so the cumsum window partitions by a real
    // key and parallelizes natively — no range machinery needed. A
    // single pathological mega-source would concentrate one window
    // partition; that source falls back to q115's range+offset shape
    // (or q43's salting) — for real corpus mixes source counts are
    // O(thousands) and balanced enough.
    "q116_source_caps" -> ((s, dir) => {
      // persisted: the caps branch and the cumsum branch both consume the
      // tokenized frame — uncached they would each re-scan and
      // re-tokenize the corpus
      val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(toks).cast("long").as("n_tokens"),
          TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score")).persist()
      val caps = d.groupBy("source")
        .agg(floor(sum("n_tokens") * lit(SourceCapShare)).cast("long").as("cap"))
      val out = d.withColumn("cum_tokens", sum("n_tokens").over(
          Window.partitionBy("source")
            .orderBy(col("quality_score").desc, col("doc_id"))))
        .join(broadcast(caps), "source")
        .filter(col("cum_tokens") <= col("cap"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("quality_score"), col("cum_tokens"))
      materializeAndRelease(out, d)
    }),

    // Curriculum interleave (the training-ORDER step after selection):
    // give every document a global position that round-robins across
    // sources best-quality-first, so no epoch prefix is a single-domain
    // block. The position is ARITHMETIC — rank-within-source (a
    // source-keyed window, parallel by source) strided by the source
    // count: pos = (rn−1)·|sources| + source_index. No global window,
    // no global sort: the only unpartitioned window runs over the
    // O(sources) distinct-source frame (the q74 idiom), and the output
    // ordering is carried as a column for the shard writer to range-
    // partition on. Sources of unequal size leave holes in the tail of
    // the position space — positions are an ordering key, not a dense
    // index.
    "q117_curriculum" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(toks).cast("long").as("n_tokens"),
          TextOps.tokenHits(toks, TextOps.StopwordsEn).as("stop_hits"))
        .select(col("doc_id"), col("source"),
          qualityScore(col("n_tokens"), col("stop_hits")).as("quality_score"))
      val ranked = d.withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("quality_score").desc, col("doc_id"))).cast("long"))
      val srcs = d.select("source").distinct()
      val si = srcs.withColumn("si",
        row_number().over(Window.orderBy("source")).cast("long"))
      val ns = srcs.agg(count(lit(1)).as("ns"))
      ranked.join(broadcast(si), "source").crossJoin(broadcast(ns))
        .select(col("doc_id"), col("source"), col("quality_score"),
          ((col("rn") - 1) * col("ns") + col("si")).as("train_pos"))
    }),

    // Length-bucketed batch shaping (padding-efficiency accounting for
    // training): docs bucket by the bit length of their token count
    // (power-of-2 length classes, computed via `bin()` so both engines
    // agree exactly — no float log2 edge cases), then shard into
    // ~[[BatchDocs]]-doc batches by salted hash WITHIN their bucket —
    // the shuffled-batching a data loader actually does, and a shape
    // that is pure keyed aggregation: per-bucket counts (O(buckets),
    // broadcast back), then one (bucket, batch) agg for the padding
    // report. pad_tokens = docs·batchmax − tokens is the dynamic-
    // padding waste the bucketing exists to minimize. No windows at
    // all, so batch formation parallelizes regardless of how skewed
    // the length distribution is.
    "q118_length_batches" -> ((s, dir) => {
      // persisted: the per-bucket counts and the batch assignment both
      // consume the tokenized frame (see q116)
      val d = docs(s, dir)
        .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
        .withColumn("bucket_bits", length(bin(col("n_tokens"))).cast("int"))
        .persist()
      val counts = d.groupBy("bucket_bits")
        .agg(ceil(count(lit(1)) / lit(BatchDocs.toDouble)).cast("long").as("nb"))
      val out = d.join(broadcast(counts), "bucket_bits")
        .withColumn("batch_id",
          conv(substring(sha2(concat_ws("|", lit("batch"),
            col("doc_id").cast("string")), 256), 1, 8), 16, 10)
            .cast("long") % col("nb"))
        .groupBy("bucket_bits", "batch_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("batch_tokens"),
          max("n_tokens").as("max_len"))
        .select(col("bucket_bits"), col("batch_id"), col("n_docs"),
          col("batch_tokens"), col("max_len"),
          (col("n_docs") * col("max_len") - col("batch_tokens")).as("pad_tokens"),
          round(col("batch_tokens") / (col("n_docs") * col("max_len")), 6)
            .as("fill_ratio"))
      materializeAndRelease(out, d)
    }),

    // The persisted-LM path oracle-proved end-to-end (q83's pattern
    // applied to [[graft.pipeline.LmStore]]): train the unigram LM on
    // the clean reference slice (source = [[DsirTarget]]), commit it as
    // a store table, then score every OTHER document against the STORED
    // vocab — the real CCNet deployment shape, where the reference that
    // trained the filter is not the corpus being filtered. Add-half
    // smoothing keeps OOV candidates finite; `oov_tokens` is the drift
    // signal. The oracle replays train+score in pure SQL, so the store's
    // write→read round-trip itself is under the hash compare.
    "q119_lm_store_score" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "lmstore")
      val d = docs(s, dir)
      graft.pipeline.LmStore.train(s, root,
        d.filter(col("source") === DsirTarget))
      graft.pipeline.LmStore.score(s, root,
        d.filter(col("source") =!= DsirTarget))
    }),

    // The shard-publish path oracle-proved the same way: build the
    // token-balanced contiguous shard tables from a deterministic
    // training order (ascending doc_id) through
    // [[graft.pipeline.TrainingShards]] and return the committed
    // MANIFEST — doc/token counts and the order span per shard. The
    // oracle recomputes the greedy token split with a window cumsum, so
    // the distributed prefix sum, the shard assignment arithmetic, the
    // partitioned snapshot commit, and the manifest derivation are all
    // under the hash compare.
    "q120_shard_manifest" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "shards")
      val corpus = docs(s, dir).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (col("doc_id") + 1).as("train_pos"))
      graft.pipeline.TrainingShards.build(s, root, corpus, ShardCount)
      graft.pipeline.TrainingShards.readManifest(s, root)
    }),

    // GDPR erasure through a PUBLISHED epoch (the q101 contract applied
    // to the training-shard layer): publish the q120 shards, FORGET a
    // deterministic subject set, then return every surviving shard row
    // joined with the REFRESHED manifest. The hash compare proves all
    // three erasure properties at once — erased doc_ids hold no row,
    // survivors keep their original (pre-delete) shard assignment
    // byte-identically, and the manifest describes exactly the committed
    // survivors (the oracle recomputes it from the post-delete set). The
    // forget itself is partition-aware: only shard partitions holding a
    // forgotten doc rewrite, the rest ride the manifest by reference.
    "q122_shards_forget" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "shardsf")
      val corpus = docs(s, dir).select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (col("doc_id") + 1).as("train_pos"))
      graft.pipeline.TrainingShards.build(s, root, corpus, ShardCount)
      graft.pipeline.TrainingShards.forget(s, root,
        corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      val survivors = graft.tx.AtomicRewrite.read(s,
        graft.pipeline.TrainingShards.Paths(root).shards)
        .select("shard_id", "doc_id", "n_tokens", "train_pos")
      val manifest = graft.pipeline.TrainingShards.readManifest(s, root)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      survivors.join(manifest, "shard_id")
    }),

    // The persisted BM25 index end-to-end (the retrieval twin of q83's
    // ANN store): build the bucket-partitioned inverted index, then
    // answer an ARBITRARY query batch THROUGH the store — each query's
    // terms read only their token-hash bucket partitions, df comes from
    // the postings read, N/avgdl from the narrow docstats table, and the
    // per-(query, doc) sum runs through exact decimals (the q108
    // convention) into the TopKPerKey heap. The oracle replays the full
    // build→score pipeline in SQL, so the store's write→read round-trip,
    // the denormalized dl, and the bucket pruning are all under the hash
    // compare. Queries: every 50th doc asks its 4 lexicographically
    // first distinct tokens.
    "q123_bm25_store" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "bm25")
      val d = docs(s, dir)
      graft.pipeline.IndexStore.build(s, root, d)
      val q = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          slice(array_sort(array_distinct(toks)), 1, 4).as("terms"))
      graft.pipeline.IndexStore.query(s, root, q, k = 5)
    }),

    // Serve straight from the COMPOSED curation root: two ingest-only
    // runBatch cycles build the index incrementally (land → append with
    // replacement semantics, the q136 merge path), then the q123 query
    // panel scores against it. The oracle recomputes BM25 over the
    // exact-canon landed set — so a doc the dedup store rejected, a
    // ghost posting, or stats drift between build and append would all
    // move a score. This is the ingest→serve pin: what a user retrieves
    // from a curation root is exactly what the composition landed.
    "q142_curation_serve" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "cursrv")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        budgetShare = TokenBudgetShare, nShards = ShardCount)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf, publish = false)
      val q = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          slice(array_sort(array_distinct(toks)), 1, 4).as("terms"))
      graft.pipeline.IndexStore.query(s,
        graft.pipeline.CurationRunner.Paths(root).index, q, k = 5)
    }),

    // GDPR erasure through the persisted BM25 index (the q101/q122
    // contract on the retrieval layer): build, FORGET a deterministic
    // subject set, then run the q123 query batch — erased docs must be
    // unretrievable AND every surviving score must reflect the
    // post-erasure corpus statistics (N, avgdl and df all shift, because
    // scoring derives them from the committed tables; the oracle
    // recomputes everything over the surviving docs only). The forget
    // itself touches at most PostingBuckets partitions — the forgotten
    // docs' distinct token buckets — never the whole index.
    "q124_bm25_forget" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "bm25f")
      val d = docs(s, dir)
      graft.pipeline.IndexStore.build(s, root, d)
      graft.pipeline.IndexStore.forget(s, root,
        d.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
      val q = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          slice(array_sort(array_distinct(toks)), 1, 4).as("terms"))
      graft.pipeline.IndexStore.query(s, root, q, k = 5)
    }),

    // Incremental APPEND through the persisted BM25 index, under the
    // same hash compare as q123: build over two-thirds of the corpus,
    // then one append carrying both the remaining third (new docs) and
    // CORRECTED re-submissions of already-indexed docs (their text
    // gains two tokens), then the q123 query batch. The oracle scores
    // the EFFECTIVE corpus — originals, except the corrected docs'
    // amended text — so replacement semantics (a re-submitted doc's
    // old postings erased everywhere, df/N/avgdl shifted to the merged
    // state) sit under the score hash, not just a spec: a ghost
    // posting, a double-counted dl or a stale stats summary would all
    // move some bm25 value. The append itself is the one-atomic-commit
    // merge per table (replaced = old ∪ new buckets).
    "q136_bm25_append" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "bm25a")
      val d = docs(s, dir)
      graft.pipeline.IndexStore.build(s, root,
        d.filter(col("doc_id") % 3 =!= 0))
      val fresh = d.filter(col("doc_id") % 3 === 0)
        .select("doc_id", "text")
      val corrected = d
        .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" corrected review")).as("text"))
      graft.pipeline.IndexStore.append(s, root,
        fresh.unionByName(corrected))
      val q = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          slice(array_sort(array_distinct(toks)), 1, 4).as("terms"))
      graft.pipeline.IndexStore.query(s, root, q, k = 5)
    }),

    // Vocabulary-coverage curve (the tokenizer-sizing question: how many
    // vocabulary entries cover 50/90/99% of corpus tokens?): rank the
    // vocab by frequency and take, per threshold, the smallest prefix
    // whose token mass reaches it. Both the coverage cumsum AND the rank
    // are running totals over the SAME frequency order, so they share
    // one [[graft.ops.PrefixSum.runningTotals]] pass — and the input is
    // the VOCAB (one row per distinct token, sublinear in corpus bytes),
    // not the corpus, so even the range shuffle is tiny at 100 TB. The
    // per-threshold cut is a min_by over the qualifying rows — no second
    // sort.
    "q121_vocab_coverage" -> ((s, dir) => {
      val freq = docs(s, dir).select(explode(toks).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cf"))
      val (cum, cached, totalCf) = graft.ops.PrefixSum.runningTotalsSummed(
        freq, Seq(col("cf").desc, col("token")),
        Seq(col("cf") -> "cum_cf", lit(1L) -> "vocab_rank"))
      // the corpus token total rides the prefix pass (exact long) — a
      // literal in the threshold predicate, no second aggregate action
      val totalV = Option(totalCf.head)
        .map(_.asInstanceOf[java.lang.Long].longValue).getOrElse(0L)
      val th = CoverageThresholds
        .map(t => org.apache.spark.sql.Row(t))
      val thDf = graft.tx.AtomicRewrite.literalFrame(s, th,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("threshold",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
      val out = cum.crossJoin(broadcast(thDf))
        .filter(col("cum_cf") / lit(totalV) >= col("threshold"))
        .groupBy("threshold")
        .agg(min("vocab_rank").as("vocab_size"),
          min_by(col("cum_cf"), col("vocab_rank")).as("tokens_covered"),
          round(min_by(col("cum_cf"), col("vocab_rank")) / lit(totalV), 6)
            .as("coverage"))
      materializeAndRelease(out, cached)
    }),

    // The COMPOSED curation-release job end-to-end (the q26 of the LLM
    // side): two incremental batches (a doc_id-prefix split, so
    // first-accepted-wins dedup equals global min-id canon) run
    // clean → DedupStore → release gate → budget cut → TrainingShards
    // publish → IndexStore refresh through [[CurationRunner]] against
    // ONE persistent root, a third call replays batch 2 (same
    // watermark: full no-op), and the output is the published epoch —
    // every shard row joined with the refreshed manifest (the q122
    // shape). The oracle replays the whole composition in SQL, so the
    // dedup contract, the gate cascade, the distributed budget cut, the
    // shard assignment arithmetic AND the incremental batching all sit
    // under one hash compare.
    "q134_curation_release" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curation")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        // ~1% of the corpus: a benchmark the size of an eval set. A
        // benchmark-sized slice keeps the contamination gate selective
        // (at sf0.1 a 10% slice contaminates every gate-surviving doc
        // and the release degenerates to an empty epoch).
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      // batch 1 is ingest-only (the production cadence: publish on
      // release schedule, not per batch); the release is all-time, so
      // batch 2's epoch folds the backlog in — identical final state,
      // one release instead of two
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      // watermark-guarded replay: byte-identical state, no version burns
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      val sp = graft.pipeline.TrainingShards.Paths(
        graft.pipeline.CurationRunner.Paths(root).shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "n_tokens", "quality_score",
          "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      shards.join(manifest, "shard_id")
    }),

    // GDPR erasure through the COMPOSED pipeline (q122/q124's contract
    // at CurationRunner scope): run the q134 release, then forget a
    // deterministic subject set across EVERY layer in one
    // [[graft.pipeline.Gdpr.forgetStores]] call wired with
    // [[graft.pipeline.CurationRunner.storeErasures]] — dedup
    // fingerprints, landed corpus, curated selection, published epoch,
    // BM25 postings + the 1-row stats summary. Output: the surviving
    // epoch joined with its REFRESHED manifest, plus the post-erasure
    // curated count and the summary's n_docs — so the partition-aware
    // deletes, the manifest refresh AND the stats maintenance all sit
    // under one hash compare. Every delete is O(touched partitions):
    // corpus by batch, curated by id-hash bucket, shards by shard,
    // postings by token bucket.
    "q135_curation_forget" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curgdpr")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        // ~1% of the corpus: a benchmark the size of an eval set. A
        // benchmark-sized slice keeps the contamination gate selective
        // (at sf0.1 a 10% slice contaminates every gate-surviving doc
        // and the release degenerates to an empty epoch).
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      // ingest-only batch 1 + publishing batch 2, as in q134
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      graft.pipeline.Gdpr.forgetStoresStaged(s,
        d.filter(col("doc_id") % 9 === 4).select(col("doc_id").as("subject_id")),
        "document",
        graft.pipeline.CurationRunner.storeErasureStages(s, root, conf),
        s"$root/audit", "s", ts(3))
      val p = graft.pipeline.CurationRunner.Paths(root)
      val sp = graft.pipeline.TrainingShards.Paths(p.shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "n_tokens", "quality_score",
          "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      val curatedDocs = graft.pipeline.CurationRunner.readCurated(s, root)
        .agg(count(lit(1)).as("curated_docs"))
      val indexDocs = graft.tx.AtomicRewrite.read(s,
        graft.pipeline.IndexStore.Paths(p.index).stats)
        .select(col("n_docs").as("index_docs"))
      shards.join(manifest, "shard_id")
        .crossJoin(broadcast(curatedDocs))
        .crossJoin(broadcast(indexDocs))
    }),

    // The composed release with the NEAR-dup stage armed (q134 +
    // [[graft.pipeline.NearDupStore]] nested between the fingerprint
    // check and the corpus landing): batch 1 is ingest-only, batch 2
    // publishes — so the oracle must replay the INCREMENTAL dedup
    // semantics (batch-local MinHash/LSH collapse, then batch-2
    // candidates rejected against batch-1 survivors' signatures; exact
    // fingerprints exist only for LANDED rows). The released epoch
    // proves the suppression flowed through gate → budget → shards.
    "q137_curation_neardup" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curnd")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount,
        nearDupThreshold = Some(NearDupThreshold))
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      val sp = graft.pipeline.TrainingShards.Paths(
        graft.pipeline.CurationRunner.Paths(root).shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "n_tokens", "quality_score",
          "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      shards.join(manifest, "shard_id")
    }),

    // Maintenance invariance under the oracle hash: the q134 composition,
    // then [[graft.pipeline.CurationRunner.maintain]] (fold the per-batch
    // partition history of the corpus + dedup store into bounded buckets,
    // vacuum every store), then a crash-shaped replay of the FOLDED batch
    // under a new asOf. The released epoch, manifest, corpus count and
    // fingerprint count must be byte-identical to the never-maintained
    // replay the DuckDB twin computes — maintenance must be invisible to
    // every reader, and a post-fold replay must stay convergent (the
    // folded landing is never re-landed; an all-rejected landing never
    // names a partition as replaced).
    "q138_curation_maintain" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curmnt")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      graft.pipeline.CurationRunner.maintain(s, root, buckets = 4)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(3), "b2", conf)
      val p = graft.pipeline.CurationRunner.Paths(root)
      val sp = graft.pipeline.TrainingShards.Paths(p.shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "n_tokens", "quality_score",
          "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      val corpusDocs = graft.tx.AtomicRewrite.read(s, p.corpus)
        .agg(count(lit(1)).as("corpus_docs"))
      val fpRows = graft.tx.AtomicRewrite.read(s, p.dedupStore)
        .agg(count(lit(1)).as("fp_rows"))
      shards.join(manifest, "shard_id")
        .crossJoin(broadcast(corpusDocs))
        .crossJoin(broadcast(fpRows))
    }),

    // The composed release with MIXTURE enforcement armed (q134 +
    // `Conf.sourceCapShare` — the q116 cut inside the release): each
    // source keeps at most [[SourceCapShare]] of its own kept token
    // mass, best-quality-first, and the global budget prefix then
    // derives from the CAPPED mass. Pins that the release a mixture
    // policy actually ships — per-source caps, then budget, then the
    // shard epoch — composes under one hash.
    "q139_curation_mixture" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curmix")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount,
        sourceCapShare = Some(SourceCapShare))
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      val sp = graft.pipeline.TrainingShards.Paths(
        graft.pipeline.CurationRunner.Paths(root).shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "source", "n_tokens",
          "quality_score", "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      shards.join(manifest, "shard_id")
    }),

    // The composed release with PII REDACTION armed (q134 +
    // `Conf.redactPii` — q77's patterns applied at INGEST, ahead of
    // every derivation). The corpus carries no organic PII, so the
    // query injects q77's deterministic synthetic PII (an id-derived
    // email/phone/IP per doc) into the batch text first: redaction then
    // visibly moves n_chars/tokens/quality/budget AND restores exact
    // dedup — two docs differing only in their PII normalize to the
    // same fingerprint, so the release must not double-count them.
    "q141_curation_redact" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curpii")
      val d = docs(s, dir).withColumn("text", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"),
        lit(" tel +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" host 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".7")))
      val conf = graft.pipeline.CurationRunner.Conf(
        benchmark = Some(docs(s, dir).filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount,
        redactPii = true)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      val sp = graft.pipeline.TrainingShards.Paths(
        graft.pipeline.CurationRunner.Paths(root).shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "n_tokens", "quality_score",
          "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      shards.join(manifest, "shard_id")
    }),

    // The composed release with CURRICULUM order armed (q134 +
    // `Conf.curriculum` — the q117 interleave inside the release): the
    // budget cut stays quality-greedy, but the shipped train_pos
    // round-robins sources best-first and the shard epoch follows THAT
    // order — so shard_id no longer tracks the budget-pass cum_tokens,
    // and any drift between the two orders breaks the hash.
    "q140_curation_curriculum" -> ((s, dir) => {
      val root = tmpStoreRoot(s, dir, "curord")
      val d = docs(s, dir)
      val conf = graft.pipeline.CurationRunner.Conf(
        benchmark = Some(d.filter(col("doc_id") % 97 === 0)
          .select("doc_id", "text")),
        budgetShare = TokenBudgetShare, nShards = ShardCount,
        curriculum = true)
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$day%d 00:00:00")
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") < 200), ts(1), "b1", conf, publish = false)
      graft.pipeline.CurationRunner.runBatch(s, root,
        d.filter(col("doc_id") >= 200), ts(2), "b2", conf)
      val sp = graft.pipeline.TrainingShards.Paths(
        graft.pipeline.CurationRunner.Paths(root).shards)
      val shards = graft.tx.AtomicRewrite.read(s, sp.shards)
        .select("shard_id", "doc_id", "source", "n_tokens",
          "quality_score", "train_pos", "cum_tokens")
      val manifest = graft.tx.AtomicRewrite.read(s, sp.manifest)
        .select(col("shard_id"), col("n_docs").as("shard_docs"),
          col("n_tokens").as("shard_tokens"))
      shards.join(manifest, "shard_id")
    }))

  /** Coverage thresholds reported by the q121 vocab-sizing curve. */
  val CoverageThresholds = Seq(0.5, 0.9, 0.99)

  /** Shards built by the q120 manifest oracle. */
  val ShardCount = 8

  /** Docs per length-bucket batch shard (q118). */
  val BatchDocs = 8

  /** Corpus-token share kept by the q115 budget cut. */
  val TokenBudgetShare = 0.4

  /** Estimated-Jaccard cut for the q137 composed near-dup stage (the
    * q36 threshold; with S=12 signature rows, ≥ 6 equal slots). */
  val NearDupThreshold = 0.5

  /** Per-source token share kept by the q116 cap cut. */
  val SourceCapShare = 0.5

  /** Rounds of BPE training unrolled in q110 (and its oracle). */
  val BpeRounds = 3

  /** Target domain whose unigram LM drives DSIR selection (q111). */
  val DsirTarget = "src0"

  /** Docs kept by the DSIR top-K cut (q111). */
  val DsirK = 100

  /** One BPE round over the double-space-encoded corpus string: count
    * adjacent token pairs, pick the argmax (freq DESC, pair — exact total
    * order), and greedily merge its occurrences left-to-right. The
    * double-space encoding (" a  b  c ") lets plain non-regex `replace`
    * be boundary-safe: a pair match " a  b " always consumes one space of
    * each neighbor gap and reinserts it, so the invariant survives every
    * merge with no lookaround (which RE2 lacks) and no regex at all.
    * The argmax is NOT collected — it stays a 1-row broadcast in the
    * plan, so a 100 TB round is one keyed agg + one map. */
  private def bpeRound(cur: DataFrame): DataFrame =
    cur.crossJoin(broadcast(graft.ops.Bpe.bestPair(cur)))
      .withColumn("s", graft.ops.Bpe.applyMerge(col("s"), col("m")))
      .drop("m")

  /** Span width for exact-substring dedup (q103). */
  val SpanK = 8

  /** BM25 parameters and the fixed benchmark query (q105). */
  val BmQuery = Seq("table", "scan", "fast")
  /** BM25 parameters — single source of truth is the persisted store;
    * the inline q105 and the store's scoring must never diverge. */
  val BmK1: Double = graft.pipeline.IndexStore.K1
  val BmB: Double = graft.pipeline.IndexStore.B

  /** KMV sketch size for source-overlap estimation (q106): resolution is
    * 1/k, so 64 resolves the corpus's 0.01-0.08 trigram-Jaccard band. */
  val KmvK = 64

  // ---- oracles ----------------------------------------------------------

  private val ToksSql = """string_split_regex(lower(trim(text)), '\s+')"""

  /** SQL twin of [[qualityScore]] over a CTE exposing n_tokens/stop_hits. */
  private val QualityScoreSql =
    "round(least(n_tokens / 100.0, 1.0) * 0.5 + least(stop_hits / n_tokens * 5, 1.0) * 0.5, 6)"
  private val SubwordsSql =
    """regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')"""
  private val ShinglesSql =
    "list_transform(range(1, greatest(len(toks)-2,1)+1), i -> array_to_string(toks[i:i+2], ' '))"
  private def inList(set: Seq[String]) = set.map(w => s"'$w'").mkString(", ")

  private def minhashSql(i: Int) =
    s"list_min(list_transform(sg, x -> ('0x' || substr(sha256(x), ${i * 5 + 1}, 5))::BIGINT))"

  private def simhashBitSql(b: Int): String = {
    val d = b / 4 + 1
    val p = math.pow(2, b % 4).toInt
    s"(CAST(floor((position(substr(sha256(t), $d, 1) IN '0123456789abcdef') - 1) / $p) AS INT) % 2)"
  }

  /** Shared release-gate CTE chain (the q114 cascade replay, reused by
    * q132's composed budget cut): every curation signal — capped-shingle
    * contamination, canonical-hash dups, length/stopword quality, the
    * q53 split — ending in `v(doc_id, reason)`. Claims CTE names
    * t, shg, keep, shf, bench, hits, contam, h, canon, dup, q, spl, v. */
  private lazy val FilterCascadeCteSql: String =
    s"""t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |shg AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
       |keep AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 100),
       |shf AS (SELECT shg.* FROM shg JOIN keep USING (sh)),
       |bench AS (SELECT sh, doc_id AS bench_doc_id FROM shf WHERE doc_id % 10 = 0),
       |hits AS (SELECT s.doc_id, s.sh
       |         FROM shf s JOIN bench b USING (sh) WHERE s.doc_id % 10 <> 0),
       |contam AS (SELECT doc_id, (count(DISTINCT sh) >= 3) AS contaminated
       |           FROM hits GROUP BY 1),
       |h AS (SELECT doc_id,
       |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
       |      FROM documents),
       |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
       |dup AS (SELECT doc_id, (doc_id <> canon_id) AS exact_dup
       |        FROM h JOIN canon USING (hh)),
       |q AS (SELECT d.doc_id, d.n_chars, len(t.toks) AS n_tokens,
       |        len(list_filter(t.toks,
       |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
       |      FROM documents d JOIN t ON d.doc_id = t.doc_id),
       |spl AS (SELECT doc_id,
       |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
       |            AS bucket
       |        FROM documents),
       |v AS (SELECT q.doc_id,
       |        CASE WHEN dup.exact_dup THEN 'exact_duplicate'
       |             WHEN q.n_chars < 100 THEN 'too_short'
       |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
       |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
       |             WHEN coalesce(c.contaminated, false) THEN 'contaminated'
       |             ELSE 'kept' END AS reason
       |      FROM q JOIN dup USING (doc_id)
       |             JOIN spl USING (doc_id)
       |             LEFT JOIN contam c USING (doc_id))""".stripMargin

  /** Shared BPE-training CTE chain (the q110 trainer replay, reused by
    * q125's store-backed fertility rollup): d0 is the double-space-
    * encoded corpus; each round is one CTE triple (tokens → argmax pair
    * → merged corpus), generated from the same [[BpeRounds]] constant
    * the Spark loop and [[graft.pipeline.TokenizerStore.train]] use.
    * Ends at `d$BpeRounds(doc_id, s, n0)`. */
  private lazy val BpeChainSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val prev = s"d${r - 1}"
      s"""t$r AS (SELECT doc_id, string_split(trim(s), '  ') AS t FROM $prev),
         |p$r AS (SELECT pair, count(*) AS freq FROM
         |       (SELECT unnest(list_transform(range(1, greatest(len(t)-1,1)+1),
         |         i -> array_to_string(t[i:i+1], ' '))) AS pair FROM t$r)
         |       WHERE contains(pair, ' ') GROUP BY 1),
         |m$r AS (SELECT pair FROM
         |       (SELECT pair, freq FROM p$r UNION ALL SELECT '', -1)
         |       ORDER BY freq DESC, pair LIMIT 1),
         |d$r AS (SELECT doc_id,
         |  replace(s, ' ' || replace(m$r.pair, ' ', '  ') || ' ',
         |             ' ' || replace(m$r.pair, ' ', '') || ' ') AS s, n0
         |  FROM $prev, m$r)""".stripMargin
    }.mkString(",\n")
    s"""d0 AS (SELECT doc_id,
       |  ' ' || array_to_string($SubwordsSql, '  ') || ' ' AS s,
       |  len($SubwordsSql) AS n0
       |  FROM documents),
       |$rounds""".stripMargin
  }

  /** Shared CTE chain: trigram-Jaccard pair graph → recursive-walk
    * connected components (`cc(doc_id, cluster_id)`) — the oracle twin of
    * the q48 delta iteration, reused by q71's canonical selection. */
  private lazy val CcCteSql =
    s"""WITH RECURSIVE t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |shg AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
       |keep AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 100),
       |shf AS (SELECT shg.* FROM shg JOIN keep USING (sh)),
       |sz AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY 1),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |      FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pairs AS (SELECT doc_a, doc_b
       |          FROM p JOIN sz sa ON p.doc_a = sa.doc_id JOIN sz sb ON p.doc_b = sb.doc_id
       |          WHERE round(common / (sa.n + sb.n - common), 6) >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |walk(doc, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.src, w.lab FROM walk w JOIN edges e ON e.dst = w.doc),
       |cc AS (SELECT doc AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY 1)""".stripMargin

  /** Shared q123/q124 oracle: full build→score replay of the persisted
    * BM25 index over the docs satisfying `kept` (q124 erases
    * doc_id % 7 = 3; the query batch always derives from the FULL
    * corpus — an erased subject can still ASK, never be retrieved).
    * Mirrors [[graft.pipeline.IndexStore.query]] exactly: df over the
    * surviving postings, N/avgdl over surviving docs, bit-identical
    * per-term doubles summed through DECIMAL(38,6), round 6, rank ties
    * on doc_id. */
  private def bm25StoreOracle(kept: String): String = {
    val k1 = graft.pipeline.IndexStore.K1
    val b = graft.pipeline.IndexStore.B
    s"""WITH t0 AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |t AS (SELECT * FROM t0 WHERE $kept),
       |q AS (SELECT doc_id AS query_id,
       |        unnest(list_sort(list_distinct(toks))[1:4]) AS token
       |      FROM t0 WHERE doc_id % 50 = 0),
       |post AS (SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS tf
       |         FROM (SELECT doc_id, unnest(toks) AS token FROM t)
       |         GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |        avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM t),
       |dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
       |c AS (SELECT q.query_id, p.doc_id,
       |        CAST(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * ($k1 + 1.0)) /
       |          (tf + $k1 * (1.0 - $b + $b * dl.dl / avgdl))
       |          AS DECIMAL(38,6)) AS contrib
       |      FROM q JOIN post p USING (token) JOIN dfq USING (token)
       |           JOIN dl ON p.doc_id = dl.doc_id, s),
       |g AS (SELECT query_id, doc_id,
       |        round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
       |      FROM c GROUP BY 1, 2),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY bm25 DESC, doc_id) AS INT) AS rank FROM g)
       |SELECT query_id, doc_id, bm25, rank FROM r WHERE rank <= 5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q103_span_dedup" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |sp AS (SELECT doc_id, unnest(list_transform(
         |  range(1, greatest(len(toks)-${SpanK - 1},1)+1),
         |  i -> array_to_string(toks[i:i+${SpanK - 1}], ' '))) AS span FROM t),
         |dup AS (SELECT span FROM sp GROUP BY span
         |        HAVING count(DISTINCT doc_id) >= 2)
         |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_spans,
         |  round(sum(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END)
         |    / count(*), 6) AS dup_fraction
         |FROM sp LEFT JOIN dup d ON sp.span = d.span
         |GROUP BY 1""".stripMargin,
    "q104_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents)
         |SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         |  CAST(count(*) AS BIGINT) AS coll_freq,
         |  array_to_string(list_sort(list(DISTINCT doc_id))[1:8], ',')
         |    AS postings_head
         |FROM tok GROUP BY 1""".stripMargin,
    "q105_bm25" -> {
      val tfCols = BmQuery.zipWithIndex.map { case (t, i) =>
        s"  CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(",\n")
      val dfCols = BmQuery.indices.map(i =>
        s"  sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(",\n")
      val terms = BmQuery.indices.map(i =>
        s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * ($BmK1 + 1.0)) / " +
          s"(tf$i + $BmK1 * (1.0 - $BmB + $BmB * dl / avgdl))").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |d AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         |$tfCols
         |FROM t),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
         |$dfCols
         |FROM d),
         |r AS (SELECT doc_id, round($terms, 6) AS bm25 FROM d, s)
         |SELECT doc_id, bm25 FROM r WHERE bm25 > 0""".stripMargin
    },
    "q106_kmv_source_overlap" ->
      s"""WITH tt AS (SELECT source, $ToksSql AS toks FROM documents),
         |st AS (SELECT DISTINCT source, t FROM
         |  (SELECT source, unnest($ShinglesSql) AS t FROM tt)),
         |sk AS (SELECT source, list_sort(list(DISTINCT sha256(t)))[1:$KmvK] AS sk,
         |        CAST(count(*) AS BIGINT) AS nt FROM st GROUP BY 1),
         |ex AS (SELECT a.source AS source_a, b.source AS source_b,
         |        CAST(count(*) AS BIGINT) AS common
         |       FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
         |       GROUP BY 1, 2),
         |j AS (SELECT ex.source_a, ex.source_b, ex.common,
         |        sa.sk AS ska, sa.nt AS na, sb.sk AS skb, sb.nt AS nb,
         |        list_sort(list_distinct(flatten([sa.sk, sb.sk])))[1:$KmvK] AS u
         |      FROM ex JOIN sk sa ON ex.source_a = sa.source
         |           JOIN sk sb ON ex.source_b = sb.source)
         |SELECT source_a, source_b,
         |  round(common / (na + nb - common), 6) AS exact_jaccard,
         |  round(len(list_filter(u, h -> list_contains(ska, h)
         |      AND list_contains(skb, h))) / CAST(len(u) AS DOUBLE), 6)
         |    AS kmv_jaccard
         |FROM j""".stripMargin,
    "q110_bpe_encode" ->
      s"""WITH $BpeChainSql
         |SELECT doc_id, CAST(n0 AS BIGINT) AS n_subwords,
         |  CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_encoded,
         |  round(len(string_split(trim(s), '  ')) / n0, 6) AS compression
         |FROM d$BpeRounds""".stripMargin,
    "q125_fertility_by_source" ->
      s"""WITH $BpeChainSql,
         |e AS (SELECT doc_id, CAST(n0 AS BIGINT) AS n_subwords,
         |        CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_encoded
         |      FROM d$BpeRounds),
         |w AS (SELECT doc_id, source,
         |        CAST(len($ToksSql) AS BIGINT) AS n_words FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
         |  CAST(sum(n_encoded) AS BIGINT) AS n_encoded,
         |  round(sum(n_encoded) / sum(n_words), 6) AS fertility,
         |  round(sum(n_encoded) / sum(n_subwords), 6) AS compression
         |FROM e JOIN w USING (doc_id) GROUP BY 1""".stripMargin,
    "q114_filter_cascade" ->
      s"""WITH $FilterCascadeCteSql
         |SELECT doc_id, reason, (reason = 'kept') AS keep FROM v""".stripMargin,
    "q133_quality_bands" ->
      s"""WITH $FilterCascadeCteSql,
         |q3 AS (SELECT doc_id, $QualityScoreSql AS quality_score FROM q),
         |j AS (SELECT q3.doc_id, q3.quality_score, v.reason
         |      FROM q3 JOIN v USING (doc_id))
         |SELECT CAST(floor(quality_score * 10) AS INT) AS band,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN reason = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  round(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) / count(*), 6)
         |    AS keep_rate
         |FROM j GROUP BY 1""".stripMargin,
    "q132_curated_budget" ->
      s"""WITH $FilterCascadeCteSql,
         |kept AS (SELECT doc_id FROM v WHERE reason = 'kept'),
         |b2 AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        CAST(q.stop_hits AS BIGINT) AS stop_hits
         |      FROM q JOIN kept USING (doc_id)),
         |q2 AS (SELECT doc_id, n_tokens,
         |        $QualityScoreSql AS quality_score
         |      FROM b2),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM q2),
         |c2 AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens
         |      FROM q2)
         |SELECT doc_id, n_tokens, quality_score, cum_tokens
         |FROM c2, bud WHERE cum_tokens <= budget""".stripMargin,
    "q115_token_budget" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS BIGINT) AS stop_hits
         |      FROM t),
         |q AS (SELECT doc_id, n_tokens,
         |        $QualityScoreSql AS quality_score
         |      FROM b),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT) AS budget
         |        FROM q),
         |c AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens
         |      FROM q)
         |SELECT doc_id, n_tokens, quality_score, cum_tokens
         |FROM c, bud WHERE cum_tokens <= budget""".stripMargin,
    "q116_source_caps" ->
      s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
         |b AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS BIGINT) AS stop_hits
         |      FROM t),
         |q AS (SELECT doc_id, source, n_tokens,
         |        $QualityScoreSql AS quality_score
         |      FROM b),
         |caps AS (SELECT source,
         |           CAST(floor(sum(n_tokens) * $SourceCapShare) AS BIGINT) AS cap
         |         FROM q GROUP BY 1),
         |c AS (SELECT doc_id, source, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY quality_score DESC, doc_id) AS BIGINT) AS cum_tokens
         |      FROM q)
         |SELECT doc_id, source, n_tokens, quality_score, cum_tokens
         |FROM c JOIN caps USING (source) WHERE cum_tokens <= cap""".stripMargin,
    "q121_vocab_coverage" ->
      s"""WITH f AS (SELECT token, count(*) AS cf FROM
         |       (SELECT unnest($ToksSql) AS token FROM documents) GROUP BY 1),
         |c AS (SELECT cf,
         |        sum(cf) OVER (ORDER BY cf DESC, token) AS cum_cf,
         |        row_number() OVER (ORDER BY cf DESC, token) AS vocab_rank
         |      FROM f),
         |t AS (SELECT sum(cf) AS total FROM f),
         |th(threshold) AS (VALUES (0.5), (0.9), (0.99)),
         |q AS (SELECT threshold, vocab_rank, cum_cf, total FROM c, t, th
         |      WHERE cum_cf / total >= threshold)
         |SELECT CAST(threshold AS DOUBLE) AS threshold,
         | CAST(min(vocab_rank) AS BIGINT) AS vocab_size,
         | CAST(min_by(cum_cf, vocab_rank) AS BIGINT) AS tokens_covered,
         | round(min_by(cum_cf, vocab_rank) / CAST(min(total) AS DOUBLE), 6)
         |   AS coverage
         |FROM q GROUP BY 1""".stripMargin,
    "q119_lm_store_score" ->
      s"""WITH ref AS (SELECT unnest($ToksSql) AS token FROM documents
         |             WHERE source = '$DsirTarget'),
         |lm AS (SELECT token, count(*) AS cf FROM ref GROUP BY 1),
         |scal AS (SELECT count(*) AS v, sum(cf) AS n_total FROM lm),
         |cand AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents
         |         WHERE source <> '$DsirTarget'),
         |j AS (SELECT c.doc_id, lm.cf FROM cand c LEFT JOIN lm USING (token)),
         |g AS (SELECT doc_id, count(*) AS n_tokens,
         |        CAST(sum(CASE WHEN cf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |          AS oov_tokens,
         |        round(avg(-ln((coalesce(cf, 0) + 0.5) / (n_total + 0.5 * v))), 6)
         |          AS avg_neg_logp
         |      FROM j, scal GROUP BY doc_id)
         |SELECT doc_id, n_tokens, oov_tokens, avg_neg_logp,
         | round(exp(avg_neg_logp), 6) AS ppl_proxy FROM g""".stripMargin,
    "q120_shard_manifest" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |             doc_id + 1 AS train_pos FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER (ORDER BY train_pos) AS cum FROM d),
         |t AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0) AS BIGINT), 1)
         |        AS target FROM d),
         |a AS (SELECT doc_id, n_tokens, train_pos,
         |        CAST(greatest(least(CAST(floor((cum - 1) / target) AS BIGINT),
         |          ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM c, t)
         |SELECT shard_id, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         | min(train_pos) AS order_min, max(train_pos) AS order_max,
         | 'train_pos' AS order_col
         |FROM a GROUP BY 1""".stripMargin,
    "q126_mixture_resample" ->
      s"""WITH d AS (SELECT doc_id, source,
         |        CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |        sha256('mix|' || CAST(doc_id AS VARCHAR)) AS h
         |      FROM documents),
         |t AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare /
         |        count(DISTINCT source)) AS BIGINT) AS target FROM d),
         |c AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
         |      FROM d)
         |SELECT doc_id, source, n_tokens, cum_tokens
         |FROM c, t WHERE cum_tokens <= target""".stripMargin,
    "q130_split_vocab_overlap" ->
      s"""WITH spl AS (SELECT doc_id,
         |        ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |          AS bucket
         |      FROM documents),
         |sp AS (SELECT doc_id,
         |        CASE WHEN bucket < 80 THEN 'train'
         |             WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |      FROM spl),
         |tok AS (SELECT t.doc_id, sp.split, unnest($ToksSql) AS token
         |        FROM documents t JOIN sp ON t.doc_id = sp.doc_id),
         |vocab AS (SELECT split, token, CAST(count(*) AS BIGINT) AS cf
         |          FROM tok GROUP BY 1, 2),
         |te AS (SELECT token, cf AS test_cf FROM vocab WHERE split = 'test'),
         |tr AS (SELECT token, 1 AS in_train FROM vocab WHERE split = 'train')
         |SELECT count(*) AS test_vocab,
         |  CAST(sum(in_train) AS BIGINT) AS covered_vocab,
         |  round(sum(in_train) / count(*), 6) AS vocab_coverage,
         |  CAST(sum(test_cf) AS BIGINT) AS test_tokens,
         |  CAST(sum(CASE WHEN in_train IS NOT NULL THEN test_cf ELSE 0 END)
         |    AS BIGINT) AS covered_tokens,
         |  round(sum(CASE WHEN in_train IS NOT NULL THEN test_cf ELSE 0 END)
         |    / sum(test_cf), 6) AS token_coverage
         |FROM te LEFT JOIN tr USING (token)""".stripMargin,
    "q129_length_quantiles" ->
      s"""WITH d AS (SELECT source, CAST(len($ToksSql) AS DOUBLE) AS n_tokens
         |           FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
         |  round(quantile_cont(n_tokens, 0.9), 6) AS p90,
         |  round(quantile_cont(n_tokens, 0.99), 6) AS p99,
         |  CAST(max(n_tokens) AS BIGINT) AS max_tokens
         |FROM d GROUP BY 1""".stripMargin,
    "q127_dedup_rate_by_source" ->
      """WITH h AS (SELECT doc_id, source,
        |        sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS hh
        |      FROM documents),
        |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id <> canon_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  round(sum(CASE WHEN doc_id <> canon_id THEN 1 ELSE 0 END)
        |    / count(*), 6) AS dup_rate
        |FROM h JOIN canon USING (hh) GROUP BY 1""".stripMargin,
    "q123_bm25_store" -> bm25StoreOracle(kept = "TRUE"),
    "q124_bm25_forget" -> bm25StoreOracle(kept = "doc_id % 7 <> 3"),
    // the composed root's index serves exactly the exact-canon landed
    // set: the kept predicate replays the runner's clean + fingerprint
    // canon (min id per normalized-text hash over cleaned docs)
    "q142_curation_serve" -> bm25StoreOracle(kept =
      """doc_id IN (SELECT min(doc_id) FROM (
        |  SELECT doc_id,
        |    sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS hh
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND trim(text) <> '') hx
        |  GROUP BY hh)""".stripMargin),
    "q136_bm25_append" -> {
      val k1 = graft.pipeline.IndexStore.K1
      val b = graft.pipeline.IndexStore.B
      s"""WITH eff AS (SELECT doc_id,
         |        CASE WHEN doc_id % 3 <> 0 AND doc_id % 5 = 0
         |             THEN text || ' corrected review' ELSE text END AS text
         |      FROM documents),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM eff),
         |q AS (SELECT doc_id AS query_id,
         |        unnest(list_sort(list_distinct($ToksSql))[1:4]) AS token
         |      FROM documents WHERE doc_id % 50 = 0),
         |post AS (SELECT token, doc_id, CAST(count(*) AS DOUBLE) AS tf
         |         FROM (SELECT doc_id, unnest(toks) AS token FROM t)
         |         GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |        avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM t),
         |dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM post GROUP BY 1),
         |c AS (SELECT q.query_id, p.doc_id,
         |        CAST(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * ($k1 + 1.0)) /
         |          (tf + $k1 * (1.0 - $b + $b * dl.dl / avgdl))
         |          AS DECIMAL(38,6)) AS contrib
         |      FROM q JOIN post p USING (token) JOIN dfq USING (token)
         |           JOIN dl ON p.doc_id = dl.doc_id, s),
         |g AS (SELECT query_id, doc_id,
         |        round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
         |      FROM c GROUP BY 1, 2),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY bm25 DESC, doc_id) AS INT) AS rank FROM g)
         |SELECT query_id, doc_id, bm25, rank FROM r WHERE rank <= 5""".stripMargin
    },
    "q122_shards_forget" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |             doc_id + 1 AS train_pos FROM documents),
         |c AS (SELECT *, sum(n_tokens) OVER (ORDER BY train_pos) AS cum FROM d),
         |t AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0) AS BIGINT), 1)
         |        AS target FROM d),
         |a AS (SELECT doc_id, n_tokens, train_pos,
         |        CAST(greatest(least(CAST(floor((cum - 1) / target) AS BIGINT),
         |          ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM c, t),
         |k AS (SELECT * FROM a WHERE doc_id % 7 <> 3),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM k GROUP BY 1)
         |SELECT k.shard_id, doc_id, n_tokens, train_pos, shard_docs, shard_tokens
         |FROM k JOIN m USING (shard_id)""".stripMargin,
    // full SQL replay of the CurationRunner composition: clean -> min-id
    // canonical dedup (batches are a doc_id-prefix split, so
    // first-accepted == global min id) -> gate cascade (contamination vs
    // the %10 benchmark with its bench-side df<=100 cap) -> kept-mass
    // budget cut with train_pos -> q120 shard arithmetic -> manifest
    "q134_curation_release" ->
      s"""WITH cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT doc_id, n_tokens, quality_score FROM v
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |c2 AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1)
         |SELECT a.shard_id, doc_id, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens
         |FROM a JOIN m USING (shard_id)""".stripMargin,
    "q141_curation_redact" ->
      s"""WITH raw AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR)
         |    || '@example.com'
         |    || ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |    || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
         |  FROM documents WHERE doc_id IS NOT NULL),
         |cl AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
         |    '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g')
         |    AS text
         |  FROM raw WHERE text IS NOT NULL AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT doc_id, n_tokens, quality_score FROM v
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |c2 AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1)
         |SELECT a.shard_id, doc_id, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens
         |FROM a JOIN m USING (shard_id)""".stripMargin,
    "q140_curation_curriculum" ->
      s"""WITH cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT v.doc_id, d.source, n_tokens, quality_score
         |         FROM v JOIN documents d ON v.doc_id = d.doc_id
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |c2 AS (SELECT doc_id, source, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, source, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |srcs AS (SELECT DISTINCT source FROM sel),
         |si AS (SELECT source,
         |         CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
         |       FROM srcs),
         |nsq AS (SELECT CAST(count(*) AS BIGINT) AS nsrc FROM srcs),
         |cur AS (SELECT sel.doc_id, sel.source, n_tokens, quality_score,
         |          cum_tokens,
         |          (CAST(row_number() OVER (PARTITION BY sel.source
         |             ORDER BY quality_score DESC, doc_id) AS BIGINT) - 1)
         |            * nsrc + sidx AS train_pos
         |        FROM sel JOIN si ON sel.source = si.source, nsq),
         |sc2 AS (SELECT cur.*,
         |          CAST(sum(n_tokens) OVER (ORDER BY train_pos)
         |            AS BIGINT) AS scum2
         |        FROM cur),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM cur),
         |a AS (SELECT sc2.*,
         |        CAST(greatest(least(CAST(floor((scum2 - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sc2, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1)
         |SELECT a.shard_id, doc_id, source, n_tokens, quality_score,
         |  train_pos, cum_tokens, shard_docs, shard_tokens
         |FROM a JOIN m USING (shard_id)""".stripMargin,
    "q139_curation_mixture" ->
      s"""WITH cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT v.doc_id, d.source, n_tokens, quality_score
         |         FROM v JOIN documents d ON v.doc_id = d.doc_id
         |         WHERE reason = 'kept'),
         |scaps AS (SELECT source, CAST(floor(sum(n_tokens) * $SourceCapShare)
         |            AS BIGINT) AS cap
         |          FROM kept GROUP BY 1),
         |scap AS (SELECT kept.*, sum(n_tokens) OVER (PARTITION BY source
         |           ORDER BY quality_score DESC, doc_id) AS scum
         |         FROM kept),
         |kept2 AS (SELECT doc_id, source, n_tokens, quality_score
         |          FROM scap JOIN scaps USING (source) WHERE scum <= cap),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept2),
         |c2 AS (SELECT doc_id, source, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept2),
         |sel AS (SELECT doc_id, source, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1)
         |SELECT a.shard_id, doc_id, source, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens
         |FROM a JOIN m USING (shard_id)""".stripMargin,
    "q138_curation_maintain" ->
      s"""WITH cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT doc_id, n_tokens, quality_score FROM v
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |c2 AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1),
         |cdocs AS (SELECT count(*) AS corpus_docs FROM acc),
         |fps AS (SELECT count(*) AS fp_rows FROM acc)
         |SELECT a.shard_id, doc_id, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens, corpus_docs, fp_rows
         |FROM a JOIN m USING (shard_id), cdocs, fps""".stripMargin,
    "q135_curation_forget" ->
      s"""WITH cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |canon AS (SELECT hh, min(doc_id) AS canon_id FROM h GROUP BY 1),
         |acc AS (SELECT cl.* FROM cl JOIN h USING (doc_id)
         |        JOIN canon ON h.hh = canon.hh AND cl.doc_id = canon.canon_id),
         |t AS (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(t.toks) AS n_tokens,
         |        len(list_filter(t.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN t USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT doc_id, n_tokens, quality_score FROM v
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |c2 AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM c2, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |surv AS (SELECT * FROM a WHERE doc_id % 9 <> 4),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM surv GROUP BY 1),
         |cd AS (SELECT count(*) AS curated_docs FROM sel
         |       WHERE doc_id % 9 <> 4),
         |idx AS (SELECT count(*) AS index_docs FROM acc
         |        WHERE doc_id % 9 <> 4)
         |SELECT surv.shard_id, doc_id, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens, curated_docs, index_docs
         |FROM surv JOIN m USING (shard_id), cd, idx""".stripMargin,
    "q137_curation_neardup" -> {
      val sigCols = (0 until S).map(i => s"  ${minhashSql(i)} AS m$i").mkString(",\n")
      val bandSelects = (0 until Bands).map(b =>
        s"SELECT doc_id, $b AS band_idx, " +
          s"sha256(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR)) AS bh FROM sig")
        .mkString("\n UNION ALL ")
      def est(a: String, b: String) = (0 until S).map(i =>
        s"(CASE WHEN $a.m$i = $b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
      // Incremental replay of the two-batch near-dup composition:
      // e1/e2 = per-batch exact survivors (batch-2 fingerprints exist
      // only for LANDED batch-1 rows — f1 over s1, not over e1); w1/w2
      // = per-batch LSH→est-Jaccard connected-component collapse; x2 =
      // batch-2 reps rejected against batch-1 survivors' signatures.
      s"""WITH RECURSIVE
         |cl AS MATERIALIZED (SELECT doc_id, text FROM documents
         |       WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |         AND trim(text) <> ''),
         |h AS MATERIALIZED (SELECT doc_id,
         |        sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh
         |      FROM cl),
         |e1 AS MATERIALIZED (SELECT h.doc_id FROM h
         |       JOIN (SELECT hh, min(doc_id) AS cid FROM h
         |             WHERE doc_id < 200 GROUP BY 1) c1
         |         ON h.hh = c1.hh AND h.doc_id = c1.cid),
         |t AS MATERIALIZED (SELECT doc_id, $ToksSql AS toks FROM cl),
         |sgt AS MATERIALIZED (SELECT doc_id, list_distinct($ShinglesSql) AS sg FROM t),
         |sig AS MATERIALIZED (SELECT doc_id,
         |$sigCols
         |FROM sgt),
         |band AS MATERIALIZED ($bandSelects),
         |band1 AS MATERIALIZED (SELECT band.* FROM band JOIN e1 USING (doc_id)),
         |p1 AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM
         |        (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM band1 a JOIN band1 b
         |           ON a.band_idx = b.band_idx AND a.bh = b.bh
         |          AND a.doc_id < b.doc_id) cd1
         |       JOIN sig sa ON doc_a = sa.doc_id
         |       JOIN sig sb ON doc_b = sb.doc_id
         |       WHERE (${est("sa", "sb")}) / ${S.toDouble} >= $NearDupThreshold),
         |ed1 AS MATERIALIZED (SELECT doc_a AS es, doc_b AS ed FROM p1
         |        UNION ALL SELECT doc_b, doc_a FROM p1),
         |w1(doc, lab) AS (SELECT doc_id, doc_id FROM e1
         |  UNION
         |  SELECT ed1.ed, w1.lab FROM w1 JOIN ed1 ON ed1.es = w1.doc),
         |s1 AS MATERIALIZED (SELECT doc AS doc_id
         |       FROM (SELECT doc, min(lab) AS lab FROM w1 GROUP BY 1)
         |       WHERE lab = doc),
         |f1 AS MATERIALIZED (SELECT DISTINCT hh FROM h JOIN s1 USING (doc_id)),
         |h2 AS MATERIALIZED (SELECT h.* FROM h WHERE doc_id >= 200
         |         AND hh NOT IN (SELECT hh FROM f1)),
         |e2 AS MATERIALIZED (SELECT h2.doc_id FROM h2
         |       JOIN (SELECT hh, min(doc_id) AS cid FROM h2 GROUP BY 1) c2x
         |         ON h2.hh = c2x.hh AND h2.doc_id = c2x.cid),
         |band2 AS MATERIALIZED (SELECT band.* FROM band JOIN e2 USING (doc_id)),
         |p2 AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM
         |        (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM band2 a JOIN band2 b
         |           ON a.band_idx = b.band_idx AND a.bh = b.bh
         |          AND a.doc_id < b.doc_id) cd2
         |       JOIN sig sa ON doc_a = sa.doc_id
         |       JOIN sig sb ON doc_b = sb.doc_id
         |       WHERE (${est("sa", "sb")}) / ${S.toDouble} >= $NearDupThreshold),
         |ed2 AS MATERIALIZED (SELECT doc_a AS es, doc_b AS ed FROM p2
         |        UNION ALL SELECT doc_b, doc_a FROM p2),
         |w2(doc, lab) AS (SELECT doc_id, doc_id FROM e2
         |  UNION
         |  SELECT ed2.ed, w2.lab FROM w2 JOIN ed2 ON ed2.es = w2.doc),
         |r2 AS MATERIALIZED (SELECT doc AS doc_id
         |       FROM (SELECT doc, min(lab) AS lab FROM w2 GROUP BY 1)
         |       WHERE lab = doc),
         |bandr AS MATERIALIZED (SELECT band.* FROM band JOIN r2 USING (doc_id)),
         |bands1 AS MATERIALIZED (SELECT band.* FROM band JOIN s1 USING (doc_id)),
         |x2 AS MATERIALIZED (SELECT DISTINCT cdx.doc_a AS doc_id FROM
         |        (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bandr a JOIN bands1 b
         |           ON a.band_idx = b.band_idx AND a.bh = b.bh) cdx
         |       JOIN sig sa ON cdx.doc_a = sa.doc_id
         |       JOIN sig sb ON cdx.doc_b = sb.doc_id
         |       WHERE (${est("sa", "sb")}) / ${S.toDouble} >= $NearDupThreshold),
         |nd AS MATERIALIZED (SELECT doc_id FROM s1
         |       UNION ALL
         |       SELECT doc_id FROM r2
         |       WHERE doc_id NOT IN (SELECT doc_id FROM x2)),
         |acc AS MATERIALIZED (SELECT cl.* FROM cl JOIN nd USING (doc_id)),
         |ta AS MATERIALIZED (SELECT doc_id, $ToksSql AS toks FROM acc),
         |bt AS (SELECT doc_id, $ToksSql AS toks FROM documents
         |       WHERE doc_id % 97 = 0),
         |bsh AS (SELECT doc_id AS bid, unnest(list_distinct($ShinglesSql)) AS sh
         |        FROM bt),
         |bs AS MATERIALIZED (SELECT sh FROM bsh GROUP BY sh
         |       HAVING count(DISTINCT bid) <= 100),
         |ash AS MATERIALIZED (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM ta),
         |contam AS (SELECT ash.doc_id FROM ash JOIN bs USING (sh)
         |           GROUP BY 1 HAVING count(DISTINCT sh) >= 3),
         |q AS (SELECT acc.doc_id, length(acc.text) AS nchars,
         |        len(ta.toks) AS n_tokens,
         |        len(list_filter(ta.toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS stop_hits
         |      FROM acc JOIN ta USING (doc_id)),
         |spl AS (SELECT doc_id,
         |          ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |            AS bucket
         |        FROM acc),
         |v AS (SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
         |        $QualityScoreSql AS quality_score,
         |        CASE WHEN q.nchars < 100 THEN 'too_short'
         |             WHEN q.stop_hits / q.n_tokens < 0.05 THEN 'low_stopword'
         |             WHEN spl.bucket >= 90 THEN 'benchmark_holdout'
         |             WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |             ELSE 'kept' END AS reason
         |      FROM q JOIN spl USING (doc_id) LEFT JOIN contam c USING (doc_id)),
         |kept AS (SELECT doc_id, n_tokens, quality_score FROM v
         |         WHERE reason = 'kept'),
         |bud AS (SELECT CAST(floor(sum(n_tokens) * $TokenBudgetShare) AS BIGINT)
         |          AS budget FROM kept),
         |cums AS (SELECT doc_id, n_tokens, quality_score,
         |        CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS cum_tokens,
         |        CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
         |          AS BIGINT) AS train_pos
         |      FROM kept),
         |sel AS (SELECT doc_id, n_tokens, quality_score, cum_tokens, train_pos
         |        FROM cums, bud WHERE cum_tokens <= budget),
         |tgt AS (SELECT greatest(CAST(ceil(sum(n_tokens) / ${ShardCount}.0)
         |          AS BIGINT), 1) AS target FROM sel),
         |a AS (SELECT sel.*,
         |        CAST(greatest(least(CAST(floor((cum_tokens - 1) / target)
         |          AS BIGINT), ${ShardCount - 1}), 0) AS INT) AS shard_id
         |      FROM sel, tgt),
         |m AS (SELECT shard_id, count(*) AS shard_docs,
         |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
         |      FROM a GROUP BY 1)
         |SELECT a.shard_id, doc_id, n_tokens, quality_score, train_pos,
         |  cum_tokens, shard_docs, shard_tokens
         |FROM a JOIN m USING (shard_id)""".stripMargin
    },
    "q117_curriculum" ->
      s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents),
         |b AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(toks,
         |          x -> x IN (${inList(TextOps.StopwordsEn)}))) AS BIGINT) AS stop_hits
         |      FROM t),
         |q AS (SELECT doc_id, source,
         |        $QualityScoreSql AS quality_score
         |      FROM b),
         |r AS (SELECT doc_id, source, quality_score,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY quality_score DESC, doc_id) AS rn
         |      FROM q),
         |s AS (SELECT source, row_number() OVER (ORDER BY source) AS si
         |      FROM (SELECT DISTINCT source FROM q)),
         |n AS (SELECT count(*) AS ns FROM s)
         |SELECT doc_id, r.source, quality_score,
         | CAST((rn - 1) * ns + si AS BIGINT) AS train_pos
         |FROM r JOIN s USING (source), n""".stripMargin,
    "q118_length_batches" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
         |e AS (SELECT doc_id, n_tokens,
         |        CAST(length(bin(n_tokens)) AS INT) AS bucket_bits FROM d),
         |c AS (SELECT bucket_bits, CAST(ceil(count(*) / ${BatchDocs}.0) AS BIGINT) AS nb
         |      FROM e GROUP BY 1),
         |x AS (SELECT e.*, ('0x' || substr(sha256('batch|' || CAST(doc_id AS VARCHAR)),
         |        1, 8))::BIGINT % nb AS batch_id
         |      FROM e JOIN c USING (bucket_bits))
         |SELECT bucket_bits, batch_id, count(*) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS batch_tokens,
         | max(n_tokens) AS max_len,
         | CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_tokens,
         | round(sum(n_tokens) / (count(*) * max(n_tokens)), 6) AS fill_ratio
         |FROM x GROUP BY 1, 2""".stripMargin,
    "q111_dsir_select" ->
      s"""WITH tok AS (SELECT doc_id, source, unnest($ToksSql) AS token
         |             FROM documents),
         |raw AS (SELECT token, CAST(count(*) AS BIGINT) AS cr
         |        FROM tok GROUP BY 1),
         |tgt AS (SELECT token, CAST(count(*) AS BIGINT) AS ct
         |        FROM tok WHERE source = '$DsirTarget' GROUP BY 1),
         |lm AS (SELECT token, cr, coalesce(ct, 0) AS ct
         |       FROM raw LEFT JOIN tgt USING (token)),
         |sc AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
         |              CAST(sum(ct) AS BIGINT) AS nt,
         |              CAST(count(*) AS BIGINT) AS v FROM lm),
         |j AS (SELECT doc_id, source,
         |        CAST(round(ln((ct + 0.5) / (nt + 0.5 * v)) -
         |                   ln((cr + 0.5) / (nr + 0.5 * v)), 6)
         |             AS DECIMAL(38,6)) AS lr
         |      FROM tok JOIN lm USING (token), sc),
         |a AS (SELECT doc_id, source, sum(lr) AS slr,
         |        CAST(count(*) AS BIGINT) AS n_tokens
         |      FROM j GROUP BY 1, 2)
         |SELECT doc_id, source, n_tokens,
         |  round(CAST(slr AS DOUBLE) / n_tokens, 6) AS dsir_score
         |FROM a ORDER BY dsir_score DESC, doc_id LIMIT $DsirK""".stripMargin,
    "q112_ppl_buckets" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($ToksSql) AS token
         |             FROM documents),
         |f AS (SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
         |p AS (SELECT doc_id, lang, round(avg(-ln(cf / n_total)), 6) AS nlp,
         |        CAST(count(*) AS BIGINT) AS n_toks
         |      FROM tok JOIN f USING (token), n GROUP BY 1, 2),
         |b AS (SELECT lang, nlp, n_toks,
         |        CAST(ntile(3) OVER (PARTITION BY lang ORDER BY nlp, doc_id)
         |             AS INTEGER) AS bucket
         |      FROM p)
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS bucket_tokens,
         |  min(nlp) AS min_nlp, max(nlp) AS max_nlp,
         |  CAST(sum(CAST(nlp AS DECIMAL(38,6))) AS DOUBLE) AS sum_nlp
         |FROM b GROUP BY 1, 2""".stripMargin,
    "q108_lm_perplexity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |f AS (SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
         |j AS (SELECT doc_id, -ln(cf / n_total) AS nlp
         |      FROM tok JOIN f USING (token), n),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |        round(avg(nlp), 6) AS avg_neg_logp
         |      FROM j GROUP BY 1)
         |SELECT doc_id, n_tokens, avg_neg_logp,
         |  round(exp(avg_neg_logp), 6) AS ppl_proxy
         |FROM a""".stripMargin,
    "q71_canonical_docs" ->
      s"""$CcCteSql,
         |j AS (SELECT cc.cluster_id, cc.doc_id, d.n_chars
         |      FROM cc JOIN documents d USING (doc_id)),
         |r AS (SELECT cluster_id, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY n_chars DESC, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY cluster_id) AS nm,
         |        max(n_chars) OVER (PARTITION BY cluster_id) AS mx
         |      FROM j)
         |SELECT cluster_id, CAST(nm AS BIGINT) AS n_members,
         |       doc_id AS canonical_doc_id, CAST(mx AS BIGINT) AS canonical_chars
         |FROM r WHERE rn = 1 AND nm >= 2""".stripMargin,
    "q75_contamination_report" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |shg AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |keep AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 100),
         |shf AS (SELECT shg.* FROM shg JOIN keep USING (sh)),
         |bench AS (SELECT sh, doc_id AS bench_doc_id FROM shf WHERE doc_id % 10 = 0),
         |hits AS (SELECT s.doc_id, s.sh FROM shf s JOIN bench b USING (sh)
         |         WHERE s.doc_id % 10 <> 0),
         |c AS (SELECT doc_id, (count(DISTINCT sh) >= 3) AS contaminated
         |      FROM hits GROUP BY 1),
         |b AS (SELECT doc_id,
         |  ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
         |    AS bucket FROM documents),
         |s AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train'
         |        WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM b)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN coalesce(contaminated, false) THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  round(sum(CASE WHEN coalesce(contaminated, false) THEN 1 ELSE 0 END)
         |    / count(*), 6) AS contamination_rate
         |FROM s LEFT JOIN c USING (doc_id) GROUP BY 1""".stripMargin,
    "q73_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |c AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
         |       CAST(sum(c) AS BIGINT) AS n_tokens,
         |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
         |FROM c GROUP BY 1""".stripMargin,
    "q74_mixture_weights" ->
      s"""WITH t AS (SELECT lang, len($ToksSql) AS nt FROM documents),
         |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY 1)
         |SELECT lang, n_docs, n_tokens,
         |       round(n_tokens / sum(n_tokens) OVER (), 6) AS tok_share,
         |       round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS sqrt_weight
         |FROM g""".stripMargin,
    "q30_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
         | CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subwords,
         | round(length(array_to_string(toks, '')) / len(toks), 6) AS avg_token_len,
         | CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
         | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digits
         |FROM t""".stripMargin,
    "q31_text_quality" ->
      s"""WITH t AS (SELECT doc_id, n_chars, text, $ToksSql AS toks FROM documents),
         |b AS (SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x IN (${inList(TextOps.StopwordsEn)}))) AS BIGINT) AS stop_hits,
         |  CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct FROM t)
         |SELECT doc_id, n_tokens, round(stop_hits / n_tokens, 6) AS stopword_ratio,
         | round(n_punct / n_chars, 6) AS punct_ratio,
         | (n_chars < 100) AS too_short,
         | (stop_hits / n_tokens < 0.05) AS low_stopword,
         | $QualityScoreSql AS quality_score
         |FROM b""".stripMargin,
    "q32_lang_id" ->
      s"""WITH t AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(toks, x -> x IN (${inList(TextOps.StopwordsEn)}))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> x IN (${inList(TextOps.StopwordsDe)}))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> x IN (${inList(TextOps.StopwordsEs)}))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> x IN (${inList(TextOps.StopwordsFr)}))) AS BIGINT) AS s_fr FROM t)
         |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
         | CASE WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
         |      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
         |      WHEN s_fr > s_en THEN 'fr' ELSE 'en' END AS predicted_lang,
         | (CASE WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
         |      WHEN s_es > s_en AND s_es > s_fr THEN 'es'
         |      WHEN s_fr > s_en THEN 'fr' ELSE 'en' END = lang) AS is_match
         |FROM sc""".stripMargin,
    "q33_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents)
         |SELECT doc_id, list_min(list_transform($ShinglesSql, x -> sha256(x))) AS fingerprint
         |FROM t""".stripMargin,
    "q34_exact_dedup" ->
      """SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
        | count(*) AS n_docs, min(doc_id) AS canonical_doc_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q35_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |shg AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |keep AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 100),
         |shf AS (SELECT shg.* FROM shg JOIN keep USING (sh)),
         |sz AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY 1),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |      FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |j AS (SELECT doc_a, doc_b, round(common / (sa.n + sb.n - common), 6) AS jaccard
         |      FROM p JOIN sz sa ON p.doc_a = sa.doc_id JOIN sz sb ON p.doc_b = sb.doc_id)
         |SELECT * FROM j WHERE jaccard >= 0.5""".stripMargin,
    "q48_dedup_clusters" ->
      s"""$CcCteSql
         |SELECT doc_id, cluster_id, (cluster_id <> doc_id) AS is_duplicate
         |FROM cc""".stripMargin,
    "q36_minhash_lsh" -> {
      val sigCols = (0 until S).map(i => s"  ${minhashSql(i)} AS m$i").mkString(",\n")
      val bandSelects = (0 until Bands).map(b =>
        s"SELECT doc_id, $b AS band_idx, " +
          s"sha256(CAST(m${2 * b} AS VARCHAR) || '|' || CAST(m${2 * b + 1} AS VARCHAR)) AS bh FROM sig")
        .mkString("\n UNION ALL ")
      val estSum = (0 until S).map(i =>
        s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |sgt AS (SELECT doc_id, list_distinct($ShinglesSql) AS sg FROM t),
         |sig AS (SELECT doc_id,
         |$sigCols
         |FROM sgt),
         |band AS ($bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM band a
         |         JOIN band b ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |est AS (SELECT doc_a, doc_b, round(($estSum) / ${S.toDouble}, 6) AS est_jaccard
         |        FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id)
         |SELECT * FROM est WHERE est_jaccard >= 0.5""".stripMargin
    },
    "q44_rolling_hash" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |w AS (SELECT doc_id, CAST(greatest(len(toks) - 4, 1) AS BIGINT) AS n_windows,
         |  list_min(list_transform(range(1, greatest(len(toks) - 4, 1) + 1),
         |    i -> list_reduce(
         |           list_transform(toks[i:i+4],
         |             x -> ('0x' || substr(sha256(x), 1, 7))::BIGINT),
         |           (acc, v) -> (acc * 1000003 + v) % 2147483647))) AS min_window_hash
         |FROM t)
         |SELECT doc_id, n_windows, min_window_hash FROM w""".stripMargin,
    "q69_chunking" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |        unnest(range(1, greatest(len(toks) - 31, 1) + 1, 24)) AS st
         |      FROM t)
         |SELECT doc_id, CAST((st - 1) / 24 AS INT) AS chunk_idx,
         | CAST(len(toks[st:st+31]) AS INT) AS n_tokens,
         | sha256(array_to_string(toks[st:st+31], ' ')) AS chunk_hash
         |FROM c""".stripMargin,
    "q66_sequence_pack" ->
      s"""WITH g AS (SELECT greatest(8, CAST(ceil(count(*) / ${PackGroupSize}.0) AS BIGINT)) AS n
         |           FROM documents),
         |t AS (SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |  CAST(('0x' || substr(sha256('pack|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |    % (SELECT n FROM g) AS INT) AS pack_group
         |FROM documents),
         |w AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
         |        ROWS UNBOUNDED PRECEDING) AS cum_tokens FROM t)
         |SELECT doc_id, n_tokens, pack_group, CAST(cum_tokens AS BIGINT) AS cum_tokens,
         |  CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS seq_id
         |FROM w""".stripMargin,
    "q58_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         |         round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
         |       FROM tf JOIN dfq USING (token), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, token) AS rn FROM sc)
         |SELECT doc_id, token AS top_token, tf, df, tfidf FROM r WHERE rn = 1""".stripMargin,
    "q56_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |shg AS (SELECT doc_id, unnest(list_distinct($ShinglesSql)) AS sh FROM t),
         |keep AS (SELECT sh FROM shg GROUP BY sh HAVING count(*) BETWEEN 2 AND 100),
         |shf AS (SELECT shg.* FROM shg JOIN keep USING (sh)),
         |bench AS (SELECT sh, doc_id AS bench_doc_id FROM shf WHERE doc_id % 10 = 0),
         |hits AS (SELECT s.doc_id, s.sh, b.bench_doc_id
         |         FROM shf s JOIN bench b USING (sh) WHERE s.doc_id % 10 <> 0)
         |SELECT doc_id, count(DISTINCT sh) AS n_shared_shingles,
         |       count(DISTINCT bench_doc_id) AS n_bench_docs,
         |       (count(DISTINCT sh) >= 3) AS contaminated
         |FROM hits GROUP BY 1""".stripMargin,
    "q53_train_split" ->
      """WITH b AS (SELECT doc_id,
        |  ('0x' || substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
        |    AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        | CASE WHEN bucket < 80 THEN 'train'
        |      WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b""".stripMargin,
    "q77_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |    || ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
        |FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text,
        |   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        | CAST(len(regexp_extract_all(text,
        |   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        | sha256(regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'))
        |   AS redacted_sha
        |FROM t""".stripMargin,
    "q78_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, len($ToksSql) AS n FROM documents),
         |s AS (SELECT doc_id, least(1.0, n / 100.0) AS w,
         |  ('0x' || substr(sha256('wsample|' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
         |    / 16777216.0 AS u
         |FROM t)
         |SELECT doc_id, round(w, 6) AS weight, round(u, 6) AS u,
         | u < w AS accepted
         |FROM s""".stripMargin,
    "q54_repetition" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |shg AS (SELECT doc_id, unnest($ShinglesSql) AS sh FROM t),
         |c AS (SELECT doc_id, sh, count(*) AS c FROM shg GROUP BY 1, 2),
         |a AS (SELECT doc_id, max(c) AS top_ngram, CAST(sum(c) AS BIGINT) AS n_ngrams
         |      FROM c GROUP BY 1)
         |SELECT doc_id, top_ngram, n_ngrams,
         | round(top_ngram / n_ngrams, 6) AS repetition_ratio
         |FROM a""".stripMargin,
    "q55_vocab_topk" ->
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS token FROM documents)
         |SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
         |FROM tok GROUP BY 1 ORDER BY freq DESC, token LIMIT 100""".stripMargin,
    "q102_bpe_merge_pairs" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(list_transform(
        |  range(1, greatest(len(toks)-1,1)+1),
        |  i -> array_to_string(toks[i:i+1], ' '))) AS pair FROM t)
        |SELECT pair, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
        |FROM p WHERE contains(pair, ' ')
        |GROUP BY 1 ORDER BY freq DESC, pair LIMIT 50""".stripMargin,
    "q37_simhash" -> {
      val sums = (0 until 32).map(b =>
        s"  sum(${simhashBitSql(b)} * 2 - 1) AS b$b").mkString(",\n")
      val bits = (0 until 32).map(b =>
        s"CASE WHEN b$b > 0 THEN '1' ELSE '0' END").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS t FROM documents),
         |a AS (SELECT doc_id,
         |$sums
         |FROM tok GROUP BY doc_id)
         |SELECT doc_id, concat($bits) AS simhash FROM a""".stripMargin
    },
    "q84_simhash_hamming" -> {
      val sums = (0 until 32).map(b =>
        s"  sum(${simhashBitSql(b)} * 2 - 1) AS b$b").mkString(",\n")
      val word = (0 until 32).map(b =>
        s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest($ToksSql) AS t FROM documents),
         |a AS (SELECT doc_id,
         |$sums
         |FROM tok GROUP BY doc_id),
         |sim AS (SELECT doc_id, CAST($word AS BIGINT) AS sim FROM a),
         |bands AS (SELECT doc_id, sim, b AS band_idx, (sim >> (8*b)) & 255 AS bv
         |          FROM sim, unnest([0, 1, 2, 3]) AS u(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM bands x JOIN bands y ON x.band_idx = y.band_idx
         |           AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |p AS (SELECT doc_a, doc_b,
         |        CAST(bit_count(xor(sa.sim, sb.sim)) AS INT) AS hamming
         |      FROM cand JOIN sim sa ON doc_a = sa.doc_id
         |                JOIN sim sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 3""".stripMargin
    })
}
