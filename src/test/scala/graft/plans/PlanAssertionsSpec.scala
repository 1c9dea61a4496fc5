package graft.plans

import org.apache.spark.sql.DataFrame

import graft.{SparkEntry, SparkSpec}

/** Enforced physical-plan properties for flagship queries — the 100 TB
  * story as assertions, not prose. The DuckDB oracle proves WHAT each
  * query returns; this spec pins HOW: filters reach the parquet scan,
  * small dims broadcast instead of shuffling, the custom operators are
  * actually planned, and the hot paths stay inside whole-stage codegen.
  * A refactor that silently de-optimizes a plan fails here even though
  * every value still matches.
  */
class PlanAssertionsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Execute (so AQE finalizes its plan) and return the physical plan text. */
  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    s
  }

  test("q02: the filter is pushed into the parquet scan") {
    val p = planOf("q02_filter_project")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: [")).mkString
    assert(pushed.nonEmpty, s"no PushedFilters line in:\n$p")
    assert(!pushed.contains("PushedFilters: []"),
      s"scan reads unfiltered — predicate not pushed:\n$pushed")
  }

  test("q02: the scan reads only the projected columns") {
    val p = planOf("q02_filter_project")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    // the source table is 7 columns wide; the query needs far fewer
    assert(read.nonEmpty && !read.contains("c_comment"),
      s"column pruning lost — scan reads more than the projection:\n$read")
  }

  test("q07: the dimension side of the validation join broadcasts") {
    val p = planOf("q07_key_validation")
    assert(p.contains("BroadcastHashJoin"),
      s"dim join should broadcast, not shuffle:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"unexpected sort-merge join in a broadcastable dim join:\n${p.take(2000)}")
  }

  test("q08/q09: semi and anti joins broadcast the filter side") {
    val semi = planOf("q08_semi_join")
    assert(semi.contains("BroadcastHashJoin") && semi.contains("LeftSemi"), semi.take(2000))
    val anti = planOf("q09_anti_join")
    assert(anti.contains("LeftAnti"), anti.take(2000))
  }

  test("q80: the custom TopKPerKey physical operator is planned") {
    val p = planOf("q80_topk_per_key")
    assert(p.contains("TopKPerKey"),
      s"TopKPerKeyExec missing — strategy not applied:\n${p.take(2000)}")
    // the whole point: no per-group global sort before the limit
    assert(!p.contains("Window"), s"fell back to a window plan:\n${p.take(2000)}")
  }

  test("q109: the rank<=k idiom rewrites to the native TopKPerKey operator") {
    // the production sessions (SparkSessionFactory) install the rewrite
    // rule; mirror that here so the assertion tests the deployed plan
    graft.plans.TopKPerKey.install(spark)
    val p = planOf("q109_hard_negatives")
    assert(p.contains("TopKPerKey"),
      s"rank filter did not rewrite to TopKPerKeyExec:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"fell back to a window plan:\n${p.take(2000)}")
  }

  test("q93: the native as-of join operator is planned") {
    val p = planOf("q93_asof_native")
    assert(p.contains("AsOfJoin"),
      s"AsOfJoinExec missing — strategy not applied:\n${p.take(2000)}")
  }

  test("q39: ANN scoring runs through the codegen cosine expression") {
    val p = planOf("q39_ann_topk")
    assert(p.contains("graft_cosine") || p.contains("CosineSimilarity"),
      s"native cosine expression missing from the plan:\n${p.take(2000)}")
  }

  test("q01: the cleansing projection stays inside whole-stage codegen") {
    val p = planOf("q01_clean_project")
    // the simple-form plan marks whole-stage-codegen spans with a `*(n)`
    // prefix on each fused operator
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"narrow map fell out of codegen:\n${p.take(2000)}")
  }

  test("q83: store probes prune the cell table to the probed hive partitions") {
    // the ANN store's 100 TB contract: a probe reads O(probed cells), not
    // the corpus — enforced here as a PartitionFilters property on every
    // scan of the cell table (both the int8 candidate pass and the exact
    // rerank pass must carry the centroid_id pruning predicate)
    val p = planOf("q83_ann_index_store")
    // cell-table scans are identified by the store path (the centroids
    // table also carries a centroid_id DATA column, so the column name
    // alone can't tell the two apart)
    val cellScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/cells/")).toSeq
    assert(cellScans.size >= 2,
      s"expected the candidate + rerank cell scans, got:\n${cellScans.mkString("\n")}\nplan:\n${p.take(3000)}")
    assert(cellScans.forall(l => l.contains("PartitionFilters: [") &&
      !l.replaceAll("\\s", "").contains("PartitionFilters:[]")),
      s"a cell scan reads ALL partitions — probe pruning lost:\n${cellScans.mkString("\n")}")
    assert(cellScans.forall(_.contains("centroid_id#")),
      s"cell scans must prune on centroid_id:\n${cellScans.mkString("\n")}")
  }

  test("q123: BM25 postings scans prune to the query terms' hash buckets") {
    // the retrieval store's 100 TB contract: a query batch reads ONLY
    // the bucket partitions its terms hash into, with the term filter
    // pushed into the scan — an unpruned postings scan would read the
    // whole index per query batch
    val p = planOf("q123_bm25_store")
    val postScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("/postings/")).toSeq
    assert(postScans.nonEmpty, s"no postings scan found:\n${p.take(3000)}")
    assert(postScans.forall(l => l.contains("PartitionFilters: [") &&
      !l.replaceAll("\\s", "").contains("PartitionFilters:[]")),
      s"a postings scan reads ALL buckets — term pruning lost:\n${postScans.mkString("\n")}")
    assert(postScans.forall(_.contains("token#")),
      s"the term filter must reach the postings scan:\n${postScans.mkString("\n")}")
  }

  test("q111: the DSIR top-K cut plans as TakeOrderedAndProject, not a global sort") {
    // the selection over a 100 TB pool must be per-partition top-K +
    // driver merge of K·P rows — a global Sort before the limit would
    // shuffle the whole scored corpus to one range partitioning
    val p = planOf("q111_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K cut lost TakeOrderedAndProject:\n${p.take(2000)}")
  }

  test("q115: the budget cumsum is a distributed prefix sum, not one global window") {
    // the 100 TB contract of the budget cut: corpus rows cumsum inside
    // range partitions keyed by partition id; only the O(partitions)
    // offset frame may ever pass through a single-partition window. A
    // regression to Window.orderBy over the docs would still return the
    // right rows (the oracle can't see it) but serialize the corpus
    // through one task — exactly what this pin rejects.
    val p = planOf("q115_token_budget")
    assert(p.contains("rangepartitioning"),
      s"corpus must be range-repartitioned on the order key:\n${p.take(2000)}")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.exists(_.contains("__ps_pid")),
      s"the corpus cumsum window must be keyed by partition id:\n${windows.mkString("\n")}")
    // any window NOT keyed by __ps_pid must be the offset chain (it sums
    // the O(partitions) __ps_t column, never corpus n_tokens rows)
    val unkeyed = windows.filterNot(_.contains("__ps_pid"))
    assert(unkeyed.forall(_.contains("__ps_t")),
      s"a corpus-sized window runs unpartitioned:\n${unkeyed.mkString("\n")}")
  }

  test("q120 path: the shard-assignment cumsum is a distributed prefix sum, not one global window") {
    // the epoch publish shares q115's scale contract: corpus rows cumsum
    // inside range partitions keyed by partition id, and ONLY the
    // O(partitions) offset frame may pass through an unpartitioned
    // window — a regression to Window.orderBy(train_pos) would still
    // produce correct shards (the q120 oracle can't see it) while
    // serializing the corpus through one task
    import org.apache.spark.sql.functions._
    val corpus = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("n_tokens"), (col("id") + 1).as("train_pos"))
    val (assigned, cached) =
      graft.pipeline.TrainingShards.rangeAssign(corpus, 8, "train_pos")
    assigned.collect()
    val p = assigned.queryExecution.executedPlan.toString
    cached.unpersist()
    assert(p.contains("rangepartitioning"),
      s"corpus must be range-repartitioned on the order key:\n${p.take(2000)}")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.exists(_.contains("__ps_pid")),
      s"the corpus cumsum window must be keyed by partition id:\n${windows.mkString("\n")}")
    val unkeyed = windows.filterNot(_.contains("__ps_pid"))
    assert(unkeyed.forall(_.contains("__ps_t")),
      s"a corpus-sized window runs unpartitioned:\n${unkeyed.mkString("\n")}")
  }

  test("q121: coverage cumsum and rank share partition-id windows; only the offset frame is unpartitioned") {
    // the vocab-sizing curve runs BOTH running totals (coverage mass and
    // rank) through one PrefixSum pass — the pin rejects a regression
    // where either re-plans as a vocab-sized single-partition window
    val p = planOf("q121_vocab_coverage")
    assert(p.contains("rangepartitioning"),
      s"vocab must be range-repartitioned on the frequency order:\n${p.take(2000)}")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.exists(_.contains("__ps_pid")),
      s"the coverage cumsum window must be keyed by partition id:\n${windows.mkString("\n")}")
    val unkeyed = windows.filterNot(_.contains("__ps_pid"))
    assert(unkeyed.forall(_.contains("__ps_t")),
      s"a vocab-sized window runs unpartitioned:\n${unkeyed.mkString("\n")}")
  }

  test("q126: the mixture cumsum windows are source-keyed, never global") {
    // the resampler's scale contract: every window partitions by the
    // real source key — a regression to an unpartitioned cumsum would
    // serialize the corpus through one task
    val p = planOf("q126_mixture_resample")
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"expected a source-keyed window:\n${p.take(2000)}")
    assert(windows.forall(_.contains("source")),
      s"a window runs without the source key:\n${windows.mkString("\n")}")
  }

  test("q118: batch shaping plans with zero window operators") {
    // the batching cut's scale claim is that it is PURE keyed
    // aggregation — hash sharding within length buckets instead of any
    // ordered rank — so no Window exec (and no sort-for-a-window) may
    // appear; a regression to rank-based batch numbering would
    // reintroduce per-bucket serialization under skewed lengths
    val p = planOf("q118_length_batches")
    assert(!p.contains("Window ["),
      s"batch shaping must not plan a window:\n${p.take(2000)}")
  }

  test("q23: TPC-H pricing pushes the date filter to the scan") {
    val p = planOf("q23_tpch_pricing")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: [")).mkString
    assert(pushed.nonEmpty && !pushed.replaceAll("\\s", "").contains("PushedFilters:[]"),
      s"shipdate filter not pushed:\n$pushed")
  }
}
