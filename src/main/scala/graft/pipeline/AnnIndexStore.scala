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
  * would strand the old row (delete + append instead).
  */
object AnnIndexStore {

  case class Paths(root: String) {
    val centroids: String = s"$root/centroids"
    val cells: String = s"$root/cells"
  }

  /** Cosine rounded to 6 digits — the same convention as every vector
    * oracle, so argmax/ranking ties resolve identically across engines. */
  private def cos(a: Column, b: Column): Column =
    round(graft.functions.GraftFunctions.cosine(a, b), 6)

  /** Nearest-centroid assignment (argmax via max_by; ties → lowest id). */
  private def assign(df: DataFrame, cents: DataFrame): DataFrame =
    df.crossJoin(broadcast(cents))
      .withColumn("__cos", cos(col("embedding"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("centroid_id")),
        struct(col("__cos"), -col("centroid_id"))).as("__best"))
      .select(col("vec_id"), col("__best.embedding").as("embedding"),
        col("__best.centroid_id").as("centroid_id"))

  /** Build the index from a corpus (`vec_id`, `embedding`): every
    * `centroidEvery`-th vector (offset 1) seeds a centroid, every vector
    * lands in its nearest centroid's hive partition. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
            centroidEvery: Int = 50): Unit = {
    val p = Paths(root)
    val cents = corpus
      .filter(pmod(col("vec_id"), lit(centroidEvery)) === 1)
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("cv"))
    AtomicRewrite.write(spark, p.centroids, cents)
    val cells = assign(corpus, AtomicRewrite.read(spark, p.centroids))
    AtomicRewrite.write(spark, p.cells, cells,
      partitionBy = Seq("centroid_id"))
  }

  /** Append a batch: assign against the EXISTING centroids, rewrite only
    * the touched cells (carried-by-reference manifest commit). A replay
    * (same vec_ids) replaces rather than duplicates. */
  def append(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    val p = Paths(root)
    val cents = AtomicRewrite.read(spark, p.centroids)
    val asg = assign(batch, cents).persist()
    val touched = asg.select("centroid_id").distinct().persist()
    if (!touched.isEmpty) {
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
    }
    asg.unpersist(); touched.unpersist()
  }

  /** Top-`k` neighbors per query (`query_id`, `qv`), probing each
    * query's `nprobe` nearest cells. Only the probed hive partitions are
    * read; ranking is the TopKPerKey heap operator. */
  def query(spark: SparkSession, root: String, queries: DataFrame,
            k: Int = 3, nprobe: Int = 1): DataFrame = {
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
    val cand = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cos(col("qv"), col("embedding")).as("cos_sim"))
    graft.plans.TopKPerKey.perKey(cand,
      Seq("query_id"), Seq(col("cos_sim").desc, col("neighbor_id")), k)
  }
}
