package graft.tools

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus scale-replication for throughput probes: writes a `factor`×
  * copy of selected testdata tables so both the pair-forming family
  * (near-dup, decontamination, clustering, ANN) and the pipeline/window
  * families can be measured scale steps beyond the shipped testdata —
  * the empirical points that turn the "subquadratic by construction"
  * design claims into evidence.
  *
  * Replication preserves the WITHIN-replica statistics exactly and
  * decorrelates ACROSS replicas, so a well-designed candidate generator
  * should grow ~linearly in `factor` (each replica is an independent
  * corpus with the source's structure), while anything accidentally
  * quadratic shows up as factor² growth:
  *  - documents: replica k suffixes every token with `§k` — token/shingle
  *    counts, lengths and the per-replica duplicate structure match the
  *    source, but no shingle collides across replicas (a plain copy would
  *    instead make every doc a 10-way near-duplicate, multiplying pair
  *    counts by factor² and measuring a DIFFERENT workload);
  *  - embeddings: replica k cyclically shifts the vector by k dims — the
  *    same permutation for all of replica k, so every within-replica
  *    cosine is EXACTLY the source's (dot products are permutation-
  *    invariant) while cross-replica similarities are uncorrelated.
  *
  * The relational star scales the same way for the pipeline probes:
  *  - customer: replica k strides `c_custkey`;
  *  - orders: replica k strides `o_orderkey` AND re-points `o_custkey`
  *    with the CUSTOMER stride, so every replica is a self-contained
  *    FK-consistent sub-star (key validation finds its dim row, the
  *    daily grain keeps the source's ~2400 dates with factor× rows per
  *    date — the growth shape a larger tenant actually produces);
  *  - events: replica k strides `event_id` and re-points `user_id` with
  *    the CUSTOMER stride too (the as-of join keys events.user_id to
  *    orders.o_custkey, and source users are a subset of custkeys — the
  *    stride keeps that containment per replica); timestamps stay, so
  *    the sessionize/window family gets factor× users over the same
  *    span with identical per-user session structure.
  *
  * Usage: ScaleGen <srcSfDir> <dstDir> <factor> [tables,...]. Default
  * tables = documents,embeddings (the corpus family); pass e.g.
  * `customer,orders,events` for the pipeline family. The output mirrors
  * the testdata layout (<dst>/<table>.parquet), so SPARK_GRAFT_SF_DIR
  * can point straight at it for IsoBench/Bench.
  */
object ScaleGen {

  val Known: Set[String] =
    Set("documents", "embeddings", "customer", "orders", "events")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleGen <srcSfDir> <dstDir> <factor> [tables,...]")
    val Array(srcDir, dstDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val tables: Set[String] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("documents", "embeddings"))
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, dstDir, factor, tables)
    spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, dstDir: String,
          factor: Int, tables: Set[String]): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(tables.subsetOf(Known), s"unknown tables: ${tables -- Known}")
    val reps = spark.range(factor).select(col("id").cast("int").as("k"))

    // ids can start at 0 — the replica stride is max+1 or ids collide at
    // the boundary. The cast keeps the probe working if a regeneration
    // ships the id as INT32; an empty source fails loudly before any
    // destination write.
    def stride(df: org.apache.spark.sql.DataFrame, idCol: String,
               what: String): Long = {
      val r = df.agg(max(col(idCol)).cast("long")).head()
      require(!r.isNullAt(0), s"$what table in $srcDir is empty")
      r.getLong(0) + 1
    }

    if (tables("customer") || tables("orders") || tables("events")) {
      // one stride for all three tables: orders' and events' FKs
      // re-point with the CUSTOMER stride or replica k's rows would
      // reference replica 0's dim rows and the key-validation / as-of
      // paths would measure a different (all-hot-dim) workload
      val cust = Tables.load(spark, srcDir, "customer")
      val custStride = stride(cust, "c_custkey", "customer")
      if (tables("customer"))
        cust.crossJoin(reps)
          .withColumn("c_custkey", col("c_custkey") + col("k") * lit(custStride))
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dstDir/customer.parquet")
      if (tables("orders")) {
        val orders = Tables.load(spark, srcDir, "orders")
        val orderStride = stride(orders, "o_orderkey", "orders")
        orders.crossJoin(reps)
          .withColumn("o_orderkey", col("o_orderkey") + col("k") * lit(orderStride))
          .withColumn("o_custkey", col("o_custkey") + col("k") * lit(custStride))
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dstDir/orders.parquet")
      }
      if (tables("events")) {
        val events = Tables.load(spark, srcDir, "events")
        val eventStride = stride(events, "event_id", "events")
        events.crossJoin(reps)
          .withColumn("event_id", col("event_id") + col("k") * lit(eventStride))
          .withColumn("user_id", col("user_id") + col("k") * lit(custStride))
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dstDir/events.parquet")
      }
    }

    if (tables("documents")) {
      val docs = Tables.load(spark, srcDir, "documents")
      val docStride = stride(docs, "doc_id", "documents")
      docs.crossJoin(reps)
        .select(
          (col("doc_id") + col("k") * lit(docStride)).as("doc_id"),
          when(col("k") === 0, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit("§"), col("k"))), " ")).as("text"),
          col("lang"), col("source"))
        // the source ships n_chars = length(text); the suffixed replica
        // texts are longer, so the invariant must be recomputed or every
        // n_chars consumer (quality cutoffs, canonical max-by) would
        // measure against stale lengths on the scaled corpus
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")
    }

    if (tables("embeddings")) {
      val emb = Tables.load(spark, srcDir, "embeddings")
      val vecStride = stride(emb, "vec_id", "embeddings")
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      // shift by k mod dims so any factor is legal; replicas a full `dims`
      // apart share a permutation (still disjoint ids and documents)
      val shift = pmod(col("k"), lit(dims))
      emb.crossJoin(reps)
        .select(
          (col("vec_id") + col("k") * lit(vecStride)).as("vec_id"),
          concat(
            slice(col("embedding"), shift + 1, lit(dims) - shift),
            slice(col("embedding"), lit(1), shift)).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")
    }

    println(s"[scalegen] wrote ${factor}x ${tables.toSeq.sorted.mkString("+")} to $dstDir")
  }
}
