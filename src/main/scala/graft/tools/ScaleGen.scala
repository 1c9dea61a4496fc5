package graft.tools

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Corpus scale-replication for throughput probes: writes a `factor`×
  * copy of the `documents` and `embeddings` tables so the pair-forming
  * family (near-dup, decontamination, clustering, ANN) can be measured
  * one scale step beyond the shipped testdata — the empirical point that
  * turns the "subquadratic by construction" design claims into evidence.
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
  * Usage: ScaleGen <srcSfDir> <dstDir> <factor>. The output mirrors the
  * testdata layout (<dst>/documents.parquet, <dst>/embeddings.parquet),
  * so SPARK_GRAFT_SF_DIR can point straight at it for IsoBench/Bench.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleGen <srcSfDir> <dstDir> <factor>")
    val Array(srcDir, dstDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")
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

    val docs = Tables.load(spark, srcDir, "documents")
    val docStride = stride(docs, "doc_id", "documents")
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("k") * lit(docStride)).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("§"), col("k"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")

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

    println(s"[scalegen] wrote ${factor}x documents+embeddings to $dstDir")
    spark.stop()
  }
}
