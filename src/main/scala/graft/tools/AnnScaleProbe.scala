package graft.tools

import graft.core.Tables
import graft.pipeline.AnnIndexStore
import org.apache.spark.sql.functions._

/** Dev-only ANN scaling probe (the IVF twin of IsoBench).
  *
  * The oracle-pinned q83/q94 shapes cannot show the index's true scale
  * behavior: q94 pins K=16 (so cells grow with the corpus) and both
  * grow their QUERY set with the corpus (`vec_id % 50`) — wall-clock
  * then mixes three different growths. This probe measures the
  * production configuration instead:
  *
  *  - K = ceil(sqrt(N)) centroids (the classic IVF balance point: both
  *    the build's assignment N·K and a probe's candidate set
  *    nprobe·N/K grow as N^1.5 / sqrt(N) instead of N²);
  *  - a FIXED 40-query set drawn from the first replica (ids exist at
  *    every factor), so query wall-clock isolates per-query latency.
  *
  * Prints build seconds once and query seconds 3× (run 1 carries JIT).
  * Usage: AnnScaleProbe <sfDir> [nprobe]; point <sfDir> at a ScaleGen
  * output to take the next scale step.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnScaleProbe <sfDir> [nprobe]")
    val sfDir = args(0)
    val nprobe = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_annprobe_" +
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    println(s"[annprobe] n=$n k=$k nprobe=$nprobe")

    val t0 = System.nanoTime()
    AnnIndexStore.build(spark, root, e,
      AnnIndexStore.trainCentroids(e, k = k, iters = 2))
    println(f"[annprobe] build ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // fixed query set: the 40 SMALLEST matching ids — factor-independent
    // for any source size (a literal id cutoff would admit higher
    // replicas' ids when the source corpus is small, quietly growing the
    // query set with the factor — the exact conflation this probe
    // removes from q83/q94)
    val q = e.filter(col("vec_id") % 50 === 0)
      .orderBy(col("vec_id")).limit(40)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    for (i <- 1 to 3) {
      val t1 = System.nanoTime()
      AnnIndexStore.query(spark, root, q, k = 3, nprobe = nprobe)
        .write.format("noop").mode("overwrite").save()
      println(f"[annprobe] query run$i ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
