package graft.tools

/** Decade-scaling sweep over a query subset: run the named SparkEntry
  * queries as ROUND-ROBIN sweeps (the [[graft.Bench]] steal-robustness
  * shape — a burst inflates one sweep's single draw, the cross-sweep
  * min stays honest) against SPARK_GRAFT_SF_DIR, with the deterministic
  * CPU canary timed at every sweep boundary. One cold JVM per scale
  * point; the sf0.1 vs ScaleGen-sf1 ratio of per-query MINS is the
  * scaling evidence ("survives 100×") the plan-reading arguments rest
  * on.
  *
  * Usage: ScaleSweep <query1,query2,...> [sweeps=3]
  */
object ScaleSweep {

  private def canarySec(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < (1 << 27)) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    if (acc == 42L) print("")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleSweep <q1,q2,...> [sweeps]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sweeps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-scalesweep")
    spark.sparkContext.setLogLevel("ERROR")
    def exec(n: String): Unit = {
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // warm-up: JIT + codegen along the relational and text paths
    spark.range(10000000L).selectExpr("sum(id * 2)").collect()
    exec("q01_clean_project")
    exec("q33_fingerprint")
    canarySec()
    val times = Array.fill(names.size, sweeps)(-1.0)
    val canaries = Array.fill(sweeps + 1)(-1.0)
    for (s <- 0 until sweeps) {
      canaries(s) = canarySec()
      names.zipWithIndex.foreach { case (n, qi) =>
        val t0 = System.nanoTime()
        try { exec(n); times(qi)(s) = (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          println(s"""{"metric":"sweep_error","query":"$n","err":"${e.getClass.getSimpleName}"}""") }
      }
    }
    canaries(sweeps) = canarySec()
    println(s"""{"metric":"sweep_canary","sec":[${canaries.map(c => f"$c%.3f").mkString(",")}]}""")
    names.zipWithIndex.foreach { case (n, qi) =>
      val good = times(qi).filter(_ >= 0).sorted
      val mn = if (good.isEmpty) -1.0 else good.head
      val med =
        if (good.isEmpty) -1.0
        else if (good.length % 2 == 1) good(good.length / 2)
        else (good(good.length / 2 - 1) + good(good.length / 2)) / 2.0
      println(f"""{"metric":"sweep_query","query":"$n","sf":"$sfDir","min":$mn%.3f,"median":$med%.3f,"n":${good.length}}""")
    }
    spark.stop()
  }
}
