package graft.tools

/** Dev-only single-query isolation benchmark — the "IsoBench" protocol
  * every BASELINE.md anchor cites, as a reproducible main instead of an
  * ad-hoc loop: run ONE SparkEntry query N times (default 3) in a fresh
  * session against SPARK_GRAFT_SF_DIR and print per-run seconds plus the
  * warm-min/median. Point the sf dir at a [[ScaleGen]] replica for
  * decade-growth probes (only the tables the query reads need to exist
  * there — the document-family probes use a documents-only replica).
  *
  * The WARM-MIN is the anchor statistic: on a steal-prone shared host a
  * median can be over-read 10x while the min is steal-robust (see the
  * adjudication note in [[graft.Bench]]). Run-1 includes JIT/codegen
  * warm-up by design — compare cold pairs with cold pairs.
  *
  * Usage: IsoBench <queryName> [runs]
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IsoBench <queryName> [runs]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-isobench")
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"""{"run":$i,"sec":$dt%.3f}""")
      dt
    }
    val sorted = times.sorted
    val med =
      if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
    // warm-min = min over runs 2..N (run order, not rank — run 1 carries
    // the JIT/codegen warm-up)
    val warmMin = times.drop(1).minOption.getOrElse(times.head)
    println(f"""{"query":"$name","sf":"$sfDir","runs":$runs,""" +
      f""""min":${sorted.head}%.3f,"median":$med%.3f,"warm_min":$warmMin%.3f}""")
    spark.stop()
  }
}
