package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries into a directory —
  * the plan-evidence artifact of the optimization rounds
  * (`plans/rNN/<query>_{before,after}.txt`). Building a pipeline-family
  * query's DataFrame RUNS its pipeline (the frame is the final read), so
  * a full dump costs roughly one bench sweep.
  *
  * Usage: PlanDump <outDir> <suffix> [queryName ...]  (no names = all)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val txt =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      spark.catalog.clearCache()
      println(s"dumped $name")
    }
    spark.stop()
  }
}
