package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [nameRegex]")
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: regex over query names, for local dev loops.
    val keep: String => Boolean =
      if (args.length > 2) { val re = args(2).r; n => re.findFirstIn(n).isDefined }
      else _ => true
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    import graft.core.JsonText.{escape => q}
    // Expected-query manifest, written BEFORE the loop: if this process
    // dies mid-run the compare must still see the full selected set and
    // flag every absent query as MISSING (r7 silently dropped 19 of 100;
    // a post-loop manifest would vanish with the process and re-open the
    // silent-shrink hole).
    val expected = SparkEntry.queries.keys.filter(keep).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      expected.map(q).mkString("[", ",", "]"))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // stdout, not stderr: the driver's tail capture keeps only stdout,
        // and r7's 19-query blackout was invisible in the artifacts.
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\\r\\n\\t]", " ").take(200)
        println(s"[verify] $name FAILED: $msg")
      }
      finally spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
