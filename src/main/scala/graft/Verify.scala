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
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Expected-query manifest: lets the compare side assert that every
    // selected query produced output (r7 silently dropped 19 of 100 —
    // a missing dir must fail loudly, by name, not shrink the pass set).
    val expected = SparkEntry.queries.keys.filter(keep).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/query_names.json"),
      expected.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
