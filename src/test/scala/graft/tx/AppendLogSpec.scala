package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Append-only log: tagged idempotent appends, O(1) recorded probe, and
  * crash-safe legacy fold-in (every intermediate state of the migration
  * must read correctly and retry safely). */
class AppendLogSpec extends SparkSpec {
  import spark.implicits._

  test("tagged append is idempotent and probe-able without a scan") {
    val root = Files.createTempDirectory("graft-alog").toString + "/log"
    val rows = Seq((1L, "a")).toDF("v", "x")
    assert(!AppendLog.tagged(spark, root, "v1"))
    AppendLog.append(spark, root, rows, tag = Some("v1"))
    assert(AppendLog.tagged(spark, root, "v1"))
    // replaying the same tagged append overwrites, never duplicates
    AppendLog.append(spark, root, rows, tag = Some("v1"))
    assert(AppendLog.read(spark, root).count() == 1)
    AppendLog.append(spark, root, Seq((2L, "b")).toDF("v", "x"), tag = Some("v2"))
    assert(AppendLog.read(spark, root).count() == 2)
    assert(!AppendLog.tagged(spark, root, "v3"))
  }

  test("legacy fold-in: reads stay correct mid-migration; retry never duplicates") {
    val root = Files.createTempDirectory("graft-alog-mig").toString + "/log"
    AtomicRewrite.write(spark, root,
      Seq((1L, "old1"), (2L, "old2")).toDF("v", "x").coalesce(1))

    // simulate the state after stage+rename but BEFORE the version dirs
    // are deleted (a crash window): folded files AND versioned layout
    val legacy = AtomicRewrite.read(spark, root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(root, ".stage")
    legacy.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    f.listStatus(staged).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => f.rename(s.getPath,
        new org.apache.hadoop.fs.Path(root, "legacy.parquet")))
    f.delete(staged, true)
    // mid-migration read resolves the versioned layout, ignores the
    // flat fold — no double counting
    assert(AppendLog.read(spark, root).count() == 2)

    // retry (the next append) completes the fold and appends
    AppendLog.append(spark, root, Seq((3L, "new")).toDF("v", "x"))
    assert(!AtomicRewrite.exists(spark, root), "version machinery must be gone")
    val out = AppendLog.read(spark, root).select("x").as[String].collect().toSet
    assert(out == Set("old1", "old2", "new"), s"got $out")
  }

  test("stale-pointer-only state (all version dirs gone) unwedges on append") {
    val root = Files.createTempDirectory("graft-alog-wedge").toString + "/log"
    AtomicRewrite.write(spark, root, Seq((1L, "old")).toDF("v", "x").coalesce(1))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fold completed + every v= dir deleted, but the crash hit before
    // the pointer delete
    val staged = new org.apache.hadoop.fs.Path(root, ".stage")
    AtomicRewrite.read(spark, root).coalesce(1)
      .write.mode("overwrite").parquet(staged.toString)
    f.listStatus(staged).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => f.rename(s.getPath,
        new org.apache.hadoop.fs.Path(root, "legacy.parquet")))
    f.delete(staged, true)
    f.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.getPath.getName.startsWith("v="))
      .foreach(s => f.delete(s.getPath, true))
    assert(AtomicRewrite.exists(spark, root), "pointer still present")

    AppendLog.append(spark, root, Seq((2L, "new")).toDF("v", "x"))
    assert(!AtomicRewrite.exists(spark, root))
    val out = AppendLog.read(spark, root).select("x").as[String].collect().toSet
    assert(out == Set("old", "new"), s"legacy rows must survive the wedge: $out")
  }
}
