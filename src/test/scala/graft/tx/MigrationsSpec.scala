package graft.tx

import graft.SparkSpec
import graft.pipeline.Scd2
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Schema evolution: a committed pre-SCD2 snapshot is upgraded in place
  * (new version, old readable until vacuum), re-run is a no-op, and the
  * upgraded table immediately works with the SCD2 merge. */
class MigrationsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2Bootstrap backfills SCD2 columns once and the table then merges") {
    val root = Files.createTempDirectory("graft-mig").toString + "/t"
    val legacy = Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "b", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "v", "raw_loaded_at")
    AtomicRewrite.write(spark, root, legacy)

    val added = Migrations.scd2Bootstrap(spark, root, businessCols = Seq("v"))
    assert(added == Seq("scd_hash", "valid_from", "valid_to", "is_current"))
    val up = AtomicRewrite.read(spark, root)
    assert(up.filter(col("is_current")).count() == 2)
    assert(up.filter(col("valid_from") === col("raw_loaded_at")).count() == 2)
    assert(up.select("scd_hash").as[String].head().length == 64)

    // idempotent: nothing missing -> no new snapshot version
    val v = AtomicRewrite.currentVersion(spark, root)
    assert(Migrations.scd2Bootstrap(spark, root, Seq("v")).isEmpty)
    assert(AtomicRewrite.currentVersion(spark, root) == v)

    // the upgraded table immediately participates in the SCD2 merge
    val batch = Scd2.prepare(
      Seq((1L, "a2", Timestamp.valueOf("2024-01-02 00:00:00")))
        .toDF("id", "v", "raw_loaded_at"),
      businessCols = Seq("v"), tsCol = "raw_loaded_at")
    val next = Scd2.apply(AtomicRewrite.read(spark, root), batch,
      Seq("id"), Seq("raw_loaded_at"))
    assert(next.filter(col("id") === 1L).count() == 2)
    assert(next.filter(col("id") === 1L && col("is_current"))
      .select("v").as[String].head() == "a2")

    // missing table -> Nil, not an error
    assert(Migrations.scd2Bootstrap(spark, s"$root-ghost", Seq("v")).isEmpty)
  }
}
