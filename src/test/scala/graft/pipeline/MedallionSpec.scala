package graft.pipeline

import graft.SparkSpec
import graft.tx.{AtomicRewrite, Watermarks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end medallion test: two incremental micro-batches through
  * bronze → silver SCD2 → gold dims/fact/agg, then GDPR propagation and
  * retention — the reference's whole lifecycle on synthetic rows. */
class MedallionSpec extends SparkSpec {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-e2e").toString
  private val paths = Medallion.Paths(root)
  private def ts(s: String) = Timestamp.valueOf(s)

  private val custConf = Medallion.SilverConf(
    entity = "customer", keys = Seq("id"),
    businessCols = Seq("name", "segment"),
    flags = Seq("missing_name" -> col("name").isNull))

  private def customers(rows: (Long, String, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "name", "segment", "updated_at")
      .withColumn("updated_at", to_timestamp(col("updated_at")))

  private def orders(rows: (Long, Long, Double, String)*): DataFrame =
    rows.toSeq.toDF("oid", "cust_id", "price", "odate")
      .withColumn("odate", to_timestamp(col("odate")))

  private val ordConf = Medallion.SilverConf(
    entity = "orders", keys = Seq("oid"),
    businessCols = Seq("cust_id", "price"))

  private def runGold(now: Timestamp): Unit = {
    Medallion.goldScd1Snapshot(spark, paths, "customer", Seq("id"), now)
    Medallion.goldScd3(spark, paths, "customer", "id", Seq("segment"), now)
    Medallion.goldFact(spark, paths, "fact_orders", "orders",
      keys = Seq("oid"), dateKeyFrom = Seq("odate"),
      dimKeys = Map("cust_id" -> ("customer", "id")), now = now)
    Medallion.goldAggDaily(spark, paths, "fact_orders", "agg_daily",
      Seq(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(38,6)")).cast("double").as("sum_price")))
  }

  test("batch 1: full load lands in every layer") {
    val now = ts("2024-01-01 10:00:00")
    Medallion.bronzeLoad(spark, paths, "customer",
      customers((1L, "alice", "A", "2024-01-01 00:00:00"),
        (2L, "bob", "B", "2024-01-01 00:00:00")),
      "updated_at", "b1", now)
    Medallion.bronzeLoad(spark, paths, "orders",
      orders((10L, 1L, 100.0, "2024-01-01 05:00:00"),
        (11L, 2L, 50.0, "2024-01-01 06:00:00"),
        (12L, 9L, 10.0, "2024-01-01 06:30:00")), // unknown customer 9
      "odate", "b1", now)
    Medallion.silverScd2(spark, paths, custConf, now)
    Medallion.silverScd2(spark, paths, ordConf, now)
    runGold(now)

    val silver = AtomicRewrite.read(spark, paths.silver("customer"))
    assert(silver.count() == 2 && silver.filter(col("is_current")).count() == 2)
    val fact = AtomicRewrite.read(spark, paths.gold("fact_orders"))
    assert(fact.count() == 3)
    // key validation: unknown customer 9 → key 0
    val k = fact.select("oid", "cust_id_key").as[(Long, Long)].collect().toMap
    assert(k(10L) == 1L && k(11L) == 2L && k(12L) == 0L)
    val agg = AtomicRewrite.read(spark, paths.gold("agg_daily"))
    assert(agg.select("n").as[Long].collect().toSeq == Seq(3L))
  }

  test("batch 2: incremental update versions SCD2, repoints SCD3, patches agg") {
    val now = ts("2024-01-02 10:00:00")
    // alice changes segment; carol is new; bob unchanged (not re-sent)
    Medallion.bronzeLoad(spark, paths, "customer",
      customers((1L, "alice", "A2", "2024-01-02 00:00:00"),
        (3L, "carol", "C", "2024-01-02 00:00:00")),
      "updated_at", "b2", now)
    Medallion.bronzeLoad(spark, paths, "orders",
      orders((13L, 3L, 70.0, "2024-01-02 04:00:00")), "odate", "b2", now)
    Medallion.silverScd2(spark, paths, custConf, now)
    Medallion.silverScd2(spark, paths, ordConf, now)
    runGold(now)

    val silver = AtomicRewrite.read(spark, paths.silver("customer"))
    assert(silver.count() == 4) // alice v1 closed + v2, bob, carol
    assert(silver.filter(col("is_current")).count() == 3)
    val aliceClosed = silver.filter(col("id") === 1 && !col("is_current"))
    assert(aliceClosed.select("valid_to").as[Timestamp].head() == now)
    // SCD3 prev column captures the superseded segment
    val scd3 = AtomicRewrite.read(spark, paths.gold("dim_customer_scd3"))
    val alice = scd3.filter(col("id") === 1)
      .select("segment", "prev_segment").as[(String, String)].head()
    assert(alice == (("A2", "A")))
    // snapshot dim follows the new version
    val snap = AtomicRewrite.read(spark, paths.gold("dim_customer_snapshot"))
    assert(snap.filter(col("id") === 1).select("segment").as[String].head() == "A2")
    // agg gains the new day only (affected-partition recompute)
    val agg = AtomicRewrite.read(spark, paths.gold("agg_daily"))
      .select("date_key", "n").as[(Int, Long)].collect().toMap
    assert(agg == Map(20240101 -> 3L, 20240102 -> 1L))
  }

  test("replaying a batch is a watermark-guarded no-op") {
    val now = ts("2024-01-03 10:00:00")
    val n = Medallion.bronzeLoad(spark, paths, "customer",
      customers((1L, "alice", "A2", "2024-01-02 00:00:00")),
      "updated_at", "b3", now)
    assert(n == 0L) // updated_at not newer than watermark
    assert(Medallion.silverScd2(spark, paths, custConf, now) == 0L)
    assert(AtomicRewrite.read(spark, paths.silver("customer")).count() == 4)
  }

  test("GDPR erasure redacts every version and writes a salted audit trail") {
    val now = ts("2024-01-04 10:00:00")
    val subjects = Seq(1L).toDF("id")
    val policies = Seq(
      Gdpr.Policy("silver/customer", "id",
        Map("name" -> (_ => Gdpr.pseudonym("s", "customer", col("id"))))),
      Gdpr.Policy("gold/dim_customer_snapshot", "id",
        Map("name" -> (_ => Gdpr.pseudonym("s", "customer", col("id"))))),
      Gdpr.Policy("gold/dim_customer_scd3", "id",
        Map("name" -> (_ => Gdpr.pseudonym("s", "customer", col("id"))))))
    val audit = Gdpr.propagate(spark, subjects, "customer", policies,
      t => s"$root/$t", s"$root/control/gdpr_audit", "s", now)
    assert(audit.count() == 3)
    // every alice version (current AND closed history) is redacted
    val names = AtomicRewrite.read(spark, paths.silver("customer"))
      .filter(col("id") === 1).select("name").as[String].collect()
    assert(names.length == 2 && names.forall(_.startsWith("ANON-")))
    // bob untouched
    val bob = AtomicRewrite.read(spark, paths.silver("customer"))
      .filter(col("id") === 2).select("name").as[String].head()
    assert(bob == "bob")
    // audit has no raw ids, only fingerprints
    val fp = Gdpr.readAudit(spark, s"$root/control/gdpr_audit")
      .select("subject_fingerprint").as[String].head()
    assert(fp.length == 64)
  }

  test("retention trims closed history only, never current rows") {
    val now = ts("2025-06-01 00:00:00")
    val dropped = Retention.trim(spark, paths.silver("customer"),
      "valid_from", days = 365, asOf = now, onlyClosed = true)
    assert(dropped == 1L) // alice v1 (closed 2024-01-02) expires
    val left = AtomicRewrite.read(spark, paths.silver("customer"))
    assert(left.count() == 3 && left.filter(col("is_current")).count() == 3)
  }

  test("hist dim lagging several silver batches keeps every intermediate version") {
    val r2 = Files.createTempDirectory("graft-hist-lag").toString
    val p2 = Medallion.Paths(r2)
    def silverRows(rows: (Long, String, String, Option[String], Boolean)*) =
      rows.toSeq.toDF("id", "v", "valid_from", "valid_to", "is_current")
        .withColumn("raw_loaded_at", to_timestamp(col("valid_from")))
        .withColumn("valid_from", to_timestamp(col("valid_from")))
        .withColumn("valid_to", to_timestamp(col("valid_to")))
        .withColumn("scd_hash", sha2(col("v"), 256))

    // batch 1: two keys, one version each -> hist seeded
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "a1", "2024-01-01 00:00:00", None, true),
      (2L, "b1", "2024-01-01 00:00:00", None, true)))
    Medallion.goldScd2Hist(spark, p2, "e", Seq("id"), ts("2024-01-01 10:00:00"))

    // TWO more silver batches land before the hist job runs again:
    // key 1 goes a1 -> a2 -> a3 (a2 is an intermediate closed version)
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "a1", "2024-01-01 00:00:00", Some("2024-01-02 00:00:00"), false),
      (1L, "a2", "2024-01-02 00:00:00", Some("2024-01-03 00:00:00"), false),
      (1L, "a3", "2024-01-03 00:00:00", None, true),
      (2L, "b1", "2024-01-01 00:00:00", None, true)))
    Medallion.goldScd2Hist(spark, p2, "e", Seq("id"), ts("2024-01-03 10:00:00"))

    val hist = AtomicRewrite.read(spark, p2.gold("dim_e_hist"))
    val k1 = hist.filter(col("id") === 1L).orderBy("valid_from").collect()
    assert(k1.length == 3, "intermediate version a2 must survive the lagged merge")
    assert(k1.map(_.getAs[String]("v")).toSeq == Seq("a1", "a2", "a3"))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
    assert(k1(0).getAs[Timestamp]("valid_to") == ts("2024-01-02 00:00:00"))
    // untouched key 2 passes through with its batch-1 dwh stamp
    val k2 = hist.filter(col("id") === 2L).collect()
    assert(k2.length == 1 &&
      k2(0).getAs[Timestamp]("dwh_loaded_at") == ts("2024-01-01 10:00:00"))
  }

  test("SCD3 prev is carried through the merge: survives trims, sees intermediates") {
    val r2 = Files.createTempDirectory("graft-scd3-merge").toString
    val p2 = Medallion.Paths(r2)
    def silverRows(rows: (Long, String, String, Boolean)*) =
      rows.toSeq.toDF("id", "segment", "valid_from", "is_current")
        .withColumn("raw_loaded_at", to_timestamp(col("valid_from")))
        .withColumn("valid_from", to_timestamp(col("valid_from")))
        .withColumn("scd_hash", sha2(col("segment"), 256))

    // batch 1: single version -> prev NULL
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "A", "2024-01-01 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-01-01 10:00:00"))
    val dim = p2.gold("dim_e_scd3")
    assert(AtomicRewrite.read(spark, dim).select("segment", "prev_segment")
      .as[(String, Option[String])].head() == (("A", None)))

    // batch 2: retention trimmed EVERYTHING but the new current version —
    // a rank-2 recompute would NULL prev; the merge carries the dim's
    // superseded current value
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "B", "2024-02-01 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-02-01 10:00:00"))
    assert(AtomicRewrite.read(spark, dim).select("segment", "prev_segment")
      .as[(String, String)].head() == (("B", "A")),
      "prev must come from the dim's old current, not trimmed silver history")

    // batch 3: the dim lagged TWO silver versions (C then D) — prev is the
    // batch's own intermediate C, not the dim's stale B
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "C", "2024-03-01 00:00:00", false),
      (1L, "D", "2024-03-02 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-03-02 10:00:00"))
    assert(AtomicRewrite.read(spark, dim).select("segment", "prev_segment")
      .as[(String, String)].head() == (("D", "C")))

    // replaying batch 3 is a no-op (nothing newer than the watermark)
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-03-03 10:00:00"))
    assert(AtomicRewrite.read(spark, dim).select("segment", "prev_segment")
      .as[(String, String)].head() == (("D", "C")))
    // new key inserts with NULL prev alongside the existing one
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "C", "2024-03-01 00:00:00", false),
      (1L, "D", "2024-03-02 00:00:00", true),
      (2L, "X", "2024-03-04 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-03-04 10:00:00"))
    val rows = AtomicRewrite.read(spark, dim)
      .select("id", "segment", "prev_segment")
      .as[(Long, String, Option[String])].collect().toSet
    assert(rows == Set((1L, "D", Some("C")), (2L, "X", None)))

    // oscillation D→E→D': the new current hashes EQUAL to the dim's
    // current — the merge must still advance the row and record E as
    // prev (a newer-AND-changed guard would strand the key forever)
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, "E", "2024-04-01 00:00:00", false),
      (1L, "D", "2024-04-02 00:00:00", true),
      (2L, "X", "2024-03-04 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-04-02 10:00:00"))
    val osc = AtomicRewrite.read(spark, dim).filter(col("id") === 1L)
      .select("segment", "prev_segment", "raw_loaded_at")
      .as[(String, String, Timestamp)].head()
    assert(osc._1 == "D" && osc._2 == "E", s"got $osc")
    assert(osc._3 == ts("2024-04-02 00:00:00"),
      "watermark must advance past the oscillating batch")
  }

  test("SCD3 prev records an intermediate's legitimate NULL, not the stale current") {
    // the prev-carry must gate on the intermediate ROW's presence: a batch
    // carrying an intermediate version whose tracked column is NULL must
    // record prev = NULL (what a rank-2 bootstrap would derive), not fall
    // through a value-coalesce to the dim's old current value
    val r2 = Files.createTempDirectory("graft-scd3-nullint").toString
    val p2 = Medallion.Paths(r2)
    def silverRows(rows: (Long, Option[String], String, Boolean)*) =
      rows.toSeq.toDF("id", "segment", "valid_from", "is_current")
        .withColumn("raw_loaded_at", to_timestamp(col("valid_from")))
        .withColumn("valid_from", to_timestamp(col("valid_from")))
        .withColumn("scd_hash", sha2(coalesce(col("segment"), lit(" ")), 256))
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, Some("A"), "2024-01-01 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-01-01 10:00:00"))
    val dim = p2.gold("dim_e_scd3")
    // dim lags two versions: intermediate with NULL segment, then B
    AtomicRewrite.write(spark, p2.silver("e"), silverRows(
      (1L, None, "2024-02-01 00:00:00", false),
      (1L, Some("B"), "2024-02-02 00:00:00", true)))
    Medallion.goldScd3(spark, p2, "e", "id", Seq("segment"), ts("2024-02-02 10:00:00"))
    val got = AtomicRewrite.read(spark, dim)
      .select("segment", "prev_segment").as[(String, Option[String])].head()
    assert(got == (("B", None)),
      s"prev must be the intermediate's NULL, not the stale current: $got")
  }

  test("retention never deletes rows with a NULL timestamp") {
    val r2 = Files.createTempDirectory("graft-ret-null").toString + "/t"
    val t = Seq((1L, Some("2020-01-01 00:00:00")), (2L, None), (3L, Some("2025-01-01 00:00:00")))
      .toDF("id", "paid_at").withColumn("paid_at", to_timestamp(col("paid_at")))
    AtomicRewrite.write(spark, r2, t)
    val dropped = Retention.trim(spark, r2, "paid_at", days = 30,
      asOf = ts("2025-01-15 00:00:00"))
    assert(dropped == 1L) // only id=1 expired; NULL-ts id=2 kept
    val left = AtomicRewrite.read(spark, r2).select("id").as[Long].collect().toSet
    assert(left == Set(2L, 3L))
  }

  test("GDPR audit records only tables that exist; no-table run writes no audit") {
    val r2 = Files.createTempDirectory("graft-gdpr-audit").toString
    val now = ts("2024-01-01 00:00:00")
    // none of the policy tables exist → no rewrite, no audit rows, and the
    // audit table itself must not be created
    val audit = Gdpr.propagate(spark, Seq(1L).toDF("id"), "customer",
      Seq(Gdpr.Policy("silver/ghost", "id", Map("name" -> (_ => lit(null).cast("string"))))),
      t => s"$r2/$t", s"$r2/audit", "s", now)
    assert(audit.isEmpty)
    assert(!Gdpr.auditExists(spark, s"$r2/audit"))
    // one real table + one ghost → audit rows only for the real one
    AtomicRewrite.write(spark, s"$r2/silver/real",
      Seq((1L, "x")).toDF("id", "name"))
    val audit2 = Gdpr.propagate(spark, Seq(1L).toDF("id"), "customer",
      Seq(
        Gdpr.Policy("silver/real", "id", Map("name" -> (_ => lit(null).cast("string")))),
        Gdpr.Policy("silver/ghost", "id", Map("name" -> (_ => lit(null).cast("string"))))),
      t => s"$r2/$t", s"$r2/audit", "s", now)
    assert(audit2.select("table_name").as[String].collect().toSeq == Seq("silver/real"))
  }
}
