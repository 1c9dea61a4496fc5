package graft.domain

import graft.SparkSpec
import graft.ops.DateKeys
import graft.pipeline.{Gdpr, Medallion, Retention}
import graft.tx.AtomicRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Full-domain end-to-end: all 7 reference entities through bronze →
  * silver SCD2 → gold star (snapshot/hist/SCD3 dims, dim_payment_method,
  * fact_trips with 5-key validation, agg_trips_daily, agg_driver_daily),
  * an incremental second batch, GDPR passenger erasure across every layer
  * (history and prev_* included), and bronze partition retention — the
  * FIXTURES.md §5 scenario. */
class MobilityE2ESpec extends SparkSpec {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-mob-e2e").toString
  private val paths = Medallion.Paths(root)
  private def ts(s: String) = Timestamp.valueOf(s)
  private def t(s: String) = to_timestamp(lit(s))

  private def withAudit(df: DataFrame, created: String): DataFrame =
    df.withColumn("created_at", t(created)).withColumn("updated_at", t(created))

  private def loadAll(dfs: Map[String, DataFrame], batch: String,
                      now: Timestamp): Unit = {
    dfs.foreach { case (entity, df) =>
      Medallion.bronzeLoad(spark, paths, entity, df,
        MobilityDomain.watermarkCol(entity), batch, now)
    }
    MobilityDomain.silverConfs
      .filter(c => dfs.contains(c.entity))
      .foreach(c => Medallion.silverScd2(spark, paths, c, now))
  }

  private def buildGold(now: Timestamp): Unit = {
    Seq(("passengers", "passenger_id"), ("drivers", "driver_id"),
      ("vehicles", "vehicle_id"), ("zones", "zone_id")).foreach {
      case (e, k) => Medallion.goldScd1Snapshot(spark, paths, e, Seq(k), now)
    }
    Medallion.goldScd2Hist(spark, paths, "passengers", Seq("passenger_id"), now)
    Medallion.goldScd3(spark, paths, "passengers", "passenger_id",
      Seq("full_name", "email", "phone", "city"), now)
    // STATIC dim (reference static/dim_payment.py): built once, not per
    // batch — late-arriving methods must go through validation-to-0
    if (!AtomicRewrite.exists(spark, paths.gold("dim_payment_method")))
      MobilityDomain.buildDimPaymentMethod(spark, paths)
    MobilityDomain.buildDimZone(spark, paths, now)
    Medallion.goldFact(spark, paths, "fact_trips", "trips",
      keys = Seq("trip_id"), dateKeyFrom = Seq("requested_at"),
      dimKeys = Map(
        "passenger_id" -> ("passengers", "passenger_id"),
        "driver_id" -> ("drivers", "driver_id"),
        "vehicle_id" -> ("vehicles", "vehicle_id"),
        "pickup_zone_id" -> ("zones", "zone_id"),
        "dropoff_zone_id" -> ("zones", "zone_id")), now = now)
    MobilityDomain.factPayments(spark, paths, now)
    Medallion.goldAggDaily(spark, paths, "fact_trips", "agg_trips_daily",
      MobilityDomain.aggTripsDaily)
    MobilityDomain.goldAggDriverDaily(spark, paths)
  }

  test("batch 1: seven entities land across all layers with key validation") {
    val now = ts("2024-03-01 08:00:00")
    loadAll(Map(
      "passengers" -> withAudit(Seq(
        (1L, "Alice A", "alice@x.com", "111", "Metropolis", false),
        (2L, "Bob B", "bob@x.com", "222", "Gotham", false))
        .toDF("passenger_id", "full_name", "email", "phone", "city", "is_deleted")
        .withColumn("deleted_at", lit(null).cast("timestamp")), "2024-03-01 00:00:00"),
      "drivers" -> withAudit(Seq((10L, "Dan D", "LIC-1", "active", false))
        .toDF("driver_id", "full_name", "license_number", "status", "is_deleted")
        .withColumn("deleted_at", lit(null).cast("timestamp")), "2024-03-01 00:00:00"),
      "vehicles" -> withAudit(Seq(
        (20L, 10L, "xy-987", "sedan", "mk", "md", 2019, "active", false))
        .toDF("vehicle_id", "driver_id", "plate_number", "vehicle_type",
          "make", "model", "year", "status", "is_deleted")
        .withColumn("deleted_at", lit(null).cast("timestamp")), "2024-03-01 00:00:00"),
      "zones" -> Seq((30L, "Center", "Metropolis", "North"),
        (31L, "Docks", "Gotham", "South"))
        .toDF("zone_id", "zone_name", "city", "region")
        .withColumn("created_at", t("2024-03-01 00:00:00")),
      "trips" -> withAudit(Seq(
        // completed clean trip, zones known
        (100L, 1L, Some(10L), Some(20L), Some(30L), Some(31L), "completed",
          "2024-03-01 07:00:00", Some("2024-03-01 07:30:00"), Some(4.0), Some(12.5)),
        // requested trip, unknown dropoff zone 99 -> key 0
        (101L, 2L, None, None, Some(30L), Some(99L), "requested",
          "2024-03-01 07:10:00", None, None, None))
        .toDF("trip_id", "passenger_id", "driver_id", "vehicle_id",
          "pickup_zone_id", "dropoff_zone_id", "status", "requested_at",
          "ended_at", "actual_distance_km", "fare_amount")
        .withColumn("requested_at", to_timestamp(col("requested_at")))
        .withColumn("ended_at", to_timestamp(col("ended_at")))
        .withColumn("accepted_at", col("requested_at"))
        .withColumn("started_at", col("requested_at"))
        .withColumn("canceled_at", lit(null).cast("timestamp"))
        .withColumn("cancel_reason", lit(null).cast("string"))
        .withColumn("cancel_by", lit(null).cast("string"))
        .withColumn("cancel_note", lit("driver took a weird detour to Alice's office"))
        .withColumn("estimated_distance_km", lit(5.0))
        .withColumn("start_lat", lit(0.0)).withColumn("start_lng", lit(0.0))
        .withColumn("end_lat", lit(0.0)).withColumn("end_lng", lit(0.0)),
        "2024-03-01 00:00:00"),
      "payments" -> withAudit(Seq(
        (200L, 100L, "card", "paid", 12.5, "usd", Some("gw_abc"), Some("2024-03-01 07:31:00")))
        .toDF("payment_id", "trip_id", "method", "status", "amount",
          "currency", "provider_ref", "paid_at")
        .withColumn("paid_at", to_timestamp(col("paid_at"))), "2024-03-01 00:00:00"),
      "ratings" -> withAudit(Seq(
        (300L, 100L, 1L, 10L, 5, Some("great ride, alice@x.com")))
        .toDF("rating_id", "trip_id", "passenger_id", "driver_id", "score", "comment"),
        "2024-03-01 00:00:00")), "b1", now)
    buildGold(now)

    val fact = AtomicRewrite.read(spark, paths.gold("fact_trips"))
    val keys = fact.select("trip_id", "passenger_id_key", "driver_id_key",
      "vehicle_id_key", "pickup_zone_id_key", "dropoff_zone_id_key")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(keys(100L).getLong(1) == 1L && keys(100L).getLong(2) == 10L)
    assert(keys(100L).getLong(4) == 30L && keys(100L).getLong(5) == 31L)
    assert(keys(101L).getLong(2) == 0L, "no driver -> key 0")
    assert(keys(101L).getLong(5) == 0L, "unknown zone 99 -> key 0")

    val agg = AtomicRewrite.read(spark, paths.gold("agg_trips_daily")).collect()(0)
    assert(agg.getAs[Int]("date_key") == 20240301)
    assert(agg.getAs[Long]("trips_total") == 2)
    assert(agg.getAs[Long]("trips_completed") == 1)
    assert(agg.getAs[Long]("trips_active") == 1)

    val drv = AtomicRewrite.read(spark, paths.gold("agg_driver_daily"))
      .filter(col("driver_id") === 10L).collect()(0)
    assert(drv.getAs[Long]("trips_count") == 1)
    assert(drv.getAs[Long]("unique_passengers") == 1)

    val pm = AtomicRewrite.read(spark, paths.gold("dim_payment_method"))
    assert(pm.count() == 2) // card + UNKNOWN

    val fp = AtomicRewrite.read(spark, paths.gold("fact_payments")).collect()(0)
    assert(fp.getAs[Int]("payment_method_key") != 0, "card is in the dim")
    assert(fp.getAs[Int]("payment_date_key") == 20240301)

    // dim_zone static rebuild: one conformed row per zone, norm fields
    // carried from silver, dwh stamp applied
    val dz = AtomicRewrite.read(spark, paths.gold("dim_zone")).collect()
      .map(r => r.getAs[Long]("zone_id") -> r).toMap
    assert(dz.size == 2)
    assert(dz(30L).getAs[String]("zone_name_norm") == "Center")
    assert(dz(30L).getAs[Timestamp]("dwh_loaded_at") == now)
  }

  test("batch 2: city change versions passenger across hist and SCD3") {
    val now = ts("2024-03-02 08:00:00")
    loadAll(Map(
      "passengers" -> withAudit(Seq(
        (1L, "Alice A", "alice@x.com", "111", "Star City", false))
        .toDF("passenger_id", "full_name", "email", "phone", "city", "is_deleted")
        .withColumn("deleted_at", lit(null).cast("timestamp")), "2024-03-02 00:00:00"),
      "trips" -> withAudit(Seq(
        (102L, 2L, Some(10L), Some(20L), Some(30L), Some(30L), "completed",
          "2024-03-02 07:00:00", Some("2024-03-02 07:20:00"), Some(2.0), Some(8.0)))
        .toDF("trip_id", "passenger_id", "driver_id", "vehicle_id",
          "pickup_zone_id", "dropoff_zone_id", "status", "requested_at",
          "ended_at", "actual_distance_km", "fare_amount")
        .withColumn("requested_at", to_timestamp(col("requested_at")))
        .withColumn("ended_at", to_timestamp(col("ended_at")))
        .withColumn("accepted_at", col("requested_at"))
        .withColumn("started_at", col("requested_at"))
        .withColumn("canceled_at", lit(null).cast("timestamp"))
        .withColumn("cancel_reason", lit(null).cast("string"))
        .withColumn("cancel_by", lit(null).cast("string"))
        .withColumn("cancel_note", lit(null).cast("string"))
        .withColumn("estimated_distance_km", lit(2.0))
        .withColumn("start_lat", lit(0.0)).withColumn("start_lng", lit(0.0))
        .withColumn("end_lat", lit(0.0)).withColumn("end_lng", lit(0.0)),
        "2024-03-02 00:00:00"),
      // a method the STATIC dim has never seen -> validated to key 0
      "payments" -> withAudit(Seq(
        (201L, 102L, "voucher", "paid", 8.0, "usd",
          Some("gw_def"), Some("2024-03-02 07:21:00")))
        .toDF("payment_id", "trip_id", "method", "status", "amount",
          "currency", "provider_ref", "paid_at")
        .withColumn("paid_at", to_timestamp(col("paid_at"))), "2024-03-02 00:00:00")),
      "b2", now)
    buildGold(now)

    val silver = AtomicRewrite.read(spark, paths.silver("passengers"))
    assert(silver.filter(col("passenger_id") === 1L).count() == 2)
    val scd3 = AtomicRewrite.read(spark, paths.gold("dim_passengers_scd3"))
      .filter(col("passenger_id") === 1L).collect()(0)
    assert(scd3.getAs[String]("city") == "Star City")
    assert(scd3.getAs[String]("prev_city") == "Metropolis")

    // incremental hist merge: alice gains a version; bob's row passes
    // through BYTE-IDENTICAL — his dwh_loaded_at still carries the batch-1
    // stamp (a full-history rewrite would have re-stamped every row)
    val hist = AtomicRewrite.read(spark, paths.gold("dim_passengers_hist"))
    assert(hist.filter(col("passenger_id") === 1L).count() == 2)
    val alice = hist.filter(col("passenger_id") === 1L)
      .orderBy("valid_from").collect()
    assert(!alice(0).getAs[Boolean]("is_current") &&
      alice(1).getAs[Boolean]("is_current"))
    val bob = hist.filter(col("passenger_id") === 2L).collect()
    assert(bob.length == 1 &&
      bob(0).getAs[Timestamp]("dwh_loaded_at") == ts("2024-03-01 08:00:00"))

    // fact_payments: late-arriving 'voucher' method -> surrogate validated
    // to 0 against the static dim; batch-1 'card' row untouched
    val fp = AtomicRewrite.read(spark, paths.gold("fact_payments"))
      .select("payment_id", "payment_method_key").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fp(200L) != 0 && fp(201L) == 0)

    // composite-key incremental aggregate: only the affected
    // (20240302, 10) driver-day is recomputed — the 20240301 slice keeps
    // its batch-1 max_fact_raw_loaded_at watermark untouched
    val drv = AtomicRewrite.read(spark, paths.gold("agg_driver_daily"))
      .filter(col("driver_id") === 10L)
      .select("trip_date_key", "trips_count", "max_fact_raw_loaded_at")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(drv(20240301).getLong(1) == 1 && drv(20240302).getLong(1) == 1)
    assert(drv(20240301).getTimestamp(2) == ts("2024-03-01 08:00:00"))
    assert(drv(20240302).getTimestamp(2) == ts("2024-03-02 08:00:00"))
  }

  test("GDPR: passenger erasure reaches silver history, every dim flavor and scrubs") {
    val now = ts("2024-03-03 08:00:00")
    val dimLayers = Seq("silver/passengers", "gold/dim_passengers_snapshot",
      "gold/dim_passengers_hist")
    val policies = MobilityDomain.passengerPolicies(dimLayers) ++ Seq(
      // SCD3 carries PII in prev_* too (reference scd3 anonymize :448-478)
      Gdpr.Policy("gold/dim_passengers_scd3", "passenger_id", Map(
        "full_name" -> (_ => Gdpr.pseudonym("graft-mobility-salt", "passenger", col("passenger_id"))),
        "email" -> (_ => lit(null).cast("string")),
        "phone" -> (_ => lit(null).cast("string")),
        "city" -> (_ => lit(null).cast("string")),
        "prev_full_name" -> (_ => Gdpr.pseudonym("graft-mobility-salt", "passenger", col("passenger_id"))),
        "prev_email" -> (_ => lit(null).cast("string")),
        "prev_phone" -> (_ => lit(null).cast("string")),
        "prev_city" -> (_ => lit(null).cast("string")))),
    ) ++ MobilityDomain.scrubPolicies

    val audit = Gdpr.propagate(spark, Seq(1L).toDF("id"), "passenger",
      policies, tb => s"$root/$tb", s"$root/control/gdpr_audit",
      "graft-mobility-salt", now)
    assert(audit.count() == policies.size)

    // every silver version of passenger 1 is pseudonymized, bob untouched
    val names = AtomicRewrite.read(spark, paths.silver("passengers"))
      .select("passenger_id", "full_name").as[(Long, String)].collect()
    assert(names.filter(_._1 == 1L).forall(_._2.startsWith("ANON-")))
    assert(names.filter(_._1 == 2L).forall(_._2 == "Bob B"))
    // SCD3 prev_* redacted too
    val scd3 = AtomicRewrite.read(spark, paths.gold("dim_passengers_scd3"))
      .filter(col("passenger_id") === 1L).collect()(0)
    assert(scd3.getAs[String]("full_name").startsWith("ANON-"))
    assert(scd3.getAs[String]("prev_full_name").startsWith("ANON-"))
    assert(scd3.isNullAt(scd3.fieldIndex("prev_city")))
    // scrubs: rating comment + trip cancel_note nulled for passenger 1
    assert(AtomicRewrite.read(spark, paths.silver("ratings"))
      .filter(col("passenger_id") === 1L).select("comment").collect()(0).isNullAt(0))
    assert(AtomicRewrite.read(spark, paths.silver("trips"))
      .filter(col("passenger_id") === 1L).select("cancel_note").collect()(0).isNullAt(0))
    // facts/aggregates unaffected (no PII there)
    assert(AtomicRewrite.read(spark, paths.gold("fact_trips")).count() == 3)

    // payments scrub via derived trip ids: provider_ref of trip 100 nulled
    val n = MobilityDomain.scrubPaymentsForPassengers(spark, Seq(1L).toDF("id"),
      paths.silver("trips"), paths.silver("payments"))
    assert(n == 1L)
    assert(AtomicRewrite.read(spark, paths.silver("payments"))
      .filter(col("trip_id") === 100L).select("provider_ref")
      .collect()(0).isNullAt(0))
  }

  test("bronze retention drops whole expired load_date partitions") {
    val dropped = Retention.trimBronzePartitions(spark,
      paths.bronze("passengers"), days = 30, asOf = ts("2024-06-01 00:00:00"))
    assert(dropped == 2) // both load dates expired
    assert(Retention.trimBronzePartitions(spark,
      paths.bronze("passengers"), 30, ts("2024-06-01 00:00:00")) == 0)
  }
}
