package graft.domain

import graft.SparkSpec
import graft.pipeline.{Gdpr, Medallion, Scd2}
import graft.tx.AtomicRewrite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files
import java.sql.Timestamp

/** Domain-layer tests: each reference DQ flag fires on a crafted noisy row
  * (FIXTURES.md noise model) and stays quiet on a clean one; the gold
  * builders reproduce the reference's aggregate semantics; GDPR policies
  * redact the exact columns. */
class MobilityDomainSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def applyConf(conf: Medallion.SilverConf, df: DataFrame): DataFrame =
    conf.flags.foldLeft(conf.clean(df)) { case (d, (n, e)) => d.withColumn(n, e) }

  test("trips flags: distance-in-wrong-status, outlier, time weirdness") {
    val df = Seq(
      // clean completed trip
      (1L, "completed", Some(5.0), Some(5.5), Some("2024-01-01 10:00:00"),
        Some("2024-01-01 10:01:00"), Some("2024-01-01 10:05:00"), Some("2024-01-01 10:30:00")),
      // requested trip with a distance (wrong status) + outlier diff
      (2L, "requested", Some(1.0), Some(20.0), Some("2024-01-01 11:00:00"),
        None, None, None),
      // completed without ended_at; accepted before requested
      (3L, "Completed", Some(2.0), None, Some("2024-01-01 12:00:00"),
        Some("2024-01-01 11:59:00"), None, None),
      // completed with a 19 km diff -> outlier (only completed trips can
      // be outliers per the reference: distance_diff_km is NULL otherwise)
      (4L, "completed", Some(1.0), Some(20.0), Some("2024-01-01 13:00:00"),
        Some("2024-01-01 13:01:00"), Some("2024-01-01 13:05:00"), Some("2024-01-01 13:40:00")))
      .toDF("trip_id", "status", "estimated_distance_km", "actual_distance_km",
        "requested_at", "accepted_at", "started_at", "ended_at")
      .select(col("trip_id"), col("status"), col("estimated_distance_km"),
        col("actual_distance_km"),
        to_timestamp(col("requested_at")).as("requested_at"),
        to_timestamp(col("accepted_at")).as("accepted_at"),
        to_timestamp(col("started_at")).as("started_at"),
        to_timestamp(col("ended_at")).as("ended_at"))
      .withColumn("passenger_id", lit(1L)).withColumn("driver_id", lit(1L))
      .withColumn("vehicle_id", lit(1L)).withColumn("pickup_zone_id", lit(1L))
      .withColumn("dropoff_zone_id", lit(1L))
      .withColumn("start_lat", lit(0.0)).withColumn("start_lng", lit(0.0))
      .withColumn("end_lat", lit(0.0)).withColumn("end_lng", lit(0.0))
      .withColumn("canceled_at", lit(null).cast("timestamp"))
      .withColumn("cancel_reason", lit(null).cast("string"))
      .withColumn("cancel_by", lit(null).cast("string"))
      .withColumn("cancel_note", lit(" NULL "))
      .withColumn("fare_amount", lit(-3.0))

    val out = applyConf(MobilityDomain.trips, df)
      .select("trip_id", "status", "cancel_note", "fare_amount",
        "has_distance_in_invalid_status", "is_distance_outlier",
        "completed_but_ended_at_null", "accepted_before_requested")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getString(1) == "completed")
    assert(out(1L).isNullAt(2), "null-like cancel_note scrubbed")
    assert(out(1L).isNullAt(3), "negative fare -> NULL")
    assert(!out(1L).getBoolean(4) && !out(1L).getBoolean(5))
    assert(out(2L).getBoolean(4), "distance in requested status")
    assert(!out(2L).getBoolean(5), "non-completed trip is never an outlier (ref formula)")
    assert(out(3L).getBoolean(4), "completed with NULL distance (ref second branch)")
    assert(out(3L).getBoolean(6), "completed but no ended_at (case-normalized)")
    assert(out(3L).getBoolean(7), "accepted before requested")
    assert(out(4L).getBoolean(5), "completed with 19km diff -> outlier")
    assert(!out(4L).getBoolean(4) && !out(4L).getBoolean(6))
  }

  test("passenger/driver/vehicle/payment/rating/zone flags fire correctly") {
    val p = applyConf(MobilityDomain.passengers,
      Seq((1L, "Ann", "ANN@x.com ", "123", "NYC"), (2L, "N/A", "not-an-email", null, "-"))
        .toDF("passenger_id", "full_name", "email", "phone", "city")
        .withColumn("is_deleted", lit(false))
        .withColumn("deleted_at", lit(null).cast("timestamp")))
      .select("passenger_id", "email", "missing_full_name", "missing_phone",
        "invalid_email_format")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getString(1) == "ann@x.com") // lower + trim via scrub
    assert(!p(1L).getBoolean(4))
    assert(p(2L).getBoolean(2), "N/A name scrubbed to null")
    assert(p(2L).getBoolean(3) && p(2L).getBoolean(4))

    val d = applyConf(MobilityDomain.drivers,
      Seq((1L, "Bob", "L1", " ACTIVE "), (2L, null, null, "retired"))
        .toDF("driver_id", "full_name", "license_number", "status")
        .withColumn("is_deleted", lit(false))
        .withColumn("deleted_at", lit(null).cast("timestamp")))
      .select("driver_id", "status", "missing_license_number", "invalid_status")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(d(1L).getString(1) == "active" && !d(1L).getBoolean(3))
    assert(d(2L).getBoolean(2) && d(2L).getBoolean(3))

    val v = applyConf(MobilityDomain.vehicles,
      Seq((1L, Some(9L), "ab-123", "Sedan", 2020), (2L, None, null, "tank", 1900))
        .toDF("vehicle_id", "driver_id", "plate_number", "vehicle_type", "year")
        .withColumn("make", lit("m")).withColumn("model", lit("m"))
        .withColumn("status", lit("active"))
        .withColumn("is_deleted", lit(false))
        .withColumn("deleted_at", lit(null).cast("timestamp")))
      .select("vehicle_id", "plate_number", "invalid_vehicle_type",
        "missing_driver_id", "invalid_year")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(v(1L).getString(1) == "AB-123" && !v(1L).getBoolean(2))
    assert(v(2L).getBoolean(2) && v(2L).getBoolean(3) && v(2L).getBoolean(4))

    val pay = applyConf(MobilityDomain.payments,
      Seq((1L, 10L, "CARD", "Paid", Some(12.5), "usd", None: Option[String], None: Option[String]),
        (2L, 11L, "cash", "pending", Some(-5.0), "DOLLARS", Some("gw_1"), Some("2024-01-01 10:00:00")))
        .toDF("payment_id", "trip_id", "method", "status", "amount",
          "currency", "provider_ref", "paid_at")
        .withColumn("paid_at", to_timestamp(col("paid_at"))))
      .select("payment_id", "method", "currency", "amount_invalid",
        "currency_invalid", "paid_but_paid_at_null", "pending_but_paid_at_not_null")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(pay(1L).getString(1) == "card" && pay(1L).getString(2) == "USD")
    assert(pay(1L).getBoolean(5), "paid-like status without paid_at")
    assert(pay(2L).getBoolean(3), "negative amount -> invalid")
    assert(pay(2L).getBoolean(4), "len!=3 currency -> invalid")
    assert(pay(2L).getBoolean(6), "pending with paid_at")

    val r = applyConf(MobilityDomain.ratings,
      Seq((1L, 1L, 1L, 1L, 5, Some("nice")), (2L, 2L, 1L, 1L, 9, None))
        .toDF("rating_id", "trip_id", "passenger_id", "driver_id", "score", "comment"))
      .select("rating_id", "score_invalid", "comment_missing")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r(1L).getBoolean(1))
    assert(r(2L).getBoolean(1), "score 9 -> out of range -> invalid")
    assert(r(2L).getBoolean(2))

    val z = applyConf(MobilityDomain.zones,
      Seq((1L, "Centro", "CDMX", "MX"), (2L, "null", null, "  "))
        .toDF("zone_id", "zone_name", "city", "region"))
      .select("zone_id", "zone_name_norm", "has_missing_fields")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(z(1L).getString(1) == "Centro" && !z(1L).getBoolean(2))
    assert(z(2L).getBoolean(2))
  }

  test("agg_trips_daily status sets and agg_driver_daily distinct counts") {
    val fact = Seq(
      (1L, "completed", 101L, 1L, Some(10.0), Some(3.0)),
      (2L, "done", 101L, 1L, Some(20.0), None),
      (3L, "canceled", 101L, 2L, None, None),
      (4L, "requested", 102L, 1L, None, None))
      .toDF("trip_id", "status", "passenger_id", "driver_id", "fare_amount",
        "actual_distance_km")
      .withColumn("date_key", lit(20240101))
      .withColumn("raw_loaded_at", to_timestamp(lit("2024-01-01 12:00:00")))

    val daily = fact.groupBy("date_key").agg(
      MobilityDomain.aggTripsDaily.head, MobilityDomain.aggTripsDaily.tail: _*)
      .collect()(0)
    assert(daily.getAs[Long]("trips_total") == 4)
    assert(daily.getAs[Long]("trips_completed") == 2) // completed + done
    assert(daily.getAs[Long]("trips_cancelled") == 1)
    assert(daily.getAs[Long]("trips_active") == 1)
    assert(daily.getAs[Double]("sum_fare_amount") == 30.0)

    val drv = MobilityDomain.aggDriverDaily(fact)
      .filter(col("driver_id") === 1L).collect()(0)
    assert(drv.getAs[Long]("trips_count") == 3)
    assert(drv.getAs[Long]("unique_passengers") == 2) // 101, 102
    assert(drv.getAs[Long]("completed_trips") == 2)
  }

  test("dim_payment_method: UNKNOWN row plus keyed methods") {
    val silver = Seq(("cash", true), ("card", true), ("wallet", true))
      .toDF("method", "is_current")
      .withColumn("raw_loaded_at", to_timestamp(lit("2024-01-01 00:00:00")))
    val dim = MobilityDomain.dimPaymentMethod(silver).collect()
    assert(dim.length == 4)
    val byName = dim.map(r => r.getAs[String]("payment_method_name") -> r).toMap
    assert(byName("UNKNOWN").getAs[Int]("payment_method_key") == 0)
    assert(byName("cash").getAs[Boolean]("is_cash"))
    assert(byName("card").getAs[Boolean]("is_card"))
    assert(dim.map(_.getAs[Int]("payment_method_key")).distinct.length == 4)
  }

  test("GDPR: vehicle plate anonymization and rating comment scrub") {
    val root = Files.createTempDirectory("graft-dom").toString
    val vehicles = Scd2.prepare(
      MobilityDomain.vehicles.clean(
        Seq((1L, Some(5L), "AB-123", "sedan", 2020), (2L, Some(6L), "CD-456", "sedan", 2021))
          .toDF("vehicle_id", "driver_id", "plate_number", "vehicle_type", "year")
          .withColumn("make", lit("m")).withColumn("model", lit("m"))
          .withColumn("status", lit("active"))
          .withColumn("is_deleted", lit(false))
          .withColumn("deleted_at", lit(null).cast("timestamp"))
          .withColumn("raw_loaded_at", to_timestamp(lit("2024-01-01 00:00:00")))),
      MobilityDomain.vehicles.businessCols, "raw_loaded_at")
    AtomicRewrite.write(spark, s"$root/silver/vehicles", vehicles)

    Gdpr.propagate(spark, Seq(1L).toDF("id"), "vehicle",
      MobilityDomain.vehiclePolicies(Seq("silver/vehicles")),
      t => s"$root/$t", s"$root/audit", "graft-mobility-salt",
      ts("2024-02-01 00:00:00"))

    val plates = AtomicRewrite.read(spark, s"$root/silver/vehicles")
      .select("vehicle_id", "plate_number").as[(Long, String)].collect().toMap
    assert(plates(1L) == "ANON-PLATE-1")
    assert(plates(2L) == "CD-456")
  }
}
