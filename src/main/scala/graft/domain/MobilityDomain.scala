package graft.domain

import graft.ops.Cleansing._
import graft.pipeline.{Gdpr, Medallion}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ride-hailing domain of the reference, as data: per-entity silver
  * configurations (casts, cleaning, the full DQ-flag catalog), gold star
  * builders and GDPR policies — the reference's 30+ job files reduced to
  * configuration over the [[graft.pipeline.Medallion]] templates (the
  * per-entity diffs are config, not code; SURVEY.md §7.1).
  *
  * Flag catalog, status vocabularies and hash-column lists follow the
  * reference exactly: trips flags src/silver/trips_bronze_to_silver.py:222-281,
  * vehicles :205-247 (note: scd_hash EXCLUDES plate_number), payments
  * :210-256 (paid-like = paid/succeeded/success/completed/settled), zones
  * :178-206 (hash over *_norm), aggregate status sets
  * src/gold/_marts/aggregates/agg_trips_daily.py:133-135.
  */
object MobilityDomain {

  private def cast(df: DataFrame, casts: (String, String)*): DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      casts.toMap.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }: _*)

  private def scrub(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, scrubNullLike(col(c))))

  val PaidLike: Seq[String] = Seq("paid", "succeeded", "success", "completed", "settled")
  val VehicleTypes: Seq[String] = Seq("sedan", "hatchback", "motorbike")
  val CompletedSet: Seq[String] = Seq("completed", "complete", "done")
  val CancelledSet: Seq[String] = Seq("cancelled", "canceled")
  val ActiveSet: Seq[String] = Seq("requested", "accepted", "started", "in_progress")

  // ---- silver configurations -------------------------------------------

  val trips: Medallion.SilverConf = Medallion.SilverConf(
    entity = "trips",
    keys = Seq("trip_id"),
    // exact reference hash-column list AND order
    // (trips_bronze_to_silver.py:285-319) — incl. lat/lng, cancel_by and
    // source_system, so a change to any of them opens a new SCD2 version
    businessCols = Seq("passenger_id", "driver_id", "vehicle_id",
      "pickup_zone_id", "dropoff_zone_id", "status", "requested_at",
      "accepted_at", "started_at", "ended_at", "canceled_at",
      "estimated_distance_km", "actual_distance_km",
      "start_lat", "start_lng", "end_lat", "end_lng",
      "cancel_reason", "cancel_by", "fare_amount", "source_system"),
    clean = df => {
      val c1 = cast(df,
        "trip_id" -> "long", "passenger_id" -> "long", "driver_id" -> "long",
        "vehicle_id" -> "long", "pickup_zone_id" -> "long",
        "dropoff_zone_id" -> "long",
        "start_lat" -> "double", "start_lng" -> "double",
        "end_lat" -> "double", "end_lng" -> "double",
        "estimated_distance_km" -> "double", "actual_distance_km" -> "double",
        "fare_amount" -> "double",
        "requested_at" -> "timestamp", "accepted_at" -> "timestamp",
        "started_at" -> "timestamp", "ended_at" -> "timestamp",
        "canceled_at" -> "timestamp")
      scrub(c1, "cancel_note", "cancel_reason", "cancel_by")
        .withColumn("status", normLower(col("status")))
        .withColumn("estimated_distance_km", nonNegativeOrNull(col("estimated_distance_km")))
        .withColumn("actual_distance_km", nonNegativeOrNull(col("actual_distance_km")))
        .withColumn("fare_amount", nonNegativeOrNull(col("fare_amount")))
    },
    // exact reference formulas (trips_bronze_to_silver.py:222-281): every
    // flag is non-NULL (comparisons guarded by isNotNull / when-otherwise),
    // distance flags key on literal 'completed'/'started' statuses, and
    // is_distance_outlier reads the distance_diff_km flag column (flags
    // apply in order, so it is in scope)
    flags = Seq(
      "has_distance_in_invalid_status" ->
        when(col("actual_distance_km").isNotNull &&
          col("actual_distance_km") > 0 &&
          !col("status").isin("completed", "started"), lit(true))
          .when(col("actual_distance_km").isNull &&
            col("status").isin("completed"), lit(true))
          .otherwise(lit(false)),
      "distance_diff_km" ->
        when(col("actual_distance_km").isNotNull &&
          col("estimated_distance_km").isNotNull &&
          col("status") === "completed",
          col("actual_distance_km") - col("estimated_distance_km"))
          .otherwise(lit(null)),
      "is_distance_outlier" ->
        when(col("actual_distance_km").isNotNull &&
          col("estimated_distance_km").isNotNull &&
          abs(col("distance_diff_km")) > 10, lit(true))
          .otherwise(lit(false)),
      "completed_but_ended_at_null" ->
        when(col("status") === "completed" && col("ended_at").isNull, lit(true))
          .otherwise(lit(false)),
      "accepted_before_requested" ->
        (col("accepted_at").isNotNull && col("requested_at").isNotNull &&
          col("accepted_at") < col("requested_at")),
      "started_before_accepted" ->
        (col("started_at").isNotNull && col("accepted_at").isNotNull &&
          col("started_at") < col("accepted_at")),
      "ended_before_started" ->
        (col("ended_at").isNotNull && col("started_at").isNotNull &&
          col("ended_at") < col("started_at"))))

  val passengers: Medallion.SilverConf = Medallion.SilverConf(
    entity = "passengers",
    keys = Seq("passenger_id"),
    businessCols = Seq("full_name", "email", "phone", "city", "is_deleted"),
    clean = df => scrub(
      cast(df, "passenger_id" -> "long", "is_deleted" -> "boolean",
        "deleted_at" -> "timestamp"),
      "full_name", "email", "phone", "city")
      .withColumn("email", lower(col("email"))),
    flags = Seq(
      "missing_full_name" -> col("full_name").isNull,
      "missing_email" -> col("email").isNull,
      "missing_phone" -> col("phone").isNull,
      "invalid_email_format" ->
        (col("email").isNotNull && !validEmail(col("email")))))

  val drivers: Medallion.SilverConf = Medallion.SilverConf(
    entity = "drivers",
    keys = Seq("driver_id"),
    businessCols = Seq("full_name", "license_number", "status", "is_deleted"),
    clean = df => scrub(
      cast(df, "driver_id" -> "long", "is_deleted" -> "boolean",
        "deleted_at" -> "timestamp"),
      "full_name", "license_number")
      .withColumn("status", normLower(col("status"))),
    flags = Seq(
      "missing_full_name" -> col("full_name").isNull,
      "missing_license_number" -> col("license_number").isNull,
      "invalid_status" ->
        (col("status").isNotNull &&
          !col("status").isin("active", "inactive", "suspended"))))

  val vehicles: Medallion.SilverConf = Medallion.SilverConf(
    entity = "vehicles",
    keys = Seq("vehicle_id"),
    // reference quirk preserved: plate_number EXCLUDED from the change hash
    businessCols = Seq("driver_id", "vehicle_type", "make", "model", "year",
      "status", "is_deleted"),
    clean = df => scrub(
      cast(df, "vehicle_id" -> "long", "driver_id" -> "long", "year" -> "int",
        "is_deleted" -> "boolean", "deleted_at" -> "timestamp"),
      "make", "model")
      .withColumn("plate_number", normUpper(col("plate_number")))
      .withColumn("vehicle_type", normLower(col("vehicle_type")))
      .withColumn("status", normLower(col("status"))),
    flags = Seq(
      "missing_plate_number" -> col("plate_number").isNull,
      "missing_vehicle_type" -> col("vehicle_type").isNull,
      "invalid_vehicle_type" ->
        (col("vehicle_type").isNotNull && !col("vehicle_type").isin(VehicleTypes: _*)),
      "missing_driver_id" -> col("driver_id").isNull,
      "invalid_year" ->
        (col("year").isNotNull &&
          (col("year") < 1980 || col("year") > year(current_date()) + 1)),
      "invalid_status" ->
        (col("status").isNotNull && !col("status").isin("active", "inactive"))))

  val payments: Medallion.SilverConf = Medallion.SilverConf(
    entity = "payments",
    keys = Seq("payment_id"),
    businessCols = Seq("trip_id", "method", "status", "amount", "currency",
      "paid_at"),
    clean = df => {
      val c1 = cast(df, "payment_id" -> "long", "trip_id" -> "long",
        "amount" -> "decimal(12,2)", "paid_at" -> "timestamp")
      scrub(c1, "provider_ref")
        .withColumn("method", normLower(col("method")))
        .withColumn("status", normLower(col("status")))
        .withColumn("amount", nonNegativeOrNull(col("amount")))
        .withColumn("currency",
          when(length(normUpper(col("currency"))) === 3, normUpper(col("currency"))))
    },
    flags = Seq(
      "amount_invalid" -> col("amount").isNull,
      "currency_invalid" -> col("currency").isNull,
      "paid_but_paid_at_null" ->
        (col("status").isin(PaidLike: _*) && col("paid_at").isNull),
      "pending_but_paid_at_not_null" ->
        (col("status") === "pending" && col("paid_at").isNotNull),
      "provider_ref_missing" -> col("provider_ref").isNull))

  val ratings: Medallion.SilverConf = Medallion.SilverConf(
    entity = "ratings",
    keys = Seq("rating_id"),
    businessCols = Seq("trip_id", "passenger_id", "driver_id", "score"),
    clean = df => scrub(
      cast(df, "rating_id" -> "long", "trip_id" -> "long",
        "passenger_id" -> "long", "driver_id" -> "long", "score" -> "int"),
      "comment")
      .withColumn("score", inRangeOrNull(col("score"), lit(1), lit(5))),
    flags = Seq(
      "score_invalid" -> col("score").isNull,
      "comment_missing" -> col("comment").isNull))

  val zones: Medallion.SilverConf = Medallion.SilverConf(
    entity = "zones",
    keys = Seq("zone_id"),
    // reference hashes the *_norm columns (zones:196-206)
    businessCols = Seq("zone_name_norm", "city_norm", "region_norm"),
    clean = df => cast(df, "zone_id" -> "long")
      .withColumn("zone_name_norm", scrubNullLike(col("zone_name")))
      .withColumn("city_norm", scrubNullLike(col("city")))
      .withColumn("region_norm", scrubNullLike(col("region"))),
    flags = Seq(
      "zone_name_is_null" -> col("zone_name_norm").isNull,
      "city_is_null" -> col("city_norm").isNull,
      "region_is_null" -> col("region_norm").isNull,
      "has_missing_fields" ->
        (col("zone_name_norm").isNull || col("city_norm").isNull ||
          col("region_norm").isNull)))

  val silverConfs: Seq[Medallion.SilverConf] =
    Seq(trips, passengers, drivers, vehicles, payments, ratings, zones)

  /** Bronze watermark column per entity (zones only has created_at —
    * reference src/bronze/zones_oltp_to_bronze.py:25-27). */
  val watermarkCol: Map[String, String] =
    silverConfs.map(_.entity -> "updated_at").toMap + ("zones" -> "created_at")

  // ---- gold star -------------------------------------------------------

  /** agg_trips_daily measure list (reference agg_trips_daily.py:128-143). */
  def aggTripsDaily: Seq[Column] = Seq(
    count(lit(1)).as("trips_total"),
    sum(when(col("status").isin(CompletedSet: _*), 1).otherwise(0))
      .cast("long").as("trips_completed"),
    sum(when(col("status").isin(CancelledSet: _*), 1).otherwise(0))
      .cast("long").as("trips_cancelled"),
    sum(when(col("status").isin(ActiveSet: _*), 1).otherwise(0))
      .cast("long").as("trips_active"),
    sum(col("fare_amount")).as("sum_fare_amount"),
    avg(col("fare_amount")).as("avg_fare_amount"),
    sum(col("actual_distance_km")).as("sum_distance_km"),
    avg(col("actual_distance_km")).as("avg_distance_km"))

  /** agg_driver_daily measure list (reference agg_driver_daily.py:175-197). */
  def driverDailyMeasures: Seq[Column] = Seq(
    countDistinct(col("trip_id")).as("trips_count"),
    sum(when(col("status").isin(CompletedSet: _*), 1).otherwise(0))
      .cast("long").as("completed_trips"),
    sum(when(col("status").isin(CancelledSet: _*), 1).otherwise(0))
      .cast("long").as("canceled_trips"),
    countDistinct(col("passenger_id")).as("unique_passengers"),
    sum(coalesce(col("fare_amount"), lit(0.0))).as("total_fare_amount"),
    sum(coalesce(col("actual_distance_km"), lit(0.0))).as("total_distance_km"))

  /** Full-rebuild form of agg_driver_daily (used by specs; the pipeline
    * path is the incremental [[goldAggDriverDaily]]). */
  def aggDriverDaily(fact: DataFrame): DataFrame =
    fact.groupBy(col("date_key").as("trip_date_key"), col("driver_id"))
      .agg(driverDailyMeasures.head, driverDailyMeasures.tail :+
        max(col("raw_loaded_at")).as("max_raw_loaded_at"): _*)

  /** agg_driver_daily as an affected-(trip_date_key, driver_id)-slice
    * incremental aggregate over fact_trips, with the silver-trips fallback
    * when the fact is absent (reference agg_driver_daily.py:96-104 source
    * pick, :141-162 affected pairs, :245-282 composite-key merge). */
  def goldAggDriverDaily(spark: org.apache.spark.sql.SparkSession,
                         paths: Medallion.Paths): Unit = {
    import graft.tx.AtomicRewrite
    val factRoot = paths.gold("fact_trips")
    val src0 =
      if (AtomicRewrite.exists(spark, factRoot)) AtomicRewrite.read(spark, factRoot)
      else AtomicRewrite.read(spark, paths.silver("trips"))
    val src1 =
      if (src0.columns.contains("is_current")) src0.filter(col("is_current")) else src0
    val keyed =
      if (src1.columns.contains("date_key"))
        src1.withColumn("trip_date_key", col("date_key"))
      else // silver fallback derives the grain from the trip timestamps
        src1.withColumn("trip_date_key",
          graft.ops.DateKeys.dateKey(Seq(col("requested_at"))))
    val src = keyed.withColumn("driver_id",
      coalesce(col("driver_id").cast("long"), lit(0L)))
    Medallion.goldAggIncremental(spark, paths, "agg_driver_daily", src,
      Seq("trip_date_key", "driver_id"), driverDailyMeasures)
  }

  /** dim_payment_method (reference static/dim_payment.py:89-137): one row
    * per observed method with surrogate key, plus the UNKNOWN row. */
  def dimPaymentMethod(silverPayments: DataFrame): DataFrame = {
    val dim = silverPayments.filter(col("is_current"))
      .groupBy(col("method").as("payment_method_name"))
      .agg(max(col("raw_loaded_at")).as("raw_loaded_at"))
      .withColumn("payment_method_key",
        graft.ops.ScdHash.surrogateKey(col("payment_method_name")))
      .withColumn("is_cash", col("payment_method_name") === "cash")
      .withColumn("is_card", col("payment_method_name") === "card")
    dim.sparkSession.range(1).select(
      lit("UNKNOWN").as("payment_method_name"),
      lit(null).cast("timestamp").as("raw_loaded_at"),
      lit(0).as("payment_method_key"),
      lit(false).as("is_cash"), lit(false).as("is_card"))
      .unionByName(dim)
  }

  /** dim_zone static rebuild (reference static/dim_zone.py:60-128): latest
    * current silver row per zone_id, empty-string → NULL scrub on the raw
    * fields, *_norm regenerated (lower+trim) only where silver didn't
    * carry them, full overwrite of the conformed dim. */
  def buildDimZone(spark: org.apache.spark.sql.SparkSession,
                   paths: Medallion.Paths, now: java.sql.Timestamp): Unit = {
    import graft.tx.AtomicRewrite
    val silver0 = AtomicRewrite.read(spark, paths.silver("zones"))
    val silver =
      if (silver0.columns.contains("is_current")) silver0.filter(col("is_current"))
      else silver0
    val latest = graft.ops.Dedup.latestPerKey(silver,
      Seq(col("zone_id")), Seq(col("raw_loaded_at").desc))
    def emptyToNull(c: String) = when(trim(col(c)) === "", lit(null)).otherwise(col(c))
    val conformed = latest
      .withColumn("zone_id", col("zone_id").cast("long"))
      .withColumn("zone_name", emptyToNull("zone_name"))
      .withColumn("city", emptyToNull("city"))
      .withColumn("region", emptyToNull("region"))
      .withColumn("zone_name_norm",
        coalesce(col("zone_name_norm"), lower(trim(col("zone_name")))))
      .withColumn("city_norm", coalesce(col("city_norm"), lower(trim(col("city")))))
      .withColumn("region_norm", coalesce(col("region_norm"), lower(trim(col("region")))))
      .withColumn("dwh_loaded_at", lit(now))
    val base = Seq("zone_id", "zone_name", "city", "region",
      "zone_name_norm", "city_norm", "region_norm",
      "created_at", "raw_loaded_at", "source_system", "dwh_loaded_at")
    val flags = Seq("zone_name_is_null", "city_is_null", "region_is_null",
      "has_missing_fields")
    val keep = (base ++ flags).filter(conformed.columns.contains)
    AtomicRewrite.write(spark, paths.gold("dim_zone"),
      conformed.select(keep.map(col): _*))
  }

  /** Build/refresh the static dim_payment_method from silver payments
    * (reference static/dim_payment.py:89-137). */
  def buildDimPaymentMethod(spark: org.apache.spark.sql.SparkSession,
                            paths: Medallion.Paths): Unit = {
    import graft.tx.AtomicRewrite
    AtomicRewrite.write(spark, paths.gold("dim_payment_method"),
      dimPaymentMethod(AtomicRewrite.read(spark, paths.silver("payments"))))
  }

  /** fact_payments: incremental SCD1 snapshot, one row per payment_id
    * (reference fact_payments.py:86-195):
    *
    *  - watermark = max(raw_loaded_at) in the target fact
    *  - latest-per-payment_id inside the incremental batch
    *  - payment_method_key = surrogate of lower(trim(method)) with
    *    null-likes → 0, then VALIDATED against dim_payment_method — a key
    *    the static dim has never seen goes to 0 (UNKNOWN), so the fact
    *    never carries a dangling surrogate (fact_payments.py:117-161)
    *  - payment_date_key from the paid_at → created_at → raw_loaded_at
    *    coalesce chain, 0 if all NULL
    *  - MERGE on payment_id guarded by newer raw_loaded_at
    *
    * Scale: the dim is tiny and broadcast; the merge shuffles once on
    * payment_id — identical shape to Delta's MERGE. */
  def factPayments(spark: org.apache.spark.sql.SparkSession,
                   paths: Medallion.Paths, now: java.sql.Timestamp): Unit = {
    import graft.tx.{AtomicRewrite, Upsert}
    val target = paths.gold("fact_payments")
    val exists = AtomicRewrite.exists(spark, target)
    val silver0 = AtomicRewrite.read(spark, paths.silver("payments"))
    val silver = (
      if (silver0.columns.contains("is_current")) silver0.filter(col("is_current"))
      else silver0
    ).drop(graft.pipeline.Scd2.MetaCols.filterNot(_ == "scd_hash") ++ Seq("archive_month", "key_bucket"): _*)
    val wm: Option[java.sql.Timestamp] =
      if (!exists) None
      else Option(AtomicRewrite.read(spark, target)
        .agg(max(col("raw_loaded_at"))).head().getTimestamp(0))
    val inc = wm.map(ts => silver.filter(col("raw_loaded_at") > lit(ts)))
      .getOrElse(silver)
    if (wm.isDefined && inc.isEmpty) return
    val latest = graft.ops.Dedup.latestPerKey(inc,
      Seq(col("payment_id")), Seq(col("raw_loaded_at").desc))
    val methodNorm = scrubNullLike(lower(col("method")))
    val dateChain = Seq("paid_at", "created_at", "raw_loaded_at")
      .filter(latest.columns.contains).map(col)
    val fact0 = latest
      .withColumn("payment_method_key",
        when(methodNorm.isNull, lit(0))
          .otherwise(graft.ops.ScdHash.surrogateKey(methodNorm)))
      .withColumn("payment_date_key", graft.ops.DateKeys.dateKey(dateChain))
      .withColumn("dwh_loaded_at", lit(now))
    val dimPath = paths.gold("dim_payment_method")
    val fact =
      if (!AtomicRewrite.exists(spark, dimPath)) fact0
      else {
        val dim = AtomicRewrite.read(spark, dimPath)
          .select(col("payment_method_key").cast("int").as("__pmk")).distinct()
        fact0.join(broadcast(dim), col("payment_method_key") === col("__pmk"), "left")
          .withColumn("payment_method_key",
            when(col("__pmk").isNull, lit(0)).otherwise(col("payment_method_key")))
          .drop("__pmk")
      }
    val next =
      if (!exists) fact
      else Upsert.scd1(AtomicRewrite.read(spark, target), fact, Seq("payment_id"),
        updateWhen = (t, s) => s("raw_loaded_at") > t("raw_loaded_at"))
    AtomicRewrite.write(spark, target, next)
  }

  // ---- GDPR policy catalog (reference gdpr_propagate_erasure.py:401-604) --

  /** Passenger erasure: PII on silver + every gold dim flavor. */
  def passengerPolicies(layers: Seq[String]): Seq[Gdpr.Policy] =
    layers.map { t =>
      Gdpr.Policy(t, "passenger_id", Map(
        "full_name" -> (_ => Gdpr.pseudonym("graft-mobility-salt", "passenger", col("passenger_id"))),
        "email" -> (_ => lit(null).cast("string")),
        "phone" -> (_ => lit(null).cast("string")),
        "city" -> (_ => lit(null).cast("string"))))
    }

  def driverPolicies(layers: Seq[String]): Seq[Gdpr.Policy] =
    layers.map { t =>
      Gdpr.Policy(t, "driver_id", Map(
        "full_name" -> (_ => Gdpr.pseudonym("graft-mobility-salt", "driver", col("driver_id"))),
        "license_number" -> (_ => lit(null).cast("string"))))
    }

  /** Vehicle plate → deterministic ANON-PLATE-<id> (reference :480-492). */
  def vehiclePolicies(layers: Seq[String]): Seq[Gdpr.Policy] =
    layers.map { t =>
      Gdpr.Policy(t, "vehicle_id", Map(
        "plate_number" -> (_ => concat(lit("ANON-PLATE-"), col("vehicle_id")))))
    }

  /** Payments carry no subject key: derive the affected trip ids from
    * silver trips, then scrub provider_ref update-only (reference
    * gdpr_propagate_erasure.py:658-719). */
  def scrubPaymentsForPassengers(spark: org.apache.spark.sql.SparkSession,
                                 passengerIds: DataFrame,
                                 silverTripsRoot: String,
                                 silverPaymentsRoot: String): Long = {
    import graft.tx.{AtomicRewrite, Upsert}
    if (!AtomicRewrite.exists(spark, silverTripsRoot) ||
      !AtomicRewrite.exists(spark, silverPaymentsRoot)) return 0L
    val tripIds = AtomicRewrite.read(spark, silverTripsRoot)
      .join(broadcast(passengerIds.toDF("__sid")),
        col("passenger_id") === col("__sid"))
      .select("trip_id").distinct()
    val payments = AtomicRewrite.read(spark, silverPaymentsRoot)
    val next = Upsert.updateOnly(payments, tripIds, Seq("trip_id"),
      Map("provider_ref" -> (_ => lit(null).cast("string"))),
      extraCond = col("provider_ref").isNotNull)
    AtomicRewrite.write(spark, silverPaymentsRoot, next)
    tripIds.count()
  }

  /** Comment/note scrubs, update-only where non-null (reference :495-604). */
  def scrubPolicies: Seq[Gdpr.Policy] = Seq(
    Gdpr.Policy("silver/ratings", "passenger_id",
      Map("comment" -> (_ => lit(null).cast("string"))),
      extraCond = col("comment").isNotNull),
    Gdpr.Policy("silver/trips", "passenger_id",
      Map("cancel_note" -> (_ => lit(null).cast("string"))),
      extraCond = col("cancel_note").isNotNull))
}
