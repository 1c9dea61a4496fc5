package graft.queries

import graft.core.Tables
import graft.ops.{Cleansing, DateKeys, Dedup, ScdHash}
import graft.pipeline.Scd2
import graft.tx.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2 reference-parity operators, expressed as oracle-checked
  * queries over the driver testdata (TESTDATA.md).
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - double aggregation goes through an exact DECIMAL(38,6) sum, then a
  *    single cast back to double — order-independent and bit-identical in
  *    both engines;
  *  - no double→string casts inside hashes (engines format differently);
  *  - every window order is total (explicit tiebreakers).
  */
object RelationalQueries {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact, order-independent sum of a double column. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(38, 6))).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1/P3/P6: cast projection + null-like scrub + case normalization
    "q01_clean_project" -> ((s, dir) =>
      T(s, dir, "customer").select(
        col("c_custkey"),
        Cleansing.normUpper(col("c_name")).as("name_norm"),
        Cleansing.normLower(col("c_mktsegment")).as("segment"),
        Cleansing.scrubNullLike(col("c_mktsegment")).as("segment_scrubbed"),
        col("c_nationkey").cast("long").as("nation_id"),
        // round-to-2 as DOUBLE, not DECIMAL: Spark casts double→decimal
        // HALF_UP while DuckDB rounds half-even, and decimal repr differs
        // across engines — a DOUBLE no-op round (acctbal already has 2dp)
        // is bit-identical in both.
        round(col("c_acctbal"), 2).as("acctbal_round"))),

    // P2: predicate pushdown filter + per-row arithmetic
    "q02_filter_project" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
          && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))),

    // P4/P5/P8: DQ guard flags
    "q03_dq_flags" -> ((s, dir) =>
      T(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") < 1 || col("l_quantity") > 50).as("qty_out_of_range"),
        (col("l_discount") < 0 || col("l_discount") > 1).as("discount_invalid"),
        (col("l_tax") < 0).as("tax_negative"),
        (!col("l_returnflag").isin("A", "N", "R")).as("returnflag_unknown"))),

    // P9: sha2 change-detection hash (exact reference formula)
    "q04_scd_hash" -> ((s, dir) =>
      T(s, dir, "customer").select(
        col("c_custkey"),
        ScdHash.scdHash(Seq(col("c_name"), col("c_nationkey"), col("c_mktsegment")))
          .as("scd_hash"))),

    // W1/A5: latest-version-per-key dedup
    "q05_dedup_latest" -> ((s, dir) =>
      Dedup.latestPerKey(T(s, dir, "orders"),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey").as("latest_order_key"),
          to_date(col("o_orderdate")).as("latest_order_date"),
          col("o_orderstatus").as("latest_status"))),

    // W2/J3: SCD3 current + previous per key
    "q06_scd3_prev" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val keys = Seq(col("o_custkey"))
      val ord = Seq(col("o_orderdate").desc, col("o_orderkey").desc)
      val cur = Dedup.nthPerKey(o, keys, ord, 1)
        .select(col("o_custkey"), col("o_orderkey").as("cur_order_key"),
          col("o_totalprice").as("cur_price"))
      val prev = Dedup.nthPerKey(o, keys, ord, 2)
        .select(col("o_custkey"), col("o_orderkey").as("prev_order_key"),
          col("o_totalprice").as("prev_price"))
      cur.join(prev, Seq("o_custkey"), "left")
    }),

    // J1: fact→dim key validation to 0 (broadcast dim)
    "q07_key_validation" -> ((s, dir) => {
      val dim = T(s, dir, "supplier").filter(col("s_acctbal") > 1000)
        .select(col("s_suppkey"))
      T(s, dir, "lineitem")
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("s_suppkey"), lit(0L)).as("supplier_key"))
    }),

    // J2: left-semi join (GDPR affected-rows idiom)
    "q08_semi_join" -> ((s, dir) => {
      val ids = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      T(s, dir, "orders")
        .join(broadcast(ids), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
    }),

    // anti join (whenNotMatchedInsert idiom) + aggregate
    "q09_anti_join" -> ((s, dir) => {
      val ids = T(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      T(s, dir, "orders")
        .join(broadcast(ids), col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // A1: daily aggregate with conditional counts + exact double sums
    "q10_agg_daily" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(
          count(lit(1)).as("orders_total"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("orders_open"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("orders_filled"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast("long").as("orders_partial"),
          dsum("o_totalprice").as("sum_price"),
          (dsum("o_totalprice") / count(lit(1))).as("avg_price"))),

    // A2: exact countDistinct per group
    "q11_count_distinct" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(countDistinct(col("o_custkey")).as("active_customers"),
          count(lit(1)).as("orders_cnt"))),

    // A3: groupBy max (last-seen dim build)
    "q12_groupby_max" -> ((s, dir) =>
      T(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_name")).as("first_name"))),

    // A4: global scalar min/max (watermark read shape)
    "q13_global_minmax" -> ((s, dir) =>
      T(s, dir, "orders").agg(
        to_date(min(col("o_orderdate"))).as("first_date"),
        to_date(max(col("o_orderdate"))).as("last_date"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))),

    // O3/S8: UNKNOWN row ∪ distinct dim
    "q14_dim_union_unknown" -> ((s, dir) => {
      import s.implicits._
      val dim = T(s, dir, "orders").select(col("o_orderpriority").as("priority")).distinct()
        .withColumn("priority_key",
          row_number().over(Window.orderBy(col("priority"))).cast("int"))
      Seq((0, "UNKNOWN")).toDF("priority_key", "priority")
        .unionByName(dim.select(col("priority_key"), col("priority")))
    }),

    // P10: xxhash64 surrogate keys. xxhash64 does not exist in DuckDB, so
    // the output is the set of oracle-checkable invariants instead of the
    // raw keys: range [1, 2147483646] (0 reserved for UNKNOWN), uniqueness
    // (bijective over the 5 priorities), and determinism (two independent
    // derivations agree — task-retry safety).
    "q15_surrogate_keys" -> ((s, dir) => {
      val base = T(s, dir, "orders")
        .select(col("o_orderpriority").as("priority")).distinct()
      val keyed = base.withColumn("priority_key", ScdHash.surrogateKey(col("priority")))
      val again = base.select(col("priority"),
        ScdHash.surrogateKey(col("priority")).as("priority_key2"))
      keyed.join(again, Seq("priority"))
        .withColumn("uniq",
          count(lit(1)).over(Window.partitionBy(col("priority_key"))) === 1)
        .select(col("priority"),
          (col("priority_key") >= 1 && col("priority_key") <= 2147483646L).as("in_range"),
          col("uniq").as("is_unique"),
          (col("priority_key") === col("priority_key2")).as("stable"))
    }),

    // O4/O5: calendar spine via sequence+explode
    "q16_date_spine" -> ((s, dir) =>
      DateKeys.spine(T(s, dir, "orders").agg(
        to_date(min(col("o_orderdate"))).as("mn"),
        to_date(max(col("o_orderdate"))).as("mx")))),

    // P12/P14: yyyyMMdd date keys with coalesce fallbacks + JSON props
    "q17_date_key" -> ((s, dir) =>
      T(s, dir, "events").select(
        col("event_id"),
        DateKeys.dateKey(Seq(col("ts"))).as("date_key"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        coalesce(col("value"), lit(0.0)).as("value_filled"))),

    // M4: SCD1 upsert via the join-based MERGE replacement
    "q18_scd1_upsert" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val target = o.select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("p"))
      val updates = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("st"),
          (col("o_totalprice") + lit(1000.0)).as("p"))
      val inserts = o.filter(col("o_orderkey") % 5 === 0)
        .select((-col("o_orderkey")).as("k"), lit("I").as("st"), col("o_totalprice").as("p"))
      Upsert.scd1(target, updates.unionByName(inserts), Seq("k"),
        updateWhen = (t, sc) => sc("p") > t("p"))
    }),

    // M2/M3: SCD2 history built from a change log (hash short-circuit,
    // close + insert semantics)
    "q19_scd2_changelog" -> ((s, dir) =>
      Scd2.fromChangeLog(T(s, dir, "events"), Seq("user_id"),
        businessCols = Seq("event_type"), tsCol = "ts", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("is_current"))),

    // S9/P13: retention trim relative to max(ts)
    "q20_retention" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val cut = ev.agg((max(col("ts")) - expr("interval 7 days")).as("cutoff"))
      ev.crossJoin(broadcast(cut))
        .groupBy(col("event_type"))
        .agg(sum(when(col("ts") > col("cutoff"), 1).otherwise(0)).cast("long").as("kept"),
          sum(when(col("ts") <= col("cutoff"), 1).otherwise(0)).cast("long").as("dropped"))
    }),

    // M5/P11: GDPR update-only anonymization with salted fingerprint
    "q21_gdpr_anonymize" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val subjects = c.filter(col("c_acctbal") < 0).select(col("c_custkey"))
      Upsert.updateOnly(c, subjects, Seq("c_custkey"),
        setCols = Map("c_name" -> (_ => concat(lit("ANON-"),
          substring(ScdHash.subjectFingerprint("graft-salt", lit("customer"),
            col("c_custkey")), 1, 16)))))
        .select(col("c_custkey"), col("c_name").as("name_out"),
          col("c_name").startsWith("ANON-").as("is_anon"))
    }),

    // J4: affected-partition incremental recompute
    "q22_affected_slice" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val affected = o.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
        .select(to_date(col("o_orderdate")).as("d")).distinct()
      o.join(broadcast(affected), to_date(col("o_orderdate")) === col("d"))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("sum_price"))
    }),

    // TPC-H Q7 shape: nation-pair volume shipping — two roles of the same
    // dim (customer nation, supplier nation) with a pair predicate,
    // yearly revenue rollup.
    "q51_volume_shipping" -> ((s, dir) => {
      val n1 = T(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      val n2 = T(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .filter((col("cust_nation") === "NATION_10" && col("supp_nation") === "NATION_9") ||
          (col("cust_nation") === "NATION_9" && col("supp_nation") === "NATION_10"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).as("ship_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q17 shape (correlated scalar subquery, hand-decorrelated the
    // way Catalyst would): lineitems below 20% of their part's average
    // quantity. The threshold compare is kept in exact arithmetic
    // (5·qty·count < Σqty) so both engines agree bit-for-bit.
    "q50_small_qty_revenue" -> ((s, dir) => {
      val stats = T(s, dir, "lineitem").groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(38, 6))).cast("double").as("sumq"))
      T(s, dir, "lineitem")
        .join(stats, "l_partkey")
        .filter(col("l_quantity") * 5 * col("cnt") < col("sumq"))
        .agg(count(lit(1)).as("n_small"),
          dsum("l_extendedprice").as("sum_revenue"))
    }),

    // Gap-based sessionization (30-min inactivity): lag + running cumsum,
    // then per-session aggregate — the batch twin of the streaming
    // flatMapGroupsWithState sessionizer in graft.streaming.
    "q27_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(38, 6))).cast("double").as("sum_value"))
    }),

    // Bucketized range join (points-in-interval): events matched into
    // their user's 30-min-gap sessions. The naive theta-join explodes
    // per-key; instead intervals explode to hour buckets and the join is
    // EQUI on (user, hour) + a residual range filter — the standard
    // scale-out range-join shape (each event lands in exactly one bucket,
    // so no dedup needed).
    "q47_range_join" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessions = T(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val buckets = sessions.select(col("user_id"), col("session_seq"),
        col("s_start"), col("s_end"),
        explode(sequence(date_trunc("hour", col("s_start")),
          date_trunc("hour", col("s_end")), expr("interval 1 hour"))).as("hb"))
      val ev = T(s, dir, "events").select(col("event_id"),
        col("user_id"), col("ts"), date_trunc("hour", col("ts")).as("hb"))
      ev.join(buckets, Seq("user_id", "hb"))
        .filter(col("ts") >= col("s_start") && col("ts") <= col("s_end"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_in_range"),
          countDistinct(col("event_id")).as("n_distinct_events"))
    }),

    // As-of join (no Spark built-in): for each event, the latest order of
    // that customer as of the event time — union+window merge formulation,
    // one shuffle, no per-key range cross-product.
    "q46_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey").desc)
      val ordersDedup = T(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = T(s, dir, "events").select("event_id", "user_id", "ts")
      graft.ops.AsOfJoin.leftAsOf(ev, ordersDedup,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"),
          col("asof_o_orderkey").as("last_order_key"),
          col("asof_o_totalprice").as("last_order_price"))
    }),

    // Native as-of join (custom plan node): same semantics as q46 but via
    // the single-pass sorted-merge physical operator — both children
    // hash-clustered on the key and sorted by (key, time), no union row
    // blowup, no window. Exercises AsOfJoinExec under the oracle gate.
    "q93_asof_native" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey").desc)
      val ordersDedup = T(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = T(s, dir, "events").select("event_id", "user_id", "ts")
      graft.plans.AsOfJoinNative.join(ev, ordersDedup,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTime = "ts", rightTime = "o_orderdate")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_order_key"),
          col("o_totalprice").as("last_order_price"))
    }),

    // Skew-safe two-phase salted aggregation: identical result to a direct
    // groupBy (the oracle), but the hot key spreads over 32 reducers first.
    "q43_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedCountSum(
        T(s, dir, "orders").select(col("o_orderstatus"), col("o_totalprice")),
        keys = Seq("o_orderstatus"), sumCol = "o_totalprice")),

    // Custom typed Aggregator: mergeable bottom-k (KMV) sketch per group —
    // k smallest distinct sha256(user_id) values per event_type.
    "q28_bottomk_sketch" -> ((s, dir) => {
      val bk = graft.functions.BottomK.bottomK(8)
      T(s, dir, "events")
        .select(col("event_type"),
          sha2(col("user_id").cast("string"), 256).as("h"))
        .groupBy("event_type")
        .agg(bk(col("h")).as("bk"))
        // flatten to a scalar string: the driver's pandas row-sort cannot
        // hash an array<string> column (CORRECTNESS_r01 q28 crash).
        .select(col("event_type"), array_join(col("bk"), ",").as("bottom_k"))
    }),

    // HLL opt-in (A2 extension): approximate distinct beside the exact
    // count, with an accuracy assertion the oracle can state exactly.
    "q29_approx_distinct" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.1).as("within_10pct"))),

    // Quantile sketch opt-in beside the exact percentile (q29's pattern
    // for HLL): the KLL-style percentile_approx sketch is the mergeable,
    // bounded-memory path at 100 TB; the oracle pins the exact quantiles
    // and a 5%-of-range accuracy assertion on the sketch.
    "q62_quantile_sketch" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy("event_type")
        .agg(
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("value"), lit(0.9), lit(10000)).as("ap90"),
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          (max(col("value")) - min(col("value"))).as("rng"))
        .select(col("event_type"),
          round(col("p50"), 6).as("exact_p50"),
          round(col("p90"), 6).as("exact_p90"),
          (abs(col("ap50") - col("p50")) <= col("rng") * 0.05).as("p50_ok"),
          (abs(col("ap90") - col("p90")) <= col("rng") * 0.05).as("p90_ok"))),

    // Count-min heavy hitters (q28/q29/q62's pattern for the CMS): a
    // fixed 4×1024 counter grid per group — constant bytes per group per
    // partition at any corpus size — point-estimated for three probe
    // users beside their exact counts. The oracle pins the exact counts
    // and the sketch's two guarantees: never undercounts (always true by
    // construction), overshoot bounded by the collision mass 8N/width.
    "q79_cms_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val (depth, width) = (4, 1024)
      val cms = graft.functions.CountMin.countMin(depth, width)
      val targets = Seq("7", "42", "99")
      val sk = T(s, dir, "events")
        .groupBy("event_type")
        .agg(cms(col("user_id").cast("string")).as("sk"),
          count(lit(1)).as("n_rows"))
      val exact = T(s, dir, "events")
        .filter(col("user_id").cast("string").isin(targets: _*))
        .groupBy(col("event_type"), col("user_id").cast("string").as("uid"))
        .agg(count(lit(1)).as("exact_count"))
      // groups × probes rows (tiny); the estimate runs as a typed map on
      // the executors — the sketch array never reaches the driver
      sk.join(exact, "event_type")
        .as[(String, Seq[Long], Long, String, Long)]
        .map { case (et, sketch, n, uid, ex) =>
          val est = graft.functions.CountMin.estimate(sketch, uid, depth, width)
          (et, uid, ex, est >= ex, est <= ex + 8L * n / width)
        }
        .toDF("event_type", "user_id", "exact_count",
          "est_ge_exact", "est_within_eps")
    }),

    // INTERSECT / EXCEPT set algebra over customer cohorts (§2.7's set
    // ops beyond union): both execute as hash semi/anti joins on the
    // distinct key sets — no sort, shuffle only on the cohort keys,
    // which are already one-column distinct frames far smaller than the
    // fact that produced them.
    "q98_set_ops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      val a = o.filter(col("y") === 1994).select("o_custkey").distinct()
      val b = o.filter(col("y") === 1995).select("o_custkey").distinct()
      a.intersect(b).withColumn("cohort", lit("both_years"))
        .unionByName(a.except(b).withColumn("cohort", lit("only_1994")))
        .unionByName(b.except(a).withColumn("cohort", lit("only_1995")))
    }),

    // Schema-on-read over a JSON event payload: from_json projects the
    // typed field ONCE in a narrow codegen'd map (no UDF, no repeated
    // string parsing per reference), then an ordinary keyed aggregate.
    // The 100 TB point: semi-structured columns parse at scan speed and
    // never leave the executor as strings.
    "q99_json_extract" -> ((s, dir) => {
      T(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k").cast("long")).as("sum_k"),
          max(col("k")).as("max_k"))
    }),

    // ROLLUP subtotal hierarchy (year → year+month → grand total) with
    // grouping_id disambiguating subtotal rows from genuine NULL groups.
    // One pass: Spark expands the grouping sets BEFORE the shuffle and
    // partial-aggregates each set map-side — no per-level re-scan of the
    // fact, which is how a naive subtotal union would behave at 100 TB.
    "q96_rollup" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          col("o_totalprice"))
      o.rollup(col("o_year"), col("o_month"))
        .agg(count(lit(1)).as("orders_total"),
          sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
            .as("sum_price"),
          grouping_id().cast("int").as("gid"))
    }),

    // Status × priority PIVOT — the crosstab every BI layer asks of a
    // fact. Spark's pivot with EXPLICIT values: the value list is fixed
    // up front, so the plan is ONE pass with per-bucket conditional
    // partial aggregates (no second job to discover distinct values, no
    // wide-row shuffle; columns, not rows, carry the matrix).
    "q97_pivot" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("status"),
          coalesce(col("1-URGENT"), lit(0L)).as("n_urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("n_high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("n_medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("n_notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("n_low"))
    }),

    // 7-day moving average per event type — the trend smoother on every
    // ops dashboard: one day-grain pre-aggregation (map-side combined),
    // then a bounded rows-window over the TINY daily frame. The window
    // partitions by type (parallel) and never sees raw events — at
    // 100 TB the frame entering the window is days × types rows.
    "q92_moving_avg" -> ((s, dir) => {
      val daily = T(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(38, 6))).cast("double").as("v"))
      val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
      daily.select(col("event_type"), col("day"), col("n"),
        count(lit(1)).over(w).as("days_in_window"),
        round(sum(col("n")).over(w) / count(lit(1)).over(w), 6).as("ma7_events"),
        round(sum(col("v").cast(DecimalType(38, 6))).over(w).cast("double"), 6)
          .as("sum7_value"))
    }),

    // Quantile (decile) feature binning — the ML-prep discretizer: nine
    // exact cut points broadcast as ONE array row, each value binned by
    // a codegen'd array count. The scale path: cut points instead of an
    // ntile window (which would sort the entire corpus in one partition
    // chain); binning itself is a narrow map at scan speed.
    "q91_decile_binning" -> ((s, dir) => {
      val cuts = T(s, dir, "events").agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("cuts"))
      T(s, dir, "events").select(col("event_id"), col("value"))
        .crossJoin(broadcast(cuts))
        .select(col("event_id"),
          (size(filter(col("cuts"), c => c <= col("value"))) + 1)
            .cast("int").as("decile"))
    }),

    // Winsorization: clip a value column at its exact p01/p99 — the
    // standard outlier treatment before a value feeds model features or
    // averages. Two-pass: one percentile aggregate (broadcast 2-value
    // row), one narrow clip map. Exact interpolated percentiles so the
    // oracle states the same numbers.
    "q88_winsorize" -> ((s, dir) => {
      val pcts = T(s, dir, "events").agg(
        expr("percentile(value, 0.01)").as("p01"),
        expr("percentile(value, 0.99)").as("p99"))
      T(s, dir, "events").select(col("event_id"), col("value"))
        .crossJoin(broadcast(pcts))
        .select(col("event_id"),
          round(greatest(col("p01"), least(col("p99"), col("value"))), 6)
            .as("value_w"),
          (col("value") < col("p01") || col("value") > col("p99"))
            .as("clipped"))
    }),

    // Referential-integrity audit: orphan-FK counts for every edge of
    // the star — the DQ gate a warehouse runs after each load. Each edge
    // is one anti-join count; dims broadcast, facts stream by.
    "q89_ri_audit" -> ((s, dir) => {
      def orphans(name: String, fact: DataFrame, fk: String,
                  dim: DataFrame, pk: String) =
        fact.join(broadcast(dim.select(col(pk).as(fk))), Seq(fk), "left_anti")
          .agg(lit(name).as("fk_edge"), count(lit(1)).as("n_orphans"))
      orphans("lineitem.l_orderkey->orders", T(s, dir, "lineitem"),
        "l_orderkey", T(s, dir, "orders"), "o_orderkey")
        .unionByName(orphans("orders.o_custkey->customer", T(s, dir, "orders"),
          "o_custkey", T(s, dir, "customer"), "c_custkey"))
        .unionByName(orphans("customer.c_nationkey->nation", T(s, dir, "customer"),
          "c_nationkey", T(s, dir, "nation"), "n_nationkey"))
        .unionByName(orphans("supplier.s_nationkey->nation", T(s, dir, "supplier"),
          "s_nationkey", T(s, dir, "nation"), "n_nationkey"))
    }),

    // Time-series gap detection: calendar days between the event stream's
    // bounds with NO events — spine anti-join (sequence+explode vs the
    // observed day set). The freshness/completeness monitor for any
    // ingestion pipeline; both sides reduce before the tiny join.
    "q90_gap_detect" -> ((s, dir) => {
      val days = T(s, dir, "events").filter(col("user_id") === 7)
        .select(to_date(col("ts")).as("day")).groupBy("day").count()
      val bounds = days.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("day"))
      spine.join(days, Seq("day"), "left_anti")
        .select(col("day").as("missing_day"))
    }),

    // Table intake profile: null/distinct/min/max per column in ONE
    // aggregation pass (all per-column aggregates in a single agg row,
    // partial-combined map-side, unpivoted with stack) — the first query
    // any warehouse or training-data intake runs against a new table.
    "q86_profile" -> ((s, dir) =>
      graft.ops.Profile.describe(T(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))),

    // Equi-width value histogram: 20 buckets over o_totalprice — one
    // broadcast min/max row + one keyed count, nothing shuffles wider
    // than the bin count.
    "q87_histogram" -> ((s, dir) =>
      graft.ops.Profile.histogram(T(s, dir, "orders"), col("o_totalprice"), 20)),

    // Fixed-iteration PageRank over the customer–supplier graph (edges =
    // distinct order lines, symmetrized so no node dangles): 3 unrolled
    // power-iteration steps, each ONE keyed aggregation over the edge
    // list — the canonical distributed-graph shape (contributions
    // partial-combine map-side; only node-count rows cross the shuffle
    // per step, like q59's k-means). Cross-engine determinism: sums fold
    // through DECIMAL(38,18) and each iteration's rank is rounded to 12
    // digits, so the oracle replays every step bit-for-bit.
    "q85_pagerank" -> ((s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = base.select(col("c").as("src"), col("s").as("dst"))
        .union(base.select(col("s").as("src"), col("c").as("dst")))
        .distinct().persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
      val n = deg.count()
      var pr = deg.select(col("src").as("node"), lit(1.0 / n).as("pr"))
      for (_ <- 1 to 3) {
        pr = edges
          .join(pr.select(col("node").as("src"), col("pr")), "src")
          .join(deg, "src")
          .select(col("dst"), (col("pr") / col("outdeg")).as("w"))
          .groupBy("dst")
          .agg(round(lit(0.15 / n) +
            lit(0.85) * sum(col("w").cast(DecimalType(38, 18))).cast("double"),
            12).as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
      val out = pr.select(col("node"), round(col("pr"), 6).as("pagerank")).persist()
      out.count()
      edges.unpersist(); deg.unpersist()
      out
    }),

    // Z-order (Morton) clustering key: bit-interleave two dimensions so
    // range-clustering by ONE key gives parquet files tight min/max
    // envelopes on BOTH — the OPTIMIZE ZORDER analog for compact's
    // clusterBy. Pure codegen'd bit arithmetic; the oracle replays the
    // interleave bit-for-bit.
    "q82_zorder_key" -> ((s, dir) => {
      val x = pmod(col("user_id"), lit(256)).cast("long")
      val y = pmod(col("event_id"), lit(256)).cast("long")
      T(s, dir, "events").select(col("event_id"), x.as("x"), y.as("y"),
        graft.ops.ZOrder.interleave2(x, y, 8).as("zkey"))
    }),

    // Bloom-pruned semi join: the hot-order keys become an 8 KB literal
    // bitmap probed at the lineitem scan (codegen bit tests), so the
    // exact semi join only sees survivors — Spark's runtime-filter
    // design made explicit. False positives are removed by the exact
    // join; the oracle is the PLAIN semi join, so one false negative or
    // probe/build hash mismatch flips the hashes.
    "q81_bloom_semi_join" -> ((s, dir) => {
      val hot = T(s, dir, "orders").filter(col("o_totalprice") > 480000)
      graft.ops.BloomJoin
        .semiJoin(T(s, dir, "lineitem"), "l_orderkey", hot, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), dsum("l_extendedprice").as("revenue"))
    }),

    // Whole-operator custom plan node: top-3 orders per priority through
    // graft's TopKPerKey (logical node → planner strategy → two-phase
    // heap physical operator). vs the row_number window: no per-group
    // sort, and the map-side partial caps the exchange at keys×k rows
    // per partition — the 100 TB path for every "top N per key" ask. The
    // ordering is total (price desc, key asc), so the oracle's window
    // formulation returns the identical row set.
    "q80_topk_per_key" -> ((s, dir) =>
      graft.plans.TopKPerKey.perKey(
        T(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)),

    // TPC-H Q18 shape: aggregate-filtered semi-join (large orders) — the
    // HAVING-subquery pattern; the big lineitem aggregate reduces before
    // joining, so only qualifying orderkeys cross the join.
    "q63_tpch_large_orders" -> ((s, dir) => {
      val big = T(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(dsum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      T(s, dir, "orders").join(big, col("o_orderkey") === col("l_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          col("o_totalprice"), col("sum_qty"))
    }),

    // Cohort retention over the event stream: users grouped by first-seen
    // date, D1/D7 return rates — the product-analytics rollup shape. Two
    // keyed aggregations (first-seen, cohort rollup) + one user_id join.
    "q64_retention_cohort" -> ((s, dir) => {
      val e = T(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val first = e.groupBy("user_id").agg(min(col("d")).as("cohort_date"))
      first.join(e, Seq("user_id"))
        .groupBy("cohort_date")
        .agg(countDistinct(col("user_id")).as("cohort_size"),
          countDistinct(when(datediff(col("d"), col("cohort_date")) === 1,
            col("user_id"))).as("d1_retained"),
          countDistinct(when(datediff(col("d"), col("cohort_date")) === 7,
            col("user_id"))).as("d7_retained"))
    }),

    // Batch twin of the streaming attribution join
    // ([[graft.streaming.EventStreams.attribution]]): each view is
    // attributed to the user's purchases within 30 minutes. The interval
    // condition rides on a user_id equi-join, so the planner hash-joins
    // on user and filters the bounded time residual — never a cross
    // product.
    "q65_attribution" -> ((s, dir) => {
      val e = T(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id"), col("ts").as("purchase_ts"),
          col("value").as("purchase_value"))
      v.join(p, Seq("user_id"))
        .filter(col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("interval 30 minutes"))
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          col("view_ts"), col("purchase_ts"), col("purchase_value"))
    }),

    // Skew diagnostic: hottest join keys and their ratio vs the mean
    // group size — the report that decides when the q43 salted path (or
    // AQE skew join) is needed. One keyed count + one broadcast scalar.
    "q68_skew_report" -> ((s, dir) => {
      val counts = T(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("n"))
      val mean = counts.agg(
        (sum(col("n")).cast("double") / count(lit(1))).as("mean_n"))
      counts.crossJoin(broadcast(mean))
        .select(col("key"), col("n"),
          round(col("n") / col("mean_n"), 6).as("skew_ratio"))
        .orderBy(col("n").desc, col("key"))
        .limit(5)
    }),

    // TPC-H Q1 shape: big scan + hash aggregate (bench headliner)
    "q23_tpch_pricing" -> ((s, dir) => {
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum(discPrice.cast(DecimalType(38, 6))).cast("double").as("sum_disc_price"),
          sum((discPrice * (lit(1.0) + col("l_tax"))).cast(DecimalType(38, 6)))
            .cast("double").as("sum_charge"),
          (dsum("l_quantity") / count(lit(1))).as("avg_qty"),
          (dsum("l_extendedprice") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3 shape: 3-way join + agg + global sort + limit
    "q24_tpch_shipping" -> ((s, dir) => {
      val cut = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = T(s, dir, "orders").filter(col("o_orderdate") < lit(cut))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      T(s, dir, "lineitem").filter(col("l_shipdate") > lit(cut))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way snowflake join, broadcast dims
    "q25_tpch_local_supplier" -> ((s, dir) => {
      val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
      val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
      val n = T(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val r = T(s, dir, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
      val asiaNations = broadcast(
        n.join(r, col("n_regionkey") === col("r_regionkey")).select("n_nationkey", "n_name"))
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
        .select("o_orderkey", "o_custkey")
      T(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast("double").as("revenue"))
    }),

    // Ordered funnel analysis (view -> click -> purchase): users advance a
    // stage only with an event strictly after their previous stage's first
    // completion and within a 24 h conversion window. Three cascading
    // min-aggregates joined on user_id — after the first shuffle every
    // stage is co-partitioned by user, so a 100 TB event log pays one
    // partitioning, and each stage's state is one timestamp per surviving
    // user (no event arrays, no window sorts).
    "q107_funnel" -> ((s, dir) => {
      val win = expr("INTERVAL 24 HOURS")
      val e = T(s, dir, "events").select("user_id", "event_type", "ts")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
        .groupBy("user_id").agg(min("ts").as("t3"))
      def stage(d: DataFrame, name: String) =
        d.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      stage(v, "1_view")
        .unionByName(stage(c, "2_click_after_view"))
        .unionByName(stage(p, "3_purchase_after_click"))
    }))

  private val DS = "CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q01_clean_project" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_norm,
        | lower(trim(c_mktsegment)) AS segment,
        | CASE WHEN lower(trim(c_mktsegment)) IN ('null','n/a','none','-','') THEN NULL
        |      ELSE trim(c_mktsegment) END AS segment_scrubbed,
        | CAST(c_nationkey AS BIGINT) AS nation_id,
        | round(CAST(c_acctbal AS DOUBLE), 2) AS acctbal_round
        |FROM customer""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05""".stripMargin,
    "q03_dq_flags" ->
      """SELECT l_orderkey, l_linenumber,
        | (l_quantity < 1 OR l_quantity > 50) AS qty_out_of_range,
        | (l_discount < 0 OR l_discount > 1) AS discount_invalid,
        | (l_tax < 0) AS tax_negative,
        | (l_returnflag NOT IN ('A','N','R')) AS returnflag_unknown
        |FROM lineitem""".stripMargin,
    "q04_scd_hash" ->
      """SELECT c_custkey, sha256(concat_ws('||',
        |  coalesce(c_name,''), coalesce(CAST(c_nationkey AS VARCHAR),''),
        |  coalesce(c_mktsegment,''))) AS scd_hash
        |FROM customer""".stripMargin,
    "q05_dedup_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_order_key,
        | CAST(o_orderdate AS DATE) AS latest_order_date,
        | o_orderstatus AS latest_status
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) rn FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q06_scd3_prev" ->
      """WITH r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate DESC, o_orderkey DESC) rn FROM orders)
        |SELECT c.o_custkey, c.o_orderkey AS cur_order_key, c.o_totalprice AS cur_price,
        |       p.o_orderkey AS prev_order_key, p.o_totalprice AS prev_price
        |FROM (SELECT * FROM r WHERE rn = 1) c
        |LEFT JOIN (SELECT * FROM r WHERE rn = 2) p USING (o_custkey)""".stripMargin,
    "q07_key_validation" ->
      """SELECT l_orderkey, l_linenumber, coalesce(s_suppkey, 0) AS supplier_key
        |FROM lineitem LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 1000) d
        |ON l_suppkey = d.s_suppkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q09_anti_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY o_orderpriority""".stripMargin,
    "q10_agg_daily" ->
      s"""SELECT CAST(o_orderdate AS DATE) AS order_date,
         | count(*) AS orders_total,
         | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS orders_open,
         | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS orders_filled,
         | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS orders_partial,
         | $DS AS sum_price,
         | $DS / count(*) AS avg_price
         |FROM orders GROUP BY 1""".stripMargin,
    "q11_count_distinct" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        | count(DISTINCT o_custkey) AS active_customers, count(*) AS orders_cnt
        |FROM orders GROUP BY 1""".stripMargin,
    "q12_groupby_max" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers,
        | max(c_acctbal) AS max_bal, min(c_name) AS first_name
        |FROM customer GROUP BY 1""".stripMargin,
    "q13_global_minmax" ->
      """SELECT CAST(min(o_orderdate) AS DATE) AS first_date,
        | CAST(max(o_orderdate) AS DATE) AS last_date,
        | count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
        |FROM orders""".stripMargin,
    "q14_dim_union_unknown" ->
      """SELECT 0 AS priority_key, 'UNKNOWN' AS priority
        |UNION ALL
        |SELECT CAST(row_number() OVER (ORDER BY priority) AS INT), priority
        |FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders)""".stripMargin,
    "q15_surrogate_keys" ->
      """SELECT o_orderpriority AS priority, true AS in_range, true AS is_unique,
        |       true AS stable
        |FROM (SELECT DISTINCT o_orderpriority FROM orders)""".stripMargin,
    "q16_date_spine" ->
      """WITH mm AS (SELECT CAST(min(o_orderdate) AS DATE) mn, CAST(max(o_orderdate) AS DATE) mx FROM orders),
        |days AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS date FROM mm)
        |SELECT CAST(strftime(date, '%Y%m%d') AS INT) AS date_key, date,
        | CAST(year(date) AS INT) AS year, CAST(month(date) AS INT) AS month,
        | CAST(day(date) AS INT) AS day, CAST(quarter(date) AS INT) AS quarter,
        | CAST(weekofyear(date) AS INT) AS week_iso,
        | CAST(dayofweek(date) + 1 AS INT) AS day_of_week,
        | dayname(date) AS day_name,
        | dayofweek(date) IN (0, 6) AS is_weekend
        |FROM days""".stripMargin,
    "q17_date_key" ->
      """SELECT event_id,
        | coalesce(CAST(strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS INT), 0) AS date_key,
        | CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        | coalesce(value, 0.0) AS value_filled
        |FROM events""".stripMargin,
    "q18_scd1_upsert" ->
      """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p FROM orders),
        |s AS (SELECT o_orderkey AS k, 'U' AS st, o_totalprice + 1000.0 AS p
        |      FROM orders WHERE o_orderkey % 3 = 0
        |      UNION ALL
        |      SELECT -o_orderkey, 'I', o_totalprice FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT coalesce(t.k, s.k) AS k,
        | CASE WHEN t.k IS NULL THEN s.st WHEN s.k IS NULL THEN t.st
        |      WHEN s.p > t.p THEN s.st ELSE t.st END AS st,
        | CASE WHEN t.k IS NULL THEN s.p WHEN s.k IS NULL THEN t.p
        |      WHEN s.p > t.p THEN s.p ELSE t.p END AS p
        |FROM t FULL OUTER JOIN s ON t.k = s.k""".stripMargin,
    "q19_scd2_changelog" ->
      """WITH h AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |             sha256(concat_ws('||', coalesce(event_type,''))) AS hash
        |           FROM events),
        |d AS (SELECT *, lag(hash) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ph FROM h),
        |f AS (SELECT * FROM d WHERE ph IS NULL OR ph <> hash)
        |SELECT user_id, event_type, ts AS valid_from,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM f""".stripMargin,
    "q20_retention" ->
      """WITH c AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 7 DAY AS cutoff FROM events)
        |SELECT event_type,
        | CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) > cutoff THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        | CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) <= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS dropped
        |FROM events, c GROUP BY event_type""".stripMargin,
    "q21_gdpr_anonymize" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'ANON-' || substring(sha256(concat_ws('||',
        |   'graft-salt', 'customer', CAST(c_custkey AS VARCHAR))), 1, 16)
        |      ELSE c_name END AS name_out,
        | (c_acctbal < 0) AS is_anon
        |FROM customer""".stripMargin,
    "q22_affected_slice" ->
      s"""WITH affected AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
         |                  WHERE o_orderdate >= TIMESTAMP '2001-06-01')
         |SELECT d, count(*) AS n_orders, $DS AS sum_price
         |FROM orders JOIN affected ON CAST(o_orderdate AS DATE) = d
         |GROUP BY d""".stripMargin,
    "q27_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
        |n AS (SELECT *, CASE WHEN prev_ts IS NULL OR
        |        CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq FROM n)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q51_volume_shipping" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        | CAST(year(l_shipdate) AS INT) AS ship_year,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
        |   OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q50_small_qty_revenue" ->
      """WITH stats AS (SELECT l_partkey, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sumq
        |FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_revenue
        |FROM lineitem JOIN stats USING (l_partkey)
        |WHERE l_quantity * 5 * cnt < sumq""".stripMargin,
    "q47_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
        |n AS (SELECT *, CASE WHEN prev_ts IS NULL OR
        |        CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS session_seq FROM n),
        |iv AS (SELECT user_id, session_seq, min(ts) AS s_start, max(ts) AS s_end
        |       FROM s GROUP BY 1, 2)
        |SELECT iv.user_id, CAST(iv.session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_in_range, count(DISTINCT e.event_id) AS n_distinct_events
        |FROM iv JOIN e ON e.user_id = iv.user_id
        |  AND e.ts >= iv.s_start AND e.ts <= iv.s_end
        |GROUP BY 1, 2""".stripMargin,
    "q46_asof_join" ->
      """WITH od AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |              row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                ORDER BY o_orderkey DESC) AS rn FROM orders),
        |odd AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM od WHERE rn = 1),
        |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT e.event_id, e.user_id, odd.o_orderkey AS last_order_key,
        |       odd.o_totalprice AS last_order_price
        |FROM e ASOF LEFT JOIN odd
        |  ON e.user_id = odd.o_custkey AND e.ts >= odd.o_orderdate""".stripMargin,
    "q93_asof_native" ->
      """WITH od AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |              row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                ORDER BY o_orderkey DESC) AS rn FROM orders),
        |odd AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM od WHERE rn = 1),
        |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT e.event_id, e.user_id, odd.o_orderkey AS last_order_key,
        |       odd.o_totalprice AS last_order_price
        |FROM e ASOF LEFT JOIN odd
        |  ON e.user_id = odd.o_custkey AND e.ts >= odd.o_orderdate""".stripMargin,
    "q43_salted_agg" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM orders GROUP BY 1""".stripMargin,
    "q28_bottomk_sketch" ->
      """SELECT event_type,
        | array_to_string(list_sort(list(DISTINCT sha256(CAST(user_id AS VARCHAR))))[1:8], ',')
        |   AS bottom_k
        |FROM events GROUP BY 1""".stripMargin,
    "q29_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | true AS within_10pct
        |FROM events GROUP BY 1""".stripMargin,
    "q98_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |SELECT o_custkey, 'both_years' AS cohort
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1994' FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""".stripMargin,
    "q99_json_extract" ->
      """SELECT event_type,
        | count(CAST(props->>'k' AS INT)) AS n_with_k,
        | CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
        | max(CAST(props->>'k' AS INT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "q107_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL 24 HOURS GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL 24 HOURS GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM p""".stripMargin,
    "q96_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(month(o_orderdate) AS INT) AS o_month,
        | count(*) AS orders_total,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
        | CAST(GROUPING(o_year, o_month) AS INT) AS gid
        |FROM orders GROUP BY ROLLUP(o_year, o_month)""".stripMargin,
    "q97_pivot" ->
      """SELECT o_orderstatus AS status,
        | count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        | count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
        | count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
        | count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
        | count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q92_moving_avg" ->
      """WITH daily AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        | count(*) OVER w AS days_in_window,
        | round(CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w, 6) AS ma7_events,
        | round(CAST(sum(CAST(v AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS sum7_value
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q91_decile_binning" ->
      """WITH c AS (SELECT quantile_cont(value,
        |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts FROM events)
        |SELECT event_id,
        | CAST(1 + len(list_filter(cuts, x -> x <= value)) AS INT) AS decile
        |FROM events, c""".stripMargin,
    "q88_winsorize" ->
      """WITH p AS (SELECT quantile_cont(value, 0.01) AS p01,
        |                  quantile_cont(value, 0.99) AS p99 FROM events)
        |SELECT event_id,
        | round(greatest(p01, least(p99, value)), 6) AS value_w,
        | (value < p01 OR value > p99) AS clipped
        |FROM events, p""".stripMargin,
    "q89_ri_audit" ->
      """SELECT 'lineitem.l_orderkey->orders' AS fk_edge, count(*) AS n_orphans
        |FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', count(*)
        |FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation', count(*)
        |FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey
        |UNION ALL
        |SELECT 'supplier.s_nationkey->nation', count(*)
        |FROM supplier s ANTI JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,
    "q90_gap_detect" ->
      """WITH days AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |              FROM events WHERE user_id = 7 GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |          FROM b)
        |SELECT spine.day AS missing_day
        |FROM spine ANTI JOIN days ON spine.day = days.day""".stripMargin,
    "q86_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_value,
           | CAST(max($c) AS VARCHAR) AS max_value
           |FROM customer""".stripMargin
      Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
        .map(one).mkString("\nUNION ALL\n")
    },
    "q87_histogram" ->
      """WITH s AS (SELECT CAST(min(o_totalprice) AS DOUBLE) AS mn,
        |                  CAST(max(o_totalprice) AS DOUBLE) AS mx FROM orders),
        |b AS (SELECT CAST(CASE WHEN mx = mn THEN 0
        |        ELSE least(floor((CAST(o_totalprice AS DOUBLE) - mn)
        |          / ((mx - mn) / 20)), 19) END AS INT) AS bin, mn, mx
        |      FROM orders, s WHERE o_totalprice IS NOT NULL)
        |SELECT bin, round(mn + bin * (mx - mn) / 20, 6) AS bin_lo,
        | count(*) AS n
        |FROM b GROUP BY bin, mn, mx""".stripMargin,
    "q85_pagerank" -> {
      def iter(prev: String) =
        s"""SELECT e.dst AS node,
           | round(0.15 / (SELECT n FROM nn) + 0.85 *
           |   CAST(sum(CAST(p.pr / d.outdeg AS DECIMAL(38,18))) AS DOUBLE), 12) AS pr
           |FROM edges e JOIN $prev p ON e.src = p.node JOIN deg d ON e.src = d.src
           |GROUP BY 1""".stripMargin
      s"""WITH base AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
         |              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |edges AS (SELECT c AS src, s AS dst FROM base UNION SELECT s, c FROM base),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |pr0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
         |it1 AS (${iter("pr0")}),
         |it2 AS (${iter("it1")}),
         |it3 AS (${iter("it2")})
         |SELECT node, round(pr, 6) AS pagerank FROM it3""".stripMargin
    },
    "q82_zorder_key" ->
      """SELECT event_id, user_id % 256 AS x, event_id % 256 AS y,
        | CAST(list_sum(list_transform(range(0, 8), b ->
        |   ((((user_id % 256) >> b) & 1) << (2 * b))
        |   + ((((event_id % 256) >> b) & 1) << (2 * b + 1)))) AS BIGINT) AS zkey
        |FROM events""".stripMargin,
    "q81_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000)
        |GROUP BY 1""".stripMargin,
    "q80_topk_per_key" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders)
        |SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM r WHERE rn <= 3""".stripMargin,
    "q79_cms_heavy_hitters" ->
      """SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
        | count(*) AS exact_count,
        | true AS est_ge_exact, true AS est_within_eps
        |FROM events WHERE CAST(user_id AS VARCHAR) IN ('7', '42', '99')
        |GROUP BY 1, 2""".stripMargin,
    "q68_skew_report" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
        |m AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mean_n FROM c)
        |SELECT key, n, round(n / mean_n, 6) AS skew_ratio
        |FROM c, m ORDER BY n DESC, key LIMIT 5""".stripMargin,
    "q65_attribution" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
        |        value AS purchase_value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT user_id, view_id, purchase_id, view_ts, purchase_ts, purchase_value
        |FROM v JOIN p USING (user_id)
        |WHERE purchase_ts >= view_ts
        |  AND purchase_ts <= view_ts + INTERVAL 30 MINUTE""".stripMargin,
    "q63_tpch_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 150)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date, o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q64_retention_cohort" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_date FROM e GROUP BY 1)
        |SELECT cohort_date, count(DISTINCT e.user_id) AS cohort_size,
        | count(DISTINCT CASE WHEN date_diff('day', cohort_date, d) = 1
        |                     THEN e.user_id END) AS d1_retained,
        | count(DISTINCT CASE WHEN date_diff('day', cohort_date, d) = 7
        |                     THEN e.user_id END) AS d7_retained
        |FROM f JOIN e USING (user_id) GROUP BY 1""".stripMargin,
    "q62_quantile_sketch" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS exact_p50,
        | round(quantile_cont(value, 0.9), 6) AS exact_p90,
        | true AS p50_ok, true AS p90_ok
        |FROM events GROUP BY 1""".stripMargin,
    "q23_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2""".stripMargin,
    "q24_tpch_shipping" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01' AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q25_tpch_local_supplier" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin)
}
