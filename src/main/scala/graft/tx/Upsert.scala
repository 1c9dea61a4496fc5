package graft.tx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based MERGE semantics replacing Delta `MERGE INTO` (SURVEY.md §2.4).
  *
  * All five reference merge patterns (M1 control upsert, M2/M3 SCD2
  * close+insert, M4 SCD1 upsert, M5 update-only scrub) reduce to a single
  * full-outer (or left, for update-only) join on the business key plus
  * per-column resolution. The caller persists the result via
  * [[AtomicRewrite.write]] — merge + commit stay separate so one snapshot
  * write covers multi-step merges (e.g. SCD2 close+insert in ONE pass,
  * which is safer than Delta's two sequential MERGEs, SURVEY.md §7.3a).
  *
  * Scale notes: the join shuffles both sides on the key — exactly what
  * Delta MERGE does under the hood. Small sources (control rows, GDPR
  * id-sets) are broadcast (`updateOnly` forces it); AQE auto-broadcasts
  * below the threshold elsewhere. No driver-side collection anywhere.
  */
object Upsert {

  /** Guard/resolve callbacks receive column accessors for the matched
    * target row (`t`) and source row (`s`). */
  type ColRef = String => Column

  /** Generic SCD1 upsert (reference M1/M4).
    *
    * Matched + `updateWhen` → per-column `resolve` (default: source wins);
    * matched + !guard → keep target row; unmatched source → insert;
    * unmatched target → keep.
    *
    * M1 control-table semantics = `resolve("last_loaded_ts" ->
    * ((t,s) => coalesce(s, t)))` so a FAIL (null source ts) never regresses
    * the watermark (reference: src/bronze/trips_oltp_to_bronze.py:83).
    */
  def scd1(target: DataFrame, source: DataFrame, keys: Seq[String],
           updateWhen: (ColRef, ColRef) => Column = (_, _) => lit(true),
           resolve: Map[String, (Column, Column) => Column] = Map.empty): DataFrame = {
    val cols = target.columns.toSeq
    require(source.columns.toSet == cols.toSet,
      s"upsert schema mismatch: target-only=${cols.diff(source.columns)} source-only=${source.columns.toSeq.diff(cols)}")
    val t = target.alias("t")
    val s = source.select(cols.map(col): _*).alias("s")
    val tc: ColRef = c => t(c)
    val sc: ColRef = c => s(c)
    val cond = keys.map(k => tc(k) <=> sc(k)).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    val tgtPresent = keys.map(k => tc(k).isNotNull).reduce(_ && _)
    val srcPresent = keys.map(k => sc(k).isNotNull).reduce(_ && _)
    val guard = updateWhen(tc, sc)
    joined.select(cols.map { c =>
      val merged = resolve.get(c).map(f => f(tc(c), sc(c))).getOrElse(sc(c))
      when(!tgtPresent, sc(c))            // not matched by target → insert
        .when(!srcPresent, tc(c))         // not matched by source → keep
        .when(guard, merged)              // matched, guard passes → update
        .otherwise(tc(c))                 // matched, guard fails → keep
        .as(c)
    }: _*)
  }

  /** M5: update-only merge — redact/patch matched rows, never insert.
    *
    * @param idSet     distinct business keys to touch (forced broadcast —
    *                  GDPR subject sets are tiny relative to the table)
    * @param setCols   per-column rewrite applied on matched rows
    * @param extraCond additional target-row predicate (e.g. `comment IS NOT NULL`)
    */
  def updateOnly(target: DataFrame, idSet: DataFrame, keys: Seq[String],
                 setCols: Map[String, Column => Column],
                 extraCond: Column = lit(true)): DataFrame = {
    val hits = idSet.select(keys.map(col): _*).distinct().withColumn("__hit", lit(true))
    val marked = target.join(broadcast(hits), keys, "left")
    val isHit = col("__hit").isNotNull && extraCond
    marked.select(target.columns.toSeq.map { c =>
      setCols.get(c)
        .map(f => when(isHit, f(col(c))).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
  }
}
