package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-key derivation and the calendar spine.
  *
  * Reference: date_key = date_format(to_date(coalesce(ts chain)), "yyyyMMdd")
  * cast int with 0 fallback (src/gold/_marts/facts/fact_trips.py:129-136);
  * dim_date = explode(sequence(start, end)) + calendar attributes
  * (src/gold/_conformed/static/dim_date.py:130-159).
  */
object DateKeys {

  /** yyyyMMdd int key from a timestamp coalesce chain; 0 if all NULL. */
  def dateKey(tsChain: Seq[Column]): Column =
    coalesce(
      (tsChain.map(ts => date_format(to_date(ts), "yyyyMMdd").cast("int")) :+ lit(0)): _*)

  /** Calendar attribute projection for a date column (reference O5). */
  def attributes(date: Column): Seq[Column] = Seq(
    date_format(date, "yyyyMMdd").cast("int").as("date_key"),
    date.as("date"),
    year(date).as("year"),
    month(date).as("month"),
    dayofmonth(date).as("day"),
    quarter(date).as("quarter"),
    weekofyear(date).as("week_iso"),
    dayofweek(date).as("day_of_week"),
    date_format(date, "EEEE").as("day_name"),
    dayofweek(date).isin(1, 7).as("is_weekend"))

  /** One row per day in [start, end] (1-row bounds frame) with calendar
    * attributes. `sequence` + `explode` is the reference's only generator
    * op (O4/O5). `bounds` must be a single row with columns (mn, mx).
    */
  def spine(bounds: DataFrame): DataFrame =
    bounds
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as("d"))
      .select(attributes(col("d")): _*)
}
