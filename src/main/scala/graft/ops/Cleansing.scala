package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-like scrubbing, guards and string normalization.
  *
  * Re-expresses the reference's silver-layer cleaning expressions
  * (reference: src/silver/trips_bronze_to_silver.py:132,162-178 and the
  * per-entity clones) as reusable pure-`Column` builders. Everything here is
  * a stock Catalyst expression — fully codegen'd, no UDFs — so it stays
  * inside WholeStageCodegen at any scale.
  */
object Cleansing {

  /** Strings treated as NULL (reference: src/silver/payments_bronze_to_silver.py:163-169). */
  val NullLikes: Seq[String] = Seq("null", "n/a", "none", "-", "")

  /** trim + null-like tokens to NULL. */
  def scrubNullLike(c: Column): Column = {
    val t = trim(c)
    when(lower(t).isin(NullLikes: _*), lit(null)).otherwise(t)
  }

  /** Negative numeric → NULL (reference guards on distance/fare/amount). */
  def nonNegativeOrNull(c: Column): Column =
    when(c < 0, lit(null)).otherwise(c)

  /** Outside [lo, hi] → NULL (reference: rating score 1..5). */
  def inRangeOrNull(c: Column, lo: Column, hi: Column): Column =
    when(c < lo || c > hi, lit(null)).otherwise(c)

  /** lower(trim()) enum normalization. */
  def normLower(c: Column): Column = lower(trim(c))

  /** upper(trim()) code normalization (plates, currencies). */
  def normUpper(c: Column): Column = upper(trim(c))

  /** Email shape validation (reference: src/silver/passengers_bronze_to_silver.py:228-232). */
  def validEmail(c: Column): Column = c.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")
}
