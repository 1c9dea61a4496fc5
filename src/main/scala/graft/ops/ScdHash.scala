package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Change-detection and surrogate hashing.
  *
  * Reference semantics: scd_hash = sha2-256 over `||`-joined business
  * columns with NULL → "" (src/silver/trips_bronze_to_silver.py:285-319);
  * surrogate key = pmod(xxhash64(col), 2147483646) + 1 with 0 reserved for
  * the UNKNOWN dim row (src/gold/_conformed/static/dim_payment.py:103-108);
  * GDPR fingerprint = salted sha2 (gdpr/gdpr_propagate_erasure.py:201-209).
  *
  * All pure Catalyst expressions — deterministic across executors, safe to
  * recompute on task retry, no shuffle implied.
  */
object ScdHash {

  /** sha2-256 change-detection hash over business columns (NULL → ""). */
  def scdHash(cols: Seq[Column]): Column =
    sha2(concat_ws("||", cols.map(c => coalesce(c.cast("string"), lit(""))): _*), 256)

  /** Positive-int surrogate key; 0 reserved for UNKNOWN. */
  def surrogateKey(c: Column): Column =
    (pmod(xxhash64(c), lit(2147483646L)) + lit(1L)).cast("int")

  /** Irreversible salted subject fingerprint for audit trails. */
  def subjectFingerprint(salt: String, subjectType: Column, subjectId: Column): Column =
    sha2(concat_ws("||", lit(salt), subjectType, subjectId.cast("string")), 256)
}
