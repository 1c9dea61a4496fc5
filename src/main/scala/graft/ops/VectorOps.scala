package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns.
  *
  * All arithmetic is done in DOUBLE after an exact elementwise float→double
  * cast, with a strictly sequential left-fold — the same evaluation order an
  * ANSI-SQL `list_reduce` uses — so results are bit-identical across engines
  * and across re-computation (safe for task retries).
  *
  * Stock higher-order functions (`zip_with`, `aggregate`): codegen'd, no
  * UDF, no shuffle. A brute-force cosine scan is a single narrow map over
  * the corpus; the LSH variant in [[graft.queries.VectorQueries]] bounds the
  * candidate set for the 100 TB path.
  */
object VectorOps {

  /** Exact float→double elementwise cast. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))

  /** Dot product over already-double arrays (skip the repeated cast when a
    * pairwise query pre-casts each vector once). */
  def dotD(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x * y))

  def norm2(a: Column): Column = foldSum(transform(asDouble(a), x => x * x))

  /** cosine = dot / (sqrt(|a|²) * sqrt(|b|²)), double throughout. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Symmetric int8 quantization: scale by 127/max|x| and round — 8× less
    * memory/bandwidth than float32 at 100 TB, and downstream dot products
    * become exact integer arithmetic (bit-identical in any engine). */
  def quantizeInt8(v: Column): Column = {
    val d = asDouble(v)
    val mx = array_max(transform(d, x => abs(x)))
    transform(d, x => round(x * lit(127.0) / mx).cast("int"))
  }

  /** Exact integer dot product over quantized vectors. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y), lit(0L), (acc, x) => acc + x)

  /** Random-hyperplane-style LSH bucket from coordinate sign bits: the
    * first `nBits` coordinates' signs concatenated to a bit string.
    * (Axis-aligned hyperplanes — valid LSH for centered embeddings, and
    * exactly reproducible in any SQL engine.) */
  def signBucket(v: Column, nBits: Int): Column =
    concat_ws("", (0 until nBits).map(i =>
      when(element_at(asDouble(v), i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)
}
