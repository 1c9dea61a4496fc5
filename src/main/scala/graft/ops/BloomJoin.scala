package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build an 8 KB bitmap of the small side's
  * join keys, ship it as a LITERAL into the big side's scan filter, and
  * only then run the exact join.
  *
  * The 100 TB story: a semi-join normally shuffles (or at best
  * broadcast-hashes) every big-side row; with the bloom prefilter the
  * big side drops non-matching rows AT THE SCAN (codegen'd bit probes,
  * no UDF, no shuffle), so the join only sees survivors. False
  * positives pass the bloom and are removed by the exact join that
  * follows — the result is bit-identical to the plain join, which is
  * exactly what the DuckDB oracle states (q81). False negatives cannot
  * happen: the probe uses the same xxhash64 positions the builder set.
  *
  * This is Spark's own runtime-filter design (AQE's bloom injection),
  * made explicit and deterministic: build with a mergeable typed
  * Aggregator (bitwise-OR combine, map-side partials), collect the ONE
  * 1024-long row, embed as a literal.
  */
object BloomJoin {

  val NumBits = 1 << 16 // 65536 bits = 1024 longs = 8 KB
  val NumHashes = 4

  /** The k bit positions of a key — computed by STOCK expressions so the
    * build side (aggregator input) and probe side (scan filter) evaluate
    * the identical function inside whole-stage codegen. */
  def positions(key: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      i => pmod(xxhash64(i, key), lit(NumBits)))

  /** Mergeable bitmap aggregator: reduce sets a row's bit positions,
    * merge is bitwise OR — partials combine in any order/grouping. */
  case class BitsAgg(numLongs: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numLongs)
    override def reduce(b: Array[Long], ps: Seq[Long]): Array[Long] = {
      if (ps != null) ps.foreach { p =>
        b((p >> 6).toInt) |= (1L << (p & 63))
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Build the bitmap of `key` over `df` (one distributed pass, one tiny
    * row to the driver — the same collect Spark's runtime filters do). */
  def sketch(df: DataFrame, key: Column): Array[Long] = {
    val agg = udaf(BitsAgg(NumBits / 64))
    df.select(positions(key).as("ps"))
      .agg(agg(col("ps")).as("bits"))
      .head().getSeq[Long](0).toArray
  }

  /** `true` iff every bit position of `key` is set in `bits` — pure
    * codegen'd expressions over the literal bitmap. */
  def mightContain(key: Column, bits: Array[Long]): Column =
    forall(positions(key), p =>
      call_function("shiftright",
        element_at(lit(bits), (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1)

  /** Bloom-pruned left-semi join: prefilter `big` by the bitmap of
    * `small`'s keys, then the exact semi join. Result = plain semi join. */
  def semiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String): DataFrame = {
    // xxhash64 is input-type-sensitive (int and bigint hash different
    // byte widths): a type mismatch between build and probe would set
    // different bit positions and silently DROP matching rows — a false
    // negative the exact join after the filter cannot restore. Fail fast.
    val (bt, st) = (big.schema(bigKey).dataType, small.schema(smallKey).dataType)
    require(bt == st,
      s"bloom join keys must share a type: $bigKey is $bt, $smallKey is $st (cast first)")
    val bits = sketch(small, col(smallKey))
    big.filter(mightContain(col(bigKey), bits))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
