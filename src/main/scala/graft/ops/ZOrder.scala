package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-column clustering — the OPTIMIZE
  * ZORDER analog for [[graft.tx.AtomicRewrite.compact]]'s `clusterBy`:
  * range-partitioning + sorting by the interleaved key gives every
  * parquet file a tight min/max envelope on BOTH columns, so data
  * skipping works for predicates on either one (a plain sort only
  * serves its leading column).
  *
  * Pure stock expressions (aggregate over a bit sequence — codegen'd,
  * no UDF), and deliberately replayable in ANSI/DuckDB SQL for the
  * oracle (q82).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, b) =>
      acc
        + call_function("shiftleft",
            call_function("shiftright", x, b).bitwiseAND(lit(1L)), b * 2)
        + call_function("shiftleft",
            call_function("shiftright", y, b).bitwiseAND(lit(1L)), b * 2 + 1))
  }

  /** Reference implementation for specs. */
  def interleave2Ref(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((acc, b) =>
      acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
}
