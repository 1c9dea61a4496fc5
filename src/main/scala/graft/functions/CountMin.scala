package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.util.hashing.MurmurHash3

/** Count-min sketch: fixed-size frequency summary with one-sided error.
  *
  * The mergeable heavy-hitter sketch (Cormode & Muthukrishnan 2005): a
  * `depth × width` grid of counters; each value increments one counter
  * per row (independent hash per row); the estimate for a value is the
  * MIN over its `depth` counters. Estimates never undercount and
  * overcount by at most ~`2N/width` with high probability — so a 100 TB
  * groupBy ships a constant `depth·width·8` bytes per group per
  * partition (map-side partial aggregation) instead of a full
  * per-value count map, the same scale story as [[BottomK]] and HLL.
  *
  * Implemented as a typed [[Aggregator]] over a flat `Array[Long]`
  * buffer (exposed untyped via `functions.udaf`); merge is elementwise
  * addition, so partials combine in any order and grouping.
  */
case class CountMin(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], a: String): Array[Long] = {
    if (a != null) {
      var d = 0
      while (d < depth) { b(d * width + CountMin.cell(a, d, width)) += 1; d += 1 }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  /** Counter column of value `v` in hash row `row` (seeded murmur3,
    * folded to [0, width)). */
  def cell(v: String, row: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(v, row * 0x9E3779B9 + 1)
    ((h % width) + width) % width
  }

  /** Point estimate: min over the value's `depth` counters. Never below
    * the true count; above it by at most the row's collision mass. */
  def estimate(sketch: Seq[Long], v: String, depth: Int, width: Int): Long = {
    var d = 0
    var m = Long.MaxValue
    while (d < depth) {
      val c = sketch(d * width + cell(v, d, width))
      if (c < m) m = c
      d += 1
    }
    m
  }

  /** Untyped column aggregate: countMin(4, 1024)(col) in df.groupBy.agg. */
  def countMin(depth: Int, width: Int): Column => Column = {
    val fn = udaf(CountMin(depth, width))
    c => fn(c)
  }
}
