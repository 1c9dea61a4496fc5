package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k sketch: the k smallest distinct values per group.
  *
  * The classic mergeable sketch for distributed distinct estimation (KMV —
  * k minimum values): each partition keeps only its k smallest hashes
  * (map-side partial aggregation), merges are a k-bounded sorted union, so
  * a 100 TB groupBy ships at most k strings per group per partition instead
  * of the full value set. Distinct-count estimate: (k-1) / kth-min-fraction.
  *
  * Implemented as a typed [[Aggregator]] (exposed untyped via
  * `functions.udaf`); the buffer is a sorted, deduplicated, k-truncated
  * list, so the invariants hold at every partial step.
  */
case class BottomK(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k > 0)

  override def zero: Seq[String] = Vector.empty

  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null || (b.length == k && b.last <= a)) b
    else merge(b, Vector(a))

  override def merge(x: Seq[String], y: Seq[String]): Seq[String] = {
    // sorted-union of two sorted deduped lists, truncated to k
    val out = Vector.newBuilder[String]
    var (i, j, n) = (0, 0, 0)
    var last: String = null
    while (n < k && (i < x.length || j < y.length)) {
      val next =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (next != last) { out += next; last = next; n += 1 }
    }
    out.result()
  }

  override def finish(r: Seq[String]): Seq[String] = r

  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

/** [[BottomK]] over longs — k smallest distinct values per group with the
  * same k-bounded sorted-union merge, for numeric keys (e.g. posting-list
  * heads keyed by doc id) where string padding would be a detour. */
case class BottomKLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length == k && b.last <= a) b else merge(b, Vector(a))

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    var first = true
    while (n < k && (i < x.length || j < y.length)) {
      val next =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (first || next != last) { out += next; last = next; first = false; n += 1 }
    }
    out.result()
  }

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BottomK {
  /** Untyped column aggregate: bottomK(8)(col) usable in df.groupBy.agg. */
  def bottomK(k: Int): Column => Column = {
    val fn = udaf(BottomK(k))
    c => fn(c)
  }

  /** Numeric twin: bottomKLong(8)(col) over a LongType column. */
  def bottomKLong(k: Int): Column => Column = {
    val fn = udaf(BottomKLong(k))
    c => fn(c)
  }
}
