package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** The wide-set arm of [[AtomicRewrite.partitionPredicate]]: past
  * [[AtomicRewrite.MaxInlinedPartitionTerms]] values the predicate is
  * built as ONE InSet node directly (values pre-converted to their
  * catalyst representation) instead of `isin`'s per-value Literal
  * children. These specs pin that the direct construction filters
  * identically to the narrow `isin` arm — int and string types, NULL
  * arm included — at a width that exercises the InSet branch. */
class InSetPredicateSpec extends SparkSpec {
  import spark.implicits._

  private val wide = AtomicRewrite.MaxInlinedPartitionTerms + 100

  test("wide int set filters exactly (InSet arm)") {
    val rows = (0 until wide).map(i => Row(i * 2: java.lang.Integer))
    val pred = AtomicRewrite.partitionPredicate(Seq("k"), rows)
    val hits = spark.range(0, wide * 2L).select($"id".cast("int").as("k"))
      .filter(pred).as[Int].collect().sorted
    assert(hits.length == wide)
    assert(hits.forall(_ % 2 == 0))
    assert(hits.head == 0 && hits.last == (wide - 1) * 2)
  }

  test("wide string set filters exactly, and the NULL arm still matches") {
    val rows = (0 until wide).map(i => Row(s"p$i")) :+ Row(null)
    val pred = AtomicRewrite.partitionPredicate(Seq("k"), rows)
    val data = ((0 until wide * 2).map(i => s"p$i") ++ Seq(null, "q1"))
      .toDF("k")
    val hits = data.filter(pred).collect().map(_.getString(0))
    assert(hits.count(_ == null) == 1)
    assert(hits.count(_ != null) == wide)
    assert(!hits.contains("q1"))
  }

  test("narrow and wide arms agree on the same membership") {
    val narrowRows = (0 until 50).map(i => Row(i: java.lang.Integer))
    val narrow = AtomicRewrite.partitionPredicate(Seq("k"), narrowRows)
    // same values padded into the wide arm by adding disjoint extras
    val wideRows = narrowRows ++
      (10000 until 10000 + wide).map(i => Row(i: java.lang.Integer))
    val widePred = AtomicRewrite.partitionPredicate(Seq("k"), wideRows)
    val base = spark.range(0, 100).select($"id".cast("int").as("k"))
    val a = base.filter(narrow).as[Int].collect().sorted
    val b = base.filter(widePred).as[Int].collect().sorted
    assert(a.sameElements(b))
  }
}
