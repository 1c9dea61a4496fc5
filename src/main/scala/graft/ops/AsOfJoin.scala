package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left (probe) row, the payload of the latest right
  * (reference) row with `rightTs <= leftTs` on the same key. Spark has no
  * built-in as-of join; the naive range-join formulation explodes into a
  * per-key cross product. This is the scalable merge formulation:
  *
  *   union both sides tagged → one shuffle on the key → running
  *   `last(payload ignoreNulls)` over (ts, side) order → keep probe rows.
  *
  * Cost: one shuffle + one sort, independent of how many reference rows
  * precede each probe (vs. O(probes × refs) for the range join). Ties at
  * equal timestamps resolve reference-before-probe, i.e. inclusive `<=`.
  * Reference rows must be unique per (key, ts) — pre-dedup otherwise.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val pTypes = payload.map(c => c -> right.schema(c).dataType).toMap

    val probes = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__probe") +:
        lCols.map(col)) ++
        payload.map(c => lit(null).cast(pTypes(c)).as(s"__p_$c")): _*)
    val refs = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__probe") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(probes.unionByName(refs)) { (d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__probe") === 1)
      .select(lCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }
}
