package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q66's scale contract: the pack-group salt grows with input size so
  * the cumsum window's parallelism is never a fixed constant. */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, 100L)).toDF("doc_id", "n_tokens")

  test("pack-group count scales with input size (floor 8)") {
    val small = TextQueries.sequencePack(docs(100))
    assert(small.agg(max("pack_group")).head().getInt(0) <= 7,
      "≤ PackGroupSize*8 docs stay within the 8-group floor")

    val n = TextQueries.PackGroupSize * 32 // → 32 possible groups
    val big = TextQueries.sequencePack(docs(n))
    val groups = big.select("pack_group").distinct().count()
    assert(groups > 8, s"salt must scale with input size: got $groups groups")
    assert(groups <= 32)
  }

  test("token cumsum is a per-group prefix sum in doc_id order") {
    val out = TextQueries.sequencePack(docs(500)).persist()
    // last cum per group == group's token total
    val mismatch = out.groupBy("pack_group")
      .agg(max("cum_tokens").as("last_cum"), sum("n_tokens").as("total"))
      .filter(col("last_cum") =!= col("total")).count()
    assert(mismatch == 0)
    // seq boundaries: every sequence id is the 2048-bin of its offset
    assert(out.filter(col("seq_id") =!=
      floor((col("cum_tokens") - col("n_tokens")) / 2048)).count() == 0)
    out.unpersist()
  }
}
