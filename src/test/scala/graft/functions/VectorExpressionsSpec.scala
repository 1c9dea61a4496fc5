package graft.functions

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
    (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f))).toDF("a", "b")

  test("native cosine/dot are bit-identical to the HOF formulation") {
    val rows = vecs.select(
      GraftFunctions.cosine(col("a"), col("b")).as("nc"),
      VectorOps.cosine(col("a"), col("b")).as("hc"),
      GraftFunctions.dot(col("a"), col("b")).as("nd"),
      VectorOps.dot(col("a"), col("b")).as("hd"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (nc, hc, nd, hd) =>
      assert(java.lang.Double.doubleToLongBits(nc) == java.lang.Double.doubleToLongBits(hc))
      assert(java.lang.Double.doubleToLongBits(nd) == java.lang.Double.doubleToLongBits(hd))
    }
  }

  test("null inputs yield null (null-intolerant)") {
    val out = Seq((Some(Seq(1f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(out.isEmpty)
  }

  test("codegen path executes over a large column batch") {
    // wide enough to go through WholeStageCodegen, not just interpreted eval
    val n = 10000
    val df = spark.range(n).select(
      transform(sequence(lit(0), lit(15)),
        i => (col("id") % 7 + i).cast("float")).as("a"),
      transform(sequence(lit(0), lit(15)),
        i => (col("id") % 5 + i * 2).cast("float")).as("b"))
    val s = df.select(GraftFunctions.cosine(col("a"), col("b")).as("c"))
      .agg(sum("c")).as[Double].head()
    assert(s > 0 && s <= n.toDouble)
  }

  test("SQL registration: graft_cosine / graft_dot usable from spark.sql") {
    GraftFunctions.registerTo(spark)
    vecs.createOrReplaceTempView("vec_pairs")
    val r = spark.sql(
      "SELECT graft_cosine(a, b) AS c, graft_dot(a, b) AS d FROM vec_pairs LIMIT 1")
      .as[(Double, Double)].head()
    assert(math.abs(r._2 - 32.0) < 1e-9) // 1*4 + 2*5 + 3*6
    assert(r._1 > 0.97 && r._1 < 0.98)
  }
}
