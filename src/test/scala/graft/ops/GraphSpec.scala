package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, cliques and separate components") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val traces = scala.collection.mutable.Buffer[String]()
    val labels = Graph.connectedComponents(pairs, trace = traces += _)
    val got = labels.as[(Long, Long)].collect().toSet
    labels.unpersist()
    assert(got == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // the delta frontier monotonically empties and is traced per round
    assert(traces.nonEmpty && traces.last.endsWith("frontier=0"))
  }

  test("a long path still converges (frontier walks the diameter)") {
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val labels = Graph.connectedComponents(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    labels.unpersist()
    assert((1 to n).forall(i => got(i.toLong) == 1L))
  }

  test("non-convergence releases every pin before throwing (no cache leak)") {
    // persist() pins never GC-reap, so the failure path must release
    // them itself — a streaming foreachBatch retry loop re-attempting a
    // failing micro-batch would otherwise leak one O(vertices) cache
    // entry per attempt
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = (1 until 12).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Graph.connectedComponents(pairs, maxIter = 2)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"non-convergence leaked pinned RDDs: $leaked")
  }
}
