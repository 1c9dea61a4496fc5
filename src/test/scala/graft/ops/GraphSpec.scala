package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the driver-side union-find fast path disabled, so
    * the distributed delta iteration is what's under test. */
  private def distributedOnly[T](body: => T): T = {
    spark.conf.set("graft.cc.maxDriverPairs", "0")
    try body finally spark.conf.unset("graft.cc.maxDriverPairs")
  }

  private val expectedSmall = Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)

  test("connectedComponents labels chains, cliques and separate components " +
      "(distributed path)") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    distributedOnly {
      val traces = scala.collection.mutable.Buffer[String]()
      val labels = Graph.connectedComponents(pairs, trace = traces += _)
      val got = labels.as[(Long, Long)].collect().toSet
      labels.unpersist()
      assert(got == expectedSmall)
      // the delta frontier monotonically empties and is traced per round
      assert(traces.nonEmpty && traces.last.endsWith("frontier=0"))
    }
  }

  test("driver-side fast path (small pair list) agrees with the " +
      "distributed iteration exactly") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val traces = scala.collection.mutable.Buffer[String]()
    val labels = Graph.connectedComponents(pairs, trace = traces += _)
    val got = labels.as[(Long, Long)].collect().toSet
    labels.unpersist()
    assert(got == expectedSmall)
    assert(traces.exists(_.startsWith("driver-CC")),
      s"expected the driver fast path below the pair bound, traced: $traces")
    // schema contract: same column names and id type as the distributed path
    val l2 = Graph.connectedComponents(pairs)
    assert(l2.columns.toSeq == Seq("id", "component"))
    assert(l2.schema("id").dataType == org.apache.spark.sql.types.LongType)
    l2.unpersist()
  }

  test("driver and distributed strategies agree on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val fast = Graph.connectedComponents(pairs)
    val gotFast = fast.as[(Long, Long)].collect().toSet
    fast.unpersist()
    val slow = distributedOnly(Graph.connectedComponents(pairs))
    val gotSlow = slow.as[(Long, Long)].collect().toSet
    slow.unpersist()
    assert(gotFast == gotSlow)
  }

  test("int-typed pair columns keep their type through the fast path") {
    val pairs = Seq((2, 1), (2, 3), (10, 11)).toDF("src", "dst")
    val labels = Graph.connectedComponents(pairs)
    assert(labels.schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(labels.schema("component").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got = labels.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    labels.unpersist()
    assert(got == Set(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("a long path still converges (frontier walks the diameter)") {
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    distributedOnly {
      val labels = Graph.connectedComponents(pairs)
      val got = labels.as[(Long, Long)].collect().toMap
      labels.unpersist()
      assert((1 to n).forall(i => got(i.toLong) == 1L))
    }
  }

  test("non-convergence releases every pin before throwing (no cache leak)") {
    // persist() pins never GC-reap, so the failure path must release
    // them itself — a streaming foreachBatch retry loop re-attempting a
    // failing micro-batch would otherwise leak one O(vertices) cache
    // entry per attempt
    distributedOnly {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val pairs = (1 until 12).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
      intercept[IllegalStateException] {
        Graph.connectedComponents(pairs, maxIter = 2)
      }
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"non-convergence leaked pinned RDDs: $leaked")
    }
  }
}
