package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for the dedup suite.
  *
  * [[connectedComponents]] is a delta-iteration (signal/collect) min-label
  * propagation: labels live only on vertices that appear in an edge — an
  * isolated vertex is trivially its own component and joins nothing — and
  * each round sends messages only FROM the frontier whose label changed
  * last round. Min-labels decrease monotonically, so a vertex whose label
  * did not change has nothing new to say; every message it could send was
  * already folded in the round it last changed. Post-LSH dedup graphs have
  * tiny component diameter, so the frontier collapses after round one and
  * late rounds join a handful of rows against the edge list instead of
  * re-materializing every label.
  *
  * Scale: work per round is O(frontier ⋈ edges), not O(vertices); the
  * edge list is hash-partitioned on dst for the message join and the
  * label state on id for the update join — the classic Pregel-style
  * shape, expressed as two equi-joins Catalyst plans with AQE.
  */
object Graph {

  /** Min-label connected components over an (undirected) pair list.
    *
    * Every round materializes through a lineage-severing BARRIER: an
    * iterative dataflow that rebinds `labels = f(labels, ...)` otherwise
    * DOUBLES its logical plan per round (the update join references the
    * previous labels twice), and analysis cost goes exponential in the
    * component diameter. The barrier pins the round's rows at the
    * InternalRow level — `queryExecution.toRdd`, row-copied and
    * persisted MEMORY_AND_DISK, re-wrapped as a `LogicalRDD` leaf — so
    * downstream rounds see a constant-depth plan over the stored
    * UnsafeRows with ZERO per-row conversion on either side. (A
    * Dataset-level `persist()` would columnar-encode every round and
    * decode on every read; `Dataset.rdd` + `createDataFrame` would pay
    * a full Row serde round-trip; `localCheckpoint` would store the
    * same rows but its pins are invisible to explicit release and free
    * only at some future GC — a long-running caller's executor storage
    * must not depend on GC timing.) Superseded rounds release as each
    * next round materializes; blocks lost to an executor recompute
    * through the preserved RDD lineage, one round at a time.
    *
    * @param pairs  one row per undirected edge, columns `srcCol`/`dstCol`
    *               (symmetrized internally)
    * @param trace  per-round observability hook (iteration, frontier size)
    * @return labels `(id, component)` for every vertex present in `pairs`,
    *         component = min vertex id of the component. Vertices absent
    *         from `pairs` are the caller's to attach (their component is
    *         their own id). The frame comes back PINNED (one persisted
    *         copy of the final labels, O(edge vertices)); the caller
    *         unpersists it once consumed — the
    *         [[graft.pipeline.NearDupStore]] contract.
    */
  /** Pair-count bound under which CC runs as ONE driver-side union-find
    * over the collected edge list instead of the distributed delta
    * iteration — the join-strategy analog of broadcast-vs-shuffle,
    * decided from the materialized pair count exactly like a broadcast
    * decision is from relation size. A post-LSH dedup pair list is tiny
    * relative to its corpus by construction (band collision + estimate
    * threshold), so at bench scales the distributed path's ~6 jobs per
    * round were pure scheduling overhead over a few thousand edges; at
    * 100 TB the pair list blows past the bound and the delta iteration
    * runs unchanged. 2²⁰ pairs ≈ 16 MB of collected longs — broadcast-
    * sized driver traffic. Override with `graft.cc.maxDriverPairs`. */
  val MaxDriverPairs: Long = 1L << 20

  def connectedComponents(pairs: DataFrame,
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 50,
                          trace: String => Unit = _ => ()): DataFrame = {
    val spark = pairs.sparkSession
    // the pair list is materialized ONCE (persist + count) to drive the
    // strategy choice; both strategies then read the pinned copy — the
    // distributed path previously evaluated the (expensive — shingle
    // self-join upstream) pair plan through the symmetrizing union
    // NULL endpoints drop BEFORE the strategy choice, so both strategies
    // see the same edge set: the driver path required non-null loudly
    // while the distributed joins silently never matched them — the same
    // pipeline could crash or succeed depending only on the pair count.
    // Engine pair-formers never produce nulls (join/explode keys); this
    // pins the policy for a future nullable caller.
    val p2 = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = p2.count()
    val bound = spark.conf.getOption("graft.cc.maxDriverPairs")
      .map(_.toLong).getOrElse(MaxDriverPairs)
    val dt = p2.schema("src").dataType
    val integral = dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType ||
      dt == org.apache.spark.sql.types.ShortType ||
      dt == org.apache.spark.sql.types.ByteType
    if (nPairs <= bound && integral &&
        dt == p2.schema("dst").dataType) {
      trace(s"driver-CC pairs=$nPairs")
      val out = driverComponents(p2, dt)
      p2.unpersist()
      return out
    }
    // (severed leaf view, releasable pin, row count). The row copy is
    // the Dataset.checkpoint recipe: toRdd's UnsafeRows are buffer-
    // reused within a partition, and pinned storage needs stable
    // objects. Unpersisting the pin later falls back to lineage
    // recompute, never a lost-forever block.
    def barrier(df: DataFrame): (DataFrame, RDD[InternalRow], Long) = {
      val pinned = df.queryExecution.toRdd.map(_.copy())
      pinned.persist(StorageLevel.MEMORY_AND_DISK)
      val n = pinned.count() // materialize BEFORE any predecessor releases
      (GraftShim.internalCreateDataFrame(spark, pinned, df.schema), pinned, n)
    }
    val edges = p2
      .unionByName(p2.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var (labels, labelsPin, _) = barrier(
      edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id")))
    var changed = labels // round 0: every vertex speaks once
    var changedPin = labelsPin
    var frontier = -1L
    var iter = 0
    while (frontier != 0L && iter < maxIter) {
      val nbrMin = edges
        .join(changed.select(col("id").as("dst"), col("component").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      val (updates, updatesPin, n) = barrier(
        nbrMin.join(labels, Seq("id"))
          .filter(col("nmin") < col("component"))
          .select(col("id"), col("nmin").as("component")))
      frontier = n
      val prevLabelsPin = labelsPin
      if (frontier > 0L) {
        val (nl, nlPin, _) = barrier(
          labels
            .join(updates.select(col("id"), col("component").as("__new")),
              Seq("id"), "left")
            .select(col("id"),
              coalesce(col("__new"), col("component")).as("component")))
        labels = nl
        labelsPin = nlPin
      }
      // the round's new barriers are materialized — the previous
      // round's blocks release NOW, not at some future GC (round 0's
      // `changed` IS the initial labels frame: release once)
      if (changedPin ne prevLabelsPin) changedPin.unpersist()
      if (labelsPin ne prevLabelsPin) prevLabelsPin.unpersist()
      changed = updates
      changedPin = updatesPin
      iter += 1
      trace(s"delta-CC iter=$iter frontier=$frontier")
    }
    edges.unpersist()
    p2.unpersist()
    // the terminal (empty-frontier) updates frame is still pinned
    if (changedPin ne labelsPin) changedPin.unpersist()
    // silent under-merging would split components and let near-dups
    // through every downstream dedup decision — fail loudly instead.
    // Release the labels pin FIRST: pins are never GC-reaped, so
    // throwing with it held would leak one O(vertices) storage entry
    // per retry of a failing micro-batch
    if (frontier != 0L) {
      labelsPin.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(frontier=$frontier) — component diameter exceeds maxIter")
    }
    // the caller's handle: one Dataset-level pin of the FINAL labels
    // (its `unpersist()` genuinely releases the blocks, and its plan is
    // a single severed leaf), materialized before the last round's RDD
    // pin releases
    val out = labels.persist()
    out.count()
    labelsPin.unpersist()
    out
  }

  /** Driver-side min-label CC over a collected (integral-typed) pair
    * list: union-find with path halving, then one pass per component to
    * its MIN member — semantically identical to the delta iteration
    * (component = min vertex id of the component, vertices = those
    * present in the pairs; integral casts to long are order-preserving,
    * so the min is the same value). Returns the same pinned-frame
    * contract as the distributed path. The result rides back as an
    * RDD-backed frame (constant-size plan — never a LocalRelation that
    * would inline O(vertices) rows into every downstream plan). */
  private def driverComponents(p2: DataFrame,
      dt: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = p2.sparkSession
    val edges = p2
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
    // index vertices densely so union-find runs over int arrays
    // Integer values, not Int: a primitive-valued java.util.HashMap
    // unboxes an absent key's null to 0, so the miss test must see the
    // boxed reference
    val idOf = new java.util.HashMap[java.lang.Long, Integer](edges.length * 2)
    val ids = new scala.collection.mutable.ArrayBuffer[Long]()
    def idx(v: Long): Int = {
      val got = idOf.get(v)
      if (got != null) got.intValue()
      else { val i = ids.length; idOf.put(v, Integer.valueOf(i)); ids += v; i }
    }
    val parent = new Array[Int](edges.length * 2)
    var n = 0
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    edges.foreach { r =>
      // NULL endpoints cannot occur here: both strategies see the same
      // pair frames, whose endpoints are join/explode keys — but guard
      // loudly rather than NPE on a future caller's nullable column
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "connectedComponents: NULL edge endpoint")
      val a = idx(r.getLong(0)); val b = idx(r.getLong(1))
      while (n < ids.length) { parent(n) = n; n += 1 }
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(ra) = rb
    }
    // min label per root, then one (id, component) row per vertex
    val minOf = new Array[Long](ids.length)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    var i = 0
    while (i < ids.length) {
      val r = find(i)
      if (ids(i) < minOf(r)) minOf(r) = ids(i)
      i += 1
    }
    val labels = new Array[(Long, Long)](ids.length)
    i = 0
    while (i < ids.length) { labels(i) = (ids(i), minOf(find(i))); i += 1 }
    import spark.implicits._
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      labels.length / 65536 + 1))
    val out = spark.sparkContext.parallelize(labels.toIndexedSeq, slices)
      .toDF("id", "component")
      .select(col("id").cast(dt).as("id"),
        col("component").cast(dt).as("component"))
      .persist()
    out.count()
    out
  }
}
