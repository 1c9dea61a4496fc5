package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * Every round's label frame is eagerly `localCheckpoint`ed: an
    * iterative dataflow that rebinds `labels = f(labels, ...)` otherwise
    * DOUBLES its logical plan per round (the update join references the
    * previous labels twice), and analysis cost goes exponential in the
    * component diameter. Checkpointing truncates lineage to the
    * materialized blocks — label frames are O(edge vertices), tiny next
    * to the edge list. (At production scale on lossy executors, swap for
    * reliable `checkpoint` into the job's checkpoint dir.)
    *
    * Superseded rounds' blocks are unpersisted EAGERLY as each next
    * round materializes — never left to GC reaping, whose timing a
    * long-running caller (the streaming near-dup stage) cannot rely on
    * for flat executor storage. Only the RETURNED labels frame stays
    * pinned; the caller owns releasing it once consumed (the
    * [[graft.pipeline.NearDupStore]] contract). Unpersisting a
    * localCheckpointed frame frees its blocks for good — safe here
    * because each round's eager checkpoint is fully materialized before
    * its predecessor releases, the same executor-loss trade the
    * checkpoint choice already documents.
    *
    * @param pairs  one row per undirected edge, columns `srcCol`/`dstCol`
    *               (symmetrized internally)
    * @param trace  per-round observability hook (iteration, frontier size)
    * @return labels `(id, component)` for every vertex present in `pairs`,
    *         component = min vertex id of the component. Vertices absent
    *         from `pairs` are the caller's to attach (their component is
    *         their own id).
    */
  def connectedComponents(pairs: DataFrame,
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 50,
                          trace: String => Unit = _ => ()): DataFrame = {
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = labels // round 0: every vertex speaks once
    var frontier = -1L
    var iter = 0
    while (frontier != 0L && iter < maxIter) {
      val nbrMin = edges
        .join(changed.select(col("id").as("dst"), col("component").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      val updates = nbrMin.join(labels, Seq("id"))
        .filter(col("nmin") < col("component"))
        .select(col("id"), col("nmin").as("component"))
        .localCheckpoint(true)
      frontier = updates.count()
      val prevLabels = labels
      if (frontier > 0L) {
        labels = labels
          .join(updates.select(col("id"), col("component").as("__new")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__new"), col("component")).as("component"))
          .localCheckpoint(true)
      }
      // the round's new checkpoints are fully materialized — the
      // previous round's blocks release NOW, not at some future GC
      // (round 0's `changed` IS the initial labels frame: release once)
      if (changed ne prevLabels) changed.unpersist()
      if (labels ne prevLabels) prevLabels.unpersist()
      changed = updates
      iter += 1
      trace(s"delta-CC iter=$iter frontier=$frontier")
    }
    edges.unpersist()
    // the terminal (empty-frontier) updates frame is still pinned
    if (changed ne labels) changed.unpersist()
    // silent under-merging would split components and let near-dups
    // through every downstream dedup decision — fail loudly instead
    if (frontier != 0L)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(frontier=$frontier) — component diameter exceeds maxIter")
    labels
  }
}
