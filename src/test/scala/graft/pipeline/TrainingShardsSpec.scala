package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the training-shard publish step: contiguity in the
  * training order, one-document-bounded token balance, a manifest that
  * matches the committed bytes, determinism, and atomic epoch
  * replacement.
  */
class TrainingShardsSpec extends SparkSpec {

  // 200 docs, token counts 10..59, train_pos = doc_id (already a total
  // order), plus a payload column that must ride along untouched
  private def corpus: DataFrame = {
    import spark.implicits._
    spark.range(200).select(col("id").as("doc_id"),
      (lit(10) + pmod(col("id") * 7, lit(50))).cast("long").as("n_tokens"),
      (col("id") + 1).as("train_pos"),
      concat(lit("payload-"), col("id")).as("text"))
  }

  test("range mode: shards are order-contiguous and token-balanced to one doc") {
    val root = Files.createTempDirectory("graft-shards").toString
    TrainingShards.build(spark, root, corpus, nShards = 5)
    val m = TrainingShards.readManifest(spark, root)
      .orderBy("shard_id").collect()
    assert(m.map(_.getInt(0)).toSeq == (0 until 5))
    // contiguous, non-overlapping training-order spans
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= a.getLong(4) && a.getLong(4) < b.getLong(3),
        s"shard spans overlap or disorder: $a vs $b")
    }
    // balance: every non-last shard within one max-doc of the target
    val total = m.map(_.getLong(2)).sum
    val target = math.ceil(total / 5.0).toLong
    val maxDoc = corpus.agg(max("n_tokens")).head().getLong(0)
    m.init.foreach { r =>
      assert(math.abs(r.getLong(2) - target) < maxDoc,
        s"shard ${r.getInt(0)} tokens ${r.getLong(2)} vs target $target")
    }
    // manifest equals an aggregate of the committed data, payload intact
    val data = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(root).shards)
    assert(data.count() == 200 &&
      data.filter(!col("text").startsWith("payload-")).count() == 0)
    val re = data.groupBy("shard_id").agg(count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"), min("train_pos").as("order_min"),
      max("train_pos").as("order_max"))
    assert(re.join(TrainingShards.readManifest(spark, root),
      Seq("shard_id", "n_docs", "n_tokens", "order_min", "order_max"))
      .count() == 5)
  }

  test("range mode is deterministic and a rebuild replaces the epoch") {
    val r1 = Files.createTempDirectory("graft-shards-a").toString
    val r2 = Files.createTempDirectory("graft-shards-b").toString
    TrainingShards.build(spark, r1, corpus, nShards = 4)
    TrainingShards.build(spark, r2, corpus, nShards = 4)
    val a = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(r1).shards)
      .select("doc_id", "shard_id")
    val b = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(r2).shards)
      .select("doc_id", "shard_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "same corpus must shard identically")
    // a rebuild from a filtered corpus fully replaces the previous epoch
    TrainingShards.build(spark, r1, corpus.filter(col("doc_id") < 100),
      nShards = 4)
    val after = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(r1).shards)
    assert(after.count() == 100 &&
      after.agg(max("doc_id")).head().getLong(0) == 99L)
    assert(TrainingShards.readManifest(spark, r1)
      .agg(sum("n_docs")).head().getLong(0) == 100L)
  }

  test("republish is partition-diffed: identical epochs write zero shard bytes") {
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-d").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.build(spark, root, corpus, nShards = 5)
    val v0 = AtomicRewrite.currentVersion(spark, p.shards).get
    val m0 = AtomicRewrite.currentVersion(spark, p.manifest).get
    // identical republish: the shard table burns NO version (zero
    // bytes), and the stamped manifest (manifest_from == committed
    // shard version) proves the committed manifest already exact — the
    // manifest write skips too. Crash repair moved from "always
    // recommit" to the stamp: any stranded state reads as stale and
    // recomputes in full (see the heal test below).
    TrainingShards.build(spark, root, corpus, nShards = 5)
    assert(AtomicRewrite.currentVersion(spark, p.shards).contains(v0),
      "an identical epoch republish must not rewrite shard bytes")
    assert(AtomicRewrite.currentVersion(spark, p.manifest).contains(m0),
      "a stamped-exact manifest must not recommit on a no-op republish")
    assert(TrainingShards.readManifest(spark, root)
      .agg(sum("n_docs")).head().getLong(0) == 200L)
    spark.catalog.clearCache()
  }

  test("manifest maintenance is O(moved shards): carried rows verbatim, stale stamp heals") {
    import spark.implicits._
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-m").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.buildHashed(spark, root, corpus, nShards = 8)
    val m1 = TrainingShards.readManifest(spark, root)
      .collect().map(r => r.getInt(0) -> r).toMap
    val extra = Seq((500L, 10L, 501L, "payload-500"))
      .toDF("doc_id", "n_tokens", "train_pos", "text")
    // the new doc's shard, computed through the engine's own hash
    val newShard = Seq(500L).toDF("doc_id").select(
      pmod(xxhash64(lit("shard"), col("doc_id")), lit(8L)).cast("int"))
      .head().getInt(0)
    // make every BYSTANDER shard's committed DATA pages unreadable
    // (header bytes smashed, parquet footer left intact so schema
    // probes still pass): the incremental manifest must re-aggregate
    // only the moved shard's partition and carry the other rows from
    // the committed manifest — a full recompute (the old behavior)
    // would read bystander rows and throw here
    def corrupt(): Unit = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) {
          if (f.getName == "_sigs") Nil
          else f.listFiles().toSeq.flatMap(walk)
        } else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(p.shards))
        .filterNot(_.getPath.contains(s"shard_id=$newShard"))
        .foreach(f => java.nio.file.Files.write(f.toPath,
          "XXXXXXXX".getBytes, java.nio.file.StandardOpenOption.WRITE))
    }
    corrupt()
    TrainingShards.buildHashed(spark, root, corpus.unionByName(extra),
      nShards = 8)
    val m2 = TrainingShards.readManifest(spark, root)
      .collect().map(r => r.getInt(0) -> r).toMap
    // bystander rows carried byte-verbatim; the moved shard's row grew
    // by exactly the appended doc
    m1.keys.filterNot(_ == newShard).foreach(s =>
      assert(m2(s) == m1(s), s"bystander shard $s manifest row moved"))
    assert(m2(newShard).getLong(1) == m1(newShard).getLong(1) + 1)
    assert(m2(newShard).getLong(2) == m1(newShard).getLong(2) + 10)
    spark.catalog.clearCache()
  }

  test("a stale manifest stamp heals by full recompute on the next publish") {
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-s").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.build(spark, root, corpus, nShards = 4)
    val truth = TrainingShards.readManifest(spark, root).collect().toSet
    // simulate a crash between the manifest and marker writes: the
    // marker vanishes, so the stamp can no longer vouch for the
    // manifest — the next publish must recompute in full and re-stamp
    assert(new java.io.File(p.manifestFrom).delete())
    TrainingShards.build(spark, root, corpus, nShards = 4)
    assert(TrainingShards.readManifest(spark, root).collect().toSet == truth)
    assert(new java.io.File(p.manifestFrom).exists(),
      "the healing recompute must re-stamp the manifest")
    spark.catalog.clearCache()
  }

  test("hash mode republish rewrites only the shards the new docs hash into") {
    import spark.implicits._
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-h").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.buildHashed(spark, root, corpus, nShards = 8)
    val v0 = AtomicRewrite.currentVersion(spark, p.shards).get
    // one appended doc: hash assignment is order-free, so ONLY its hash
    // shard's content moves — every other shard must ride the new
    // manifest by reference (absent from the new version dir)
    val extra = Seq((500L, 10L, 501L, "payload-500"))
      .toDF("doc_id", "n_tokens", "train_pos", "text")
    TrainingShards.buildHashed(spark, root, corpus.unionByName(extra),
      nShards = 8)
    assert(AtomicRewrite.currentVersion(spark, p.shards).contains(v0 + 1))
    val newShard = AtomicRewrite.read(spark, p.shards)
      .filter(col("doc_id") === 500L).select("shard_id").as[Int].head()
    (0 until 8).filter(_ != newShard).foreach { s =>
      assert(!new java.io.File(s"${p.shards}/v=${v0 + 1}/shard_id=$s").exists(),
        s"bystander shard $s was rewritten by a one-doc append")
    }
    // and the manifest describes the merged committed state
    assert(TrainingShards.readManifest(spark, root)
      .agg(sum("n_docs")).head().getLong(0) == 201L)
    spark.catalog.clearCache()
  }

  test("zero-token docs at the head of the order stay in shard 0") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-shards-z").toString
    // running total is still 0 at the first docs -> unclamped assignment
    // arithmetic would compute shard_id = -1 for them
    val c = Seq((1L, 0L, 1L), (2L, 0L, 2L), (3L, 10L, 3L), (4L, 10L, 4L))
      .toDF("doc_id", "n_tokens", "train_pos")
    TrainingShards.build(spark, root, c, nShards = 2)
    val data = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(root).shards)
    assert(data.count() == 4)
    assert(data.filter(col("shard_id") < 0 || col("shard_id") > 1).count() == 0,
      "every shard id must stay inside [0, nShards)")
    assert(data.filter(col("doc_id") === 1L).head().getAs[Int]("shard_id") == 0)
  }

  test("forget: erased docs gone, survivors byte-identical, manifest refreshed, bystanders untouched") {
    import spark.implicits._
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-f").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.build(spark, root, corpus, nShards = 5)
    val v0 = AtomicRewrite.currentVersion(spark, p.shards).get
    val mv0 = AtomicRewrite.currentVersion(spark, p.manifest).get
    val before = AtomicRewrite.read(spark, p.shards)
      .select("doc_id", "shard_id").as[(Long, Int)].collect().toSet

    // a forget nobody matches burns no version on either table
    assert(!TrainingShards.forget(spark, root, Seq(99999L).toDF("doc_id")))
    assert(AtomicRewrite.currentVersion(spark, p.shards).contains(v0))
    assert(AtomicRewrite.currentVersion(spark, p.manifest).contains(mv0))

    // subject set: three docs, all inside shard 0
    val subjects = AtomicRewrite.read(spark, p.shards)
      .filter(col("shard_id") === 0).select("doc_id")
      .as[Long].collect().sorted.take(3).toSeq
    def files(shard: Int) =
      new java.io.File(s"${p.shards}/v=$v0/shard_id=$shard").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val bystanders = (1 to 4).map(files)

    val matched = TrainingShards.forgetMatched(spark, root,
      subjects.toDF("doc_id"))
    assert(matched.map(_.asInstanceOf[Long]).toSet == subjects.toSet,
      "forgetMatched must return exactly the held subject ids")
    val v1 = AtomicRewrite.currentVersion(spark, p.shards).get
    assert(v1 == v0 + 1, "one forget = one shard-table commit")
    // only the touched shard partition was staged in the new version
    val staged = new java.io.File(s"${p.shards}/v=$v1").listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).toSet
    assert(staged == Set("shard_id=0"), s"staged $staged")
    assert((1 to 4).map(files) == bystanders,
      "untouched shards' files were rewritten")

    // erased rows gone; every survivor keeps its original assignment
    val after = AtomicRewrite.read(spark, p.shards)
    assert(after.join(subjects.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .isEmpty, "no shard row of a forgotten doc may survive")
    assert(after.select("doc_id", "shard_id").as[(Long, Int)].collect().toSet
      == before.filterNot { case (id, _) => subjects.contains(id) },
      "survivor assignments must be byte-identical")

    // manifest refreshed from the COMMITTED survivors, order col intact
    val m = TrainingShards.readManifest(spark, root)
    assert(m.agg(sum("n_docs")).head().getLong(0) == 197L)
    assert(m.select("order_col").distinct().as[String].collect().toSeq
      == Seq("train_pos"))
    val re = after.groupBy("shard_id").agg(count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"), min("train_pos").as("order_min"),
      max("train_pos").as("order_max"))
    assert(re.join(m, Seq("shard_id", "n_docs", "n_tokens",
      "order_min", "order_max")).count() == 5)

    // erasing EVERYTHING a shard holds removes it from the manifest too
    val shard4 = after.filter(col("shard_id") === 4).select("doc_id")
    assert(TrainingShards.forget(spark, root, shard4))
    val m2 = TrainingShards.readManifest(spark, root)
    assert(m2.select("shard_id").as[Int].collect().toSet == Set(0, 1, 2, 3),
      "a fully-erased shard must vanish from the manifest")
    spark.catalog.clearCache()
  }

  test("forget refuses a pre-order_col manifest BEFORE deleting anything") {
    import spark.implicits._
    import graft.tx.AtomicRewrite
    val root = Files.createTempDirectory("graft-shards-l").toString
    val p = TrainingShards.Paths(root)
    TrainingShards.build(spark, root, corpus, nShards = 3)
    // simulate an epoch published before the self-describing manifest
    AtomicRewrite.write(spark, p.manifest,
      TrainingShards.readManifest(spark, root).drop("order_col"))
    val v0 = AtomicRewrite.currentVersion(spark, p.shards).get
    val e = intercept[IllegalArgumentException] {
      TrainingShards.forget(spark, root, Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("re-publish"))
    // the refusal must come BEFORE the delete commits: a half-completed
    // erasure would leave the stale manifest permanently over-promising
    assert(AtomicRewrite.currentVersion(spark, p.shards).contains(v0),
      "forget deleted shard rows before discovering the manifest " +
        "cannot be refreshed")
    spark.catalog.clearCache()
  }

  test("hash mode: every doc lands exactly once, spread over the shards") {
    val root = Files.createTempDirectory("graft-shards-h").toString
    TrainingShards.buildHashed(spark, root, corpus, nShards = 4)
    val data = graft.tx.AtomicRewrite.read(spark, TrainingShards.Paths(root).shards)
    assert(data.count() == 200 &&
      data.select("doc_id").distinct().count() == 200)
    val sizes = data.groupBy("shard_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 4).toSet,
      s"expected 4 populated shards, got ${sizes.keySet}")
    // salted-hash balance: no shard dominates (loose 2x-of-fair bound)
    assert(sizes.values.max <= 100, s"degenerate shard sizes: $sizes")
    val shard0 = TrainingShards.readShard(spark, root, 0)
    assert(shard0.count() == sizes(0))
  }
}
