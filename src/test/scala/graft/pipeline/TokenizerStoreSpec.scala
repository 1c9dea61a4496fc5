package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Contract of the persisted tokenizer: the committed merge list is the
  * training argmax sequence, encoding through the store reproduces the
  * inline q110 trainer+encoder exactly, unseen text encodes with the
  * learned merges, and retraining replaces the artifact atomically.
  */
class TokenizerStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("store encode == the inline q110 trainer on the training corpus") {
    val root = Files.createTempDirectory("graft-tok").toString
    val docs = Tables.load(spark, sf, "documents")
    TokenizerStore.train(spark, root, docs,
      rounds = graft.queries.TextQueries.BpeRounds)
    val m = TokenizerStore.merges(spark, root).collect()
    assert(m.length == graft.queries.TextQueries.BpeRounds)
    assert(m.map(_.getInt(0)).toSeq == (1 to m.length))
    m.foreach { r =>
      assert(r.getString(2) == r.getString(1).replace(" ", ""))
    }
    val enc = TokenizerStore.encode(spark, root, docs)
      .select(col("doc_id"), col("n_tokens"))
    val inline = graft.queries.TextQueries.defs("q110_bpe_encode")(spark, sf)
      .select(col("doc_id"), col("n_encoded").as("n_tokens"))
    assert(enc.exceptAll(inline).isEmpty && inline.exceptAll(enc).isEmpty,
      "store encoding must reproduce the inline trainer+encoder")
  }

  test("unseen text encodes with the learned merges; retrain replaces") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tok2").toString
    val docs = Tables.load(spark, sf, "documents")
    TokenizerStore.train(spark, root, docs, rounds = 2)
    val top = TokenizerStore.merges(spark, root).collect()(0)
    // a fresh document containing the rank-1 pair adjacently must come
    // back with the merged unit as ONE token
    val unseen = Seq((1L, top.getString(1))).toDF("doc_id", "text")
    val enc = TokenizerStore.encode(spark, root, unseen).head()
    assert(enc.getSeq[String](1).contains(top.getString(2)),
      s"expected merged unit ${top.getString(2)} in ${enc.getSeq[String](1)}")
    // retraining with a different round count replaces the artifact
    TokenizerStore.train(spark, root, docs, rounds = 1)
    assert(TokenizerStore.merges(spark, root).count() == 1)
  }

  test("a pair-less corpus passes through: zero merges, docs survive encode") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tok-nopair").toString
    // every doc is a single subword -> no adjacent pair anywhere; the
    // argmax sentinel must stop training AND keep every doc in encode
    // (an empty argmax frame would cross-join the corpus away)
    val solo = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    TokenizerStore.train(spark, root, solo, rounds = 3)
    assert(TokenizerStore.merges(spark, root).count() == 0,
      "no adjacent pairs -> no merges")
    val enc = TokenizerStore.encode(spark, root, solo).collect()
    assert(enc.length == 2 && enc.forall(_.getLong(2) == 1L),
      "every single-subword doc must survive unmerged")
  }

  test("a 512+-merge vocabulary trains and round-trips through encodeChunked") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tok-big").toString
    // two 300-token docs of globally UNIQUE all-alpha tokens: every
    // adjacent pair is unique (freq 1), so each round merges exactly one
    // occurrence — 598 merges available, headroom for 515 rounds.
    // (Repetitive tokens would collapse many positions per merge and
    // exhaust the corpus early; digits would split into subwords.)
    def alpha(n: Int): String =
      "" + ('a' + n / 676).toChar + ('a' + (n / 26) % 26).toChar +
        ('a' + n % 26).toChar
    val texts = (0 until 2).map(i =>
      (i.toLong, (0 until 300).map(j => alpha(i * 300 + j)).mkString(" ")))
    val corpus = texts.toDF("doc_id", "text")
    val rounds = 515
    TokenizerStore.train(spark, root, corpus, rounds = rounds)
    val ms = TokenizerStore.merges(spark, root).collect()
    assert(ms.length == rounds, s"expected $rounds merges, got ${ms.length}")

    // a vocabulary past the single-projection bound refuses encode()
    // loudly and round-trips through the chunked path instead
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.encode(spark, root, corpus)
    }
    assert(e.getMessage.contains("encodeChunked"))

    // ground truth: the inline Bpe.applyMerge chain applied driver-side
    // on the same double-space encoding (replace is the same sequential
    // left-to-right scan in UTF8String, java.lang.String and DuckDB)
    val pairs = ms.map(_.getString(1))
    def inline(text: String): Seq[String] = {
      var s = " " + text.split("\\s+").mkString("  ") + " "
      for (p <- pairs)
        s = s.replace(" " + p.replace(" ", "  ") + " ",
          " " + p.replace(" ", "") + " ")
      s.trim.split("  ").toSeq
    }
    val got = TokenizerStore.encodeChunked(spark, root, corpus)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    texts.foreach { case (id, text) =>
      assert(got(id) == inline(text),
        s"doc $id: chunked encode diverged from the inline merge chain")
    }
    // and a different chunk size yields the identical result (chunking
    // is an execution shape, never a semantic)
    val got64 = TokenizerStore.encodeChunked(spark, root, corpus, chunkSize = 64)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(got64 == got)
    spark.catalog.clearCache()
  }

  test("training is deterministic across runs") {
    val r1 = Files.createTempDirectory("graft-tok-a").toString
    val r2 = Files.createTempDirectory("graft-tok-b").toString
    val docs = Tables.load(spark, sf, "documents")
    TokenizerStore.train(spark, r1, docs, rounds = 3)
    TokenizerStore.train(spark, r2, docs, rounds = 3)
    assert(TokenizerStore.merges(spark, r1).collect().toSeq ==
      TokenizerStore.merges(spark, r2).collect().toSeq)
  }

  test("reliable-checkpoint barriers (checkpointDir) train and encode identically") {
    import spark.implicits._
    // the durability knob for long production runs: localCheckpoint
    // blocks die with an executor; a checkpointDir-backed barrier
    // survives — and must be a pure execution shape, never a semantic
    val rLocal = Files.createTempDirectory("graft-tok-l").toString
    val rDurable = Files.createTempDirectory("graft-tok-d").toString
    val ckpt = Files.createTempDirectory("graft-tok-ckpt").toString
    val docs = Tables.load(spark, sf, "documents").limit(50)
    TokenizerStore.train(spark, rLocal, docs, rounds = 4)
    TokenizerStore.train(spark, rDurable, docs, rounds = 4,
      checkpointDir = Some(ckpt))
    assert(TokenizerStore.merges(spark, rLocal).collect().toSeq ==
      TokenizerStore.merges(spark, rDurable).collect().toSeq)
    // checkpoint hygiene: Spark never cleans reliable checkpoints
    // itself, so a 32k-round production train would leave O(rounds)
    // full corpus copies on disk. train deletes superseded rounds as
    // each next barrier lands and removes the whole run dir once the
    // merge table (the durable artifact) commits — ZERO files remain.
    def ckptFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(ckpt))
    }
    assert(ckptFiles().isEmpty,
      s"train must clean its reliable checkpoints, left ${ckptFiles()}")
    val a = TokenizerStore.encodeChunked(spark, rLocal, docs, chunkSize = 1)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val b = TokenizerStore.encodeChunked(spark, rDurable, docs, chunkSize = 1,
      checkpointDir = Some(ckpt))
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(a == b)
    // encodeChunked's returned frame reads its FINAL barrier, so that
    // one round dir must survive (session-lifetime) — and ONLY that
    // one: the superseded chunks (4 merges at chunkSize=1 -> 4 rounds)
    // deleted as the chain advanced. This also proves reliable barriers
    // actually landed under the caller's dir.
    val roundDirs = {
      def dirs(f: java.io.File): Seq[java.io.File] =
        if (!f.isDirectory) Nil
        else f.listFiles().toSeq.flatMap(dirs) :+ f
      dirs(new java.io.File(ckpt)).filter(_.getName.startsWith("round-"))
    }
    assert(roundDirs.size == 1 && ckptFiles().nonEmpty,
      s"exactly the final chunk's checkpoint must remain, got " +
        s"${roundDirs.map(_.getName)}")
    spark.catalog.clearCache()
  }
}
