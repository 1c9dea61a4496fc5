package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every SparkEntry query
  * at SPARK_GRAFT_SF_DIR and prints ONE JSON line (the final "total" line;
  * its "q" field is one comma-joined string of `<id>:<median_cs>:<min_cs>`
  * triples per qNN id, in centiseconds — sized to survive the 2000-char
  * tail capture whole — while the chunked "query_medians" lines and the
  * bench_full.json file carry full names and 3-decimal triples).
  *
  * Each query is forced through the `noop` sink so the full plan executes
  * (a bare count() would let Catalyst prune projections away). One warm-up
  * query amortizes JVM/codegen/filesystem warm-up out of the first
  * measurement.
  *
  * Timings run as round-robin SWEEPS over the whole suite with a
  * deterministic CPU canary at every sweep boundary (see the
  * measurement site) — the steal-robustness design the r14 phantom
  * regressions ordered.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warm-up: JIT, codegen cache, parquet footers — one relational and
    // one text-family query (the shingle/sha/HOF paths JIT separately;
    // unwarmed they add ~10 s of compile noise to the first text query)
    spark.range(10000000L).selectExpr("sum(id * 2)").collect()
    exec("q01_clean_project")
    exec("q33_fingerprint")
    // pipeline-family warm-up: the medallion write/merge machinery
    // (snapshot commits, upsert joins, control table, partition
    // manifests) JITs separately from read-side plans; a 20-row
    // in-memory batch amortizes ~5-8 s of first-run compile noise out
    // of the q26/q52 measurements (isolation runs: q26 24.5 s cold vs
    // 12 s warm — the delta is JIT, not work)
    // a warm-up failure should cost only its warm-up benefit, never the
    // round's measurements
    try {
      import org.apache.spark.sql.functions._
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_bench_warm"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // the REAL sf tables (trimmed): whole-stage codegen caches by the
      // generated source, which embeds the schema — synthetic frames
      // would warm the JVM but miss every codegen cache entry
      val customer = graft.core.Tables.load(spark, sfDir, "customer").limit(10)
        .withColumn("updated_at", to_timestamp(lit("2020-01-01 00:00:00")))
      val orders = graft.core.Tables.load(spark, sfDir, "orders").limit(20)
      graft.pipeline.Runner.runBatch(spark, root, customer, orders,
        graft.pipeline.Runner.FixedNow, "warm")
    } catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // 3 timed runs per query as ROUND-ROBIN SWEEPS over the whole suite
    // (run all queries once, then sweep 2, then sweep 3), never 3
    // consecutive runs per query. Consecutive runs made the per-query
    // min burst-correlated: a multi-minute steal burst inflated all 3
    // draws of every query inside it, and the r14 artifact showed
    // contiguous ×2-8 "regressions" (q49-q60, q100-q118) on untouched
    // code that burned the whole adjudication budget proving phantom.
    // Under sweeps a burst inflates ONE sweep's single draw of each
    // affected query; the cross-sweep min stays honest unless the burst
    // outlasts a full suite pass (~6-8 min at sf0.1). The median keeps
    // its old reading: true median over the GOOD runs, failed runs
    // listed in "flaky" so a partial failure is visible, not min-biased.
    //
    // Per-sweep STEAL CANARY: a fixed, deterministic, single-threaded
    // CPU loop timed at every sweep boundary and emitted in the
    // artifact, so a reader tells steal from real work off the artifact
    // itself. A spiked boundary flags the sweep(s) whose draws it
    // inflated; flat canaries are NECESSARY, not sufficient, evidence
    // of a calm sweep — a burst confined strictly inside one sweep
    // (starting after a boundary, ending before the next) inflates that
    // sweep's draws with both bracketing canaries flat. The cross-sweep
    // min still absorbs any burst shorter than a full suite pass; only
    // a min-vs-anchor delta that persists across runs warrants an
    // interleaved IsoBench adjudication.
    def canarySec(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0
      while (i < (1 << 27)) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        acc += x
        i += 1
      }
      if (acc == 42L) print("") // keep the loop live under JIT
      (System.nanoTime() - t0) / 1e9
    }
    canarySec() // JIT-warm the canary itself so boundary 0 is honest
    val runsPerQuery = 3
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = Array.fill(names.size, runsPerQuery)(-1.0)
    val errs = Array.fill[Option[Throwable]](names.size)(None)
    val canaries = Array.fill(runsPerQuery + 1)(-1.0)
    for (sweep <- 0 until runsPerQuery) {
      canaries(sweep) = canarySec()
      names.zipWithIndex.foreach { case (name, qi) =>
        val t0 = System.nanoTime()
        val ok = try { exec(name); true } catch {
          case e: Throwable => if (errs(qi).isEmpty) errs(qi) = Some(e); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // release any caches a query persisted — in a 140+-query single
        // session, leaked persists compound memory pressure for the rest
        // of the suite (round-1 bench pathology)
        spark.catalog.clearCache()
        if (ok) times(qi)(sweep) = dt
      }
    }
    canaries(runsPerQuery) = canarySec()
    val results = names.zipWithIndex.map { case (name, qi) =>
      val good = times(qi).filter(_ >= 0).sorted.toSeq
      val med =
        if (good.isEmpty) -1.0
        else if (good.size % 2 == 1) good(good.size / 2)
        else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
      // the MIN travels with the median: min >> anchor means real work;
      // median >> min ≈ anchor means the host stole that query's worst
      // sweeps — and the canary column says WHICH sweeps were stolen
      val mn = if (good.isEmpty) -1.0 else good.head
      (name, med, mn, good.size, errs(qi))
    }
    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    // The capture window that ingests this output keeps only a ~2 kB TAIL:
    // round 6's single 3 kB JSON line lost q01-q37 from the formal
    // artifact. So (a) full-fidelity per-query lines go FIRST, chunked
    // well under 1 kB each, and (b) the machine-parsed summary line goes
    // LAST and stays compact (~1.5 kB: short qNN keys, 3-decimal medians)
    // so it always survives a tail capture intact.
    // per-query triples [median, min, n_good_runs] — see the min rationale
    // at the measurement site above
    val parts = results.grouped(12).toSeq
    parts.zipWithIndex.foreach { case (chunk, i) =>
      val qs = chunk.map { case (n, v, mn, ok, _) =>
        s""""$n":[${r3(v)},${r3(mn)},$ok]""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"query_medians","part":${i + 1},"of":${parts.size},"runs":$runsPerQuery,"queries":$qs}""")
    }
    // A -1 median with no cause made the r7 events-loader incident
    // undiagnosable from the artifact alone; one compact error line per
    // failed query (first exception, truncated), emitted AFTER the medians
    // so failures sit close to the tail the capture window keeps.
    results.foreach { case (n, _, _, _, err) =>
      err.foreach { e =>
        val msg = graft.core.JsonText.escape(
          Option(e.getMessage).getOrElse(e.getClass.getName).take(180))
        println(s"""{"metric":"query_error","name":"$n","err":$msg}""")
      }
    }
    val flaky = results.collect { case (n, _, _, ok, _) if ok < runsPerQuery =>
      s""""$n":$ok""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sweep-boundary canary timings (runs+1 values): the steal record
    // of the run, as its own early line AND in the file + final line
    val canaryJson = canaries.map(r3).mkString("[", ",", "]")
    println(s"""{"metric":"steal_canary","boundaries":${canaries.length},"sec":$canaryJson}""")
    // The driver-contract line IN FULL — {"metric","value","unit",
    // "queries":{name: median_sec},"sf"} — so a parser reading the whole
    // stdout (or merging per-line) gets every query's median under its
    // full name as a plain number (round-16 PERF came up empty because
    // no line carried that exact shape). Too long for the 2000-char tail
    // window, so it prints BEFORE the compact final line, which stays
    // LAST and tail-safe; additions only — nothing removed or renamed.
    val fullQueries = results.map { case (n, v, _, _, _) =>
      s""""$n":${r3(v)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":$runsPerQuery,"queries":$fullQueries,"sf":"${new java.io.File(sfDir).getName}"}""")
    // Full-fidelity artifact ON DISK: the round capture keeps only a
    // 2000-char stdout tail — r9 lost ~110 queries' [median,min,n]
    // triples to it, exactly the steal-adjudication data the triples
    // exist for. The file carries every query at full precision
    // regardless of the window; the compact line below is the in-tail
    // fallback.
    val fullJson = results.map { case (n, v, mn, ok, _) =>
        s""""$n":[${r3(v)},${r3(mn)},$ok]""" }
      .mkString(
        s"""{"metric":"query_stats","runs":$runsPerQuery,"total_sec":${r3(total)},"sf":"$sfDir","canary_sec":$canaryJson,"flaky":$flaky,"queries":{""",
        ",", "}}\n")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      fullJson.getBytes("UTF-8"))
    // a read-only CWD costs the file, not the run — but fatal VM errors
    // (OutOfMemoryError etc.) must propagate, never be read as an IO miss
    catch { case scala.util.control.NonFatal(_) => () }
    // The FINAL line must fit the 2000-char tail WHOLE next to sbt's
    // ~75-char epilogue, or truncation eats it front-first — so it
    // carries median and min per query at the smallest parseable shape:
    // ONE string field "q" of comma-joined `<id>:<median_cs>:<min_cs>`
    // triples (ids are the qNN numbers — names live in the chunked
    // lines + file; values are CENTISECONDS, "cs":1 marks the unit —
    // 10 ms granularity tells steal from work just as well), and n
    // rides only in "flaky" (n == runs everywhere else). ~12
    // bytes/query keeps ~150 queries inside the window.
    def cs(v: Double): String =
      if (v < 0) "-1" else Math.round(v * 100).toString
    val ids = results.map { case (n, _, _, _, _) => n.takeWhile(_ != '_').drop(1) }
    require(ids.distinct.size == ids.size,
      "short query keys must stay unique (qNN prefix)")
    val qs = results.zip(ids).map { case ((_, v, mn, _, _), id) =>
      id + ":" + cs(v) + ":" + cs(mn) }.mkString(",")
    // "cn" = the sweep-boundary canary timings in centiseconds (runs+1
    // comma-joined values) — ~15 chars buying the in-artifact steal read
    val cn = canaries.map(cs).mkString(",")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","runs":$runsPerQuery,"cs":1,"cn":"$cn","flaky":$flaky,"sf":"${new java.io.File(sfDir).getName}","q":"$qs"}"""
    require(line.length <= 1900,
      s"final bench line (${line.length} chars) outgrew the 2000-char " +
        "tail window — shrink the encoding before the artifact silently truncates")
    println(line)
    spark.stop()
  }
}
