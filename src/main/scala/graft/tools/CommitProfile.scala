package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** Dev-only micro-profile of the AtomicRewrite commit cycle — the fixed
  * cost every store append/merge pays (guide §1: measure first). Commits
  * a tiny batch N times (append-style partition commits to one table),
  * timing each commit and the read-back after it, with a job listener
  * splitting job wall from driver gaps. Answers "where does the
  * ~1 s/commit floor live" — write job, planning, or FS metadata.
  */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 12
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-commitprofile")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_commitprof"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    @volatile var jobMs = 0L
    @volatile var jobs = 0
    val listener = new SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null) { jobMs += e.time - s; jobs += 1 }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val batch = (1 to 200).map(i => (i.toLong, s"doc $i text payload"))
      .toDF("doc_id", "text")
    (0 until n).foreach { i =>
      val t0 = System.nanoTime()
      val j0 = jobMs; val c0 = jobs
      graft.tx.AtomicRewrite.writePartitions(spark, root,
        batch.withColumn("batch_seq", lit(i)), Seq("batch_seq"))
      val t1 = System.nanoTime()
      val readBack = graft.tx.AtomicRewrite.read(spark, root)
      val cnt = readBack.count()
      val t2 = System.nanoTime()
      Thread.sleep(100)
      println(f"commit $i%2d: write=${(t1 - t0) / 1e6}%7.1f ms " +
        f"read+count=${(t2 - t1) / 1e6}%7.1f ms rows=$cnt%6d " +
        f"jobsInIter=${jobs - c0}%3d jobMsInIter=${jobMs - j0}%5d")
    }
    // plain full write (unpartitioned 1-row table — the watermark shape)
    val one = Seq((1L, "x")).toDF("k", "v").coalesce(1)
    (0 until 5).foreach { i =>
      val t0 = System.nanoTime()
      graft.tx.AtomicRewrite.write(spark, s"$root/onerow", one)
      println(f"one-row write $i: ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
    }
    spark.stop()
  }
}
