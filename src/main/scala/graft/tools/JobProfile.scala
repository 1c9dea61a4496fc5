package graft.tools

import org.apache.spark.scheduler._

import scala.collection.mutable

/** Dev-only per-job profiler (guide §1/§7): run ONE SparkEntry query with
  * a listener capturing every job's wall span, task time and description,
  * then print a driver-gap analysis — how much of the query's wall clock
  * was inside Spark jobs (executor work + scheduling) vs BETWEEN jobs
  * (driver-side planning, filesystem metadata, collect processing). The
  * split decides which optimization lever applies: job-dominated → guide
  * §2/§3 (shuffles/joins); gap-dominated → fewer actions, cheaper plans,
  * fewer FS round-trips.
  *
  * Usage: JobProfile <queryName> [runs=2]  (reports the LAST run — prior
  * runs warm JIT/codegen exactly like the bench's sweep protocol)
  */
object JobProfile {

  private case class JobRec(id: Int, start: Long, var end: Long = -1L,
                            desc: String, var tasks: Int = 0,
                            var taskTimeMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName> [runs]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = graft.core.SparkSessionFactory.fromEnv("graft-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val byId = mutable.Map.empty[Int, JobRec]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) synchronized {
          // prefer the SQL execution's physical-plan head — the stage
          // callsite is an uninformative thread-pool frame under SQL
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap { id =>
              Option(org.apache.spark.sql.execution.SQLExecution
                .getQueryExecution(id.toLong))
                .map(_.executedPlan.toString.split("\n")
                  .filterNot(l => l.trim.isEmpty || l.contains("== ") ||
                    l.contains("AdaptiveSparkPlan"))
                  .take(3).mkString(" | ")
                  .replaceAll("\\s+", " "))
            }
            .orElse(e.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
          val r = JobRec(e.jobId, e.time, desc = d)
          jobs += r; byId(e.jobId) = r
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) synchronized {
          byId.get(e.jobId).foreach(_.end = e.time)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (collecting) synchronized {
          // attribute via the stage's active job — approximate: use the
          // last started, unfinished job (local mode runs jobs serially
          // unless the caller threads, which the engine's query paths
          // don't in the measured region)
          jobs.reverseIterator.find(_.end < 0).foreach { r =>
            r.tasks += 1
            r.taskTimeMs += Option(e.taskInfo).map(_.duration).getOrElse(0L)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    (1 until runs).foreach(_ => once())
    jobs.clear(); byId.clear()
    collecting = true
    val wall = once()
    collecting = false
    Thread.sleep(300) // drain listener bus
    val done = jobs.filter(_.end > 0).sortBy(_.start)
    // merge job spans to account for overlap, compute uncovered gaps
    var covered = 0L
    var cursor = 0L
    done.foreach { j =>
      val s = math.max(j.start, cursor)
      if (j.end > s) { covered += j.end - s; cursor = j.end }
      else cursor = math.max(cursor, j.end)
    }
    println(f"query=$name wall=${wall}%.3f s jobs=${done.size} " +
      f"jobWallCovered=${covered / 1e3}%.3f s " +
      f"driverGaps=${wall - covered / 1e3}%.3f s")
    println("--- jobs by wall span (ms) ---")
    done.sortBy(j => -(j.end - j.start)).take(60).foreach { j =>
      println(f"${j.end - j.start}%6d ms  tasks=${j.tasks}%4d " +
        f"taskTime=${j.taskTimeMs}%6d ms  [${j.id}%3d] ${j.desc.take(110)}")
    }
    if (args.contains("--all")) {
      println("--- all jobs chronological ---")
      done.foreach { j =>
        println(f"[${j.id}%3d] ${j.end - j.start}%5d ms t=${j.tasks}%3d " +
          j.desc.take(150))
      }
    }
    spark.stop()
  }
}
