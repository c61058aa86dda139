package graft

import org.apache.spark.scheduler._
import scala.collection.mutable.ArrayBuffer

/** Dev measurement tool (round 15 — guide §1): per-JOB wall-time
  * attribution for one or more catalog queries. Each query runs once
  * untimed (warms artifacts + codegen caches, like Bench's warm-up)
  * and once instrumented; the instrumented run prints every Spark job
  * with its duration, stage/task counts and submitting call site, plus
  * the driver-side gap preceding it (planning/optimizer/collect time
  * shows up as gap, not job time). Diagnostic only — no catalog
  * surface, never run by the driver. */
object JobProfile {
  private final case class J(
      id: Int, t0: Long, var t1: Long, desc: String, site: String,
      var stages: Int, var tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.session("graft-profile", cpus)
    val jobs = ArrayBuffer[J]()
    val stages = ArrayBuffer[(Int, Int, Long, String)]() // id, tasks, ms, name
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        def p(k: String) =
          Option(e.properties).flatMap(ps => Option(ps.getProperty(k))).getOrElse("")
        jobs += J(e.jobId, System.nanoTime(), 0L,
          p("spark.job.description"), p("callSite.short"),
          e.stageInfos.size, e.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b)
            .getOrElse(-1L)
          stages += ((si.stageId, si.numTasks, ms, si.name.take(80)))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    for (n <- names) {
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      clean()
      jobs.synchronized { jobs.clear(); stages.clear() }
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let trailing job-end events drain
      jobs.synchronized {
        println(f"%n===== $n wall=$wall%.3f s jobs=${jobs.size} =====")
        var prevEnd = t0
        var gapSum = 0.0
        for (j <- jobs.sortBy(_.t0)) {
          val gap = math.max(0L, j.t0 - prevEnd) / 1e9
          gapSum += gap
          val dur = (if (j.t1 == 0) System.nanoTime() else j.t1) - j.t0
          prevEnd = math.max(prevEnd, if (j.t1 == 0) j.t0 else j.t1)
          println(f"job ${j.id}%5d gap=$gap%6.3f dur=${dur / 1e9}%7.3f " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}%s  ${j.desc}%s")
        }
        val jobSum = jobs.map(j => (j.t1 - j.t0) / 1e9).sum
        println(f"sum(jobs)=$jobSum%.3f gaps(driver)=$gapSum%.3f wall=$wall%.3f")
        for ((id, nt, ms, nm) <- stages.sortBy(-_._3).take(12))
          println(f"  stage $id%5d tasks=$nt%4d ms=$ms%6d  $nm%s")
      }
      clean()
    }
    spark.stop()
  }
}
