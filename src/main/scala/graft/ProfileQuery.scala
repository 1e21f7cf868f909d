package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization guide §1): run ONE registry query
  * repeatedly under the bench's exact session configuration and print a
  * per-Spark-job breakdown — submission gap, duration, and the call
  * site of the job's result stage — so a slot's seconds can be
  * attributed to specific operator phases (restore copy vs. replay
  * cycles vs. probe vs. commit) instead of guessed at.
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <query> [nRuns]
  * Never part of the driver contract; diagnostics only.
  */
object ProfileQuery {

  final case class JobRec(id: Int, start: Long, var end: Long = 0L,
                          var site: String = "", var nTasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val nRuns = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_bench")

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val rec = JobRec(js.jobId, js.time)
        rec.site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        rec.nTasks = js.stageInfos.map(_.numTasks).sum
        jobs.add(rec); byId.put(js.jobId, rec)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(byId.get(je.jobId)).foreach(_.end = je.time)
      }
    })

    val q = SparkEntry.queries(name)
    (0 until nRuns).foreach { r =>
      jobs.clear(); byId.clear()
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      // drain the listener bus so every end event lands
      val deadline = System.currentTimeMillis() + 3000
      while (System.currentTimeMillis() < deadline &&
          jobs.iterator().asScala.exists(_.end == 0L))
        Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val recs = jobs.iterator().asScala.toSeq.sortBy(_.start)
      val sumJob = recs.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      System.err.println(
        f"%n=== run $r: $name wall=$wall%.2f s, ${recs.size} jobs, " +
          f"sum(job)=$sumJob%.2f s (gaps=${wall - sumJob}%.2f s driver/FS) ===")
      if (r == nRuns - 1 || sys.env.contains("GRAFT_PROFILE_ALL")) {
        var prevEnd = recs.headOption.map(_.start).getOrElse(0L)
        recs.foreach { j =>
          val gap = (j.start - prevEnd) / 1e3
          val dur = math.max(0L, j.end - j.start) / 1e3
          prevEnd = math.max(prevEnd, j.end)
          val mark = if (dur >= 0.2 || gap >= 0.2) " *" else ""
          System.err.println(
            f"  job ${j.id}%4d  gap=$gap%6.2f  dur=$dur%6.2f  " +
              f"tasks=${j.nTasks}%4d  ${j.site.take(90)}$mark")
        }
      }
    }
    spark.stop()
  }
}
