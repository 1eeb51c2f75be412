package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock profiler for one registered query (not part of
  * the driver contract): runs the query once cold to absorb fixture
  * builds/codegen, then attaches a listener and re-runs, printing every
  * Spark job's duration, stage count, task count and the gaps BETWEEN
  * jobs (driver-side planning/collect time) — separates "many tiny
  * driver-synchronized jobs" from "one slow stage" without the UI.
  * Usage: runMain graft.tools.JobProfile q95_curation_pipeline [...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.api.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    case class Job(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0)

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      def clean(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      clean()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[jp] $name warmup failed: ${e.getMessage}") }
      clean()
      val jobs = mutable.LinkedHashMap.empty[Int, Job]
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit =
          jobs.synchronized { jobs(e.jobId) = Job(e.jobId, e.time) }
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
          jobs.synchronized {
            // stage → job attribution via active job set is racy; just
            // attach to the most recent unfinished job
            jobs.values.toSeq.reverseIterator.find(_.end == 0L).foreach { j =>
              j.stages += 1; j.tasks += e.stageInfo.numTasks
            }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[jp] $name failed: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // settle async listener events
      Thread.sleep(300)
      val js = jobs.synchronized { jobs.values.toSeq.sortBy(_.start) }
      println(f"[jp] ==== $name total ${sec}%7.3f s, ${js.size} jobs ====")
      var prevEnd = 0L
      js.foreach { j =>
        val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
        val dur = (j.end - j.start) / 1e3
        println(f"[jp] job ${j.id}%4d dur=${dur}%7.3f s gap_before=${gap}%7.3f s stages=${j.stages}%3d tasks=${j.tasks}%5d")
        prevEnd = j.end
      }
      val jobSum = js.map(j => (j.end - j.start) / 1e3).sum
      val gapSum = js.sliding(2).collect {
        case Seq(a, b) if b.start > a.end => (b.start - a.end) / 1e3 }.sum
      println(f"[jp] $name job_time=${jobSum}%7.3f s inter_job_gaps=${gapSum}%7.3f s")
    }
    spark.stop()
  }
}
