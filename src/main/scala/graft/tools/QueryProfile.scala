package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query profiler (not part of the driver contract): runs the
  * named queries `SPARK_GRAFT_PROFILE_REPS` times each against
  * `SPARK_GRAFT_SF_DIR`, printing per-rep wall times and, once per
  * query, the executed plan — separates plan regressions from the
  * host's known scheduler-stall variance (one random query per bench
  * pass absorbs a multi-second stall; medians across reps see through
  * it). Usage: runMain graft.tools.QueryProfile q8_ordered_agg [...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        spark.catalog.clearCache()
        // also drop localCheckpoint blocks — clearCache doesn't
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qp] $name rep$i ${sec}%7.3f s")
        sec
      }
      val sorted = times.sorted
      val med =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2
      println(f"[qp] $name MEDIAN ${med}%7.3f s  min=${times.min}%.3f max=${times.max}%.3f")
      // execute BEFORE printing: with AQE the pre-execution string is
      // the initial plan (isFinalPlan=false), not what actually ran
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"[qp] $name executed plan (AQE-final):\n" +
        df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
