package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Bench replica with GC + heap telemetry per query (not part of the
  * driver contract) — hunts inter-query interference inside the bench
  * JVM that per-query isolation can't reproduce. */
object BenchProfile {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rt = Runtime.getRuntime

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bp] $name failed: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMillis - gc0) / 1e3
      val usedMb = (rt.totalMemory() - rt.freeMemory()) / 1024 / 1024
      // persistent-RDD census: cached tables AND localCheckpoint
      // blocks — a count that climbs query-over-query is the storage
      // leak signature behind the r4 q44 regression
      val nPersist = spark.sparkContext.getPersistentRDDs.size
      println(f"[bp] $name%-24s ${sec}%7.3f s  gc=${gcSec}%6.3f s  " +
        f"heapUsed=${usedMb}%6d MB  persistentRdds=$nPersist%3d")
    }
    spark.stop()
  }
}
