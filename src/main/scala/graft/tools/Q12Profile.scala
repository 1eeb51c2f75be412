package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc q12 stage profiler (not part of the driver contract). */
object Q12Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.operators.FixtureQueries.events(spark, sfDir)
    time("events count")(println(ev.count()))
    time("scan only")(ev.write.format("noop").mode("overwrite").save())
    time("day only") {
      ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.format("noop").mode("overwrite").save()
    }
    time("json only") {
      ev.withColumn("dev", get_json_object(col("props"), "$.k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("group only (no orderBy)") {
      ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("etype_up", upper(trim(col("event_type"))))
        .withColumn("dev", get_json_object(col("props"), "$.k"))
        .groupBy(col("day"), col("etype_up"), col("dev"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) time(s"full q12 run $i") {
      graft.operators.FixtureQueries.q12Scalars(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
