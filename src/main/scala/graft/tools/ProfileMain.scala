package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Ad-hoc profiling entry point (not part of the driver contract):
  * times individual stages of a query to locate hot spots. */
object ProfileMain {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()  // warm

    time("shinglePairs materialize") {
      Dedup.shinglePairs(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
    }
    val sh = time("shinglePairs cache") {
      val s = Dedup.shinglePairs(docs, "doc_id", "text", 3).cache()
      s.count()
      s
    }
    time("self-join + groupBy on cached") {
      val a = sh.select(col("doc_id").as("d1"), col("s").as("s1"))
      val b = sh.select(col("doc_id").as("d2"), col("s").as("s2"))
      a.join(b, col("s1") === col("s2") && col("d1") < col("d2"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full jaccardPairs") {
      // explicit persist: the default changed to NONE (100 TB path);
      // this timing predates that and must stay comparable to the
      // recorded numbers, which measured the cached form
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.2, dfCap = 2000,
          shinglePersist = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
