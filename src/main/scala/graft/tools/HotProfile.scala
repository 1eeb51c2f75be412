package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ivf, PipelineQueries, Similarity}

/** Ad-hoc A/B profile of the hot pipeline queries (not part of the
  * driver contract). */
object HotProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[hot] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    noop(emb) // warm
    for (i <- 1 to 2) {
      time(s"q23 naive all-pairs #$i")(noop(
        Similarity.cosineNearDupPairs(emb, 0.40).orderBy("a_id", "b_id")))
      time(s"q23 blocked #$i")(noop(
        Similarity.cosineNearDupPairsBlocked(emb, 0.40).orderBy("a_id", "b_id")))
      time(s"q21 simhash #$i")(noop(PipelineQueries.q21Simhash(spark, sfDir)))
      time(s"q31 ivf recall #$i")(noop(PipelineQueries.q31IvfRecall(spark, sfDir)))
      time(s"q12 scalars #$i")(noop(graft.operators.FixtureQueries.q12Scalars(spark, sfDir)))
    }
    spark.stop()
  }
}
