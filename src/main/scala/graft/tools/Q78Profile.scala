package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q78_lr_quality phase profiler (not part of the driver contract):
  * splits the query's wall time into featurize/persist, label/persist,
  * the 8 per-GD-iteration jobs, and the scoring join — the evidence
  * the r9 verdict demanded for the driver-vs-builder divergence. Each
  * GD iteration is ONE Spark job ending in a driver collect, so its
  * wall time has an irreducible per-job scheduling floor; a window
  * with a stolen scheduler inflates q78 by 8–10 × that floor while
  * scan-bound queries inflate far less. Usage:
  * `runMain graft.tools.Q78Profile` (SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_PROFILE_REPS). */
object Q78Profile {
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
    import graft.functions.TextFunctions
    import graft.operators.QualityClassifier

    // JIT/codegen warm-up
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val tAll0 = System.nanoTime()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      var t0 = System.nanoTime()
      val labels = docs.select(col("doc_id"),
        (TextFunctions.qualityScore(col("text")) >= 0.5).cast("int")
          .as("label"))
        .repartition(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      labels.count()
      val tLabels = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val feats = QualityClassifier.features(docs, "doc_id", "text", 4096)
        .repartition(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      feats.count()
      val tFeats = (System.nanoTime() - t0) / 1e9
      val iterTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      t0 = System.nanoTime()
      val w = QualityClassifier.train(feats, labels, "doc_id", iters = 8,
        lr = 1.0, onIter = (_, s) => iterTimes += s)
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      QualityClassifier.score(feats, w, docs, "doc_id")
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"), col("label"),
          round(col("prob"), 6).as("prob"),
          (col("prob") >= 0.5).cast("int").as("pred"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
      val tScore = (System.nanoTime() - t0) / 1e9
      val tAll = (System.nanoTime() - tAll0) / 1e9
      println(f"[q78] rep$rep total=$tAll%6.3f labels=$tLabels%6.3f " +
        f"feats=$tFeats%6.3f train=$tTrain%6.3f score=$tScore%6.3f")
      println("[q78]   iters: " +
        iterTimes.map(s => f"$s%5.3f").mkString(" "))
    }
    spark.stop()
  }
}
