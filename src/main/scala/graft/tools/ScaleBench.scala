package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe (not part of the driver contract): measures
  * how the heaviest pipeline queries' wall time grows from sf0.1 to a
  * generated 10× slice ("sf1"), so the 100 TB claims rest on a
  * measured scaling exponent per query instead of a plan-shape
  * argument alone.
  *
  * The sf1 slice upsamples the sf0.1 `documents`/`embeddings` fixtures
  * 10×: ids re-keyed (`id*10 + copy`), text gets a copy-specific
  * suffix token and embeddings a tiny deterministic per-copy
  * perturbation — so the slice is near-dup-rich like real crawl data
  * but not degenerate (10 exact copies of everything would collapse
  * every dedup query to one cluster and measure nothing).
  *
  * Output: one JSON line (also written to BENCH_scale_rNN.json via
  * SPARK_GRAFT_SCALE_OUT) with per-query seconds at both scales and
  * the fitted exponent e = log10(t_sf1 / t_sf01); e ≈ 1 is linear,
  * e ≈ 2 quadratic. Exact all-pairs anchors (q23) are EXPECTED
  * quadratic — their at-scale substitutes are the LSH/IVF/SemDeDup
  * paths — and are reported as such.
  *
  * Usage: `runMain graft.tools.ScaleBench` with SPARK_GRAFT_SF_DIR
  * pointing at the sf0.1 fixture dir (default) and the slice cached
  * under java.io.tmpdir keyed by the base dir.
  */
object ScaleBench {

  /** The probe set: the verdict's "heaviest pipeline queries" list,
    * q16 as the linear scan control, q20 as q23's at-scale substitute
    * (MinHash+LSH should stay ~linear where exact all-pairs goes
    * quadratic), and the four indexed/amortized probes (their indexes
    * build on first touch of the slice's fingerprint, so the
    * min-over-reps reflects the PROBE — the persist-once/probe-many
    * claim, measured). */
  private val ProbeQueries = Seq(
    "q16_text_stats",
    "q19_ngram_jaccard",
    "q20_minhash_lsh",
    "q43_dup_clusters",
    "q69_substring_dedup",
    // SemDeDup's PRODUCTION shape: cluster-local pairs only (the
    // registered q70c row pins its superset invariant; here it is
    // probed standalone so the benched story is the scale path)
    "q70_clustered",
    "q72_novelty",
    "q78_lr_quality",
    "q79_bm25",
    "q60_indexed_probe",
    "q71_indexed_probe",
    "q79_indexed_probe",
    "q92_phrase_ranked",
    "q93_ledger_dedup",
    // the capstone: six sublinear stages composed with three
    // MEMORY_AND_DISK materializations — the storage-pool pressure
    // shape r4's q44 lesson punished; its exponent is the evidence
    // the composition (not just each stage) survives scale
    "q95_curation_pipeline",
    // the crawl front: WARC parse is one task per file (expect ~linear
    // in bytes), URL canonicalize+dedup is a scan + one groupBy, and
    // the crawl capstone composes parse → URL dedup → content dedup →
    // gate → shard (its WARC fixture builds on first touch of a
    // slice's fingerprint; min-over-reps reflects the steady state)
    "q97_warc_ingest",
    "q98_url_dedup",
    "q99_crawl_capstone")

  /** Deliberate exact-all-pairs ORACLE ANCHORS — fixture-bounded by
    * design (their at-scale substitutes are q20's LSH and
    * q70_clustered). Measured and reported under a separate `anchors`
    * block so the headline exponent table carries only paths a 100 TB
    * deployment would actually run. */
  private val AnchorQueries = Seq(
    "q23_embed_neardup",
    "q70_semantic_dedup")

  /** Probe-only shapes not in the registered query map (the
    * registered q70c row runs exact+clustered for its invariant;
    * the bench must time the clustered mode alone). The cluster count
    * scales with the corpus (cells stay ~400 vectors — the published
    * SemDeDup deployment shape: the quadratic term is the CELL SIZE,
    * held constant, so the pair cost stays linear in N; a fixed k
    * would let cells grow with the corpus and re-quadratize). */
  private val ExtraProbes: Map[String, (SparkSession, String) => DataFrame] =
    Map("q70_clustered" -> ((s: SparkSession, dir: String) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val k = math.max(8, (emb.count() / 400).toInt)
      graft.operators.Similarity.semanticDedup(
        emb, threshold = 0.40, nClusters = k, nIters = 2)
    }))

  private[tools] def generateSlice(spark: SparkSession, baseDir: String,
      outDir: String, factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/_DONE"))) return
    val copies = explode(sequence(lit(0), lit(factor - 1))).as("__c")
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    docs.select(col("*"), copies)
      .select(
        (col("doc_id") * factor + col("__c")).as("doc_id"),
        // the copy token keeps copies near-dup (realistic) not exact-dup
        concat(col("text"), lit(" cpy"), col("__c")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(4) +
          length(col("__c").cast("string"))).as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    emb.select(col("*"), copies)
      .select(
        (col("vec_id") * factor + col("__c")).as("vec_id"),
        // deterministic tiny perturbation: distinct vectors per copy,
        // neighborhood structure preserved
        transform(col("embedding"),
          (x, i) => x + (pmod(col("__c") * 31 + i, lit(7)) - lit(3))
            .cast("float") * lit(0.001f)).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    fs.create(new org.apache.hadoop.fs.Path(s"$outDir/_DONE"), true).close()
  }

  private def generateSf1(spark: SparkSession, baseDir: String,
      outDir: String): Unit = generateSlice(spark, baseDir, outDir, 10)

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf1Dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_scale_sf1_" + Integer.toHexString(baseDir.hashCode)).getAbsolutePath
    generateSf1(spark, baseDir, sf1Dir)

    val queries = graft.SparkEntry.queries ++ ExtraProbes
    def run(dir: String, names: Seq[String]): Map[String, Double] = {
      // warm-up scan absorbs codegen/JIT startup
      spark.read.parquet(s"$dir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
      val samples = (0 until reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        names.map { name =>
          val t0 = System.nanoTime()
          queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      names.map(n => n -> samples.map(_(n)).min).toMap
    }

    val t01 = run(baseDir, ProbeQueries ++ AnchorQueries)
    val t1 = run(sf1Dir, ProbeQueries ++ AnchorQueries)
    def jsonMap(names: Seq[String], m: Map[String, Double]): String =
      names.map(n => "\"" + n + f"""\":${m(n)}%.3f""").mkString("{", ",", "}")
    val exps = (ProbeQueries ++ AnchorQueries).map { n =>
      n -> math.log10(t1(n) / t01(n))
    }.toMap
    val json =
      s"""{"metric":"scale_probe","base":"$baseDir","factor":10,""" +
        s""""sf01_sec":${jsonMap(ProbeQueries, t01)},""" +
        s""""sf1_sec":${jsonMap(ProbeQueries, t1)},""" +
        s""""exponent":${jsonMap(ProbeQueries, exps)},""" +
        s""""anchors":{"note":"deliberate exact-all-pairs oracle anchors, fixture-bounded; production substitutes are q20_minhash_lsh and q70_clustered",""" +
        s""""sf01_sec":${jsonMap(AnchorQueries, t01)},""" +
        s""""sf1_sec":${jsonMap(AnchorQueries, t1)},""" +
        s""""exponent":${jsonMap(AnchorQueries, exps)}},"reps":$reps}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_scale_r08.json")),
      json + "\n")
    spark.stop()
  }
}

/** The second decade: measure the FLAT rows — the four index probes,
  * the composed ranker and the ledger — at 1× / 10× / 100× of sf0.1,
  * so the "stays flat" claim rests on TWO measured decades. Each
  * amortized index builds once per slice fingerprint (first touch
  * pays it; min-over-reps reflects the probe). Alongside the
  * registered q60_indexed_probe (the DEGENERATE rerank-everything
  * oracle anchor, whose linear rerank term is expected to surface at
  * 100×), `q60_production_probe` measures the production shape
  * (nProbe=4, rerank=20) over the same index — the number the 100 TB
  * claim actually rides on. q93's anti-join scans the full day-2
  * batch, so its honest shape is linear-in-batch, flat-in-history.
  *
  * Usage: `runMain graft.tools.ScaleDeep` (SPARK_GRAFT_SF_DIR =
  * sf0.1 fixture dir; SPARK_GRAFT_SCALE_OUT = output JSON). */
object ScaleDeep {

  private val FlatQueries = Seq(
    "q60_indexed_probe",
    "q71_indexed_probe",
    "q79_indexed_probe",
    "q92_phrase_ranked",
    "q93_ledger_dedup")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sliceDir(tag: String) = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_scale_${tag}_" + Integer.toHexString(baseDir.hashCode))
      .getAbsolutePath
    val sf1Dir = sliceDir("sf1")
    val sf10Dir = sliceDir("sf10")
    ScaleBench.generateSlice(spark, baseDir, sf1Dir, 10)
    ScaleBench.generateSlice(spark, baseDir, sf10Dir, 100)

    val queries = graft.SparkEntry.queries
    def productionProbe(dir: String): org.apache.spark.sql.DataFrame = {
      // same prebuilt index q60_indexed_probe uses; production params
      val (idx, built) = graft.operators.PipelineQueries
        .amortizedIndexPath(spark, dir, "ivfpq_index",
          p => graft.operators.IvfPq.indexExists(spark, p),
          table = "embeddings")
      require(built, s"q60_indexed_probe must have built the index at $dir")
      val queries = graft.operators.IvfPq.vectorsTable(spark, idx,
        graft.operators.IvfPq.currentVersion(spark, idx))
        .filter(col("vec_id") < 10)
      graft.operators.IvfPq.searchIndex(spark, idx, queries, k = 3,
        nProbe = 4, rerank = 20)
    }
    val names = FlatQueries :+ "q60_production_probe"
    def run(dir: String): Map[String, Double] = {
      spark.read.parquet(s"$dir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
      val samples = (0 until reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        names.map { name =>
          val t0 = System.nanoTime()
          val df =
            if (name == "q60_production_probe") productionProbe(dir)
            else queries(name)(spark, dir)
          df.write.format("noop").mode("overwrite").save()
          name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      names.map(n => n -> samples.map(_(n)).min).toMap
    }

    val t1 = run(baseDir)
    val t10 = run(sf1Dir)
    val t100 = run(sf10Dir)
    def jsonMap(m: Map[String, Double]): String =
      names.map(n => "\"" + n + f"""\":${m(n)}%.3f""").mkString("{", ",", "}")
    val e1 = names.map(n => n -> math.log10(t10(n) / t1(n))).toMap
    val e2 = names.map(n => n -> math.log10(t100(n) / t10(n))).toMap
    val eAll = names.map(n => n -> math.log10(t100(n) / t1(n)) / 2).toMap
    val json =
      s"""{"metric":"scale_probe_deep","base":"$baseDir","factors":[1,10,100],""" +
        s""""t_1x":${jsonMap(t1)},"t_10x":${jsonMap(t10)},"t_100x":${jsonMap(t100)},""" +
        s""""e_decade1":${jsonMap(e1)},"e_decade2":${jsonMap(e2)},""" +
        s""""e_overall":${jsonMap(eAll)},"reps":$reps}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "BENCH_scale_r09.json")),
      json + "\n")
    spark.stop()
  }
}
