package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Cdc, Chunking, Decontaminate, Dedup, Layout, Multimodal, Sampling, Similarity, TopK}

/** Unit tests for the training-data-pipeline operators on small
  * in-memory data (semantic checks; oracle parity is covered by the
  * driver contract via PipelineQueries.oracleSql). */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private def sf001 = "/root/testdata/sf0.001"

  import org.apache.spark.sql.DataFrame
  private def docsDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words appear here nothing shared"),
      (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("text functions: counts, quality in [0,1], langid, fingerprints") {
    val df = docsDf.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langIdStopwords(col("text")).as("lang"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("n")).toSeq === Seq(9, 9, 7, 9))
    assert(rows.forall(r => r.getAs[Double]("q") >= 0.0 && r.getAs[Double]("q") <= 1.0))
    assert(rows.take(2).forall(_.getAs[String]("lang") === "en"))
    // exact dup docs share the fingerprint; different docs don't
    assert(rows(0).getAs[Long]("fp") === rows(3).getAs[Long]("fp"))
    assert(rows(0).getAs[Long]("fp") !== rows(2).getAs[Long]("fp"))
  }

  test("langId detects CJK before stopword vote") {
    import spark.implicits._
    val df = Seq("你好 世界", "the quick fox").toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("zh", "en"))
  }

  test("exactGroups: every row keyed, min-id row marked representative, sizes correct") {
    val out = Dedup.exactGroups(docsDf,
        concat_ws(" ", slice(TextFunctions.words(col("text")), 1, 5)), "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_size"), r.getAs[Boolean]("is_representative"))).toMap
    assert(out.size === 4) // one row back per input row
    // docs 1, 2, 4 share the 5-word prefix key: min id 1 is the rep
    assert(out(1L) === ((3L, true)))
    assert(out(2L) === ((3L, false)))
    assert(out(4L) === ((3L, false)))
    assert(out(3L) === ((1L, true))) // singletons are their own rep
  }

  test("jaccardPairs dfCap: a corpus-wide stop-shingle is dropped and bounds the fanout") {
    import spark.implicits._
    // 40 docs all carrying the same opening boilerplate (one hot
    // 3-shingle in every doc) plus unique tails: uncapped, the hot
    // shingle alone fans out 40·39/2 = 780 candidate pairs; with
    // dfCap=10 it is dropped and only true near-dups (none here) pair.
    val docs = (1 to 40).map(i =>
      (i.toLong, s"shared boilerplate header unique$i tail$i word$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.01, dfCap = 10)
    assert(capped.count() === 0L)
    // sanity: with the cap above the corpus size the hot shingle pairs
    // everything — proving the cap (not the data) removed the fanout
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.01, dfCap = 1000)
    assert(uncapped.count() === 780L)
  }

  test("stratifiedSample: per-stratum rates hold and the assignment is deterministic") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val rates = Seq("en" -> 0.5, "fr" -> 0.25)
    val kept = Sampling.stratifiedSample(docs, "lang", col("doc_id"), rates,
      defaultRate = 0.1)
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allByLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- allByLang if n >= 20) {
      val rate = rates.toMap.getOrElse(lang, 0.1)
      val got = keptByLang.getOrElse(lang, 0L).toDouble / n
      // md5 is uniform; a 4-sigma Bernoulli band keeps this stable
      val sigma = math.sqrt(rate * (1 - rate) / n)
      assert(math.abs(got - rate) <= 4 * sigma + 0.02, s"$lang: $got vs $rate (n=$n)")
    }
    // deterministic: re-running keeps the identical rows
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.stratifiedSample(docs, "lang", col("doc_id"), rates,
        defaultRate = 0.1).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
    // a kept doc's assignment is independent of the rest of the corpus
    val sub = Sampling.stratifiedSample(docs.limit(50), "lang", col("doc_id"),
        rates, defaultRate = 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    val first50 = docs.limit(50).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub === (ids1.toSet & first50))
  }

  test("fuzzyPairs: typo within block matches; edit inside the block prefix is the documented miss") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fix"),   // 1 edit past the block — found
      (3L, "the quick brown foxes"), // 2 edits (insert) — found
      (4L, "teh quick brown fox"),   // edit INSIDE the 12-char block — missed by contract
      (5L, "completely different")   // far away — absent
    ).toDF("doc_id", "title")
    val pairs = Dedup.fuzzyPairs(rows, "doc_id", "title", maxDist = 3, blockPrefix = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 1)
    assert(pairs((1L, 3L)) === 2)
    assert(pairs((2L, 3L)) === 3)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "blocking misses edits inside the prefix — the documented trade-off")
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("jaccard pairs: exact dup pair scores 1.0; near dup high; disjoint absent") {
    val pairs = Dedup.jaccardPairs(docsDf, "doc_id", "text", k = 3, threshold = 0.2, dfCap = 100)
      .collect().map(r => ((r.getAs[Long]("d1"), r.getAs[Long]("d2")), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 4L)) === 1.0)
    assert(pairs((1L, 2L)) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash LSH finds the exact-dup and near-dup candidates") {
    val sigs = Dedup.minhashSignatures(docsDf, "doc_id", "text", shingleK = 3, numPerm = 32)
    assert(sigs.count() === 4)
    val cands = Dedup.minhashCandidates(sigs, bands = 8)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(cands.contains((1L, 4L))) // identical docs always collide
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 4L))) // near dup
  }

  test("simhash: identical docs → identical signature, hamming 0") {
    val sigs = Dedup.simhash(docsDf, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) === sigs(4L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <
      java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)))
  }

  test("native SimHash64 equals the exploded-aggregation formulation") {
    import spark.implicits._
    val edge = Seq((100010L, ""), (100011L, "   "), (100012L, "one"), (100013L, "a  b   c"))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val native = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashAgg(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === agg)
    // md5-token-hash variant (q21's oracle-checkable mode): same
    // equivalence, different bit source.
    val nativeMd5 = Dedup.simhash(docs, "doc_id", "text", md5Based = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aggMd5 = Dedup.simhashAgg(docs, "doc_id", "text", md5Based = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nativeMd5 === aggMd5)
    assert(nativeMd5 !== native) // distinct hash families actually differ
  }

  test("sampling: split is deterministic and exhaustive; cap equals the window form") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def splitCounts = Sampling.assignSplit(docs, col("doc_id"), splits)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = splitCounts
    assert(s1 === splitCounts) // re-evaluation assigns identically
    assert(s1.values.sum === docs.count()) // every row lands somewhere
    assert(s1.keySet === Set("train", "val", "test"))
    assert(s1("train") > s1("val") && s1("train") > s1("test"))
    // independent salts give different samples of ~the same size
    val a = Sampling.bernoulli(docs, col("doc_id"), 0.5, "saltA")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulli(docs, col("doc_id"), 0.5, "saltB")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
    assert(math.abs(a.size - b.size) < docs.count() / 4)
    // bounded-aggregator cap == window row_number formulation
    import org.apache.spark.sql.expressions.Window
    val cap = Sampling.capPerGroup(docs, "lang", "doc_id", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.hashValue(col("doc_id")), col("doc_id"))
    val win = docs.select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(cap === win)
    assert(cap.nonEmpty)
  }

  test("duplicate clusters: label propagation closes transitive chains") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, needs >1 round) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("packing: bins are contiguous, conserve tokens, and fill to capacity") {
    import graft.operators.Packing
    import graft.functions.TextFunctions.tokenCount
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val packed = Packing.packBins(docs, "doc_id", tokenCount(col("text")),
      capacity = 500L, nWorkers = 4)
    val rows = packed.select("pack_group", "bin", "n_tokens")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // token conservation: every doc lands in exactly one bin
    assert(rows.length === docs.count())
    val totalTokens = rows.map(_._3).sum
    // per group: bins are 0..maxBin with no gaps, and every bin except
    // the last starts full (its docs' cum-before crossed the boundary)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val bins = rs.map(_._2).distinct.sorted
      assert(bins === (0 to bins.max).toArray, s"group $g bins not contiguous")
      val fill = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      // cum tokens before the last bin ≥ capacity·maxBin (bins filled
      // in order; spillover only at boundaries)
      val beforeLast = (0 until bins.max).map(fill(_)).sum
      assert(beforeLast >= 500L * bins.max,
        s"group $g: earlier bins must be boundary-full")
    }
    assert(totalTokens > 0)
  }

  test("decontamination: no kept train doc shares a fingerprint with test") {
    import graft.operators.Sampling
    import graft.functions.TextFunctions.words
    val docs = Sampling.assignSplit(
        spark.read.parquet(s"$sf001/documents.parquet"), col("doc_id"),
        Seq("train" -> 0.9, "test" -> 0.1))
      .withColumn("fp", concat_ws(" ", slice(words(col("text")), 1, 5)))
    val testFp = docs.filter(col("split") === "test")
      .select("fp").distinct().collect().map(_.getString(0)).toSet
    val keptFp = docs.filter(col("split") === "train")
      .join(docs.filter(col("split") === "test").select("fp").distinct(),
        Seq("fp"), "left_anti")
      .select("fp").collect().map(_.getString(0)).toSet
    assert(keptFp.intersect(testFp).isEmpty)
    assert(keptFp.nonEmpty && testFp.nonEmpty)
  }

  test("blocked near-dup kernel equals the expression form bit-for-bit") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val naive = Similarity.cosineNearDupPairs(emb, threshold = 0.30)
      .orderBy("a_id", "b_id").collect().map(_.toString).toSeq
    val blocked = Similarity.cosineNearDupPairsBlocked(emb, threshold = 0.30, blockSize = 37)
      .orderBy("a_id", "b_id").collect().map(_.toString).toSeq
    assert(blocked === naive)
  }

  test("IVF at full probe equals exact brute force; small probe recall sane") {
    import graft.operators.Ivf
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val centroids = Ivf.train(emb, nCentroids = 8, nIters = 2)
    assert(centroids.count() === 8)
    val exact = Similarity.bruteForceTopK(emb, q, 3)
      .orderBy("q_id", "rk").collect().map(_.toString).toSeq
    val full = Ivf.topK(emb, q, 3, centroids, nProbe = 8)
      .orderBy("q_id", "rk").collect().map(_.toString).toSeq
    assert(full === exact)
    val rec = Ivf.recallVsExact(emb, q, 3, nCentroids = 8, nIters = 2, nProbe = 2).collect()
    assert(rec.length === 5)
    assert(rec.forall(r => r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0))
  }

  test("VectorDot native expression equals the HOF fold bit-for-bit") {
    import graft.functions.{VectorDot, VectorFunctions}
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .select(
        VectorDot(col("va"), col("vb")).as("native"),
        VectorFunctions.dot(col("va"), col("vb")).as("hof"),
        VectorFunctions.dotN(col("va"), col("vb"), 64).as("unrolled"))
      .collect()
    assert(pairs.length === 2500)
    for (r <- pairs) {
      assert(r.getAs[Double]("native") === r.getAs[Double]("hof"))
      assert(r.getAs[Double]("native") === r.getAs[Double]("unrolled"))
    }
  }

  test("vector_dot, simhash64, shingle_hashes register as SQL functions via GraftExtensions") {
    graft.api.GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/embeddings.parquet").limit(5)
      .createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT a.vec_id, vector_dot(a.embedding, a.embedding) AS self_dot
        |FROM emb_sql a ORDER BY 1""".stripMargin).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Double]("self_dot") > 0.0))
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(10)
    docs.createOrReplaceTempView("docs_sql")
    val sql = spark.sql(
      """SELECT doc_id, simhash64(text) AS sig,
        |  size(shingle_hashes(text, 3)) AS n_sh
        |FROM docs_sql ORDER BY 1""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val api = docs.select(col("doc_id"),
        graft.functions.SimHash64(col("text")).as("sig"),
        size(graft.functions.ShingleHashes(col("text"), 3)).as("n_sh"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sql === api)
    assert(sql.forall(_._3 > 0))
    // iceberg_bucket rides the same registry; SQL == spec vector
    val b = spark.sql("SELECT iceberg_bucket(CAST(34 AS BIGINT), 16) AS b")
      .collect().head.getInt(0)
    assert(b === (2017239379 & Int.MaxValue) % 16)
  }

  test("cosine top-k: self excluded, scores sorted, lsh recall ∈ [0,1]") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 3).collect()
    assert(topk.length === 15)
    assert(topk.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("c_id")))
    val byQ = topk.groupBy(_.getAs[Long]("q_id"))
    for ((_, rows) <- byQ) {
      val scores = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("score"))
      assert(scores.sorted.reverse.toSeq === scores.toSeq)
    }
    val rec = Similarity.lshRecall(emb, emb.filter(col("vec_id") < 5), 3, 4, 64).collect()
    assert(rec.length === 5)
    assert(rec.forall(r => r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0))
  }

  test("TopK aggregator equals the window row_number form exactly") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    val viaWindow = Similarity.bruteForceTopK(emb, q, 4)
      .orderBy("q_id", "rk").collect().map(_.toString).toSeq
    val viaAgg = Similarity.bruteForceTopKAgg(emb, q, 4)
      .orderBy("q_id", "rk").collect().map(_.toString).toSeq
    assert(viaAgg === viaWindow)
  }

  test("TopK aggregator matches the window form on NaN and -0.0 scores") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // NaN must rank FIRST under score desc (Spark orders NaN largest)
    // and -0.0 must tie with 0.0 — naive > / == comparisons make NaN
    // incomparable and its rank partition-order-dependent
    val scored = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, Double.NaN),
      (1L, 13L, 0.0), (1L, 14L, -0.0), (1L, 15L, -0.5),
      (2L, 20L, -0.0), (2L, 21L, 0.0), (2L, 22L, 0.1))
      .toDF("key", "id", "score")
      .repartition(7) // scatter across partitions to vary arrival order
    val viaAgg = graft.operators.TopK.perKey(scored, "key", "id", "score", 4)
      .orderBy("key", "rk").collect().map(_.toString).toSeq
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val viaWindow = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .select(col("key"), col("rk"), col("id"), col("score"))
      .orderBy("key", "rk").collect().map(_.toString).toSeq
    assert(viaAgg === viaWindow)
  }

  // ---- hand-crafted media fixtures for the REAL decoders ----

  /** Minimal 24-bit uncompressed BMP: w×h pixels, each row padded to 4
    * bytes, rows bottom-up (the standard layout). */
  private def makeBmp(w: Int, h: Int, px: (Int, Int) => (Byte, Byte, Byte)): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * h)
    out(0) = 'B'; out(1) = 'M'
    def putI32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    putI32(2, out.length); putI32(10, 54); putI32(14, 40)
    putI32(18, w); putI32(22, h); out(26) = 1; out(28) = 24
    putI32(34, stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (b, g, r) = px(x, y)
      val o = 54 + y * stride + x * 3
      out(o) = b; out(o + 1) = g; out(o + 2) = r
    }
    out
  }

  /** Minimal PCM WAV: RIFF/WAVE + fmt + data chunks. */
  private def makeWav(channels: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = frames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataSize); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(channels.toShort); out.putInt(rate)
    out.putInt(rate * blockAlign); out.putShort(blockAlign.toShort)
    out.putShort(bits.toShort)
    out.put("data".getBytes); out.putInt(dataSize)
    out.array()
  }

  test("real decode: BMP / PPM / PGM / WAV headers parse; unknown falls through") {
    import spark.implicits._
    val bmp = makeBmp(3, 2, (x, y) => ((x * 10 + y).toByte, 0, 0))
    val ppm = "P6\n# a comment\n4 3\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](4 * 3 * 3)(7)
    val pgm = "P5\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](8)(1)
    val wav = makeWav(channels = 2, rate = 8000, bits = 16, frames = 100)
    val junk = "not a media file at all".getBytes("US-ASCII")
    val assets = Seq(
      graft.operators.MediaAsset(1L, "image", bmp, "t"),
      graft.operators.MediaAsset(2L, "image", ppm, "t"),
      graft.operators.MediaAsset(3L, "image", pgm, "t"),
      graft.operators.MediaAsset(4L, "audio", wav, "t"),
      graft.operators.MediaAsset(5L, "image", junk, "t")).toDS()
    val m = Multimodal.decode(assets).collect().map(d => d.asset_id -> d).toMap
    assert(m(1L).format === "bmp" && m(1L).width === 3 && m(1L).height === 2 &&
      m(1L).channels === 3 && m(1L).n_samples === 6L && m(1L).bits_per_sample === 24)
    assert(m(2L).format === "ppm" && m(2L).width === 4 && m(2L).height === 3 &&
      m(2L).channels === 3 && m(2L).bits_per_sample === 8)
    assert(m(3L).format === "pgm" && m(3L).width === 2 && m(3L).height === 2 &&
      m(3L).channels === 1 && m(3L).bits_per_sample === 16)
    assert(m(4L).format === "wav" && m(4L).sample_rate === 8000 &&
      m(4L).channels === 2 && m(4L).n_samples === 100L && m(4L).bits_per_sample === 16)
    assert(m(5L).format === "unknown" && m(5L).width === 0 && m(5L).n_samples === 0L)
    // checksums are content-sensitive and deterministic
    assert(m(1L).checksum !== m(2L).checksum)
  }

  test("QOI: full decompression — every opcode decodes to the hand-computed pixels") {
    // 4×2 RGBA image exercising every op: RGB literal, RUN, DIFF,
    // LUMA, INDEX, RGBA literal, plus alpha carry-over
    val bb = java.nio.ByteBuffer.allocate(14 + 18 + 8)
    bb.put("qoif".getBytes); bb.putInt(4); bb.putInt(2); bb.put(4.toByte); bb.put(0.toByte)
    bb.put(0xFE.toByte); bb.put(10.toByte); bb.put(20.toByte); bb.put(30.toByte) // RGB
    bb.put(0xC1.toByte)                                    // RUN 2
    bb.put(0x7F.toByte)                                    // DIFF +1,+1,+1
    bb.put(0xA5.toByte); bb.put(0xA6.toByte)               // LUMA dg=+5, dr-dg=+2, db-dg=-2
    bb.put(0x09.toByte)                                    // INDEX slot 9 (first pixel's hash)
    bb.put(0xFF.toByte); bb.put(1.toByte); bb.put(2.toByte); bb.put(3.toByte); bb.put(4.toByte) // RGBA
    bb.put(0xFE.toByte); bb.put(9.toByte); bb.put(9.toByte); bb.put(9.toByte) // RGB (alpha stays 4)
    (0 until 7).foreach(_ => bb.put(0.toByte)); bb.put(1.toByte) // end marker
    val qoi = bb.array()
    val px = Multimodal.decodeQoiPixels(qoi).get
    val expected = Array[Int](
      10, 20, 30, 255, 10, 20, 30, 255, 10, 20, 30, 255, // RGB + RUN 2
      11, 21, 31, 255,                                   // DIFF
      18, 26, 34, 255,                                   // LUMA
      10, 20, 30, 255,                                   // INDEX back to px0
      1, 2, 3, 4,                                        // RGBA
      9, 9, 9, 4).map(_.toByte)                          // RGB, alpha carried
    assert(px.toSeq === expected.toSeq)
    // header metadata flows through decode()
    import spark.implicits._
    val m = Multimodal.decode(
      Seq(graft.operators.MediaAsset(1L, "image", qoi, "t")).toDS()).collect().head
    assert(m.format === "qoi" && m.width === 4 && m.height === 2 && m.channels === 4)
    // malformed streams return None, never throw or hang: truncated
    // mid-literal, and too few pixels for the declared dimensions
    assert(Multimodal.decodeQoiPixels(qoi.take(16)) === None)
    // hostile header: huge declared dims with a tiny stream must be
    // rejected BEFORE the w*h*4 allocation (no OOM from 15 bytes)
    val huge = java.nio.ByteBuffer.allocate(15)
    huge.put("qoif".getBytes); huge.putInt(23000); huge.putInt(23000)
    huge.put(4.toByte); huge.put(0.toByte); huge.put(0xC0.toByte)
    assert(Multimodal.decodeQoiPixels(huge.array()) === None)
    val short = java.nio.ByteBuffer.allocate(14 + 4)
    short.put("qoif".getBytes); short.putInt(4); short.putInt(2)
    short.put(4.toByte); short.put(0.toByte)
    short.put(0xFE.toByte); short.put(1.toByte); short.put(2.toByte); short.put(3.toByte)
    assert(Multimodal.decodeQoiPixels(short.array()) === None)
  }

  test("PNG: encode/decode round-trips every scanline filter type and " +
      "every supported color type") {
    val rnd = new scala.util.Random(7)
    // RGB (ct 2): each of the five filters alone, then all mixed
    for (f <- 0 to 5) {
      val w = 5; val h = 6
      val rgb = Array.fill((w * h * 3))(rnd.nextInt(256).toByte)
      val png = Multimodal.encodePng(w, h, 2, rgb,
        y => if (f == 5) y % 5 else f)
      val px = Multimodal.decodePngPixels(png)
        .getOrElse(fail(s"filter $f did not decode"))
      for (i <- 0 until w * h) {
        assert(px(i * 4) === rgb(i * 3) && px(i * 4 + 1) === rgb(i * 3 + 1) &&
          px(i * 4 + 2) === rgb(i * 3 + 2) && px(i * 4 + 3) === -1,
          s"filter $f pixel $i")
      }
    }
    // grayscale (ct 0), gray+alpha (ct 4), RGBA (ct 6) — Paeth rows
    for ((ct, ch) <- Seq((0, 1), (4, 2), (6, 4))) {
      val w = 4; val h = 3
      val s = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val px = Multimodal.decodePngPixels(
        Multimodal.encodePng(w, h, ct, s, _ => 4))
        .getOrElse(fail(s"color type $ct did not decode"))
      for (i <- 0 until w * h) ct match {
        case 0 => assert(px(i * 4) === s(i) && px(i * 4 + 1) === s(i) &&
          px(i * 4 + 2) === s(i) && px(i * 4 + 3) === -1)
        case 4 => assert(px(i * 4) === s(i * 2) && px(i * 4 + 1) === s(i * 2) &&
          px(i * 4 + 2) === s(i * 2) && px(i * 4 + 3) === s(i * 2 + 1))
        case _ => assert(px(i * 4) === s(i * 4) && px(i * 4 + 1) === s(i * 4 + 1) &&
          px(i * 4 + 2) === s(i * 4 + 2) && px(i * 4 + 3) === s(i * 4 + 3))
      }
    }
    // palette (ct 3): indices resolve through PLTE
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val idxs = Array[Byte](0, 1, 2, 2, 1, 0)
    val px3 = Multimodal.decodePngPixels(
      Multimodal.encodePng(3, 2, 3, idxs, _ => 1, pal)).get
    assert(px3.take(4).toSeq === Seq[Byte](10, 20, 30, -1))
    assert(px3.slice(8, 12).toSeq === Seq[Byte](70, 80, 90, -1))
    // 1×1 edge: no left/up neighbors for Sub/Up/Average/Paeth
    for (f <- 0 to 4) {
      val px1 = Multimodal.decodePngPixels(
        Multimodal.encodePng(1, 1, 2, Array[Byte](11, 22, 33), _ => f)).get
      assert(px1.toSeq === Seq[Byte](11, 22, 33, -1), s"1x1 filter $f")
    }
  }

  test("PNG: multi-IDAT streams decode; hostile/malformed inputs return " +
      "None before allocating") {
    // split the IDAT of a valid PNG into two chunks at an arbitrary byte
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 7).toByte)
    val whole = Multimodal.encodePng(4, 3, 2, rgb, y => y % 5)
    val expected = Multimodal.decodePngPixels(whole).get
    def u32be(p: Array[Byte], o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
        ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
    val idatLen = u32be(whole, 33) // after sig(8)+IHDR(25): IDAT length
    assert(new String(whole, 37, 4, "US-ASCII") === "IDAT")
    val idat = whole.slice(41, 41 + idatLen)
    val d1: Array[Byte] = idat.take(math.max(1, idatLen / 3))
    val d2: Array[Byte] = idat.drop(math.max(1, idatLen / 3))
    val out = new java.io.ByteArrayOutputStream()
    out.write(whole, 0, 33) // sig + IHDR
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte,
        (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length.toLong))
      val t = typ.getBytes("US-ASCII"); out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(be32(crc.getValue))
    }
    chunk("IDAT", d1); chunk("IDAT", d2); chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePngPixels(out.toByteArray).get.toSeq === expected.toSeq)

    // hostile header: 46000×46000 claimed from a 60-byte payload must be
    // rejected BEFORE the raw/output allocation
    val huge = java.nio.ByteBuffer.allocate(60)
    huge.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    huge.putInt(13); huge.put("IHDR".getBytes)
    huge.putInt(46000); huge.putInt(46000)
    huge.put(8.toByte); huge.put(2.toByte)
    huge.put(0.toByte); huge.put(0.toByte); huge.put(0.toByte)
    assert(Multimodal.decodePngPixels(huge.array()) === None)
    // truncated mid-IDAT: inflate cannot complete → None, no throw
    assert(Multimodal.decodePngPixels(whole.take(whole.length - 20)) === None)
    // declared chunk length past the buffer end → None, no AIOOBE
    val lied = whole.clone()
    lied(33) = 0x7f.toByte // IDAT length forged huge
    assert(Multimodal.decodePngPixels(lied) === None)
    // interlaced (Adam7) is out of scope and must be rejected at the
    // header, not half-decoded
    val adam = whole.clone(); adam(28) = 1.toByte
    assert(Multimodal.pngHeader(adam) === None)
    // palette image with an index past PLTE → None
    val badIdx = Multimodal.encodePng(2, 1, 3, Array[Byte](0, 5),
      _ => 0, Array[Byte](1, 2, 3))
    assert(Multimodal.decodePngPixels(badIdx) === None)
    // metadata flows through decode() with the real dims
    import spark.implicits._
    val m = Multimodal.decode(
      Seq(graft.operators.MediaAsset(9L, "image", whole, "t")).toDS())
      .collect().head
    assert(m.format === "png" && m.width === 4 && m.height === 3 &&
      m.channels === 3 && m.bits_per_sample === 8)
  }

  test("PNG: an FDICT zlib header (preset dictionary) is rejected, not " +
      "spun — inflate() yields 0 forever with needsInput() false") {
    // zlib stream demanding a preset dictionary: CMF 0x78, FLG 0x20
    // (FDICT set, (0x7820 % 31) == 0 so the header checksum passes),
    // then a 4-byte DICTID. PNG never uses FDICT; before the guard the
    // IDAT loop treated "0 bytes but !needsInput" as progress and hung.
    val zfdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte,
        (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length.toLong))
      val t = typ.getBytes("US-ASCII"); out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(2); ihdr.putInt(1) // 2×1
    ihdr.put(8.toByte); ihdr.put(2.toByte) // 8-bit truecolor
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    chunk("IHDR", ihdr.array()); chunk("IDAT", zfdict)
    chunk("IEND", Array.emptyByteArray)
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val f = done.submit(new java.util.concurrent.Callable[Option[Array[Byte]]] {
        def call() = Multimodal.decodePngPixels(out.toByteArray)
      })
      // generous bound: the decode is microseconds when it terminates
      assert(f.get(30, java.util.concurrent.TimeUnit.SECONDS) === None)
    } finally done.shutdownNow()
  }

  test("JPEG: trailing fill bytes at the buffer end are rejected in " +
      "bounds — FF D8 FF FF FF E0 must not read past the array") {
    // the fill-byte walk advances the cursor under a weaker bound than
    // the segment-length read; this input used to AIOOBE out of
    // jpegHeader (uncaught through decodeOne)
    val t = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xE0).map(_.toByte)
    assert(Multimodal.jpegHeader(t) === None)
    // longer fill runs ending anywhere near the buffer end, same class
    for (fills <- 1 to 6) {
      val p = (Array(0xFF, 0xD8) ++ Array.fill(fills)(0xFF) ++
        Array(0xE0)).map(_.toByte)
      assert(Multimodal.jpegHeader(p) === None, s"fills=$fills")
    }
  }

  test("GIF: indexed-gray encode → decode is bit-exact and agrees with " +
      "BMP/PNG/QOI on the same pixels — the q86 lossless rotation") {
    for ((w, h, seed) <- Seq((4, 3, 7L), (14, 7, 123L), (9, 5, 3000L))) {
      val gray = Array.tabulate(w * h)(i => ((seed * 31 + i) % 256).toByte)
      val rgb = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h) {
        rgb(i * 3) = gray(i); rgb(i * 3 + 1) = gray(i); rgb(i * 3 + 2) = gray(i)
      }
      val want = new Array[Byte](w * h * 4)
      for (i <- 0 until w * h) {
        want(i * 4) = gray(i); want(i * 4 + 1) = gray(i)
        want(i * 4 + 2) = gray(i); want(i * 4 + 3) = -1
      }
      val viaGif = Multimodal.decodeToRgba(
        Multimodal.encodeGifGray(w, h, gray))
      assert(viaGif.isDefined && viaGif.get.toSeq === want.toSeq,
        s"GIF drifted at ${w}x$h")
      // every lossless container carries the same pixels to the same bytes
      for ((name, payload) <- Seq(
          "bmp" -> Multimodal.encodeBmp(w, h, rgb),
          "png" -> Multimodal.encodePng(w, h, 2, rgb, y => (y % 5)),
          "qoi" -> Multimodal.encodeQoiRgb(w, h, rgb))) {
        val got = Multimodal.decodeToRgba(payload)
        assert(got.isDefined && got.get.toSeq === want.toSeq,
          s"$name disagreed with GIF at ${w}x$h")
      }
    }
    // incompressible noise across the 512/1024/2048/4096 LZW
    // boundaries, including the dictionary reset — the JDK reader is
    // the independent check on every code-width transition
    val rnd = new scala.util.Random(99)
    val (nw, nh) = (90, 80)
    val noise = Array.fill(nw * nh)(rnd.nextInt(256).toByte)
    val noisy = Multimodal.decodeToRgba(Multimodal.encodeGifGray(nw, nh, noise))
    assert(noisy.isDefined)
    for (i <- 0 until nw * nh)
      assert(noisy.get(i * 4) === noise(i),
        s"noise pixel $i drifted through the LZW boundaries")
  }

  test("JPEG band agreement: the smooth color ramp lands far inside the " +
      "q86 tolerance; an all-zero decode (worst defect) would not") {
    import spark.implicits._
    val docs = (1L to 40L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val rows = Multimodal.jpegBandAgreement(docs, dim = 4, bandPct = 15)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows.size === 40 && rows.values.forall(identity))
    // the band is meaningful: at 0% tolerance the same corpus fails —
    // codec noise exists and the check is not vacuously true
    val strict = Multimodal.jpegBandAgreement(docs, dim = 4, bandPct = 0)
      .collect().map(_.getBoolean(1))
    assert(strict.exists(v => !v))
  }

  test("JPEG: JDK-codec round-trip within a per-pixel error bound; " +
      "hand-rolled SOF header parse; hostile inputs rejected") {
    // smooth gradient (JPEG-friendly content): round-trip error stays
    // small; a broken huffman/IDCT/upsampling path would blow the bound
    val w = 17; val h = 11
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (40 + x * 8).toByte; rgb(o + 1) = (60 + y * 10).toByte
      rgb(o + 2) = 90.toByte
    }
    val jpg = Multimodal.encodeJpeg(w, h, rgb)
    assert(Multimodal.jpegHeader(jpg) === Some((w, h, 3, 8)))
    val px = Multimodal.decodeJpegPixels(jpg).getOrElse(fail("decode failed"))
    assert(px.length === w * h * 3)
    var maxErr = 0; var sumErr = 0L
    for (i <- px.indices) {
      val e = math.abs((px(i) & 0xff) - (rgb(i) & 0xff))
      maxErr = math.max(maxErr, e); sumErr += e
    }
    assert(maxErr <= 40, s"per-pixel error $maxErr out of bounds for smooth content")
    assert(sumErr.toDouble / px.length <= 8.0, s"mean error ${sumErr.toDouble / px.length}")
    // metadata flows through decode() off the SOF parse
    import spark.implicits._
    val m = Multimodal.decode(
      Seq(graft.operators.MediaAsset(3L, "image", jpg, "t")).toDS()).collect().head
    assert(m.format === "jpeg" && m.width === w && m.height === h &&
      m.channels === 3 && m.bits_per_sample === 8)
    // hostile: truncated before SOF → None; garbage after SOI → None;
    // forged zero-length segment (cursor would stall) → None; EOI
    // before any SOF → None. None of these throw.
    assert(Multimodal.jpegHeader(jpg.take(4)) === None)
    assert(Multimodal.jpegHeader(Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3, 4)) === None)
    val zeroLen = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 0, 0)
    assert(Multimodal.jpegHeader(zeroLen) === None)
    val eoiFirst = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte, 0, 0)
    assert(Multimodal.jpegHeader(eoiFirst) === None)
    assert(Multimodal.decodeJpegPixels(jpg.take(jpg.length / 2)) === None)
  }

  test("WAV PCM features: hand-computed 16-bit and 8-bit samples; " +
      "non-PCM rejected") {
    import spark.implicits._
    // mono 16-bit: samples 100, -200, 0, -1 → ss=50001, zcr=3 (+→−→+(0)→−), peak=200
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 8); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(8)
    Seq(100, -200, 0, -1).foreach(s => bb.putShort(s.toShort))
    val f16 = Multimodal.wavPcmFeatures(
      Seq(graft.operators.MediaAsset(1L, "audio", bb.array(), "t")).toDS())
      .collect().head
    assert(f16.getLong(1) === 4L) // n_frames
    assert(f16.getLong(2) === 100L * 100 + 200L * 200 + 0 + 1) // sum_sq
    assert(f16.getLong(3) === 3L) // zcr: +,−,0(+),−
    assert(f16.getLong(4) === 200L) // peak
    // stereo 8-bit unsigned: channel 0 = 128±x (centered), channel 1 ignored
    val b8 = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes); b8.putInt(36 + 4); b8.put("WAVE".getBytes)
    b8.put("fmt ".getBytes); b8.putInt(16); b8.putShort(1); b8.putShort(2)
    b8.putInt(8000); b8.putInt(16000); b8.putShort(2); b8.putShort(8)
    b8.put("data".getBytes); b8.putInt(4)
    b8.put(138.toByte); b8.put(0.toByte) // frame 0: ch0=+10
    b8.put(118.toByte); b8.put(0.toByte) // frame 1: ch0=−10
    val f8 = Multimodal.wavPcmFeatures(
      Seq(graft.operators.MediaAsset(2L, "audio", b8.array(), "t")).toDS())
      .collect().head
    assert(f8.getLong(1) === 2L && f8.getLong(2) === 200L &&
      f8.getLong(3) === 1L && f8.getLong(4) === 10L)
    // non-PCM (fmt tag 3 = IEEE float) → sentinel
    val ff = bb.array().clone(); ff(20) = 3
    assert(Multimodal.wavPcmFeatures(
      Seq(graft.operators.MediaAsset(3L, "audio", ff, "t")).toDS())
      .collect().head.getLong(1) === -1L)
  }

  test("Y4M: frame walk extracts exact frame payloads; truncated and " +
      "hostile streams are rejected") {
    import spark.implicits._
    val w = 3; val h = 2; val fl = 3 * w * h
    val f0 = Array.tabulate(fl)(i => (i + 1).toByte)
    val f1 = Array.tabulate(fl)(i => (100 + i).toByte)
    val head = s"YUV4MPEG2 W$w H$h F30:1 C444\n".getBytes("US-ASCII")
    val clip = head ++ "FRAME\n".getBytes ++ f0 ++
      "FRAME Xparam\n".getBytes ++ f1 // frame params must be skipped
    val rows = Multimodal.y4mFrames(
      Seq(graft.operators.MediaAsset(1L, "video", clip, "t")).toDS(), 1)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toMap
    assert(rows.keySet === Set(0, 1))
    assert(rows(0) === f0.toSeq && rows(1) === f1.toSeq)
    // stride 2 keeps only frame 0
    assert(Multimodal.y4mFrames(
      Seq(graft.operators.MediaAsset(1L, "video", clip, "t")).toDS(), 2)
      .collect().map(_.getInt(1)).toSeq === Seq(0))
    // decode() reports dims, fps, and the walked frame count
    val m = Multimodal.decode(
      Seq(graft.operators.MediaAsset(1L, "video", clip, "t")).toDS())
      .collect().head
    assert(m.format === "y4m" && m.width === w && m.height === h &&
      m.sample_rate === 30 && m.n_samples === 2L)
    // truncated final frame → structural reject (sentinel fsum row)
    val trunc = clip.dropRight(3)
    val sums = Multimodal.y4mFrameSums(
      Seq(graft.operators.MediaAsset(2L, "video", trunc, "t")).toDS())
      .collect()
    assert(sums.length === 1 && sums.head.getInt(1) === -1)
    // header without a newline inside the 256-byte cap → None, no scan
    // of the whole payload
    val noNl = ("YUV4MPEG2 W3 H2 " + "x" * 300).getBytes("US-ASCII")
    assert(Multimodal.y4mHeader(noNl) === None)
    // C420 frame sizing honored (w*h*3/2)
    val h420 = s"YUV4MPEG2 W4 H2 C420jpeg\n".getBytes("US-ASCII")
    val c420 = h420 ++ "FRAME\n".getBytes ++ new Array[Byte](12)
    val m420 = Multimodal.decode(
      Seq(graft.operators.MediaAsset(3L, "video", c420, "t")).toDS())
      .collect().head
    assert(m420.format === "y4m" && m420.n_samples === 1L)
  }

  test("codec-invariant features: the same pixels through BMP, PNG and QOI " +
      "produce bit-identical embeddings; JPEG lands within codec noise") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val w = 9; val h = 5
    val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    // QOI: every pixel as an RGB literal + the 8-byte end marker — a
    // valid stream any conforming encoder could have produced
    val qoi = {
      val bb = java.nio.ByteBuffer.allocate(14 + w * h * 4 + 8)
      bb.put("qoif".getBytes); bb.putInt(w); bb.putInt(h)
      bb.put(3.toByte); bb.put(0.toByte)
      for (i <- 0 until w * h) {
        bb.put(0xFE.toByte)
        bb.put(rgb(i * 3)); bb.put(rgb(i * 3 + 1)); bb.put(rgb(i * 3 + 2))
      }
      (0 until 7).foreach(_ => bb.put(0.toByte)); bb.put(1.toByte)
      bb.array()
    }
    // sanity: all three lossless decoders agree on the raw pixels
    val viaBmp = Multimodal.decodeToRgba(Multimodal.encodeBmp(w, h, rgb)).get
    assert(viaBmp.toSeq === Multimodal.decodePngPixels(
      Multimodal.encodePng(w, h, 2, rgb, _ => 3)).get.toSeq)
    assert(viaBmp.toSeq === Multimodal.decodeQoiPixels(qoi).get.toSeq)
    val assets = Seq(
      graft.operators.MediaAsset(1L, "image", Multimodal.encodeBmp(w, h, rgb), "t"),
      graft.operators.MediaAsset(2L, "image",
        Multimodal.encodePng(w, h, 2, rgb, y => y % 5), "t"),
      graft.operators.MediaAsset(3L, "image", qoi, "t")).toDS()
    val vecs = Multimodal.featureExtractDecoded(assets, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) === vecs(2L), "BMP vs PNG embeddings must be bit-identical")
    assert(vecs(1L) === vecs(3L), "BMP vs QOI embeddings must be bit-identical")
    // JPEG (lossy, smooth content): high cosine to the lossless vector
    val smooth = Array.tabulate(w * h * 3) { i =>
      val px = i / 3; (30 + (px % w) * 6 + (px / w) * 4).toByte
    }
    val pair = Seq(
      graft.operators.MediaAsset(4L, "image", Multimodal.encodeBmp(w, h, smooth), "t"),
      graft.operators.MediaAsset(5L, "image", Multimodal.encodeJpeg(w, h, smooth), "t"))
      .toDS()
    val pv = Multimodal.featureExtractDecoded(pair, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val cos = pv(4L).zip(pv(5L)).map { case (a, b) => a.toDouble * b }.sum
    assert(cos > 0.98, s"JPEG embedding drifted: cosine $cos")
    // unknown payloads fall back to the byte histogram (still featurize)
    val fb = Multimodal.featureExtractDecoded(
      Seq(graft.operators.MediaAsset(6L, "image", Array[Byte](1, 2, 3), "t")).toDS(), 32)
      .collect()
    assert(fb.length === 1 && math.abs(
      fb.head.getSeq[Float](1).map(x => x.toDouble * x).sum - 1.0) < 1e-6)
  }

  test("GIF: JDK-codec first-frame decode round-trips a palette-sized " +
      "image losslessly; codec-invariant with BMP of the same pixels") {
    import spark.implicits._
    // ≤256 distinct colors → the GIF writer quantizes nothing; the
    // LZW round trip is exact and the embeddings must match BMP's
    val w = 10; val h = 6
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      val c = i % 4 // four distinct colors
      rgb(i * 3) = (40 * c).toByte; rgb(i * 3 + 1) = (60 + 20 * c).toByte
      rgb(i * 3 + 2) = (200 - 30 * c).toByte
    }
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val gif = bos.toByteArray
    assert(Multimodal.gifHeader(gif) === Some((w, h)))
    val px = Multimodal.decodeGifPixels(gif).getOrElse(fail("gif decode failed"))
    for (i <- 0 until w * h)
      assert(px(i * 4) === rgb(i * 3) && px(i * 4 + 1) === rgb(i * 3 + 1) &&
        px(i * 4 + 2) === rgb(i * 3 + 2), s"pixel $i")
    // metadata + codec invariance through the shared surfaces
    val assets = Seq(
      graft.operators.MediaAsset(1L, "image", gif, "t"),
      graft.operators.MediaAsset(2L, "image", Multimodal.encodeBmp(w, h, rgb), "t"))
      .toDS()
    val m = Multimodal.decode(assets).collect().map(d => d.asset_id -> d).toMap
    assert(m(1L).format === "gif" && m(1L).width === w && m(1L).height === h)
    val vecs = Multimodal.featureExtractDecoded(assets, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) === vecs(2L), "GIF and BMP of the same pixels must embed identically")
    // hostile: truncated header → None; truncated LZW stream → None
    assert(Multimodal.gifHeader(gif.take(8)) === None)
    assert(Multimodal.decodeGifPixels(gif.take(gif.length / 3)) === None)
  }

  test("PNM pixels join the uniform RGBA surface: P6 codec-invariant with " +
      "BMP; P5 expands gray; 16-bit and truncated rejected") {
    import spark.implicits._
    val w = 5; val h = 4
    val rgb = Array.tabulate(w * h * 3)(i => (i * 13).toByte)
    val p6 = (s"P6\n$w $h\n255\n".getBytes("US-ASCII")) ++ rgb
    assert(Multimodal.decodePnmPixels(p6).get.toSeq ===
      Multimodal.decodeBmpPixels(Multimodal.encodeBmp(w, h, rgb)).get.toSeq)
    // and through the shared embedding surface
    val assets = Seq(
      graft.operators.MediaAsset(1L, "image", p6, "t"),
      graft.operators.MediaAsset(2L, "image", Multimodal.encodeBmp(w, h, rgb), "t"))
      .toDS()
    val vecs = Multimodal.featureExtractDecoded(assets, 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) === vecs(2L))
    // P5: gray g expands to (g,g,g,255)
    val gray = Array.tabulate(w * h)(i => (i * 7).toByte)
    val p5 = (s"P5\n$w $h\n255\n".getBytes("US-ASCII")) ++ gray
    val g = Multimodal.decodePnmPixels(p5).get
    for (i <- 0 until w * h)
      assert(g(i * 4) === gray(i) && g(i * 4 + 1) === gray(i) &&
        g(i * 4 + 2) === gray(i) && g(i * 4 + 3) === -1)
    // 16-bit maxval: metadata-only (None here), truncated: None
    val p5wide = (s"P5\n$w $h\n65535\n".getBytes("US-ASCII")) ++
      new Array[Byte](w * h * 2)
    assert(Multimodal.decodePnmPixels(p5wide) === None)
    assert(Multimodal.decodePnmPixels(p6.take(p6.length - 2)) === None)
  }

  test("real decode: hostile WAV chunk size near 2^32 terminates as unknown, no hang") {
    import spark.implicits._
    // RIFF/WAVE with a chunk whose u32 size field is 0xFFFFFFF8 — an
    // Int-arithmetic chunk walk would step 0 and spin forever
    val evil = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes); evil.putInt(16); evil.put("WAVE".getBytes)
    evil.put("junk".getBytes); evil.putInt(0xFFFFFFF8)
    val assets = Seq(graft.operators.MediaAsset(1L, "audio", evil.array(), "t")).toDS()
    val m = Multimodal.decode(assets).collect().head
    assert(m.format === "unknown")
  }

  test("exactGroups: null-key rows form their own group and come back") {
    import spark.implicits._
    val docs = Seq((1L, Some("k")), (2L, None: Option[String]),
      (3L, None: Option[String]), (4L, Some("k"))).toDF("doc_id", "k")
    val out = Dedup.exactGroups(docs, col("k"), "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_size"), r.getAs[Boolean]("is_representative"))).toMap
    assert(out.size === 4, "null-key rows must not vanish")
    assert(out(2L) === ((2L, true)))  // nulls group together, min id reps
    assert(out(3L) === ((2L, false)))
    assert(out(1L) === ((2L, true)))
    assert(out(4L) === ((2L, false)))
  }

  test("real BMP resize: nearest-neighbor downsample round-trips through decode") {
    import spark.implicits._
    // 4×4 with a distinct value per pixel so sampling is observable
    val bmp = makeBmp(4, 4, (x, y) => ((y * 4 + x).toByte, 0, 0))
    val assets = Seq(graft.operators.MediaAsset(1L, "image", bmp, "t"),
      graft.operators.MediaAsset(2L, "image", "junk".getBytes, "t")).toDS()
    val resized = Multimodal.resizeBmp(assets, 2, 2).collect()
      .map(a => a.asset_id -> a.payload).toMap
    // decode sees a well-formed 2×2 BMP
    val again = Multimodal.decode(
      Seq(graft.operators.MediaAsset(1L, "image", resized(1L), "t")).toDS())
      .collect().head
    assert(again.format === "bmp" && again.width === 2 && again.height === 2)
    // nearest-neighbor picks source pixels (0,0)->(0,0), (2,0)->(1,0)...
    val stride = (2 * 3 + 3) / 4 * 4
    def blue(x: Int, y: Int): Int = resized(1L)(54 + y * stride + x * 3) & 0xff
    assert(blue(0, 0) === 0 && blue(1, 0) === 2)
    assert(blue(0, 1) === 8 && blue(1, 1) === 10)
    // non-BMP payloads pass through untouched
    assert(resized(2L) === "junk".getBytes)
  }

  test("multimodal: resize stub scales payload; features feed the ANN path") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val assets = Multimodal.assetsFromDocuments(docs)
    // resize: payload shrinks toward the target pixel ratio, meta updated
    val meta = Multimodal.decodeStub(assets)
    val withPayload = meta.joinWith(assets, meta("asset_id") === assets("asset_id"))
      .map { case (m, a) => (m, a.payload) }
    val resized = Multimodal.resizeStub(withPayload, 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall { case (m, p) =>
      m.width == 32 && m.height == 32 && m.n_bytes == p.length && p.nonEmpty })
    // featureExtract: unit-norm dim-16 vectors, deterministic, and they
    // compose with the exact ANN operator end-to-end
    val feats = Multimodal.featureExtract(assets, dim = 16)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    val norms = rows.map(_.getSeq[Float](1))
      .map(v => v.map(x => x.toDouble * x).sum)
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    val topk = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") < 3), k = 2)
    assert(topk.count() === 6)
  }

  test("canonical per cluster: bounded argmax picks max-pref, then max-id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 1L), (7L, 6L), (6L, 6L))
      .toDF("doc_id", "cluster_rep")
    val docs = Seq((1L, 50), (2L, 80), (4L, 80), (6L, 10), (7L, 10))
      .toDF("doc_id", "n_chars")
    val got = Dedup.canonicalPerCluster(clusters, docs, "doc_id", "n_chars")
      .orderBy("cluster_rep").collect()
      .map(r => (r.getAs[Long]("cluster_rep"), r.getAs[Long]("n_members"),
        r.getAs[Long]("canonical_id"), r.getAs[Long]("canonical_pref")))
    // cluster 1: pref tie 80/80 between 2 and 4 → larger id 4 wins;
    // cluster 6: tie 10/10 → id 7.
    assert(got.toSeq === Seq((1L, 3L, 4L, 80L), (6L, 2L, 7L, 10L)))
  }

  test("bloom anti-join equals the exact left_anti join") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("fp", TextFunctions.fingerprint(col("text")).cast("string"))
    val left = docs.filter(col("doc_id") % 3 =!= 0)
    val right = docs.filter(col("doc_id") % 3 === 0).select("fp").distinct()
    val exact = left.join(right, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val bloom = Decontaminate.bloomAntiJoin(left, right, "fp", expectedItems = 64)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(bloom.toSeq === exact.toSeq)
    assert(exact.nonEmpty)
  }

  test("bloom anti-join with an EMPTY holdout keeps every left row") {
    // BloomFilterAggregate over zero rows evals to null; without the
    // coalesce in bloomAntiJoin the null would propagate through
    // might_contain and BOTH branches would drop every row
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("fp", TextFunctions.fingerprint(col("text")).cast("string"))
    val left = docs.filter(col("doc_id") % 3 =!= 0)
    val empty = docs.filter(lit(false)).select("fp")
    val kept = Decontaminate.bloomAntiJoin(left, empty, "fp", expectedItems = 64)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val all = left.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(all.nonEmpty)
    assert(kept.toSeq === all.toSeq)
  }

  test("string-id TopK aggregator equals the window row_number form") {
    import spark.implicits._
    val counts = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), explode(TextFunctions.words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("source", "term").agg(count(lit(1)).cast("double").as("score"))
    val viaAgg = TopK.perStringKeyStringId(counts, "source", "term", "score", 5)
      .select("source", "rk", "term", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score").desc, col("term"))
    val viaWindow = counts
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("source", "rk", "term", "score")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("scd2: validity chain partitions time; compactLatest matches its current rows") {
    import spark.implicits._
    val log = Seq(
      (1L, "a", 100L, 10L, 1.0), (2L, "a", 200L, 20L, 2.0),
      (3L, "a", 150L, 15L, 9.0), (4L, "b", 50L, 5L, 7.0))
      .toDF("event_id", "key", "us", "tie", "value")
    val iv = Cdc.scd2(log, Seq("key"), "us", "tie").collect()
    val a = iv.filter(_.getAs[String]("key") == "a")
      .sortBy(_.getAs[Long]("us"))
      .map(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current")))
    // chain 100→150→200, only the last open
    assert(a.toSeq === Seq((100L, Some(150L), false),
      (150L, Some(200L), false), (200L, None, true)))
    val compact = Cdc.compactLatest(log, Seq("key"), "us", "tie", Seq("value"))
      .orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("last_us"),
        r.getAs[Double]("last_value"), r.getAs[Long]("n_versions")))
    assert(compact.toSeq === Seq(("a", 200L, 2.0, 3L), ("b", 50L, 7.0, 1L)))
  }

  test("mixRepeats: repeats bracket the weight; max group stays at exactly 1") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val rep = Sampling.mixRepeats(docs, "source", col("doc_id"), r => sqrt(r))
    val stats = rep.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("repeats")).as("sum_rep"),
        min(col("repeats")).as("min_rep"), max(col("repeats")).as("max_rep"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_rep"), r.getAs[Long]("min_rep"), r.getAs[Long]("max_rep")))
    val maxN = stats.map(_._2).max
    stats.foreach { case (src, n, sumRep, minRep, maxRep) =>
      val w = math.sqrt(maxN.toDouble / n.toDouble)
      assert(minRep >= math.floor(w).toLong && maxRep <= math.ceil(w).toLong,
        s"$src repeats outside [floor(w), ceil(w)]")
      // expected total n·w; hash realization keeps it within the group
      assert(math.abs(sumRep - n * w) < n, s"$src epochs far from n·w")
      if (n == maxN) assert(minRep === 1L && maxRep === 1L)
    }
    // deterministic: a second evaluation assigns identically
    val again = Sampling.mixRepeats(docs, "source", col("doc_id"), r => sqrt(r))
      .select("doc_id", "repeats").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = rep.select("doc_id", "repeats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first === again)
  }

  test("chunking: geometry matches a per-doc recomputation exactly") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val chunks = Chunking.slidingTokenWindows(docs, "text", 128, 32)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_count")))
      .groupBy(_._1)
    val local = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty))
      .toMap
    local.foreach { case (id, n) =>
      val expected = (0 until n by 96)
        .zipWithIndex
        .map { case (start, i) => (id, i.toLong, start.toLong, math.min(128, n - start).toLong) }
        .toSet
      assert(chunks.getOrElse(id, Array.empty).toSet === expected, s"doc $id n=$n")
    }
    assert(chunks.values.map(_.length).sum > local.size, "overlap chunking must emit >1 chunk somewhere")
  }

  test("shardByHash: deterministic, in-range, and tightly balanced") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val sharded = Sampling.shardByHash(docs, col("doc_id"), 16, "shard")
    val counts = sharded.groupBy("shard").count().collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("count")).toMap
    assert(counts.keySet.forall(s => s >= 0 && s < 16))
    assert(counts.values.sum === docs.count())
    val mean = counts.values.sum.toDouble / 16
    assert(counts.values.forall(c => math.abs(c - mean) < 6 * math.sqrt(mean)),
      s"shard skew beyond 6 sigma: $counts")
    val a = sharded.select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.shardByHash(docs, col("doc_id"), 16, "shard")
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("budget selection equals the sequential sort-and-cut definition") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("source"),
        (pmod(col("doc_id") * 31, lit(97L)) + 1).as("w"),
        (pmod(col("doc_id") * 7919, lit(1000L)).cast("double") / 1000.0).as("q"))
    val budget = 800L
    val got = graft.operators.BudgetSelect
      .byScoreBudget(base, "source", "doc_id", "w", "q", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val win = Window.partitionBy("source")
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = base.withColumn("cum", sum("w").over(win))
      .filter(col("cum") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < base.count())
    // all-equal scores: ties cut purely by id order, per group (a
    // data-dependent group column — a constant would fold to an
    // unpartitioned window and spam WindowExec warnings)
    val toy = spark.range(1, 11).select(
      when(col("id") <= 5, "a").otherwise("b").as("g"), col("id"),
      lit(3L).as("w"), lit(1.0).as("q"))
    val toySel = graft.operators.BudgetSelect
      .byScoreBudget(toy, "g", "id", "w", "q", budget = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(toySel === Set(1L, 2L, 3L, 6L, 7L, 8L))
  }

  test("property: budget selection equals a local sequential cut on random inputs") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val caseGen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, Gen.choose(0L, 20L))
      qs <- Gen.listOfN(n, Gen.choose(0, 5)) // coarse scores force ties
      budget <- Gen.choose(0L, 120L)
    } yield (ws.zip(qs).zipWithIndex.map { case ((w, qi), i) =>
      (s"g${i % 3}", i.toLong, w, qi / 5.0)
    }, budget)
    val prop = Prop.forAll(caseGen) { case (rows, budget) =>
      val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy { case (_, id, _, q) => (-q, id) }
          .takeWhile { case (_, _, w, _) => cum += w; cum <= budget }
          .map(_._2)
      }.toSet
      val got =
        if (rows.isEmpty) Set.empty[Long]
        else graft.operators.BudgetSelect.byScoreBudget(
            spark.createDataFrame(rows).toDF("g", "id", "w", "q"),
            "g", "id", "w", "q", budget)
          .select("id").collect().map(_.getLong(0)).toSet
      got == expected
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("PQ: codes deterministic and in range; reconstruction beats the 1-codeword baseline") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cb = graft.operators.Pq.train(emb, dim = 64, nSub = 8, k = 16, nIters = 2)
    assert(cb.nSub === 8 && cb.k === 16 && cb.subDim === 8)
    val enc = graft.operators.Pq.encode(emb, cb)
      .select(col("vec_id"), col("code"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Float](2).map(_.toDouble)))
    assert(enc.forall { case (_, code, _) =>
      code.length == 8 && code.forall(j => j >= 0 && j < 16) })
    // deterministic re-encode
    val again = graft.operators.Pq.encode(emb, cb)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.forall { case (id, code, _) => again(id) == code })
    // reconstruction MSE must beat quantizing everything to the mean
    val dim = 64
    val n = enc.length
    val mean = enc.map(_._3.toArray).transpose.map(_.sum / n)
    def mse(errs: Iterator[Double]): Double = errs.sum / (n * dim)
    val pqMse = mse(enc.iterator.flatMap { case (_, code, v) =>
      val rec = graft.operators.Pq.decode(code, cb)
      v.indices.map(i => (v(i) - rec(i)) * (v(i) - rec(i)))
    })
    val meanMse = mse(enc.iterator.flatMap { case (_, _, v) =>
      v.indices.map(i => (v(i) - mean(i)) * (v(i) - mean(i)))
    })
    assert(pqMse < meanMse * 0.8,
      s"PQ reconstruction ($pqMse) must clearly beat the mean baseline ($meanMse)")
  }

  test("PQ ADC with rerank over everything equals exact brute force") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val cb = graft.operators.Pq.train(emb, dim = 64, nSub = 8, k = 16, nIters = 1)
    val n = emb.count().toInt
    val got = graft.operators.Pq
      .adcTopK(graft.operators.Pq.encode(emb, cb), queries, k = 3, cb, rerank = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === exact)
  }

  test("native PqEncode equals the built-in array_min formulation element-for-element") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cb = graft.operators.Pq.train(emb, dim = 64, nSub = 8, k = 16, nIters = 2)
    val builtin = emb.withColumn("code", array((0 until cb.nSub).map(m =>
      graft.operators.Pq.codeColBuiltin(col("embedding"), m, cb.subDim, cb.books(m))): _*))
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val native = graft.operators.Pq.encode(emb, cb)
      .select(col("vec_id"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(native.nonEmpty)
    native.foreach { case (id, code) =>
      assert(code === builtin(id), s"vec_id=$id")
    }
  }

  test("IVF+PQ with every cell probed and rerank over everything equals exact brute force") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val centroids = graft.operators.Ivf.train(emb, nCentroids = 8, nIters = 1)
    val cb = graft.operators.Pq.train(emb, dim = 64, nSub = 8, k = 16, nIters = 1)
    val n = emb.count().toInt
    val got = graft.operators.IvfPq
      .topK(emb, queries, k = 3, centroids, nProbe = 8, cb, rerank = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === exact)
  }

  test("string-id TopK tie-break is UTF-8 byte order, agreeing with the window form on supplementary-plane ids") {
    import spark.implicits._
    // '�' (REPLACEMENT, 3-byte UTF-8) vs a surrogate-pair emoji
    // (4-byte UTF-8, code point U+1F600): UTF-16 code-unit order puts
    // the emoji FIRST (high surrogate 0xD83D < 0xFFFD) while UTF-8 byte
    // order puts it LAST — exactly the divergence ADVICE flagged
    val ids = Seq("a", "�", "😀", "z")
    val rows = ids.map(id => ("g", id, 1.0)).toDF("key", "id", "score")
    val viaAgg = TopK.perStringKeyStringId(rows, "key", "id", "score", 4)
      .select("rk", "id").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val viaWindow = rows.withColumn("rk", row_number().over(w))
      .select("rk", "id").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(viaAgg.toSeq === viaWindow.toSeq)
    // and the emoji really does sort after U+FFFD here (UTF-8 order)
    assert(viaWindow.find(_._2 == "😀").get._1 === 4)
  }

  test("morton2 equals a bit-loop reference; z-buckets are bounded 2-D tiles") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (j <- 0 until 16) {
        z |= ((a >> j) & 1L) << (2 * j)
        z |= ((b >> j) & 1L) << (2 * j + 1)
      }
      z
    }
    val rows = spark.range(2000)
      .select(col("id"),
        (col("id") * 7919 % 65536).as("a"), (col("id") * 104729 % 65536).as("b"))
    val got = rows.withColumn("z", Layout.morton2(col("a"), col("b")))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("z")))
    got.foreach { case (a, b, z) => assert(z === ref(a, b), s"morton($a,$b)") }
    // tile property: same top-6-bits bucket → each dim spans < 8192
    val tiles = got.groupBy { case (_, _, z) => z >>> 26 }
    tiles.foreach { case (bk, vs) =>
      assert(vs.map(_._1).max - vs.map(_._1).min < 8192, s"bucket $bk x-span")
      assert(vs.map(_._2).max - vs.map(_._2).min < 8192, s"bucket $bk y-span")
    }
    assert(tiles.size > 4, "fixture must exercise multiple tiles")
  }

  test("crossCosinePairs on a self-split equals the all-pairs form restricted to the split") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val cross = Similarity.crossCosinePairs(a, b, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the all-pairs form emits (min, max) ordered pairs; restrict to
    // even-odd pairs and reorient to (even, odd)
    val all = Similarity.cosineNearDupPairs(emb, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (x, y, _) => (x % 2 == 0) != (y % 2 == 0) }
      .map { case (x, y, s) => if (x % 2 == 0) (x, y, s) else (y, x, s) }.toSet
    assert(cross === all)
    assert(cross.nonEmpty)
  }

  test("multimodal: stub decode metadata and frame sampling") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val assets = Multimodal.assetsFromDocuments(docs)
    val meta = Multimodal.decodeStub(assets).collect()
    assert(meta.length === docs.count())
    assert(meta.forall(m => m.n_bytes > 0 && m.width >= 16 && m.height >= 16))
    // frame count = ceil(floor(bytes/64) / 2) per asset
    val frames = Multimodal.frameSample(assets.toDF(), 64, 2)
    val got = frames.groupBy("asset_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("n")).toMap
    val expected = meta.map(m => m.asset_id -> {
      val nf = m.n_bytes / 64
      if (nf > 0) (nf + 1) / 2 else 0L
    }).filter(_._2 > 0).toMap
    assert(got === expected)
    // every frame is exactly 64 bytes except possibly the tail slice
    val sizes = frames.select(length(col("frame"))).distinct().collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 64))
  }

  test("repetition signals: top token (ties to smallest), dup n-grams, gate") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b c"),            // top 'a'×3, gate: 3*5 >= 5 tokens → true
      (2L, "x y x y x y"),          // top 'x'×3 ties 'y'×3 → min 'x'; bigrams: xy yx xy yx xy → dups 3
      (3L, "many unique words appear exactly once total")) // 7 tokens, top count 1 → 5 < 7, gate false
      .toDF("doc_id", "text")
    val w = TextFunctions.words(col("text"))
    val r = df.select(col("doc_id"),
        TextFunctions.topToken(w).as("top"),
        TextFunctions.topTokenCount(w).as("n"),
        TextFunctions.dupNgramCount(w, 2).as("dup2"),
        (TextFunctions.topTokenCount(w) * 5 >= size(w)).as("gate"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[String]("top") === "a" && r(0).getAs[Int]("n") === 3)
    assert(r(0).getAs[Int]("dup2") === 1) // "a a" appears twice
    assert(r(0).getAs[Boolean]("gate"))
    assert(r(1).getAs[String]("top") === "x" && r(1).getAs[Int]("n") === 3)
    assert(r(1).getAs[Int]("dup2") === 3)
    assert(r(2).getAs[String]("top") === "appear" && r(2).getAs[Int]("n") === 1)
    assert(r(2).getAs[Int]("dup2") === 0 && !r(2).getAs[Boolean]("gate"))
  }

  test("line dedup drops cross-doc repeated chunks and reassembles in order") {
    import spark.implicits._
    // 4-token "lines": docs 1 and 2 share a boilerplate chunk; doc 3 is
    // an exact dup of doc 1; doc 4 is untouched unique text
    val df = Seq(
      (1L, "subscribe to our newsletter " + "real content about turtles " + "more turtle facts here"),
      (2L, "subscribe to our newsletter " + "completely original essay text " + "with a unique ending"),
      (3L, "subscribe to our newsletter " + "real content about turtles " + "more turtle facts here"),
      (4L, "nothing here repeats anywhere " + "so every chunk survives intact"))
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup.dropRepeatedChunks(df, "doc_id", "text",
        chunkTokens = 4, maxDocs = 1)
      .orderBy("doc_id").collect()
    assert(r.length === 4)
    // docs 1 and 3 are identical → every chunk repeats → fully scrubbed
    assert(r(0).getAs[Long]("n_chunks") === 3 && r(0).getAs[Long]("n_kept_chunks") === 0)
    assert(r(0).getAs[String]("cleaned") === "")
    assert(r(2).getAs[Long]("n_kept_chunks") === 0)
    // doc 2 loses only the shared boilerplate opening, order preserved
    assert(r(1).getAs[Long]("n_chunks") === 3 && r(1).getAs[Long]("n_kept_chunks") === 2)
    assert(r(1).getAs[String]("cleaned") ===
      "completely original essay text with a unique ending")
    // doc 4 untouched (9 tokens → two full chunks + the 1-token tail)
    assert(r(3).getAs[Long]("n_kept_chunks") === 3)
    assert(r(3).getAs[String]("cleaned") === df.collect()(3).getAs[String]("text"))
  }

  test("native RepetitionStats equals the HOF fold formulation on the fixture") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq( // edge cases the fixture lacks
        (90001L, "x y x y x y"),            // tie: x and y both 3 → min
        (90002L, "solo"),                   // single token, no bigrams
        (90003L, "a a a a a a a a a a"),    // one token repeated
        (90004L, ""),                       // empty: split yields [""]
        (90005L, "   ")                     // whitespace-only: same
      ).toDF("doc_id", "text"))
    val w = TextFunctions.words(col("text"))
    val hof = docs.select(col("doc_id"),
      TextFunctions.topTokenStats(w).as("tts"),
      TextFunctions.dupNgramCount(w, 2).as("dup"))
      .select(col("doc_id"), col("tts.top_token").as("t"),
        col("tts.top_token_n").as("n"), col("dup"))
    val native = docs.select(col("doc_id"),
      graft.functions.RepetitionStats(col("text"), 2).as("st"))
      .select(col("doc_id"), col("st.top_token").as("t"),
        col("st.top_token_n").as("n"), col("st.dup_ngram_n").as("dup"))
    assert(native.except(hof).count() === 0)
    assert(hof.except(native).count() === 0)
    // and via SQL registration
    graft.api.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("rs_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, repetition_stats(text, 2).dup_ngram_n AS dup FROM rs_docs")
    assert(viaSql.except(native.select(col("doc_id"), col("dup"))).count() === 0)
    // the q61 gate's n_tokens >= 10 precondition: empty/whitespace docs
    // (whose [""] split artifact makes them look maximally repetitive)
    // must NOT gate; a genuinely repetitive 10-token doc must
    val gated = docs.select(col("doc_id"),
        graft.functions.RepetitionStats(col("text"), 2).as("st"),
        size(TextFunctions.words(col("text"))).as("n"))
      .select(col("doc_id"),
        (col("st.top_token_n") * 5 >= col("n") && col("n") >= 10).as("g"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gated(90003L) === true)
    assert(gated(90004L) === false && gated(90005L) === false)
  }

  test("extractDomain resists userinfo and trailing-dot blocklist evasion") {
    import spark.implicits._
    val df = Seq(
      (1L, "see https://site0.example.org/p plain"),
      (2L, "see https://anything@site0.example.org/p userinfo"),
      (3L, "see https://site0.example.org./p trailing dot"),
      (4L, "see http://a.b.c:8080/x no port capture"),
      (5L, "no url at all"))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"), TextFunctions.extractDomain(col("text")).as("d"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(r(0) === "site0.example.org")
    assert(r(1) === "site0.example.org") // user@host must not yield "user"
    assert(r(2) === "site0.example.org") // host. must not dodge an exact match
    assert(r(3) === "a.b.c")
    assert(r(4) === "")
  }

  test("property: line dedup equals a local sequential reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val caseGen = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, Gen.choose(0, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
      k <- Gen.choose(1, 3)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    val prop = Prop.forAll(caseGen) { case (docs, k) =>
      // local reference: same chunking rule, drop cross-doc repeats
      val chunks = docs.map { case (id, t) =>
        val w = t.split(" ").filter(_.nonEmpty)
        id -> w.grouped(k).map(_.mkString(" ")).toVector
      }
      val repeated = chunks.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
      val expected = chunks.map { case (id, cs) =>
        val kept = cs.filterNot(repeated)
        (id, cs.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      import spark.implicits._
      val got = graft.operators.Dedup.dropRepeatedChunks(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          chunkTokens = k, maxDocs = 1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      got == expected
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("PII redaction is idempotent: redacting redacted text is a no-op") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(concat(col("text"),
        lit(" a@b.com +1-555-0000 10.0.0.1 user@ops.example.org")).as("t"))
    val once = docs.select(TextFunctions.redactPii(col("t")).as("r1"))
    val twice = once.select(col("r1"), TextFunctions.redactPii(col("r1")).as("r2"))
    assert(twice.filter(col("r1") =!= col("r2")).count() === 0)
  }

  test("PII redaction masks emails, phones, IPv4s on realistic strings") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.co.uk or +44-123-4567"),
      (2L, "server 192.168.0.1 fell over; paged bob@ops.io at 3am"),
      (3L, "no pii here, just text with numbers 123 and dots..."),
      (4L, "dual: a@b.com c@d.org 1-555-0000 10.0.0.1 172.16.254.3"))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        TextFunctions.piiEmailCount(col("text")).as("e"),
        TextFunctions.piiPhoneCount(col("text")).as("p"),
        TextFunctions.piiIpv4Count(col("text")).as("i"),
        TextFunctions.redactPii(col("text")).as("red"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("e") === 1 && r(0).getAs[Int]("p") === 1)
    assert(r(0).getAs[String]("red") === "reach me at <EMAIL> or <PHONE>")
    assert(r(1).getAs[Int]("i") === 1 && r(1).getAs[Int]("e") === 1)
    assert(r(1).getAs[String]("red") === "server <IP> fell over; paged <EMAIL> at 3am")
    assert(r(2).getAs[Int]("e") === 0 && r(2).getAs[Int]("p") === 0 && r(2).getAs[Int]("i") === 0)
    assert(r(2).getAs[String]("red") === "no pii here, just text with numbers 123 and dots...")
    assert(r(3).getAs[Int]("e") === 2 && r(3).getAs[Int]("p") === 1 && r(3).getAs[Int]("i") === 2)
    assert(r(3).getAs[String]("red") === "dual: <EMAIL> <EMAIL> <PHONE> <IP> <IP>")
  }

  test("substring dedup scrubs duplicated spans at ANY offset; short docs " +
      "and unique text survive whole") {
    import spark.implicits._
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6-token span
    val docs = Seq(
      // span starts at offset 0 in doc 1, offset 2 in doc 2 — a
      // boundary-UNALIGNED repeat chunk-dedup would miss
      (1L, s"$shared tail one two"),
      (2L, s"pre amble $shared coda"),
      (3L, "entirely unique text with no repeats at all whatsoever indeed"),
      (4L, "tiny doc"), // shorter than the window: never droppable
      (5L, "")).toDF("doc_id", "text")
    val out = Dedup.dropDuplicatedSpans(docs, "doc_id", "text",
      windowTokens = 6, minDocs = 2).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(1L) === ((9L, 3L, "tail one two")))
    assert(byId(2L) === ((9L, 3L, "pre amble coda")))
    assert(byId(3L)._1 === byId(3L)._2) // untouched
    assert(byId(4L) === ((2L, 2L, "tiny doc")))
    assert(byId(5L) === ((0L, 0L, "")))
    // overlapping duplicated windows merge: coverage is a union of
    // positions, tokens are not dropped twice
    val n = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val both = Dedup.dropDuplicatedSpans(n, "doc_id", "text",
      windowTokens = 4, minDocs = 2).collect()
    assert(both.forall(r => r.getLong(2) === 0L && r.getString(3) === ""))
  }

  test("clustered SemDeDup keeps a superset of exact-mode survivors " +
      "and agrees on the fixture's verdicts for co-clustered pairs") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val exact = Similarity.semanticDedup(emb, 0.40)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val clustered = Similarity.semanticDedup(emb, 0.40, nClusters = 4, nIters = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // cluster-local pairs ⊆ all pairs ⇒ cluster-local drops ⊆ exact drops
    assert(exact.subsetOf(clustered))
    val n = emb.count()
    assert(exact.size < n, "fixture must contain semantic dups")
    // the scale path must still prune most of what exact mode prunes
    val dropsExact = n - exact.size
    val dropsClustered = n - clustered.size
    assert(dropsClustered * 2 >= dropsExact,
      s"clustered mode pruned $dropsClustered of $dropsExact exact drops")
  }

  test("phrase search: positional joins find overlapping and repeated-token " +
      "occurrences; postings are 1-based") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" occurs at pos 1 AND 3 (overlap)
      (2L, "x a b a y"),
      (3L, "a a a a"), // repeated-token phrase "a a a" at pos 1 and 2
      (4L, "b a")).toDF("doc_id", "text")
    val post = graft.operators.Search.postings(docs, "doc_id", "text")
    assert(post.filter(col("doc_id") === 1L && col("token") === "a")
      .select("pos").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3, 5))
    val aba = graft.operators.Search.phraseOccurrences(post, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(aba === Seq((1L, 1), (1L, 3), (2L, 2)))
    val aaa = graft.operators.Search.phraseOccurrences(post, Seq("a", "a", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(aaa === Seq((3L, 1), (3L, 2)))
    val none = graft.operators.Search.phraseOccurrences(post, Seq("y", "x"))
    assert(none.count() === 0)
  }

  test("phrase search: the materialized index answers every phrase " +
      "identically to live postings; rarest-first ordering is " +
      "result-invariant") {
    import spark.implicits._
    import graft.operators.Search
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat naps under the warm sun"),
      (3L, "a quick brown fox and a quick brown fox again"),
      (4L, "the the the quick quick brown"),
      (5L, "")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("searchidx").toString
    Search.writeIndex(docs, "doc_id", "text", idx, nBuckets = 4)
    val post = Search.postings(docs, "doc_id", "text")
    for (phrase <- Seq(Seq("quick", "brown", "fox"), Seq("the", "quick"),
        Seq("the", "the"), Seq("fox"), Seq("missing", "phrase"))) {
      val live = Search.phraseOccurrences(post, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      // explicit skewed length hints: ordering must not change results
      val hinted = Search.phraseOccurrences(post, phrase,
        phrase.zipWithIndex.map { case (t, i) => t -> (100L - i) }.toMap)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val indexed = Search.phraseProbe(spark, idx, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(hinted === live, s"ordering changed results for $phrase")
      assert(indexed === live, s"index diverged for $phrase")
    }
    // the full top-phrase rollup agrees between live and indexed faces
    val a = Search.topPhraseStats(docs, "doc_id", "text", n = 3)
      .orderBy("phrase").collect().map(_.toSeq).toSeq
    val b = Search.topPhraseStatsIndexed(spark, idx, docs, "doc_id", "text", n = 3)
      .orderBy("phrase").collect().map(_.toSeq).toSeq
    assert(a === b)
    // df table carries true document frequency and posting length
    val dfRow = Search.dfTable(spark, idx, Search.currentVersion(spark, idx))
      .filter(col("token") === "the").head()
    assert(dfRow.getAs[Long]("df") === 3L) // docs 1, 2, 4
    assert(dfRow.getAs[Long]("n_occ") === 7L)
    // ---- incremental append: index(A)+append(B) probes identically
    // to a from-scratch index over A∪B, and a crash before the hint
    // flip leaves the prior version probing exactly ----
    val more = Seq(
      (6L, "quick brown fox on the run"),
      (7L, "the lazy dog sleeps")).toDF("doc_id", "text")
    val all = docs.unionByName(more)
    // crash injection: abort after data writes, before the commit
    Search.appendToIndexInternal(more, "doc_id", "text", idx,
      abortBeforeCommit = true)
    assert(Search.currentVersion(spark, idx) === 1,
      "aborted append must leave version 1 current")
    val preCrash = Search.phraseProbe(spark, idx, Seq("quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val liveOld = Search.phraseOccurrences(post, Seq("quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(preCrash === liveOld, "aborted append must not change probes")
    // the retry clobbers the partial delta and commits
    Search.appendToIndex(more, "doc_id", "text", idx)
    assert(Search.currentVersion(spark, idx) === 2)
    val scratch = java.nio.file.Files.createTempDirectory("searchidx2").toString
    Search.writeIndex(all, "doc_id", "text", scratch, nBuckets = 4)
    for (phrase <- Seq(Seq("quick", "brown", "fox"), Seq("the", "lazy"),
        Seq("the"), Seq("missing", "phrase"))) {
      val appended = Search.phraseProbe(spark, idx, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val rebuilt = Search.phraseProbe(spark, scratch, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(appended === rebuilt, s"append diverged from rebuild for $phrase")
    }
    // ---- compaction: delta chain collapses into one base, phrase
    // probes stay identical; aborted compaction leaves version 2 ----
    def probeQBF(p: String) = Search.phraseProbe(spark, p,
      Seq("quick", "brown", "fox"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val preCompact = probeQBF(idx)
    Search.compactIndexInternal(spark, idx, abortBeforeCommit = true)
    assert(Search.currentVersion(spark, idx) === 2)
    assert(probeQBF(idx) === preCompact,
      "aborted compaction leaked into the probe")
    Search.compactIndex(spark, idx)
    assert(Search.currentVersion(spark, idx) === 3)
    assert(probeQBF(idx) === preCompact, "compaction changed probe results")
    assert(new java.io.File(s"$idx/postings/base_v3").exists())
    assert(!new java.io.File(s"$idx/postings/delta_v1").exists())
    // post-compaction appends ride deltas over the base
    Search.appendToIndex(Seq((8L, "quick brown fox returns"))
      .toDF("doc_id", "text"), "doc_id", "text", idx)
    assert(probeQBF(idx) === (preCompact :+ ((8L, 1))).sorted,
      "post-compaction append must surface in phrase probes")
    // merged df survives the append (docs 1, 2, 4, 6, 7 carry "the")
    val v2 = Search.currentVersion(spark, idx)
    val dfRow2 = Search.dfTable(spark, idx, v2)
      .filter(col("token") === "the").head()
    assert(dfRow2.getAs[Long]("df") === 5L)
    assert(dfRow2.getAs[Long]("n_occ") === 9L)
  }

  test("phrase index deleteFromIndex: probes equal a scratch index over " +
      "the survivors, across compaction; aborted delete leaves prior " +
      "state; re-deletes idempotent; crashed tombstones don't leak") {
    import spark.implicits._
    import graft.operators.Search
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat naps under the warm sun"),
      (3L, "a quick brown fox and a quick brown fox again"),
      (4L, "the the the quick quick brown"),
      (5L, "quick brown fox trails off")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("searchdel").toString
    Search.writeIndex(docs, "doc_id", "text", idx, nBuckets = 4)
    val phrases = Seq(Seq("quick", "brown", "fox"), Seq("the", "quick"),
      Seq("quick"), Seq("missing", "phrase"))
    def probeAll(p: String): Seq[Seq[(Long, Int)]] = phrases.map(ph =>
      Search.phraseProbe(spark, p, ph)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq)
    val full = probeAll(idx)
    // aborted delete: version 1 keeps probing exactly
    Search.deleteFromIndexInternal(Seq(3L).toDF("doc_id"), idx,
      abortBeforeCommit = true)
    assert(Search.currentVersion(spark, idx) === 1)
    assert(probeAll(idx) === full, "aborted delete leaked into probes")
    // real delete (3 and 5; 99 unknown — ignored)
    Search.deleteFromIndex(Seq(3L, 5L, 99L).toDF("doc_id"), idx)
    assert(Search.currentVersion(spark, idx) === 2)
    val scratch = java.nio.file.Files.createTempDirectory("searchdel_s").toString
    Search.writeIndex(docs.filter(!col("doc_id").isin(3L, 5L)),
      "doc_id", "text", scratch, nBuckets = 4)
    assert(probeAll(idx) === probeAll(scratch), "delete diverged from rebuild")
    // the batched faces see the tombstones too
    assert(Search.phraseDocsProbe(spark, idx, Seq("quick brown fox"))
      .collect().map(_.getLong(1)).sorted.toSeq === Seq(1L),
      "phraseDocsProbe must anti-join tombstones")
    // idempotent re-delete
    Search.deleteFromIndex(Seq(3L).toDF("doc_id"), idx)
    assert(probeAll(idx) === probeAll(scratch), "re-delete changed probes")
    // compaction folds tombstones; df/n_occ and stats rebuild exactly
    Search.compactIndex(spark, idx)
    assert(probeAll(idx) === probeAll(scratch), "compaction diverged")
    val v = Search.currentVersion(spark, idx)
    assert(spark.read.parquet(s"$idx/postings/base_v$v")
      .filter(col("doc_id").isin(3L, 5L)).count() === 0L)
    val want = Search.dfTable(spark, scratch, 1)
      .select("token", "df", "n_occ").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val got = Search.dfTable(spark, idx, v)
      .select("token", "df", "n_occ").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === want, "compacted df must equal the survivors' rebuild")
    assert(Search.statsTable(spark, idx, v).head().getAs[Long]("n_tokens")
      === Search.statsTable(spark, scratch, 1).head().getAs[Long]("n_tokens"))
    // post-compaction delete works over the reset family
    Search.deleteFromIndex(Seq(4L).toDF("doc_id"), idx)
    val scratch2 = java.nio.file.Files.createTempDirectory("searchdel_s2").toString
    Search.writeIndex(docs.filter(!col("doc_id").isin(3L, 4L, 5L)),
      "doc_id", "text", scratch2, nBuckets = 4)
    assert(probeAll(idx) === probeAll(scratch2),
      "post-compaction delete diverged")
    // a crashed DELETE's orphan tombstone delta must not be
    // phantom-committed by the next append at the same version
    val idx2 = java.nio.file.Files.createTempDirectory("searchdel_p").toString
    Search.writeIndex(docs.filter(col("doc_id") <= 3L), "doc_id", "text",
      idx2, nBuckets = 4)
    Search.deleteFromIndexInternal(Seq(1L).toDF("doc_id"), idx2,
      abortBeforeCommit = true)
    Search.appendToIndex(docs.filter(col("doc_id") > 3L), "doc_id", "text",
      idx2)
    val scratchAll = java.nio.file.Files
      .createTempDirectory("searchdel_p2").toString
    Search.writeIndex(docs, "doc_id", "text", scratchAll, nBuckets = 4)
    assert(probeAll(idx2) === probeAll(scratchAll),
      "crashed delete's tombstones leaked into the committed append")
  }

  test("BPE: distributed trainer equals the sequential reference; encoding " +
      "is greedy rank-order and reassembles the input") {
    import spark.implicits._
    import graft.operators.Bpe
    val corpus = Seq(
      "low low low lower lower lowest",
      "new newer newest newest newest",
      "low lower newest")
    val docs = corpus.toDF("text")
    val distributed = Bpe.trainMerges(docs, "text", nMerges = 10)
    val reference = Bpe.trainMergesLocal(corpus, nMerges = 10)
    assert(distributed === reference)
    assert(distributed.nonEmpty)
    // encoding: symbols concatenate back to word + </w>; merged
    // symbols are actually used (fewer symbols than characters)
    val enc = docs.select(col("text"),
      Bpe.encode(col("text"), distributed).as("syms")).collect()
    for (r <- enc) {
      val text = r.getString(0)
      val syms = r.getSeq[String](1)
      val rebuilt = syms.mkString("").replace(Bpe.EndOfWord, " ").trim
      assert(rebuilt === text)
      val nChars = text.split(" ").map(_.length + 1).sum // +1 per </w>
      assert(syms.length < nChars, "merges must compress the symbol stream")
    }
    // overlap semantics: greedy left-to-right on "a a a"-style runs —
    // merge (l,o) then (lo,w): "low" -> ["low</w>"] needs 3 merges on
    // this corpus; just pin the reference on a crafted run
    val run = Bpe.trainMergesLocal(Seq("a a a a aa aa"), 1)
    assert(run === Seq(("a", Bpe.EndOfWord)))
  }

  test("ImportanceResampling: integer DSIR weights match a sequential " +
      "fold and selectTopK equals the global rank cut") {
    import graft.operators.ImportanceResampling
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    val feats = ImportanceResampling.features(docs, "doc_id", "text", 64)
    val ratios = ImportanceResampling.bucketRatios(
      feats, feats.filter(col("doc_id") % 7 === 0), scale = 1000000L)
    // sequential reference straight off the collected feature rows
    val rows = feats.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val qb = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tb = rows.filter(_._1 % 7 == 0).groupBy(_._2)
      .view.mapValues(_.map(_._3).sum).toMap
    val expRatio = qb.map { case (b, q) =>
      b -> (tb.getOrElse(b, 0L) + 1L) * 1000000L / (q + 1L) }
    val gotRatio = ratios.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotRatio === expRatio)
    // the one-pass conditional-aggregation form is result-identical
    val onePass = ImportanceResampling
      .bucketRatiosBy(feats, col("doc_id") % 7 === 0, scale = 1000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(onePass === expRatio)
    assert(gotRatio.values.forall(r => r >= 0L && r <= 1000000L),
      "target subset of raw bounds the ratio by the scale")
    val w = ImportanceResampling.weights(feats, ratios, "doc_id")
    val expW = rows.groupBy(_._1).map { case (id, rs) =>
      id -> (rs.map(_._3).sum, rs.map(r => r._3 * expRatio(r._2)).sum) }
    val gotW = w.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotW === expW)
    // the histogram-boundary cut is row-identical to the full rank
    val k = gotW.size / 5
    val expSel = gotW.toSeq.sortBy { case (id, (_, wt)) => (-wt, id) }
      .take(k).map(_._1).toSet
    val gotSel = ImportanceResampling.selectTopK(w, "doc_id", "weight", k.toLong)
      .collect().map(_.getLong(0)).toSet
    assert(gotSel === expSel)
  }

  test("weighted sampling without replacement: draws equal the sequential " +
      "max-of-hashes, the cut equals the global rank, and weight biases " +
      "selection") {
    import graft.operators.{ImportanceResampling, Sampling}
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id")
    val draws = Sampling.weightedDraws(docs, "doc_id",
      lit(1) + col("doc_id") % 8)
    // sequential reference: same md5 fold, max over j in 1..w
    val md = java.security.MessageDigest.getInstance("MD5")
    def hv(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val got = draws.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    for ((id, (w, draw)) <- got) {
      assert(w === 1 + (id % 8).toInt)
      val exp = (1 to w).map(j => hv(s"wrs:$id:$j")).max
      assert(draw === exp, s"doc $id")
    }
    // the k winners are exactly the global (draw desc, id asc) prefix
    val k = got.size / 10
    val expSel = got.toSeq.sortBy { case (id, (_, d)) => (-d, id) }
      .take(k).map(_._1).toSet
    val sel = Sampling.weightedSample(docs, "doc_id",
      lit(1) + col("doc_id") % 8, k.toLong)
    assert(sel.collect().map(_.getLong(0)).toSet === expSel)
    // weight bias: the average selected weight exceeds the pool's
    val avgAll = got.values.map(_._1).sum.toDouble / got.size
    val avgSel = expSel.toSeq.map(id => got(id)._1).sum.toDouble / expSel.size
    assert(avgSel > avgAll,
      s"selection must favor heavy items ($avgSel vs $avgAll)")
  }

  test("group-level split: no source straddles the holdout boundary") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source")
    val sp = Sampling.assignSplit(docs, col("source"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), salt = "gsplit:")
    val perSource = sp.groupBy("source")
      .agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(perSource === 1L, "a source must land in exactly one split")
    // all three splits are populated on the fixture
    assert(sp.select("split").distinct().count() === 3L)
  }

  test("IMA ADPCM: encode→decode preserves frame count, first-of-block " +
      "samples exactly, and energy within the q88 band; hostile input " +
      "is rejected, never thrown") {
    import graft.operators.Multimodal
    // the q88 triangle across several ids, plus a partial-final-block
    // length and a multi-block length
    for (id <- Seq(0L, 1L, 7L, 63L, 130L); n <- Seq(5, 64, 127, 505, 1200)) {
      val samples = Array.tabulate(n)(i =>
        ((32 - math.abs(((id + i) % 64) - 32) - 16) * 48).toShort)
      val adpcm = Multimodal.encodeImaAdpcmWav(8000, samples)
      val decoded = Multimodal.decodeImaAdpcm(adpcm)
        .getOrElse(fail(s"decode failed for id=$id n=$n"))
      assert(decoded.length === n, "fact chunk must bound the decode")
      // block-header samples are carried verbatim (505 samples/block)
      var b = 0
      while (b * 505 < n) { assert(decoded(b * 505) === samples(b * 505)); b += 1 }
      // the triangle is continuous (slope ±48), so the codec tracks
      // within step-adaptation quantization units everywhere
      val err = samples.zip(decoded).map { case (a, c) => math.abs(a - c) }.max
      assert(err <= 200, s"worst-sample error $err out of codec class")
      val se = samples.map(s => s.toLong * s).sum
      val sd = decoded.map(s => s.toLong * s).sum
      assert(se == 0L || math.abs(sd - se) * 100 <= se * 10,
        s"energy deviation ${math.abs(sd - se).toDouble / se} outside the q88 band")
    }
    // empty stream round-trips to zero frames
    assert(Multimodal.decodeImaAdpcm(
      Multimodal.encodeImaAdpcmWav(8000, Array.empty[Short]))
      .exists(_.isEmpty))
    // hostile/foreign payloads: None, no throw — PCM WAV, truncated
    // ADPCM, garbage
    val pcmWav = {
      val bb = java.nio.ByteBuffer.allocate(48)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(4).putInt(0)
      bb.array()
    }
    assert(Multimodal.decodeImaAdpcm(pcmWav).isEmpty)
    val good = Multimodal.encodeImaAdpcmWav(8000, Array.tabulate(600)(_.toShort))
    assert(Multimodal.decodeImaAdpcm(java.util.Arrays.copyOf(good, 30)).isEmpty)
    assert(Multimodal.decodeImaAdpcm(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("FLAC: encode→decode is the identity across signal shapes, " +
      "lengths and channel modes; corruption and truncation are " +
      "rejected by CRC, never thrown") {
    import graft.operators.Flac
    // deterministic signal zoo: triangle, constant, extremes, an LCG
    // noise floor — across block boundaries (4096) and partial frames
    def lcg(seed: Long, n: Int): Array[Int] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 33) % 65536 - 32768).toInt
      }
    }
    val shapes: Seq[(String, Int => Array[Int])] = Seq(
      "triangle" -> (n => Array.tabulate(n)(i =>
        (32 - math.abs((i % 64) - 32) - 16) * 48)),
      "constant" -> (n => Array.fill(n)(-12345)),
      "extremes" -> (n => Array.tabulate(n)(i =>
        if (i % 2 == 0) 32767 else -32768)),
      "lcg" -> (n => lcg(42L, n)))
    for ((name, gen) <- shapes; n <- Seq(0, 1, 5, 64, 4096, 4097, 10000)) {
      val s = gen(n)
      val audio = Flac.decode(Flac.encode(8000, Array(s)))
        .getOrElse(fail(s"mono decode failed: $name n=$n"))
      assert(audio.sampleRate === 8000 && audio.channels === 1 &&
        audio.bits === 16)
      assert(audio.samples(0).toSeq === s.toSeq, s"$name n=$n not lossless")
    }
    // stereo: independent channels and the left/side decorrelated path
    val l = lcg(7L, 5000); val r = lcg(11L, 5000)
    for (leftSide <- Seq(false, true)) {
      val audio = Flac.decode(Flac.encode(44100, Array(l, r), leftSide))
        .getOrElse(fail(s"stereo decode failed leftSide=$leftSide"))
      assert(audio.channels === 2)
      assert(audio.samples(0).toSeq === l.toSeq)
      assert(audio.samples(1).toSeq === r.toSeq, s"leftSide=$leftSide")
    }
    // hostile input: garbage, truncation at every region, frame-region
    // bit flips (CRC must catch) — None, never a throw or a spin
    val good = Flac.encode(8000, Array(lcg(3L, 1000)))
    assert(Flac.decode(Array.fill[Byte](64)('x'.toByte)).isEmpty)
    for (cut <- Seq(3, 10, 41, 50, good.length / 2, good.length - 1))
      assert(Flac.decode(java.util.Arrays.copyOf(good, cut)).isEmpty,
        s"truncation at $cut must be rejected")
    for (flip <- Seq(60, 80, good.length - 3)) {
      val bad = good.clone()
      bad(flip) = (bad(flip) ^ 0x55).toByte
      assert(Flac.decode(bad).isEmpty, s"bit flip at $flip must fail CRC")
    }
    // decodeOne dispatch surfaces FLAC metadata without full decode
    val meta = graft.operators.Multimodal.decodeOne(
      graft.operators.MediaAsset(1L, "audio", good, "s"))
    assert(meta.format === "flac")
    assert(meta.sample_rate === 8000 && meta.channels === 1 &&
      meta.n_samples === 1000L && meta.bits_per_sample === 16)
    // hostile STREAMINFO totals: patch the 36-bit total-samples field
    // (bits 28..63 of STREAMINFO, i.e. low nibble of byte 21 + bytes
    // 22..25). A claimed total of 2^31 overflows toInt; a tiny payload
    // claiming 2^31-1 would allocate ~8 GB per channel before any frame
    // validation. Both must return None immediately, never throw or
    // allocate (the payload-length bound rejects them up front).
    def withTotal(total: Long): Array[Byte] = {
      val bad = good.clone()
      bad(21) = ((bad(21) & 0xf0) | ((total >> 32) & 0xf).toInt).toByte
      bad(22) = ((total >> 24) & 0xff).toByte
      bad(23) = ((total >> 16) & 0xff).toByte
      bad(24) = ((total >> 8) & 0xff).toByte
      bad(25) = (total & 0xff).toByte
      bad
    }
    for (total <- Seq(1L << 31, (1L << 31) - 1, (1L << 36) - 1, 1L << 30))
      assert(Flac.decode(withTotal(total)).isEmpty,
        s"hostile claimed total=$total must be rejected without allocation")
  }

  test("FingerprintLedger: cross-run dedup against persisted fingerprints — " +
      "appends fold only novel fps, crash windows protect the prior state, " +
      "compaction is behavior-invisible") {
    import spark.implicits._
    import graft.operators.FingerprintLedger
    def withFp(rows: Seq[(Long, String)]) =
      rows.toDF("id", "text").withColumn("fp", md5(col("text")))
    val led = java.nio.file.Files.createTempDirectory("fp_ledger").toString
    val day1 = withFp(Seq((1L, "a a"), (2L, "b b"), (3L, "a a")))
    FingerprintLedger.writeLedger(day1.select("fp"), led, nBuckets = 4)
    assert(FingerprintLedger.currentVersion(spark, led) === 1)
    assert(FingerprintLedger.statsTable(spark, led, 1).head()
      .getAs[Long]("n_fps") === 2L, "the ledger is a SET")
    assert(FingerprintLedger.dedupAgainst(day1, "fp", led).count() === 0,
      "everything day 1 ingested is seen")
    val day2 = withFp(Seq((4L, "b b"), (5L, "c c"), (6L, "d d")))
    def survivors() = FingerprintLedger.dedupAgainst(day2, "fp", led)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(survivors() === Set(5L, 6L), "cross-run dup (b b) must drop")
    // crash injection: delta+stats on disk, pointer not flipped
    FingerprintLedger.appendToLedgerInternal(
      day2.select("fp"), led, abortBeforeCommit = true)
    assert(FingerprintLedger.currentVersion(spark, led) === 1)
    assert(survivors() === Set(5L, 6L), "aborted append leaked")
    FingerprintLedger.appendToLedger(day2.select("fp"), led)
    assert(FingerprintLedger.currentVersion(spark, led) === 2)
    assert(FingerprintLedger.statsTable(spark, led, 2).head()
      .getAs[Long]("n_fps") === 4L, "only NOVEL fps fold in")
    assert(survivors() === Set.empty[Long])
    // compaction: one base, same answers, superseded dirs gone
    FingerprintLedger.compactLedgerInternal(spark, led,
      abortBeforeCommit = true)
    assert(FingerprintLedger.currentVersion(spark, led) === 2)
    FingerprintLedger.compactLedger(spark, led)
    assert(FingerprintLedger.currentVersion(spark, led) === 3)
    assert(new java.io.File(s"$led/fps/base_v3").exists())
    assert(!new java.io.File(s"$led/fps/delta_v1").exists())
    assert(survivors() === Set.empty[Long])
    val day3 = withFp(Seq((7L, "c c"), (8L, "e e")))
    assert(FingerprintLedger.dedupAgainst(day3, "fp", led)
      .select("id").collect().map(_.getLong(0)).toSet === Set(8L),
      "post-compaction probes still see the whole history")
    FingerprintLedger.appendToLedger(day3.select("fp"), led)
    assert(FingerprintLedger.statsTable(spark, led, 4).head()
      .getAs[Long]("n_fps") === 5L,
      "post-compaction appends ride deltas over the base")
  }

  test("IvfPq materialized index: degenerate-exact probes equal brute force, " +
      "append folds under the frozen model, a crash before the hint flip " +
      "leaves the prior version probing bit-identically") {
    import graft.operators.IvfPq
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = emb.filter(col("vec_id") < 400)
    val b = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPq.writeIndex(a, idx, nCentroids = 8, centroidIters = 1,
      dim = 64, nSub = 8, codewords = 16, pqIters = 1)
    def probe(p: String, rerank: Int) =
      IvfPq.searchIndex(spark, p, queries, k = 3, nProbe = 8, rerank = rerank)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    def brute(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(corpus, queries, 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    // probe all cells + re-rank everything == exact brute force over the
    // indexed vectors (the q60_indexed_probe oracle anchor), and the
    // re-rank vectors come from the index's own table — corpus-free
    assert(probe(idx, rerank = 400) === brute(a))
    // crash injection: every version-2 data file on disk, pointer not
    // flipped — the index must keep probing version 1 bit-identically
    val before = probe(idx, rerank = 400)
    IvfPq.appendToIndexInternal(b, idx, abortBeforeCommit = true)
    assert(IvfPq.currentVersion(spark, idx) === 1,
      "aborted append must leave version 1 current")
    assert(probe(idx, rerank = 400) === before,
      "aborted append leaked into the probe")
    // the retry clobbers the partial delta and commits: degenerate-exact
    // probes now equal brute force over the UNION — exactness under full
    // probe+rerank is model-independent, the frozen-centroid contract
    assert(IvfPq.statsTable(spark, idx).head().getAs[Long]("n_vecs") === 400L)
    IvfPq.appendToIndex(b, idx)
    assert(probe(idx, rerank = 500) === brute(emb))
    assert(IvfPq.statsTable(spark, idx).head().getAs[Long]("n_vecs") === 500L)
    // superseded model/stats cleaned up post-commit
    assert(!new java.io.File(s"$idx/model_v1").exists())
    assert(!new java.io.File(s"$idx/stats_v1").exists())
    // a small-nProbe probe still returns k rows per query (recall is
    // q60's measurement; here we pin shape + determinism across runs)
    val narrow = IvfPq.searchIndex(spark, idx, queries, k = 3, nProbe = 2,
      rerank = 10).collect()
    assert(narrow.length === queries.count() * 3)
    val narrow2 = IvfPq.searchIndex(spark, idx, queries, k = 3, nProbe = 2,
      rerank = 10).collect()
    assert(narrow.map(_.toSeq).toSeq === narrow2.map(_.toSeq).toSeq)
    // ---- merge-on-read DELETE: tombstones kill rows at probe time,
    // codes are never rewritten; crash before the hint flip leaves the
    // prior state ----
    val dels = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    IvfPq.deleteFromIndexInternal(dels, idx, abortBeforeCommit = true)
    assert(IvfPq.currentVersion(spark, idx) === 2,
      "aborted delete must leave version 2 current")
    assert(probe(idx, rerank = 500) === brute(emb),
      "aborted delete leaked into the probe")
    IvfPq.deleteFromIndex(dels, idx)
    assert(IvfPq.currentVersion(spark, idx) === 3)
    val survivors = emb.filter(col("vec_id") % 7 =!= 0)
    assert(probe(idx, rerank = 500) === brute(survivors),
      "degenerate-exact probe after delete must equal brute force over survivors")
    assert(IvfPq.statsTable(spark, idx).head().getAs[Long]("n_vecs")
      === 500L - dels.count())
    // deleting already-tombstoned ids is a no-op on the live count
    IvfPq.deleteFromIndex(dels, idx)
    assert(IvfPq.statsTable(spark, idx).head().getAs[Long]("n_vecs")
      === 500L - dels.count())
    assert(probe(idx, rerank = 500) === brute(survivors))
    // ---- COMPACTION: consolidate deltas+tombstones into one base per
    // family — probes bit-identical, superseded dirs cleaned up, and
    // the crash window still protects the prior version ----
    IvfPq.compactIndexInternal(spark, idx, abortBeforeCommit = true)
    assert(IvfPq.currentVersion(spark, idx) === 4,
      "aborted compaction must leave version 4 current")
    assert(probe(idx, rerank = 500) === brute(survivors),
      "aborted compaction leaked into the probe (bases above the hint read)")
    IvfPq.compactIndex(spark, idx)
    assert(IvfPq.currentVersion(spark, idx) === 5)
    assert(probe(idx, rerank = 500) === brute(survivors),
      "compaction changed probe results")
    assert(IvfPq.statsTable(spark, idx).head().getAs[Long]("n_vecs")
      === 500L - dels.count())
    assert(new java.io.File(s"$idx/codes/base_v5").exists())
    assert(!new java.io.File(s"$idx/codes/delta_v1").exists(),
      "superseded code deltas must be cleaned up post-commit")
    assert(!new java.io.File(s"$idx/tombstones/delta_v3").exists(),
      "folded-in tombstones must be cleaned up post-commit")
    // the compacted index keeps evolving: a delete AFTER compaction
    // rides a delta over the new base
    val dels2 = emb.filter(col("vec_id") % 7 =!= 0 && col("vec_id") % 11 === 1)
      .select("vec_id")
    IvfPq.deleteFromIndex(dels2, idx)
    val survivors2 = emb.filter(col("vec_id") % 7 =!= 0 &&
      col("vec_id") % 11 =!= 1)
    assert(probe(idx, rerank = 500) === brute(survivors2),
      "post-compaction delete must apply over the consolidated base")
  }

  test("a CRASHED compaction's leftover base must not poison the NEXT " +
      "commit at the same version (stale dirs cleared by every committer)") {
    import spark.implicits._
    import graft.operators.{FingerprintLedger, IvfPq, Search}
    // ---- phrase index: abort-compact leaves postings/base_v2; the next
    // append commits at the SAME version 2 and must not be masked ----
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox again")).toDF("doc_id", "text")
    val more = Seq((3L, "quick brown fox on the run")).toDF("doc_id", "text")
    val sIdx = java.nio.file.Files.createTempDirectory("search_poison").toString
    Search.writeIndex(docs, "doc_id", "text", sIdx, nBuckets = 4)
    Search.compactIndexInternal(spark, sIdx, abortBeforeCommit = true)
    assert(new java.io.File(s"$sIdx/postings/base_v2").exists(),
      "precondition: the crashed compaction left its base behind")
    Search.appendToIndex(more, "doc_id", "text", sIdx)
    val scratch = java.nio.file.Files.createTempDirectory("search_poison2").toString
    Search.writeIndex(docs.unionByName(more), "doc_id", "text", scratch, nBuckets = 4)
    def phrase(p: String) = Search.phraseProbe(spark, p, Seq("quick", "brown", "fox"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(phrase(sIdx) === phrase(scratch),
      "append after a crashed compaction must not vanish behind the stale base")
    // ---- vector index: the aborted compaction's EMPTY tombstones base
    // must not resurrect deletes, nor mask the appended codes ----
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = emb.filter(col("vec_id") < 400)
    val b = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id") < 5)
    val vIdx = java.nio.file.Files.createTempDirectory("ivfpq_poison").toString
    IvfPq.writeIndex(a, vIdx, nCentroids = 8, centroidIters = 1,
      dim = 64, nSub = 8, codewords = 16, pqIters = 1)
    val dels = a.filter(col("vec_id") % 7 === 0).select("vec_id")
    IvfPq.deleteFromIndex(dels, vIdx)
    IvfPq.compactIndexInternal(spark, vIdx, abortBeforeCommit = true)
    assert(new java.io.File(s"$vIdx/tombstones/base_v3").exists(),
      "precondition: the crashed compaction left its (empty) tombstones base")
    IvfPq.appendToIndex(b, vIdx)
    def probeAll() =
      IvfPq.searchIndex(spark, vIdx, queries, k = 3, nProbe = 8, rerank = 500)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    def brute(corpus: org.apache.spark.sql.DataFrame) =
      graft.operators.Similarity.bruteForceTopK(corpus, queries, 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val expected = a.filter(col("vec_id") % 7 =!= 0).unionByName(b)
    assert(probeAll() === brute(expected),
      "append after a crashed compaction: new vectors must surface AND " +
        "prior deletes must not resurrect through the empty tombstones base")
    // ---- the dual hole: a CRASHED DELETE's orphan tombstone delta must
    // not be phantom-committed by the next append ----
    val dels2 = a.filter(col("vec_id") % 5 === 1).select("vec_id")
    IvfPq.deleteFromIndexInternal(dels2, vIdx, abortBeforeCommit = true)
    IvfPq.appendToIndex(
      b.select(col("vec_id") + 1000, col("embedding"))
        .toDF("vec_id", "embedding"), vIdx)
    val expected2 = expected.unionByName(
      b.select(col("vec_id") + 1000, col("embedding")).toDF("vec_id", "embedding"))
    assert(probeAll() === brute(expected2),
      "an aborted delete's tombstones must NOT apply after an unrelated append")
    // ---- ledger: abort-compact leaves fps/base_v2; the next append's
    // novel fingerprints must not vanish behind it ----
    def withFp(rows: Seq[(Long, String)]) =
      rows.toDF("id", "text").withColumn("fp", md5(col("text")))
    val led = java.nio.file.Files.createTempDirectory("ledger_poison").toString
    val day1 = withFp(Seq((1L, "a a"), (2L, "b b")))
    val day2 = withFp(Seq((3L, "c c"), (4L, "d d")))
    FingerprintLedger.writeLedger(day1.select("fp"), led, nBuckets = 4)
    FingerprintLedger.compactLedgerInternal(spark, led, abortBeforeCommit = true)
    assert(new java.io.File(s"$led/fps/base_v2").exists(),
      "precondition: the crashed compaction left its base behind")
    FingerprintLedger.appendToLedger(day2.select("fp"), led)
    assert(FingerprintLedger.dedupAgainst(
        day1.unionByName(day2), "fp", led).count() === 0,
      "fingerprints appended after a crashed compaction must stay seen")
  }
}
