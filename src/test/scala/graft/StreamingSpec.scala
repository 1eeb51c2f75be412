package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.streaming.{StreamingOps, UserEvent}

/** Structured-Streaming flows: DDL drop-dir conversion, watermarked
  * windows, stateful per-user running totals, and batch/stream
  * consistency of the windowed aggregation. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("ddlConvertStream converts files dropped into a directory") {
    val dir = Files.createTempDirectory("ddl-stream").toFile
    val sample = Engine.sampleDdl("sample_db2.sql")
    Files.writeString(new java.io.File(dir, "a.sql").toPath, sample)
    Files.writeString(new java.io.File(dir, "b.sql").toPath,
      "CREATE TABLE S.T (X INT NOT NULL, PRIMARY KEY (X));")

    val out = StreamingOps.runToMemory(
      StreamingOps.ddlConvertStream(spark, dir.getAbsolutePath), "ddl_stream")
    val rows = out.collect().map(r =>
      r.getAs[String]("script_id") ->
        (r.getAs[Int]("tables_converted"), r.getAs[Int]("ewi_count"))).toMap
    assert(rows.size === 2)
    assert(rows.find(_._1.endsWith("a.sql")).get._2 === ((11, 5)))
    assert(rows.find(_._1.endsWith("b.sql")).get._2 === ((1, 0)))
  }

  test("ddlAssessStream scores files dropped into a directory like the batch assessor") {
    val dir = Files.createTempDirectory("assess-stream").toFile
    val sample = Engine.sampleDdl("sample_db2.sql")
    Files.writeString(new java.io.File(dir, "a.sql").toPath, sample)
    Files.writeString(new java.io.File(dir, "b.sql").toPath,
      "CREATE TABLE S.T (X INT NOT NULL, PRIMARY KEY (X));")
    val out = StreamingOps.runToMemory(
      StreamingOps.ddlAssessStream(spark, dir.getAbsolutePath), "assess_stream")
    val rows = out.collect().map(r => r.getAs[String]("script_id") -> r).toMap
    assert(rows.size === 2)
    val local = graft.assess.Assessor.assess(sample)
    val a = rows.find(_._1.endsWith("a.sql")).get._2
    assert(a.getAs[Int]("tables_total") === local.tablesTotal)
    assert(a.getAs[Double]("overall_score") === local.overallScore)
    assert(a.getAs[String]("overall_level") === local.overallLevel)
    assert(a.getAs[Int]("n_critical") === local.criticalIssues.length)
    val b = rows.find(_._1.endsWith("b.sql")).get._2
    assert(b.getAs[Int]("tables_total") === 1)
    assert(b.getAs[Double]("overall_score") === 100.0)
  }

  test("windowed counts: streaming result equals the batch plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      UserEvent(1, ts(0), "view", 1.0), UserEvent(1, ts(1), "click", 2.0),
      UserEvent(2, ts(6), "view", 3.0), UserEvent(1, ts(7), "purchase", 10.0),
      UserEvent(2, ts(12), "view", 4.0))
    val mem = MemoryStream[UserEvent]
    mem.addData(data: _*)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.windowedEventCounts(mem.toDF(), "5 minutes", "10 minutes"),
      "win_counts", OutputMode.Complete())
    val batch = StreamingOps.windowedEventCounts(
      data.toDF().withWatermark("ts", "10 minutes"), "5 minutes", "10 minutes")
    assert(streamed.collect().map(_.toString).sorted.toSeq ===
      batch.collect().map(_.toString).sorted.toSeq)
    // windows×type: (10:00 view), (10:00 click), (10:05 view),
    // (10:05 purchase), (10:10 view)
    assert(streamed.count() === 5)
  }

  test("stateful running totals accumulate across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StreamingOps.runningUserTotals(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    mem.addData(UserEvent(1, ts(0), "view", 1.0), UserEvent(1, ts(1), "purchase", 5.0))
    q.processAllAvailable()
    mem.addData(UserEvent(1, ts(2), "purchase", 4.0), UserEvent(2, ts(2), "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"), r.getAs[Long]("n_purchases")))
    // user 1 final state after two triggers: 3 events, 10.0 total, 2 purchases
    assert(last.contains((1L, 3L, 10.0, 2L)))
    assert(last.contains((2L, 1L, 2.0, 0L)))
  }

  test("latest-wins compaction: streaming complete mode equals batch across triggers") {
    // Cdc.compactLatest is a bounded max(struct) aggregation, so the
    // IDENTICAL operator runs under readStream: streaming state is one
    // struct per key, updated per micro-batch — a CDC feed compacting
    // itself continuously.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val sdf = mem.toDF().toDF("event_id", "key", "us", "tie", "value")
    val q = graft.operators.Cdc
      .compactLatest(sdf, Seq("key"), "us", "tie", Seq("value"))
      .writeStream.format("memory").queryName("compact_stream")
      .outputMode(OutputMode.Complete()).start()
    mem.addData((1L, "a", 100L, 10L, 1.0), (2L, "a", 200L, 20L, 2.0))
    q.processAllAvailable()
    // second trigger: a newer "a" and a first "b" — state must advance
    mem.addData((3L, "a", 300L, 30L, 9.0), (4L, "b", 50L, 5L, 7.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("compact_stream").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("last_us"),
        r.getAs[Double]("last_value"), r.getAs[Long]("n_versions"))).sorted
    val batch = graft.operators.Cdc.compactLatest(
        Seq((1L, "a", 100L, 10L, 1.0), (2L, "a", 200L, 20L, 2.0),
          (3L, "a", 300L, 30L, 9.0), (4L, "b", 50L, 5L, 7.0))
          .toDF("event_id", "key", "us", "tie", "value"),
        Seq("key"), "us", "tie", Seq("value")).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("last_us"),
        r.getAs[Double]("last_value"), r.getAs[Long]("n_versions"))).sorted
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.toSeq === Seq(("a", 300L, 9.0, 3L), ("b", 50L, 7.0, 1L)))
  }

  test("sampling split assigns identically on a stream and in batch") {
    // assignSplit is a pure scan-side projection, so the identical
    // plan runs under readStream — the split of a document never
    // depends on batch boundaries (holdout stays stable as the
    // ingest stream grows).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = graft.operators.Sampling.assignSplit(
        mem.toDF().toDF("doc_id"), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .writeStream.format("memory").queryName("split_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(1L to 100L: _*)
    q.processAllAvailable()
    mem.addData(101L to 200L: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("split_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.operators.Sampling.assignSplit(
        (1L to 200L).toDF("doc_id"), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === batch)
    assert(streamed.size === 200)
  }

  test("importance scoring runs identically on a stream and in batch, " +
      "and the serving fold equals the training-face weights") {
    // the serving face is a stateless per-row native call, so the
    // SAME frozen ratio table scores a live stream and a backfill
    // identically, across any batch boundary placement
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.ImportanceResampling
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "lazy dogs sleep all day"),
      (3L, "the quick brown fox"), (4L, "quantum flux capacitor"),
      (5L, ""), (6L, "the the the"))
    val batchDf = docs.toDF("doc_id", "text")
    val feats = ImportanceResampling.features(batchDf, "doc_id", "text", 32)
    val ratios = ImportanceResampling.bucketRatios(
      feats, feats.filter(col("doc_id") % 2 === 0))
    val frozen = ImportanceResampling.freezeRatios(ratios, 32)
    // serving fold == training-face aggregate on every non-empty doc
    val trained = ImportanceResampling.weights(feats, ratios, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val served = batchDf.select(col("doc_id"),
        ImportanceResampling.scoreWith(col("text"), 32, frozen).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, w) <- trained) assert(served(id) === w, s"doc $id")
    assert(served(5L) === 0L, "gramless docs score zero")
    // stream == batch across two micro-batches, with the weight gate
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.importanceScoreStream(
        mem.toDF().toDF("doc_id", "text"), 32, frozen,
        minWeight = Some(1L))
      .writeStream.format("memory").queryName("imp_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs.take(3): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("imp_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = graft.streaming.StreamingOps.importanceScoreStream(
        batchDf, 32, frozen, minWeight = Some(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(!streamed.contains(5L), "the weight gate drops gramless docs")
  }

  test("chunking and shard assignment run identically on a stream and in batch") {
    // both are pure scan-side generators/projections — chunk geometry
    // and shard routing never depend on batch boundaries, so a live
    // ingest stream can be chunked and sharded exactly like a backfill
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    val q = graft.operators.Sampling.shardByHash(
        graft.operators.Chunking.slidingTokenWindows(src, "text", 4, 1),
        col("doc_id"), 8, "s")
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode(OutputMode.Append()).start()
    val docs = (1L to 30L).map(i => i -> Seq.fill(i.toInt % 11)("tok").mkString(" "))
    mem.addData(docs.take(15): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val streamed = spark.table("chunk_stream").collect().map(key).toSet
    val batch = graft.operators.Sampling.shardByHash(
        graft.operators.Chunking.slidingTokenWindows(
          docs.toDF("doc_id", "text"), "text", 4, 1),
        col("doc_id"), 8, "s")
      .collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("PII redaction and repetition gate run identically on a stream and in batch") {
    // both are pure per-row projections (PlanSpec pins no-shuffle), so
    // the scrub a backfill applies is exactly what a live ingest
    // stream applies — no batch-boundary dependence to worry about
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFunctions
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("doc_id", "text")
    def scrub(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextFunctions.redactPii(col("text")).as("red"),
      graft.functions.RepetitionStats(col("text"), 2)
        .getField("top_token_n").as("top_n"))
    val q = scrub(src)
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode(OutputMode.Append()).start()
    val docs = Seq(
      1L -> "mail me a@b.com now",
      2L -> "spam spam spam ham",
      3L -> "server 10.0.0.1 up",
      4L -> "call +1-555-0000 at 3")
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getString(1), r.getInt(2))
    val streamed = spark.table("pii_stream").collect().map(key).toSet
    val batch = scrub(docs.toDF("doc_id", "text")).collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.exists(_._2.contains("<EMAIL>")))
    assert(streamed.exists(_._3 == 3)) // "spam" ×3
  }

  test("corpus ingest stream: gate, cross-batch dedup and shard routing compose") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.corpusIngestStream(
        mem.toDF().toDF("doc_id", "text"), minQuality = 0.5, nShards = 8)
      .writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append()).start()
    mem.addData(fixture.take(fixture.length / 2): _*)
    q.processAllAvailable()
    mem.addData(fixture.drop(fixture.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest")
      .select("doc_id", "fp", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch reference: same gate + fingerprint, one survivor per fp
    val batchGated = spark.createDataset(fixture).toDF("doc_id", "text")
      .filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val batchFps = batchGated.select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._2).toSet === batchFps, "one survivor per gated fingerprint")
    assert(out.length === batchFps.size, "no fingerprint emitted twice")
    assert(out.forall(r => r._3 >= 0 && r._3 < 8))
    assert(out.length < fixture.length, "gate + dedup must drop something")
    // shard routing matches the batch projection for the surviving ids
    val batchShards = graft.operators.Sampling.shardByHash(
        batchGated, col("doc_id"), 8)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, sh) => assert(batchShards(id) === sh) }
  }

  test("media ingest stream: decode+featurize gate and cross-batch content " +
      "dedup equal the batch pipeline — watermarked by default (synthetic " +
      "processing-time column, never surfaced)") {
    import spark.implicits._
    import graft.operators.{MediaAsset, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 11).toByte)
    val assets = Seq(
      MediaAsset(1L, "image", Multimodal.encodeBmp(4, 3, rgb), "a"),
      MediaAsset(2L, "image", Multimodal.encodePng(4, 3, 2, rgb, _ => 2), "a"),
      MediaAsset(3L, "image", Array[Byte](9, 9, 9), "a"), // undecodable → gated
      MediaAsset(4L, "audio", {
        val bb = java.nio.ByteBuffer.allocate(44 + 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes); bb.putInt(40); bb.put("WAVE".getBytes)
        bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
        bb.putInt(8000); bb.putInt(16000); bb.putShort(2); bb.putShort(16)
        bb.put("data".getBytes); bb.putInt(4)
        bb.putShort(7).putShort(-7)
        bb.array()
      }, "a"),
      // batch-2 re-send of asset 1's exact payload under a NEW id —
      // the cross-batch content dedup must drop it
      MediaAsset(9L, "image", Multimodal.encodeBmp(4, 3, rgb), "b"))
    val mem = MemoryStream[MediaAsset]
    // DEFAULT call: the dedup state is watermarked on the synthetic
    // processing-time column — unbounded state now requires an
    // explicit watermarkCol = None opt-out
    val stream = StreamingOps.mediaIngestStream(mem.toDS(), dim = 16)
    assert(!stream.columns.contains(StreamingOps.MediaIngestTsCol),
      "the synthetic watermark column must not surface in the output")
    assert(stream.queryExecution.analyzed.toString
      .contains("EventTimeWatermark"),
      "the default plan must carry a watermark (bounded dedup state)")
    val q = stream
      .writeStream.format("memory").queryName("media_ingest")
      .outputMode(OutputMode.Append()).start()
    mem.addData(assets.take(4): _*)
    q.processAllAvailable()
    mem.addData(assets.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("media_ingest")
    val ids = out.select("asset_id").collect().map(_.getLong(0)).toSet
    // 3 gated (unknown format); 9 deduped against 1's checksum
    assert(ids === Set(1L, 2L, 4L), s"got $ids")
    // batch reference: identical one-pass decode+featurize rows
    val batch = Multimodal.decodeWithFeatures(
        spark.createDataset(assets.take(4)), 16)
      .filter(col("format") =!= "unknown")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    out.collect().foreach { r =>
      assert(r.toSeq.drop(1) === batch(r.getLong(0)),
        s"stream row diverged for asset ${r.getLong(0)}")
    }
    // the embedding column is the codec-invariant one: BMP and PNG of
    // the same pixels embed identically even through the stream
    val vecs = out.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    assert(vecs(1L) === vecs(2L))
  }

  test("bm25IndexSink: a streamed index probes bit-identically to a " +
      "from-scratch index over the same documents") {
    import spark.implicits._
    import graft.operators.Bm25
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark shuffles data between stages for joins"),
      (2L, "spark spark spark tuning shuffle partitions"),
      (3L, "iceberg tables store snapshots and manifests"),
      (4L, "snowflake loads iceberg tables from manifests"),
      (5L, "a short doc"),
      (6L, "data pipelines join spark and iceberg tables for analytics"))
    val idx = java.nio.file.Files.createTempDirectory("bm25idx_stream").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingOps.bm25IndexSink("doc_id", "text", idx, nBuckets = 8))
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs.take(3): _*) // bootstrap batch
    q.processAllAvailable()
    mem.addData(docs.drop(3): _*) // incremental batch
    q.processAllAvailable()
    q.stop()
    val scratch = java.nio.file.Files.createTempDirectory("bm25idx_stream_ref").toString
    Bm25.writeIndex(docs.toDF("doc_id", "text"), "doc_id", "text", scratch, nBuckets = 8)
    val probes = Seq((1, "spark"), (1, "shuffle"), (2, "iceberg"), (2, "tables"))
      .toDF("q_id", "term")
    def probe(p: String) = Bm25.searchIndex(spark, p, probes, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val g = probe(idx); val s = probe(scratch)
    assert(g.length === s.length && g.nonEmpty)
    for ((x, y) <- g.zip(s)) {
      assert(x._1 === y._1 && x._2 === y._2 && x._3 === y._3, s"$x vs $y")
      assert(java.lang.Double.compare(x._4, y._4) === 0, s"$x vs $y")
    }
  }

  test("phraseIndexSink: a streamed positional index answers phrases " +
      "identically to a from-scratch index over the same documents") {
    import spark.implicits._
    import graft.operators.Search
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox and a quick brown fox again"),
      (3L, "the lazy dog sleeps in the warm sun"),
      (4L, "quick brown foxes are rarely lazy"))
    val idx = java.nio.file.Files.createTempDirectory("searchidx_stream").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingOps.phraseIndexSink("doc_id", "text", idx, nBuckets = 8))
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs.take(2): _*) // bootstrap batch
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*) // incremental batch
    q.processAllAvailable()
    q.stop()
    val scratch = java.nio.file.Files
      .createTempDirectory("searchidx_stream_ref").toString
    Search.writeIndex(docs.toDF("doc_id", "text"), "doc_id", "text",
      scratch, nBuckets = 8)
    for (phrase <- Seq(Seq("quick", "brown", "fox"), Seq("the", "lazy"),
        Seq("lazy"), Seq("missing", "phrase"))) {
      def probe(p: String) = Search.phraseProbe(spark, p, phrase)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(probe(idx) === probe(scratch), s"diverged for $phrase")
    }
  }

  test("ivfPqIndexSink: a streamed vector index's degenerate-exact probes " +
      "equal brute force over everything streamed (model frozen at bootstrap)") {
    import spark.implicits._
    import graft.operators.{IvfPq, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingOps.ivfPqIndexSink(idx, nCentroids = 8,
        centroidIters = 1, dim = 64, nSub = 8, codewords = 16, pqIters = 1))
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows.take(300): _*) // bootstrap batch: trains the model
    q.processAllAvailable()
    mem.addData(rows.drop(300): _*) // incremental: frozen-model append
    q.processAllAvailable()
    q.stop()
    assert(IvfPq.currentVersion(spark, idx) === 2)
    val queries = emb.filter(col("vec_id") < 5)
    // full probe + full re-rank is exact regardless of where the model
    // was trained — the invariant a drifting stream cannot break
    val streamed = IvfPq.searchIndex(spark, idx, queries, k = 3,
        nProbe = 8, rerank = rows.length)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val exact = Similarity.bruteForceTopK(emb, queries, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed === exact)
  }

  test("ledgerDedupSink: a SECOND stream run re-emits nothing the first " +
      "run ingested — the cross-run promise state-store dedup can't make") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val led = java.nio.file.Files.createTempDirectory("ledger_stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("ledger_out").toString
    def docsDf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").withColumn("fp", md5(col("text")))
    // RUN 1: two micro-batches (bootstrap + append)
    val mem1 = MemoryStream[(Long, String)]
    val q1 = mem1.toDF().toDF("doc_id", "text")
      .withColumn("fp", md5(col("text")))
      .writeStream
      .foreachBatch(StreamingOps.ledgerDedupSink("fp", led, outDir,
        txnAppId = "run-1", nBuckets = 4))
      .outputMode(OutputMode.Append()).start()
    mem1.addData((1L, "alpha text"), (2L, "beta text"))
    q1.processAllAvailable()
    mem1.addData((3L, "gamma text"))
    q1.processAllAvailable()
    q1.stop()
    // RUN 2: a fresh query (new checkpoint-less stream, empty state
    // store) replays old content under new ids plus one novel doc
    val mem2 = MemoryStream[(Long, String)]
    val q2 = mem2.toDF().toDF("doc_id", "text")
      .withColumn("fp", md5(col("text")))
      .writeStream
      .foreachBatch(StreamingOps.ledgerDedupSink("fp", led, outDir,
        txnAppId = "run-2", nBuckets = 4))
      .outputMode(OutputMode.Append()).start()
    mem2.addData((9L, "alpha text"), (10L, "delta text"), (11L, "beta text"))
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 10L),
      "run-2 re-sends of run-1 content must not re-emit")
    assert(out.select("fp").distinct().count() === out.count(),
      "each fingerprint ingests exactly once across runs")
  }

  test("index sinks are EXACTLY-ONCE: a committed batch replays as a no-op, " +
      "a batch killed mid-append re-runs cleanly, a fresh lineage's batch 0 " +
      "is not mistaken for a replay") {
    import spark.implicits._
    import graft.operators.{Bm25, IndexCommitTxn, IvfPq, Search}
    // ---- bm25: the full contract ----
    val docs = Seq(
      (1L, "spark shuffles data between stages for joins"),
      (2L, "spark spark spark tuning shuffle partitions"),
      (3L, "iceberg tables store snapshots and manifests"),
      (4L, "snowflake loads iceberg tables from manifests"),
      (5L, "data pipelines join spark and iceberg tables"),
      (6L, "the final lineage document about spark"))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val probes = Seq((1, "spark"), (2, "iceberg"), (2, "tables"))
      .toDF("q_id", "term")
    def probe(p: String) = Bm25.searchIndex(spark, p, probes, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    def scratchOver(rows: Seq[(Long, String)]) = {
      val d = java.nio.file.Files.createTempDirectory("bm25_eo_ref").toString
      Bm25.writeIndex(df(rows), "doc_id", "text", d, nBuckets = 8); d
    }
    val idx = java.nio.file.Files.createTempDirectory("bm25_eo").toString
    val sink = StreamingOps.bm25IndexSink("doc_id", "text", idx,
      nBuckets = 8, txnAppId = Some("app-1"))
    sink(df(docs.take(2)), 0) // bootstrap
    sink(df(docs.slice(2, 4)), 1) // append
    assert(Bm25.currentVersion(spark, idx) === 2)
    val committed = probe(idx)
    // post-commit replay of batch 1: skipped entirely
    sink(df(docs.slice(2, 4)), 1)
    assert(Bm25.currentVersion(spark, idx) === 2,
      "a committed batch's replay must not create a new version")
    assert(probe(idx) === committed)
    // batch 2 killed mid-append (all data written, hint not flipped):
    // the replay sees id 2 > committed 1 and re-runs cleanly
    Bm25.appendToIndexInternal(df(docs.slice(4, 5)), "doc_id", "text", idx,
      abortBeforeCommit = true, txn = Some(IndexCommitTxn("app-1", 2)))
    assert(Bm25.currentVersion(spark, idx) === 2)
    sink(df(docs.slice(4, 5)), 2)
    assert(Bm25.currentVersion(spark, idx) === 3)
    assert(probe(idx) === probe(scratchOver(docs.take(5))),
      "the replayed batch must land exactly once")
    // a NEW lineage (fresh checkpoint) restarts at batch 0 — it must
    // append, not be skipped as a replay of app-1's batch 0
    val sink2 = StreamingOps.bm25IndexSink("doc_id", "text", idx,
      nBuckets = 8, txnAppId = Some("app-2"))
    sink2(df(docs.slice(5, 6)), 0)
    assert(probe(idx) === probe(scratchOver(docs)),
      "a fresh lineage's batch 0 must not be mistaken for a replay")
    // ---- phrase sink: replay skip ----
    val pIdx = java.nio.file.Files.createTempDirectory("phrase_eo").toString
    val pSink = StreamingOps.phraseIndexSink("doc_id", "text", pIdx,
      nBuckets = 8, txnAppId = Some("app-1"))
    pSink(df(docs.take(3)), 0)
    pSink(df(docs.slice(3, 5)), 1)
    assert(Search.currentVersion(spark, pIdx) === 2)
    pSink(df(docs.slice(3, 5)), 1) // replay
    assert(Search.currentVersion(spark, pIdx) === 2)
    val pScratch = java.nio.file.Files.createTempDirectory("phrase_eo_ref").toString
    Search.writeIndex(df(docs.take(5)), "doc_id", "text", pScratch, nBuckets = 8)
    def pProbe(p: String) = Search.phraseProbe(spark, p, Seq("iceberg", "tables"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(pProbe(pIdx) === pProbe(pScratch))
    // ---- vector sink: replay skip ----
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val vIdx = java.nio.file.Files.createTempDirectory("ivfpq_eo").toString
    val vSink = StreamingOps.ivfPqIndexSink(vIdx, nCentroids = 8,
      centroidIters = 1, dim = 64, nSub = 8, codewords = 16, pqIters = 1,
      txnAppId = Some("app-1"))
    vSink(emb.filter(col("vec_id") < 300), 0)
    vSink(emb.filter(col("vec_id") >= 300), 1)
    assert(IvfPq.currentVersion(spark, vIdx) === 2)
    val nVecs = IvfPq.statsTable(spark, vIdx).head().getAs[Long]("n_vecs")
    vSink(emb.filter(col("vec_id") >= 300), 1) // replay
    assert(IvfPq.currentVersion(spark, vIdx) === 2,
      "a committed vector batch's replay must not re-append")
    assert(IvfPq.statsTable(spark, vIdx).head().getAs[Long]("n_vecs") === nVecs)
  }

  test("ledgerDedupSink is EXACTLY-ONCE including its OUTPUT: a replayed " +
      "batch overwrites its own partition instead of doubling rows") {
    import spark.implicits._
    import graft.operators.FingerprintLedger
    val led = java.nio.file.Files.createTempDirectory("ledger_eo").toString
    val out = java.nio.file.Files.createTempDirectory("ledger_eo_out").toString
    def docsDf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text").withColumn("fp", md5(col("text")))
    val sink = StreamingOps.ledgerDedupSink("fp", led, out,
      txnAppId = "app-1", nBuckets = 4)
    sink(docsDf(Seq((1L, "alpha"), (2L, "beta"))), 0)
    // simulate the crash window of batch 1: its (partial) OUTPUT landed
    // but the ledger commit did not — the replay must clobber it
    docsDf(Seq((99L, "partial garbage"))).write.mode("overwrite")
      .parquet(s"$out/txn_app=app-1/batch_id=1")
    sink(docsDf(Seq((3L, "beta"), (4L, "gamma"))), 1)
    // post-commit replay of batch 1: skipped (output AND ledger)
    sink(docsDf(Seq((3L, "beta"), (4L, "gamma"))), 1)
    val rows = spark.read.parquet(out)
    assert(rows.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 4L),
      "replay must neither double survivors nor leave crashed partials")
    assert(rows.select("fp").distinct().count() === rows.count())
    assert(FingerprintLedger.currentVersion(spark, led) === 2)
  }

  test("scrubChunks equals dropRepeatedChunks' cleaned text on the same corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val bp = graft.operators.Dedup.repeatedChunks(docs, "doc_id", "text",
      chunkTokens = 10, maxDocs = 1)
    assert(bp.count() > 0, "fixture must contain repeated chunks")
    val viaScrub = graft.operators.Dedup.scrubChunks(docs, "text", 10, bp)
      .select(col("doc_id"), col("text").as("cleaned")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaBatch = graft.operators.Dedup.dropRepeatedChunks(docs, "doc_id", "text",
        chunkTokens = 10, maxDocs = 1)
      .select(col("doc_id"), col("cleaned")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaScrub === viaBatch)
  }

  test("scrubSpans equals dropDuplicatedSpans' cleaned text on the same corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val spans = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
      windowTokens = 15, minDocs = 2)
    assert(spans.count() > 0, "fixture must contain duplicated spans")
    val viaScrub = graft.operators.Dedup.scrubSpans(docs, "text", 15, spans)
      .select(col("doc_id"), col("text").as("cleaned")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaBatch = graft.operators.Dedup.dropDuplicatedSpans(docs, "doc_id", "text",
        windowTokens = 15, minDocs = 2)
      .select(col("doc_id"), col("cleaned")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaScrub === viaBatch)
  }

  test("corpus ingest stream with boilerplate scrub: two micro-batches equal the batch composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = spark.createDataset(fixture).toDF("doc_id", "text")
    // boilerplate learned in batch (the production shape), applied live
    val bp = graft.operators.Dedup.repeatedChunks(corpus, "doc_id", "text",
      chunkTokens = 10, maxDocs = 1).cache()
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.corpusIngestStream(
        mem.toDF().toDF("doc_id", "text"), minQuality = 0.5, nShards = 8,
        boilerplate = Some(bp))
      .writeStream.format("memory").queryName("ingest_scrubbed")
      .outputMode(OutputMode.Append()).start()
    mem.addData(fixture.take(fixture.length / 2): _*)
    q.processAllAvailable()
    mem.addData(fixture.drop(fixture.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest_scrubbed")
      .select("doc_id", "fp", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch reference: gate → scrub → fingerprint, one survivor per fp
    val batchScrubbed = graft.operators.Dedup.scrubChunks(
      corpus.filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5),
      "text", 10, bp)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val batchFps = batchScrubbed.select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._2).toSet === batchFps, "one survivor per scrubbed fingerprint")
    assert(out.length === batchFps.size, "no fingerprint emitted twice")
    // the scrub must actually change the dedup outcome vs the unscrubbed
    // gate (exact dups AND boilerplate-only-different docs now collapse)
    val unscrubbedFps = corpus
      .filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .select("fp").distinct().count()
    assert(batchFps.size <= unscrubbedFps)
    bp.unpersist()
  }

  test("corpus ingest stream with chunk AND span scrub stages: two " +
      "micro-batches equal the batch composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = spark.createDataset(fixture).toDF("doc_id", "text")
    val bp = graft.operators.Dedup.repeatedChunks(corpus, "doc_id", "text",
      chunkTokens = 10, maxDocs = 1).cache()
    val spans = graft.operators.Dedup.duplicatedSpans(corpus, "doc_id", "text",
      windowTokens = 15, minDocs = 2).cache()
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.corpusIngestStream(
        mem.toDF().toDF("doc_id", "text"), minQuality = 0.5, nShards = 8,
        boilerplate = Some(bp), dupSpans = Some(spans))
      .writeStream.format("memory").queryName("ingest_despanned")
      .outputMode(OutputMode.Append()).start()
    mem.addData(fixture.take(fixture.length / 2): _*)
    q.processAllAvailable()
    mem.addData(fixture.drop(fixture.length / 2): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ingest_despanned")
      .select("doc_id", "fp", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch reference: gate → chunk scrub → span scrub → fingerprint
    val gatedB = corpus.filter(
      graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5)
    val batchClean = graft.operators.Dedup.scrubSpans(
      graft.operators.Dedup.scrubChunks(gatedB, "text", 10, bp),
      "text", 15, spans)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
    val batchFps = batchClean.select("fp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._2).toSet === batchFps)
    assert(out.length === batchFps.size, "no fingerprint emitted twice")
    bp.unpersist(); spans.unpersist()
  }

  test("streaming dedup: first row per fingerprint survives across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupStream(
        mem.toDF().toDF("doc_id", "fp"), Seq("fp"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, "a"), (2L, "b"), (3L, "a")) // 3 dups 1 within batch
    q.processAllAvailable()
    mem.addData((4L, "b"), (5L, "c")) // 4 dups 2 across batches
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(got === Map("a" -> 1L, "b" -> 2L, "c" -> 5L))
    // equals the batch-mode distinct-by-fingerprint (first by arrival
    // has no batch meaning; compare fingerprint sets)
    assert(got.keySet === Set("a", "b", "c"))
  }

  test("urlDedupStage: a re-crawl under a URL variant with CHANGED " +
      "content is dropped across batches — the revisit content dedup " +
      "misses; new canonical URLs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingOps.urlDedupStage(
        mem.toDF().toDF("doc_id", "url", "text"))
      .writeStream.format("memory").queryName("url_dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (1L, "https://Example.org:443/a?p=1", "first crawl of a"),
      (2L, "https://example.org/b", "page b"))
    q.processAllAvailable()
    mem.addData(
      // revisit of page a: canonical URL equal, content changed —
      // URL dedup must drop it (content fp would NOT have)
      (3L, "https://example.org/a?p=1&utm_source=feed", "a with new ads"),
      (4L, "https://example.org/c", "page c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("url_dedup").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("canonical_url"))
      .toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    assert(got(1L) === "https://example.org/a?p=1")

    // end-to-end: the crawl fixture's revisits (URL variants, same
    // bytes) and mirrors (same bytes, new URL) both collapse when the
    // frontier stage fronts the ingest — one output row per doc
    import graft.sources.Warc
    val drop = Files.createTempDirectory("warc_drop_url").toString
    val docs = (0 until 10).map(i => (i.toLong,
      s"frontier doc $i carries enough plain words for the gate"))
      .toDF("doc_id", "text")
    Warc.synthesizeCrawlFixture(docs, drop, nFiles = 2)
    val q2 = StreamingOps.crawlIngestStream(spark, drop,
        minQuality = 0.0, nShards = 4, urlDedup = true)
      .writeStream.format("memory").queryName("crawl_frontier")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      val out = spark.table("crawl_frontier")
      assert(out.count() === 10L,
        "revisits die at the URL stage, mirrors at the content stage")
      assert(out.select("canonical_url").distinct().count() === 10L)
    } finally q2.stop()
  }

  test("crawlTextStream: a drop-directory WARC stream equals the batch " +
      "crawl stages over the same files; a second file wave appends") {
    import spark.implicits._
    import graft.sources.Warc
    val drop = Files.createTempDirectory("warc_drop").toString
    def dropWave(ids: Range, prefix: String): Unit = {
      val docs = ids.map(i => (i.toLong,
        s"wave doc $i carries some plain words for the crawl"))
        .toDF("doc_id", "text")
      val tmp = Files.createTempDirectory("warc_wave").toString
      Warc.synthesizeFixture(docs, tmp, nFiles = 2)
      for (f <- new java.io.File(tmp).listFiles()
          if f.getName.startsWith("part-"))
        Files.copy(f.toPath,
          java.nio.file.Paths.get(drop, prefix + f.getName))
    }
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "url", "charset", "decode_errors", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4))).toSet
    dropWave(0 until 8, "w1-")
    val q = StreamingOps.crawlTextStream(spark, drop)
      .writeStream.format("memory").queryName("crawl_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val batch1 = canon(StreamingOps.crawlTextStages(
        Warc.records(spark, s"$drop/*.warc*")))
      assert(batch1.nonEmpty)
      assert(canon(spark.table("crawl_stream")) === batch1,
        "stream != batch after wave 1")
      // the second wave lands as new files and appends; ids disjoint
      dropWave(100 until 106, "w2-")
      q.processAllAvailable()
      val batchAll = canon(StreamingOps.crawlTextStages(
        Warc.records(spark, s"$drop/*.warc*")))
      assert(batchAll.size > batch1.size)
      assert(canon(spark.table("crawl_stream")) === batchAll,
        "stream != batch after wave 2")
      // the charset legs all decoded losslessly through the stream
      assert(spark.table("crawl_stream")
        .filter(col("decode_errors") =!= 0).count() === 0L)
      assert(spark.table("crawl_stream").select("charset").distinct()
        .collect().map(_.getString(0)).toSet
        === Set("utf-8", "windows-1252"))
    } finally q.stop()
    // the full composition keeps shard routing + dedup stages live:
    // two batches of the END-TO-END crawlIngestStream equal the batch
    // pipeline over the same files
    val q2 = StreamingOps.crawlIngestStream(spark, drop,
        minQuality = 0.0, nShards = 4)
      .writeStream.format("memory").queryName("crawl_ingest")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      val got = spark.table("crawl_ingest")
      assert(got.count() ===
        Warc.records(spark, s"$drop/*.warc*")
          .filter(col("warc_type") === "response").count(),
        "every page passes the open quality gate exactly once")
      assert(got.select("shard").distinct().count() > 1L,
        "shard routing must spread documents")
    } finally q2.stop()
  }

  test("icebergTableSink is EXACTLY-ONCE: bootstrap + increments, a " +
      "committed batch replays as a no-op, a batch killed pre-commit " +
      "re-runs cleanly, interleaved maintenance carries the txn forward") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    import graft.sources.IcebergSnapshot
    val table = Db2Parser.parse(
      """CREATE TABLE S.SINK (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_sink").toString
    def rowsDf(ks: Range) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType), StructField("N", IntegerType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"p${k % 2}", k * 7)), 2), schema)
    }
    def readKs = IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).toSet
    def nSnapshots = {
      val v = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8")
        .trim.toInt
      val meta = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8"))
      (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr.size
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val sink = StreamingOps.icebergTableSink(table, out, txnAppId = "ckpt-1")

    // batch 0 bootstraps the table; batch 1 is an increment
    sink(rowsDf(1 to 4), 0)
    assert(readKs === (1L to 4L).toSet)
    assert(IcebergSnapshot.tableProperties(out, conf)
      .get("graft.streaming.txn.ckpt-1") === Some("0"))
    sink(rowsDf(5 to 8), 1)
    assert(readKs === (1L to 8L).toSet)
    assert(nSnapshots === 2)

    // post-commit replay of batch 1: skipped entirely
    sink(rowsDf(5 to 8), 1)
    assert(readKs === (1L to 8L).toSet, "replay must not double rows")
    assert(nSnapshots === 2, "replay must not commit a snapshot")

    // interleaved maintenance between batches: the REPLACE commit must
    // carry the txn property forward, so the replay stays skipped
    IcebergSnapshot.compactDataFiles(spark, table, out, targetBytes = 1L << 30)
    assert(IcebergSnapshot.tableProperties(out, conf)
      .get("graft.streaming.txn.ckpt-1") === Some("1"),
      "compaction must carry the txn guard forward")
    sink(rowsDf(5 to 8), 1)
    assert(readKs === (1L to 8L).toSet)

    // batch 2 killed pre-commit: data files landed in the per-batch
    // dir, no snapshot. The replay overwrites them and commits ONCE.
    val appHash = java.util.UUID.nameUUIDFromBytes(
      "ckpt-1".getBytes("UTF-8")).toString
    SchemaTranslator.writeMigrated(rowsDf(9 to 10), table,
      s"$out/data/stream-$appHash-2", mode = "overwrite")
    assert(readKs === (1L to 8L).toSet, "crashed batch must be invisible")
    sink(rowsDf(9 to 10), 2)
    assert(readKs === (1L to 10L).toSet, "replayed batch lands exactly once")
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .groupBy("K").count()
      .filter(col("count") > 1).count() === 0L, "no duplicate keys")

    // a NEW lineage's batch 0 appends — not mistaken for a replay
    val sink2 = StreamingOps.icebergTableSink(table, out, txnAppId = "ckpt-2")
    sink2(rowsDf(11 to 12), 0)
    assert(readKs === (1L to 12L).toSet)
    val props = IcebergSnapshot.tableProperties(out, conf)
    assert(props.get("graft.streaming.txn.ckpt-1") === Some("2"))
    assert(props.get("graft.streaming.txn.ckpt-2") === Some("0"))
    assert(props.get("write.format.default") === Some("parquet"))

    // property upsert/remove round-trip (metadata-only commits)
    IcebergSnapshot.setTableProperties(table, out,
      Map("commit.retry.num-retries" -> Some("7")), conf)
    assert(IcebergSnapshot.tableProperties(out, conf)
      .get("commit.retry.num-retries") === Some("7"))
    IcebergSnapshot.setTableProperties(table, out,
      Map("commit.retry.num-retries" -> None), conf)
    assert(!IcebergSnapshot.tableProperties(out, conf)
      .contains("commit.retry.num-retries"))
    assert(readKs === (1L to 12L).toSet, "property commits leave rows alone")
    IcebergV2Validation.validateV2(org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        out, "metadata", s"v${new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
          "UTF-8").trim.toInt}.metadata.json")), "UTF-8")),
      expectSnapshot = true)
  }

  test("icebergUpsertSink is EXACTLY-ONCE: bootstrap, latest-wins CDC " +
      "increments, replay no-op, pre-commit crash re-runs cleanly") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    import graft.sources.IcebergSnapshot
    val table = Db2Parser.parse(
      """CREATE TABLE S.UPS (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_ups").toString
    def df(rows: Seq[(Long, String, Int)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType), StructField("N", IntegerType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)
    }
    def state = IcebergSnapshot.readSnapshot(spark, out, table)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val sink = StreamingOps.icebergUpsertSink(table, out,
      keyCols = Seq("K"), txnAppId = "ups-1")

    sink(df(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))), 0) // bootstrap
    assert(state === Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
    // CDC batch: update K=2, insert K=4
    sink(df(Seq((2L, "b2", 22), (4L, "d", 40))), 1)
    assert(state === Set((1L, "a", 10), (2L, "b2", 22), (3L, "c", 30),
      (4L, "d", 40)))
    // post-commit replay: no-op (no doubled rows, no extra snapshot)
    sink(df(Seq((2L, "b2", 22), (4L, "d", 40))), 1)
    assert(state === Set((1L, "a", 10), (2L, "b2", 22), (3L, "c", 30),
      (4L, "d", 40)), "replay must not re-apply the upsert")
    // batch 2 crashes after the data write, before the commit: the
    // replay overwrites the partial files and commits exactly once
    val appHash = java.util.UUID.nameUUIDFromBytes(
      "ups-1".getBytes("UTF-8")).toString
    SchemaTranslator.writeMigrated(df(Seq((1L, "a2", 11))), table,
      s"$out/data/stream-$appHash-2", mode = "overwrite")
    assert(state === Set((1L, "a", 10), (2L, "b2", 22), (3L, "c", 30),
      (4L, "d", 40)), "crashed batch must be invisible")
    sink(df(Seq((1L, "a2", 11))), 2)
    assert(state === Set((1L, "a2", 11), (2L, "b2", 22), (3L, "c", 30),
      (4L, "d", 40)), "replayed upsert lands exactly once")
    assert(IcebergSnapshot.tableProperties(out,
      spark.sparkContext.hadoopConfiguration)
      .get("graft.streaming.txn.ups-1") === Some("2"))
    // merge-on-read shape: the table still time-travels to bootstrap
    val chain = {
      val v = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
        "UTF-8").trim.toInt
      val meta = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          out, "metadata", s"v$v.metadata.json")), "UTF-8"))
      (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr
        .map(sn => (sn \ "snapshot-id").asInstanceOf[org.json4s.JInt].num.toLong)
    }
    assert(chain.size === 3)
    assert(IcebergSnapshot.readSnapshot(spark, out, table, Some(chain.head))
      .count() === 3L)
  }

  test("icebergCdcSink applies insert/update/delete events as one atomic " +
      "snapshot per batch; replays and delete-only batches stay exact") {
    import graft.parse.Db2Parser
    import graft.sources.IcebergSnapshot
    val table = Db2Parser.parse(
      """CREATE TABLE S.CDC2 (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_cdc_sink").toString
    def df(rows: Seq[(Long, String, String)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType), StructField("op", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)
    }
    def state = IcebergSnapshot.readSnapshot(spark, out, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val sink = StreamingOps.icebergCdcSink(table, out,
      keyCols = Seq("K"), opCol = "op", txnAppId = "cdc-1")

    sink(df(Seq((1L, "a", "I"), (2L, "b", "I"), (3L, "c", "I"))), 0)
    assert(state === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the op column must not have leaked into the table
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .columns.toSeq === Seq("K", "V"))
    // mixed batch: update 1, delete 2, insert 4 — one snapshot
    sink(df(Seq((1L, "a2", "U"), (2L, "b", "D"), (4L, "d", "I"))), 1)
    assert(state === Set((1L, "a2"), (3L, "c"), (4L, "d")))
    // replay: no-op
    sink(df(Seq((1L, "a2", "U"), (2L, "b", "D"), (4L, "d", "I"))), 1)
    assert(state === Set((1L, "a2"), (3L, "c"), (4L, "d")))
    // delete-only batch: no data files, a pure DELETE snapshot
    sink(df(Seq((3L, "c", "D"))), 2)
    assert(state === Set((1L, "a2"), (4L, "d")))
    assert(IcebergSnapshot.tableProperties(out,
      spark.sparkContext.hadoopConfiguration)
      .get("graft.streaming.txn.cdc-1") === Some("2"))
    // deleted keys re-insert cleanly in a later batch (equality
    // deletes only kill STRICTLY older files)
    sink(df(Seq((2L, "b9", "I"))), 3)
    assert(state === Set((1L, "a2"), (2L, "b9"), (4L, "d")))
  }

  test("iceberg sinks recover from a BOOTSTRAP crash window: metadata " +
      "written but no snapshot committed → replay re-runs bootstrap " +
      "instead of livelocking on increment-of-nothing") {
    import graft.parse.Db2Parser
    import graft.sources.{IcebergMetadata, IcebergSnapshot}
    val table = Db2Parser.parse(
      """CREATE TABLE S.BOOT (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    def df(rows: Seq[(Long, String)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 2), schema)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    // all three sinks share the bootstrap branch — pin each one
    def crashThenReplay(mk: String => (org.apache.spark.sql.DataFrame,
        Long) => Unit, suffix: String, opCol: Boolean = false): Unit = {
      val out = Files.createTempDirectory(s"iceberg_boot_$suffix").toString
      // simulate the crash: batch 0 died AFTER writeTableMetadata
      // (hint=1, no snapshot) and, in the worst case, after partial
      // data landed in the per-batch dir
      IcebergMetadata.writeTableMetadata(table, out, conf)
      assert(IcebergSnapshot.currentSnapshotId(out, conf).isEmpty)
      val sink = mk(out)
      val batch =
        if (opCol) df(Seq((1L, "a"), (2L, "b")))
          .withColumn("op", org.apache.spark.sql.functions.lit("I"))
        else df(Seq((1L, "a"), (2L, "b")))
      sink(batch, 0) // pre-fix: require(version >= 2) / .get crash forever
      val ks = IcebergSnapshot.readSnapshot(spark, out, table)
        .select("K").collect().map(_.getLong(0)).toSet
      assert(ks === Set(1L, 2L), s"$suffix bootstrap replay must land rows")
      // and the txn guard committed — a second replay is a no-op
      sink(batch, 0)
      assert(IcebergSnapshot.readSnapshot(spark, out, table).count() === 2L,
        s"$suffix post-bootstrap replay must not double rows")
    }
    crashThenReplay(out => StreamingOps.icebergTableSink(
      table, out, txnAppId = "boot-t"), "table")
    crashThenReplay(out => StreamingOps.icebergUpsertSink(
      table, out, keyCols = Seq("K"), txnAppId = "boot-u"), "upsert")
    crashThenReplay(out => StreamingOps.icebergCdcSink(
      table, out, keyCols = Seq("K"), opCol = "op", txnAppId = "boot-c"),
      "cdc", opCol = true)
  }

  test("icebergCdcSink refuses a NULL op marker loudly instead of " +
      "silently deleting the row") {
    import graft.parse.Db2Parser
    val table = Db2Parser.parse(
      """CREATE TABLE S.CDC3 (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_cdc_null").toString
    def df(rows: Seq[(Long, String, String)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType), StructField("op", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 2), schema)
    }
    val sink = StreamingOps.icebergCdcSink(table, out,
      keyCols = Seq("K"), opCol = "op", txnAppId = "cdc-null")
    sink(df(Seq((1L, "a", "I"), (2L, "b", "I"))), 0)
    val e = intercept[IllegalArgumentException] {
      sink(df(Seq((1L, "a2", "U"), (2L, "gone", null))), 1)
    }
    assert(e.getMessage.contains("NULL op"))
    // nothing committed: row 2 must still be alive
    val state = graft.sources.IcebergSnapshot.readSnapshot(spark, out, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state === Set((1L, "a"), (2L, "b")))
  }

  test("sink maintenance cadence: a 25-batch replayed upsert stream ends " +
      "with bounded snapshots and live files, probes bit-identical to the " +
      "no-maintenance twin, exactly-once across a crash inside the " +
      "maintenance window") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    import graft.sources.{IcebergDeletes, IcebergPruning, IcebergSnapshot}
    val table = Db2Parser.parse(
      """CREATE TABLE S.MAINT (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val conf = spark.sparkContext.hadoopConfiguration
    val outM = Files.createTempDirectory("iceberg_maint").toString
    val outP = Files.createTempDirectory("iceberg_plain").toString
    // batch i upserts three keys of 0..9 — every key is rewritten many
    // times across 25 batches, so delete files and small files pile up
    def batchDf(i: Int) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType), StructField("N", IntegerType)))
      val keys = Seq(i % 10, (i + 3) % 10, (i + 6) % 10).distinct
      spark.createDataFrame(
        spark.sparkContext.parallelize(keys.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"p${k % 2}", i)), 2), schema)
    }
    def rows(path: String) =
      IcebergSnapshot.readSnapshot(spark, path, table)
        .select(col("K").cast("long"), col("V").cast("string"),
          col("N").cast("int")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    def nSnapshots(path: String) = {
      val v = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "metadata", "version-hint.text")),
        "UTF-8").trim.toInt
      val meta = org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          path, "metadata", s"v$v.metadata.json")), "UTF-8"))
      (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr.size
    }
    def nLiveFiles(path: String) =
      IcebergPruning.planScan(conf, path, table, Nil)._1.size

    val m = StreamingOps.SinkMaintenance(everyBatches = 5,
      targetFileBytes = 1L << 30, keepSnapshots = 4)
    val sinkM = StreamingOps.icebergUpsertSink(table, outM,
      keyCols = Seq("K"), txnAppId = "maint-ckpt", maintenance = Some(m))
    val sinkP = StreamingOps.icebergUpsertSink(table, outP,
      keyCols = Seq("K"), txnAppId = "maint-ckpt")
    val txnKey = "graft.streaming.txn.maint-ckpt"
    val appHash = java.util.UUID.nameUUIDFromBytes(
      "maint-ckpt".getBytes("UTF-8")).toString

    for (bid <- 0 to 13) {
      sinkM(batchDf(bid), bid.toLong); sinkM(batchDf(bid), bid.toLong)
      sinkP(batchDf(bid), bid.toLong)
      assert(rows(outM) === rows(outP), s"diverged at batch $bid")
    }

    // batch 14 is a cadence tick — CRASH INSIDE THE MAINTENANCE WINDOW:
    // the batch's own commit lands, delete-folding compaction lands,
    // then the process dies before small-file binning and expiry. Replay
    // through the real sink must skip the batch (the txn guard rode
    // through the maintenance REPLACE commit) and never double rows.
    SchemaTranslator.writeMigrated(batchDf(14), table,
      s"$outM/data/stream-$appHash-14", mode = "overwrite")
    val schema = SchemaTranslator.toSparkSchema(table)
    IcebergDeletes.commitUpsert(spark, table, outM,
      batchDf(14).select(col("K").cast(schema("K").dataType).as("K")),
      extraProperties = Map(txnKey -> "14"))
    IcebergDeletes.compactWithDeletes(spark, table, outM) // then: crash
    assert(IcebergSnapshot.tableProperties(outM, conf).get(txnKey) ===
      Some("14"), "maintenance commits must carry the txn guard forward")
    sinkM(batchDf(14), 14L) // post-crash replay: full no-op
    sinkP(batchDf(14), 14L)
    assert(rows(outM) === rows(outP),
      "crash inside maintenance must not lose or double the batch")
    assert(IcebergSnapshot.readSnapshot(spark, outM, table)
      .groupBy("K").count().filter(col("count") > 1).count() === 0L)

    for (bid <- 15 to 24) {
      sinkM(batchDf(bid), bid.toLong); sinkM(batchDf(bid), bid.toLong)
      sinkP(batchDf(bid), bid.toLong)
    }

    // probes bit-identical to the twin that never maintained
    assert(rows(outM) === rows(outP),
      "maintenance must never change what readers see")
    // expected content independently: each key carries its last writer
    val expected = (0 to 9).map { k =>
      val last = (0 to 24).filter(i =>
        Seq(i % 10, (i + 3) % 10, (i + 6) % 10).contains(k)).max
      (k.toLong, s"p${k % 2}", last)
    }.toSet
    assert(rows(outM) === expected)

    // bounded metadata/file growth: the last tick ran after batch 24,
    // so the maintained table sits at its post-maintenance floor —
    // keepSnapshots snapshots, one compacted file per live partition —
    // while the twin carries every batch's snapshot and small files
    assert(nSnapshots(outM) <= 4,
      s"expiry must bound snapshots, got ${nSnapshots(outM)}")
    assert(nSnapshots(outP) >= 25, "twin sanity: one snapshot per batch")
    assert(nLiveFiles(outM) <= 2,
      s"compaction must bound live files, got ${nLiveFiles(outM)}")
    assert(nLiveFiles(outP) >= 25, "twin sanity: small files accumulate")
    // expired history is gone; retained history still time-travels
    assert(new java.io.File(s"$outM/data").listFiles().nonEmpty)
    IcebergV2Validation.validateV2(org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        outM, "metadata", s"v${new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(outM, "metadata", "version-hint.text")),
          "UTF-8").trim.toInt}.metadata.json")), "UTF-8")),
      expectSnapshot = true)
  }

  test("sink maintenance cadence on the append sink: compaction + expiry " +
      "bound an append-only stream, replays stay no-ops at cadence ticks") {
    import graft.parse.Db2Parser
    import graft.sources.{IcebergPruning, IcebergSnapshot}
    val table = Db2Parser.parse(
      """CREATE TABLE S.MAINTA (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val conf = spark.sparkContext.hadoopConfiguration
    val out = Files.createTempDirectory("iceberg_maint_app").toString
    def df(ks: Range) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"v$k")), 2), schema)
    }
    val sink = StreamingOps.icebergTableSink(table, out,
      txnAppId = "maint-app", maintenance = Some(StreamingOps.SinkMaintenance(
        everyBatches = 3, targetFileBytes = 1L << 30, keepSnapshots = 2)))
    for (bid <- 0 to 11) {
      sink(df(bid * 10 + 1 to bid * 10 + 5), bid.toLong)
      sink(df(bid * 10 + 1 to bid * 10 + 5), bid.toLong) // replay no-op
    }
    val got = IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).toSet
    val want = (0 to 11).flatMap(b => b * 10 + 1 to b * 10 + 5)
      .map(_.toLong).toSet
    assert(got === want, "append stream content survives maintenance")
    // last tick after batch 11: everything binned into one file,
    // history trimmed to keepSnapshots
    assert(IcebergPruning.planScan(conf, out, table, Nil)._1.size === 1)
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
      "UTF-8").trim.toInt
    val meta = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        out, "metadata", s"v$v.metadata.json")), "UTF-8"))
    assert((meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr.size <= 2)
  }

  test("graft-iceberg STREAMING SOURCE tails committed snapshots: " +
      "stream==batch per range, WAP never leaks, kill-and-replay " +
      "resumes from the committed offset, strict refuses row removals") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    import graft.sources.{IcebergChanges, IcebergSnapshot}
    val table = Db2Parser.parse(
      """CREATE TABLE S.TAIL (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_tail").toString
    val ckpt = Files.createTempDirectory("iceberg_tail_ckpt").toString
    def df(ks: Range) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"v$k")), 2), schema)
    }
    SchemaTranslator.migrateTable(df(1 to 4), table, out)

    // collected (batchId, key, commit-snapshot) triples across runs
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
    def start() = spark.readStream.format("graft-iceberg").load(out)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        b.select("K", "_commit_snapshot_id", "_change_type").collect()
          .foreach { r =>
            assert(r.getString(2) === "insert")
            seen.add((bid, r.getLong(0), r.getLong(1)))
          }
        ()
      }.start()
    def keys = seen.iterator().asScala.map(_._2).toSeq

    val q = start()
    q.processAllAvailable()
    assert(keys.sorted === (1L to 4L), "backfill = the existing table")

    // appends between micro-batches arrive exactly once
    SchemaTranslator.appendIncrement(df(5 to 6), table, out)
    SchemaTranslator.appendIncrement(df(7 to 8), table, out)
    q.processAllAvailable()
    assert(keys.sorted === (1L to 8L))

    // a staged WAP branch snapshot must NOT surface
    SchemaTranslator.stageAppendToBranch(df(90 to 91), table, out, "wap")
    q.processAllAvailable()
    assert(keys.sorted === (1L to 8L), "staged branch leaked into the stream")
    q.stop()

    // kill-and-replay: rows committed while the stream is down arrive
    // once on restart — nothing before the committed offset re-emits
    SchemaTranslator.appendIncrement(df(9 to 10), table, out)
    val q2 = start()
    q2.processAllAvailable()
    assert(keys.sorted === (1L to 10L), "restart must resume, not rescan")
    q2.stop()

    // stream total == the batch incremental scan over the whole range
    val batchKeys = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = None).select("K").collect().map(_.getLong(0)).toSeq
    assert(keys.sorted === batchKeys.sorted)
    // per-commit attribution matches the batch face too
    val batchAttr = IcebergChanges.incrementalAppendScan(spark, out, table,
      fromSnapshotId = None).select("K", "_commit_snapshot_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seen.iterator().asScala.map(t => (t._2, t._3)).toSet === batchAttr)

    // STRICT: a row-removing snapshot kills the stream loudly
    SchemaTranslator.mergeUpsert(df(1 to 1), table, out, keyCols = Seq("K"))
    val q3 = start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    assert(err.getMessage.contains("remove rows") ||
      Option(err.getCause).exists(_.getMessage.contains("remove rows")))
    q3.stop()

    // strict=false reads just the adds (append-only view of the upsert)
    val seen2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val ckpt2 = Files.createTempDirectory("iceberg_tail_ckpt2").toString
    val q4 = spark.readStream.format("graft-iceberg")
      .option("strict", "false").load(out)
      .writeStream.option("checkpointLocation", ckpt2)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("K").collect().foreach(r => seen2.add(r.getLong(0)))
        ()
      }.start()
    q4.processAllAvailable()
    q4.stop()
    // every add across history: 1-10 plus the upsert's fresh K=1 file
    val adds = seen2.iterator().asScala.toSeq.sorted
    assert(adds === (Seq(1L) ++ (1L to 10L)).sorted,
      "non-strict view = every added row, including the upsert's new version")
  }

  test("graft-iceberg CDC streaming mode tails insert+delete rows == the " +
      "batch changesTable, exactly once across kill-and-replay, at " +
      "O(changes) cost per micro-batch") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    import graft.sources.IcebergChanges
    val table = Db2Parser.parse(
      """CREATE TABLE S.CDCTAIL (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_cdctail").toString
    val ckpt = Files.createTempDirectory("iceberg_cdctail_ckpt").toString
    def df(rows: Seq[(Long, String)]) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2)), 2), schema)
    }
    // the table is fed by the upsert sink — the producer half of the
    // loop this mode closes
    val sink = StreamingOps.icebergUpsertSink(table, out,
      keyCols = Seq("K"), txnAppId = "cdctail")
    sink(df(Seq((1L, "a"), (2L, "b"), (3L, "c"))), 0)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, String, Long)]
    def start() = spark.readStream.format("graft-iceberg")
      .option("mode", "cdc").load(out)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("K", "V", "_change_type", "_commit_snapshot_id").collect()
          .foreach(r => seen.add(
            (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
        ()
      }.start()
    def rows = seen.iterator().asScala.toSeq

    val q = start()
    q.processAllAvailable()
    assert(rows.map(t => (t._1, t._3)).sorted ===
      Seq((1L, "insert"), (2L, "insert"), (3L, "insert")))

    // an upsert between micro-batches emits delete(old) + insert(new);
    // a pure delete emits delete(old) only
    sink(df(Seq((2L, "b2"), (4L, "d"))), 1)
    graft.sources.IcebergDeletes.commitUpsert(spark, table, out,
      df(Seq((3L, "c"))).select("K"))
    q.processAllAvailable()
    q.stop()

    // kill-and-replay: changes committed while down arrive once
    sink(df(Seq((1L, "a2"))), 2)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // the stream's cumulative CDC rows == the batch face over the
    // whole history, metadata included
    val batch = IcebergChanges.changesTable(spark, out, table, None)
      .select("K", "V", "_change_type", "_commit_snapshot_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(rows.sorted === batch.sorted,
      "stream CDC total must equal the batch changesTable")
    // and the net state replays from the stream: inserts minus deletes
    val net = rows.groupBy(t => (t._1, t._2)).view.mapValues(g =>
      g.count(_._3 == "insert") - g.count(_._3 == "delete")).toMap
    val live = net.filter(_._2 > 0).keySet
    assert(live === Set((1L, "a2"), (2L, "b2"), (4L, "d")),
      "downstream mirror reconstructed from the stream diverged")
  }

  test("writeStream.format(graft-iceberg): the idiomatic sink face lands " +
      "exactly-once upserts, bootstraps from create-ddl, survives " +
      "restart under the same checkpoint, maintenance options bound " +
      "metadata growth") {
    import graft.parse.Db2Parser
    import graft.sources.IcebergSnapshot
    val ddl =
      """CREATE TABLE S.WFACE (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin
    val table = Db2Parser.parse(ddl).tables.head
    val out = Files.createTempDirectory("iceberg_wface").toString
    val ckpt = Files.createTempDirectory("iceberg_wface_ckpt").toString

    import spark.implicits._
    val mem = MemoryStream[(Long, String)](spark)
    def start() = mem.toDF().toDF("K", "V")
      .writeStream.format("graft-iceberg")
      .option("checkpointLocation", ckpt)
      .option("mode", "upsert").option("key-cols", "K")
      .option("create-ddl", ddl)
      .option("maintain-every", "2").option("keep-snapshots", "3")
      .start(out)
    def state = IcebergSnapshot.readSnapshot(spark, out, table)
      .select(col("K").cast("long"), col("V").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val q = start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    assert(state === Set((1L, "a"), (2L, "b")), "bootstrap batch lands")
    mem.addData((2L, "b2"), (3L, "c"))
    q.processAllAvailable()
    assert(state === Set((1L, "a"), (2L, "b2"), (3L, "c")),
      "upsert mode: latest wins per key")
    q.stop()

    // restart under the SAME checkpoint: the lineage id derives from
    // it, so data queued while down lands exactly once
    mem.addData((1L, "a2"), (4L, "d"))
    val q2 = start()
    q2.processAllAvailable()
    assert(state === Set((1L, "a2"), (2L, "b2"), (3L, "c"), (4L, "d")))
    mem.addData((5L, "e"))
    mem.addData((6L, "f"))
    q2.processAllAvailable()
    q2.stop()
    assert(state === Set((1L, "a2"), (2L, "b2"), (3L, "c"), (4L, "d"),
      (5L, "e"), (6L, "f")))

    // cadence-2 maintenance + keep-3 expiry bound the chain
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
      "UTF-8").trim.toInt
    val meta = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        out, "metadata", s"v$v.metadata.json")), "UTF-8"))
    val nSnaps = (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr.size
    assert(nSnaps <= 6,
      s"maintenance must bound snapshot growth, got $nSnaps")

    // Complete output mode refuses
    val e = intercept[Exception] {
      mem.toDF().toDF("K", "V").groupBy("K").count()
        .writeStream.format("graft-iceberg")
        .outputMode("complete")
        .option("checkpointLocation",
          Files.createTempDirectory("wface_c").toString)
        .option("mode", "append").option("create-ddl", ddl)
        .start(Files.createTempDirectory("wface_t").toString)
    }
    assert(e.getMessage.contains("Append/Update") ||
      Option(e.getCause).exists(_.getMessage.contains("Append/Update")))
  }

  test("LIVE tail under concurrent commits: a writer lands 20 increments " +
      "while the stream runs; every row arrives exactly once (the " +
      "torn-read hint surface under real contention)") {
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    val table = Db2Parser.parse(
      """CREATE TABLE S.LIVE2 (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_livetail").toString
    val ckpt = Files.createTempDirectory("iceberg_livetail_ckpt").toString
    def df(ks: Range) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"v$k")), 1), schema)
    }
    SchemaTranslator.migrateTable(df(0 until 5), table, out)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = spark.readStream.format("graft-iceberg").load(out)
      .writeStream.option("checkpointLocation", ckpt)
      // a short trigger so getOffset polls WHILE commits land
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("K").collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }.start()

    // the writer: 20 increments from this thread while the stream's
    // own threads poll getOffset/getBatch — commits interleave with
    // reads on the shared version hint
    for (i <- 1 to 20)
      SchemaTranslator.appendIncrement(df(i * 5 until i * 5 + 5), table, out)
    q.processAllAvailable()
    q.stop()

    val got = seen.iterator().asScala.toSeq
    val want = (0 until 105).map(_.toLong)
    assert(got.sorted === want.sorted,
      s"exactly-once violated: got ${got.size} rows (${got.distinct.size} " +
        s"distinct) of ${want.size}")
  }

  test("Trigger.AvailableNow bounded catch-up: a multi-commit backfill " +
      "equals the batch read and TERMINATES; a second run drains only " +
      "the new commits; a staged WAP branch stays invisible") {
    // the batch-onboarding face every deployment runs first: backfill
    // the table's existing history to current, then stop — Spark wraps
    // the V1 source (AvailableNowSourceWrapper) pinning the end offset
    // at start, so commits landing DURING the run wait for the next one
    import graft.api.SchemaTranslator
    import graft.parse.Db2Parser
    val table = Db2Parser.parse(
      """CREATE TABLE S.AVNOW (
        |  K BIGINT NOT NULL,
        |  V VARCHAR(10)
        |);""".stripMargin).tables.head
    val out = Files.createTempDirectory("iceberg_avnow").toString
    val ckpt = Files.createTempDirectory("iceberg_avnow_ckpt").toString
    def df(ks: Range) = {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("K", LongType, nullable = false),
        StructField("V", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(ks.map(k =>
          org.apache.spark.sql.Row(k.toLong, s"v$k")), 1), schema)
    }
    SchemaTranslator.migrateTable(df(1 to 3), table, out)
    SchemaTranslator.appendIncrement(df(4 to 6), table, out)
    SchemaTranslator.appendIncrement(df(7 to 9), table, out)
    // a staged (unpublished) WAP batch must not surface in the catch-up
    SchemaTranslator.stageAppendToBranch(df(90 to 91), table, out, "wap")

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    def runOnce(): Unit = {
      // the WAP staging conf is a WRITE-side guard; a bounded catch-up
      // READ under it must still work (and still see only main)
      spark.conf.set("graft.wap.branch", "wap")
      try {
        val q = spark.readStream.format("graft-iceberg").load(out)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.select("K").collect().foreach(r => seen.add(r.getLong(0)))
            ()
          }.start()
        // AvailableNow must terminate BY ITSELF once caught up
        assert(q.awaitTermination(120000),
          "AvailableNow run did not terminate after draining the backlog")
      } finally spark.conf.unset("graft.wap.branch")
    }
    runOnce()
    assert(seen.iterator().asScala.toSeq.sorted === (1L to 9L),
      "catch-up = the full committed history, staged branch excluded")
    // stream total == the batch read of the same table
    val batch = graft.sources.IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).toSeq
    assert(seen.iterator().asScala.toSeq.sorted === batch.sorted)

    // new commits while the stream is DOWN: the next bounded run
    // drains exactly them, then terminates again
    SchemaTranslator.appendIncrement(df(10 to 12), table, out)
    runOnce()
    assert(seen.iterator().asScala.toSeq.sorted === (1L to 12L),
      "second AvailableNow run must drain only the new commits")
  }

  test("session_window batch agg: gap merge semantics") {
    import spark.implicits._
    val data = Seq(
      UserEvent(1, ts(0), "a", 1.0), UserEvent(1, ts(10), "b", 1.0), // same session
      UserEvent(1, Timestamp.valueOf("2024-01-01 11:00:00"), "c", 1.0), // new session (50m gap)
      UserEvent(2, ts(5), "a", 1.0))
    val out = StreamingOps.sessionAgg(data.toDF(), "30 minutes").collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    assert(byUser(1L).length === 2)
    assert(byUser(2L).length === 1)
    val first = byUser(1L).minBy(_.getAs[Timestamp]("session_start").getTime)
    assert(first.getAs[Long]("n_events") === 2)
  }
}
