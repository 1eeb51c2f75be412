package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata.
  * The schema every media table shares in this engine. */
final case class MediaAsset(
    asset_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    source: String)

/** Decoded (stubbed) media metadata. */
final case class MediaMeta(
    asset_id: Long,
    media_type: String,
    source: String,
    n_bytes: Long,
    header: Int,
    checksum: Long,
    width: Int,
    height: Int)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Design per the builder brief: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run batch-wise in `mapPartitions` (the Scala analogue
  * of `mapInPandas` — one iterator per partition, amortized per-batch
  * setup). Real codecs aren't available in this container, so
  * [[decodeStub]] is a clearly-marked deterministic FAKE that parses a
  * synthetic header; the Spark-side plumbing — schema, partitioning,
  * batch iteration, pushdown-friendly metadata extraction — is real
  * and tested.
  *
  * At 100 TB: payloads dominate storage, so every transform keeps
  * metadata extraction SEPARATE from payload movement — filters on
  * width/height/type run on the (tiny) metadata columns and prune
  * parquet row groups before any payload byte is read.
  */
object Multimodal {

  /** STUB decode — deterministic fake standing in for an image/audio
    * decoder (no codec libraries in this environment). "Header" is the
    * first 4 bytes big-endian; fake dimensions derive from payload
    * bytes; checksum is a real polynomial over the payload. The
    * per-partition iterator shape is exactly what a real decoder
    * (libjpeg/ffmpeg via JNI) would use. */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { a =>
        val p = a.payload
        val header =
          if (p.length >= 4)
            ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) | ((p(2) & 0xff) << 8) | (p(3) & 0xff)
          else 0
        var crc = 1469598103934665603L // FNV-1a offset basis (public constant)
        var i = 0
        while (i < p.length) { crc = (crc ^ (p(i) & 0xffL)) * 1099511628211L; i += 1 }
        MediaMeta(
          asset_id = a.asset_id,
          media_type = a.media_type,
          source = a.source,
          n_bytes = p.length.toLong,
          header = header,
          checksum = crc,
          width = 16 + math.floorMod(header, 1920),
          height = 16 + math.floorMod(header >> 8, 1080))
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * (a video's frame-sample analogue), exploded to one row per frame.
    * Columnar — no UDF; the payload is sliced lazily. */
  def frameSample(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    assets
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("frame_idx"), col("frame"))
  }

  /** STUB resize — deterministic fake standing in for an image resize
    * (no codec libraries in this environment): keeps every k-th payload
    * byte so the output byte count scales with the target/source pixel
    * ratio, and rewrites the metadata to the target dimensions. The
    * shape is the real one: a payload→payload map running batch-wise in
    * the partition iterator, metadata updated in the same pass. */
  def resizeStub(metaWithPayload: Dataset[(MediaMeta, Array[Byte])],
      targetW: Int, targetH: Int): Dataset[(MediaMeta, Array[Byte])] = {
    import metaWithPayload.sparkSession.implicits._
    metaWithPayload.mapPartitions { it =>
      // per-partition setup would allocate the scaler once here
      it.map { case (m, p) =>
        val ratio = (targetW.toLong * targetH).toDouble /
          math.max(1L, m.width.toLong * m.height)
        val outLen = math.max(1, math.min(p.length, (p.length * ratio).toInt))
        val step = math.max(1, p.length / outLen)
        val out = new Array[Byte](if (p.length == 0) 0 else (p.length + step - 1) / step)
        var i = 0; var j = 0
        while (i < p.length && j < out.length) { out(j) = p(i); i += step; j += 1 }
        (m.copy(width = targetW, height = targetH, n_bytes = out.length.toLong), out)
      }
    }
  }

  /** Feature extraction: payload → fixed-dim L2-normalized float vector
    * (folded byte histogram). Unlike the decode/resize stubs this is a
    * REAL computable featurizer — deterministic, content-sensitive —
    * with the exact output shape of an embedding model, so the result
    * plugs directly into [[Similarity]]/[[Ivf]]: the full
    * media → features → ANN pipeline runs end-to-end in this engine. */
  def featureExtract(assets: Dataset[MediaAsset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val h = new Array[Float](dim)
        var i = 0
        while (i < a.payload.length) {
          h((a.payload(i) & 0xff) % dim) += 1f
          i += 1
        }
        var n2 = 0.0
        i = 0
        while (i < dim) { n2 += h(i).toDouble * h(i); i += 1 }
        if (n2 > 0) {
          val inv = (1.0 / math.sqrt(n2)).toFloat
          i = 0
          while (i < dim) { h(i) *= inv; i += 1 }
        }
        (a.asset_id, h)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Build a synthetic media-asset table from the documents fixture
    * (text bytes as payload) — the container has no real media, but the
    * binary-column path is identical. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("source"))
      .as[MediaAsset]
  }
}
