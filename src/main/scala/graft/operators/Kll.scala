package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016) — the
  * MERGEABLE bounded-size face of [[Quantiles.exactQuantiles]], and the
  * missing member of the sketch family (count-min for frequency, HLL
  * for distinct, KLL for rank). The exact two-level histogram answers
  * "the quantile of THIS table"; the sketch answers the questions the
  * histogram can't at 100 TB: per-partition profiles that roll up
  * along any hierarchy (shard → source → corpus) without re-scanning,
  * incremental daily profiles merged over a year, and one-pass
  * telemetry where a second selection pass is unaffordable.
  *
  * Scale shape — the mergeable-sketch contract (same as count-min /
  * the IVF centroid table): every partition folds its rows into one
  * O(k)-sized sketch per group ([[ArrayBuffer]] levels, weight 2^i at
  * level i), the shuffle moves #groups · #partitions sketches of a few
  * KB each (NOT rows), and per-group merge is associative. No stage
  * ever holds more than O(k · log(n/k)) values per group.
  *
  * Determinism: compaction uses deterministic offset alternation per
  * level instead of the paper's coin flip (the randomness only
  * de-correlates adversarial inputs; the empirical rank error is
  * asserted in SketchSpec). Two regimes:
  *  - k ≥ n (group size): NO compaction ever fires — the sketch holds
  *    every value at weight 1 and `quantile(p)` is EXACTLY the value
  *    at rank ⌊p·(n−1)⌋, independent of partitioning and merge order.
  *    This degenerate-exact mode carries q96's DuckDB oracle (the
  *    q60_indexed_probe pattern: the registered query pins the machine
  *    end-to-end; production parameters are strictly cheaper).
  *  - k ≪ n: results depend on merge order (rows-only territory), but
  *    the normalized rank error stays O(1/k) — SketchSpec asserts the
  *    bound on a 50k-value corpus at k=200 for both the sequential and
  *    the Spark-partitioned build.
  */
final class KllDoubleSketch(val k: Int) extends Serializable {
  require(k >= 8, s"k must be >= 8, got $k")

  // levels(i) holds items of weight 2^i; level 0 is the update buffer.
  private var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  // per-level deterministic compaction offset (flipped each compaction)
  private var offsets: ArrayBuffer[Boolean] = ArrayBuffer(false)
  private var nTotal: Long = 0L

  def n: Long = nTotal

  def update(v: Double): Unit = {
    levels(0) += v
    nTotal += 1
    compress()
  }

  /** Fold `other` in (associative up to compaction order). Both
    * sketches must share `k` — a silent mixed-k merge would weaken the
    * O(1/k) rank-error bound and break the degenerate-exact-mode
    * guarantee q96 relies on (deserialize restores k, so mismatches
    * are always detectable). */
  def merge(other: KllDoubleSketch): this.type = {
    require(other.k == k,
      s"cannot merge KLL sketches with different k: $k vs ${other.k}")
    var i = 0
    while (i < other.levels.length) {
      grow(i)
      levels(i) ++= other.levels(i)
      i += 1
    }
    nTotal += other.nTotal
    compress()
    this
  }

  /** Value at rank ⌊p·(n−1)⌋ of the weighted item set (exact when no
    * compaction has fired; otherwise rank error O(n/k)). */
  def quantile(p: Double): Double = quantiles(Seq(p)).head

  /** One weighted sort answers all requested quantiles. */
  def quantiles(ps: Seq[Double]): Seq[Double] = {
    require(nTotal > 0, "quantile of an empty sketch")
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    ps.map { p =>
      require(p >= 0.0 && p <= 1.0, s"quantile p out of [0,1]: $p")
      val r = math.floor(p * (nTotal - 1).toDouble).toLong
      var cum = 0L
      var j = 0
      var out = sorted.last._1
      var found = false
      while (j < sorted.length && !found) {
        cum += sorted(j)._2
        if (cum > r) { out = sorted(j)._1; found = true }
        j += 1
      }
      out
    }
  }

  private def grow(i: Int): Unit =
    while (i >= levels.length) { levels += ArrayBuffer.empty; offsets += false }

  // capacity schedule: top level gets k, lower levels shrink by (2/3)^d
  // (the paper's c = 2/3), floored at 8.
  private def capacity(i: Int): Int = {
    val d = levels.length - 1 - i
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, d.toDouble)).toInt)
  }

  private def compress(): Unit = {
    var guard = 0
    while (levels.iterator.map(_.length.toLong).sum >
        (0 until levels.length).iterator.map(capacity(_).toLong).sum &&
        guard < 64) {
      val i = levels.indices.find(j => levels(j).length >= capacity(j))
        .getOrElse(levels.indices.maxBy(levels(_).length))
      compactLevel(i)
      guard += 1
    }
  }

  /** Halve level i into level i+1: sort, promote every other item
    * (deterministic alternating offset). An odd buffer keeps one
    * unpaired item behind at level i — which END it keeps alternates
    * with the same bit, so neither tail accumulates bias. Total weight
    * is preserved exactly, so Σ weights == n always. */
  private def compactLevel(i: Int): Unit = {
    val buf = levels(i)
    if (buf.length < 2) return
    val sorted = buf.sorted
    val off = if (offsets(i)) 1 else 0
    offsets(i) = !offsets(i)
    grow(i + 1)
    val odd = sorted.length % 2 == 1
    val (body, keep) =
      if (!odd) (sorted, None)
      else if (off == 1) (sorted.drop(1), Some(sorted.head))
      else (sorted.dropRight(1), Some(sorted.last))
    val next = levels(i + 1)
    var j = off
    while (j < body.length) { next += body(j); j += 2 }
    levels(i) = ArrayBuffer.empty ++ keep
  }

  def serialize: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(nTotal)
    out.writeInt(levels.length)
    levels.indices.foreach { i =>
      out.writeBoolean(offsets(i))
      out.writeInt(levels(i).length)
      levels(i).foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllDoubleSketch {
  def deserialize(bytes: Array[Byte]): KllDoubleSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KllDoubleSketch(in.readInt())
    val nT = in.readLong()
    val nLevels = in.readInt()
    sk.levels.clear(); sk.offsets.clear()
    (0 until nLevels).foreach { _ =>
      sk.offsets += in.readBoolean()
      val len = in.readInt()
      val buf = new ArrayBuffer[Double](len)
      (0 until len).foreach(_ => buf += in.readDouble())
      sk.levels += buf
    }
    sk.nTotal = nT
    sk
  }
}

object Kll {

  /** Per-group quantiles through the sketch: map-side one sketch per
    * (partition, group), shuffle only serialized sketches, associative
    * per-group merge, one weighted selection per group at the end.
    * Output: (groupCol, <one column per ps name>, n) — the
    * [[Quantiles.exactQuantiles]] surface, so the two faces swap
    * freely.
    *
    * `groupCol` must be string-typed (the documents/lang shape); the
    * value column is cast to double, nulls excluded (n counts non-null
    * rows — quantile-over-non-null semantics, same as the exact op).
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, Double)], k: Int = 200): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .as[(String, Double)]
    val partials = pairs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, KllDoubleSketch]
      it.foreach { case (g, v) =>
        m.getOrElseUpdate(g, new KllDoubleSketch(k)).update(v)
      }
      m.iterator.map { case (g, sk) => (g, sk.serialize) }
    }
    val pVals = ps.map(_._2)
    val merged = partials.groupByKey(_._1).mapGroups { (g, it) =>
      val sk = it.map(t => KllDoubleSketch.deserialize(t._2))
        .reduce((a, b) => a.merge(b))
      (g, sk.quantiles(pVals).toArray, sk.n)
    }
    val out = merged.toDF("g", "qs", "n")
    out.select(
      (col("g").as(groupCol) +:
        ps.zipWithIndex.map { case ((nm, _), i) =>
          col("qs").getItem(i).as(nm)
        }) :+ col("n"): _*)
  }
}
