package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NearestCentroid, SparseWeightDot, TokenWindowHashes}

/** Parity specs for the r16 optimization round's native expressions
  * and driver-side helpers: each one replaced an interpreted-HOF or
  * plan-side formulation inside an operator, so the equivalences the
  * rewrites rely on are pinned here against the ORIGINAL built-in
  * formulations on adversarial inputs. */
class OptimizedExprSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("optimized-expr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("TokenWindowHashes: count/order match the HOF window formulation, " +
      "equal windows hash equal, distinct windows hash distinct") {
    import spark.implicits._
    val texts = Seq(
      "a b c d e",                      // plain
      "a  b   c d e",                   // runs of spaces (empty tokens drop)
      " a b c ",                        // leading/trailing spaces
      "A b a B a b A",                  // case-sensitive duplicates
      "short",                          // fewer than k tokens
      "",                               // empty
      "x x x x x x"                     // all-equal tokens
    ).toDF("text")
    val k = 3
    // the original formulation: stride-1 k-token window STRINGS over
    // Chunking.tokens (split on " ", empties dropped, case kept)
    val w = graft.operators.Chunking.tokens(col("text"))
    val hof = texts.select(
      when(size(w) >= k,
        transform(sequence(lit(1), size(w) - (k - 1)),
          i => concat_ws(" ", slice(w, i, lit(k)))))
        .otherwise(array().cast("array<string>")).as("wins"),
      TokenWindowHashes(col("text"), k).as("hashes"))
    hof.collect().foreach { r =>
      val wins = r.getSeq[String](0)
      val hs = r.getSeq[Long](1)
      assert(hs.length === wins.length, s"window count for ${r}")
      // equal window text <=> equal hash, in order
      val byText = wins.zip(hs).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      byText.foreach { case (txt, hset) =>
        assert(hset.size === 1, s"same window '$txt' must hash equal")
      }
      assert(byText.values.flatten.toSet.size === byText.size,
        "distinct windows must hash distinct on this fixture")
      // order: positions of equal windows line up
      wins.zipWithIndex.foreach { case (txt, i) =>
        assert(byText(txt).head === hs(i))
      }
    }
  }

  test("SparseWeightDot: bit-identical to the interpreted " +
      "aggregate(zip_with(...)) fold, including corner cases") {
    import spark.implicits._
    val rows = Seq(
      (Seq(0, 2, 5), Seq(1.5, -2.25, 0.125)),      // in/out of range mix
      (Seq(4, 4, 4), Seq(0.1, 0.2, 0.3)),          // repeated bucket
      (Seq.empty[Int], Seq.empty[Double]),         // empty features
      (Seq(0, 1, 2), Seq(1e300, -1e300, 1.0)),     // order-sensitive sum
      (Seq(7, 8), Seq(3.0, 4.0))                   // fully out of range
    ).toDF("bs", "vs")
    val w = Seq(0.25, -1.0, 3.5, 0.0, 2.0)         // length 5
    val warr = typedlit(w)
    val got = rows.select(
      SparseWeightDot(col("bs"), col("vs"), warr).as("native"),
      aggregate(
        zip_with(col("bs"), col("vs"),
          (b, v) => v * coalesce(get(warr, b), lit(0.0))),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    got.foreach { r =>
      val n = r.getDouble(0)
      val h = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(n) ===
        java.lang.Double.doubleToRawLongBits(h),
        s"native $n != hof $h (must be bit-identical)")
    }
    // length mismatch -> null (the zip_with padding corner)
    val bad = Seq((Seq(0, 1), Seq(1.0))).toDF("bs", "vs")
      .select(SparseWeightDot(col("bs"), col("vs"), warr).as("d")).collect()
    assert(bad.head.isNullAt(0))
  }

  test("NearestCentroid: identical to the declarative crossJoin + " +
      "min(struct(d2, cid, ...)) argmin, including ties and short vectors") {
    import spark.implicits._
    import graft.functions.VectorFunctions.dotNative
    // centroids engineered for ties: c1 == c3 exactly (tie -> lower
    // cid), c2 close; float corpus vectors exercise the widen path;
    // a short vector exercises the min-length dot contract.
    val cents: Array[Array[Double]] = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.5, -0.25),
      Array(1.0, 0.0, 0.0, 0.0),   // duplicate of c1 -> always ties
      Array(-1.0, 2.0, 0.125, 3.5))
    val cids = Array(1, 2, 3, 4)
    val cn2 = cents.map(_.map(x => x * x).sum)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (3L, Seq(-0.1f, 2.1f, 0.13f, 3.4f)),
      (4L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),    // equidistant from c1/c3
      (5L, Seq(1.5f, -2.5f)),               // shorter than centroids
      (6L, Seq(0.1f, 0.9f, 0.45f, -0.2f, 9.9f)) // longer than centroids
    ).toDF("id", "vecf")
      .select(col("id"), col("vecf").as("vec"),
        dotNative(col("vecf"), col("vecf")).as("n2"))
    // the ORIGINAL declarative formulation (pre-r16 Ivf.nearest n=1)
    val centsDF = cents.zipWithIndex.map { case (v, i) => (i + 1, v.toSeq) }
      .toSeq.toDF("cid", "c_vec")
      .withColumn("c_n2", dotNative(col("c_vec"), col("c_vec")))
    val declarative = corpus.crossJoin(broadcast(centsDF))
      .select(col("id"), col("cid"),
        (col("n2") - lit(2.0) * dotNative(col("vec"), col("c_vec")) +
          col("c_n2")).as("d2"))
      .groupBy("id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = corpus
      .select(col("id"), NearestCentroid(col("vec"), cents, cids, cn2).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native === declarative)
    // the duplicate-centroid ties must have resolved to cid 1, not 3
    assert(native(1L) === 1 && native(4L) === 1)
  }

  test("VersionedIndex.bucketOfLocal: bit-identical to the plan-side " +
      "pmod(xxhash64(term), n) the index writers partition by") {
    import spark.implicits._
    val terms = Seq("the", "quick", "straße", "東京", "", "a b", "UPPER",
      "emoji🙂", "ends.", "123")
    for (n <- Seq(16, 64)) {
      val plan = terms.toDF("t")
        .select(col("t"), pmod(xxhash64(col("t")), lit(n.toLong)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      terms.foreach { t =>
        assert(VersionedIndex.bucketOfLocal(t, n) === plan(t),
          s"bucket mismatch for '$t' at n=$n")
      }
    }
  }
}
