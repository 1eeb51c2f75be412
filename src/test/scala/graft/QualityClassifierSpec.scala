package graft

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Pins the distributed logistic-regression quality classifier to a
  * sequential in-JVM reference. q77 hash-checks the integer featurizer
  * against DuckDB; training folds cross-partition double sums, so the
  * trained scorer is pinned with tolerance (not bit equality), the
  * documented discipline for iterative float operators. */
class QualityClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("qc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Buckets = 64

  // ---- sequential reference -------------------------------------------

  private def words(s: String): Seq[String] =
    s.trim.toLowerCase.split(" +").toSeq.filter(_.nonEmpty)

  private def grams(s: String): Seq[String] = {
    val w = words(s)
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** Same arithmetic as Sampling.hashValue: first 32 bits of
    * md5("qc:" + gram) as a long, then mod buckets. */
  private def bucket(g: String): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(("qc:" + g).getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % Buckets).toInt
  }

  private def featMap(s: String): Map[Int, Long] =
    grams(s).groupBy(bucket).map { case (b, o) => b -> o.size.toLong }

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Sequential full-batch GD, same update order as the operator. */
  private def localTrain(docs: Seq[(Long, String, Int)], iters: Int,
      lr: Double): Map[Int, Double] = {
    val feats = docs.map { case (id, t, y) => (id, featMap(t), y) }
    val n = docs.size.toDouble
    var w = Map.empty[Int, Double].withDefaultValue(0.0)
    for (_ <- 1 to iters) {
      val grad = scala.collection.mutable.Map.empty[Int, Double]
        .withDefaultValue(0.0)
      for ((_, f, y) <- feats) {
        val m = f.map { case (b, v) => v.toDouble * w(b) }.sum
        val r = (sigmoid(m) - y.toDouble) / n
        for ((b, v) <- f) grad(b) += v.toDouble * r
      }
      w = (w.keySet ++ grad.keySet)
        .map(b => b -> (w(b) - lr * grad(b))).toMap.withDefaultValue(0.0)
    }
    w
  }

  // ---- fixtures --------------------------------------------------------

  // linearly separable by vocabulary: "good" docs share quality words,
  // "bad" docs share spam words; some length/term variety each side
  private val corpus: Seq[(Long, String, Int)] = Seq(
    (1L, "the report presents thorough analysis of the results", 1),
    (2L, "careful analysis and clear writing support the results", 1),
    (3L, "the study presents clear methods and thorough discussion", 1),
    (4L, "results and analysis are presented with careful discussion", 1),
    (5L, "buy cheap pills now click here free offer", 0),
    (6L, "free offer click now cheap pills buy buy", 0),
    (7L, "click click free cheap offer now here pills", 0),
    (8L, "now buy free cheap click offer pills here now", 0))

  private def docsDf: DataFrame = {
    import spark.implicits._
    corpus.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
  }
  private def labelsDf: DataFrame = {
    import spark.implicits._
    corpus.map { case (id, _, y) => (id, y) }.toDF("doc_id", "label")
  }

  // ---- tests -----------------------------------------------------------

  test("featurizer equals the sequential md5-bucket reference") {
    val got = QualityClassifier
      .features(docsDf, "doc_id", "text", Buckets)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = corpus.flatMap { case (id, t, _) =>
      featMap(t).map { case (b, v) => (id, b) -> v }
    }.toMap
    assert(got === want)
  }

  test("featurizer: docs with <2 tokens emit unigrams only, empty none") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val got = QualityClassifier.features(df, "doc_id", "text", Buckets)
      .groupBy("doc_id").agg(sum("v").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L)) // no phantom bigrams from sequence(1,0)
  }

  test("native GramBuckets featurizer equals the HOF+hashValue formulation " +
      "on unicode, control chars and degenerate whitespace") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "  Multiple   spaces  and  CASE  Mixed  "),
      (2L, "tab\tinside and new\nline stay in-token"),
      (3L, "École ÉLÈVE STRASSE groß İstanbul ßharp"),
      (4L, "汉字 tokens 日本語 mixed with ascii"),
      (5L, "emoji 🎉 and zero​width stay verbatim"),
      (6L, "solo"),
      (7L, "   "),
      (8L, ""),
      (9L, "a b a b a repeated gram mass counts"))
      .toDF("doc_id", "text")
    def toMapOf(df: DataFrame): Map[(Long, Int), Long] = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val native = toMapOf(QualityClassifier.features(nasty, "doc_id", "text", Buckets))
    val hof = toMapOf(QualityClassifier.featuresHof(nasty, "doc_id", "text", Buckets))
    assert(native === hof)
    // and via the SQL registration
    graft.api.GraftExtensions.register(spark)
    nasty.createOrReplaceTempView("gb_docs")
    val viaSql = toMapOf(spark.sql(
      s"""SELECT doc_id, b, count(*) AS v
         |FROM (SELECT doc_id, explode(gram_buckets(text, $Buckets, 'qc:')) AS b
         |      FROM gb_docs)
         |GROUP BY doc_id, b""".stripMargin))
    assert(viaSql === native)
  }

  test("train+score equals the sequential reference within 1e-9") {
    val feats = QualityClassifier.features(docsDf, "doc_id", "text", Buckets)
    val w = QualityClassifier.train(feats, labelsDf, "doc_id",
      iters = 8, lr = 1.0)
    val got = QualityClassifier.score(feats, w, docsDf, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wRef = localTrain(corpus, iters = 8, lr = 1.0)
    for ((id, t, _) <- corpus) {
      val m = featMap(t).map { case (b, v) => v.toDouble * wRef(b) }.sum
      val want = sigmoid(m)
      assert(math.abs(got(id) - want) < 1e-9,
        s"doc $id: got ${got(id)} want $want")
    }
  }

  test("learned gate separates the vocabulary clusters") {
    val feats = QualityClassifier.features(docsDf, "doc_id", "text", Buckets)
    val w = QualityClassifier.train(feats, labelsDf, "doc_id",
      iters = 8, lr = 1.0)
    val probs = QualityClassifier.score(feats, w, docsDf, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((id, _, y) <- corpus)
      assert((probs(id) >= 0.5) === (y == 1),
        s"doc $id (label $y) scored ${probs(id)}")
    // unseen doc from each vocabulary still lands on its side
    import spark.implicits._
    val unseen = Seq((100L, "thorough analysis of the methods"),
      (101L, "cheap free pills click")).toDF("doc_id", "text")
    val uf = QualityClassifier.features(unseen, "doc_id", "text", Buckets)
    val up = QualityClassifier.score(uf, w, unseen, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(up(100L) > 0.5 && up(101L) < 0.5)
  }
}
