package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Pins the distributed stupid-backoff language model to a sequential
  * in-JVM reference. q75 hash-checks the integer lookup layer against
  * DuckDB; this spec pins the float scorer (q76) that folds over those
  * lookups — ln() has no cross-engine oracle, so exact equality against
  * the sequential scorer on the same JVM is the correctness anchor. */
class LanguageModelSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("lm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toks(s: String): Seq[String] =
    s.split(" ").toSeq.filter(_.nonEmpty)

  /** Sequential reference: count tables as plain maps. */
  private def localModel(train: Seq[String])
      : (Map[String, Long], Map[String, Long], Map[String, Long], Long) = {
    def grams(ws: Seq[String], n: Int): Seq[String] =
      ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val ws = train.map(toks).filter(_.nonEmpty)
    def table(n: Int): Map[String, Long] =
      ws.flatMap(grams(_, n)).groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    (table(1), table(2), table(3), ws.map(_.size.toLong).sum)
  }

  /** Sequential stupid-backoff scorer, position order, same double ops
    * as the distributed plan (divide, multiply-by-literal, math.log). */
  private def localScore(doc: String, uni: Map[String, Long],
      bi: Map[String, Long], tri: Map[String, Long], total: Long,
      alpha: Double = 0.4): Option[(Long, Double)] = {
    val w = toks(doc)
    if (w.size < 3) None
    else {
      val lps = (0 to w.size - 3).map { i =>
        val tg = w.slice(i, i + 3).mkString(" ")
        val bg = w.slice(i + 1, i + 3).mkString(" ")
        val ug = w(i + 2)
        val ctxBg = w.slice(i, i + 2).mkString(" ")
        val ctxUg = w(i + 1)
        val s =
          if (tri.contains(tg)) tri(tg).toDouble / bi(ctxBg).toDouble
          else if (bi.contains(bg)) alpha * bi(bg).toDouble / uni(ctxUg).toDouble
          else if (uni.contains(ug)) alpha * alpha * uni(ug).toDouble / total.toDouble
          else alpha * alpha * 0.5 / total.toDouble
        math.log(s)
      }
      Some((lps.size.toLong, lps.sum / lps.size.toDouble))
    }
  }

  private val trainDocs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "a b", // bigram-only contributor
    "dog dog dog")
  private val scoreDocs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog", // all-trigram hits
    2L -> "the quick brown dog runs past the lazy fox",  // mixed backoff
    3L -> "zz yy xx ww vv",                              // all OOV
    4L -> "the quick",                                   // < 3 tokens
    5L -> "dog dog dog dog")

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("backoffStats equals the sequential reference on every column") {
    val (uni, bi, tri, total) = localModel(trainDocs)
    val model = LanguageModel.train(
      df(trainDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }), "text")
    val got = LanguageModel
      .backoffStats(df(scoreDocs), "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(got.length === scoreDocs.size)
    for ((row, (eid, text)) <- got.zip(scoreDocs)) {
      assert(row.getLong(0) === eid)
      val w = toks(text)
      assert(row.getLong(1) === w.size.toLong, "n_tokens")
      val pos = if (w.size >= 3) (0 to w.size - 3).toSeq else Seq.empty
      assert(row.getLong(2) === pos.size.toLong, "n_pos")
      val levels = pos.map { i =>
        val tg = w.slice(i, i + 3).mkString(" ")
        val bg = w.slice(i + 1, i + 3).mkString(" ")
        val ug = w(i + 2)
        if (tri.contains(tg)) (3, tri(tg))
        else if (bi.contains(bg)) (2, bi(bg))
        else if (uni.contains(ug)) (1, uni(ug))
        else (0, 0L)
      }
      assert(row.getLong(3) === levels.count(_._1 == 3).toLong, "n_tri")
      assert(row.getLong(4) === levels.count(_._1 == 2).toLong, "n_bi")
      assert(row.getLong(5) === levels.count(_._1 == 1).toLong, "n_uni")
      assert(row.getLong(6) === levels.count(_._1 == 0).toLong, "n_oov")
      assert(row.getLong(7) === levels.filter(_._1 == 3).map(_._2).sum, "sum_c3")
      assert(row.getLong(8) === levels.filter(_._1 == 2).map(_._2).sum, "sum_c2")
      assert(row.getLong(9) === levels.filter(_._1 == 1).map(_._2).sum, "sum_c1")
    }
    assert(total === 23L) // 9 + 9 + 2 + 3 tokens across the four training docs
  }

  test("avgLogProb is bit-identical to the sequential scorer") {
    val (uni, bi, tri, total) = localModel(trainDocs)
    val model = LanguageModel.train(
      df(trainDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }), "text")
    val got = LanguageModel
      .avgLogProb(df(scoreDocs), "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(got.length === scoreDocs.size)
    for ((row, (eid, text)) <- got.zip(scoreDocs)) {
      assert(row.getLong(0) === eid)
      localScore(text, uni, bi, tri, total) match {
        case None =>
          assert(row.isNullAt(1) && row.isNullAt(2),
            s"doc $eid has <3 tokens, expected null score")
        case Some((nPos, avg)) =>
          assert(row.getLong(1) === nPos)
          val gotAvg = row.getDouble(2)
          assert(java.lang.Double.compare(gotAvg, avg) === 0,
            s"doc $eid: got $gotAvg expected $avg (diff ${gotAvg - avg})")
      }
    }
  }

  test("avgLogProb orders documents: in-domain above shuffled above OOV") {
    val model = LanguageModel.train(
      df(trainDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }), "text")
    val scores = LanguageModel
      .avgLogProb(df(scoreDocs), "doc_id", "text", model)
      .filter(col("avg_logprob").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L), "verbatim training doc must outscore the remix")
    assert(scores(2L) > scores(3L), "any in-vocabulary doc must outscore all-OOV")
  }
}
