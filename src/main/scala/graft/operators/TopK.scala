package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate for top-k selection. */
final case class Scored(id: Long, score: Double)

/** Spark-SQL double ordering for scores: NaN sorts as the LARGEST
  * value (like Spark's ORDER BY) and -0.0 equals 0.0 — plain `>`/`==`
  * would make NaN incomparable (every comparison false), leaving a
  * NaN candidate's rank dependent on arrival order across partitions
  * and diverging from the window row_number form. */
private[operators] object ScoreOrder {
  def cmp(a: Double, b: Double): Int = {
    val na = if (a == 0.0) 0.0 else a // normalize -0.0 (NaN unaffected)
    val nb = if (b == 0.0) 0.0 else b
    java.lang.Double.compare(na, nb) // NaN > everything, NaN == NaN
  }
}

/** Encodable buffer/output roots (Spark's product encoders need a
  * concrete Product at the root, not a bare collection). */
final case class TopKBuffer(values: List[Scored])
final case class TopKResult(values: Seq[Scored])

/** Bounded top-k typed Aggregator (SURVEY.md §2.11's deferred
  * `Aggregator` — added because it is the scale-correct top-k shape).
  *
  * Why not `Window.orderBy + row_number <= k`: the window form sorts
  * EVERY candidate of a key on the reduce side. This Aggregator keeps
  * only k elements per key at all times and — crucially — runs as a
  * partial aggregation: each map task reduces its partition to ≤k
  * candidates per key before the shuffle, so at 1000 executors the
  * exchange carries O(keys·k), not O(candidates).
  *
  * Ordering contract matches the ANN queries: score descending, id
  * ascending on ties — the merged output equals the window form's.
  * k is small, so a sorted-list insert beats heap constants.
  */
abstract class TopKAggregatorBase[IN](k: Int)
    extends Aggregator[IN, TopKBuffer, TopKResult] {

  protected def toScored(row: IN): Scored

  private def better(a: Scored, b: Scored): Boolean = {
    val c = ScoreOrder.cmp(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def insert(buf: List[Scored], x: Scored): List[Scored] = {
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: TopKBuffer = TopKBuffer(Nil)
  override def reduce(buf: TopKBuffer, row: IN): TopKBuffer =
    TopKBuffer(insert(buf.values, toScored(row)))
  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer(b.values.foldLeft(a.values)(insert))
  override def finish(buf: TopKBuffer): TopKResult = TopKResult(buf.values)
  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}

class TopKAggregator(k: Int) extends TopKAggregatorBase[(Long, Long, Double)](k) {
  override protected def toScored(row: (Long, Long, Double)): Scored =
    Scored(row._2, row._3)
}

/** [[TopKAggregator]] over string-keyed rows (key unused in the
  * buffer — it is the grouping key). */
class TopKAggregatorS(k: Int) extends TopKAggregatorBase[(String, Long, Double)](k) {
  override protected def toScored(row: (String, Long, Double)): Scored =
    Scored(row._2, row._3)
}

/** [[Scored]] with a string id (terms, domains, urls). */
final case class ScoredS(id: String, score: Double)
final case class TopKBufferS(values: List[ScoredS])
final case class TopKResultS(values: Seq[ScoredS])

/** [[TopKAggregatorBase]] for string-identified candidates — same
  * bounded buffer and ordering contract (score desc, id asc on ties,
  * here by binary UTF-8 string order, matching both Spark's and
  * DuckDB's default string comparison). Java's `String` compareTo is
  * UTF-16 code-unit order, which diverges from UTF-8 byte order for
  * supplementary-plane ids (emoji, rare CJK) — ties go through
  * UTF8String.binaryCompare so the aggregator agrees with the window
  * row_number form on ANY id. */
class TopKAggregatorStr(k: Int)
    extends Aggregator[(String, String, Double), TopKBufferS, TopKResultS] {

  private def insert(buf: List[ScoredS], x: ScoredS): List[ScoredS] = {
    // convert the incoming id ONCE per insert — doing it inside the
    // span predicate re-encodes it for every buffered element
    val xU = org.apache.spark.unsafe.types.UTF8String.fromString(x.id)
    def beforeX(a: ScoredS): Boolean = {
      val c = ScoreOrder.cmp(a.score, x.score)
      c > 0 || (c == 0 &&
        org.apache.spark.unsafe.types.UTF8String.fromString(a.id).binaryCompare(xU) < 0)
    }
    val (front, back) = buf.span(beforeX)
    val merged = front ::: x :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: TopKBufferS = TopKBufferS(Nil)
  override def reduce(buf: TopKBufferS, row: (String, String, Double)): TopKBufferS =
    TopKBufferS(insert(buf.values, ScoredS(row._2, row._3)))
  override def merge(a: TopKBufferS, b: TopKBufferS): TopKBufferS =
    TopKBufferS(b.values.foldLeft(a.values)(insert))
  override def finish(buf: TopKBufferS): TopKResultS = TopKResultS(buf.values)
  override def bufferEncoder: Encoder[TopKBufferS] = Encoders.product[TopKBufferS]
  override def outputEncoder: Encoder[TopKResultS] = Encoders.product[TopKResultS]
}

object TopK {

  /** Per-key top-k over a (key, id, score) DataFrame via the bounded
    * Aggregator. Output matches the window row_number form exactly:
    * (key, rk, id, score) with rk 1..k by score desc, id asc. */
  def perKey(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k)
    scored
      .select(col(keyCol).cast("long").as("key"),
        col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.values.zipWithIndex.map { case (s, i) => (key, i + 1, s.id, s.score) }
      }
      .toDF(keyCol, "rk", idCol, scoreCol)
  }

  /** [[perKey]] for string-typed keys (e.g. lang, domain) — same
    * bounded Aggregator, same O(keys·k) shuffle. */
  def perStringKey(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAggregatorS(k)
    scored
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.values.zipWithIndex.map { case (s, i) => (key, i + 1, s.id, s.score) }
      }
      .toDF(keyCol, "rk", idCol, scoreCol)
  }

  /** [[perStringKey]] with STRING ids (top terms per source, top
    * domains per lang, …): same bounded shape, ties broken by binary
    * string order — identical to `row_number() OVER (ORDER BY score
    * DESC, id)` in both Spark and DuckDB. */
  def perStringKeyStringId(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAggregatorStr(k)
    scored
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("string").as("id"),
        col(scoreCol).cast("double").as("score"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.values.zipWithIndex.map { case (s, i) => (key, i + 1, s.id, s.score) }
      }
      .toDF(keyCol, "rk", idCol, scoreCol)
  }
}
