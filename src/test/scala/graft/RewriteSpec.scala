package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** The HofDotRewrite optimizer rule: fires on the declarative
  * aggregate(zip_with) dot product, never changes results — including
  * the HOF corner semantics (length mismatch, null elements). */
class RewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("rewrite-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.api.GraftExtensions.register(s)
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("rule rewrites the HOF dot to the native expression") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(10)
    val df = emb.select(hofDot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("hofvectordot"),
      "expected the native rewrite in:\n" + optimized.take(2000))
    assert(!optimized.contains("aggregate("),
      "interpreted HOF fold should be gone:\n" + optimized.take(2000))
  }

  test("float-product fold is NOT rewritten (float rounding differs from the native double product)") {
    // (x, y) -> x * y on array<float> multiplies in FLOAT and widens
    // the rounded product; HofVectorDot multiplies in double. The rule
    // must leave this form alone or it silently changes low bits.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(10)
    val floatFold = emb.select(
      aggregate(
        zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = floatFold.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("hofvectordot"),
      "uncast float product must not be rewritten:\n" + optimized.take(2000))
    // and the guarded form still evaluates (no behavior change)
    assert(floatFold.collect().length === 10)
  }

  test("rewritten results are bit-identical to the interpreted fold") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(40)
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b)
    val rewritten = pairs
      .select(col("i"), col("j"), hofDot(col("va"), col("vb")).as("d"))
      .orderBy("i", "j").collect().map(_.toString).toSeq
    // reference: same fold with the rule disabled on a sibling session
    val plain = spark.newSession()
    val a2 = plain.read.parquet(s"$dir/embeddings.parquet").limit(40)
      .select(col("vec_id").as("i"), col("embedding").as("va"))
    val b2 = plain.read.parquet(s"$dir/embeddings.parquet").limit(40)
      .select(col("vec_id").as("j"), col("embedding").as("vb"))
    val reference = a2.crossJoin(b2)
      .select(col("i"), col("j"), hofDot(col("va"), col("vb")).as("d"))
      .orderBy("i", "j").collect().map(_.toString).toSeq
    assert(rewritten === reference)
    assert(rewritten.nonEmpty)
  }

  test("corner semantics preserved: length mismatch and null element → null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),         // 11.0
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),               // length mismatch → null
      (3L, Seq(1.0f), Seq(2.0f))                      // 2.0
    ).toDF("id", "a", "b")
      .unionByName(Seq((4L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
        .toDF("id", "a", "b")) // null element → null
      // repartition keeps ConvertToLocalRelation from pre-evaluating the
      // projection, so the assertion sees the rewritten expression
      .repartition(2)
    val out = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
    assert(out.queryExecution.optimizedPlan.toString.toLowerCase.contains("hofvectordot"))
    val got = out.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("d")).map(_.doubleValue)).toMap
    assert(got === Map(1L -> Some(11.0), 2L -> None, 3L -> Some(2.0), 4L -> None))
  }

  test("rule leaves non-dot aggregates alone") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "a")
      .select(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("sumsq"))
    assert(!df.queryExecution.optimizedPlan.toString.toLowerCase.contains("hofvectordot"))
    assert(df.collect().head.getDouble(0) === 14.0)
  }
}
