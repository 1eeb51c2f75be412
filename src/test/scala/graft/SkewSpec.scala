package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Skew-mitigation operators: salted layouts must be result-identical
  * to their plain formulations (only the shuffle layout may differ). */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin equals the plain inner equi-join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val dim = li.select(col("l_returnflag")).distinct()
      .withColumn("lbl", concat(lit("x_"), lower(col("l_returnflag"))))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    val plain = canon(li.join(dim, Seq("l_returnflag")))
    val salted = canon(Skew.saltedJoin(li, dim, Seq("l_returnflag"), 8))
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("range join skew: hot-key candidate fanout tracks local density, " +
      "not the key's total interval count") {
    // A single hot key owning N intervals is the range join's skew
    // hazard: the naive plan (equi-join on the key + range filter)
    // materializes N·M candidate pairs for that key BEFORE filtering.
    // The bucketed plan's documented fanout bound: candidates per
    // point = intervals overlapping its bucket (local density), so
    // total candidates ≈ |matches| when intervals don't stack.
    import spark.implicits._
    val w = 100L
    val intervals = (0 until 2000).map(i => (1L, i * w, i * w + 80L))
      .toDF("user_id", "s", "e")
    val points = (0 until 2000).map(i => (1L, i * w + 50L))
      .toDF("user_id", "p")
    val res = graft.operators.RangeJoin.pointsInIntervals(
      points, intervals, Seq("user_id"), "p", "s", "e", bucketWidth = w)
    assert(res.count() === 2000L) // each point falls in exactly its interval
    // naive key-equi-join fanout for the hot key: 2000 × 2000
    val naive = points.join(intervals, Seq("user_id")).count()
    assert(naive === 4000000L)
    // bucketed candidates (the equi-join on (key, bucket) BEFORE the
    // exact range predicate) — same bucket arithmetic as the operator
    def bk(c: org.apache.spark.sql.Column) = c - pmod(c, lit(w))
    val cand = points.withColumn("__b", bk(col("p")))
      .join(intervals.withColumn("__b",
        explode(sequence(bk(col("s")), bk(col("e") - 1), lit(w)))),
        Seq("user_id", "__b"))
      .count()
    assert(cand === 2000L)       // == matches: zero wasted candidates here
    assert(cand * 1000 <= naive) // ≥1000× below the naive hot-key fanout
  }

  test("saltedAgg equals the plain groupBy aggregation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val salted = Skew.saltedAgg(li, "l_returnflag", 8,
        Seq(col("l_quantity") -> "sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(salted === plain)
  }
}
