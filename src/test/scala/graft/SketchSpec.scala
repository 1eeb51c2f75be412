package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FixtureQueries

/** Approximate aggregates stay inside their error bounds against the
  * exact values (the rows-only q38 query's correctness story). */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("sketch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val dir = "/root/testdata/sf0.01"

  test("approx distinct within 3×rsd; approx median within 1% of exact") {
    val approx = FixtureQueries.q38Sketches(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, (d, m)) <- exact) {
      val ad = approx(flag).getAs[Long]("approx_orders").toDouble
      val am = approx(flag).getAs[Double]("approx_median")
      assert(math.abs(ad - d) / d <= 0.06, s"$flag: approx distinct $ad vs exact $d")
      assert(math.abs(am - m) / m <= 0.01, s"$flag: approx median $am vs exact $m")
    }
  }
}
