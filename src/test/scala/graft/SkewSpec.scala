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
