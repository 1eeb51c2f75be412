package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** Unit tests for the as-of and bucketed range join operators. */
class JoinOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("join-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("as-of join: latest prior payload, <= tie, null when no prior row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "a"), // after right rows at 5 and 10 → 10 wins (<=)
      (1L, 7L, "b"),  // after 5 only
      (1L, 3L, "c"),  // before everything → null
      (2L, 100L, "d") // key with no right rows at all → null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 5L, 50.0),
      (1L, 10L, 99.0),
      (1L, 20L, 1.0) // in the future of every left row
    ).toDF("k", "ts", "pay")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("pay"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("pay")).map(_.doubleValue)).toMap
    assert(got === Map("a" -> Some(99.0), "b" -> Some(50.0), "c" -> None, "d" -> None))
  }

  test("as-of join: a matching right row with NULL payload wins atomically") {
    // ASOF semantics: the latest prior right ROW wins, even when its
    // payload VALUE is null — an older non-null row must not leak
    // through, and multiple payload columns must come from the SAME
    // right row (no cross-row stitching).
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
    val right = Seq(
      (1L, 5L, Option("a"), Option("x")),
      (1L, 15L, Option.empty[String], Option("y"))
    ).toDF("k", "ts", "v1", "v2")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v1", "v2"))
      .orderBy("ts").collect()
    // ts=10 → right@5: ("a","x")
    assert(got(0).getAs[String]("v1") === "a" && got(0).getAs[String]("v2") === "x")
    // ts=20 → right@15: (null,"y") — v1 must be NULL, not the stale "a"
    assert(got(1).isNullAt(got(1).fieldIndex("v1")),
      s"null payload of the winning row must be preserved, got ${got(1)}")
    assert(got(1).getAs[String]("v2") === "y")
  }

  test("as-of join: matches a nested-loop range-join reference on events") {
    // events MUST come through the shared helper — it owns the ts
    // normalization for whatever schema the fixture generation used.
    // Reading the parquet directly here has broken twice across
    // fixture regenerations (nanos-long era, then TIMESTAMP_NTZ era).
    val e = graft.operators.FixtureQueries.events(spark, "/root/testdata/sf0.001")
      .withColumn("us", unix_micros(col("ts")))
    val l = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"))
    val r = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("us"))
      .agg(max_by(col("value"), col("event_id")).as("pay"))
    val viaOp = AsOfJoin.backward(l, r, Seq("user_id"), "us", "us", Seq("pay"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    // reference: left outer range join, then max-ts right row per left row
    val rr = r.select(col("user_id").as("r_uid"), col("us").as("r_us"), col("pay"))
    val viaJoin = l.join(rr,
        l("user_id") === col("r_uid") && col("r_us") <= l("us"), "left")
      .groupBy("user_id", "us", "event_id")
      .agg(max_by(col("pay"), col("r_us")).as("pay"))
      .select(l.columns.map(col) :+ col("pay"): _*)
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(viaOp === viaJoin)
    assert(viaOp.nonEmpty)
  }

  test("range join: inclusive start, exclusive end, bucket-boundary spans") {
    import spark.implicits._
    val points = Seq(
      (1L, 0L), (1L, 9L), (1L, 10L), (1L, 15L), (1L, 25L),
      (2L, 12L) // other key
    ).toDF("k", "x").withColumnRenamed("x", "p")
    val intervals = Seq(
      (1L, 0L, 10L),   // [0,10): catches 0, 9 — not 10
      (1L, 9L, 26L),   // [9,26): catches 9, 10, 15, 25 — spans 3 buckets at w=10
      (1L, 30L, 30L),  // empty → dropped
      (2L, 10L, 13L)   // catches (2,12)
    ).toDF("k", "s", "e")
    val got = RangeJoin.pointsInIntervals(points, intervals, Seq("k"), "p", "s", "e",
        bucketWidth = 10L)
      .select("k", "p", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 0L, 0L), (1L, 9L, 0L),
      (1L, 9L, 9L), (1L, 10L, 9L), (1L, 15L, 9L), (1L, 25L, 9L),
      (2L, 12L, 10L)))
  }

  test("as-of join: randomized inputs match an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nl = rnd.nextInt(40)
      val nr = rnd.nextInt(40)
      val left = (0 until nl).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(60).toLong, i.toLong))
      val right0 = (0 until nr).map(_ =>
        (rnd.nextInt(4).toLong, rnd.nextInt(60).toLong, rnd.nextInt(1000).toDouble))
      // contract: right unique per (key, ts)
      val right = right0.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = left.map { case (k, ts, id) =>
        val cand = right.filter(r => r._1 == k && r._2 <= ts)
        (id, if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      val got = AsOfJoin.backward(
          left.toDF("k", "ts", "id"), right.toDF("k", "ts", "pay"),
          Seq("k"), "ts", "ts", Seq("pay"))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Double]("pay")).map(_.doubleValue)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("range join: randomized inputs match an in-memory reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val np = rnd.nextInt(40)
      val ni = rnd.nextInt(25)
      val width = 1L + rnd.nextInt(20)
      val points = (0 until np).map(i =>
        (rnd.nextInt(3).toLong, rnd.nextInt(100).toLong, i.toLong))
      val intervals = (0 until ni).map(i => {
        val s = rnd.nextInt(100).toLong
        (rnd.nextInt(3).toLong, s, s + rnd.nextInt(30) - 2, i.toLong) // some empty
      })
      val expected = (for {
        (pk, p, pid) <- points
        (ik, s, e, iid) <- intervals
        if ik == pk && p >= s && p < e
      } yield (pid, iid)).toSet
      val got = RangeJoin.pointsInIntervals(
          points.toDF("k", "p", "pid"),
          intervals.toDF("k", "s", "e", "iid"),
          Seq("k"), "p", "s", "e", width)
        .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iid"))).toSet
      assert(got === expected, s"trial $trial (width=$width)")
    }
  }

  test("range join: bucketed equals naive inequality join on events") {
    // shared helper, not a direct read — see the as-of test above
    val e = graft.operators.FixtureQueries.events(spark, "/root/testdata/sf0.001")
      .withColumn("us", unix_micros(col("ts")))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("us"))
    val w = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("ws"), (col("us") + 3600000000L).as("we"))
    val bucketed = RangeJoin.pointsInIntervals(v, w, Seq("user_id"), "us", "ws", "we",
        bucketWidth = 3600000000L)
      .select("user_id", "event_id", "ws").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = v.join(w, v("user_id") === w("user_id") &&
        col("us") >= col("ws") && col("us") < col("we"))
      .select(v("user_id"), col("event_id"), col("ws")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }
}
