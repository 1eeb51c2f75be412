package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins on the DSv2 catalog face: two bucket(16)
  * tables joined on the bucket key must plan with ZERO shuffle
  * exchanges on the table sides (KeyGroupedPartitioning reported by
  * the key-grouped batch scan, `bucket` resolved through the
  * catalog's FunctionCatalog), and the shuffle-free result must equal
  * the exchanged plan's result exactly. Gate fallbacks (deletes
  * present, non-bucket layout, conf off) ride the V1 scan. */
class SpjSpec extends AnyFunSuite {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft_spj_warehouse").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("spj-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.graftspj",
        "graft.sources.v2.GraftIcebergCatalog")
      .config("spark.sql.catalog.graftspj.warehouse", warehouse)
      // the SPJ trio: v2 bucketing on, padding for mismatched
      // partition-value sets, no broadcast short-circuit, AQE off so
      // the asserted plan IS the executed plan
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.api.GraftExtensions)
      .create()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.db")
    s.sql(
      """CREATE TABLE graftspj.db.fact_a (
        |  k BIGINT NOT NULL, va DOUBLE
        |) PARTITIONED BY (bucket(16, k))""".stripMargin)
    s.sql("INSERT INTO graftspj.db.fact_a " +
      "SELECT id AS k, id * 1.5 AS va FROM range(0, 400)")
    s.sql(
      """CREATE TABLE graftspj.db.fact_b (
        |  k BIGINT NOT NULL, vb DOUBLE
        |) PARTITIONED BY (bucket(16, k))""".stripMargin)
    s.sql("INSERT INTO graftspj.db.fact_b " +
      "SELECT id AS k, id * 2.0 AS vb FROM range(200, 600)")
    s
  }

  private val joinSql =
    """SELECT a.k, a.va, b.vb
      |FROM graftspj.db.fact_a a JOIN graftspj.db.fact_b b ON a.k = b.k""".stripMargin

  private def shuffleCount(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size

  test("bucket-aligned join plans shuffle-free and matches the " +
      "exchanged plan's rows exactly") {
    val df = spark.sql(joinSql)
    val plan = df.queryExecution.executedPlan
    assert(shuffleCount(plan) === 0,
      s"expected ZERO exchanges on the bucket-aligned join, got:\n$plan")
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.size === 2, s"both sides must be native batch scans:\n$plan")
    val spj = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)

    // the SAME query through the general (V1, exchanged) path
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val df2 = spark.sql(joinSql)
      assert(shuffleCount(df2.queryExecution.executedPlan) > 0,
        "the fallback plan should exchange (this guards the comparison)")
      val shuffled = df2.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
      assert(spj.toSeq === shuffled.toSeq,
        "shuffle-free and exchanged plans must agree row-for-row")
      assert(spj.length === 200, "join covers the overlapping keyslice")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  test("bucket-aligned AGGREGATION also skips its exchange") {
    // groupBy the bucket key over one table: KeyGroupedPartitioning
    // satisfies the aggregation's clustered distribution too
    val agg = spark.sql(
      "SELECT k, sum(va) AS s FROM graftspj.db.fact_a GROUP BY k")
    assert(shuffleCount(agg.queryExecution.executedPlan) === 0,
      s"group-by-bucket-key should ride the key-grouped partitioning:\n" +
        s"${agg.queryExecution.executedPlan}")
    assert(agg.collect().length === 400)
  }

  test("SPJ holds under AQE: the adaptive final plan still runs the " +
      "bucket-aligned join with zero exchanges") {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = spark.sql(joinSql)
      assert(df.count() === 200L)
      val aqeFinal = df.queryExecution.executedPlan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(df.queryExecution.executedPlan)
      assert(shuffleCount(aqeFinal) === 0,
        s"AQE re-planned an exchange into the SPJ join:\n$aqeFinal")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  test("SPJ reads THROUGH position deletes: a table maintained by " +
      "DELETE/MERGE keeps its zero-exchange join, rows exact vs the " +
      "V1 plan") {
    spark.sql("DELETE FROM graftspj.db.fact_b WHERE k >= 580")
    val df = spark.sql(joinSql)
    // position delete files are applied IN-READER now — BOTH sides
    // stay key-grouped and the join still plans shuffle-free
    assert(shuffleCount(df.queryExecution.executedPlan) === 0,
      s"SPJ must hold through position deletes:\n" +
        s"${df.queryExecution.executedPlan}")
    assert(df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.size === 2, "both sides key-grouped with deletes present")
    assert(df.collect().length === 200, "deleted keys were outside the overlap")

    // a delete INSIDE the overlap: the dropped rows vanish from the
    // shuffle-free join, row-for-row equal to the exchanged plan
    spark.sql("DELETE FROM graftspj.db.fact_b WHERE k < 210")
    val spj = spark.sql(joinSql).collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(spj.length === 190)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val v1 = spark.sql(joinSql).collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
      assert(spj.toSeq === v1.toSeq,
        "delete-aware SPJ read must match the general MoR read exactly")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

    // a MERGE (delete + reinsert in one delta snapshot) keeps SPJ too —
    // the exact table shape the CDC pipeline maintains
    spark.createDataFrame(Seq((300L, 12345.0), (301L, 23456.0)))
      .toDF("k", "nvb").createOrReplaceTempView("spj_upd")
    spark.sql(
      """MERGE INTO graftspj.db.fact_b t USING spj_upd s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET vb = s.nvb""".stripMargin)
    val df2 = spark.sql(joinSql)
    assert(shuffleCount(df2.queryExecution.executedPlan) === 0,
      "SPJ must hold after a MERGE delta commit")
    val merged = df2.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(merged(300L) === 12345.0 && merged(301L) === 23456.0)
    assert(df2.count() === 190L)
  }

  test("SPJ reads THROUGH equality deletes too: a table maintained by " +
      "the upsert sink's shape keeps its zero-exchange join; the size " +
      "gate falls back past the key cap") {
    spark.sql(
      """CREATE TABLE graftspj.db.fact_e (
        |  k BIGINT NOT NULL, ve DOUBLE
        |) PARTITIONED BY (bucket(16, k))""".stripMargin)
    spark.sql("INSERT INTO graftspj.db.fact_e " +
      "SELECT id AS k, id * 4.0 AS ve FROM range(0, 400)")
    // the streaming-CDC table shape: an API upsert commits new data
    // files + global equality delete files over the batch keys —
    // forced here into MULTIPLE bucketed delete files (keys-per-file
    // 1) so the scan proves it probes a partitioned delete set, not
    // one monolith
    val path = s"$warehouse/db/fact_e"
    val conf = spark.sparkContext.hadoopConfiguration
    val tdef = graft.sources.IcebergTableLoader.load(path, conf)
    spark.conf.set("graft.rowlevel.eq-delete-keys-per-file", "1")
    try graft.api.SchemaTranslator.mergeUpsert(
      spark.createDataFrame(Seq((250L, 99999.0), (401L, 40100.0)))
        .toDF("k", "ve"), tdef, path, keyCols = Seq("k"))
    finally spark.conf.unset("graft.rowlevel.eq-delete-keys-per-file")
    val (_, listRows) =
      graft.sources.IcebergSnapshot.resolveSnapshot(path, tdef, None, conf)
    assert(graft.sources.IcebergSnapshot.liveDeleteFiles(listRows, conf)
      .count(_.content == 2) > 1,
      "the forced keys-per-file=1 upsert must write >1 equality " +
        "delete file — this leg exists to prove multi-file probing")
    val sql =
      """SELECT a.k, a.va, e.ve
        |FROM graftspj.db.fact_a a JOIN graftspj.db.fact_e e
        |ON a.k = e.k""".stripMargin
    val df = spark.sql(sql)
    assert(shuffleCount(df.queryExecution.executedPlan) === 0,
      s"SPJ must hold through equality deletes:\n" +
        s"${df.queryExecution.executedPlan}")
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(250L) === 99999.0,
      "the upserted row wins; its older version dies via the eq delete")
    assert(got.size === 400, "fact_a holds 0..399; the 401 insert is outside")
    // exact row parity vs the general MoR read
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val v1 = spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
      val spj = df.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
      assert(spj.toSeq === v1.toSeq,
        "equality-delete SPJ read must match the general MoR read exactly")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

    // the size gate: cap at 0 keys → the eq-delete side steps aside
    spark.conf.set("graft.spj.max-eq-delete-rows", "0")
    try {
      val fb = spark.sql(sql)
      assert(fb.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.forall(_.toString.contains("fact_a")),
        "past the key cap the eq-delete table must ride the V1 scan")
      assert(fb.collect().length === df.collect().length)
    } finally spark.conf.unset("graft.spj.max-eq-delete-rows")
    spark.sql("DROP TABLE graftspj.db.fact_e")
  }

  test("compound spec (bucket(16, k), days(ts)): the standard fact " +
      "layout still groups by the bucket ordinal and joins shuffle-free") {
    spark.sql(
      """CREATE TABLE graftspj.db.fact_c (
        |  k BIGINT NOT NULL, ts DATE, vc DOUBLE
        |) PARTITIONED BY (bucket(16, k), days(ts))""".stripMargin)
    spark.sql("INSERT INTO graftspj.db.fact_c " +
      "SELECT id AS k, date_add(DATE'2024-01-01', CAST(id % 7 AS INT)) " +
      "AS ts, id * 3.0 AS vc FROM range(0, 400)")
    val sql =
      """SELECT a.k, a.va, c.vc
        |FROM graftspj.db.fact_a a JOIN graftspj.db.fact_c c
        |ON a.k = c.k""".stripMargin
    val df = spark.sql(sql)
    assert(shuffleCount(df.queryExecution.executedPlan) === 0,
      s"compound-spec bucket join must plan shuffle-free:\n" +
        s"${df.queryExecution.executedPlan}")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length === 400)
    assert(got.forall { case (k, va, vc) => va === k * 1.5 && vc === k * 3.0 })
    spark.sql("DROP TABLE graftspj.db.fact_c")
  }

  test("identity(region) layout joins shuffle-free: directory-encoded " +
      "values serve as per-file constants from manifest metadata") {
    spark.sql(
      """CREATE TABLE graftspj.db.sales_i (
        |  region STRING NOT NULL, amt DOUBLE
        |) PARTITIONED BY (region)""".stripMargin)
    spark.sql("INSERT INTO graftspj.db.sales_i " +
      "SELECT concat('r', CAST(id % 8 AS STRING)) AS region, " +
      "id * 1.0 AS amt FROM range(0, 400)")
    spark.sql(
      """CREATE TABLE graftspj.db.quota_i (
        |  region STRING NOT NULL, quota DOUBLE
        |) PARTITIONED BY (region)""".stripMargin)
    spark.sql("INSERT INTO graftspj.db.quota_i " +
      "SELECT concat('r', CAST(id AS STRING)) AS region, " +
      "id * 100.0 AS quota FROM range(0, 8)")
    val sql =
      """SELECT s.region, s.amt, q.quota
        |FROM graftspj.db.sales_i s JOIN graftspj.db.quota_i q
        |ON s.region = q.region""".stripMargin
    val df = spark.sql(sql)
    assert(shuffleCount(df.queryExecution.executedPlan) === 0,
      s"identity-partitioned join must plan shuffle-free:\n" +
        s"${df.queryExecution.executedPlan}")
    val got = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 400)
    assert(got.forall { case (reg, amt, quota) =>
      reg === s"r${amt.toLong % 8}" && quota === (amt.toLong % 8) * 100.0
    }, "injected identity constants must carry the true region values")
    // exact parity vs the general (exchanged) path
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val v1 = spark.sql(sql).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      assert(got.sortBy(t => (t._1, t._2)).toSeq === v1.toSeq)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // the identity column itself projects and filters correctly
    // through the key-grouped scan (value injection, not file read)
    assert(spark.sql("SELECT DISTINCT region FROM graftspj.db.sales_i")
      .collect().map(_.getString(0)).sorted.toSeq ===
      (0 until 8).map(i => s"r$i"))
    assert(spark.sql("SELECT count(*) FROM graftspj.db.sales_i " +
      "WHERE region = 'r3'").collect().head.getLong(0) === 50L)
    spark.sql("DROP TABLE graftspj.db.sales_i")
    spark.sql("DROP TABLE graftspj.db.quota_i")
  }

  test("compound (bucket(16,k), days(ts), region) fact layout still " +
      "groups by the bucket ordinal, joins shuffle-free, and the " +
      "identity column reads through per-file constants") {
    spark.sql(
      """CREATE TABLE graftspj.db.fact_ir (
        |  k BIGINT NOT NULL, ts DATE, region STRING, vr DOUBLE
        |) PARTITIONED BY (bucket(16, k), days(ts), region)""".stripMargin)
    spark.sql("INSERT INTO graftspj.db.fact_ir " +
      "SELECT id AS k, date_add(DATE'2024-01-01', CAST(id % 3 AS INT)) " +
      "AS ts, concat('r', CAST(id % 2 AS STRING)) AS region, " +
      "id * 5.0 AS vr FROM range(0, 400)")
    val sql =
      """SELECT a.k, a.va, f.vr, f.region
        |FROM graftspj.db.fact_a a JOIN graftspj.db.fact_ir f
        |ON a.k = f.k""".stripMargin
    val df = spark.sql(sql)
    assert(shuffleCount(df.queryExecution.executedPlan) === 0,
      s"compound bucket+identity join must plan shuffle-free:\n" +
        s"${df.queryExecution.executedPlan}")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(got.length === 400)
    assert(got.forall { case (k, va, vr, reg) =>
      va === k * 1.5 && vr === k * 5.0 && reg === s"r${k % 2}"
    })
    spark.sql("DROP TABLE graftspj.db.fact_ir")
  }

  test("SELECT bucket(16, k) through the catalog equals the writer's " +
      "transform (the audit face SPJ compatibility rests on)") {
    val rows = spark.sql(
      "SELECT k, graftspj.bucket(16, k) AS b FROM graftspj.db.fact_a LIMIT 50")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) ===
        graft.functions.IcebergBucketUtil.bucketLong(r.getLong(0), 16))
    }
  }
}
