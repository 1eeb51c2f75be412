package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.IcebergSnapshot

/** The optimistic concurrent-writer commit protocol: two committers
  * racing the same base version cannot both install it — the commit
  * point is an EXCLUSIVE create of `v{N+1}.metadata.json`, the loser
  * gets CommitConflictException and `withCommitRetry` rebuilds it
  * against the new head. Both snapshots land, linearized (every
  * snapshot's parent is the commit that actually preceded it), no
  * lost update. */
class IcebergConcurrencySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-concurrency-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val table = Db2Parser.parse(
    """CREATE TABLE S.RACE (
      |  K BIGINT NOT NULL,
      |  V VARCHAR(10)
      |);""".stripMargin).tables.head

  private def df(ks: Seq[Long]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("K", LongType, nullable = false),
      StructField("V", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ks.map(k => org.apache.spark.sql.Row(k, s"v$k")), 1),
      schema)
  }

  private def meta(out: String): org.json4s.JValue = {
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")),
      "UTF-8").trim.toInt
    org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        out, "metadata", s"v$v.metadata.json")), "UTF-8"))
  }

  test("two interleaved committers racing writeNewMetadataVersion: " +
      "every commit lands exactly once (all properties survive), " +
      "versions are dense, no lost update") {
    import org.json4s._
    val out = java.nio.file.Files.createTempDirectory("iceberg_race").toString
    SchemaTranslator.migrateTable(df(Seq(0L)), table, out)
    val conf = spark.sparkContext.hadoopConfiguration

    // property commits are the pure writeNewMetadataVersion surface —
    // each carries the prior version's properties FORWARD, so a lost
    // update (two writers both building on version N, the loser
    // clobbering the winner's v{N+1}) silently DROPS the winner's
    // property: surviving properties are exactly the linearizability
    // witness. Data commits share this same commit tail (the
    // deterministic same-base collision is the second test).
    val perWriter = 12
    val writers = 2
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (1 to perWriter).foreach { i =>
            var sawConflict = false
            // a hot opposing writer can win many versions in a row;
            // retries are cheap (read hint + rebuild), so give slack
            IcebergSnapshot.withCommitRetry(maxAttempts = 200) {
              // setTableProperties re-reads the version hint each
              // attempt, so a retry rebuilds against the new head
              try IcebergSnapshot.setTableProperties(table, out,
                Map(s"w$w-$i" -> Some(s"$i")), conf)
              catch {
                case e: IcebergSnapshot.CommitConflictException =>
                  sawConflict = true; throw e
              }
            }
            if (sawConflict) { conflicts.incrementAndGet(); () }
          } catch { case t: Throwable => failures.add(t); () }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")

    // no lost update: every writer's every property survived
    val props = (meta(out) \ "properties") match {
      case JObject(fields) => fields.map(_._1).toSet
      case _ => Set.empty[String]
    }
    val want = (0 until writers)
      .flatMap(w => (1 to perWriter).map(i => s"w$w-$i")).toSet
    assert(want.subsetOf(props),
      s"lost updates: missing ${(want -- props).toSeq.sorted}")

    // metadata versions are dense: one per commit, none clobbered
    val mdir = new java.io.File(out, "metadata")
    val versions = mdir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toInt).sorted
    assert(versions.toSeq === (1 to versions.max).toSeq,
      "metadata versions must be dense — a hole means a clobbered commit")
    assert(versions.max >= 2 + writers * perWriter,
      "every commit must have installed its own version")
    // the table still reads
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).toSet === Set(0L))
    info(s"observed ${conflicts.get()} first-attempt conflicts")
  }

  test("a racing pair on the SAME base: exactly one wins the version, " +
      "the loser conflicts loudly instead of silently clobbering") {
    val out = java.nio.file.Files.createTempDirectory("iceberg_race2").toString
    SchemaTranslator.migrateTable(df(Seq(0L)), table, out)
    // force the deterministic interleaving: both writers build against
    // the same base; the second commit of the same version must refuse
    val conf = spark.sparkContext.hadoopConfiguration
    SchemaTranslator.appendIncrement(df(Seq(1L)), table, out)
    val hintPath = new org.apache.hadoop.fs.Path(
      out, "metadata/version-hint.text")
    val fs = hintPath.getFileSystem(conf)
    def writeHint(v: Int): Unit = {
      // through the Hadoop fs so the checksum sidecar stays consistent
      val os = fs.create(hintPath, true)
      try os.write(s"$v\n".getBytes("UTF-8")) finally os.close()
    }
    val hint = {
      val in = fs.open(hintPath)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
    // simulate the loser: roll the hint back so the next commit
    // rebuilds against the superseded base and collides with the
    // existing v{hint}
    writeHint(hint - 1)
    val e = intercept[IcebergSnapshot.CommitConflictException] {
      SchemaTranslator.appendIncrement(df(Seq(2L)), table, out)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // restore the true head; the table reads intact
    writeHint(hint)
    assert(IcebergSnapshot.readSnapshot(spark, out, table)
      .select("K").collect().map(_.getLong(0)).toSet === Set(0L, 1L))
  }

  test("SQL DELETE FROM racing INSERT appends: both faces retry to " +
      "linearization — no lost appends, no lost deletes, dense versions") {
    val wh = java.nio.file.Files
      .createTempDirectory("iceberg_race_delete").toString
    spark.conf.set("spark.sql.catalog.gdelrace",
      "graft.sources.v2.GraftIcebergCatalog")
    spark.conf.set("spark.sql.catalog.gdelrace.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdelrace.db")
    spark.sql("CREATE TABLE gdelrace.db.race (k BIGINT NOT NULL, v STRING)")
    val sevens = (0L until 120L).filter(_ % 7 == 0)
    val inList = sevens.mkString(", ")

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try (0 until 12).foreach { b =>
          spark.sql("INSERT INTO gdelrace.db.race " +
            s"SELECT id AS k, concat('v', id) AS v " +
            s"FROM range(${b * 10}, ${b * 10 + 10})")
          ()
        } catch { case t: Throwable => failures.add(t); () }
      }
    })
    pool.submit(new Runnable {
      override def run(): Unit = {
        start.await()
        try (0 until 6).foreach { _ =>
          // thins whatever multiples of 7 have landed so far; the
          // post-join sweep below makes the final state deterministic
          spark.sql(s"DELETE FROM gdelrace.db.race WHERE k IN ($inList)")
          ()
        } catch { case t: Throwable => failures.add(t); () }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"a racing face surfaced a conflict it should have retried: " +
        s"${failures.peek()}")

    // deterministic final state: one post-join sweep of the fixed set
    spark.sql(s"DELETE FROM gdelrace.db.race WHERE k IN ($inList)")
    val got = spark.sql("SELECT k FROM gdelrace.db.race")
      .collect().map(_.getLong(0)).toSet
    val want = (0L until 120L).filterNot(_ % 7 == 0).toSet
    assert(got === want, "every appended row outside the deleted set " +
      "must survive the race (no lost appends), every deleted key gone")
    // metadata versions stayed dense — no commit clobbered another
    val mdir = new java.io.File(s"$wh/db/race", "metadata")
    val versions = mdir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toInt).sorted
    assert(versions.toSeq === (1 to versions.max).toSeq)
    spark.sql("DROP TABLE gdelrace.db.race")
  }
}
