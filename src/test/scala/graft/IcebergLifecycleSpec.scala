package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.SchemaTranslator
import graft.parse.Db2Parser
import graft.sources.{IcebergDeletes, IcebergMaintenance, IcebergSnapshot}

/** Randomized Iceberg v2 lifecycle property test — the strongest
  * in-sandbox substitute for validation by a live Iceberg runtime
  * (environment-blocked: no runtime jar, zero egress). Random op
  * sequences (append / position-delete / equality-upsert / plain
  * compaction / delete-aware compaction / snapshot expiry) run against
  * a driver-side model of the table, asserting after EVERY op:
  *
  *   - the current snapshot reads exactly the model's rows;
  *   - a randomly chosen retained snapshot still time-travels to the
  *     row set it committed (and after an expiry, every retained one);
  *   - expiry physically deletes exactly the unreachable files and
  *     reading an expired snapshot id fails;
  *   - the current metadata document passes the table-spec v2
  *     structural validator ([[IcebergV2Validation]]);
  *   - plain compaction refuses while delete files are live.
  */
class IcebergLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("iceberg-lifecycle-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------------------------------------------------------- ops

  private sealed trait Op
  private case class Append(n: Int) extends Op
  private case class Delete(mod: Int, rem: Int) extends Op
  private case class Upsert(nUpdate: Int, nInsert: Int) extends Op
  private case object Compact extends Op
  private case object CompactWithDeletes extends Op
  private case class Expire(keep: Int) extends Op
  /** The SQL UPDATE/MERGE write shape (r14): ONE snapshot pairing
    * position deletes for the rows matching K % mod == rem with
    * re-written versions of those rows (N bumped) plus `nInsert`
    * fresh rows — [[IcebergDeletes.commitRowDelta]], the delta core
    * both row-level SQL commands commit through. */
  private case class RowDelta(mod: Int, rem: Int, nInsert: Int) extends Op
  // schema evolution interleaved with the data ops: add / rename /
  // drop an EXTRA integer column (base columns stay fixed so
  // time-travel expectations remain comparable across schemas)
  private case class AddCol(seed: Int) extends Op
  private case object RenameCol extends Op
  private case object DropCol extends Op
  // named refs: tag a random retained snapshot (protects it from
  // expiry until dropped)
  private case class TagSnap(pick: Int) extends Op
  private case object DropTag extends Op
  // partition-spec evolution interleaved with everything else:
  // add bucket(K) to the default spec / drop its first field / rename
  // its first field — each a metadata-only commit; old files keep
  // their spec and the read path must plan across them
  private case object SpecAddBucket extends Op
  private case object SpecDropField extends Op
  private case object SpecRenameField extends Op
  // hidden partitioning: truncate[2](V) joins the default spec —
  // transform-valued directories/manifests interleaved with appends,
  // deletes, compaction (the spec-migrating re-stamp), zorder, WAP
  private case object SpecAddTruncate extends Op
  // write-audit-publish + rollback interleaved with everything else:
  // stage rows on the "wap" audit branch (main untouched), publish by
  // fast-forward when main is still on the branch's ancestry (else
  // assert the refusal and abandon the branch), and roll main back to
  // a random retained ancestor whose full state the model recorded
  private case class StageBranch(n: Int) extends Op
  private case object PublishOrAbandon extends Op
  private case class Rollback(pick: Int) extends Op
  // orphan sweep at an arbitrary lifecycle point: optionally plants
  // crashed-commit leftovers first; must remove EXACTLY those and
  // leave every read face (model, time travel, refs) unchanged
  private case class SweepOrphans(plantCrash: Boolean) extends Op
  // metadata-only manifest consolidation: a REPLACE commit on main
  // that must change NO read face (model, travel, refs, incrementals)
  private case object RewriteManifests extends Op
  private case object RewriteZorder extends Op

  /** The streaming sinks' cadence body ([[graft.streaming.StreamingOps
    * .maintainIcebergTable]]): delete-fold + small-file bin + expiry
    * as one composed pass, dropped into random positions so the
    * sequence a long-running sink actually produces is part of the
    * searched space. */
  private case class Maintain(keep: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> Gen.choose(1, 12).map(Append(_)),
    3 -> (for { m <- Gen.choose(2, 5); r <- Gen.choose(0, 4) }
      yield Delete(m, r min (m - 1))),
    3 -> (for { u <- Gen.choose(0, 4); i <- Gen.choose(0, 4) }
      yield Upsert(u, i max (if (u == 0) 1 else 0))),
    3 -> (for { m <- Gen.choose(2, 5); r <- Gen.choose(0, 4)
                i <- Gen.choose(0, 3) }
      yield RowDelta(m, r min (m - 1), i)),
    1 -> Gen.const(Compact),
    2 -> Gen.const(CompactWithDeletes),
    2 -> Gen.choose(1, 3).map(Expire(_)),
    2 -> Gen.choose(3, 97).map(AddCol(_)),
    1 -> Gen.const(RenameCol),
    1 -> Gen.const(DropCol),
    1 -> Gen.choose(0, 9).map(TagSnap(_)),
    1 -> Gen.const(DropTag),
    2 -> Gen.const(SpecAddBucket),
    2 -> Gen.const(SpecAddTruncate),
    1 -> Gen.const(SpecDropField),
    1 -> Gen.const(SpecRenameField),
    2 -> Gen.choose(1, 6).map(StageBranch(_)),
    2 -> Gen.const(PublishOrAbandon),
    2 -> Gen.choose(0, 9).map(Rollback(_)),
    2 -> Gen.oneOf(true, false).map(SweepOrphans(_)),
    1 -> Gen.const(RewriteManifests),
    1 -> Gen.const(RewriteZorder),
    2 -> Gen.choose(2, 5).map(Maintain(_)))

  private val seqGen: Gen[List[Op]] =
    Gen.choose(4, 7).flatMap(n => Gen.listOfN(n, opGen))

  // ------------------------------------------------------------ helpers

  private def currentMeta(out: String): JValue = {
    val v = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", "version-hint.text")), "UTF-8").trim.toInt
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "metadata", s"v$v.metadata.json")), "UTF-8"))
  }

  private def chainIds(out: String): Seq[Long] =
    (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
      .map(s => (s \ "snapshot-id").asInstanceOf[JInt].num.toLong)

  private def mainHeadId(out: String): Long =
    (currentMeta(out) \ "current-snapshot-id").asInstanceOf[JInt].num.toLong

  /** `from`'s parent-link ancestry over the RETAINED chain, in
    * head→root order — the harness's own walk, mirroring (and thereby
    * cross-checking) the writer's ancestry logic. */
  private def ancestryOf(out: String, from: Long): Seq[Long] = {
    val arr = (currentMeta(out) \ "snapshots").asInstanceOf[JArray].arr
    val parent = arr.map { s =>
      (s \ "snapshot-id").asInstanceOf[JInt].num.toLong ->
        (s \ "parent-snapshot-id" match {
          case JInt(p) => Some(p.toLong)
          case _ => None
        })
    }.toMap
    Iterator.iterate(Option(from))(
      _.flatMap(parent.get).flatten.filter(parent.contains))
      .takeWhile(_.isDefined).map(_.get).toSeq
  }

  private def mainAncestry(out: String): Seq[Long] =
    ancestryOf(out, mainHeadId(out))

  private def refIds(out: String): Map[String, Long] =
    (currentMeta(out) \ "refs") match {
      case JObject(fields) => fields.map { case (n, v) =>
        n -> (v \ "snapshot-id").asInstanceOf[JInt].num.toLong
      }.toMap
      case _ => Map.empty
    }

  private def asLocal(p: String): java.nio.file.Path =
    if (p.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(p))
    else java.nio.file.Paths.get(p)

  // ------------------------------------------------------------ driver

  private def runSequence(ops: List[Op], seqNo: Int): Unit = {
    // D is a DECIMAL derived deterministically from K (D = K·2.50) so
    // the model needn't track it while decimal pruning bounds stay
    // checkable after every commit (DECIMAL is the reference's
    // canonical numeric — mapper.py:243-263)
    var table = Db2Parser.parse(
      """CREATE TABLE S.LIFE (
        |  K BIGINT NOT NULL,
        |  D DECIMAL(12,2),
        |  V VARCHAR(10),
        |  N INTEGER
        |) PARTITION BY RANGE (V);""".stripMargin).tables.head
    val out = java.nio.file.Files
      .createTempDirectory(s"iceberg_life_$seqNo").toString
    // evolving extra columns: (current name, value seed); the seed
    // rides a rename so appended values stay deterministic per column
    var extras = Vector.empty[(String, Int)]
    var evoCounter = 0

    // one row = base (K, V, N) + a value per extra column PRESENT AT
    // WRITE TIME; the model stores exactly the values written
    def decOf(k: Long): java.math.BigDecimal =
      new java.math.BigDecimal(java.math.BigInteger.valueOf(k * 250), 2)
    def rowOf(k: Long): (Long, String, Int, Map[String, Int]) =
      (k, s"p${k % 3}", (k * 7).toInt,
        extras.map { case (e, seed) => e -> ((k * seed) % 10000).toInt }.toMap)
    def rowsDf(rows: Seq[(Long, String, Int, Map[String, Int])])
        : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.types._
      val schema = StructType(
        Seq(StructField("K", LongType, nullable = false),
          StructField("D", DecimalType(12, 2)),
          StructField("V", StringType), StructField("N", IntegerType)) ++
          extras.map { case (e, _) => StructField(e, IntegerType) })
      val data = rows.map { case (k, v, n, ex) =>
        org.apache.spark.sql.Row.fromSeq(
          Seq(k, decOf(k), v, n) ++ extras.map { case (e, _) =>
            ex.get(e).map(Integer.valueOf).orNull
          })
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), schema)
    }
    def freshRows(from: Long, n: Int) = (from until from + n).map(rowOf)

    // model value: (V, N, extras values written for the row — absent
    // key = the column didn't exist / carried null at write time)
    var model = Map.empty[Long, (String, Int, Map[String, Int])]
    var nextKey = 1L
    var liveDeletes = false
    var tagCounter = 0
    var tagged = Map.empty[String, Long] // ref name → snapshot id
    // snapshot id → the BASE row set it committed (time-travel reads
    // run under the CURRENT schema, so only the stable base columns
    // are comparable across schema versions)
    var history = Map.empty[Long, Map[Long, (String, Int)]]
    // MAIN-head snapshot id → (full model, live-delete flag) — what a
    // rollback restores; rename/drop ops rewrite these entries the
    // same way they rewrite `model` (renames are metadata-only, so
    // old snapshots read under the NEW names)
    var fullHistory =
      Map.empty[Long, (Map[Long, (String, Int, Map[String, Int])], Boolean)]
    // write-audit-publish state: rows staged on the "wap" branch, plus
    // the full main state the branch forked from (what a publish lands
    // on top of)
    var stagedPending = Map.empty[Long, (String, Int, Map[String, Int])]
    var wapBase: Option[(Map[Long, (String, Int, Map[String, Int])], Boolean)] =
      None

    def readRows(snapshotId: Option[Long] = None)
        : Map[Long, (String, Int, Map[String, Int])] =
      IcebergSnapshot.readSnapshot(spark, out, table, snapshotId)
        .select((Seq("K", "V", "N") ++ extras.map(_._1))
          .map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map { r =>
          val ex = extras.zipWithIndex.flatMap { case ((e, _), i) =>
            if (r.isNullAt(3 + i)) None else Some(e -> r.getInt(3 + i))
          }.toMap
          r.getLong(0) -> ((r.getString(1), r.getInt(2), ex))
        }.toMap
    def baseOf(m: Map[Long, (String, Int, Map[String, Int])]) =
      m.map { case (k, (v, n, _)) => k -> ((v, n)) }
    def readBase(snapshotId: Option[Long]): Map[Long, (String, Int)] =
      baseOf(readRows(snapshotId))

    // initial migration: create + snapshot 1
    val init = freshRows(nextKey, 5); nextKey += 5
    SchemaTranslator.migrateTable(rowsDf(init), table, out)
    model = init.map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    def afterOp(label: String): Unit = {
      assert(readRows() == model, s"[$label] current read != model")
      val ids = chainIds(out)
      // key by the MAIN head, not the array tail — a staged WAP
      // snapshot (or a rollback) legitimately leaves the tail off main
      val head = mainHeadId(out)
      history += head -> baseOf(model)
      history = history.filter { case (id, _) => ids.contains(id) }
      fullHistory += head -> ((model, liveDeletes))
      fullHistory = fullHistory.filter { case (id, _) => ids.contains(id) }
      IcebergV2Validation.validateV2(currentMeta(out), expectSnapshot = true)
      // one random retained snapshot still time-travels (compared on
      // the schema-stable base columns)
      val (id, want) = history.toSeq(scala.util.Random.nextInt(history.size))
      assert(readBase(Some(id)) == want, s"[$label] time travel to $id drifted")
      // pruned read with a random K range after EVERY commit: stats-
      // based file skipping must stay exact through every lifecycle op
      // (deletes, compactions, evolution, rollback, expiry, ...)
      val lo = scala.util.Random.nextLong(nextKey.max(2L))
      val hi = lo + scala.util.Random.nextLong(nextKey.max(2L))
      val bound = graft.sources.IcebergPruning.ColumnBound(
        "K", Some(lo), Some(hi))
      val prunedKs = IcebergSnapshot
        .readSnapshot(spark, out, table, pruning = Seq(bound))
        .select("K").collect().map(_.getLong(0)).toSet
      assert(prunedKs == model.keySet.filter(k => k >= lo && k <= hi),
        s"[$label] pruned read [$lo,$hi] != model")
      // and a random DECIMAL bound (D = K·2.50, so the expectation
      // maps straight back to the key set): the spec's unscaled-BE
      // bounds decode must stay exact through every lifecycle op too
      val dLo = decOf(lo)
      val dHi = decOf(hi)
      val dBound = graft.sources.IcebergPruning.ColumnBound(
        "D", Some(dLo), Some(dHi))
      val dKs = IcebergSnapshot
        .readSnapshot(spark, out, table, pruning = Seq(dBound))
        .select("K").collect().map(_.getLong(0)).toSet
      assert(dKs == model.keySet.filter(k =>
        decOf(k).compareTo(dLo) >= 0 && decOf(k).compareTo(dHi) <= 0),
        s"[$label] decimal pruned read [$dLo,$dHi] != model")
      // the IDIOMATIC path after every commit: the DSv2 face must
      // reconstruct the schema from the table's own metadata (through
      // every add/rename/drop/spec evolution this sequence applied)
      // and its Catalyst pushdown must agree with the model under the
      // same random range — covering file pruning, residual filters,
      // merge-on-read deletes and the empty-table state end to end
      val v2Ks = spark.read.format("graft-iceberg").load(out)
        .filter(org.apache.spark.sql.functions.col("K") >= lo &&
          org.apache.spark.sql.functions.col("K") <= hi)
        .select("K").collect().map(_.getLong(0)).toSet
      assert(v2Ks == model.keySet.filter(k => k >= lo && k <= hi),
        s"[$label] DSv2 filtered read [$lo,$hi] != model")
    }
    afterOp("init")

    for ((op, i) <- ops.zipWithIndex) {
      val label = s"seq$seqNo op$i $op"
      op match {
        case Append(n) =>
          val rows = freshRows(nextKey, n); nextKey += n
          SchemaTranslator.appendIncrement(rowsDf(rows), table, out)
          model ++= rows.map(r => r._1 -> ((r._2, r._3, r._4)))

        case Delete(m, r) =>
          val matches = model.keys.filter(_ % m == r).toSet
          IcebergDeletes.commitPositionDeletes(spark, table, out,
            col("K") % m === r)
          model --= matches
          if (matches.nonEmpty) liveDeletes = true

        case RowDelta(m, r, ni) =>
          // the SQL UPDATE/MERGE delta shape: matched rows die by
          // (file, pos) and re-land with N bumped, fresh rows ride the
          // SAME snapshot — exercising commitRowDelta against every
          // table state this harness can reach (evolved schemas, mixed
          // specs, merge-on-read backlogs, post-rollback heads, ...)
          val matches = model.keys.filter(_ % m == r).toSet
          val net = IcebergSnapshot.readSnapshot(spark, out, table,
            keepRowMeta = true)
          val matched = net.filter(col("K") % m === r)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val deletes = matched.select(
              col("__graft_file"), col("__graft_pos"))
            val declared = SchemaTranslator.toSparkSchema(table)
            def toDeclared(df: org.apache.spark.sql.DataFrame) =
              df.select(declared.fields.toSeq
                .filter(f => df.columns.contains(f.name))
                .map(f => col(f.name).cast(f.dataType)
                  .as(f.name, f.metadata)): _*)
            val fresh = freshRows(nextKey, ni); nextKey += ni
            val rewritten = toDeclared(
              matched.withColumn("N", col("N") + 1000))
            val inserts =
              if (ni == 0) rewritten
              else rewritten.unionByName(toDeclared(rowsDf(fresh)),
                allowMissingColumns = true)
            val sub = s"$out/data/rowdelta-$i"
            val files =
              if (inserts.isEmpty) Nil
              else {
                SchemaTranslator.writeMigrated(inserts, table, sub)
                IcebergSnapshot.listDataFiles(
                  new org.apache.hadoop.fs.Path(sub), table,
                  spark.sparkContext.hadoopConfiguration)
                  .filter(_.recordCount > 0)
              }
            IcebergDeletes.commitRowDelta(spark, table, out, deletes, files)
            model = model.map { case (k, (v, n, ex)) =>
              if (k % m == r) k -> ((v, n + 1000, ex))
              else k -> ((v, n, ex))
            } ++ fresh.map(fr => fr._1 -> ((fr._2, fr._3, fr._4)))
            if (matches.nonEmpty) liveDeletes = true
          } finally { matched.unpersist(); () }

        case Upsert(nUpd, nIns) =>
          val updKeys = model.keys.toSeq.sorted.take(nUpd)
          val upd = updKeys.map { k =>
            val fresh = rowOf(k)
            (k, s"p${k % 3}", model(k)._2 + 1000, fresh._4)
          }
          val ins = freshRows(nextKey, nIns); nextKey += nIns
          val batch = upd ++ ins
          if (batch.nonEmpty) {
            SchemaTranslator.mergeUpsert(rowsDf(batch), table, out,
              keyCols = Seq("K"))
            model ++= batch.map(r => r._1 -> ((r._2, r._3, r._4)))
            liveDeletes = true
          }

        case Compact =>
          if (liveDeletes)
            // refusal is part of the contract: plain compaction must
            // not run over live delete files
            intercept[IllegalArgumentException] {
              IcebergSnapshot.compactDataFiles(spark, table, out, 1L << 30)
            }
          else
            IcebergSnapshot.compactDataFiles(spark, table, out, 1L << 30)

        case RewriteZorder =>
          // same live-delete refusal contract as plain compaction; on
          // the clean path the clustering rewrite is a REPLACE — model
          // unchanged, every read face re-verified by afterOp
          if (liveDeletes)
            intercept[IllegalArgumentException] {
              IcebergMaintenance.rewriteZorder(spark, table, out, "K", "N",
                targetBytes = 1L << 14)
            }
          else if (model.nonEmpty)
            IcebergMaintenance.rewriteZorder(spark, table, out, "K", "N",
              targetBytes = 1L << 14)

        case CompactWithDeletes =>
          IcebergDeletes.compactWithDeletes(spark, table, out)
          liveDeletes = false

        case Expire(keep) =>
          val before = chainIds(out)
          val lastK = before.takeRight(keep).toSet
          // every named ref (tags + a staged wap branch) plus the main
          // head (which a rollback may have moved off the tail window)
          val protectedIds = refIds(out).values.toSet + mainHeadId(out)
          val retainedBefore =
            before.filter(id => lastK(id) || protectedIds(id))
          val expiredIds =
            before.filterNot(id => lastK(id) || protectedIds(id))
          val (_, deleted) = IcebergSnapshot.expireSnapshots(table, out, keep,
            spark.sparkContext.hadoopConfiguration)
          for (f <- deleted)
            assert(!java.nio.file.Files.exists(asLocal(f)),
              s"[$label] expired file survives: $f")
          assert(chainIds(out) == retainedBefore,
            s"[$label] retained chain mismatch (tags must pin)")
          // an expired id no longer resolves; every tagged one does
          for (id <- expiredIds.headOption)
            intercept[Exception] { readRows(Some(id)) }
          for ((name, _) <- tagged.headOption)
            IcebergSnapshot.readSnapshotAtRef(spark, out, table, name)

        case TagSnap(pick) =>
          val ids = chainIds(out)
          val id = ids(pick % ids.size)
          val name = s"t$tagCounter"; tagCounter += 1
          IcebergSnapshot.createRef(table, out, name, id, "tag",
            spark.sparkContext.hadoopConfiguration)
          tagged += name -> id

        case DropTag =>
          if (tagged.nonEmpty) {
            val name = tagged.keys.min
            IcebergSnapshot.dropRef(table, out, name,
              spark.sparkContext.hadoopConfiguration)
            tagged -= name
          }

        case AddCol(seed) =>
          val name = s"E$evoCounter"; evoCounter += 1
          table = graft.sources.IcebergEvolution.commitEvolution(
            graft.sources.IcebergEvolution.addColumn(table,
              graft.model.Db2Column(name, "INTEGER")), out)
          extras :+= (name -> seed)
          // existing rows have no value for it: model untouched

        case RenameCol =>
          if (extras.nonEmpty) {
            val (from, seed) = extras.head
            val to = s"E${evoCounter}R"; evoCounter += 1
            table = graft.sources.IcebergEvolution.commitEvolution(
              graft.sources.IcebergEvolution.renameColumn(table, from, to), out)
            extras = extras.map { case (e, s2) =>
              if (e == from) (to, seed) else (e, s2) }
            def ren(m: Map[Long, (String, Int, Map[String, Int])]) =
              m.map { case (k, (v, n, ex)) =>
                k -> ((v, n, ex.map { case (e, x) =>
                  (if (e == from) to else e) -> x }))
              }
            // renames are metadata-only: every recorded past state
            // (rollback targets, the staged branch, its fork base)
            // reads under the NEW name too
            model = ren(model)
            fullHistory = fullHistory.view
              .mapValues { case (m, ld) => (ren(m), ld) }.toMap
            stagedPending = ren(stagedPending)
            wapBase = wapBase.map { case (m, ld) => (ren(m), ld) }
          }

        case DropCol =>
          if (extras.nonEmpty) {
            val (victim, _) = extras.last
            table = graft.sources.IcebergEvolution.commitEvolution(
              graft.sources.IcebergEvolution.dropColumn(table, victim), out)
            extras = extras.filterNot(_._1 == victim)
            def drop(m: Map[Long, (String, Int, Map[String, Int])]) =
              m.map { case (k, (v, n, ex)) => k -> ((v, n, ex - victim)) }
            model = drop(model)
            fullHistory = fullHistory.view
              .mapValues { case (m, ld) => (drop(m), ld) }.toMap
            stagedPending = drop(stagedPending)
            wapBase = wapBase.map { case (m, ld) => (drop(m), ld) }
          }

        case SpecAddBucket =>
          // no-op when the default spec already buckets K (the op's
          // own refusal guards the invariant)
          val t = graft.sources.IcebergEvolution.withExplicitSpecs(table)
          val kId = t.columns.find(_.name == "K").get.fieldId.get
          val cur = graft.sources.IcebergMetadata
            .specFieldDefs(t, t.defaultSpecId)
          if (!cur.exists(f => f.sourceId == kId && f.transform == "bucket[16]"))
            table = graft.sources.IcebergEvolution.commitEvolution(
              graft.sources.IcebergEvolution.addPartitionField(
                t, "K", "bucket[16]"), out)

        case SpecAddTruncate =>
          // no-op when the default spec already truncates V, or a
          // previous rename holds the conventional field name
          val t = graft.sources.IcebergEvolution.withExplicitSpecs(table)
          val vId = t.columns.find(_.name == "V").map(_.fieldId.get)
          val cur = graft.sources.IcebergMetadata
            .specFieldDefs(t, t.defaultSpecId)
          vId.foreach { id =>
            if (!cur.exists(f =>
                f.sourceId == id && f.transform == "truncate[2]") &&
                !cur.exists(_.name == "V_trunc"))
              table = graft.sources.IcebergEvolution.commitEvolution(
                graft.sources.IcebergEvolution.addPartitionField(
                  t, "V", "truncate[2]"), out)
          }

        case SpecDropField =>
          val t = graft.sources.IcebergEvolution.withExplicitSpecs(table)
          val cur = graft.sources.IcebergMetadata
            .specFieldDefs(t, t.defaultSpecId)
          if (cur.nonEmpty)
            table = graft.sources.IcebergEvolution.commitEvolution(
              graft.sources.IcebergEvolution.dropPartitionField(
                t, cur.head.name), out)

        case SpecRenameField =>
          val t = graft.sources.IcebergEvolution.withExplicitSpecs(table)
          val cur = graft.sources.IcebergMetadata
            .specFieldDefs(t, t.defaultSpecId)
          if (cur.nonEmpty) {
            val to = s"PF$evoCounter"; evoCounter += 1
            table = graft.sources.IcebergEvolution.commitEvolution(
              graft.sources.IcebergEvolution.renamePartitionField(
                t, cur.head.name, to), out)
          }

        case StageBranch(n) =>
          if (wapBase.isEmpty) wapBase = Some((model, liveDeletes))
          val rows = freshRows(nextKey, n); nextKey += n
          SchemaTranslator.stageAppendToBranch(rowsDf(rows), table, out, "wap")
          stagedPending ++= rows.map(r => r._1 -> ((r._2, r._3, r._4)))
          // main untouched (afterOp asserts read == model); the branch
          // read sees fork base + every staged row (base columns —
          // schema-stable across interleaved evolution)
          val branchRead = IcebergSnapshot
            .readSnapshotAtRef(spark, out, table, "wap")
            .select("K", "V", "N").collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
          assert(branchRead ==
            baseOf(wapBase.get._1 ++ stagedPending),
            s"[$label] branch read != fork base + staged rows")

        case PublishOrAbandon =>
          if (refIds(out).contains("wap") && wapBase.nonEmpty) {
            val branchHead = refIds(out)("wap")
            val legal =
              ancestryOf(out, branchHead).contains(mainHeadId(out))
            if (legal) {
              graft.sources.IcebergWap.fastForwardMain(table, out, "wap",
                spark.sparkContext.hadoopConfiguration)
              model = wapBase.get._1 ++ stagedPending
              liveDeletes = wapBase.get._2
            } else {
              // main advanced (or rolled back) off the branch ancestry
              // — publish must refuse; abandon the branch
              val before = readRows()
              intercept[IllegalArgumentException] {
                graft.sources.IcebergWap.fastForwardMain(table, out, "wap",
                  spark.sparkContext.hadoopConfiguration)
              }
              assert(readRows() == before,
                s"[$label] refused publish must not change main")
              IcebergSnapshot.dropRef(table, out, "wap",
                spark.sparkContext.hadoopConfiguration)
            }
            stagedPending = Map.empty
            wapBase = None
          }

        case Rollback(pick) =>
          val candidates = mainAncestry(out).filter(fullHistory.contains)
          val target = candidates(pick % candidates.size)
          graft.sources.IcebergWap.rollbackMain(table, out, target,
            spark.sparkContext.hadoopConfiguration)
          val (m, ld) = fullHistory(target)
          model = m
          liveDeletes = ld

        case SweepOrphans(plant) =>
          val planted: Set[java.nio.file.Path] = if (plant) {
            val p1 = java.nio.file.Paths.get(out, "data", s"crashed-$i.parquet")
            java.nio.file.Files.createDirectories(p1.getParent)
            java.nio.file.Files.write(p1, Array.fill[Byte](32)(3))
            val p2 = java.nio.file.Paths.get(out, "metadata", s"crashed-$i.avro")
            java.nio.file.Files.write(p2, Array.fill[Byte](32)(4))
            Set(p1, p2)
          } else Set.empty
          val swept = IcebergMaintenance.removeOrphanFiles(out, Long.MaxValue)
            .map(asLocal).toSet
          // a crash-free lifecycle leaves ZERO unreferenced files —
          // the sweep doubles as an invariant check on every writer
          assert(swept == planted,
            s"[$label] sweep mismatch: swept=$swept planted=$planted")

        case RewriteManifests =>
          IcebergMaintenance.rewriteManifests(table, out,
            spark.sparkContext.hadoopConfiguration)
          // model unchanged; afterOp verifies every read face

        case Maintain(keep) =>
          graft.streaming.StreamingOps.maintainIcebergTable(spark, table,
            out, graft.streaming.StreamingOps.SinkMaintenance(
              everyBatches = 1, targetFileBytes = 1L << 30,
              keepSnapshots = keep))
          liveDeletes = false // the fold consumed every delete file
          // rows unchanged; retained-history/ref/GC invariants ride
          // afterOp (and any file the pass strands trips SweepOrphans)
      }
      afterOp(label)
    }

    // cleanup (best-effort)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Exception => () }
  }

  test("regression: compaction tombstones must not resurrect on the next " +
      "append (Append→Compact→Upsert→CompactWithDeletes→Append)") {
    // CompactWithDeletes rewrites the manifest list and drops the
    // PLAIN compaction's older tombstone manifests; the incremental
    // append's dir-diff then saw those still-on-disk time-travel files
    // as "new" and re-added them — old rows resurrected (and dup keys
    // hid behind the read's toMap). The known set now spans the whole
    // retained chain. Found by the randomized property test; pinned
    // here deterministically.
    runSequence(List(Append(4), Compact, Upsert(4, 0), CompactWithDeletes,
      Append(10)), 9001)
    runSequence(List(Append(3), Compact, Append(2), Compact, Append(5)), 9002)
    // second find: plain compaction over a MIXED-schema bin (files
    // from before and after an ADD COLUMN) used the inferred-schema
    // read, which elects one file's schema — bins whose elected file
    // predated the ADD silently dropped the new column's values.
    // Fixed by the shared evolved-aware scan (explicit id schema).
    runSequence(List(AddCol(66), Append(7), Expire(2), Compact), 9003)
    // third find (round 8, by the spec-evolution-extended generator):
    // an identity field RENAMED away from its source column keeps the
    // column physical in new files, so the evolved rewrite WRITES the
    // manifest-restored column back — without its parquet field id
    // (the restore UDF carries no metadata), which made the next
    // id-resolved read null-fill it. The rewrite now re-stamps every
    // written column with its declared field id.
    runSequence(List(AddCol(12), SpecRenameField, Upsert(4, 1),
      CompactWithDeletes), 9004)
    // fourth find (round 9, by the IcebergEvolutionSpec deterministic
    // tests): commitPositionDeletes read spec groups by schema
    // INFERENCE — pre-rename files surfaced renamed columns under
    // their old physical names, so predicates over the current name
    // null-filled and the delete silently skipped those rows. The scan
    // now routes through the shared id-resolving scanDataFiles (whose
    // evolved-branch Union also could not resolve `_metadata` —
    // row-meta columns are now materialized inside each group's scan).
    // The renamed-predicate case is pinned in IcebergEvolutionSpec;
    // this sequence pins rename+delete composing through the harness
    // model.
    runSequence(List(AddCol(5), Append(4), RenameCol, Delete(2, 0),
      CompactWithDeletes, Append(3)), 9005)
    // fifth find (round 9, fresh-seed pass): deleting EVERY row and
    // then compacting the deletes in commits a REPLACE with zero data
    // files — a legal empty-table state readSnapshot refused
    // ("snapshot lists no data files") instead of reading as zero
    // rows. The read now returns an empty DataFrame under the usual
    // column shape; life continues after empty (append, delete,
    // compact again) and time travel to the pre-compact snapshots
    // still sees the rows.
    runSequence(List(Delete(2, 0), Delete(2, 1), CompactWithDeletes,
      Append(4), Delete(3, 1), CompactWithDeletes), 9006)
    // sixth find (round 11, fresh-seed pass during the close gate):
    // a partition whose EVERY row was deleted rewrites to a ZERO-row
    // file in compactWithDeletes, which was dropped from the commit
    // but left ON DISK — an unreferenced file leaked by a crash-free
    // writer, flagged by the sweep's zero-orphans invariant
    // (Delete(2,1) empties a V partition of the 5-row init; the
    // rewrite now DELETES empty outputs instead of stranding them).
    runSequence(List(Delete(2, 1), CompactWithDeletes,
      SweepOrphans(true)), 9007)
    runSequence(List(Delete(2, 0), CompactWithDeletes, SweepOrphans(false),
      Append(4), CompactWithDeletes, SweepOrphans(true)), 9008)
  }

  test("randomized lifecycle sequences uphold read==model, time travel, " +
      "expiry GC and v2 structural invariants (50 sequences)") {
    var n = 0
    val prop = Prop.forAll(seqGen) { ops =>
      n += 1
      runSequence(ops, n)
      true
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
