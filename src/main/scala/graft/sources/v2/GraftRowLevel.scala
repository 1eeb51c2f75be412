package graft.sources.v2

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit, when}

import graft.model.TableDef
import graft.sources.{IcebergDeletes, IcebergSnapshot}

/** SQL `UPDATE` and `MERGE INTO` over the engine's Iceberg v2 tables —
  * the row-level write faces a CDC/upsert pipeline uses daily:
  * {{{
  *   UPDATE graft.db.t SET v = v * 2 WHERE k < 10;
  *   MERGE INTO graft.db.t AS t USING updates AS s ON t.k = s.k
  *     WHEN MATCHED AND s.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *     WHEN NOT MATCHED BY SOURCE THEN DELETE;
  * }}}
  *
  * Architecture: a MERGE-ON-READ delta rewrite registered as an
  * analyzer rule via [[graft.api.GraftExtensions]] (the Delta-Lake
  * pattern: `SparkSessionExtensions.injectResolutionRule`). Spark's
  * built-in row-level rewrites only fire for connectors implementing
  * `SupportsRowLevelOperations`, leaving `UpdateTable`/`MergeIntoTable`
  * nodes over other tables to fail analysis — [[GraftRowLevelRewrite]]
  * claims those nodes when the target is a graft-iceberg table and
  * lowers them to commands over the existing machinery:
  *
  *  1. read the target's NET rows WITH their (file, pos) identity
  *     ([[IcebergSnapshot.readSnapshot]] `keepRowMeta` — row-level
  *     deletes already applied, so an UPDATE can never resurrect a
  *     previously deleted row);
  *  2. match (UPDATE: a filter; MERGE: a join against the source plan,
  *     with the standard one-source-row-per-target-row cardinality
  *     check) — all distributed, all Catalyst-optimized (a selective
  *     ON/WHERE predicate still prunes files via the scan's stats);
  *  3. commit ONE atomic snapshot pairing position delete files for
  *     the touched rows with new data files for the updated/inserted
  *     rows ([[IcebergDeletes.commitRowDelta]]), wrapped in
  *     [[IcebergSnapshot.withCommitRetry]] so a command racing a
  *     concurrent writer re-derives its row set against the new head
  *     and linearizes instead of clobbering.
  *
  * Matched/not-matched actions follow SQL semantics: actions are
  * evaluated in declaration order and the FIRST whose condition holds
  * applies; rows no action claims stay untouched. `UPDATE SET` keeps
  * unassigned columns; `INSERT (cols)` null-fills unmentioned columns.
  * Refusals: WAP staging conf active (these faces commit to MAIN),
  * time-travel targets, `WITH SCHEMA EVOLUTION` unless
  * `graft.merge.schema-evolution=true` (opt-in add-only auto-ALTER
  * through the table's AUTOMATIC_SCHEMA_EVOLUTION capability). */
object GraftRowLevelRewrite extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftIcebergTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftIcebergTable => Some((r, t))
        case _ => None
      }
      case _ => None
    }

  private def concrete(actions: Seq[MergeAction], kind: String): Unit =
    actions.foreach {
      case _: UpdateAction | _: DeleteAction | _: InsertAction =>
      case other => throw new UnsupportedOperationException(
        s"unresolved $kind merge action $other — star actions should " +
          "have been expanded during resolution")
    }

  /** True when the built-in `SupportsDelete` path can serve this
    * DELETE: no subqueries, and every conjunct translates to a v1
    * filter [[GraftIcebergTable.canDeleteWhere]] accepts. Those keep
    * the established pushdown path; everything else (IN/EXISTS
    * subqueries, arithmetic predicates — the daily GDPR/backfill
    * shapes) lowers to the same read-match-commit delta UPDATE and
    * MERGE ride, instead of failing analysis. */
  private def deletePushable(condition: Expression): Boolean = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    !condition.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) &&
      split(condition).forall(c =>
        ColumnBridge.translateFilter(c)
          .exists(f => GraftIcebergSource.filterToColumn(f).isDefined))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      graftTarget(target).map { case (rel, tbl) =>
        require(tbl.timeTravelId0.isEmpty,
          "UPDATE through a time-travel/ref read is not allowed")
        // SET values must be plain expressions (a subquery there has
        // no distributed evaluation surface in the rewrite); the WHERE
        // condition MAY carry subqueries — runUpdate filters through
        // the same deep-remapped plan Filter the DELETE path uses
        assignments.foreach(a => require(!a.value.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
          "subqueries in UPDATE SET values are not supported — " +
            "precompute the value into a source table and MERGE"))
        GraftUpdateCommand(tbl.tablePath0, tbl.tableDef0, rel.output,
          assignments, condition.map(GraftCond)): LogicalPlan
      }.getOrElse(u)
    case d @ DeleteFromTable(target, condition) if d.resolved &&
        !deletePushable(condition) =>
      graftTarget(target).map { case (rel, tbl) =>
        require(tbl.timeTravelId0.isEmpty,
          "DELETE through a time-travel/ref read is not allowed")
        GraftDeleteCommand(tbl.tablePath0, tbl.tableDef0, rel.output,
          GraftCond(condition)): LogicalPlan
      }.getOrElse(d)
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable).map { case (rel, tbl) =>
        require(tbl.timeTravelId0.isEmpty,
          "MERGE INTO a time-travel/ref read is not allowed")
        // with graft.merge.schema-evolution=true the analyzer already
        // evolved the target (add-only) via the table's
        // AUTOMATIC_SCHEMA_EVOLUTION capability before this rule ran;
        // without the opt-in, refuse loudly rather than silently
        // dropping the source's extra columns
        require(!m.withSchemaEvolution ||
          org.apache.spark.sql.SparkSession.active.conf
            .get("graft.merge.schema-evolution", "false").toBoolean,
          "MERGE ... WITH SCHEMA EVOLUTION is disabled — set " +
            "graft.merge.schema-evolution=true to opt in to add-only " +
            "auto-ALTER, or evolve the table first " +
            "(ALTER TABLE ... ADD COLUMN), then MERGE")
        concrete(m.matchedActions, "matched")
        concrete(m.notMatchedActions, "not-matched")
        concrete(m.notMatchedBySourceActions, "not-matched-by-source")
        GraftMergeCommand(tbl.tablePath0, tbl.tableDef0, rel.output,
          m.sourceTable, m.mergeCondition, m.matchedActions,
          m.notMatchedActions, m.notMatchedBySourceActions): LogicalPlan
      }.getOrElse(m)
  }
}

/** `UPDATE t SET ... [WHERE ...]` lowered to one delta snapshot. The
  * condition rides in a [[GraftCond]] carrier so subquery WHERE shapes
  * (`k IN (SELECT …)`) survive CheckAnalysis — see GraftCond. */
case class GraftUpdateCommand(path: String, table: TableDef,
    targetOutput: Seq[Attribute], assignments: Seq[Assignment],
    condition: Option[GraftCond]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftRowLevelExec.runUpdate(spark, path, table, targetOutput,
      assignments, condition.map(_.e))
    Seq.empty
  }
}

/** Opaque expression carrier: keeps a RESOLVED condition off the
  * command node's expression surface. CheckAnalysis allowlists
  * subquery expressions by node type and a custom leaf command is not
  * on the list — but the condition was already fully analyzed and
  * checked as part of the `DeleteFromTable` this command replaced, so
  * re-checking it against the command node would only re-refuse what
  * Spark itself allows in a DELETE. */
private[v2] final case class GraftCond(e: Expression)

/** `DELETE FROM t WHERE <untranslatable predicate>` — subqueries
  * (`k IN (SELECT …)`, correlated `EXISTS`), arithmetic shapes —
  * lowered to one position-delete delta snapshot over the same
  * read-match-commit machinery as UPDATE. Pushable predicates never
  * reach here (the rewrite leaves them to the `SupportsDelete` path). */
case class GraftDeleteCommand(path: String, table: TableDef,
    targetOutput: Seq[Attribute],
    condition: GraftCond) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftRowLevelExec.runDelete(spark, path, table, targetOutput,
      condition.e)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON ... WHEN ...` lowered to one delta
  * snapshot. The resolved source plan rides as a field (not a child:
  * commands are leaves — the plan executes inside [[run]]). */
case class GraftMergeCommand(path: String, table: TableDef,
    targetOutput: Seq[Attribute], source: LogicalPlan,
    mergeCondition: Expression, matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftRowLevelExec.runMerge(spark, path, table, targetOutput, source,
      mergeCondition, matchedActions, notMatchedActions,
      notMatchedBySourceActions)
    Seq.empty
  }
}

private[v2] object GraftRowLevelExec {

  private val FileCol = "__graft_file"
  private val PosCol = "__graft_pos"

  private def requireNoWap(spark: SparkSession, what: String): Unit =
    require(Option(spark.conf.get("graft.wap.branch", null))
      .forall(_.isEmpty),
      s"graft.wap.branch is set: $what writes to main, not the audit " +
        "branch — publish/abandon the branch or unset the conf")

  /** Rewrite a command expression against the renamed join surface:
    * every resolved attribute of the ORIGINAL target/source plans maps
    * (by exprId) to its positional `__t_i` / `__s_i` column, then the
    * expression re-resolves against the working DataFrame. */
  private def remap(e: Expression, byId: Map[ExprId, String]): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference if byId.contains(a.exprId) =>
        UnresolvedAttribute(Seq(byId(a.exprId)))
    })

  /** The assigned-column name of one SET clause (flat schemas only). */
  private def keyName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"unsupported assignment target $other — the engine's schemas " +
        "are flat (no nested-field assignment)")
  }

  /** Map each target attribute to the matching net-read column name
    * (case-insensitive — SQL resolution is, the reader's metadata
    * casing wins). */
  private def netColOf(net: DataFrame, a: Attribute): String =
    net.columns.find(_.equalsIgnoreCase(a.name)).getOrElse(
      throw new IllegalStateException(
        s"target column ${a.name} missing from the snapshot read " +
          s"(have: ${net.columns.mkString(", ")})"))

  /** Target-side rename columns, CAST to the relation's attribute
    * types: legacy identity-partition columns surface STRING-typed
    * from the directory restore, and a condition comparing them under
    * their declared type must see the declared type. */
  private def renamedTarget(net: DataFrame, targetOutput: Seq[Attribute],
      extra: Seq[Column]): DataFrame =
    net.select(targetOutput.zipWithIndex.map { case (a, i) =>
      col(netColOf(net, a)).cast(a.dataType).as(s"__t_$i")
    } ++ extra: _*)

  /** File-pruning bounds from a row-level command's condition: the
    * conjuncts that compare a TARGET column against literals translate
    * into the same [[graft.sources.IcebergPruning.ColumnBound]]s the
    * read faces push — so `UPDATE ... WHERE day = X` / a MERGE whose
    * ON clause carries a target-literal range opens only the files
    * that can match. Best-effort and RELAXED by construction (the
    * exact predicate re-applies row-level); untranslatable shapes
    * contribute nothing. */
  private[v2] def conditionBounds(cond: Expression,
      targetOutput: Seq[Attribute], table: TableDef)
      : Seq[graft.sources.IcebergPruning.ColumnBound] = {
    import org.apache.spark.sql.catalyst.expressions._
    import graft.sources.IcebergPruning
    import graft.sources.IcebergPruning.ColumnBound
    val nameOf = targetOutput.map(a => a.exprId -> a.name).toMap
    def colOk(a: AttributeReference): Option[String] =
      nameOf.get(a.exprId).flatMap(n =>
        table.columns.map(_.name).find(_.equalsIgnoreCase(n)))
        .filter(n => IcebergPruning.isComparableType(
          IcebergPruning.icebergTypeOf(table, n)))
    def ext(l: Literal): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType)
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        colOk(a).map(ColumnBound.eq(_, ext(l)))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        colOk(a).map(ColumnBound.eq(_, ext(l)))
      case GreaterThan(a: AttributeReference, l: Literal) if l.value != null =>
        colOk(a).map(ColumnBound.gt(_, ext(l)))
      case GreaterThan(l: Literal, a: AttributeReference) if l.value != null =>
        colOk(a).map(ColumnBound.lt(_, ext(l)))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        colOk(a).map(c => ColumnBound(c, lower = Some(ext(l))))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        colOk(a).map(c => ColumnBound(c, upper = Some(ext(l))))
      case LessThan(a: AttributeReference, l: Literal) if l.value != null =>
        colOk(a).map(ColumnBound.lt(_, ext(l)))
      case LessThan(l: Literal, a: AttributeReference) if l.value != null =>
        colOk(a).map(ColumnBound.gt(_, ext(l)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
        colOk(a).map(c => ColumnBound(c, upper = Some(ext(l))))
      case LessThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
        colOk(a).map(c => ColumnBound(c, lower = Some(ext(l))))
      case In(a: AttributeReference, vs) if vs.nonEmpty &&
          vs.forall { case l: Literal => l.value != null; case _ => false } =>
        colOk(a).map(ColumnBound.in(_,
          vs.map(v => ext(v.asInstanceOf[Literal]))))
      case IsNull(a: AttributeReference) => colOk(a).map(ColumnBound.isNull)
      case IsNotNull(a: AttributeReference) => colOk(a).map(ColumnBound.notNull)
      case _ => None
    }
  }

  /** Write `rows` as fresh data files under a unique `data/` subdir in
    * the table's declared layout (partition transforms re-applied) and
    * list them for the commit. Empty input writes nothing. */
  private def writeDeltaFiles(spark: SparkSession, table: TableDef,
      path: String, rows: DataFrame): Seq[IcebergSnapshot.DataFileInfo] = {
    if (rows.isEmpty) return Nil
    val sub = s"$path/data/delta-${java.util.UUID.randomUUID().toString.take(12)}"
    graft.api.SchemaTranslator.writeMigrated(rows, table, sub)
    IcebergSnapshot.listDataFiles(new org.apache.hadoop.fs.Path(sub),
      table, spark.sparkContext.hadoopConfiguration)
      .filter(_.recordCount > 0)
  }

  /** Filter the RENAMED snapshot read by the ORIGINAL Catalyst
    * condition — subqueries included: the condition's target
    * attributes (and the `OuterReference`s correlated subqueries wrap
    * around them) remap BY EXPRID onto the read plan's resolved
    * attributes, then the filter re-analyzes over that plan while the
    * captured subquery plans execute as-is. An outer ref the remap
    * cannot reach (nested two subquery levels deep) fails analysis
    * LOUDLY — never a wrong row set. Shared by the UPDATE and DELETE
    * lowerings. */
  private def deepFilter(spark: SparkSession, renamed: DataFrame,
      targetOutput: Seq[Attribute], condition: Expression): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{OuterReference, SubqueryExpression}
    val netPlan = PlanBridge.analyzed(renamed)
    val attrOf: Map[ExprId, Attribute] = targetOutput.zipWithIndex.map {
      case (a, i) => a.exprId -> netPlan.output(i)
    }.toMap
    val remapped = condition.transform {
      case a: AttributeReference if attrOf.contains(a.exprId) => attrOf(a.exprId)
      case s: SubqueryExpression =>
        s.withNewPlan(s.plan.transformAllExpressions {
          case OuterReference(a: AttributeReference)
              if attrOf.contains(a.exprId) =>
            OuterReference(attrOf(a.exprId).asInstanceOf[AttributeReference])
        })
    }
    PlanBridge.ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, netPlan))
  }

  /** DELETE with a predicate the pushdown path refused: read the net
    * rows with their (file, pos) identity, filter by the ORIGINAL
    * Catalyst condition — subqueries included — and commit the
    * position deletes. The condition's target attributes (and the
    * `OuterReference`s correlated subqueries wrap around them) remap
    * by exprId onto the snapshot read's resolved attributes, so the
    * re-analysis of the filter resolves them against the read plan
    * while the subquery plans execute as captured. Anything the remap
    * cannot reach (an outer ref nested two subquery levels deep) fails
    * analysis LOUDLY — never a wrong-set delete. */
  def runDelete(spark: SparkSession, path: String, table: TableDef,
      targetOutput: Seq[Attribute], condition: Expression): Unit = {
    requireNoWap(spark, "DELETE")
    IcebergSnapshot.withCommitRetry() {
      val baseHead = IcebergSnapshot.currentSnapshotId(path,
        spark.sparkContext.hadoopConfiguration)
      // literal conjuncts still prune files (subquery conjuncts simply
      // contribute no bound); the exact predicate re-applies row-level
      val pruning = conditionBounds(condition, targetOutput, table)
      val net = IcebergSnapshot.readSnapshot(spark, path, table,
        snapshotId = baseHead, pruning = pruning, keepRowMeta = true)
      val renamed = renamedTarget(net, targetOutput,
        Seq(col(FileCol), col(PosCol)))
      val matched = deepFilter(spark, renamed, targetOutput, condition)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // no matching rows: a no-op, the version must not advance
        if (!matched.isEmpty) {
          IcebergDeletes.commitRowDelta(spark, table, path,
            matched.select(col(FileCol), col(PosCol)), Nil,
            expectedHeadId = baseHead)
          ()
        }
      } finally { matched.unpersist(); () }
    }
  }

  def runUpdate(spark: SparkSession, path: String, table: TableDef,
      targetOutput: Seq[Attribute], assignments: Seq[Assignment],
      condition: Option[Expression]): Unit = {
    requireNoWap(spark, "UPDATE")
    val declared = graft.api.SchemaTranslator.toSparkSchema(table)
    val assignOf: Map[String, Expression] =
      assignments.map(a => keyName(a).toLowerCase -> a.value).toMap
    // the whole read-match-write-commit is the retry unit: a lost
    // version race re-reads the new head and re-derives the row set
    IcebergSnapshot.withCommitRetry() {
      // PIN the read to the head observed now and hand that id to the
      // commit: a snapshot landing between this read and the commit
      // (DELETE, compaction, another MERGE) is DETECTED as a conflict
      // and retried, never silently committed over (the documented
      // linearization guarantee, enforced end to end)
      val baseHead = IcebergSnapshot.currentSnapshotId(path,
        spark.sparkContext.hadoopConfiguration)
      // the condition's literal conjuncts prune FILES before any row
      // is read — `UPDATE ... WHERE day = X` touches one partition's
      // files at 100 TB, not the table
      val pruning = condition
        .map(conditionBounds(_, targetOutput, table)).getOrElse(Nil)
      val net = IcebergSnapshot.readSnapshot(spark, path, table,
        snapshotId = baseHead, pruning = pruning, keepRowMeta = true)
      val byId = targetOutput.zipWithIndex
        .map { case (a, i) => a.exprId -> s"__t_$i" }.toMap
      val renamed = renamedTarget(net, targetOutput,
        Seq(col(FileCol), col(PosCol)))
      // deepFilter, not a plain remap: the WHERE may carry subqueries
      // (`UPDATE ... WHERE k IN (SELECT ...)`)
      val matched = condition.map(c =>
        deepFilter(spark, renamed, targetOutput, c))
        .getOrElse(renamed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // no matching rows (or an empty table): a no-op, not an empty
        // snapshot — the table version must not advance
        if (!matched.isEmpty) {
          val deletes = matched.select(col(FileCol), col(PosCol))
          val updated = matched.select(targetOutput.zipWithIndex.map {
            case (a, i) =>
              val f = declared(declared.fieldNames
                .indexWhere(_.equalsIgnoreCase(a.name)))
              assignOf.get(a.name.toLowerCase)
                .map(e => remap(e, byId)).getOrElse(col(s"__t_$i"))
                .cast(f.dataType).as(f.name, f.metadata)
          }: _*)
          val newFiles = writeDeltaFiles(spark, table, path, updated)
          IcebergDeletes.commitRowDelta(spark, table, path, deletes,
            newFiles, expectedHeadId = baseHead)
          ()
        }
      } finally { matched.unpersist(); () }
    }
  }

  def runMerge(spark: SparkSession, path: String, table: TableDef,
      targetOutput: Seq[Attribute], source: LogicalPlan,
      mergeCondition: Expression, matchedActions: Seq[MergeAction],
      notMatchedActions: Seq[MergeAction],
      notMatchedBySourceActions: Seq[MergeAction]): Unit = {
    requireNoWap(spark, "MERGE INTO")
    val declared = graft.api.SchemaTranslator.toSparkSchema(table)
    val sOut = source.output
    val m = matchedActions.size
    val b = notMatchedBySourceActions.size
    // global action order: matched ++ by-source ++ not-matched; every
    // action in the first two groups deletes its target row (UPDATE =
    // delete + reinsert), every Update/Insert action produces a row
    val allActions = matchedActions ++ notMatchedBySourceActions ++
      notMatchedActions
    val producing: Seq[(Int, Seq[Assignment], Boolean)] =
      allActions.zipWithIndex.collect {
        case (UpdateAction(_, asgs, _), i) => (i, asgs, true)
        case (InsertAction(_, asgs), i) => (i, asgs, false)
      }
    IcebergSnapshot.withCommitRetry() {
      // pin the read and hand the id to the commit — see runUpdate
      val baseHead = IcebergSnapshot.currentSnapshotId(path,
        spark.sparkContext.hadoopConfiguration)
      // target-vs-literal ON conjuncts prune target FILES — but only
      // when no NOT MATCHED BY SOURCE actions exist: a pruned row is
      // provably unmatched (it fails the ON clause), which is exactly
      // the row those actions need to see
      val pruning =
        if (notMatchedBySourceActions.isEmpty)
          conditionBounds(mergeCondition, targetOutput, table)
        else Nil
      val net = IcebergSnapshot.readSnapshot(spark, path, table,
        snapshotId = baseHead, pruning = pruning, keepRowMeta = true)
      val byId = (targetOutput.zipWithIndex.map {
        case (a, i) => a.exprId -> s"__t_$i"
      } ++ sOut.zipWithIndex.map {
        case (a, i) => a.exprId -> s"__s_$i"
      }).toMap
      val tRenamed = renamedTarget(net, targetOutput,
        Seq(col(FileCol), col(PosCol), lit(true).as("__t_present")))
      val sourceDf = PlanBridge.ofRows(spark, source)
      val sRenamed = sourceDf.toDF(sOut.indices.map(i => s"__s_$i"): _*)
        .withColumn("__s_present", lit(true))
      // the join keeps exactly the rows some action group can claim:
      // matched pairs always; source-only rows only when NOT MATCHED
      // actions exist; target-only rows only for NOT MATCHED BY SOURCE
      val joinType = (notMatchedActions.nonEmpty,
        notMatchedBySourceActions.nonEmpty) match {
        case (true, true) => "full_outer"
        case (true, false) => "right_outer"
        case (false, true) => "left_outer"
        case (false, false) => "inner"
      }
      val joined = tRenamed.join(sRenamed,
        remap(mergeCondition, byId), joinType)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val isMatched =
          col("__t_present").isNotNull && col("__s_present").isNotNull
        // SQL cardinality rule: a target row matched by MORE than one
        // source row is ambiguous when matched actions exist
        if (matchedActions.nonEmpty) {
          val dup = joined.filter(isMatched)
            .groupBy(col(FileCol), col(PosCol)).count()
            .filter(col("count") > 1).limit(1).count()
          require(dup == 0L,
            "MERGE cardinality violation: a target row matched more " +
              "than one source row — make the ON condition identify " +
              "at most one source row per target row")
        }
        // first-applicable-action index per row (null = untouched)
        def chain(actions: Seq[MergeAction], offset: Int): Column =
          actions.zipWithIndex.foldRight(
            lit(null).cast("int"): Column) { case ((a, i), els) =>
            when(a.condition.map(c => remap(c, byId))
              .getOrElse(lit(true)), lit(offset + i)).otherwise(els)
          }
        val act =
          when(isMatched, chain(matchedActions, 0))
            .when(col("__t_present").isNotNull &&
              col("__s_present").isNull,
              chain(notMatchedBySourceActions, m))
            .otherwise(chain(notMatchedActions, m + b))
        val tagged = joined.withColumn("__act", act)
        // every claimed matched/by-source row's (file, pos) dies; the
        // update/insert faces re-emit their replacement rows
        val deletes = tagged
          .filter(col("__act").isNotNull && col("__act") < lit(m + b))
          .select(col(FileCol), col(PosCol))
        val inserts =
          if (producing.isEmpty) None
          else Some(tagged
            .filter(col("__act").isin(producing.map(_._1): _*))
            .select(targetOutput.zipWithIndex.map { case (a, i) =>
              val f = declared(declared.fieldNames
                .indexWhere(_.equalsIgnoreCase(a.name)))
              val c = producing.foldRight(
                lit(null).cast(f.dataType): Column) {
                case ((idx, asgs, isUpdate), els) =>
                  val v = asgs.find(g =>
                    keyName(g).equalsIgnoreCase(a.name))
                    .map(g => remap(g.value, byId))
                    .getOrElse(if (isUpdate) col(s"__t_$i")
                    else lit(null).cast(f.dataType))
                  when(col("__act") === lit(idx), v).otherwise(els)
              }
              c.cast(f.dataType).as(f.name, f.metadata)
            }: _*))
        val newFiles = inserts
          .map(df => writeDeltaFiles(spark, table, path, df))
          .getOrElse(Nil)
        IcebergDeletes.commitRowDelta(spark, table, path, deletes,
          newFiles, expectedHeadId = baseHead)
        ()
      } finally { joined.unpersist(); () }
    }
  }
}
