package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, Cast, CaseWhen, Coalesce, EqualTo, Expression, Literal, Not, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.BooleanType

import graft.storage.TieredTable

/** SQL `UPDATE` and `MERGE INTO` for tiered tables — the two DML verbs
  * DSv2 routes through row-level-operation plans ([[UpdateTable]] /
  * [[MergeIntoTable]]). The reference's engine exposes UPDATE/DELETE on
  * primary-key tables through SQL (Fluss's PK-table DML surface; DELETE
  * already rides DSv2 `SupportsDelete` in [[TieredSqlTable]]); this rule
  * completes the DML triangle by lowering the ANALYZED plans onto the
  * storage layer's tested copy-on-write verbs
  * [[TieredTable.updateWhere]] / [[TieredTable.merge]] — the same
  * pre-DSv2 lowering shape Delta Lake uses (analyzer rule →
  * RunnableCommand), chosen over `SupportsRowLevelOperations` because
  * the storage layer already owns a whole-table copy-on-write commit:
  * Spark's group-based rewrite machinery would re-implement the same
  * full-state rewrite with more moving parts and no added parallelism.
  *
  * Scale shape: the heavy lifting stays in the storage verbs — one
  * distributed filter+rewrite for UPDATE, one shuffled (or broadcast)
  * full-outer join for MERGE. The rule itself only rewires expressions:
  * resolved attribute references are re-anchored by NAME (`t.`/`s.`
  * aliases for the two merge sides), so the verbs' DataFrame plans
  * resolve them against the committed snapshot at execution time.
  *
  * Unsupported SQL shapes refuse loudly AT ANALYSIS (non-equi ON,
  * differently-named key columns, >1 UPDATE or DELETE clause per
  * WHEN family, non-identity INSERT values, subqueries in
  * predicates) — never silently approximated. Supported beyond the
  * basics: `WHEN NOT MATCHED AND <cond> THEN INSERT` (source-side
  * conditions), `WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE`
  * (target-side conditions — the dim-sync shape), and `MERGE WITH
  * SCHEMA EVOLUTION` (star-form: source-only columns join the target
  * as nullable).
  */
object RowLevelSql {

  private[plans] def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> s"graft row-level SQL: $msg"))

  private def noSubquery(e: Expression, verb: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      fail(s"subqueries in $verb predicates/assignments are not supported " +
        "on tiered tables")

  /** Re-anchor a resolved expression into name-space: every attribute
    * reference becomes an [[UnresolvedAttribute]] with the qualifier
    * prefix its side demands (empty for single-table UPDATE, `t`/`s`
    * for the merge join's aliases), and the result is wrapped as a
    * [[Column]]. The storage verbs re-resolve the names against their
    * own DataFrames, so execution is ordinary Catalyst over the
    * committed snapshot. Returning Column (not Expression) also keeps
    * the deliberately-unresolved tree OUT of the command plan node's
    * expression list — CheckAnalysis would reject unresolved
    * attributes inside a command's expressions.
    */
  private def reanchor(e: Expression, verb: String,
                       sideOf: AttributeReference => Seq[String]): Column = {
    noSubquery(e, verb)
    org.apache.spark.sql.GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(sideOf(a) :+ a.name)
    })
  }

  /** NULL-as-false wrapper for clause conditions (SQL's WHEN ...
    * AND <cond> matches only on TRUE).
    */
  private def hit(e: Expression): Expression =
    Coalesce(Seq(e, Literal(false, BooleanType)))

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Assignment key must be a plain top-level column. */
  private def keyName(a: Assignment, verb: String): String = a.key match {
    case k: AttributeReference => k.name
    case other => fail(s"$verb can only assign top-level columns, " +
      s"got ${other.sql}")
  }

  // ---------------- UPDATE ----------------

  private[plans] def lowerUpdate(tst: TieredSqlTable,
                                 u: UpdateTable): LogicalPlan = {
    val anchor = (_: AttributeReference) => Nil: Seq[String]
    val cond = u.condition.map(reanchor(_, "UPDATE", anchor))
    val assigns = u.assignments.map { a =>
      keyName(a, "UPDATE") -> reanchor(a.value, "UPDATE", anchor)
    }
    GraftUpdateCommand(tst.catalogEntry, assigns, cond)
  }

  // ---------------- DELETE ----------------

  /** SQL DELETE with an ARBITRARY predicate. [[TieredSqlTable]]'s DSv2
    * `SupportsDelete` already serves deletes whose predicates translate
    * to data-source filters; this lowering (which wins the analyzer
    * race by running in the resolution batch) removes that limit —
    * any deterministic, subquery-free expression works, through the
    * identical storage verb. The hot-tail/empty-table behaviors match
    * `TieredSqlTable.deleteWhere` exactly.
    */
  private[plans] def lowerDelete(tst: TieredSqlTable,
                                 d: DeleteFromTable): LogicalPlan = {
    val anchor = (_: AttributeReference) => Nil: Seq[String]
    GraftDeleteCommand(tst.catalogEntry,
      reanchor(d.condition, "DELETE", anchor))
  }

  // ---------------- MERGE ----------------

  /** ON must be a conjunction of same-named target/source column
    * equalities — [[TieredTable.merge]]'s key-join contract (and the
    * shape every PK-table merge uses). Returns the key column names.
    */
  private def eqKeys(e: Expression, tSet: AttributeSet,
                     sSet: AttributeSet): Seq[String] = e match {
    case And(l, r) => eqKeys(l, tSet, sSet) ++ eqKeys(r, tSet, sSet)
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      val (ta, sa) =
        if (tSet.contains(a) && sSet.contains(b)) (a, b)
        else if (sSet.contains(a) && tSet.contains(b)) (b, a)
        else fail("MERGE ON must equate a target column with a source column")
      if (!ta.name.equalsIgnoreCase(sa.name))
        fail(s"MERGE ON ${ta.name} = ${sa.name}: tiered-table merge joins " +
          "on shared column names — alias the source column to the target " +
          "name in the source query")
      Seq(ta.name)
    case other => fail("MERGE ON must be a conjunction of column " +
      s"equalities, got ${other.sql}")
  }

  private[plans] def lowerMerge(tst: TieredSqlTable,
                                m: MergeIntoTable): LogicalPlan = {
    val tSet = AttributeSet(m.targetTable.output)
    val sSet = AttributeSet(m.sourceTable.output)
    val sideOf = (a: AttributeReference) =>
      if (tSet.contains(a)) Seq("t")
      else if (sSet.contains(a)) Seq("s")
      else fail(s"reference ${a.name} resolves to neither MERGE side")
    noSubquery(m.mergeCondition, "MERGE")
    val on = eqKeys(m.mergeCondition, tSet, sSet).distinct

    // MERGE WITH SCHEMA EVOLUTION (Delta's star-form semantics):
    // source-only columns become new nullable target columns. Spark's
    // analyzer NARROWS star-assignments to the current target schema
    // even with the keyword (verified against 4.1), so the evolution
    // set is derived from the source-vs-target diff — GATED on a
    // star-form clause being present: `UPDATE SET *` / `INSERT *`
    // arrive as identity assignments covering EVERY target column,
    // while an explicit SET list covers a subset and must not evolve
    // anything it never mentioned (an explicit NEW column in a SET
    // list fails resolution before this rule).
    def coversAllTargetCols(assigns: Seq[Assignment]): Boolean =
      m.targetTable.output.forall(tc => assigns.exists(_.key match {
        case k: AttributeReference => k.name.equalsIgnoreCase(tc.name)
        case _ => false
      }))
    val starForm = m.matchedActions.exists {
      case u: UpdateAction => coversAllTargetCols(u.assignments)
      case _ => false
    } || m.notMatchedActions.exists {
      case i: InsertAction => coversAllTargetCols(i.assignments)
      case _ => false
    }
    val evolveCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      if (!m.withSchemaEvolution || !starForm) Nil
      else m.sourceTable.output
        .filterNot(sa => tSet.exists(_.name.equalsIgnoreCase(sa.name)))
        .map(sa => sa.name -> sa.dataType)

    // WHEN MATCHED: at most one UPDATE and one DELETE clause; SQL's
    // first-match-wins ordering is encoded exactly — a second clause
    // fires only where the first clause's condition does not.
    val (upd, del) = m.matchedActions match {
      case Seq() => (None, None)
      case Seq(u: UpdateAction) => (Some((u, true)), None)
      case Seq(d: DeleteAction) => (None, Some((d, true)))
      case Seq(d: DeleteAction, u: UpdateAction) =>
        (Some((u, false)), Some((d, true)))
      case Seq(u: UpdateAction, d: DeleteAction) =>
        (Some((u, true)), Some((d, false)))
      case other => fail("WHEN MATCHED supports at most one UPDATE and " +
        s"one DELETE clause, got ${other.size} clauses")
    }
    upd.foreach { case (u, _) => u.condition.foreach(noSubquery(_, "MERGE")) }
    del.foreach { case (d, _) => d.condition.foreach(noSubquery(_, "MERGE")) }

    // delete predicate in the joined t/s name-space, honoring order:
    // [DELETE d, UPDATE] → d; [UPDATE u, DELETE d] → NOT u AND d
    // (an unconditional first UPDATE leaves the DELETE unreachable).
    val deleteCond: Option[Column] = del.flatMap { case (d, first) =>
      val dc = d.condition.map(hit).getOrElse(Literal(true, BooleanType))
      if (first) Some(dc)
      else upd.get._1.condition match {
        case None => None // unconditional UPDATE first: DELETE is dead
        case Some(uc) => Some(And(Not(hit(uc)), dc))
      }
    }.map(reanchor(_, "MERGE", sideOf))

    // update assignments; a conditional clause guards each value with
    // CASE WHEN <cond> THEN <value> ELSE <current target value> END
    // (rows routed to DELETE never reach the update branch — the
    // storage verb excludes them before assignment).
    val updAssigns: Seq[(String, Column)] = upd.toSeq.flatMap {
      case (u, _) =>
        u.assignments.flatMap { a =>
          val name = keyName(a, "MERGE UPDATE")
          if (!tSet.exists(_.name.equalsIgnoreCase(name)))
            fail(s"MERGE UPDATE assigns unknown target column $name")
          // `UPDATE SET *` expands to every column INCLUDING the join
          // key as `k = s.k` — tautological under the equi-join (the
          // matched rows' values are equal by ON), so drop it rather
          // than trip the key-is-identity guard; any NON-identity
          // assignment to a key column still refuses downstream.
          val identityOnKey = on.exists(_.equalsIgnoreCase(name)) &&
            (stripCast(a.value) match {
              case v: AttributeReference =>
                sSet.contains(v) && v.name.equalsIgnoreCase(name)
              case _ => false
            })
          if (identityOnKey) None
          else {
            val value = u.condition match {
              case None => a.value
              case Some(c) =>
                CaseWhen(Seq((hit(c), a.value)), Some(a.key))
            }
            Some(name -> reanchor(value, "MERGE", sideOf))
          }
        }
    }

    // WHEN NOT MATCHED: identity-by-name insert only (INSERT * / the
    // aligned equivalent) — the storage verb inserts source rows
    // resolved to the target schema by name. NULL literals are legal
    // for target columns the source does not carry (alignment fills
    // them); anything else is a reshaping insert we refuse.
    // evolution + WHEN MATCHED UPDATE: the new columns update from
    // the source under the SAME clause condition as the user's update
    // (a conditional SET * guards every column it sets; the evolved
    // columns behave identically). No matched-update clause → new
    // columns arrive only through inserts.
    val evolvedAssigns: Seq[(String, Column)] = upd.toSeq
      .filter { case (u, _) => coversAllTargetCols(u.assignments) }
      .flatMap { case (u, _) => evolveCols.map { case (n, _) =>
        val src = UnresolvedAttribute(Seq("s", n))
        val value: Expression = u.condition match {
          case None => src
          case Some(c) =>
            CaseWhen(Seq((hit(c), src)), Some(UnresolvedAttribute(Seq("t", n))))
        }
        n -> org.apache.spark.sql.GraftSqlBridge.column(value.transform {
          case a: AttributeReference => UnresolvedAttribute(sideOf(a) :+ a.name)
        })
      } }

    // WHEN NOT MATCHED BY SOURCE (target rows no source row matched):
    // same clause grammar as WHEN MATCHED — at most one UPDATE and one
    // DELETE, first-match-wins — applied to the full-outer join's
    // target-only leg. Conditions see only the target side (the source
    // side is NULL for these rows; Spark scopes resolution so).
    val (bsUpd, bsDel) = m.notMatchedBySourceActions match {
      case Seq() => (None, None)
      case Seq(u: UpdateAction) => (Some((u, true)), None)
      case Seq(d: DeleteAction) => (None, Some((d, true)))
      case Seq(d: DeleteAction, u: UpdateAction) =>
        (Some((u, false)), Some((d, true)))
      case Seq(u: UpdateAction, d: DeleteAction) =>
        (Some((u, true)), Some((d, false)))
      case other => fail("WHEN NOT MATCHED BY SOURCE supports at most " +
        s"one UPDATE and one DELETE clause, got ${other.size} clauses")
    }
    bsUpd.foreach { case (u, _) => u.condition.foreach(noSubquery(_, "MERGE")) }
    bsDel.foreach { case (d, _) => d.condition.foreach(noSubquery(_, "MERGE")) }
    val bySourceDelete: Option[Column] = bsDel.flatMap { case (d, first) =>
      val dc = d.condition.map(hit).getOrElse(Literal(true, BooleanType))
      if (first) Some(dc)
      else bsUpd.get._1.condition match {
        case None => None // unconditional UPDATE first: DELETE is dead
        case Some(uc) => Some(And(Not(hit(uc)), dc))
      }
    }.map(reanchor(_, "MERGE", sideOf))
    val bySourceAssigns: Seq[(String, Column)] = bsUpd.toSeq.flatMap {
      case (u, _) =>
        u.assignments.flatMap { a =>
          val name = keyName(a, "MERGE NOT MATCHED BY SOURCE UPDATE")
          if (!tSet.exists(_.name.equalsIgnoreCase(name)))
            fail("MERGE NOT MATCHED BY SOURCE UPDATE assigns unknown " +
              s"target column $name")
          // identity assignment (t.c = t.c, the SET * expansion shape)
          // is a no-op — drop it
          val identity = stripCast(a.value) match {
            case v: AttributeReference =>
              tSet.contains(v) && v.name.equalsIgnoreCase(name)
            case _ => false
          }
          if (identity) None
          else {
            val value = u.condition match {
              case None => a.value
              case Some(c) => CaseWhen(Seq((hit(c), a.value)), Some(a.key))
            }
            Some(name -> reanchor(value, "MERGE", sideOf))
          }
        }
    }

    val sourceNames = m.sourceTable.output.map(_.name)
    var insertCond: Option[Column] = None
    val insert = m.notMatchedActions match {
      case Seq() => false
      case Seq(i: InsertAction) =>
        // WHEN NOT MATCHED AND <cond> THEN INSERT — the condition may
        // reference only the SOURCE side (the target row doesn't exist
        // for an unmatched source row; SQL and Spark both scope it so)
        insertCond = i.condition.map { c =>
          noSubquery(c, "MERGE")
          c.references.foreach {
            case a: AttributeReference if tSet.contains(a) =>
              fail(s"WHEN NOT MATCHED condition references target " +
                s"column ${a.name} — unmatched rows have no target side")
            case _ => ()
          }
          reanchor(hit(c), "MERGE", sideOf)
        }
        i.assignments.foreach { a =>
          val name = keyName(a, "MERGE INSERT")
          stripCast(a.value) match {
            case v: AttributeReference
              if sSet.contains(v) && v.name.equalsIgnoreCase(name) => ()
            case Literal(null, _)
              if !sourceNames.exists(_.equalsIgnoreCase(name)) => ()
            case other => fail("MERGE INSERT must set each column to the " +
              s"same-named source column (use INSERT *); column $name got " +
              s"${other.sql}")
          }
        }
        true
      case other => fail("WHEN NOT MATCHED supports a single " +
        s"unconditional INSERT clause, got ${other.size} clauses")
    }

    GraftMergeCommand(tst.catalogEntry, SourceHolder(m.sourceTable), on,
      updAssigns ++ evolvedAssigns, deleteCond, insert, insertCond,
      bySourceAssigns, bySourceDelete, evolveCols)
  }

  private[plans] def tieredOf(session: SparkSession,
                              e: TieredCatalog.Entry): TieredTable =
    TieredTable(session, e.path, e.pk, e.mergeOnRead, e.partitionBy,
      e.bloomCols, changeDataFeed = e.changeDataFeed)
}

/** Analyzer rule converting resolved UPDATE / MERGE plans over tiered
  * tables into eager commands. Injected by [[GraftExtensions]]; plans
  * over non-graft tables pass through untouched (Spark then raises its
  * own "table does not support row-level operations").
  */
case class GraftRowLevelRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def tieredTarget(p: LogicalPlan): Option[TieredSqlTable] = p match {
    case SubqueryAlias(_, child) => tieredTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: TieredSqlTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      tieredTarget(u.table).fold(plan)(RowLevelSql.lowerUpdate(_, u))
    case m: MergeIntoTable if m.resolved =>
      tieredTarget(m.targetTable).fold(plan)(RowLevelSql.lowerMerge(_, m))
    case d: DeleteFromTable if d.resolved =>
      tieredTarget(d.table).fold(plan)(RowLevelSql.lowerDelete(_, d))
    case _ => plan
  }
}

/** Execution node for `UPDATE graft.<db>.<t> SET ... [WHERE ...]` —
  * runs the storage layer's copy-on-write [[TieredTable.updateWhere]]
  * (one distributed rewrite commit; `+U` rows in the change feed).
  */
case class GraftUpdateCommand(entry: TieredCatalog.Entry,
    assignments: Seq[(String, Column)], condition: Option[Column])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = RowLevelSql.tieredOf(session, entry)
    import org.apache.spark.sql.functions.lit
    t.updateWhere(condition.getOrElse(lit(true)), assignments.toMap)
    Seq.empty
  }
}

/** Execution node for `DELETE FROM graft.<db>.<t> WHERE <any expr>` —
  * the storage layer's copy-on-write [[TieredTable.deleteWhere]] with
  * the same preconditions [[TieredSqlTable.deleteWhere]] applies (an
  * empty table is a no-op; a hot-only table names tier() as the fix).
  */
case class GraftDeleteCommand(entry: TieredCatalog.Entry, condition: Column)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = RowLevelSql.tieredOf(session, entry)
    if (t.latestSnapshotId == 0L && t.logSegments.isEmpty) return Seq.empty
    if (t.currentSnapshot.isEmpty)
      throw new IllegalStateException(
        s"table at ${entry.path} has un-tiered hot log segments and no " +
          "snapshot; tier() before DELETE")
    t.deleteWhere(condition)
    Seq.empty
  }
}

/** Execution node for `MERGE INTO graft.<db>.<t> USING ...` — runs
  * [[TieredTable.merge]] (one full-outer key join, broadcast when the
  * source is small; SQL's multi-match ambiguity check included).
  */
case class GraftMergeCommand(entry: TieredCatalog.Entry,
    sourcePlan: SourceHolder, on: Seq[String],
    updateAssigns: Seq[(String, Column)],
    deleteCond: Option[Column], insert: Boolean,
    insertCond: Option[Column] = None,
    bySourceAssigns: Seq[(String, Column)] = Nil,
    bySourceDelete: Option[Column] = None,
    evolveCols: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = RowLevelSql.tieredOf(session, entry)
    val source =
      org.apache.spark.sql.GraftSqlBridge.ofRows(session, sourcePlan.plan)
    val committed = t.merge(source, on,
      whenMatchedUpdate = updateAssigns.toMap,
      whenMatchedDelete = deleteCond,
      whenNotMatchedInsert = insert,
      whenNotMatchedCond = insertCond,
      whenNotMatchedBySourceUpdate = bySourceAssigns.toMap,
      whenNotMatchedBySourceDelete = bySourceDelete,
      evolveColumns = evolveCols)
    // evolution also advances the DECLARED schema (when one exists —
    // CREATE TABLE wrote it; API-registered tables have none), so the
    // catalog's empty-table resolution and INSERT checking see the
    // new columns too. ONLY after the merge COMMITTED: a refused or
    // no-op merge must not leave a phantom column no snapshot carries
    if (evolveCols.nonEmpty && committed.isDefined) {
      val fs = graft.storage.TableFs.forPath(entry.path)
      val metaP = s"${entry.path}/meta/SCHEMA"
      fs.readString(metaP).foreach { ddl =>
        val cur = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        val add = evolveCols.filterNot { case (n, _) =>
          cur.fieldNames.exists(_.equalsIgnoreCase(n)) }
        if (add.nonEmpty)
          fs.writeString(metaP, add.foldLeft(cur) { case (st, (n, dt)) =>
            st.add(n, dt, nullable = true) }.toDDL)
      }
    }
    Seq.empty
  }
}

/** Opaque wrapper keeping the (already-analyzed) MERGE source plan out
  * of the command node's child/expression traversal — the command runs
  * it as-is via Dataset.ofRows.
  */
case class SourceHolder(plan: LogicalPlan) {
  override def toString: String = "source"
}
