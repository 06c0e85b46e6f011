package graft.io

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SQL DML over the table format: an `INSERT INTO` / `INSERT
  * OVERWRITE` / `DELETE FROM` / `UPDATE` whose target resolves to a
  * [[ManifestFileIndex]]-backed relation is rewritten into a manifest
  * COMMIT ([[TableFormat.append]] / [[TableFormat.replace]] /
  * [[TableFormat.deleteWhere]] / [[TableFormat.updateWhere]]) — the
  * public Delta-lake pattern of intercepting row-level commands at
  * resolution time. For the insert forms the rule is mandatory for
  * correctness, not a convenience: without it Spark's own
  * `DataSourceAnalysis` (a post-hoc rule — injected resolution rules
  * run first) classifies the relation by its `HadoopFsRelation` shape
  * and plans a raw file write into the table ROOT — parquet landing
  * outside any commit, invisible to every snapshot, stranded from
  * vacuum. With the rule, the full SQL lifecycle works against the
  * registered provider:
  * {{{
  *   CREATE TABLE t USING `graft…Provider` OPTIONS (path '…')  -- register
  *   CREATE TABLE t USING … AS SELECT …                        -- CTAS (writer path)
  *   INSERT INTO t SELECT … / VALUES …                         -- append commit
  *   INSERT INTO t (b, a) VALUES …         -- column list, absent → NULL
  *   INSERT OVERWRITE t SELECT …                               -- replace commit
  *   DELETE FROM t WHERE k BETWEEN 10 AND 20   -- zone-map-pruned rewrite
  *   UPDATE t SET s = concat(s, '!') WHERE k = 7  -- simultaneous, typed
  * }}}
  * DELETE/UPDATE conditions prune at the manifest level through the
  * SAME predicate-tree evaluator the read path uses, so a range
  * delete rewrites the intersecting dirs and carries the rest
  * verbatim; for v1 relations Spark would otherwise refuse both
  * statements outright ("only supported with v2 tables").
  * Rows align to the table schema by POSITION (the SQL default), by
  * NAME under `byName`/an explicit column list (absent columns
  * null-fill), with casts to the declared field types — resolved here,
  * while the analyzer still owns the plan. The commit records the zone
  * maps/blooms the table was DECLARED with (`statsCols`/`bloomCol`
  * options ride on the relation's file index), so SQL-inserted data
  * prunes like Scala-landed data. PARTITION specs refuse: layout is
  * the manifest's concern (compactRanged/compactZOrder).
  *
  * A dv-bearing head refuses upstream (the one-relation read contract
  * in [[TableFormat.manifestRelation]]), so an insert can never race
  * its own target's masked rows. Registered by
  * [[graft.GraftExtensions]]; spec'd in `TableFormatSqlSpec`.
  */
final class GraftDmlRule extends Rule[LogicalPlan] {

  /** (relation, fsRelation, index) when `p` is a manifest-backed
    * LogicalRelation — the target test for INSERT, which the analyzer
    * resolves through the v1 path (`FindDataSourceTable`).
    */
  private def target(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, ManifestFileIndex)] =
    p match {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case m: ManifestFileIndex => Some((l, fs, m))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  /** (root, writeOpts, catalog ident) when `p` targets a graft table —
    * DELETE/UPDATE resolve through the V2 path (a
    * `DataSourceV2Relation` wrapping the session catalog's `V1Table`),
    * never `FindDataSourceTable`, so the provider must be recognized
    * from the catalog metadata; temp views over the provider still
    * arrive as LogicalRelation and match through [[target]].
    */
  private def dmlTarget(p: LogicalPlan): Option[(String,
      Map[String, String],
      Option[org.apache.spark.sql.catalyst.TableIdentifier])] = p match {
    case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      dmlTarget(a.child) // row-level commands keep the name wrapper
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      org.apache.spark.sql.graftbridge.ColumnBridge.v1Table(r.table)
        .filter(_.provider.exists(pr =>
          pr == classOf[TableFormatSourceProvider].getName ||
            pr == "graft-table"))
        .map { ct =>
          val raw = ct.storage.properties.get("path")
            .orElse(ct.storage.properties.get("Path"))
            .orElse(ct.storage.locationUri.map(_.toString))
            .getOrElse(throw new IllegalArgumentException(
              s"graft table ${ct.identifier} has no path/location"))
          (TableFormat.posixRoot(raw), ct.storage.properties,
            Some(ct.identifier))
        }
    case _ => target(p).map { case (l, _, m) =>
      (m.root, m.writeOpts, l.catalogTable.map(_.identifier))
    }
  }

  /** Guard + pass-through: the command carries the RESOLVED expression
    * (CheckAnalysis walks command expression fields — an unresolved
    * attribute there fails analysis), and re-anchors it on column
    * names at RUN time ([[GraftDmlRule.rebind]]) against the fresh
    * read. Subqueries refuse here, at resolution, where the error
    * position is still the statement.
    */
  private def unbind(e: Expression): Expression = {
    require(!e.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]),
      "graft-table DML supports subqueries only as the whole condition " +
        "`<key> [NOT] IN (SELECT …)` (NOT IN: single-column; " +
        "correlated NOT IN with equality correlation only — tuple " +
        "NOT IN has three-valued tuple semantics no anti-join " +
        "expresses; spell the complement as NOT EXISTS) or `[NOT] " +
        "EXISTS (SELECT … WHERE inner = outer [AND …])` (equality " +
        "correlation only) — stage other shapes into a frame and use " +
        "deleteKeys/updateKeys/merge")
    e
  }

  /** The supported SUBQUERY condition (round-16 VERDICT #5): the WHOLE
    * condition is `<target column> IN (<uncorrelated subquery>)` — the
    * canonical GDPR-erasure statement. The command materializes the
    * subquery into a key frame at RUN time and lands through the
    * key-pruned paths ([[TableFormat.deleteKeys]]/
    * [[TableFormat.updateKeys]]), where pruning comes from the key
    * VALUES (zone maps + blooms) — a static predicate tree cannot
    * prune a subquery. Correlated subqueries, NOT IN (different null
    * semantics), EXISTS, and conjunct combinations keep refusing
    * through [[unbind]].
    */
  /** A supported IN-VALUE expression: a bare target column or the
    * analyzer's UP-cast of one (lossless ⇒ injective, so comparing in
    * the key's own declared domain after a round-trip filter is
    * sound). One matcher serves IN, correlated IN, and correlated
    * NOT IN — the value-resolution rule cannot drift between them.
    */
  private def targetValueName(e: Expression, target: LogicalPlan)
      : Option[String] = e match {
    case a: AttributeReference if target.outputSet.contains(a) =>
      Some(a.name)
    case c @ Cast(a: AttributeReference, _, _, _)
        if target.outputSet.contains(a) &&
          Cast.canUpCast(a.dataType, c.dataType) => Some(a.name)
    case _ => None
  }

  private def keysSubquery(cond: Expression, target: LogicalPlan)
      : Option[(Seq[String], LogicalPlan)] = cond match {
    case org.apache.spark.sql.catalyst.expressions.InSubquery(vs,
        q: org.apache.spark.sql.catalyst.expressions.ListQuery)
        if q.outerAttrs.isEmpty && q.plan.output.length == vs.length =>
      // each value a target column (or the analyzer's UP-cast of one —
      // lossless ⇒ injective, so comparing in the key's own declared
      // domain after a round-trip filter is sound; a lossy shape like
      // a string key vs an int list collapses '01' and '1' and refuses
      // through [[unbind]] instead of matching the wrong rows). The
      // TUPLE form `(k1, k2) IN (SELECT …)` (r18) lands copy-on-write
      // per tuple — multi-column anti-join, never a concatenation.
      val names = vs.map(targetValueName(_, target))
      if (names.forall(_.isDefined) &&
          names.flatten.map(_.toLowerCase).distinct.size == names.size)
        Some((names.flatten, q.plan))
      else None
    case _ => None
  }

  /** DECORRELATION (r19 — the r18 VERDICT's #3 gap): the idiomatic
    * purge statements
    * {{{
    *   DELETE FROM t WHERE EXISTS
    *     (SELECT 1 FROM s WHERE s.k = t.k AND s.flag = 1)
    *   UPDATE t SET … WHERE k IN (SELECT k FROM s WHERE s.g = t.g)
    * }}}
    * decorrelate to exactly the key frame the key-pruned commands
    * already consume: each correlated EQUALITY conjunct `inner = outer`
    * contributes a (target column, inner value) pair, the residual
    * (outer-free) conjuncts stay on the subquery, and the rewritten
    * UNCORRELATED plan projects the inner values — a semi-join key set
    * for DELETE, the same for UPDATE. One pair lands key-pruned
    * ([[TableFormat.deleteKeys]]/[[TableFormat.updateKeys]]); several
    * land as a tuple (merge-on-read, like tuple IN). Supported shape:
    * the subquery is `[Project over] Filter` whose correlated conjuncts
    * are all top-level equalities between an inner attribute and an
    * outer target column (up-casts tolerated on either side — the
    * command's round-trip guard keeps the coerced comparison sound);
    * non-equality correlation, correlation below joins/aggregates, and
    * NOT EXISTS keep refusing loudly through [[unbind]].
    */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  // strip analyzer type-reconciliation up-casts — the commands
  // re-derive the comparison in the key's declared domain with a
  // round-trip guard, so only injective casts may be peeled
  private def bareUp(e: Expression): Expression = e match {
    case c @ Cast(ch, _, _, _) if Cast.canUpCast(ch.dataType, c.dataType)
      => bareUp(ch)
    case x => x
  }

  /** One correlated conjunct → (target column name, inner value). */
  private def corrPair(e: Expression, inner: LogicalPlan,
      target: LogicalPlan): Option[(String, AttributeReference)] = {
    import org.apache.spark.sql.catalyst.expressions.OuterReference
    e match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(x, y) =>
        (bareUp(x), bareUp(y)) match {
          case (a: AttributeReference, OuterReference(t: AttributeReference))
              if inner.outputSet.contains(a) &&
                target.outputSet.contains(t) => Some((t.name, a))
          case (OuterReference(t: AttributeReference), a: AttributeReference)
              if inner.outputSet.contains(a) &&
                target.outputSet.contains(t) => Some((t.name, a))
          case _ => None
        }
      case _ => None
    }
  }

  /** The [Project over] Filter body → (pairs, residual-filtered child)
    * when EVERY outer-referencing conjunct is a supported equality.
    */
  private def corrBody(plan: LogicalPlan, target: LogicalPlan)
      : Option[(Seq[(String, AttributeReference)], LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.OuterReference
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val f = plan match {
      case Project(_, fl: Filter) => Some(fl)
      case fl: Filter => Some(fl)
      case _ => None
    }
    f.flatMap { fl =>
      val (corr, residual) = conjuncts(fl.condition).partition(
        _.exists(_.isInstanceOf[OuterReference]))
      val pairs = corr.map(corrPair(_, fl.child, target))
      if (corr.isEmpty || pairs.exists(_.isEmpty)) None
      else Some((pairs.flatten,
        residual.reduceOption(
          org.apache.spark.sql.catalyst.expressions.And(_, _))
          .map(Filter(_, fl.child)).getOrElse(fl.child)))
    }
  }

  private def existsSubquery(cond: Expression, target: LogicalPlan)
      : Option[(Seq[String], LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, ListQuery}
    def body(plan: LogicalPlan) = corrBody(plan, target)
    cond match {
      case e: Exists if e.outerAttrs.nonEmpty =>
        body(e.plan).flatMap { case (pairs, stripped) =>
          val names = pairs.map(_._1)
          if (names.map(_.toLowerCase).distinct.size != names.size) None
          else Some((names, Project(pairs.map(_._2), stripped)))
        }
      case InSubquery(vs, q: ListQuery)
          if q.outerAttrs.nonEmpty && q.plan.output.length == vs.length =>
        // the IN values resolve like the uncorrelated form; the
        // correlated equalities append their pairs to the tuple
        val valueNames = vs.map(targetValueName(_, target))
        q.plan match {
          case Project(list, _) if valueNames.forall(_.isDefined) =>
            body(q.plan).flatMap { case (pairs, stripped) =>
              val names = valueNames.flatten ++ pairs.map(_._1)
              if (names.map(_.toLowerCase).distinct.size != names.size)
                None
              else Some((names,
                Project(list ++ pairs.map(_._2), stripped)))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** The COMPLEMENT shapes (r19): `NOT EXISTS (SELECT … WHERE inner =
    * outer …)` decorrelates exactly like [[existsSubquery]] — the inner
    * `Exists` is handed to it verbatim — and single-column uncorrelated
    * `k NOT IN (SELECT …)` reuses [[keysSubquery]]'s value matching.
    * Both land through the anti commands ([[DeleteAntiKeysGraftTableCommand]]
    * /[[UpdateAntiKeysGraftTableCommand]]): rows matching NO frame row
    * are the statement's footprint. The boolean is `keepNullKeys` —
    * NOT IN's three-valued logic keeps NULL-keyed rows (UNKNOWN),
    * NOT EXISTS deletes/updates them (a correlated equality against
    * NULL is never TRUE). Tuple NOT IN (3VL over tuples: one non-null
    * unequal component makes the disequality TRUE, not UNKNOWN — a
    * semantics no anti-join expresses) and CORRELATED NOT IN keep
    * refusing loudly through [[unbind]], each with NOT EXISTS named as
    * the unambiguous spelling.
    */
  private def antiSubquery(cond: Expression, target: LogicalPlan)
      : Option[(Seq[String], LogicalPlan, Boolean)] = {
    import org.apache.spark.sql.catalyst.expressions.{Exists, InSubquery, ListQuery, Not}
    cond match {
      case Not(e: Exists) if e.outerAttrs.nonEmpty =>
        existsSubquery(e, target).map { case (ks, p) => (ks, p, false) }
      case Not(in @ InSubquery(_, q: ListQuery)) if q.outerAttrs.isEmpty =>
        keysSubquery(in, target).collect {
          case (ks, p) if ks.size == 1 => (ks, p, true)
        }
      case _ => None
    }
  }

  /** CORRELATED single-column `NOT IN` (r20 — the r19 VERDICT #2):
    * {{{
    *   DELETE FROM t WHERE k NOT IN (SELECT v FROM s WHERE s.j = t.m …)
    * }}}
    * decorrelates the equality conjuncts exactly like NOT EXISTS but
    * keeps NOT IN's three-valued gate PER MATCHED GROUP: a row whose
    * group (the inner rows with `s.j = row.m`) is EMPTY is TRUE —
    * NULL-keyed rows included, `x NOT IN (∅)`; a group holding an
    * inner NULL can never make the predicate TRUE (every disequality
    * conjunct against it is UNKNOWN at best) — the row keeps; a
    * non-null group is the ordinary anti test, UNKNOWN for a NULL
    * outer `k`. Returns (outer value column, correlation column
    * names, decorrelated frame plan projecting `__graft_na_v` +
    * `__graft_na_g<j>`). Tuple NOT IN — correlated or not — keeps
    * refusing through [[unbind]]: its tuple three-valued semantics is
    * not expressible as any per-column anti-join.
    */
  private def corrAntiIn(cond: Expression, target: LogicalPlan)
      : Option[(String, Seq[String], LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, InSubquery, ListQuery, Not, OuterReference}
    cond match {
      case Not(InSubquery(vs, q: ListQuery))
          if q.outerAttrs.nonEmpty && vs.length == 1 &&
            q.plan.output.length == 1 =>
        val valueName = targetValueName(vs.head, target)
        q.plan match {
          case Project(list, _)
              if valueName.isDefined && list.length == 1 &&
                !list.head.exists(_.isInstanceOf[OuterReference]) =>
            corrBody(q.plan, target).flatMap { case (pairs, stripped) =>
              val names = valueName.get +: pairs.map(_._1)
              if (names.map(_.toLowerCase).distinct.size != names.size)
                None
              else Some((valueName.get, pairs.map(_._1),
                Project(Alias(list.head, "__graft_na_v")() +:
                  pairs.zipWithIndex.map { case ((_, ia), j) =>
                    Alias(ia, s"__graft_na_g$j")() }, stripped)))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** CONJUNCT-COMPOSED subquery conditions (r19b): the guarded purge
    * {{{
    *   DELETE FROM t WHERE k IN (SELECT …) AND status = '…' [AND …]
    *   UPDATE t SET … WHERE EXISTS (SELECT … WHERE s.k = t.k) AND …
    * }}}
    * — EXACTLY ONE conjunct is a supported positive IN/EXISTS subquery
    * (the whole-condition matchers applied to that conjunct), every
    * other conjunct is subquery-free and becomes the STATIC RESIDUAL.
    * Lands through [[TableFormat.deleteKeysWhere]]/[[TableFormat.updateKeysWhere]]
    * — a keep-filtered copy-on-write, because the footprint is a
    * ROW-SUBSET of the matched keys (duplicate-key rows where only one
    * satisfies the residual) that the key-based fast paths cannot
    * express — with COMPOSED pruning: key zone-map/bloom split ∧ the
    * residual's bounds walk. NOT-shaped conjuncts and multiple
    * subquery conjuncts keep refusing through [[unbind]].
    */
  private def composedKeys(cond: Expression, target: LogicalPlan)
      : Option[(Seq[String], LogicalPlan, Expression)] = {
    val cs = conjuncts(cond)
    if (cs.size < 2) None
    else {
      val (subq, static) = cs.partition(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      if (subq.size != 1) None
      else (keysSubquery(subq.head, target)
        .orElse(existsSubquery(subq.head, target))).map { case (ks, p) =>
        (ks, p, static.reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _)))
      }
    }
  }

  /** Correlated SCALAR-SUBQUERY decorrelation (r19b, generalized r20):
    * the idiomatic enrich shapes
    * {{{
    *   (SELECT max(x) FROM s WHERE s.j = t.k [AND …])
    *   (SELECT max(x) FROM s WHERE s.j = t.k [AND …] GROUP BY s.j)
    * }}}
    * decorrelate to a per-key AGGREGATE FRAME: the correlated equality
    * conjuncts become GROUP BY keys (residual inner-only conjuncts stay
    * as a filter), the value joins back per key, and rows with NO
    * matching group take the EMPTY-GROUP value. The empty-group value
    * differs by shape and is evaluated, never assumed: an UNGROUPED
    * aggregate over no matches still returns one row (`count(*)` is 0
    * — the classic decorrelation count bug; `max`/`sum` are NULL),
    * while a GROUPED aggregate over no matches returns ZERO rows — the
    * scalar is NULL even for `count(*)`. A grouped subquery is
    * accepted only when every group key is PINNED by a correlated
    * equality (group keys ⊆ correlation attrs) — the one shape that is
    * provably single-row per outer row; anything else refuses at the
    * caller. Uncorrelated ungrouped aggregates land as a one-row
    * literal. Returns (target key names, per-key frame plan with
    * stable `__graft_sq_k*`/`__graft_sq_val` names, empty-group plan).
    */
  private def scalarAssign(s0: org.apache.spark.sql.catalyst.expressions.ScalarSubquery,
      target: LogicalPlan)
      : Option[(Seq[String], LogicalPlan, LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, OuterReference}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, OneRowRelation}
    def decorr(a: Alias, child: LogicalPlan,
        accept: Seq[(String, AttributeReference)] => Boolean,
        emptyOf: LogicalPlan => LogicalPlan)
        : Option[(Seq[String], LogicalPlan, LogicalPlan)] =
      corrBody(child, target).flatMap { case (pairs, stripped) =>
        val names = pairs.map(_._1)
        if (names.map(_.toLowerCase).distinct.size != names.size ||
          !accept(pairs)) None
        else {
          val grouped = Aggregate(pairs.map(_._2),
            (pairs.map(_._2): Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]) :+ a,
            stripped, None)
          val frame = Project(
            pairs.zipWithIndex.map { case ((_, ia), j) =>
              Alias(ia, s"__graft_sq_k$j")() } :+
              Alias(a.toAttribute, "__graft_sq_val")(), grouped)
          Some((names, frame, emptyOf(stripped)))
        }
      }
    s0.plan match {
      case Aggregate(Nil, Seq(a: Alias), child, _)
          if !a.exists(_.isInstanceOf[OuterReference]) =>
        if (s0.outerAttrs.isEmpty)
          // uncorrelated ungrouped aggregate: exactly one row — the
          // command evaluates it once and assigns the literal
          Some((Nil, s0.plan, s0.plan))
        else decorr(a, child, _ => true, stripped =>
          Aggregate(Nil, Seq(a),
            Filter(Literal.FalseLiteral, stripped), None))
      case Aggregate(gkeys, Seq(a: Alias), child, _)
          if gkeys.nonEmpty && s0.outerAttrs.nonEmpty &&
            !a.exists(_.isInstanceOf[OuterReference]) =>
        // GROUPED (r20): scalar only because every group key is pinned
        // by a correlated equality; grouping the decorrelated frame by
        // ALL correlation attrs (a superset of the group keys — the
        // extra attrs are constant within each matched group) is
        // value-preserving. No matching group → the subquery returns
        // zero rows → NULL, even for count(*).
        decorr(a, child,
          pairs => gkeys.forall(gk => bareUp(gk) match {
            case at: AttributeReference =>
              pairs.exists(_._2.exprId == at.exprId)
            case _ => false
          }),
          _ => Project(Seq(Alias(
            Literal.create(null, a.dataType), a.name)()), OneRowRelation()))
      case _ => None
    }
  }

  /** An assignment VALUE carrying scalar subqueries (r20 — the r19
    * whole-value shape generalized per the r19 VERDICT #3): every
    * `ScalarSubquery` inside the value must be a
    * [[scalarAssign]]-supported aggregate shape; each is decorrelated
    * and replaced by a placeholder attribute inside the RESERVED
    * `__graft_sq_a_` namespace ([[joinScalars]] refuses a table whose
    * own columns collide — the r19 ADVICE low). Everything AROUND the
    * subquery — arithmetic, `CASE`, and user-written casts — stays in
    * the rewritten expression and evaluates over the joined value, so
    * `SET v = CAST((SELECT avg…) AS INT)` truncates exactly as written
    * (the r19 ADVICE medium: an unconditional cast-peel silently
    * dropped the user's lossy cast). `AssertNotNull` wrappers are
    * stripped first — they are the analyzer's non-nullability
    * INFERENCE from the relation's data so far, not a declared
    * constraint, and the empty-group value is legitimately NULL.
    */
  private def scalarValue(value: Expression, target: LogicalPlan,
      phBase: Int)
      : Option[(Expression,
        Seq[(String, Seq[String], LogicalPlan, LogicalPlan)])] = {
    import org.apache.spark.sql.catalyst.expressions.{ScalarSubquery, SubqueryExpression}
    val noAssert = value.transform {
      case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
        a.child
    }
    val buf = scala.collection.mutable.Buffer
      .empty[(String, Seq[String], LogicalPlan, LogicalPlan)]
    var ok = true
    val rewritten = noAssert.transform {
      case s: ScalarSubquery =>
        scalarAssign(s, target) match {
          case Some((ks, f, e)) =>
            val nm = s"__graft_sq_a_ph${phBase + buf.size}"
            buf += ((nm, ks, f, e))
            AttributeReference(nm, s.dataType, nullable = true)()
          case None => ok = false; s
        }
    }
    if (!ok || rewritten.exists(_.isInstanceOf[SubqueryExpression])) None
    else Some((rewritten, buf.toSeq))
  }

  /** SCALAR SUBQUERIES IN THE WHERE CLAUSE (r19b): the comparison
    * purge/update
    * {{{
    *   DELETE FROM t WHERE v < (SELECT avg(x) FROM s WHERE s.k = t.k)
    *   UPDATE t SET … WHERE v >= (SELECT max(x) FROM s WHERE s.j = t.g)
    *                    AND status = '…'
    * }}}
    * — every `ScalarSubquery` in the condition must be the
    * [[scalarAssign]]-supported ungrouped-aggregate shape; each is
    * decorrelated and replaced by a placeholder attribute the command
    * materializes from a per-key join at run time (empty groups take
    * the aggregate's empty-group value, so `v < (SELECT avg …)` over a
    * matchless row compares against NULL → UNKNOWN → the row carries,
    * and a `count(*)` comparison sees 0 — SQL-exact). Returns
    * (rewritten condition, scalar parts, subquery-free PRUNE conjuncts
    * — a dir they exclude holds no affected row whatever the subquery
    * values are). Mixing scalar subqueries with IN/EXISTS in one
    * condition, or an unsupported scalar shape, refuses loudly here.
    */
  private def scalarCond(cond: Expression, target: LogicalPlan)
      : Option[(Expression,
        Seq[(String, Seq[String], LogicalPlan, LogicalPlan)],
        Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{ScalarSubquery, SubqueryExpression}
    if (!cond.exists(_.isInstanceOf[ScalarSubquery])) return None
    val buf = scala.collection.mutable.Buffer
      .empty[(String, Seq[String], LogicalPlan, LogicalPlan)]
    var bad: Option[String] = None
    val rewritten = cond.transform {
      case s: ScalarSubquery =>
        scalarAssign(s, target) match {
          case Some((ks, f, e)) =>
            // placeholders live INSIDE the reserved __graft_sq_c_
            // namespace, so [[joinScalars]]' collision require covers
            // them — a table column named like a placeholder refuses
            // loudly instead of silently taking the scalar's value
            // (r19 ADVICE, low)
            val nm = s"__graft_sq_c_ph${buf.size}"
            buf += ((nm, ks, f, e))
            AttributeReference(nm, s.dataType, nullable = true)()
          case None =>
            bad = Some("an unsupported scalar-subquery shape"); s
        }
    }
    if (rewritten.exists(_.isInstanceOf[SubqueryExpression]))
      throw new IllegalArgumentException(
        "graft-table DML supports scalar subqueries in WHERE only as " +
          "`(SELECT <one ungrouped aggregate> FROM s [WHERE s.j = t.k " +
          "AND …])` compared/combined with subquery-free expressions — " +
          bad.getOrElse("it cannot mix with IN/EXISTS in one condition") +
          "; stage the subquery into a frame and use " +
          "deleteWhere/updateWhere")
    val prune = conjuncts(cond)
      .filterNot(_.exists(_.isInstanceOf[SubqueryExpression]))
      .reduceOption(org.apache.spark.sql.catalyst.expressions.And(_, _))
      .getOrElse(Literal.TrueLiteral)
    Some((rewritten, buf.toSeq, prune))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved =>
        target(i.table) match {
          case Some((l, fs, m)) => rewrite(i, l, fs, m)
          case None => i
        }
      case d: DeleteFromTable if d.resolved =>
        dmlTarget(d.table) match {
          case Some((root, opts, ident)) =>
            keysSubquery(d.condition, d.table)
              .orElse(existsSubquery(d.condition, d.table)) match {
              case Some((keys, sub)) =>
                DeleteKeysGraftTableCommand(root, opts, keys, sub, ident)
              case None => antiSubquery(d.condition, d.table) match {
                case Some((keys, sub, keepNull)) =>
                  DeleteAntiKeysGraftTableCommand(root, opts, keys, sub,
                    keepNull, ident)
                case None => corrAntiIn(d.condition, d.table) match {
                  case Some((valCol, corrCols, sub)) =>
                    DeleteCorrAntiGraftTableCommand(root, opts, valCol,
                      corrCols, sub, ident)
                  case None => composedKeys(d.condition, d.table) match {
                  case Some((keys, sub, extra)) =>
                    DeleteKeysWhereGraftTableCommand(root, opts, keys,
                      sub, extra, ident)
                  case None => scalarCond(d.condition, d.table) match {
                    case Some((rw, subs, prune)) =>
                      DeleteScalarCondGraftTableCommand(root, opts, rw,
                        prune, subs, ident)
                    case None => DeleteFromGraftTableCommand(root, opts,
                      unbind(d.condition), ident)
                  }
                  }
                }
              }
            }
          case None => d
        }
      case u: UpdateTable if u.resolved =>
        dmlTarget(u.table) match {
          case Some((root, opts, ident))
              if u.assignments.exists(_.value.exists(_.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.ScalarSubquery])) =>
            // scalar-subquery assignments (r19b): every subquery-bearing
            // value must be the supported whole-value aggregate shape
            val (scalA, plainA) = u.assignments.partition(
              _.value.exists(_.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.ScalarSubquery]))
            def nameOf(a: org.apache.spark.sql.catalyst.plans.logical.Assignment)
                : String = a.key match {
              case at: Attribute => at.name
              case other => throw new IllegalArgumentException(
                "graft-table UPDATE can only assign top-level " +
                  s"columns, got ${other.sql}")
            }
            val sParts = scala.collection.mutable.Buffer
              .empty[(String, Seq[String], LogicalPlan, LogicalPlan)]
            val scalarAssigns = scalA.map { a =>
              val n = nameOf(a)
              scalarValue(a.value, u.table, sParts.size) match {
                case Some((rw, parts)) => sParts ++= parts; n -> rw
                case None => throw new IllegalArgumentException(
                  "graft-table UPDATE supports scalar subqueries in " +
                    "SET only shaped `(SELECT <one aggregate> FROM s " +
                    "[WHERE s.j = t.k AND …] [GROUP BY <correlated " +
                    "keys>])` (equality correlation only), composed " +
                    "with subquery-free expressions — " +
                    s"`$n` is assigned an unsupported shape; stage " +
                    "the subquery into a frame and use merge")
              }
            }
            val plainAssigns = plainA.map(a => nameOf(a) -> unbind(a.value))
            // the condition may carry scalar subqueries of its own
            val (condExpr, condSubs, prune) = u.condition match {
              case None => (Literal.TrueLiteral,
                Seq.empty[(String, Seq[String], LogicalPlan, LogicalPlan)],
                None)
              case Some(c) => scalarCond(c, u.table) match {
                case Some((rw, subs, p)) => (rw, subs, Some(p))
                case None => (unbind(c), Nil, None)
              }
            }
            UpdateScalarGraftTableCommand(root, opts, condExpr, prune,
              plainAssigns, scalarAssigns, sParts.toSeq, condSubs, ident)
          case Some((root, opts, ident)) =>
            val assigns = u.assignments.map { a =>
              val name = a.key match {
                case at: Attribute => at.name
                case other => throw new IllegalArgumentException(
                  "graft-table UPDATE can only assign top-level " +
                    s"columns, got ${other.sql}")
              }
              name -> unbind(a.value)
            }
            u.condition.flatMap(c => keysSubquery(c, u.table)
              .orElse(existsSubquery(c, u.table))) match {
              case Some((keys, sub)) =>
                UpdateKeysGraftTableCommand(root, opts, keys, sub,
                  assigns, ident)
              case None =>
                u.condition.flatMap(antiSubquery(_, u.table)) match {
                  case Some((keys, sub, keepNull)) =>
                    UpdateAntiKeysGraftTableCommand(root, opts, keys, sub,
                      keepNull, assigns, ident)
                  case None =>
                   u.condition.flatMap(corrAntiIn(_, u.table)) match {
                    case Some((valCol, corrCols, sub)) =>
                      UpdateCorrAntiGraftTableCommand(root, opts, valCol,
                        corrCols, sub, assigns, ident)
                    case None =>
                    u.condition.flatMap(composedKeys(_, u.table)) match {
                      case Some((keys, sub, extra)) =>
                        UpdateKeysWhereGraftTableCommand(root, opts, keys,
                          sub, extra, assigns, ident)
                      case None =>
                        u.condition.flatMap(scalarCond(_, u.table)) match {
                          case Some((rw, subs, p)) =>
                            UpdateScalarGraftTableCommand(root, opts, rw,
                              Some(p), assigns, Nil, Nil, subs, ident)
                          case None => UpdateGraftTableCommand(root, opts,
                            u.condition.map(unbind)
                              .getOrElse(Literal.TrueLiteral),
                            assigns, ident)
                        }
                    }
                   }
                }
            }
          case None => u
        }
      case mt: MergeIntoTable
          if mt.targetTable.resolved && mt.sourceTable.resolved &&
            mt.mergeCondition.resolved &&
            (mt.matchedActions ++ mt.notMatchedActions ++
              mt.notMatchedBySourceActions).forall(actionResolved) =>
        dmlTarget(mt.targetTable) match {
          case Some((root, opts, ident)) => rewriteMerge(mt, root, opts, ident)
          case None => mt
        }
    }

  /** Wait for every clause's condition and assignments to resolve
    * before intercepting — the analyzer's fixed point may hand us the
    * statement mid-resolution.
    */
  private def actionResolved(
      a: org.apache.spark.sql.catalyst.plans.logical.MergeAction)
      : Boolean =
    a.condition.forall(_.resolved) && (a match {
      case u: UpdateAction =>
        u.assignments.forall(x => x.key.resolved && x.value.resolved)
      case i: InsertAction =>
        i.assignments.forall(x => x.key.resolved && x.value.resolved)
      case _ => true
    })

  /** The three STAR MERGE shapes → the key-anchored fast command
    * ([[MergeIntoGraftTableCommand]]); anything else that is still a
    * conditional/column-level row-level merge → the general
    * CASE-projected command ([[MergeIntoGraftTableCondCommand]]).
    * Star actions are accepted both raw and in the analyzer's identity
    * expansion (the fixed point may hand us either).
    */
  private def rewriteMerge(mt: MergeIntoTable, root: String,
      opts: Map[String, String],
      ident: Option[org.apache.spark.sql.catalyst.TableIdentifier])
      : LogicalPlan = {
    def refuse(what: String): Nothing = throw new IllegalArgumentException(
      s"graft-table MERGE supports UPDATE SET * / DELETE (matched) and " +
        s"INSERT * (not matched) on one key equality; $what — stage the " +
        "source into a frame and use TableFormat.merge/deleteKeys for " +
        "other shapes")
    val tOut = mt.targetTable.outputSet
    val sOut = mt.sourceTable.outputSet
    // WITH SCHEMA EVOLUTION (Delta's merge-evolution semantics): top-
    // level source columns absent from the target become new nullable
    // target columns, populated by the STAR actions — the appended
    // images carry the widened schema and the commit unions it into
    // the manifest (the format's ordinary widening evolution; existing
    // rows read null). Nested-struct evolution is out of scope — the
    // format's schema union refuses a retype, so a same-name struct
    // with new inner fields fails loudly there, never silently.
    val evolveCols: Seq[AttributeReference] =
      if (!mt.withSchemaEvolution) Nil
      else {
        val tNames = mt.targetTable.output.map(_.name.toLowerCase).toSet
        mt.sourceTable.output.collect {
          case a: AttributeReference if !tNames(a.name.toLowerCase) => a
        }
      }
    // the analyzer wraps both the ON keys and the `SET *` expansion in
    // type-reconciliation casts and nullability asserts — neither
    // changes WHICH column is meant (the command re-casts the aligned
    // source to the target's declared types anyway)
    def bare(e: Expression): Expression = e match {
      case c: Cast => bare(c.child)
      case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
        bare(a.child)
      case x => x
    }
    // the ON clause: one target-key = source-key equality, or an AND
    // of several (COMPOSITE key, r18 — lands copy-on-write through
    // [[TableFormat.applyCoWDelta]]; the merge-on-read mask is
    // single-key by construction)
    def eqPair(x0: Expression, y0: Expression): Option[(String, String)] =
      (bare(x0), bare(y0)) match {
        case (a: AttributeReference, b: AttributeReference)
            if tOut.contains(a) && sOut.contains(b) => Some((a.name, b.name))
        case (b: AttributeReference, a: AttributeReference)
            if tOut.contains(a) && sOut.contains(b) => Some((a.name, b.name))
        case _ => None
      }
    def keyPairs(c: Expression): Option[Seq[(String, String)]] = c match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        for (a <- keyPairs(l); b <- keyPairs(r)) yield a ++ b
      case org.apache.spark.sql.catalyst.expressions.EqualTo(x, y) =>
        eqPair(x, y).map(Seq(_))
      case _ => None
    }
    val keys: Seq[(String, String)] = keyPairs(mt.mergeCondition) match {
      case Some(ks) if ks.nonEmpty &&
          ks.map(_._1.toLowerCase).distinct.size == ks.size => ks
      case Some(ks) if ks.nonEmpty =>
        refuse(s"ON condition equates the same target column twice: " +
          s"${mt.mergeCondition.sql}")
      case _ => refuse(s"ON condition is not a conjunction of " +
        s"target-key = source-key equalities: ${mt.mergeCondition.sql}")
    }
    val (tk, sk) = keys.head
    val targetCols = mt.targetTable.output.map(_.name.toLowerCase)
    def isIdentity(assigns: Seq[Assignment]): Boolean = {
      val pairs = assigns.flatMap { a => (a.key, bare(a.value)) match {
        case (k: Attribute, v: AttributeReference)
            if sOut.contains(v) && k.name.equalsIgnoreCase(v.name) =>
          Some(k.name.toLowerCase)
        case _ => None
      }}
      pairs.length == assigns.length && pairs.toSet == targetCols.toSet
    }
    val matched = mt.matchedActions match {
      case Seq() => Some("none")
      case Seq(UpdateStarAction(None)) => Some("update")
      case Seq(UpdateAction(None, _, true)) => Some("update") // analyzer: SET *
      case Seq(UpdateAction(None, as, _)) if isIdentity(as) => Some("update")
      case Seq(DeleteAction(None)) => Some("delete")
      case _ => None
    }
    val notMatched = mt.notMatchedActions match {
      case Seq() => Some("none")
      case Seq(InsertStarAction(None)) => Some("insert")
      case Seq(InsertAction(None, as)) if isIdentity(as) => Some("insert")
      case _ => None
    }
    // evolution is carried by the STAR actions only (the analyzer
    // expands `SET *`/`INSERT *` over the target columns BEFORE this
    // rule runs, dropping source extras — UpdateAction keeps its
    // fromStar marker, and an insert clause's star-ness rides the
    // parse-time tag [[GraftSqlParser.InsertStarTag]], r19: an
    // EXPLICIT all-target-column identity list no longer silently
    // evolves). A merge whose actions reference nothing new routes as
    // an ordinary merge.
    val starIdx: Seq[Int] = mt
      .getTagValue(GraftSqlParser.InsertStarTag).getOrElse(Seq.empty)
    val evolve: Seq[AttributeReference] =
      if (evolveCols.isEmpty) Nil
      else if (mt.matchedActions.exists {
        case UpdateStarAction(_) => true
        case UpdateAction(_, _, true) => true
        case _ => false
      } || mt.notMatchedActions.zipWithIndex.exists {
        case (InsertStarAction(_), _) => true
        case (InsertAction(_, as), i) => isIdentity(as) && starIdx.contains(i)
        case _ => false
      }) evolveCols
      else Nil
    val starAction =
      if (mt.notMatchedBySourceActions.nonEmpty || evolve.nonEmpty ||
        keys.size > 1) None // general form only
      else (matched, notMatched) match {
        case (Some("update"), Some("insert")) => Some("upsert")
        case (Some("delete"), Some("none")) => Some("delete")
        case (Some("none"), Some("insert")) => Some("insert")
        case _ => None
      }
    starAction match {
      case Some(action) =>
        MergeIntoGraftTableCommand(root, opts, mt.sourceTable, tk, sk,
          action, ident)
      case None => // the general form: conditional / column-level actions
        condMerge(mt, root, opts, keys, ident, refuse, evolve, starIdx)
    }
  }

  /** The GENERAL MERGE shapes — `WHEN MATCHED [AND cond] THEN UPDATE
    * SET col = expr, …` / `… THEN DELETE` / `WHEN NOT MATCHED [AND
    * cond] THEN INSERT (cols) VALUES (exprs)`, any number of clauses,
    * first-match-wins — canonicalized into per-clause (condition,
    * assignment) lists for [[MergeIntoGraftTableCondCommand]]. Every
    * expression is re-anchored here, while target/source attr identity
    * is still known: a target column reference renames to
    * `__graft_t_<name>` and a source reference to `__graft_s_<name>`
    * (same exprIds — still resolved for CheckAnalysis), so the command
    * can rebind them by name over a prefix-renamed join at run time
    * without ambiguity when both sides share column names.
    */
  private def condMerge(mt: MergeIntoTable, root: String,
      opts: Map[String, String], keys: Seq[(String, String)],
      ident: Option[org.apache.spark.sql.catalyst.TableIdentifier],
      refuse: String => Nothing,
      evolve: Seq[AttributeReference] = Nil,
      starIdx: Seq[Int] = Nil): LogicalPlan = {
    val tOut = mt.targetTable.outputSet
    val sOut = mt.sourceTable.outputSet
    val srcByName = mt.sourceTable.output
      .map(a => a.name.toLowerCase -> a).toMap
    def pfx(e: Expression): Expression = unbind(e).transform {
      case a: AttributeReference if tOut.contains(a) =>
        a.withName(GraftDmlRule.TPfx + a.name)
      case a: AttributeReference if sOut.contains(a) =>
        a.withName(GraftDmlRule.SPfx + a.name)
    }
    // UNCORRELATED scalar subqueries in CLAUSE CONDITIONS (r20 — the
    // r19 VERDICT #6): `WHEN MATCHED AND t.v < (SELECT avg(x) FROM w)
    // THEN …` — the threshold shape of migration SQL. Each must be one
    // uncorrelated ungrouped aggregate (provably one row); it lifts
    // into a placeholder the command evaluates ONCE at run time and
    // feeds every clause as a literal column. Correlated or
    // non-aggregate shapes, and subqueries in ASSIGNED VALUES, keep
    // refusing loudly through [[unbind]] inside `pfx`.
    val mPh = scala.collection.mutable.Buffer
      .empty[(String, LogicalPlan)]
    def pfxCond(c: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
      import org.apache.spark.sql.catalyst.plans.logical.Aggregate
      val replaced = c.transform {
        case s: ScalarSubquery if s.outerAttrs.isEmpty => s.plan match {
          case Aggregate(Nil, Seq(_: org.apache.spark.sql.catalyst.expressions.Alias), _, _) =>
            val nm = s"__graft_sq_m_ph${mPh.size}"
            mPh += ((nm, s.plan))
            AttributeReference(nm, s.dataType, nullable = true)()
          case _ => refuse("a scalar subquery in a MERGE clause " +
            "condition must be one uncorrelated ungrouped aggregate " +
            s"(`(SELECT agg(x) FROM w [WHERE …])`), got ${s.plan}")
        }
      }
      pfx(replaced)
    }
    def named(k: Expression): String = k match {
      case at: Attribute => at.name
      case other => refuse(s"MERGE can only assign top-level target " +
        s"columns, got ${other.sql}")
    }
    // star assignments: identity over the target columns, plus the
    // evolution columns (source-populated) when WITH SCHEMA EVOLUTION
    // routed new columns here
    def identityAssigns: Seq[(String, Expression)] =
      mt.targetTable.output.map { t =>
        val s = srcByName.getOrElse(t.name.toLowerCase, refuse(
          s"MERGE … SET */INSERT * needs source column '${t.name}'"))
        t.name -> pfx(s)
      } ++ evolve.map(a => a.name -> pfx(a))
    val targetCols = mt.targetTable.output.map(_.name.toLowerCase)
    def isIdentity(assigns: Seq[Assignment]): Boolean = {
      def bare(e: Expression): Expression = e match {
        case c: Cast => bare(c.child)
        case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
          bare(a.child)
        case x => x
      }
      val pairs = assigns.flatMap { a => (a.key, bare(a.value)) match {
        case (k: Attribute, v: AttributeReference)
            if sOut.contains(v) && k.name.equalsIgnoreCase(v.name) =>
          Some(k.name.toLowerCase)
        case _ => None
      }}
      pairs.length == assigns.length && pairs.toSet == targetCols.toSet
    }
    val matchedSpecs: Seq[(Option[Expression],
        Option[Seq[(String, Expression)]])] =
      mt.matchedActions.map {
        case DeleteAction(c) => (c.map(pfxCond), None)
        case UpdateStarAction(c) => (c.map(pfxCond), Some(identityAssigns))
        case UpdateAction(c, _, true) => // analyzer-expanded SET * —
          // re-derive so evolution columns survive the expansion
          (c.map(pfxCond), Some(identityAssigns))
        case UpdateAction(c, as, _) =>
          (c.map(pfxCond), Some(as.map(a => named(a.key) -> pfx(a.value))))
        case other => refuse(s"unsupported matched action: $other")
      }
    val notMatchedSpecs: Seq[(Option[Expression],
        Seq[(String, Expression)])] =
      mt.notMatchedActions.zipWithIndex.map {
        case (InsertStarAction(c), _) => (c.map(pfxCond), identityAssigns)
        case (InsertAction(c, as), i)
            if evolve.nonEmpty && isIdentity(as) && starIdx.contains(i) =>
          // a GENUINE `INSERT *` (parse-time tag) carries the evolution
          // columns; an explicit all-target identity list does not —
          // its inserts read NULL there (r19)
          (c.map(pfxCond), identityAssigns)
        case (InsertAction(c, as), _) =>
          // an explicit column list may be PARTIAL (r20 pin): the
          // command's insert projection backfills unassigned columns
          // with NULL — the SQL default for an omitted insert column
          (c.map(pfxCond), as.map(a => named(a.key) -> pfx(a.value)))
        case (other, _) => refuse(s"unsupported not-matched action: $other")
      }
    // BY-SOURCE clauses see only target columns (the analyzer already
    // refuses source references there), so they share the matched
    // clauses' (cond, update-or-delete) shape
    val bySourceSpecs: Seq[(Option[Expression],
        Option[Seq[(String, Expression)]])] =
      mt.notMatchedBySourceActions.map {
        case DeleteAction(c) => (c.map(pfxCond), None)
        case UpdateAction(c, as, _) =>
          (c.map(pfxCond), Some(as.map(a => named(a.key) -> pfx(a.value))))
        case other =>
          refuse(s"unsupported not-matched-by-source action: $other")
      }
    MergeIntoGraftTableCondCommand(root, opts, mt.sourceTable, keys,
      matchedSpecs, notMatchedSpecs, bySourceSpecs, ident,
      evolve.map(a => a.name -> a.dataType), mPh.toSeq)
  }

  private def rewrite(i: InsertIntoStatement, l: LogicalRelation,
      fs: HadoopFsRelation, m: ManifestFileIndex): LogicalPlan = {
    require(i.partitionSpec.isEmpty,
      "graft-table insert does not take a PARTITION spec — the " +
        "table's layout is the manifest's concern " +
        "(compactRanged/compactZOrder)")
    val fields = fs.dataSchema.fields.toSeq
    val out = i.query.output
    val tz = Option(conf.sessionLocalTimeZone)
    def fit(e: NamedExpression,
        f: org.apache.spark.sql.types.StructField): NamedExpression =
      if (e.dataType == f.dataType && e.name == f.name) e
      else if (e.dataType == f.dataType) Alias(e, f.name)()
      else Alias(Cast(e, f.dataType, tz), f.name)()
    val projected: Seq[NamedExpression] =
      if (i.userSpecifiedCols.nonEmpty) {
        require(i.userSpecifiedCols.length == out.length,
          s"INSERT column list names ${i.userSpecifiedCols.length} " +
            s"columns but the query produces ${out.length}")
        val dup = i.userSpecifiedCols.groupBy(_.toLowerCase)
          .collectFirst { case (n, vs) if vs.length > 1 => n }
        require(dup.isEmpty, s"INSERT column list repeats '${dup.get}'")
        val known = fields.map(_.name.toLowerCase).toSet
        val unknown = i.userSpecifiedCols.filterNot(c =>
          known(c.toLowerCase))
        require(unknown.isEmpty,
          s"INSERT column list names ${unknown.mkString(", ")} which " +
            s"the table does not have (${fields.map(_.name).mkString(", ")})")
        val byCol = i.userSpecifiedCols.map(_.toLowerCase).zip(out).toMap
        fields.map { f =>
          byCol.get(f.name.toLowerCase) match {
            case Some(a) => fit(a, f)
            case None => Alias(Literal(null, f.dataType), f.name)()
          }
        }
      } else if (i.byName) {
        val byCol = out.map(a => a.name.toLowerCase -> a).toMap
        fields.map { f =>
          byCol.get(f.name.toLowerCase) match {
            case Some(a) => fit(a, f)
            case None => throw new IllegalArgumentException(
              s"INSERT BY NAME is missing table column '${f.name}'")
          }
        }
      } else {
        require(out.length == fields.length,
          s"INSERT produces ${out.length} columns but the table has " +
            s"${fields.length} (${fields.map(_.name).mkString(", ")})")
        fields.zip(out).map { case (f, a) => fit(a, f) }
      }
    InsertIntoGraftTableCommand(m.root, m.writeOpts,
      Project(projected, i.query), i.overwrite,
      l.catalogTable.map(_.identifier))
  }
}

/** The landed half: run the aligned query and commit it — one
  * [[TableFormat.append]] (INSERT INTO) or [[TableFormat.replace]]
  * (INSERT OVERWRITE — history intact under time travel, whole-table
  * conflict footprint). Carries the query as a resolved plan and
  * executes it through the bridge, the same shape as Spark's own v1
  * `InsertIntoDataSourceCommand`.
  */
private[graft] case class InsertIntoGraftTableCommand(root: String,
    writeOpts: Map[String, String], query: LogicalPlan,
    overwrite: Boolean,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftDmlRule.planFrame(spark, query)
    val statsCols = GraftDmlRule.statsColsOf(writeOpts)
    val bloomCol = GraftDmlRule.bloomColOf(writeOpts)
    val check = writeOpts.get("check")
    if (overwrite)
      TableFormat.replace(spark, root, df, statsCols = statsCols,
        bloomCol = bloomCol, check = check, autoStats = true)
    else
      // declared statsCols auto-collect NDV/histogram/frequency stats
      // on every SQL landing (r20) — ANALYZE becomes the exception
      TableFormat.append(df, root, statsCols = statsCols,
        bloomCol = bloomCol, check = check, autoStats = true)
    // a catalog table's resolved relation is CACHED per name
    // (FindDataSourceTable); the commit moved the head, so the next
    // SELECT must re-resolve against the new manifest — the same
    // refresh InsertIntoHadoopFsRelationCommand performs. (A TEMP VIEW
    // created via USING pins its analyzed snapshot by design — re-run
    // registerSql/CREATE to follow the head, exactly like time travel.)
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE …` landed as a predicate-pruned copy-on-write
  * commit ([[TableFormat.deleteWhere]]): dirs whose zone maps exclude
  * the predicate carry verbatim, matching rows filter out of the rest
  * under SQL null semantics (NULL condition keeps the row).
  */
private[graft] case class DeleteFromGraftTableCommand(root: String,
    writeOpts: Map[String, String],
    condition: org.apache.spark.sql.catalyst.expressions.Expression,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    TableFormat.deleteWhere(spark, root, GraftDmlRule.rebind(condition),
      statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE …` landed as a predicate-pruned copy-on-write
  * commit ([[TableFormat.updateWhere]]): assignments apply
  * simultaneously over the pre-update row, cast to the declared column
  * types, untouched dirs carry verbatim.
  */
private[graft] case class UpdateGraftTableCommand(root: String,
    writeOpts: Map[String, String],
    condition: org.apache.spark.sql.catalyst.expressions.Expression,
    assignments: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    TableFormat.updateWhere(spark, root, GraftDmlRule.rebind(condition),
      assignments.map { case (n, v) => n -> GraftDmlRule.rebind(v) },
      statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

private[graft] object GraftDmlRule {
  /** Column-name prefixes a conditional MERGE's run-time join uses to
    * keep same-named target/source columns apart; clause expressions
    * are pre-renamed onto them at resolution time, while attr identity
    * is still known from exprIds.
    */
  val TPfx = "__graft_t_"
  val SPfx = "__graft_s_"

  /** Re-anchor a resolved condition/assignment on COLUMN NAMES: the
    * statement's exprIds die with the statement, but the command
    * re-reads the table at run time — names are the stable
    * coordinates (flat schemas; the format has no nested columns).
    */
  def rebind(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      e.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
            .quoted(a.name)
      })

  /** The table's declared stats/bloom options (both option-case
    * spellings), shared by every DML command so SQL edits keep the
    * table's pruning metadata current.
    */
  def statsColsOf(writeOpts: Map[String, String]): Seq[String] =
    writeOpts.get("statscols").orElse(writeOpts.get("statsCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  def bloomColOf(writeOpts: Map[String, String]): Option[String] =
    writeOpts.get("bloomcol").orElse(writeOpts.get("bloomCol"))

  /** Execute a captured DML/MERGE read plan at run time, with the
    * DV-MASK substitution re-applied first (round-17 VERDICT edge):
    * rule order inside the extension batch is not guaranteed, so a
    * statement this rule captured before [[GraftDvMaskRule]] walked it
    * can carry a mask-pending relation in a subquery/source leg —
    * executing that raw would fail loudly at file-listing time with an
    * error naming the doorway, not the fix. The substitution is
    * idempotent (a substituted leg holds no pending index), so
    * re-running it here is safe in either rule order.
    */
  def planFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      new GraftDvMaskRule(spark).apply(plan))

  /** Resolve decorrelated scalar parts once per statement: the per-key
    * frame plus the aggregate's EMPTY-GROUP value evaluated over a
    * provably-empty input (`count(*)` → 0, `max`/`sum` → NULL); the
    * uncorrelated form resolves to its single-row literal instead.
    */
  def resolveScalars(spark: SparkSession,
      parts: Seq[(String, Seq[String], LogicalPlan, LogicalPlan)])
      : Seq[(String, Seq[String], Option[DataFrame], Any)] =
    parts.map { case (n, ks, framePlan, emptyPlan) =>
      if (ks.isEmpty) {
        val row = planFrame(spark, framePlan).head()
        (n, ks, None, if (row.isNullAt(0)) null else row.get(0))
      } else {
        val row = planFrame(spark, emptyPlan).head()
        (n, ks, Some(planFrame(spark, framePlan)),
          if (row.isNullAt(0)) null else row.get(0))
      }
    }

  /** Left-join each resolved scalar's per-key frame (stable tagged
    * column names — frames are keyed and deduplicated by construction,
    * GROUP BY the correlation keys) and return the per-name value
    * Column: the joined value on a hit, the empty-group value
    * otherwise. NULL correlation keys match no group (SQL equality).
    */
  def joinScalars(df0: DataFrame,
      resolved: Seq[(String, Seq[String], Option[DataFrame], Any)],
      tag: String): (DataFrame, Seq[(String, org.apache.spark.sql.Column)]) = {
    import org.apache.spark.sql.functions.{col, lit, when}
    require(!df0.columns.exists(
      _.toLowerCase.startsWith(s"__graft_sq_${tag}_")),
      s"__graft_sq_${tag}_* column names are reserved")
    var cur = df0
    val vals = resolved.zipWithIndex.map {
      case ((n, _, None, value), _) => n.toLowerCase -> lit(value)
      case ((n, ks, Some(f), dflt), i) =>
        val hit = s"__graft_sq_${tag}_hit_$i"
        val fr = f.toDF((ks.indices.map(j =>
          s"__graft_sq_${tag}_k${i}_$j") :+
          s"__graft_sq_${tag}_val_$i"): _*).withColumn(hit, lit(true))
        val on = ks.zipWithIndex.map { case (k, j) =>
          cur(k) === fr(s"__graft_sq_${tag}_k${i}_$j") }.reduce(_ && _)
        cur = cur.join(fr, on, "left")
        n.toLowerCase ->
          when(col(hit) === true, col(s"__graft_sq_${tag}_val_$i"))
            .otherwise(lit(dflt))
    }
    (cur, vals)
  }

  /** Materialize a correlated NOT IN's three-valued test (r20): the
    * decorrelated frame (`__graft_na_v`, `__graft_na_g<j>`) reduces to
    * two SMALL per-group accounts — group presence + a has-inner-NULL
    * flag, and the distinct non-null (group, value) pairs — that
    * left-join the outer rows (broadcast when small; never an
    * all-pairs walk). A row is AFFECTED (the NOT IN is TRUE) iff its
    * matched group is EMPTY — `x NOT IN (∅)`, NULL-keyed rows included
    * — or the group holds no inner NULL, the outer value is non-NULL,
    * and it matches none of the group's values; every other
    * combination is FALSE/UNKNOWN and the row carries. Inner rows with
    * a NULL correlation key belong to NO group (the correlated
    * equality is never TRUE against them) and drop before grouping.
    * Returns (joined frame, affected Column — never NULL).
    */
  def corrAntiAffected(df: DataFrame, frame: DataFrame, valCol: String,
      corrCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{col, max}
    require(!df.columns.exists(_.toLowerCase.startsWith("__graft_na_")),
      "__graft_na_* column names are reserved")
    val gcols = corrCols.indices.map(j => s"__graft_na_g$j")
    val fr = frame.na.drop(gcols)
    val grp = fr.groupBy(gcols.map(col): _*)
      .agg(max(col("__graft_na_v").isNull).as("__graft_na_hasnull"))
      .select(gcols.zipWithIndex.map { case (g, j) =>
        col(g).as(s"__graft_na_ga$j") } :+ col("__graft_na_hasnull"): _*)
    val vals = fr.na.drop(Seq("__graft_na_v"))
      .select(col("__graft_na_v").as("__graft_na_vb") +:
        gcols.zipWithIndex.map { case (g, j) =>
          col(g).as(s"__graft_na_gb$j") }: _*).distinct()
    val onG = corrCols.zipWithIndex.map { case (c, j) =>
      col(c) === col(s"__graft_na_ga$j") }.reduce(_ && _)
    val onV = (corrCols.zipWithIndex.map { case (c, j) =>
      col(c) === col(s"__graft_na_gb$j") } :+
      (col(valCol) === col("__graft_na_vb"))).reduce(_ && _)
    val joined = df.join(grp, onG, "left").join(vals, onV, "left")
    val affected = col("__graft_na_hasnull").isNull ||
      (col("__graft_na_hasnull") === false &&
        col(valCol).isNotNull && col("__graft_na_vb").isNull)
    (joined, affected)
  }

  /** Execute an uncorrelated DML subquery into the one-column key
    * frame the key-pruned verbs take — renamed and cast to the target
    * key column's declared type, so [[TableFormat.touchedSplit]]
    * probes zone maps in the key's own comparison domain. When the
    * subquery's values live in a WIDER domain (the accepted coerced
    * shape `CAST(k) IN (…)` — up-casts only), values that do not
    * ROUND-TRIP through the key type can never equal any key there, so
    * they drop instead of wrapping into a WRONG key under non-ANSI
    * cast (round-17 ADVICE, medium); a NULL IN-list value matches no
    * row and drops with them.
    */
  def subqueryKeys(spark: SparkSession, root: String,
      keyCols: Seq[String], subquery: LogicalPlan): DataFrame =
    subqueryKeysFrame(spark, root, keyCols, planFrame(spark, subquery))

  /** [[subqueryKeys]] over an already-executed frame — the anti
    * commands materialize the subquery ONCE (they must inspect the RAW
    * values for NOT IN's null check before the try_cast pipeline nulls
    * non-round-trip values) and feed the same frame here.
    */
  def subqueryKeysFrame(spark: SparkSession, root: String,
      keyCols: Seq[String], sub: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val fields = keyCols.map { kc =>
      TableFormat.latestSchema(root)
        .flatMap(_.fields.find(_.name.equalsIgnoreCase(kc)))
        .getOrElse(throw new IllegalArgumentException(
          s"key column '$kc' is not a column of $root"))
    }
    // positional: the i-th subquery output compares to the i-th key.
    // try_cast per position: under ANSI a plain down-cast of an
    // out-of-range value would ERROR the whole statement; under legacy
    // mode it would WRAP. Either way the value equals no key — null
    // out, round-trip-compare (an up-cast back never fails), drop the
    // TUPLE (one non-representable component makes the tuple match
    // nothing).
    val cols = sub.columns.toSeq
    val selected = sub.select(fields.zip(cols).flatMap { case (f, c) =>
      val subType = sub.schema(c).dataType
      Seq(col(c).try_cast(f.dataType).as(f.name)) ++
        (if (subType != f.dataType)
          Seq(col(c).as(s"__graft_orig_${f.name}")) else Nil)
    }: _*)
    fields.zip(cols).filter { case (f, c) =>
      sub.schema(c).dataType != f.dataType
    }.foldLeft(selected) { case (df, (f, c)) =>
      df.filter(col(f.name).cast(sub.schema(c).dataType) ===
        col(s"__graft_orig_${f.name}"))
    }.select(fields.map(f => col(f.name)): _*)
  }
}

/** `DELETE FROM t WHERE k IN (SELECT …)` — the uncorrelated-subquery
  * key delete (the canonical GDPR-erasure shape at 100 TB): the
  * subquery materializes into a key frame at run time and lands
  * through [[TableFormat.deleteKeys]], a copy-on-write commit pruned
  * by the key VALUES (zone maps + blooms). IN-null semantics fall out
  * of the anti-join: NULL keys match no row, NULL-keyed rows survive.
  * The TUPLE form `(k1, k2) IN (SELECT …)` lands MERGE-ON-READ through
  * [[TableFormat.deleteKeysMorMulti]] (r19) — per-column zone-map
  * exclusion, a multi-column deletion-vector sidecar, never a dir
  * rewrite and never a concatenated surrogate.
  */
private[graft] case class DeleteKeysGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftDmlRule.subqueryKeys(spark, root, keyCols, subquery)
    val statsCols = GraftDmlRule.statsColsOf(writeOpts)
    val bloomCol = GraftDmlRule.bloomColOf(writeOpts)
    if (keyCols.size == 1)
      TableFormat.deleteKeys(spark, root, keys, keyCols.head,
        statsCols = statsCols, bloomCol = bloomCol)
    else // r19: tuple deletes land MERGE-ON-READ — O(tuples) sidecar
      // rows on the touched dirs, never a dir rewrite (auto-fold
      // bounds the debt; applyCoWDelta remains the explicit fold form)
      TableFormat.deleteKeysMorMulti(spark, root, keys,
        keyCols.map(kc => keys.schema.fields
          .find(_.name.equalsIgnoreCase(kc)).get.name))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE k IN (SELECT …)` — the key-set twin for
  * UPDATE, landed through [[TableFormat.updateKeys]] (same pruning
  * and simultaneous-assignment semantics as the predicate form); the
  * TUPLE form masks the matching tuples and appends their updated
  * images through one merge-on-read [[TableFormat.applyDeltaMulti]]
  * commit (r19).
  */
private[graft] case class UpdateKeysGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan,
    assignments: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val keys = GraftDmlRule.subqueryKeys(spark, root, keyCols, subquery)
    val statsCols = GraftDmlRule.statsColsOf(writeOpts)
    val bloomCol = GraftDmlRule.bloomColOf(writeOpts)
    val bound = assignments.map { case (n, v) =>
      n -> GraftDmlRule.rebind(v) }
    if (keyCols.size == 1)
      TableFormat.updateKeys(spark, root, keys, keyCols.head, bound,
        statsCols = statsCols, bloomCol = bloomCol)
    else {
      val resolved = keyCols.map(kc => keys.schema.fields
        .find(_.name.equalsIgnoreCase(kc)).get.name)
      val touched = TableFormat.readTouchedForKeysMulti(spark, root,
        keys, resolved)
      // simultaneous assignments over exactly the matching tuples
      val hit = touched.join(keys, resolved, "left_semi")
      val byName = bound.map { case (n, v) => n.toLowerCase -> v }.toMap
      val updated = hit.select(hit.columns.toSeq.map { c =>
        byName.get(c.toLowerCase) match {
          case Some(v) => v.cast(hit.schema(c).dataType).as(c)
          case None => col(c)
        }
      }: _*)
      TableFormat.enforceCheckFor(updated, root)
      // r19: mask the matched tuples + append the updated images in ONE
      // merge-on-read commit — a point update writes O(tuples), never a
      // dir rewrite
      TableFormat.applyDeltaMulti(spark, root, keys, resolved, updated,
        statsCols = statsCols, bloomCol = bloomCol, op = "update-where")
    }
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE NOT EXISTS (SELECT … WHERE inner = outer …)` /
  * `DELETE FROM t WHERE k NOT IN (<uncorrelated subquery>)` — the
  * COMPLEMENT purge (r19), landed through [[TableFormat.deleteAnti]]:
  * rows matching NO key are deleted, and the pruning INVERTS — dirs
  * the zone maps/blooms prove key-disjoint hold only doomed rows and
  * DROP from the manifest wholesale with zero data I/O. NOT IN's
  * three-valued logic resolves HERE, on the RAW subquery values before
  * the try_cast pipeline (which nulls non-round-trip values and would
  * conflate them with genuine NULLs): one NULL in the value list makes
  * `k NOT IN (…)` UNKNOWN on every row — the statement deletes nothing
  * and no version mints. The subquery executes ONCE (persisted across
  * the null probe, the zone-map split, and the keep-join).
  */
private[graft] case class DeleteAntiKeysGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan, keepNullKeys: Boolean,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val raw = GraftDmlRule.planFrame(spark, subquery).persist()
    try {
      if (keepNullKeys &&
          !raw.filter(col(raw.columns.head).isNull).isEmpty)
        return Seq.empty // NULL in the NOT IN list: UNKNOWN everywhere
      val keys = GraftDmlRule.subqueryKeysFrame(spark, root, keyCols, raw)
      TableFormat.deleteAnti(spark, root, keys,
        keyCols.map(kc => keys.schema.fields
          .find(_.name.equalsIgnoreCase(kc)).get.name),
        keepNullKeys,
        statsCols = GraftDmlRule.statsColsOf(writeOpts),
        bloomCol = GraftDmlRule.bloomColOf(writeOpts),
        // NOT IN 3VL needs to distinguish a genuinely empty subquery
        // from one whose values all failed the cast round-trip (r19
        // ADVICE): only the former truncates NULL-keyed rows
        rawNonEmpty = keepNullKeys && !raw.isEmpty)
    } finally raw.unpersist()
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE NOT EXISTS (…)` / `… WHERE k NOT IN
  * (<uncorrelated subquery>)` — the complement-UPDATE twin, landed
  * through [[TableFormat.updateAnti]] (simultaneous assignments over
  * the pre-update row). Three-valued logic matches
  * [[DeleteAntiKeysGraftTableCommand]]: a NULL in the NOT IN value
  * list no-ops the statement here, on the raw values.
  */
private[graft] case class UpdateAntiKeysGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan, keepNullKeys: Boolean,
    assignments: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val raw = GraftDmlRule.planFrame(spark, subquery).persist()
    try {
      if (keepNullKeys &&
          !raw.filter(col(raw.columns.head).isNull).isEmpty)
        return Seq.empty // NULL in the NOT IN list: UNKNOWN everywhere
      val keys = GraftDmlRule.subqueryKeysFrame(spark, root, keyCols, raw)
      TableFormat.updateAnti(spark, root, keys,
        keyCols.map(kc => keys.schema.fields
          .find(_.name.equalsIgnoreCase(kc)).get.name),
        keepNullKeys,
        assignments.map { case (n, v) => n -> GraftDmlRule.rebind(v) },
        statsCols = GraftDmlRule.statsColsOf(writeOpts),
        bloomCol = GraftDmlRule.bloomColOf(writeOpts),
        rawNonEmpty = keepNullKeys && !raw.isEmpty)
    } finally raw.unpersist()
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE k NOT IN (SELECT v FROM s WHERE s.j = t.m …)`
  * — the CORRELATED NOT IN purge (r20): the decorrelated frame's
  * per-group accounts join in at run time and the keep-filter applies
  * NOT IN's exact three-valued gate per matched group
  * ([[GraftDmlRule.corrAntiAffected]]): empty group → the row dies
  * (NULL-keyed rows included); a group holding an inner NULL, or a
  * NULL outer value against a non-empty group, is UNKNOWN → the row
  * carries. A whole-table rewrite by construction — the affected set
  * (empty-group rows) is value-dependent, so no static prune exists.
  */
private[graft] case class DeleteCorrAntiGraftTableCommand(root: String,
    writeOpts: Map[String, String], valCol: String,
    corrCols: Seq[String], subquery: LogicalPlan,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val frame = GraftDmlRule.planFrame(spark, subquery).persist()
    try {
      TableFormat.deleteTransform(spark, root, lit(true), { df =>
        val (joined, affected) =
          GraftDmlRule.corrAntiAffected(df, frame, valCol, corrCols)
        joined.filter(not(coalesce(affected, lit(false))))
          .select(df.columns.toSeq.map(col): _*)
      }, statsCols = GraftDmlRule.statsColsOf(writeOpts),
        bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    } finally frame.unpersist()
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE k NOT IN (<correlated subquery>)` — the
  * correlated-NOT-IN UPDATE twin (r20): rows whose three-valued gate
  * is TRUE take the assignments (simultaneous over the PRE-update
  * row, cast to declared types), FALSE/UNKNOWN rows carry unchanged.
  */
private[graft] case class UpdateCorrAntiGraftTableCommand(root: String,
    writeOpts: Map[String, String], valCol: String,
    corrCols: Seq[String], subquery: LogicalPlan,
    assignments: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val frame = GraftDmlRule.planFrame(spark, subquery).persist()
    try {
      val set = assignments.map { case (n, v) =>
        n -> GraftDmlRule.rebind(v) }
      TableFormat.updateTransform(spark, root, lit(true), { df =>
        // case-insensitive like every sibling update command
        val byName = set.map { case (n, v) => n.toLowerCase -> v }.toMap
        require(set.size == byName.size, "duplicate assignment column")
        val unknown = byName.keySet --
          df.columns.map(_.toLowerCase).toSet
        require(unknown.isEmpty,
          s"UPDATE assigns ${unknown.mkString(", ")} which the table " +
            s"does not have (${df.columns.mkString(", ")})")
        val (joined, affected) =
          GraftDmlRule.corrAntiAffected(df, frame, valCol, corrCols)
        joined.select(df.schema.fields.toSeq.map { f =>
          byName.get(f.name.toLowerCase) match {
            case Some(v) => when(affected, v.cast(f.dataType))
              .otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }: _*)
      }, statsCols = GraftDmlRule.statsColsOf(writeOpts),
        bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    } finally frame.unpersist()
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE <key subquery> AND <static residual>` — the
  * conjunct-composed purge (r19b), landed through
  * [[TableFormat.deleteKeysWhere]]: exactly the rows whose key matches
  * the materialized frame AND whose residual holds die; pruning
  * composes the key split with the residual's bounds walk.
  */
private[graft] case class DeleteKeysWhereGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan,
    extra: org.apache.spark.sql.catalyst.expressions.Expression,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftDmlRule.subqueryKeys(spark, root, keyCols, subquery)
    TableFormat.deleteKeysWhere(spark, root, keys,
      keyCols.map(kc => keys.schema.fields
        .find(_.name.equalsIgnoreCase(kc)).get.name),
      GraftDmlRule.rebind(extra),
      statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET … WHERE <key subquery> AND <static residual>` — the
  * composed-UPDATE twin, landed through [[TableFormat.updateKeysWhere]].
  */
private[graft] case class UpdateKeysWhereGraftTableCommand(root: String,
    writeOpts: Map[String, String], keyCols: Seq[String],
    subquery: LogicalPlan,
    extra: org.apache.spark.sql.catalyst.expressions.Expression,
    assignments: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(subquery)

  override def run(spark: SparkSession): Seq[Row] = {
    val keys = GraftDmlRule.subqueryKeys(spark, root, keyCols, subquery)
    TableFormat.updateKeysWhere(spark, root, keys,
      keyCols.map(kc => keys.schema.fields
        .find(_.name.equalsIgnoreCase(kc)).get.name),
      GraftDmlRule.rebind(extra),
      assignments.map { case (n, v) => n -> GraftDmlRule.rebind(v) },
      statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `UPDATE t SET v = <expr over (SELECT <aggregate> FROM s WHERE s.j =
  * t.k … [GROUP BY s.j])> [, plain assignments] [WHERE <subquery-free
  * cond>]` — the scalar-subquery enrich-update (r19b, generalized
  * r20), landed through [[TableFormat.updateTransform]]: each
  * decorrelated per-key aggregate frame left-joins the touched rows on
  * its correlation keys and materializes as a reserved PLACEHOLDER
  * column; rows with NO matching group take the shape's EMPTY-GROUP
  * value (evaluated at run time — an ungrouped `count(*)` is 0, a
  * GROUPED aggregate is NULL because the subquery returns zero rows;
  * never assumed); the assigned expressions — arithmetic/CASE/casts
  * AROUND the placeholders, preserved verbatim — evaluate in one
  * simultaneous select over the PRE-update row under the WHERE
  * condition. Pruning comes from the static condition's zone-map walk
  * (an unconditioned enrich-update is a whole-table rewrite by
  * construction). NULL correlation keys match no group (SQL equality)
  * and take the empty-group value.
  */
private[graft] case class UpdateScalarGraftTableCommand(root: String,
    writeOpts: Map[String, String],
    condition: org.apache.spark.sql.catalyst.expressions.Expression,
    prune: Option[org.apache.spark.sql.catalyst.expressions.Expression],
    plain: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    scalarAssigns: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)],
    scalarParts: Seq[(String, Seq[String], LogicalPlan, LogicalPlan)],
    condScalars: Seq[(String, Seq[String], LogicalPlan, LogicalPlan)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] =
    (scalarParts ++ condScalars).map(_._3)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, when}
    val names = (plain.map(_._1) ++ scalarAssigns.map(_._1))
      .map(_.toLowerCase)
    require(names.distinct.size == names.size, "duplicate assignment column")
    val resolvedA = GraftDmlRule.resolveScalars(spark, scalarParts)
    val resolvedC = GraftDmlRule.resolveScalars(spark, condScalars)
    val cond = GraftDmlRule.rebind(condition)
    TableFormat.updateTransform(spark, root,
      GraftDmlRule.rebind(prune.getOrElse(condition)), { df =>
      // both scalar families materialize as the PLACEHOLDER columns
      // the rewritten assignments/condition reference by name
      val (cur1, assignVals) =
        GraftDmlRule.joinScalars(df, resolvedA, "a")
      val (cur2, condVals) =
        GraftDmlRule.joinScalars(cur1, resolvedC, "c")
      val cur = (assignVals ++ condVals).foldLeft(cur2) {
        case (d, (nm, v)) => d.withColumn(nm, v) }
      val scalByName = scalarAssigns.map { case (n, e) =>
        n.toLowerCase -> GraftDmlRule.rebind(e) }.toMap
      val plainByName = plain.map { case (n, v) =>
        n.toLowerCase -> GraftDmlRule.rebind(v) }.toMap
      val unknown = (plainByName.keySet ++ scalByName.keySet) --
        df.columns.map(_.toLowerCase).toSet
      require(unknown.isEmpty,
        s"UPDATE assigns ${unknown.mkString(", ")} which the table " +
          s"does not have (${df.columns.mkString(", ")})")
      cur.select(df.schema.fields.toSeq.map { f =>
        scalByName.get(f.name.toLowerCase)
          .orElse(plainByName.get(f.name.toLowerCase)) match {
          case Some(v) =>
            when(cond, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    }, statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `DELETE FROM t WHERE <expr over scalar subqueries> [AND …]` — the
  * comparison purge (r19b): each decorrelated per-key aggregate joins
  * in at run time, its placeholder column feeds the rewritten
  * condition, and the keep-filter is SQL-exact (`NOT coalesce(cond,
  * false)` — a matchless row comparing against NULL carries). Pruning
  * from the subquery-free conjuncts via [[TableFormat.deleteTransform]].
  */
private[graft] case class DeleteScalarCondGraftTableCommand(root: String,
    writeOpts: Map[String, String],
    condition: org.apache.spark.sql.catalyst.expressions.Expression,
    prune: org.apache.spark.sql.catalyst.expressions.Expression,
    condScalars: Seq[(String, Seq[String], LogicalPlan, LogicalPlan)],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = condScalars.map(_._3)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val resolved = GraftDmlRule.resolveScalars(spark, condScalars)
    val cond = GraftDmlRule.rebind(condition)
    TableFormat.deleteTransform(spark, root,
      GraftDmlRule.rebind(prune), { df =>
      val (joined, condVals) = GraftDmlRule.joinScalars(df, resolved, "c")
      val cur = condVals.foldLeft(joined) { case (d, (nm, v)) =>
        d.withColumn(nm, v) }
      cur.filter(not(coalesce(cond, lit(false))))
        .select(df.columns.toSeq.map(col): _*)
    }, statsCols = GraftDmlRule.statsColsOf(writeOpts),
      bloomCol = GraftDmlRule.bloomColOf(writeOpts))
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON t.k = s.k …` landed through the format's
  * own upsert machinery. The supported shapes are the three standard
  * row-level patterns (each refusing loudly outside them — staged
  * frames + the Scala API cover the rest):
  *
  *   - WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *
  *     → [[TableFormat.merge]] (file-pruned copy-on-write upsert)
  *   - WHEN MATCHED THEN DELETE (alone) → [[TableFormat.deleteKeys]]
  *   - WHEN NOT MATCHED THEN INSERT * (alone) → insert-only append of
  *     the source rows whose key is absent from the target
  *
  * The ON condition must be ONE target-key = source-key equality (the
  * key-anchored form every zone-map/bloom pruning path here keys on);
  * action conditions, partial assignment lists that aren't the
  * identity expansion of `*`, and NOT MATCHED BY SOURCE clauses
  * refuse. Source rows align to the target schema by name with casts.
  */
private[graft] case class MergeIntoGraftTableCommand(root: String,
    writeOpts: Map[String, String], source: LogicalPlan,
    targetKey: String, sourceKey: String, action: String,
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier])
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val src = GraftDmlRule.planFrame(spark, source)
    val statsCols = GraftDmlRule.statsColsOf(writeOpts)
    val bloomCol = GraftDmlRule.bloomColOf(writeOpts)
    action match {
      case "delete" =>
        TableFormat.deleteKeys(spark, root,
          src.select(col(sourceKey).as(targetKey)).distinct(), targetKey,
          statsCols = statsCols, bloomCol = bloomCol)
      case _ =>
        val target = TableFormat.latestSchema(root).getOrElse(
          throw new IllegalArgumentException(
            s"MERGE INTO needs an existing committed table at $root"))
        val srcCols = src.columns.map(_.toLowerCase).toSet
        val missing = target.fields.map(_.name)
          .filterNot(f => srcCols(f.toLowerCase))
        require(missing.isEmpty,
          s"MERGE source is missing target column(s) " +
            s"${missing.mkString(", ")}")
        val aligned = src.select(target.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        action match {
          case "upsert" =>
            TableFormat.merge(spark, root, aligned, targetKey,
              statsCols = statsCols, bloomCol = bloomCol)
          case "insert" =>
            val existing = TableFormat.readSnapshot(spark, root)
              .select(col(targetKey))
            // cached: `isEmpty` then `append` would otherwise execute
            // the anti-join twice per INSERT-only MERGE (r17 VERDICT #7)
            val fresh = aligned.join(existing, Seq(targetKey), "left_anti")
              .persist()
            try {
              if (!fresh.isEmpty)
                TableFormat.append(fresh, root, statsCols = statsCols,
                  bloomCol = bloomCol)
            } finally { fresh.unpersist(); () }
          case other => throw new IllegalStateException(
            s"unknown merge action '$other'")
        }
    }
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}

/** The GENERAL `MERGE INTO` — conditional and column-level clauses,
  * any number, first-match-wins per SQL:
  *
  * {{{
  *   WHEN MATCHED AND t.v < s.v THEN UPDATE SET v = s.v, n = t.n + 1
  *   WHEN MATCHED AND s.op = 'D' THEN DELETE
  *   WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, v) VALUES (s.k, s.v)
  * }}}
  *
  * landed as ONE crash-atomic [[TableFormat.applyDelta]] commit: every
  * matched row whose first firing clause is update/delete contributes
  * its key to the merge-on-read MASK, update rows re-land their merged
  * image (target columns carried, assigned columns CASE-projected on
  * the firing clause index) and qualifying not-matched source rows land
  * their insert image in the same appended dir. At scale the join's
  * target side reads only the dirs whose zone maps / blooms might hold
  * a source key ([[TableFormat.readTouchedForKeys]] — sound, so the
  * anti-join for NOT MATCHED over the touched frame equals the
  * whole-table anti-join), the mask is O(affected keys), and untouched
  * dirs never rewrite — a trickle of conditional upserts costs the
  * touched dirs' read plus O(source) writes, never the table.
  *
  * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE` (r17
  * VERDICT #4) evaluates the TARGET-side complement — rows no source
  * key matches — through the same first-match-wins machinery; its
  * conditions see only target columns (the analyzer refuses source
  * references there). A BY-SOURCE merge necessarily reads the WHOLE
  * target (the rows it touches are exactly those the source keys
  * cannot prune to), the full-sync cost the semantics demand; without
  * BY-SOURCE clauses the target side stays key-pruned.
  *
  * SQL conformance notes: a target ROW updated/deleted by more than
  * one source row refuses loudly (the standard's cardinality error —
  * counted per row identity over FIRED pairs, so duplicate-key targets
  * and multi-match rows where only one pair fires a clause are legal,
  * r17 ADVICE); because the merge-on-read mask is BY KEY, rows that
  * fired no clause but share a fired row's key re-land VERBATIM in the
  * same commit; the ON comparison is sound under type coercion — a
  * source key that does not round-trip through the target key's
  * declared type matches nothing (and so INSERTs if a clause admits
  * it) instead of wrapping onto an unrelated target row (r17 ADVICE);
  * unassigned columns keep the target value on UPDATE and are NULL on
  * INSERT; clause conditions see both rows (`t.*`, `s.*`); assigned
  * values cast to the declared column types (a MERGE never retypes).
  * The table's CHECK constraint probes every introduced row BEFORE any
  * file lands — same refusal as every built-in landing path.
  */
private[graft] case class MergeIntoGraftTableCondCommand(root: String,
    writeOpts: Map[String, String], source: LogicalPlan,
    keys: Seq[(String, String)],
    matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    notMatched: Seq[(Option[Expression], Seq[(String, Expression)])],
    bySource: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    catalogIdent: Option[org.apache.spark.sql.catalyst.TableIdentifier],
    evolve: Seq[(String, org.apache.spark.sql.types.DataType)] = Nil,
    condScalars: Seq[(String, LogicalPlan)] = Nil)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] =
    Seq(source) ++ condScalars.map(_._2)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions._
    import GraftDmlRule.{TPfx, SPfx, rebind}
    val FireCol = "__graft_fire"
    val RowIdCol = "__graft_rowid"
    val schema = TableFormat.latestSchema(root).getOrElse(
      throw new IllegalArgumentException(
        s"MERGE INTO needs an existing committed table at $root"))
    // WITH SCHEMA EVOLUTION: the new columns join the projected field
    // list (nullable, source-typed); the appended images carry the
    // widened schema and the commit unions it into the manifest. A
    // re-run against an already-evolved head adds nothing (name check)
    val newFields = evolve
      .filterNot(e => schema.fields.exists(_.name.equalsIgnoreCase(e._1)))
      .map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t, nullable = true) }
    val fields = schema.fields.toSeq ++ newFields
    val src = GraftDmlRule.planFrame(spark, source)
    require(!src.columns.exists(c =>
      c.startsWith(TPfx) || c.startsWith(SPfx)),
      s"MERGE source columns may not start with the reserved $TPfx/$SPfx")
    // clause-condition scalar subqueries (r20): each uncorrelated
    // aggregate evaluates ONCE here, then rides every leg as a
    // literal placeholder column the rewritten conditions reference
    require(!(src.columns ++ schema.fieldNames)
      .exists(_.toLowerCase.startsWith("__graft_sq_m_")),
      "__graft_sq_m_* column names are reserved")
    val phVals: Seq[(String, Any)] = condScalars.map { case (n, p) =>
      val r = GraftDmlRule.planFrame(spark, p).head()
      n -> (if (r.isNullAt(0)) null else r.get(0))
    }
    def withPh(df: DataFrame): DataFrame =
      phVals.foldLeft(df) { case (d, (n, v)) => d.withColumn(n, lit(v)) }
    val srcP = src.select(src.columns.toSeq.map(c =>
      col(c).as(SPfx + c)): _*)
    // per-key metadata: resolved target name, target type, source type
    val keyMeta: Seq[(String, String,
        org.apache.spark.sql.types.DataType,
        org.apache.spark.sql.types.DataType)] =
      keys.map { case (tkn0, skn) =>
        val tkn = schema.fields.find(_.name.equalsIgnoreCase(tkn0))
          .getOrElse(throw new IllegalArgumentException(
            s"MERGE key '$tkn0' is not a column of $root")).name
        val st = src.schema.fields.find(_.name.equalsIgnoreCase(skn))
          .getOrElse(throw new IllegalArgumentException(
            s"MERGE source key '$skn' is not a source column")).dataType
        (tkn, skn, schema(tkn).dataType, st)
      }
    val tks = keyMeta.map(_._1)
    // sound under coercion (r17 ADVICE): when a source key is wider,
    // a value that does not round-trip through the target key type can
    // never equal any target key in the coerced domain — try_cast (a
    // plain down-cast would ERROR under ANSI, WRAP under legacy) plus
    // the round-trip conjunct make it match NOTHING instead of landing
    // on an unrelated row; the same filters tighten the pruning frame
    val joinCond = keyMeta.map { case (tkn, skn, kt, st) =>
      val sKey = col(SPfx + skn)
      val sKeyT = sKey.try_cast(kt)
      if (st == kt) col(TPfx + tkn) === sKey
      else col(TPfx + tkn) === sKeyT && sKeyT.cast(st) === sKey
    }.reduce(_ && _)
    val keyFrame = keyMeta
      .filter { case (_, _, kt, st) => st != kt }
      .foldLeft(src.select(keyMeta.flatMap { case (tkn, skn, kt, st) =>
        Seq(col(skn).try_cast(kt).as(tkn)) ++
          (if (st != kt) Seq(col(skn).as(s"__graft_orig_$tkn")) else Nil)
      }: _*)) { case (df, (tkn, _, _, st)) =>
        df.filter(col(tkn).cast(st) === col(s"__graft_orig_$tkn"))
      }.select(tks.map(col): _*)
    val tgt =
      if (bySource.nonEmpty) TableFormat.readSnapshot(spark, root)
      else if (tks.size == 1)
        TableFormat.readTouchedForKeys(spark, root, keyFrame, tks.head)
      else
        TableFormat.readTouchedForKeysMulti(spark, root, keyFrame, tks)
    val tgtP = newFields.foldLeft(
      tgt.select(tgt.columns.toSeq.map(c => col(c).as(TPfx + c)): _*)) {
        // evolution columns read null on the un-evolved target side
        case (df, f) => df.withColumn(TPfx + f.name,
          lit(null).cast(f.dataType))
      }
      .withColumn(RowIdCol, monotonically_increasing_id())
    def fire(conds: Seq[Option[Expression]]): Column =
      conds.zipWithIndex.foldRight(lit(-1): Column) { case ((c, i), acc) =>
        when(c.map(rebind).getOrElse(lit(true)), lit(i)).otherwise(acc)
      }
    val statsCols = GraftDmlRule.statsColsOf(writeOpts)
    val bloomCol = GraftDmlRule.bloomColOf(writeOpts)
    var cached: Seq[DataFrame] = Nil

    /** One update/delete LEG — matched pairs or by-source rows:
      * first-match-wins fire index, per-ROW cardinality check (pair
      * legs only — a by-source row appears once by construction),
      * fired keys masked, fired updates re-landed CASE-projected, and
      * unfired rows sharing a fired KEY re-landed verbatim (the mask
      * is by key; without the carry a duplicate-key sibling no clause
      * touched would vanish). Returns (mask keys, append frames).
      */
    def runLeg(rows0: DataFrame,
        specs: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
        pairLeg: Boolean): (DataFrame, Seq[DataFrame]) = {
      val rows = withPh(rows0)
        .withColumn(FireCol, fire(specs.map(_._1))).persist()
      cached :+= rows
      val fired = rows.filter(col(FireCol) >= 0)
      if (pairLeg) {
        // SQL cardinality rule, per target ROW identity over FIRED
        // pairs: the same row updated/deleted twice is the error —
        // duplicate-key targets (one firing pair per row) and
        // multi-match rows with a single firing pair are legal
        val dup = fired.groupBy(col(RowIdCol))
          .agg(count(lit(1)).as("__n"),
            first(col(TPfx + tks.head)).as("__k"))
          .filter(col("__n") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"MERGE: a target row (key ${dup.headOption.map(_.get(1))}) " +
            "would be updated/deleted by more than one source row — " +
            "deduplicate the source")
      }
      val delKeys = fired
        .select(tks.map(t => col(TPfx + t).as(t)): _*).distinct()
      val updIdx = specs.zipWithIndex.collect {
        case ((_, Some(_)), i) => i
      }
      val upd =
        if (updIdx.isEmpty) None
        else Some(fired.filter(col(FireCol)
            .isin(updIdx.map(Int.box): _*))
          .select(fields.map { f =>
            val base: Column = col(TPfx + f.name)
            specs.zipWithIndex.foldRight(base) {
              case (((_, Some(as)), i), acc) =>
                as.find(_._1.equalsIgnoreCase(f.name)) match {
                  case Some((_, e)) => when(col(FireCol) === i,
                    rebind(e).cast(f.dataType)).otherwise(acc)
                  case None => acc
                }
              case (_, acc) => acc // DELETE clause: row never lands
            }.cast(f.dataType).as(f.name)
          }: _*))
      val unfired0 = rows.filter(col(FireCol) < 0)
      // pair legs: a row may appear in several pairs — carry it only
      // when NO pair fired for it, and once
      val unfired =
        if (pairLeg)
          unfired0.join(fired.select(col(RowIdCol)), Seq(RowIdCol),
            "left_anti").dropDuplicates(RowIdCol)
        else unfired0
      val carriedRows = unfired
        .join(delKeys,
          tks.map(t => col(TPfx + t) === col(t)).reduce(_ && _),
          "left_semi")
        .select(fields.map(f =>
          col(TPfx + f.name).cast(f.dataType).as(f.name)): _*)
      (delKeys, upd.toSeq :+ carriedRows)
    }

    try {
      val emptyKeys = tgt.select(tks.map(col): _*).limit(0)
      val (mDel, mApp) =
        if (matched.isEmpty) (emptyKeys, Seq.empty[DataFrame])
        else runLeg(tgtP.join(srcP, joinCond, "inner"), matched,
          pairLeg = true)
      val (bDel, bApp) =
        if (bySource.isEmpty) (emptyKeys, Seq.empty[DataFrame])
        else runLeg(tgtP.join(
          srcP.select(keyMeta.map(m => col(SPfx + m._2)): _*),
          joinCond, "left_anti"), bySource, pairLeg = false)
      val insImages =
        if (notMatched.isEmpty) None
        else Some(withPh(srcP
          .join(tgtP.select(tks.map(t => col(TPfx + t)): _*),
            joinCond, "left_anti"))
          .withColumn(FireCol, fire(notMatched.map(_._1)))
          .filter(col(FireCol) >= 0)
          .select(fields.map { f =>
            notMatched.zipWithIndex
              .foldRight(lit(null).cast(f.dataType): Column) {
                case (((_, as), i), acc) =>
                  as.find(_._1.equalsIgnoreCase(f.name)) match {
                    case Some((_, e)) => when(col(FireCol) === i,
                      rebind(e).cast(f.dataType)).otherwise(acc)
                    case None => acc
                  }
              }.cast(f.dataType).as(f.name)
          }: _*))
      val delKeys = mDel.unionByName(bDel)
      val appends = (mApp ++ bApp ++ insImages.toSeq) match {
        case Seq() => tgt.limit(0)
        case imgs =>
          val u = imgs.reduce(_ unionByName _).persist()
          cached :+= u
          u
      }
      TableFormat.enforceCheckFor(appends, root)
      if (tks.size == 1)
        TableFormat.applyDelta(spark, root, delKeys, tks.head, appends,
          statsCols = statsCols, bloomCol = bloomCol)
      else // composite key (r19): the dv sidecar carries the full key
        // TUPLE, so the mask+append lands merge-on-read like the
        // single-key form — O(keys) sidecar rows, no dir rewrite
        TableFormat.applyDeltaMulti(spark, root, delKeys, tks, appends,
          statsCols = statsCols, bloomCol = bloomCol)
    } finally cached.foreach(_.unpersist())
    if (newFields.nonEmpty) catalogIdent.foreach { id =>
      // schema evolution must also move the CATALOG's declared schema,
      // or the next read refuses on the declared-vs-committed check.
      // Align to the committed head (not `fields`): a merge that ended
      // up appending nothing leaves the manifest — and so the catalog —
      // unmoved
      TableFormat.latestSchema(root).foreach { head =>
        if (head.fieldNames.length >
            spark.sessionState.catalog.getTableMetadata(id)
              .dataSchema.fieldNames.length)
          spark.sessionState.catalog.alterTableDataSchema(id, head)
      }
    }
    catalogIdent.foreach(id => spark.catalog.refreshTable(id.quotedString))
    Seq.empty
  }
}
