package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape pins for the composite analytic queries ([[graft.ops.Analytics]]).
  *
  * The whole point of declaring a multi-join pipeline as one DataFrame plan
  * is that Catalyst broadcasts every dimension and leaves exactly one
  * shuffle join — the fact-fact `lineitem ⋈ orders` edge. These tests pin
  * that shape so a refactor (a dropped `broadcast()` hint, a filter that
  * stops reaching the scan) can't silently turn a dimension join into a
  * second fact-sized exchange. Value correctness is owned by the DuckDB
  * oracle rows (`q_tpch_q3/q5/q10` in CORRECTNESS); this suite owns the
  * 100 TB plan shape.
  */
class AnalyticsSpec extends TestSpark {

  private def staticPlan(name: String) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // plan STRINGS truncate scan metadata at 100 chars by default —
    // a 4-predicate PushedFilters list gets cut mid-name and the pins
    // below would read false negatives
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")
    try graft.SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** The composite invariant: ≤1 shuffle join (the fact-fact edge), every
    * other join broadcast, no cartesian anywhere.
    */
  private def assertOneFactEdge(name: String, minBroadcast: Int): Unit = {
    val plan = staticPlan(name)
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"$name: cartesian product in plan:\n$plan")
    val smj = plan.collect { case j: SortMergeJoinExec => j }
    assert(smj.length <= 1,
      s"$name: ${smj.length} shuffle joins — a dimension lost its broadcast:\n$plan")
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.length >= minBroadcast,
      s"$name: expected >= $minBroadcast broadcast joins, got ${bhj.length}:\n$plan")
  }

  test("q_tpch_q3: one fact edge, customer broadcast, filters pushed") {
    assertOneFactEdge("q_tpch_q3", minBroadcast = 1)
    // both date bounds and the segment filter must reach the parquet scans
    val s = staticPlan("q_tpch_q3").toString
    assert(s.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || s.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"q_tpch_q3: segment filter not pushed to the customer scan:\n$s")
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(l_shipdate".r.findFirstIn(s).nonEmpty,
      s"q_tpch_q3: shipdate bound not pushed to the lineitem scan:\n$s")
  }

  test("q_tpch_q5: one fact edge among five joins, region/nation/customer/supplier broadcast") {
    // 5 joins total; >= 4 broadcast means the only possible shuffle join is
    // lineitem ⋈ orders (nation⋈region collapses inside a broadcast build)
    assertOneFactEdge("q_tpch_q5", minBroadcast = 4)
  }

  test("q_tpch_q5_cbo: manifest stats drive CBO reorder, zero ANALYZE scans") {
    // the fixture lands the six FORMAT-backed tables (row accounts, zone
    // maps, NDV sketches recorded at write time) and registers them —
    // no ANALYZE TABLE anywhere in this test or the query path
    graft.ops.Analytics.qTpchQ5Cbo(spark, Sf)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      // manifest-fed plan statistics on the fact table
      val st = spark.table("graft_cbo5_lineitem")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.exists(_ > 0),
        s"plan rowCount must come from the manifest account: ${st.rowCount}")
      assert(st.attributeStats.exists { case (a, cs) =>
        a.name == "l_orderkey" && cs.distinctCount.isDefined },
        "plan NDV(l_orderkey) must come from the manifest sketches")
      // the worst-practice SYNTACTIC order must be restructured by the
      // manifest-fed cost model — same SQL, CBO off vs on
      def shape(on: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", on.toString)
        spark.sql(graft.ops.Analytics.Q5CboSql)
          .queryExecution.optimizedPlan.toString
      }
      val off = shape(on = false)
      val on = shape(on = true)
      assert(on !== off,
        s"manifest-fed CBO left the syntactic q5 join order untouched:\n$on")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
    // and the registered key's own physical plan keeps the one-fact-edge
    // shape: >= 4 broadcasts, <= 1 shuffle join, no cartesian
    assertOneFactEdge("q_tpch_q5_cbo", minBroadcast = 4)
  }

  test("q_tpch_q9_cbo: manifest stats order the joins with no fact predicate") {
    // q9 has NO selective fact filter (every order year aggregates), so
    // the reorder leans on manifest row counts + join-key NDVs alone;
    // 4 joins, >= 3 broadcast leaves lineitem ⋈ orders the one shuffle
    graft.ops.Analytics.qTpchQ9Cbo(spark, Sf)
    assertOneFactEdge("q_tpch_q9_cbo", minBroadcast = 3)
    // CBO must actually restructure the worst-practice syntactic order
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try {
      def shape(on: Boolean): String = {
        spark.conf.set("spark.sql.cbo.enabled", on.toString)
        spark.sql(graft.ops.Analytics.Q9CboSql)
          .queryExecution.optimizedPlan.toString
      }
      val off = shape(on = false)
      val on = shape(on = true)
      assert(on !== off,
        s"manifest-fed CBO left the syntactic q9 join order untouched:\n$on")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }

  test("q_tpch_q10: one fact edge, returnflag filter pushed") {
    assertOneFactEdge("q_tpch_q10", minBroadcast = 2)
    val s = staticPlan("q_tpch_q10").toString
    assert(s.contains("EqualTo(l_returnflag,R)"),
      s"q_tpch_q10: returnflag filter not pushed to the lineitem scan:\n$s")
  }

  test("q_tpch_q21: correlated EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val plan = staticPlan("q_tpch_q21")
    // the whole point: RewritePredicateSubquery must have rewritten both
    // correlated subqueries into joins — a nested-loop (or cartesian)
    // operator means a per-row lineitem re-scan, the O(rows × probes)
    // plan that dies at 100 TB
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q21: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q21: nested-loop join — subquery not decorrelated:\n$plan")
    val joinTypes = (plan.collect { case j: SortMergeJoinExec => j.joinType } ++
      plan.collect { case j: ShuffledHashJoinExec => j.joinType } ++
      plan.collect { case j: BroadcastHashJoinExec => j.joinType })
    assert(joinTypes.contains(LeftSemi),
      s"q_tpch_q21: EXISTS did not become a semi join: $joinTypes\n$plan")
    assert(joinTypes.contains(LeftAnti),
      s"q_tpch_q21: NOT EXISTS did not become an anti join: $joinTypes\n$plan")
    // the orderstatus and returnflag filters still reach the scans
    val s = plan.toString
    assert(s.contains("EqualTo(o_orderstatus,F)"),
      s"q_tpch_q21: orderstatus filter not pushed:\n$s")
    assert(s.contains("EqualTo(l_returnflag,R)"),
      s"q_tpch_q21: returnflag filter not pushed:\n$s")
  }

  test("q_tpch_q17: correlated scalar subquery decorrelates to one aggregate") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val plan = staticPlan("q_tpch_q17")
    // RewriteCorrelatedScalarSubquery must have turned the per-row
    // threshold subquery into ONE grouped per-part aggregate joined
    // back on l_partkey — a nested-loop/cartesian operator would mean a
    // per-row lineitem re-aggregation, O(rows × parts) at 100 TB
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q17: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q17: nested-loop join — scalar subquery not decorrelated:\n$plan")
    // the decorrelated shape has a grouped (per-part) aggregate BELOW
    // the final global one — at least two aggregates with ≥1 grouped
    val aggs = plan.collect { case a: HashAggregateExec => a.groupingExpressions } ++
      plan.collect { case a: ObjectHashAggregateExec => a.groupingExpressions }
    assert(aggs.exists(_.nonEmpty),
      s"q_tpch_q17: no grouped aggregate — threshold not decorrelated:\n$plan")
    assert(staticPlan("q_tpch_q17").toString.contains("EqualTo(p_brand,Brand#1)"),
      "q_tpch_q17: brand filter not pushed to the part scan")
  }

  test("q_tpch_q2: correlated MIN decorrelates to one grouped aggregate, region filter pushed") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val plan = staticPlan("q_tpch_q2")
    // the correlated `price = (SELECT min(...) WHERE l2.l_partkey =
    // p_partkey)` must become ONE per-part min-aggregate joined back on
    // (partkey, price) — a nested-loop/cartesian means re-running the
    // region join once per outer row, O(rows × parts) at 100 TB
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q2: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q2: nested-loop join — correlated MIN not decorrelated:\n$plan")
    val aggs = plan.collect { case a: HashAggregateExec => a.groupingExpressions } ++
      plan.collect { case a: ObjectHashAggregateExec => a.groupingExpressions }
    assert(aggs.exists(_.nonEmpty),
      s"q_tpch_q2: no grouped aggregate — MIN subquery not decorrelated:\n$plan")
    // both the outer and the subquery's region scans keep the EUROPE pin
    val s = plan.toString
    assert(s.contains("EqualTo(r_name,EUROPE)"),
      s"q_tpch_q2: region filter not pushed:\n$s")
    assert("GreaterThanOrEqual\\(p_size,10\\)".r.findFirstIn(s).nonEmpty,
      s"q_tpch_q2: part size bound not pushed:\n$s")
  }

  test("q_tpch_q9: dims broadcast around one fact edge, part LIKE pushed") {
    assertOneFactEdge("q_tpch_q9", minBroadcast = 3)
    val s = staticPlan("q_tpch_q9").toString
    assert(s.contains("StringContains(p_name,widget)"),
      s"q_tpch_q9: p_name LIKE not pushed to the part scan:\n$s")
  }

  test("q_tpch_q4: EXISTS decorrelates to one semi join, filters pushed") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val plan = staticPlan("q_tpch_q4")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q4: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q4: nested-loop join — EXISTS not decorrelated:\n$plan")
    val joinTypes = plan.collect { case j: SortMergeJoinExec => j.joinType } ++
      plan.collect { case j: ShuffledHashJoinExec => j.joinType } ++
      plan.collect { case j: BroadcastHashJoinExec => j.joinType }
    assert(joinTypes.contains(LeftSemi),
      s"q_tpch_q4: EXISTS did not become a semi join: $joinTypes\n$plan")
    val s = plan.toString
    assert(s.contains("EqualTo(l_returnflag,R)"),
      s"q_tpch_q4: returnflag filter not pushed to the lineitem scan:\n$s")
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate".r
        .findFirstIn(s).nonEmpty,
      s"q_tpch_q4: orderdate bound not pushed to the orders scan:\n$s")
  }

  test("q_tpch_q20: both INs decorrelate to semi joins, no re-aggregation loop") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val plan = staticPlan("q_tpch_q20")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q20: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q20: nested-loop join — an IN not decorrelated:\n$plan")
    val joinTypes = plan.collect { case j: SortMergeJoinExec => j.joinType } ++
      plan.collect { case j: ShuffledHashJoinExec => j.joinType } ++
      plan.collect { case j: BroadcastHashJoinExec => j.joinType }
    assert(joinTypes.count(_ == LeftSemi) >= 2,
      s"q_tpch_q20: expected 2 semi joins (nested INs): $joinTypes\n$plan")
    val s = plan.toString
    assert(s.contains("EqualTo(p_type,PROMO)"),
      s"q_tpch_q20: part-type filter not pushed:\n$s")
  }

  test("q_tpch_q22: NOT EXISTS decorrelates to an anti join, scalar avg stays one aggregate") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val plan = staticPlan("q_tpch_q22")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q22: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q22: nested-loop join — NOT EXISTS not decorrelated:\n$plan")
    val joinTypes = plan.collect { case j: SortMergeJoinExec => j.joinType } ++
      plan.collect { case j: ShuffledHashJoinExec => j.joinType } ++
      plan.collect { case j: BroadcastHashJoinExec => j.joinType }
    assert(joinTypes.contains(LeftAnti),
      s"q_tpch_q22: NOT EXISTS did not become an anti join: $joinTypes\n$plan")
    val s = plan.toString
    assert(s.contains("EqualTo(o_orderpriority,1-URGENT)"),
      s"q_tpch_q22: priority filter not pushed to the orders scan:\n$s")
  }

  test("q_tpch_q15: scalar max runs the revenue aggregate once, no re-aggregation") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val plan = staticPlan("q_tpch_q15")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q15: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q15: nested-loop join — scalar subquery not planned as one aggregate:\n$plan")
    val aggs = plan.collect { case a: HashAggregateExec => a.groupingExpressions } ++
      plan.collect { case a: ObjectHashAggregateExec => a.groupingExpressions }
    assert(aggs.exists(_.nonEmpty),
      s"q_tpch_q15: no grouped revenue aggregate in plan:\n$plan")
    val s = staticPlan("q_tpch_q15").toString
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
        .findFirstIn(s).nonEmpty,
      s"q_tpch_q15: shipdate bound not pushed to the lineitem scan:\n$s")
  }

  test("q_tpch_q16: NOT IN decorrelates to a null-aware anti join") {
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val plan = staticPlan("q_tpch_q16")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q16: cartesian product in plan:\n$plan")
    // NOT IN is three-valued: the planned join must be ANTI and
    // null-aware (Spark's broadcast NAAJ) — never a per-row supplier
    // re-scan. BroadcastHashJoinExec carries the isNullAwareAntiJoin
    // flag for exactly this shape.
    val naaj = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == LeftAnti && j.isNullAwareAntiJoin => j
    }
    val anyAnti = plan.collect { case j: BroadcastHashJoinExec
        if j.joinType == LeftAnti => j } ++
      plan.collect { case j: SortMergeJoinExec
        if j.joinType == LeftAnti => j } ++
      plan.collect { case j: ShuffledHashJoinExec
        if j.joinType == LeftAnti => j }
    assert(naaj.nonEmpty || anyAnti.nonEmpty,
      s"q_tpch_q16: NOT IN did not become an anti join:\n$plan")
    val s = plan.toString
    assert(s.contains("LessThan(s_acctbal,0.0)"),
      s"q_tpch_q16: acctbal filter not pushed to the supplier scan:\n$s")
    assert("PushedFilters: \\[[^\\]]*In\\(p_size".r.findFirstIn(s).nonEmpty,
      s"q_tpch_q16: size IN-list not pushed to the part scan:\n$s")
  }

  test("q_tpch_q6: all three filters reach the parquet scan") {
    val plan = staticPlan("q_tpch_q6")
    val s = plan.toString
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty &&
      plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"q_tpch_q6 is a pure scan-aggregate — no join belongs here:\n$plan")
    for (p <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24",
        "GreaterThanOrEqual(l_discount,0.02", "LessThanOrEqual(l_discount,0.04"))
      assert(s.contains(p), s"q_tpch_q6: '$p' not pushed to the scan:\n$s")
  }

  test("q_tpch_q14: single lineitem scan feeds both CASE branches, part broadcast") {
    val plan = staticPlan("q_tpch_q14")
    val s = plan.toString
    val liScans = "lineitem\\.parquet".r.findAllIn(s).length
    assert(liScans == 1, s"q_tpch_q14: expected 1 lineitem scan, got $liScans:\n$s")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"q_tpch_q14: part should broadcast:\n$plan")
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
        .findFirstIn(s).nonEmpty,
      s"q_tpch_q14: shipdate bound not pushed:\n$s")
  }

  test("q_tpch_q19: the common join key is extracted from the disjunction") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val plan = staticPlan("q_tpch_q19")
    // the naive plan is a cartesian (or nested-loop) carrying the whole
    // OR as its condition — the optimizer must factor the shared
    // p_partkey = l_partkey out into ONE equi-join
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q19: cartesian product — join key not factored out:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q19: nested-loop join — join key not factored out:\n$plan")
    assert((plan.collect { case j: BroadcastHashJoinExec => j } ++
      plan.collect { case j: SortMergeJoinExec => j }).nonEmpty,
      s"q_tpch_q19: no equi-join in plan:\n$plan")
  }

  test("q_tpch_q7: twin nation dims broadcast around one fact edge") {
    assertOneFactEdge("q_tpch_q7", minBroadcast = 3)
  }

  test("q_tpch_q8: seven tables, dims broadcast, one fact edge") {
    assertOneFactEdge("q_tpch_q8", minBroadcast = 4)
    val s = staticPlan("q_tpch_q8").toString
    assert(s.contains("EqualTo(p_type,PROMO)"),
      s"q_tpch_q8: part-type filter not pushed:\n$s")
    assert(s.contains("EqualTo(r_name,ASIA)"),
      s"q_tpch_q8: region filter not pushed:\n$s")
  }

  test("q_tpch_q11: HAVING's global scalar is one aggregate, not a per-group re-scan") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val plan = staticPlan("q_tpch_q11")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_tpch_q11: cartesian product in plan:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"q_tpch_q11: nested-loop join — scalar threshold re-scans per group:\n$plan")
    val aggs = plan.collect { case a: HashAggregateExec => a.groupingExpressions } ++
      plan.collect { case a: ObjectHashAggregateExec => a.groupingExpressions }
    assert(aggs.exists(_.nonEmpty),
      s"q_tpch_q11: no grouped aggregate in plan:\n$plan")
    assert(staticPlan("q_tpch_q11").toString.contains("EqualTo(s_nationkey,12)"),
      "q_tpch_q11: nation filter not pushed to the supplier scan")
  }

  test("q_tpch_q12: one fact edge, shipdate window pushed") {
    val plan = staticPlan("q_tpch_q12")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    val s = plan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate".r
        .findFirstIn(s).nonEmpty,
      s"q_tpch_q12: shipdate bound not pushed:\n$s")
  }

  test("q_tpch_q13: ON-clause filter keeps the LEFT OUTER, zero-order customers counted") {
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val plan = staticPlan("q_tpch_q13")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    val joinTypes = plan.collect { case j: SortMergeJoinExec => j.joinType } ++
      plan.collect { case j: ShuffledHashJoinExec => j.joinType } ++
      plan.collect { case j: BroadcastHashJoinExec => j.joinType }
    assert(joinTypes.contains(LeftOuter),
      s"q_tpch_q13: the outer join degraded (ON-filter pushed as WHERE?): $joinTypes\n$plan")
    // the ON-vs-WHERE invariant: EVERY customer appears in the
    // histogram (a WHERE-pushed filter would drop customers whose
    // every order it excluded, shrinking the distribution's mass)
    val rows = graft.SparkEntry.queries("q_tpch_q13")(spark, Sf).collect()
    val mass = rows.map(_.getLong(1)).sum
    val nCustomers = graft.io.Sources.table(spark, Sf, "customer").count()
    assert(mass === nCustomers,
      s"q_tpch_q13: histogram covers $mass of $nCustomers customers — " +
        "the ON-clause filter leaked into the outer join's WHERE")
  }

  test("q_tpch_q18: aggregate partitioning reused, no second lineitem scan") {
    val plan = staticPlan("q_tpch_q18")
    val s = plan.toString
    // one lineitem scan only — the HAVING sum IS the output column
    val liScans = "lineitem\\.parquet".r.findAllIn(s).length
    assert(liScans == 1, s"q_tpch_q18: expected 1 lineitem scan, got $liScans:\n$s")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    // exchanges: lineitem aggregate + orders join side + top-k. The
    // aggregate's own hash partitioning feeds the SMJ directly — a 4th
    // exchange means the big-order side got needlessly re-shuffled.
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.length <= 3,
      s"q_tpch_q18: ${shuffles.length} exchanges — aggregate partitioning not reused:\n$plan")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"q_tpch_q18: customer should broadcast:\n$plan")
  }

  test("composites: shuffle count stays fact-bounded") {
    // each composite needs at most: 2 exchanges feeding the fact SMJ +
    // 1 aggregate exchange + 1 presentation sort/limit exchange
    for (name <- Seq("q_tpch_q3", "q_tpch_q5", "q_tpch_q10", "q_tpch_q18")) {
      val shuffles = staticPlan(name).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length <= 4,
        s"$name: ${shuffles.length} exchanges — more than the fact edge + agg + sort need")
    }
  }

  test("composites return rows at sf0.001") {
    for (name <- Seq("q_tpch_q3", "q_tpch_q5", "q_tpch_q10", "q_tpch_q18",
        "q_tpch_q4", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q11",
        "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
        "q_tpch_q16", "q_tpch_q19", "q_tpch_q20", "q_tpch_q22")) {
      val n = graft.SparkEntry.queries(name)(spark, Sf).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
