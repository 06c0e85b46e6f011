package graft

/** Triangle-count spec: the degree-oriented (compact-forward) distributed
  * formulation must agree with a naive in-memory enumeration of the same
  * derived graph — an independent model with none of the orientation
  * machinery, so an orientation bug (double-counted or dropped triangles)
  * cannot cancel out.
  */
class GraphSpec extends TestSpark {

  test("oriented triangle count matches brute-force enumeration") {
    val n = 997L
    val xs = spark.read.parquet(s"$Sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0) % n).distinct
    val und = scala.collection.mutable.Set[(Long, Long)]()
    for {
      x <- xs
      b <- Seq((x + 1) % n, (x + 2) % n, (x + 3) % n,
        (x * 7 + 1) % n, (x * 13 + 3) % n)
      if b != x
    } und += ((math.min(x, b), math.max(x, b)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    und.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    // each triangle is seen once per edge — exactly 3 times
    val tri3 = und.toSeq.map { case (u, v) => (adj(u) & adj(v)).size.toLong }.sum
    assert(tri3 % 3 === 0L)
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = graft.SparkEntry.queries("q_graph_triangles")(spark, Sf)
      .collect().head
    assert(row.getLong(row.fieldIndex("n_triangles")) === tri3 / 3)
    assert(row.getLong(row.fieldIndex("n_wedges")) === wedges)
    // the 4-generator graph has real triangles — the query isn't
    // vacuously matching an empty join
    assert(tri3 > 0)
  }

  test("k-core peel reaches its fixpoint inside the round budget") {
    val n = 997L
    // sf0.01: the sf0.001 graph (150 of 997 nodes, 2 generators) peels
    // to an EMPTY 3-core — correct but vacuous; the denser graph keeps a
    // ~995-node core so the equality below actually exercises the peel
    val sf = "/root/testdata/sf0.01"
    val xs = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0) % n).distinct
    // brute-force peel to convergence on the same derived graph
    var und = (for {
      x <- xs.toSet[Long]
      b <- Seq((x * 7 + 1) % n, (x * 13 + 3) % n)
      if b != x
      e <- Seq((x, b), (b, x))
    } yield e)
    var changed = true
    while (changed) {
      val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= graft.ops.Graph.CoreK).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != und.size
      und = next
    }
    val expect = und.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_graph_kcore")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the bounded 6-round peel equals the run-to-convergence core — i.e.
    // the budget is sufficient on this graph, and every residual degree
    // is >= k by the fixpoint property
    assert(got === expect)
    assert(got.nonEmpty && got.forall(_._2 >= graft.ops.Graph.CoreK))
  }
}
