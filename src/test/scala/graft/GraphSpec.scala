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
}
