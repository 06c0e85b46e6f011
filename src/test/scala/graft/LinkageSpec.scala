package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

/** Specs for the pass-blocking record linkage: correctness of the pair
  * expansion on a controlled fixture, and the LOUD failure past the
  * per-mask-group cap on a degenerate identifier distribution (round-5
  * VERDICT #6 — same fail-loudly philosophy as `Dedup.MaxCcRounds`).
  */
class LinkageSpec extends TestSpark {

  import spark.implicits._

  test("linkPairs finds exactly the substitution-distance-1 pairs") {
    val ids = Seq(
      (1L, "AAAAAAAAA"),
      (2L, "AAAAAAAAB"), // dist 1 from #1
      (3L, "AAAAAABBB"), // dist 3 from #1, 2 from #2 — no pair
      (4L, "CCCCCCCCC"),
      (5L, "CCCCCCCCC")  // identical to #4 — dist 0, must NOT pair
    ).toDF("c_custkey", "ident")
    val pairs = Linkage.linkPairs(ids)
      .select("cust_a", "cust_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("degenerate identifier distribution trips the mask-group cap loudly") {
    // every row shares the same 9-char identifier, so ONE mask group holds
    // all of them — the heavy-tailed case the cap exists for. Size must
    // exceed MaxMaskGroup to trigger.
    val n = Linkage.MaxMaskGroup + 10
    val degenerate = spark.range(n)
      .select(col("id").as("c_custkey"), lit("ZZZZZZZZZ").as("ident"))
    // local mode surfaces the raise as SparkRuntimeException directly;
    // cluster task failures wrap it in SparkException — accept either
    val e = intercept[Exception] {
      Linkage.linkPairs(degenerate).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("mask group exceeds")),
      s"expected the cap's message in: ${messages(e).mkString(" | ")}")
  }

  test("group at exactly the cap still processes (boundary)") {
    // MaxMaskGroup identical-prefix idents differing in the LAST char:
    // the mask wildcarding position 9 holds exactly MaxMaskGroup rows —
    // at the cap, not over it — and must expand fine.
    val n = Linkage.MaxMaskGroup
    val ids = spark.range(n)
      .select(col("id").as("c_custkey"),
        concat(lit("AAAAAAAA"),
          // 0..9A..Z... distinct last chars would need n distinct symbols;
          // reuse printable chars cyclically — identical idents only fail
          // the levenshtein=1 filter, not the cap, so duplicates are fine
          lit("0123456789abcdefghijklmnopqrstuvwxyz")
            .substr((col("id") % 36).cast("int") + 1, lit(1))).as("ident"))
    // must not throw; pair count is data-shaped, just force execution
    Linkage.linkPairs(ids).count()
  }
}
