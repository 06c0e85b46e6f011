package graft

import org.apache.spark.sql.functions._

import graft.ops.Bloom

/** The [[graft.ops.Bloom]] prune is only sound if it NEVER drops a key
  * present in the build set — that one-sided contract is what lets the
  * decontamination queries keep their oracle SQL unchanged. These specs
  * pin the contract and the reason the prune exists (it actually prunes).
  */
class BloomSpec extends TestSpark {
  import spark.implicits._

  test("no false negatives: every build key passes its own filter") {
    // adversarial key shapes in one pass: empty string, whitespace,
    // unicode, duplicates, very long keys, digit-only, real shingles
    val keys = Seq("", " ", "  ", "a", "a", "ü ñ €", "日本語 テスト",
      "x" * 10000, "0", "-1", "the quick brown", "quick brown fox") ++
      (0 until 2000).map(i => s"shingle $i body")
    val df = keys.toDF("k")
    val survivors = Bloom.prune(df, "k", df, "k").count()
    assert(survivors == keys.length.toLong,
      s"filter dropped ${keys.length - survivors} of its own build keys")
  }

  test("no false negatives on a disjoint probe superset (subset recovered exactly)") {
    val build = (0 until 500).map(i => s"shingle $i text").toDF("k")
    val probe = (0 until 5000).map(i => s"shingle $i text").toDF("k")
    val pruned = Bloom.prune(probe, "k", build, "k")
    // the 500 true members must all survive; the exact join after a prune
    // must therefore see every true pair
    val verified = pruned.join(build.withColumnRenamed("k", "b"),
      col("k") === col("b")).count()
    assert(verified == 500L, s"exact-join recovered $verified of 500 members")
  }

  test("the filter prunes: non-member pass rate under 5% at design load") {
    // 10k build keys in a 2^20-bit filter ≈ the documented 10-bits/key
    // regime; 50k disjoint probes → fp well under 5%
    val build = (0 until 10000).map(i => s"member-$i").toDF("k")
    val probe = (0 until 50000).map(i => s"outsider-$i").toDF("k")
    val passed = Bloom.prune(probe, "k", build, "k").count()
    assert(passed < 2500L, s"fp pass-through $passed / 50000 — filter too full")
    assert(passed < 50000L, "filter passed everything — pruning is a no-op")
  }

  test("empty build set rejects every probe (degenerate prune is total)") {
    val build = Seq.empty[String].toDF("k")
    val probe = (0 until 100).map(i => s"p$i").toDF("k")
    assert(Bloom.prune(probe, "k", build, "k").count() == 0L)
  }

  test("bitmap is one broadcastable row, bounded by mBits/64 words") {
    val bm = Bloom.bitmap((0 until 1000).map(_.toString).toDF("k"), "k")
    val rows = bm.collect()
    assert(rows.length == 1)
    val words = rows(0).getMap[Int, Long](0)
    assert(words.size <= Bloom.DefaultBits / 64)
    // 1000 keys × 2 probes can set at most 2000 bits
    assert(words.size <= 2000)
  }
}
