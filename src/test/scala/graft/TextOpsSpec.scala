package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-curation operators that guard a training run:
  * decontamination (eval-set leakage scan) and PII redaction. The per-value
  * correctness is oracle-checked; these assert the semantic invariants.
  */
class TextOpsSpec extends TestSpark {

  test("decontamination scans exactly the test split, ratios in [0,1]") {
    val d = graft.SparkEntry.queries("q_decontaminate")(spark, Sf).collect()
    assert(d.nonEmpty)
    // every reported doc is in the test split of the hash partition
    assert(d.forall(r => (r.getLong(0) * 2654435761L) % 100 >= 95))
    d.foreach { r =>
      val (n, c, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(c >= 0 && c <= n, s"doc ${r.getLong(0)}: $c of $n")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // the planted word-soup corpus shares plenty of 3-grams across splits —
    // a decontamination scan that finds nothing is broken
    assert(d.exists(_.getLong(2) > 0), "no contamination found at all")
  }

  test("sequence packing fills budgets contiguously per shard") {
    val p = graft.SparkEntry.queries("q_pack_sequences")(spark, Sf).collect()
    assert(p.length ===
      graft.io.Sources.table(spark, Sf, "documents").count())
    val byShardSeq = p.groupBy(r => (r.getLong(2), r.getLong(4)))
    byShardSeq.foreach { case ((shard, seq), docs) =>
      val toks = docs.map(_.getLong(1)).sum
      // a sequence only overflows 256 by (at most) its final document —
      // the contiguous-fill invariant; and no doc is dropped or duplicated
      val maxDoc = docs.map(_.getLong(1)).max
      assert(toks < 256 + maxDoc, s"shard $shard seq $seq packed $toks")
    }
    // seq ids are dense from 0 within each shard
    p.groupBy(_.getLong(2)).foreach { case (shard, docs) =>
      val seqs = docs.map(_.getLong(4)).distinct.sorted
      assert(seqs.head === 0L, s"shard $shard starts at seq ${seqs.head}")
    }
  }

  test("redaction removes every planted email and phone") {
    val r = graft.SparkEntry.queries("q_text_redact")(spark, Sf)
    assert(r.filter(!col("clean")).count() === 0,
      "redacted text still contains PII-shaped substrings")
    // the markers really replaced the planted tokens
    val row = r.filter(col("doc_id") === 3).collect().head
    val red = row.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    assert(!red.contains("@example.com") && !red.contains("555-"))
  }
}
