package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the scale-critical queries
  * so the partitioning/pushdown story is inspectable, not assumed.
  * `runMain graft.Explain [sfDir] [query ...]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter", "q_join_broadcast", "q_join_smj", "q_join_range",
        "q_topk", "q_sim_topk", "q_agg_basic", "q_dedup_minhash",
        // round-5 scale-critical additions: partition pruning, co-located
        // bucketed join, window-free bag difference, scaled flagship,
        // trained IVF, decontamination inverted-index probe
        "q_src_partitioned", "q_join_bucketed", "q_except_all", "q_person",
        "q_sim_ivf_trained", "q_decontaminate",
        // round-6: bounded-heap grouped top-k (partial ObjectHashAggregate
        // before the exchange), broadcast-model BM25, single-scan domain
        // mix, two-level re-aggregation, the 7-table bundle digests, and
        // integer PageRank's per-iteration shape
        "q_topk_group_heap", "q_text_bm25", "q_corpus_mix",
        "q_agg_reaggregate", "q_migrate_bundle", "q_pagerank",
        // round-10: the composed corpus pipeline (stage-boundary persist,
        // keyed windows), banded perceptual-hash image dedup, the k-gram
        // substring inverted index, and BPE train/encode
        "q_corpus_pipeline", "q_mm_dedup", "q_dedup_substring",
        "q_bpe_train", "q_bpe_encode")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
