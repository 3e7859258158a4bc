package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden pins (SURVEY §5): a handful of exact values at sf0.001, computed
  * independently in DuckDB and frozen here — regression teeth that catch a
  * semantics change even when it stays self-consistent (which the
  * determinism double-run alone would miss). */
class GoldenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("join_broadcast: 25 nation-region rows") {
    assert(SparkEntry.queries("join_broadcast")(spark, d).count() === 25L)
  }

  test("llm_ngram: top bigram is ('order fast', 51)") {
    val top = SparkEntry.queries("llm_ngram")(spark, d).collect()(0)
    assert(top.getString(0) === "order fast")
    assert(top.getLong(1) === 51L)
  }

  test("llm_exact_dedup: 500 distinct normalized hashes (no exact dups planted)") {
    assert(SparkEntry.queries("llm_exact_dedup")(spark, d).count() === 500L)
  }

  test("llm_neardup_minhash: exactly the 28 planted near-dup pairs") {
    assert(SparkEntry.queries("llm_neardup_minhash")(spark, d).count() === 28L)
  }

  test("stream_tumbling: 868 (hour, type) groups") {
    assert(SparkEntry.queries("stream_tumbling")(spark, d).count() === 868L)
  }

  test("join_interval: 7 order-years") {
    assert(SparkEntry.queries("join_interval")(spark, d).count() === 7L)
  }

  test("llm_neardup_clusters: 500 docs, 476 keepers, 21 non-trivial clusters") {
    val rows = SparkEntry.queries("llm_neardup_clusters")(spark, d).collect()
    assert(rows.length === 500)
    assert(rows.count(_.getBoolean(2)) === 476)
    val nontrivial = rows.filterNot(_.getBoolean(2)).map(_.getLong(1)).distinct
    assert(nontrivial.length === 21)
  }

  test("stream_stream_outer: 589 rows of which 21 null-matches") {
    val rows = SparkEntry.queries("stream_stream_outer")(spark, d).collect()
    assert(rows.length === 589)
    assert(rows.count(_.isNullAt(3)) === 21)
  }

  test("opt_cosine_rewrite: banded 842 of 920 exact pairs (recall 0.915)") {
    assert(SparkEntry.queries("opt_cosine_rewrite")(spark, d).count() === 842L)
    assert(SparkEntry.queries("llm_neardup_embedding")(spark, d).count() === 920L)
  }

  test("join_bucketed: 5 market segments") {
    assert(SparkEntry.queries("join_bucketed")(spark, d).count() === 5L)
  }

  test("stream_file_sink: 868 (hour, type) groups, same as stream_tumbling") {
    assert(SparkEntry.queries("stream_file_sink")(spark, d).count() === 868L)
  }

  test("llm_neardup_containment: 28 pairs, (0, 50) fully contained (cont = 1.0)") {
    val rows = SparkEntry.queries("llm_neardup_containment")(spark, d).collect()
    assert(rows.length === 28)
    assert((rows(0).getLong(0), rows(0).getLong(1), rows(0).getDouble(2))
      === ((0L, 50L, 1.0)))
  }

  test("llm_dedup_incremental: 16 day-2-touching pairs, first (0, 50, 0.9524)") {
    val rows = SparkEntry.queries("llm_dedup_incremental")(spark, d).collect()
    assert(rows.length === 16)
    assert((rows(0).getLong(0), rows(0).getLong(1), rows(0).getDouble(2))
      === ((0L, 50L, 0.9524)))
  }

  test("llm_quantize_int8 preserves q0's exact top-1 neighbor (17 @ 0.334)") {
    // exact search (llm_knn_ivf / bruteforce) ranks n_id 17 first for q_id 0
    // at cos 0.3345; the int8-dequantized search must keep that rank with
    // the cosine within quantization error
    val q = SparkEntry.queries("llm_quantize_int8")(spark, d).collect()
    assert(q.length === 500)
    assert((q(0).getLong(0), q(0).getInt(1), q(0).getLong(2), q(0).getDouble(3))
      === ((0L, 1, 17L, 0.334)))
  }

  test("llm_knn_ivf (trained cells): 500 rows, q0 top-1 = (17, 0.3345)") {
    val r = SparkEntry.queries("llm_knn_ivf")(spark, d).collect()
    assert(r.length === 500)
    assert((r(0).getLong(0), r(0).getInt(1), r(0).getLong(2), r(0).getDouble(3))
      === ((0L, 1, 17L, 0.3345)))
  }

  test("stream_jdbc_sink: 868 (hour, type) groups, same as stream_tumbling") {
    assert(SparkEntry.queries("stream_jdbc_sink")(spark, d).count() === 868L)
  }

  test("llm_repetition_filter: 392/500 kept; doc 0 rejected on top-word 0.1304") {
    val rows = SparkEntry.queries("llm_repetition_filter")(spark, d).collect()
    assert(rows.length === 500)
    assert(rows.count(_.getBoolean(4)) === 392)
    assert((rows(0).getLong(0), rows(0).getLong(1), rows(0).getDouble(2),
            rows(0).getDouble(3), rows(0).getBoolean(4))
      === ((0L, 23L, 0.1304, 0.0, false)))
  }

  test("agg_hash_global: total lineitem quantity 152257.0") {
    import org.apache.spark.sql.functions._
    val s = Tables.lineitem(spark, d).agg(round(sum("l_quantity"), 2)).collect()(0).getDouble(0)
    assert(s === 152257.0)
  }

  test("llm_substring_dedup: 45 of 500 docs carry the 1073 repeated spans") {
    // frozen from an independent DuckDB computation at sf0.001
    val rows = SparkEntry.queries("llm_substring_dedup")(spark, d).collect()
    assert(rows.length === 500)
    assert(rows.count(_.getLong(2) > 0) === 45)
  }
  test("agg_chi_square: (99 cells, dof 76, chi2 73.9885) at sf0.001") {
    val r = SparkEntry.queries("agg_chi_square")(spark, d).head()
    assert(r.getInt(0) === 99)
    assert(r.getInt(1) === 76)
    assert(r.getDouble(2) === 73.9885)
  }

  test("agg_ks_test: D = 0.0646 over 210 clicks / 188 views at sf0.001") {
    val r = SparkEntry.queries("agg_ks_test")(spark, d).head()
    assert(r.getLong(0) === 210L)
    assert(r.getLong(1) === 188L)
    assert(r.getDouble(2) === 0.0646)
  }

  test("obs_drift_psi: psi = 0.0869 over 72 expected / 53 actual at sf0.001") {
    val r = SparkEntry.queries("obs_drift_psi")(spark, d).head()
    assert(r.getLong(0) === 72L)
    assert(r.getLong(1) === 53L)
    assert(r.getDouble(2) === 0.0869)
  }

  test("agg_association_rules: 433 rules clear the support floor at sf0.001") {
    assert(SparkEntry.queries("agg_association_rules")(spark, d).count() === 433L)
  }

  test("llm_corpus_stats: 500 docs, all texts distinct, dup_rate 0") {
    val r = SparkEntry.queries("llm_corpus_stats")(spark, d).head()
    assert(r.getLong(0) === 500L)
    assert(r.getLong(4) === 500L)
    assert(r.getDouble(7) === 0.0)
  }

  test("ANN recall board at sf0.001: LSH 0.914, IVF 0.612, IVF-PQ 0.476, matryoshka 0.06") {
    // The per-index measured-recall values frozen (r15 verdict #2): each
    // is mean per-query recall@5 of the REAL search against brute-force
    // truth, through the gated recall keys (matryoshka's own output
    // carries its recall). The random fixture embeddings make these
    // discriminating, not vanity numbers — a quantizer, banding, ADC, or
    // truncation regression moves its row.
    import org.apache.spark.sql.functions.{avg, round => rnd}
    def meanRecall(key: String): Double =
      SparkEntry.queries(key)(spark, d)
        .agg(rnd(avg("recall"), 4)).head.getDouble(0)
    assert(meanRecall("llm_ann_recall_eval") === 0.914)
    assert(meanRecall("llm_ann_recall_ivf") === 0.612)
    assert(meanRecall("llm_ann_recall_ivfpq") === 0.476)
    assert(meanRecall("llm_matryoshka_ann") === 0.06)
    // MRR of the LSH index (r17): exactly 1.0 here — recall@5 = 0.914
    // means the index misses some LOWER-ranked true neighbors, but every
    // query's rank-1 result is a true top-5 member on this fixture. The
    // pin is a swap detector: exchanging truth/approx sides or breaking
    // the first_rank min would crater it.
    val mrr = SparkEntry.queries("llm_mrr_eval")(spark, d)
      .agg(rnd(avg("rr"), 4)).head.getDouble(0)
    assert(mrr === 1.0)
  }
}
