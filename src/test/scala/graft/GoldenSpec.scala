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

  test("agg_hash_global: total lineitem quantity 152257.0") {
    import org.apache.spark.sql.functions._
    val s = Tables.lineitem(spark, d).agg(round(sum("l_quantity"), 2)).collect()(0).getDouble(0)
    assert(s === 152257.0)
  }
}
