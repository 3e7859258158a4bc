package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE-interplay pins (SURVEY §5): PlanSpec freezes STATIC planning with AQE
  * off; the driver harness and any real cluster run with AQE on and default
  * broadcast thresholds. These tests prove the two scale-critical custom
  * plan properties survive that configuration:
  *
  *  - the HammingBandedJoin rewrite is a LOGICAL rule — AQE re-plans
  *    physical stages, so the rewrite must still fire and stay exact;
  *  - a bucketed co-located SortMergeJoin has no Exchange, hence no shuffle
  *    stage boundary for AQE to re-plan — AQE must leave it shuffle-free
  *    rather than inserting one.
  */
class AqeInterplaySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def withAqe[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("HammingBandedJoin fires and stays exact with AQE enabled") {
    withAqe {
      val df = SparkEntry.queries("opt_hamming_rewrite")(spark, d)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("__graft_band"), s"rule did not fire under AQE:\n$opt")
      val viaRule = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val byHand = SparkEntry.queries("llm_simhash")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaRule === byHand, "AQE changed the banded join's result")
      assert(viaRule.nonEmpty, "no pairs at sf0.001 — vacuous test")
    }
  }

  test("as-of join: planted hot by-key under AQE — exact, and never skew-split") {
    // VERDICT r8 #3. AQE's OptimizeSkewedJoin splits oversized shuffle
    // partitions for SortMergeJoin/ShuffledHashJoin ONLY — it pattern-
    // matches those exec nodes and re-plans their stage reads. A custom
    // exec like AsOfJoinExec is invisible to it, and that is the CORRECT
    // behavior, not a gap: the merge needs every row of a by-key in one
    // partition (ClusteredDistribution), and splitting the left side
    // mid-key would need the matching right-side rows DUPLICATED into
    // each split (the special-casing OptimizeSkewedJoin carries for SMJ
    // sides) — machinery a custom node does not get. So a hot by-key
    // rides one task end-to-end: skew amplification equals the key
    // distribution itself, exactly like an SMJ with skew-split off.
    // Mitigation at 100 TB is upstream — finer by-keys, or pre-salting
    // with the composed twin (join_skew_salted's pattern) — not AQE.
    // This pins both halves: the result stays exact under a planted
    // hot key with aggressively-low skew thresholds (AQE must not
    // corrupt the merge even while re-planning the exchanges), and the
    // adaptive plan keeps AsOfJoinExec with no skew markers.
    import spark.implicits._
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds low enough that an equivalent SMJ stage WOULD qualify
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try withAqe {
      // key 0 holds 40k of ~41k left rows; right carries a ts grid per
      // key with a value derived from (key, ts) so the expected match is
      // computable without joining back.
      val left = spark.range(0, 41000).select(
        when($"id" < 40000, 0L).otherwise($"id" % 50 + 1).as("k"),
        ($"id" % 997).as("t"))
      val right = spark.range(0, 51).select($"id".as("rk"))
        .crossJoin(spark.range(0, 100).select(($"id" * 10).as("rt")))
        .select($"rk", $"rt", ($"rk" * 1000000 + $"rt").as("v"))
      val out = graft.api.Graft.asofJoin(
          left, right, Seq("k"), Seq("rk"), "t", "rt")
        .groupBy("k", "t", "rt", "v").count()
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (k, t, rt, v) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        assert(rt === t - t % 10, s"wrong as-of match for (k=$k, t=$t): rt=$rt")
        assert(v === k * 1000000 + rt, s"match from the wrong key row: $r")
      }
      // every left row matches (grid starts at 0 <= every t), so the
      // grouped counts must add back up to the full left cardinality
      assert(out.map(_.getLong(4)).sum === 41000L,
        "hot-key rows lost or duplicated under AQE re-planning")
      val f = graft.api.Graft.asofJoin(
          left, right, Seq("k"), Seq("rk"), "t", "rt")
      f.collect() // finalize the adaptive plan
      val p = f.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin"), s"lost the native as-of under AQE:\n$p")
      assert(!p.toLowerCase.contains("skew"),
        s"AQE skew-split reached into the custom as-of exchanges:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed join stays Exchange-free with AQE on, default thresholds") {
    // build the bucketed tables via the contract key, then pin the final
    // ADAPTIVE plan of the join: the merge hint stands in for the big⋈big
    // shape (at 100 TB the planner picks SMJ itself; at sf0.001 defaults
    // would broadcast the toy dim and bypass bucket reads entirely).
    SparkEntry.queries("join_bucketed")(spark, d).collect()
    val (ordersTbl, custTbl) = graft.ops.JoinOps.bucketedTables(spark, d)
    withAqe {
      val o = spark.table(ordersTbl)
      val c = spark.table(custTbl)
      val j = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_mktsegment"))
      j.collect() // finalize the adaptive plan
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"lost the co-located SMJ:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scan not bucketed:\n$p")
      assert(!p.contains("Exchange"),
        s"AQE inserted an exchange into the bucketed join:\n$p")
    }
  }
}
