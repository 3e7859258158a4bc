package graft

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
