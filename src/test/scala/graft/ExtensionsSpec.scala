package graft

import org.scalatest.funsuite.AnyFunSuite

/** The production registration path: TestSpark's session is built with
  * spark.sql.extensions=graft.GraftExtensions, so graft_cosine must resolve
  * from SQL text with no per-session register() call. */
class ExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("graft_cosine is injected via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("AsOfJoinStrategy rides the injected planner-strategy path") {
    // GraftRules.install (the imperative fallback) also registers the
    // strategy via experimental.extraStrategies, so a planned AsOfJoin
    // alone cannot prove injection worked — assert the extensions-built
    // session carries it in extraPlanningStrategies directly.
    assert(spark.sessionState.planner.extraPlanningStrategies
      .contains(graft.plans.AsOfJoinStrategy),
      "planner strategy missing from the SparkSessionExtensions path")
  }

  test("injected expression participates in codegen over a real table") {
    val d = TestSpark.sfDir
    Tables.embeddings(spark, d).createOrReplaceTempView("emb_ext_test")
    val rows = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb_ext_test a JOIN emb_ext_test b ON b.vec_id = a.vec_id
        |WHERE a.vec_id < 10 ORDER BY a.vec_id""".stripMargin).collect()
    assert(rows.length === 10)
    assert(rows.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }
}
