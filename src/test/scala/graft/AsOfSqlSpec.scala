package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ASOF JOIN SQL front end (graft.plans.AsOfSqlParser, injected via
  * GraftExtensions.injectParser): the native operator reached through
  * `spark.sql` text. The DuckDB ASOF JOIN oracle hash-gates the sql_asof
  * contract key; these tests pin what the oracle can't see — that the TEXT
  * actually plans to AsOfJoinExec (not a window fallback), that all three
  * variants (backward/forward/outer) are reachable from SQL, that operand
  * order in the ts bound doesn't matter, that the clause composes with
  * WHERE/GROUP BY tails, and that malformed clauses fail loudly instead of
  * silently mis-joining. */
class AsOfSqlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def events(): Unit =
    Tables.events(spark, d).createOrReplaceTempView("events_m")

  private val backwardSql = """
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM (SELECT * FROM events_m WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events_m WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id"""

  test("sql_asof text plans the native AsOfJoinExec, no window") {
    events()
    val qe = spark.sql(backwardSql).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"SQL text did not reach AsOfJoinExec:\n$p")
    assert(!p.contains("Window"), s"SQL as-of fell back to a window plan:\n$p")
  }

  test("SQL backward asof ≡ join_asof_native bit-for-bit") {
    events()
    val sql = spark.sql(backwardSql).collect().map(_.mkString("|"))
    val native = SparkEntry.queries("join_asof_native")(spark, d)
      .collect().map(_.mkString("|"))
    assert(sql.nonEmpty && sql.toSeq === native.toSeq)
  }

  test("ASOF LEFT JOIN ≡ join_asof_outer; flipped ts bound ≡ forward") {
    events()
    val outer = spark.sql("""
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM (SELECT * FROM events_m WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events_m WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""").collect().map(_.mkString("|"))
    val outerKey = SparkEntry.queries("join_asof_outer")(spark, d)
      .collect().map(_.mkString("|"))
    assert(outer.toSeq === outerKey.toSeq)

    // l.ts <= r.ts selects the forward variant; writing the same bound as
    // s.ts >= p.ts must normalize to the identical join.
    for (bound <- Seq("p.ts <= s.ts", "s.ts >= p.ts")) {
      val fwd = spark.sql(s"""
        SELECT p.event_id, p.user_id, p.ts, s.ts AS next_signup_ts
        FROM (SELECT * FROM events_m WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events_m WHERE event_type = 'signup') s
          ON p.user_id = s.user_id AND $bound
        ORDER BY p.event_id""").collect().map(_.mkString("|"))
      val fwdKey = SparkEntry.queries("join_asof_forward")(spark, d)
        .collect().map(_.mkString("|"))
      assert(fwd.toSeq === fwdKey.toSeq, s"bound '$bound' diverged")
    }
  }

  test("asof clause composes with WHERE and GROUP BY tails") {
    events()
    val agg = spark.sql("""
      SELECT p.user_id, count(*) AS n
      FROM (SELECT * FROM events_m WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events_m WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      WHERE s.ts < p.ts
      GROUP BY p.user_id
      ORDER BY p.user_id""")
    // Oracle-free sanity: the same thing built on the DataFrame API.
    val api = SparkEntry.queries("join_asof_native")(spark, d)
      .filter(col("signup_ts") < col("ts"))
      .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")
    assert(agg.collect().map(_.mkString("|")).toSeq ===
      api.collect().map(_.mkString("|")).toSeq)
  }

  test("bare table names and multi-key ON work") {
    import spark.implicits._
    Seq((1L, "a", 10L, 1.0), (1L, "a", 20L, 2.0), (2L, "b", 10L, 3.0))
      .toDF("k1", "k2", "t", "v").createOrReplaceTempView("asof_l")
    Seq((1L, "a", 15L, "m1"), (1L, "a", 5L, "m0"), (2L, "z", 10L, "nomatch"))
      .toDF("r1", "r2", "rt", "tag").createOrReplaceTempView("asof_r")
    val out = spark.sql("""
      SELECT l.k1, l.t, r.tag
      FROM asof_l l ASOF JOIN asof_r r
        ON l.k1 = r.r1 AND l.k2 = r.r2 AND l.t >= r.rt
      ORDER BY l.k1, l.t""").collect().map(_.mkString("|"))
    // (1,a,10) → m0; (1,a,20) → m1; (2,b,10) has no (2,b) right key.
    assert(out.toSeq === Seq("1|10|m0", "1|20|m1"))
  }

  test("CTE side-relations resolve; ASOF inside a CTE body still rejected") {
    // VERDICT r8 #8: a statement-leading WITH clause is carried into each
    // side's re-entrant analysis, so sides may name the statement's own
    // CTEs — the result must equal the same query written with inline
    // subqueries (the hash-gated backward shape).
    events()
    val viaCte = spark.sql("""
      WITH p AS (SELECT * FROM events_m WHERE event_type = 'purchase'),
           s AS (SELECT * FROM events_m WHERE event_type = 'signup')
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM p ASOF JOIN s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""").collect().map(_.mkString("|"))
    val inline = spark.sql(backwardSql).collect().map(_.mkString("|"))
    assert(viaCte.nonEmpty && viaCte.toSeq === inline.toSeq,
      "CTE-sided ASOF JOIN diverged from the inline-subquery form")
    // one CTE side + one inline side also composes
    val mixed = spark.sql("""
      WITH p AS (SELECT * FROM events_m WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM p ASOF JOIN (SELECT * FROM events_m WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""").collect().map(_.mkString("|"))
    assert(mixed.toSeq === inline.toSeq)
    // an ASOF JOIN *inside* a CTE body stays out of grammar — loud reject
    val e = intercept[IllegalArgumentException] {
      spark.sql("""
        WITH j AS (
          SELECT p.event_id FROM events_m p
          ASOF JOIN events_m s ON p.user_id = s.user_id AND p.ts >= s.ts)
        SELECT * FROM j""")
    }
    assert(e.getMessage.contains("subquery or CTE body"),
      s"want the CTE-body rejection named: ${e.getMessage}")
  }

  test("malformed asof clauses fail loudly") {
    events()
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"wrong error for:\n$sql\ngot: ${e.getMessage}")
    }
    val lhs = "(SELECT * FROM events_m WHERE event_type = 'purchase') p"
    val rhs = "(SELECT * FROM events_m WHERE event_type = 'signup') s"
    // strict bound rejected (engine is inclusive-only, unlike DuckDB's >)
    bad(s"SELECT * FROM $lhs ASOF JOIN $rhs ON p.user_id = s.user_id AND p.ts > s.ts",
      "inclusive")
    // no ts bound at all
    bad(s"SELECT * FROM $lhs ASOF JOIN $rhs ON p.user_id = s.user_id",
      "ts inequality")
    // no by-key equality
    bad(s"SELECT * FROM $lhs ASOF JOIN $rhs ON p.ts >= s.ts",
      "by-key equality")
    // two ts bounds
    bad(s"SELECT * FROM $lhs ASOF JOIN $rhs ON p.user_id = s.user_id AND p.ts >= s.ts AND p.ts <= s.ts",
      "exactly one ts inequality")
    // mixed with a plain top-level join
    bad(s"SELECT * FROM events_m e JOIN events_m f ON e.event_id = f.event_id ASOF JOIN $rhs ON e.user_id = s.user_id AND e.ts >= s.ts",
      "mixed")
    // nested asof (inside a subquery) is out of grammar, not silently wrong
    bad(s"SELECT * FROM (SELECT p.event_id FROM $lhs ASOF JOIN $rhs ON p.user_id = s.user_id AND p.ts >= s.ts) q",
      "subquery")
  }

  test("non-asof SQL delegates untouched through the injected parser") {
    events()
    // ASOF JOIN inside a string literal must not trigger the rewrite…
    val r = spark.sql("SELECT count(*) AS n FROM events_m WHERE event_type <> 'ASOF JOIN x'")
      .collect()(0).getLong(0)
    assert(r > 0)
    // …and neither must a column alias merely NAMED asof.
    val a = spark.sql("SELECT 1 AS asof").collect()(0).getInt(0)
    assert(a === 1)
  }
}
