package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join (graft.plans.AsOfJoin → AsOfJoinExec): semantics
  * pins for the whole-operator extension tier. The DuckDB ASOF JOIN oracle
  * hash-gates the contract key at sf0.01; these tests pin what the oracle
  * can't see — identity with the composed window formulation, the edge
  * cases (unmatched rows, empty build side, inclusive ties), and that the
  * operator survives arbitrary input partitioning (EnsureRequirements
  * aligns both sides). */
class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native as-of equals the composed union+window key bit-for-bit (2 SFs)") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val native = SparkEntry.queries("join_asof_native")(spark, d)
        .collect().map(_.mkString("|"))
      val composed = SparkEntry.queries("join_asof")(spark, d)
        .collect().map(_.mkString("|"))
      assert(native.nonEmpty, s"as-of join returned no rows at $d")
      assert(native.toSeq === composed.toSeq,
        s"native as-of diverged from the composed formulation at $d")
    }
  }

  test("time-sliced skew as-of equals the unsliced keys bit-for-bit (2 SFs)") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val sliced = SparkEntry.queries("join_asof_skew")(spark, d)
        .collect().map(_.mkString("|"))
      val composed = SparkEntry.queries("join_asof")(spark, d)
        .collect().map(_.mkString("|"))
      assert(sliced.nonEmpty, s"sliced as-of returned no rows at $d")
      assert(sliced.toSeq === composed.toSeq,
        s"time-sliced as-of diverged from the composed formulation at $d")
    }
  }

  test("time-sliced as-of: planted hot key still exact, carries cross slices") {
    // ALL purchases on one user — the distribution that piles the whole
    // corpus into a single partition for every per-user formulation. The
    // signup the early-day purchases must see lives days earlier (carry
    // path), and day-boundary purchases must prefer an in-slice signup
    // over the carry. Baseline = the defining join+max formulation.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Long) = new java.sql.Timestamp(ts0.getTime + h * 3600 * 1000)
    val hot = 7L
    val purch = (0 until 200).map(i => (1000L + i, hot, at(i)))
      .toDF("event_id", "user_id", "ts")
    val sign = Seq((hot, at(2)), (hot, at(49)), (hot, at(50)), (99L, at(0)))
      .toDF("user_id", "s_ts")
    val events = purch.select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), lit(0.0).as("value"),
        lit("").as("props"))
      .unionByName(sign.select(monotonically_increasing_id().as("event_id"),
        col("s_ts").as("ts"), col("user_id"),
        lit("signup").as("event_type"), lit(0.0).as("value"),
        lit("").as("props")))
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_hot_").toString
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("join_asof_skew")(spark, dir)
      .collect().map(_.mkString("|"))
    val base = purch
      .join(sign, Seq("user_id"))
      .filter(col("s_ts") <= col("ts"))
      .groupBy("event_id", "user_id", "ts")
      .agg(max("s_ts").as("signup_ts"))
      .orderBy("event_id")
      .select("event_id", "user_id", "ts", "signup_ts")
      .collect().map(_.mkString("|"))
    assert(out.nonEmpty && out.toSeq === base.toSeq,
      "time-sliced as-of diverged on the planted hot key")
  }

  test("backward inclusive semantics: latest <= match, unmatched rows drop") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 5L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 8L, "early"), (10L, 100L, "attime"), (30L, 1L, "otherkey"))
      .toDF("rk", "rt", "tag")
    val out = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "rt", "tag").orderBy("id").collect()
    // id=1: rt=100 matches inclusively (t >= rt picks the LATEST at-or-
    // before, so the boundary row wins over rt=8); id=2 precedes every
    // right row; id=3's key has no right rows at all.
    assert(out.toSeq === Seq(Row(1L, 100L, "attime")))
  }

  test("empty right side yields an empty (not failing) inner result") {
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 8L, "x")).toDF("rk", "rt", "tag").filter(lit(false))
    assert(graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .count() === 0L)
  }

  test("self-as-of on one frame is exprId-safe and matches each row to itself") {
    // Both sides are the SAME analyzed frame — without the builder's
    // fresh-alias Project the by-key attributes would collide and either
    // mis-bind or fail analysis. Every purchase's latest same-user
    // purchase at-or-before itself is itself (ts values are unique per
    // user in the fixture corpus), so signup side ts == left ts.
    val e = Tables.events(spark, TestSpark.sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val out = graft.api.Graft.asofJoin(
        e, e.select(col("event_id").as("rid"), col("user_id").as("ru"),
                    col("ts").as("rts")),
        Seq("user_id"), Seq("ru"), "ts", "rts")
      .select(col("event_id"), col("ts"), col("rts"))
    assert(out.count() === e.count(), "self-as-of must match every row")
    assert(out.filter(col("ts") =!= col("rts")).count() === 0L,
      "self-as-of must pick the row itself at the inclusive boundary")
  }

  test("mismatched pre-partitioning is realigned, result unchanged") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 50L), (4L, 30L, 9L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 60L, "a"), (10L, 40L, "b"), (20L, 50L, "c"), (30L, 10L, "d"))
      .toDF("rk", "rt", "tag")
    val base = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "tag").orderBy("id").collect().toSeq
    assert(base === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    val skewed = graft.api.Graft.asofJoin(
        l.repartition(3, col("k")), r.repartition(5, col("rk")),
        Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "tag").orderBy("id").collect().toSeq
    assert(skewed === base,
      "EnsureRequirements must co-align differently-partitioned children")
  }

  test("null by-keys group together (sort-order equality, as documented)") {
    val l = Seq((1L, Option(10L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("id", "k", "t")
    val r = Seq((Option(10L), 50L, "real"), (Option.empty[Long], 60L, "nullkey"))
      .toDF("rk", "rt", "tag")
    val out = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "tag").orderBy("id").collect().toSeq
    assert(out === Seq(Row(1L, "real"), Row(2L, "nullkey")))
  }

  test("outer keeps every left row; matched subset equals the inner result") {
    // The outer variant must be the inner result plus null-filled rows
    // for every unmatched purchase — nothing reordered, nothing dropped.
    val d = "/root/testdata/sf0.01"
    val outer = SparkEntry.queries("join_asof_outer")(spark, d).collect()
    val inner = SparkEntry.queries("join_asof_native")(spark, d).collect()
    val purchases = Tables.events(spark, d)
      .filter(col("event_type") === "purchase").count()
    assert(outer.length.toLong === purchases, "outer must keep every purchase")
    assert(outer.length > inner.length,
      "fixture must contain purchases before any signup (else outer ≡ inner)")
    val matched = outer.filter(!_.isNullAt(3)).map(_.mkString("|")).toSeq
    assert(matched === inner.map(_.mkString("|")).toSeq,
      "outer's matched subset must equal the inner result")
    outer.filter(_.isNullAt(3)).foreach(r =>
      assert(!r.isNullAt(0) && !r.isNullAt(2), s"left columns must survive: $r"))
  }

  test("outer null-fill on tiny frames: unmatched key and too-early ts") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 5L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 8L, "early"), (10L, 100L, "attime"))
      .toDF("rk", "rt", "tag")
    val out = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        outer = true)
      .select("id", "tag", "rt").orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "attime"), (2L, null), (3L, null)))
    // rt is a NON-nullable long on the right child: the null-fill must
    // surface as NULL, not a silently materialized 0 (the projection has
    // to bind the nullability-ADJUSTED output schema for this).
    assert(!out(0).isNullAt(2) && out(0).getLong(2) === 100L)
    assert(out(1).isNullAt(2) && out(2).isNullAt(2),
      s"unmatched rows must carry NULL rt, got ${out.toSeq}")
  }

  test("forward direction: first at-or-after match; negated-ts duality with backward") {
    val l = Seq((1L, 10L, 50L), (2L, 10L, 101L), (3L, 20L, 5L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 50L, "attime"), (10L, 100L, "later"), (20L, 1L, "early"))
      .toDF("rk", "rt", "tag")
    // id=1 matches rt=50 inclusively (not 100); id=2 is past every right
    // row; id=3's only same-key row is in the past.
    val fwd = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        forward = true)
      .select("id", "tag").orderBy("id").collect().toSeq
    assert(fwd === Seq(Row(1L, "attime")))
    // forward + outer: both unmatched shapes (past every right row /
    // same-key rows only in the past) must survive with nulls, and the
    // non-nullable right long must read as NULL through the null-fill.
    val fwdOuter = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
        outer = true, forward = true)
      .select("id", "tag", "rt").orderBy("id").collect()
    assert(fwdOuter.map(x => (x.getLong(0), x.getString(1))).toSeq
      === Seq((1L, "attime"), (2L, null), (3L, null)))
    assert(fwdOuter(1).isNullAt(2) && fwdOuter(2).isNullAt(2))
    // Duality: forward on ts ≡ backward on negated ts — pinned on the
    // corpus so the two merge paths cannot drift semantically.
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val sign = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("ru"), unix_micros(col("ts")).as("rt"))
    val viaFwd = graft.api.Graft.asofJoin(purch, sign,
        Seq("user_id"), Seq("ru"), "t", "rt", forward = true)
      .select(col("event_id"), col("rt")).orderBy("event_id")
      .collect().map(_.mkString("|")).toSeq
    val viaNegBwd = graft.api.Graft.asofJoin(
        purch.withColumn("t", -col("t")),
        sign.withColumn("rt", -col("rt")),
        Seq("user_id"), Seq("ru"), "t", "rt")
      .select(col("event_id"), (-col("rt")).as("rt")).orderBy("event_id")
      .collect().map(_.mkString("|")).toSeq
    assert(viaFwd === viaNegBwd, "forward must equal backward on negated ts")
    assert(viaFwd.nonEmpty)
  }

  test("null timestamps follow SQL semantics: never candidates, never matched") {
    // Right ts NULL must not become a candidate even though nulls sort
    // first (<= everything) in the merge's natural ordering; left ts NULL
    // must match nothing. Both mirror the composed twin's isNotNull
    // filter and the DuckDB ASOF JOIN predicate.
    val l = Seq((1L, Option(10L), Option(100L)), (2L, Option(10L), Option.empty[Long]))
      .toDF("id", "k", "t")
    val r = Seq((Option(10L), Option.empty[Long], "nullts"), (Option(10L), Option(40L), "real"))
      .toDF("rk", "rt", "tag")
    val out = graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "tag").orderBy("id").collect().toSeq
    assert(out === Seq(Row(1L, "real")),
      "null-ts rows must be invisible to the as-of match")
  }

  test("mismatched key/ts types are refused, not silently miscompared") {
    // The physical comparators are built from the LEFT types and applied
    // to RIGHT rows — an int read as a long would compare -1 as 2^32-1.
    // The logical node must refuse instead of corrupting.
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val r = Seq((10, 8L, "x")).toDF("rk", "rt", "tag") // rk is INT
    val e = intercept[IllegalArgumentException] {
      graft.api.Graft.asofJoin(l, r, Seq("k"), Seq("rk"), "t", "rt").collect()
    }
    assert(e.getMessage.contains("type mismatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.api.Graft.asofJoin(l, r.select(col("rk").cast("long").as("rk"),
          col("rt").cast("int").as("rt"), col("tag")),
        Seq("k"), Seq("rk"), "t", "rt").collect()
    }
    assert(e2.getMessage.contains("ts type mismatch"), e2.getMessage)
  }

  test("result is AQE-invariant (coalesced shuffle reads stay co-partitioned)") {
    // AQE coalesces the two key exchanges feeding AsOfJoinExec; the
    // ClusteredDistribution declaration obliges it to coalesce them
    // IDENTICALLY (the sort-merge-join contract). A divergence would
    // surface as a zipPartitions arity error or wrong matches — pin the
    // collected result against the AQE-off plan.
    val d = TestSpark.sfDir
    val withAqe = SparkEntry.queries("join_asof_native")(spark, d)
      .collect().map(_.mkString("|")).toSeq
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val noAqe = SparkEntry.queries("join_asof_native")(spark, d)
        .collect().map(_.mkString("|")).toSeq
      assert(withAqe === noAqe, "as-of result changed under AQE re-planning")
      assert(withAqe.nonEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("unknown / ambiguous column names fail fast with a named error") {
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 8L)).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      graft.api.Graft.asofJoin(l, r, Seq("nope"), Seq("rk"), "t", "rt")
    }
    assert(e.getMessage.contains("no column 'nope'"))
    val amb = intercept[IllegalArgumentException] {
      // select (not withColumn, which REPLACES case-insensitive matches)
      // so both "rt" and "RT" exist and the default resolver sees two.
      graft.api.Graft.asofJoin(l, r.select(col("*"), lit(1L).as("RT")),
        Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(amb.getMessage.contains("ambiguous"))
  }
}
