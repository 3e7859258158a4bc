package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2-C joins.
  *
  * Scale notes (100 TB):
  *  - dims (region/nation/customer-at-small-sf) are broadcast explicitly —
  *    no shuffle of the fact side;
  *  - big-big joins (lineitem⋈orders) get SHUFFLE_MERGE: both sides hash-
  *    partition on the key once, and AQE can demote/skew-split at runtime;
  *  - the theta/range join explodes one side onto the ≤2 width-1 buckets its
  *    band can touch and equi-joins on the bucket, so it compiles to a hash
  *    join instead of a nested-loop cross product — THE pattern that keeps
  *    inequality joins alive at scale;
  *  - the as-of join is the union+window formulation: one shuffle on
  *    user_id, a single ordered pass, no point-lookup loop.
  */
object JoinOps {
  type Q = (SparkSession, String) => DataFrame

  /** Bucketed tables are built ONCE per (JVM, sfDir) under a computeIfAbsent
    * lock and then only read. This closes the r4-flagged race: the previous
    * overwrite-per-invocation design let two overlapping join_bucketed calls
    * (or a caller holding the lazy returned DataFrame across a later call)
    * read clobbered table files. It also makes repeat invocations (Bench ×3,
    * Verify, PlanSpec) measure what the key claims — the write-time shuffle
    * is paid once and AMORTIZED over every later co-located join. Disk use
    * is bounded at one table copy per sfDir per JVM launch; the dirs live
    * in OS tmp and are left to the platform's tmp reaper. Returns the
    * (orders, customer) catalog table names for the sfDir. */
  private lazy val bucketBase: String =
    java.nio.file.Files.createTempDirectory("graft_bucket_").toString
  private val bucketedFor =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private[graft] def bucketedTables(s: SparkSession, d: String): (String, String) =
    bucketedFor.computeIfAbsent(d, _ => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      // repartition on the bucket key first ⇒ exactly ONE file per bucket.
      // Spark only trusts the write-time sortBy order (and skips the
      // per-query Sort under SortMergeJoin) when each bucket is a single
      // file; multiple writer tasks would each emit a file per bucket and
      // force a re-sort at read (measured in PlanSpec).
      Tables.orders(s, d)
        // bucketed-store ingest guard (r19 fuzz) — oracle restates it
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .repartition(8, col("o_custkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$bucketBase/$tag/orders_b")
        .saveAsTable(s"graft_orders_b_$tag")
      Tables.customer(s, d)
        .repartition(8, col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$bucketBase/$tag/customer_b")
        .saveAsTable(s"graft_customer_b_$tag")
      (s"graft_orders_b_$tag", s"graft_customer_b_$tag")
    })

  /** Shared body of the three native as-of contract keys: purchases
    * as-of-joined to signups on user_id, differing only in direction /
    * outer-ness and the output alias. Calls the plans-layer builder
    * directly (the facade Graft.asofJoin is a one-line delegate to the
    * same frame(); going through it here would put a graft.ops ->
    * graft.api -> graft.ops import cycle into the build). */
  private def asofEventsKey(s: SparkSession, d: String, outAlias: String,
                            outer: Boolean = false,
                            forward: Boolean = false): DataFrame = {
    val e = Tables.events(s, d)
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // NULL-key signups filtered per AsOfJoin's documented contract (the
    // merge groups NULL keys like groupBy; SQL equality — and the DuckDB
    // oracle — never matches them). Left NULL-key purchases then match
    // nothing: dropped when inner, null-filled when outer — SQL
    // semantics. No-op on clean data (r21 fuzz: NULL user_id rows).
    val sign = e.filter(col("event_type") === "signup" &&
                        col("user_id").isNotNull)
      .select(col("user_id").as("s_user_id"), col("ts").as("s_ts"))
    graft.plans.AsOfJoin.frame(purch, sign,
        Seq("user_id"), Seq("s_user_id"), "ts", "s_ts", outer, forward)
      .select(col("event_id"), col("user_id"), col("ts"),
              col("s_ts").as(outAlias))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = graft.Contract.uniqueMap("JoinOps.queries", Seq(
    "join_broadcast" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    }),

    "join_shuffle_hash" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz
      val c = Tables.customer(s, d)
      o.hint("shuffle_hash").join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    "join_sortmerge" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(graft.Contract.finiteOrNull(col("l_discount"))) // r19 fuzz: REAL-measure revenue
      val o = Tables.orders(s, d)
      l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_custs_no_orders"))
        .orderBy("c_mktsegment")
    }),

    "join_right" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      // right outer: every customer survives even without orders
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_orders"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_custs_no_orders"))
        .orderBy("c_mktsegment")
    }),

    "join_full" -> ((s, d) => {
      // full outer over two order-month slices keyed by custkey aggregates:
      // customers active in jan-only, feb-only, and both.
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1)
        .groupBy(col("o_custkey").as("jk")).agg(count(lit(1)).as("jan_n"))
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2)
        .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("feb_n"))
      jan.join(feb, col("jk") === col("fk"), "full_outer")
        .select(
          coalesce(col("jk"), col("fk")).as("custkey"),
          coalesce(col("jan_n"), lit(0L)).as("jan_n"),
          coalesce(col("feb_n"), lit(0L)).as("feb_n"))
        .orderBy("custkey")
    }),

    "join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Anti set restricted to 1998 orders so it is NON-empty at every SF
    // (354 rows at sf0.01) — an all-orders anti set is empty in this data
    // and would make the oracle pass vacuously.
    "join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1998)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // NULL-safe equality join (<=>): NULL keys MATCH each other instead of
    // silently dropping — the semantics dirty-key rollups need ("group the
    // unknowns together, don't lose them"). The nullable key is derived
    // (priority '4-NOT SPECIFIED' → NULL); the fact side joins a per-key
    // aggregate back with <=>, so the NULL bucket carries its count like
    // any other key. Plan note: Spark hash-partitions NULL like any value
    // under EqualNullSafe (it compiles to a coalesce-keyed equi-join, not
    // a cartesian residual), so this stays a normal one-shuffle hash join
    // — but ALL null keys land in one partition; a mostly-null key column
    // at 100 TB needs the join_skew_salted treatment.
    "join_null_safe" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz
        .withColumn("np", nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")))
        .as("f")
      val dim = o.groupBy("np").agg(count(lit(1)).as("n_dim")).as("dim")
      o.join(dim, col("f.np") <=> col("dim.np"))
        .groupBy(col("f.np").as("np"), col("n_dim"))
        .agg(count(lit(1)).as("n_rows"),
             round(sum("o_totalprice"), 2).as("rev"))
        .orderBy(col("np").asc_nulls_first)
    }),

    "join_cross_topk" -> ((s, d) => {
      val r = Tables.region(s, d).select(col("r_name"))
      val n = Tables.nation(s, d).select(col("n_name"))
      r.crossJoin(n)
        .orderBy("r_name", "n_name")
        .limit(50)
    }),

    // Banded theta join: equi on a width-1 bucket + exact band predicate.
    // The band half-width (0.25) is < bucket width, so any qualifying b lies
    // in [a-0.25, a+0.25] — an interval of length 0.5 that spans AT MOST two
    // integer buckets: floor(a-0.25) and floor(a+0.25). Explode the a-side
    // into those (distinct) buckets, equi-join on floor(b), then apply the
    // exact predicate. ≤2× expansion of one side, still a hash join — no
    // nested-loop cross product, and (unlike bucketing both sides on
    // floor(v)) no pairs straddling a bucket boundary are lost.
    "join_theta_range" -> ((s, d) => {
      val e = Tables.events(s, d)
      val a = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("a_id"), col("value").as("a_value"))
        .withColumn("bucket", explode(array_distinct(array(
          floor(col("a_value") - 0.25), floor(col("a_value") + 0.25)))))
      val b = e.filter(col("event_type") === "error")
        .select(col("event_id").as("b_id"), col("value").as("b_value"))
        .withColumn("bucket", floor(col("b_value")))
      a.join(b, Seq("bucket"))
        .filter(abs(col("a_value") - col("b_value")) <= 0.25)
        .select(col("a_id"), col("b_id"),
                round(abs(col("a_value") - col("b_value")), 4).as("diff"))
        .orderBy("a_id", "b_id")
    }),

    // Interval containment join: equi key + range predicate (SMJ + filter).
    "join_interval" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
                l("l_shipdate") >= o("o_orderdate") &&
                l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_year")
    }),

    // As-of join (no Spark primitive): union-tag + last(ignoreNulls) window.
    // Each purchase gets the user's most recent signup at-or-before it.
    // One shuffle on user_id, one ordered pass — scales linearly.
    "join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
      // NULL-user signups provide no carry (SQL equality semantics, see
      // asofEventsKey's note); NULL-user purchases then carry NULL.
      val sign = e.filter(col("event_type") === "signup" &&
                          col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), lit(0).as("side"), lit(null).cast("long").as("p_id"))
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id").as("p_id"))
      // order by (ts, side): at equal ts the signup sorts first, giving the
      // inclusive p.ts >= s.ts semantics of DuckDB ASOF JOIN.
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sign.unionByName(purch)
        .withColumn("signup_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("signup_ts").isNotNull)
        .select(col("p_id").as("event_id"), col("user_id"), col("ts"), col("signup_ts"))
        .orderBy("event_id")
    }),

    // As-of join with a STALENESS TOLERANCE (pandas merge_asof's
    // `tolerance`): the latest prior signup counts only if it is within
    // 3 days of the purchase — older matches surface as NULL, and
    // match-less purchases are KEPT (left-outer). The feature-freshness
    // rule every training pipeline needs ("use the feature value as-of
    // the event, unless it's too stale to trust"). Same one-shuffle
    // union+window plan as join_asof; the tolerance is a row-local CASE
    // after the carry — never a second join.
    "join_asof_tolerance" -> ((s, d) => {
      val e = Tables.events(s, d)
      // NULL-user signups provide no carry (SQL equality semantics, see
      // asofEventsKey's note); NULL-user purchases then carry NULL.
      val sign = e.filter(col("event_type") === "signup" &&
                          col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), lit(0).as("side"), lit(null).cast("long").as("p_id"))
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id").as("p_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sign.unionByName(purch)
        .withColumn("sts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("p_id").as("event_id"), col("user_id"), col("ts"),
                when(col("sts") >= col("ts") - expr("INTERVAL 3 DAYS"), col("sts"))
                  .as("signup_ts"))
        .orderBy("event_id")
    }),

    // Native as-of join — the same query as `join_asof`, planned through
    // the engine's whole-operator extension tier (graft.plans.AsOfJoin →
    // AsOfJoinStrategy → AsOfJoinExec): one hash shuffle per side on
    // user_id, then a streaming two-pointer merge holding ONE candidate
    // row — vs the composed key's union + window pass that buffers each
    // user's frame. AsOfJoinSpec pins native ≡ composed bit-for-bit;
    // PlanSpec pins the AsOfJoinExec node and its two-exchange shape.
    "join_asof_native" -> ((s, d) =>
      asofEventsKey(s, d, "signup_ts")),

    // FORWARD variant of the native as-of operator: each purchase joined
    // to the user's NEXT signup at-or-after it — the event-to-next-
    // outcome join training-data pipelines build labels with. The forward
    // merge matches the un-consumed right head (no candidate buffer, no
    // copies); DuckDB expresses it as ASOF ... ON p.ts <= s.ts.
    "join_asof_forward" -> ((s, d) =>
      asofEventsKey(s, d, "next_signup_ts", forward = true)),

    // LEFT-OUTER variant of the native as-of operator: purchases with no
    // prior signup survive with a null signup_ts — the feature-store
    // enrichment shape (enrich every event, never silently drop). Same
    // exec, null-fill emit under outer; DuckDB ASOF LEFT JOIN oracle.
    "join_asof_outer" -> ((s, d) =>
      asofEventsKey(s, d, "signup_ts", outer = true)),

    // NEAREST variant: each purchase joined to the signup CLOSEST in time
    // in EITHER direction (ties → the earlier/backward one) — the sensor-
    // alignment shape (match each reading to the nearest reference
    // sample, before or after). Composed from TWO native as-of passes
    // (backward + forward, both outer) joined on the unique left key —
    // each pass is the O(1)-state streaming merge, and the recombination
    // is a co-keyed join of two left-sized frames. DuckDB has no NEAREST
    // asof, so the oracle ranks the full per-user candidate set by
    // absolute distance with the same backward tie-break.
    "join_asof_nearest" -> ((s, d) => {
      val back = asofEventsKey(s, d, "bts", outer = true)
      val fwd = asofEventsKey(s, d, "fts", outer = true, forward = true)
        .select("event_id", "fts")
      val db = unix_micros(col("ts")) - unix_micros(col("bts"))
      val df_ = unix_micros(col("fts")) - unix_micros(col("ts"))
      back.join(fwd, "event_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("bts").isNull, col("fts"))
            .when(col("fts").isNull, col("bts"))
            .when(db <= df_, col("bts"))
            .otherwise(col("fts")).as("nearest_ts"))
        .orderBy("event_id")
    }),

    // Skew-mitigated join via key salting — the manual 100 TB pattern for
    // when AQE's skew split can't help (e.g. the skewed side feeds a
    // downstream agg on the same key). A deliberately skewed key
    // (user_id div 50 → 3 hot values over 10k+ events) would pile each hot
    // key into one shuffle partition; instead the fact side salts with
    // pmod(event_id, 8) and the dim side explodes ×8, so the shuffle join
    // spreads every hot key over 8 partitions. shuffle_hash hint keeps
    // Spark from trivially broadcasting the toy dim — at real scale the
    // dim side is the one you cannot broadcast.
    "join_skew_salted" -> ((s, d) => {
      val nSalt = 8
      val fact = Tables.events(s, d)
        // measure-ingest guard (r19 fuzz): the grouped sum must not carry
        // NaN/Inf (engines emit different NaN bit patterns); NULLs keep
        // their r18 convention (oracle restates the predicate)
        .filter(graft.Contract.finiteOrNull(col("value")))
        .select(col("event_id"), col("value"),
                (col("user_id") / 50).cast("long").as("k"))
        .withColumn("salt", pmod(col("event_id"), lit(nSalt)))
      val dim = Tables.events(s, d)
        .select((col("user_id") / 50).cast("long").as("k")).distinct()
        .withColumn("grp", concat(lit("grp_"), col("k")))
        .withColumn("salt", explode(sequence(lit(0), lit(nSalt - 1))))
      fact.hint("shuffle_hash")
        .join(dim, Seq("k", "salt"))
        .groupBy("k", "grp")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k")
    }),

    // Skew-mitigated AS-OF join — time-slice splitting for the hot-by-key
    // tail that neither AQE nor salting can touch (AqeInterplaySpec pins
    // that AsOfJoinExec's exchanges are never skew-split, and plain salting
    // breaks an ordered merge: the match may carry ANY salt). Both sides
    // slice on date_trunc(day, ts), so one hot user_id spreads over
    // #distinct-day partitions instead of piling into one. Right rows from
    // earlier slices are represented by one CARRY row per (user, slice) —
    // the latest signup strictly before the slice start — computed from
    // per-(user, slice) maxima: the only per-user window runs over
    // users × slices rows (bounded by the calendar, never by event count).
    // Exact by slice disjointness: a purchase's backward match is either
    // in its own slice or is precisely the carry row; AsOfJoinSpec pins
    // bit-for-bit equality with the unsliced keys under a planted hot key.
    "join_asof_skew" -> ((s, d) => {
      val e = Tables.events(s, d)
      val slice = date_trunc("day", col("ts"))
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
                col("event_id").as("p_id"), slice.as("slice"))
      val sign = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
                lit(null).cast("long").as("p_id"), slice.as("slice"))
      // latest signup per (user, slice): ONE map-side-combinable agg
      val perSlice = sign.groupBy("user_id", "slice").agg(max("ts").as("sig_ts"))
      // every (user, slice) a purchase or signup touches needs a carry
      val wCarry = Window.partitionBy("user_id").orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = purch.select("user_id", "slice").distinct()
        .unionByName(perSlice.select("user_id", "slice")).distinct()
        .join(perSlice, Seq("user_id", "slice"), "left")
        .withColumn("carry_ts", max("sig_ts").over(wCarry))
        .filter(col("carry_ts").isNotNull)
        .select(col("user_id"), col("carry_ts").as("ts"), lit(0).as("side"),
                lit(null).cast("long").as("p_id"), col("slice"))
      // same union-tag window as join_asof, but partitioned by (user, slice)
      val w = Window.partitionBy("user_id", "slice")
        .orderBy(col("ts").asc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sign.unionByName(carry).unionByName(purch)
        .withColumn("signup_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("signup_ts").isNotNull)
        .select(col("p_id").as("event_id"), col("user_id"), col("ts"),
                col("signup_ts"))
        .orderBy("event_id")
    }),

    // Bucketed co-located join — THE canonical 100 TB shuffle eliminator:
    // both tables are written bucketed+sorted on the join key (8 buckets),
    // so the SortMergeJoin reads each bucket pair directly with NO Exchange
    // and NO per-query Sort on either side (PlanSpec pins exactly that).
    // At scale this is the difference between re-shuffling 100 TB per join
    // and shuffling once at write time, amortized over every later join.
    // Tables are external (data in a temp dir, metadata in the session's
    // in-memory catalog) — no Hive metastore needed.
    "join_bucketed" -> ((s, d) => {
      val (ordersTbl, custTbl) = bucketedTables(s, d)
      val o = s.table(ordersTbl)
      val c = s.table(custTbl)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    })
  ))

  val oracle: Map[String, String] = graft.Contract.uniqueMap("JoinOps.oracle", Seq(
    // same shape as join_shuffle_hash — bucketing is plumbing, not semantics
    "join_bucketed" -> """
      SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment NULLS FIRST""",

    "join_broadcast" -> """
      SELECT n_nationkey, n_name, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey""",

    "join_shuffle_hash" -> """
      SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment NULLS FIRST""",

    "join_sortmerge" -> """
      SELECT o_orderpriority, count(*) AS n_items,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE (l_discount IS NULL OR isfinite(l_discount))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    "join_left" -> """
      SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custs_no_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment NULLS FIRST""",

    "join_right" -> """
      SELECT c_mktsegment, count(*) AS n_rows, count(o_orderkey) AS n_orders,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custs_no_orders
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment NULLS FIRST""",

    "join_full" -> """
      SELECT coalesce(jk, fk) AS custkey,
             coalesce(jan_n, 0) AS jan_n, coalesce(feb_n, 0) AS feb_n
      FROM (SELECT o_custkey AS jk, count(*) AS jan_n FROM orders
            WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1 GROUP BY 1) j
      FULL OUTER JOIN
           (SELECT o_custkey AS fk, count(*) AS feb_n FROM orders
            WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2 GROUP BY 1) f
      ON jk = fk
      ORDER BY custkey""",

    "join_semi" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    // IS NOT DISTINCT FROM is SQL's spelling of <=>; NULLS FIRST matches
    // Spark's asc default (DuckDB defaults NULLS LAST).
    "join_null_safe" -> """
      WITH o AS (
        SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS np, o_totalprice
        FROM orders
        WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))),
      dim AS (SELECT np, count(*) AS n_dim FROM o GROUP BY np)
      SELECT o.np, CAST(dim.n_dim AS BIGINT) AS n_dim,
             count(*) AS n_rows, round(sum(o.o_totalprice), 2) AS rev
      FROM o JOIN dim ON o.np IS NOT DISTINCT FROM dim.np
      GROUP BY o.np, dim.n_dim
      ORDER BY o.np NULLS FIRST""",

    "join_anti" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998)
      ORDER BY c_custkey""",

    "join_cross_topk" -> """
      SELECT r_name, n_name
      FROM region CROSS JOIN nation
      ORDER BY r_name, n_name
      LIMIT 50""",

    "join_theta_range" -> """
      SELECT a.event_id AS a_id, b.event_id AS b_id,
             round(abs(a.value - b.value), 4) AS diff
      FROM events a JOIN events b
        ON abs(a.value - b.value) <= 0.25
      WHERE a.event_type = 'signup' AND b.event_type = 'error'
      ORDER BY a_id, b_id""",

    "join_interval" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      GROUP BY 1
      ORDER BY o_year""",

    "join_asof" -> """
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // ASOF LEFT JOIN + a staleness CASE is exactly the tolerance
    // semantics (match kept only when within the window, row kept always).
    "join_asof_tolerance" -> """
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN s.ts >= p.ts - INTERVAL 3 DAY THEN s.ts END AS signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // Forward direction: DuckDB infers it from the flipped inequality
    // (smallest s.ts >= p.ts).
    "join_asof_forward" -> """
      SELECT p.event_id, p.user_id, p.ts, s.ts AS next_signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts <= s.ts
      ORDER BY p.event_id""",

    // The outer variant keeps every purchase; DuckDB's ASOF LEFT JOIN is
    // the exact twin.
    "join_asof_outer" -> """
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // DuckDB has no NEAREST asof — rank the full per-user candidate set
    // by absolute time distance with the backward tie-break (≤ sorts
    // first), LEFT-joined so signup-less purchases survive with null.
    "join_asof_nearest" -> """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      sg AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
      cand AS (
        SELECT p.event_id, sg.ts AS sts,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY abs(epoch_us(p.ts) - epoch_us(sg.ts)),
                          CASE WHEN sg.ts <= p.ts THEN 0 ELSE 1 END, sg.ts) AS rk
        FROM p JOIN sg ON p.user_id = sg.user_id)
      SELECT p.event_id, p.user_id, p.ts, c.sts AS nearest_ts
      FROM p LEFT JOIN (SELECT event_id, sts FROM cand WHERE rk = 1) c USING (event_id)
      ORDER BY p.event_id""",

    // Identical semantics to join_asof — the key differs only in HOW the
    // plan is produced (native operator vs composition), so the oracle is
    // the same ASOF JOIN.
    "join_asof_native" -> """
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // The time slicing is plumbing, not semantics: the oracle is the same
    // ASOF JOIN as the unsliced keys.
    "join_asof_skew" -> """
      SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // The salt is plumbing, not semantics: the oracle is the plain join.
    "join_skew_salted" -> """
      WITH f AS (SELECT event_id, value, user_id // 50 AS k FROM events
                 WHERE (value IS NULL OR isfinite(value))),
      dim AS (SELECT DISTINCT user_id // 50 AS k, 'grp_' || (user_id // 50) AS grp
              FROM events)
      SELECT f.k, dim.grp, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM f JOIN dim ON f.k = dim.k
      GROUP BY 1, 2
      ORDER BY f.k"""
  ))
}
