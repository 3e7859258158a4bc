package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2-E window functions.
  *
  * Scale notes (100 TB): each window shuffles once on its partition key and
  * sorts within partitions (WindowExec). Partition keys here (brand,
  * suppkey, user_id, custkey) are high-cardinality enough to spread — with
  * ONE deliberate exception: `win_ntile_percent` needs a TOTAL order
  * (ntile/percent_rank/cume_dist are defined over the whole relation), so it
  * is a global Window.orderBy with no partitionBy and funnels every row
  * through a single task. That is acceptable only for driver-manageable
  * cardinalities (customers, not lineitems). The scale-safe alternative is a
  * two-pass rank: range-partition sort, count rows per partition, broadcast
  * the cumulative offsets, then derive rank/ntile per partition locally —
  * IMPLEMENTED below as `win_ntile_scalable`, which computes the identical
  * result (same oracle) with no global window: the only total-order pass
  * runs over per-bucket COUNTS (thousands of rows at any scale), while the
  * per-row work is a bucket-partitioned window. The single-window form is
  * kept as the declared operator semantics / readability baseline. Every
  * window ORDER BY carries a unique tiebreaker so rank & frame results are
  * deterministic across engines.
  */
object WinOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.Contract.uniqueMap("WinOps.queries", Seq(
    "win_rank_dense_rownum" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables.part(s, d)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .orderBy("p_brand", "rn")
    }),

    "win_ntile_percent" -> ((s, d) => {
      val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select("c_custkey", "c_acctbal")
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .orderBy("c_custkey")
    }),

    // The 100 TB twin of win_ntile_percent: identical output, no global
    // window. Plan: (1) range-bucket the sort key; (2) per-bucket counts —
    // one hash-agg; (3) cumulative offsets + total via a window over the
    // BUCKET STATS (≈20 rows at any scale — this is the only total-order
    // pass); (4) broadcast-join offsets back and rank locally inside each
    // bucket. quartile/pct_rank/cume are then pure arithmetic on the global
    // rank (sort keys are unique ⇒ peers are singletons ⇒ cume = rank/n).
    "win_ntile_scalable" -> ((s, d) => {
      val bucketed = Tables.customer(s, d)
        .select("c_custkey", "c_acctbal")
        .withColumn("bkt", floor(col("c_acctbal") / 500.0))
      val wS = Window.orderBy("bkt")
      val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(
          sum("cnt").over(wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum("cnt").over(
          wS.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("bkt", "off", "n")
      val wL = Window.partitionBy("bkt")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      // null-SAFE bucket join: a NULL balance buckets to the NULL bucket,
      // which the ascending bucket window already ranks FIRST (Spark's
      // nulls-first sort) — a plain equi-join would silently DROP those
      // rows from the ranking
      bucketed.join(broadcast(offs.withColumnRenamed("bkt", "obkt")),
                    col("bkt") <=> col("obkt"))
        .drop("obkt")
        .withColumn("grank", col("off") + row_number().over(wL))
        // SQL-standard ntile: first (n mod k) buckets get ceil(n/k) rows
        // (n >= k always holds here: customers number >= 150).
        .withColumn("quartile", expr(
          """CASE WHEN grank <= (n div 4 + 1) * (n % 4)
             THEN (grank - 1) div (n div 4 + 1) + 1
             ELSE n % 4 + (grank - 1 - (n div 4 + 1) * (n % 4)) div (n div 4) + 1
             END""").cast("int"))
        .withColumn("pct_rank", round((col("grank") - 1) / (col("n") - 1), 6))
        .withColumn("cume", round(col("grank") / col("n"), 6))
        .select("c_custkey", "c_acctbal", "quartile", "pct_rank", "cume")
        .orderBy("c_custkey")
    }),

    // Autocorrelation function (lags 1–3) of the per-type daily series —
    // the seasonality/momentum fingerprint read before picking gap-fill
    // or forecasting strategies (a strong lag-7 ACF = weekly rhythm; near
    // zero = treat days as independent). Pearson r is computed from
    // EXPLICIT sufficient moments (Σx, Σy, Σxy, Σx², Σy²), not the
    // engines' corr() builtins, whose streaming recurrences are not
    // order-stable: the daily totals are 2dp decimals whose pairwise
    // products are exact in double and sum exactly at this magnitude, so
    // the moments are order-independent and r is one literal expression —
    // bit-identical cross-engine. Lag pairs come from one window pass;
    // the stack() unpivot fans 3 lags out of the same shuffle.
    "win_autocorr" -> ((s, d) =>
      autocorrOf(Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
        "event_type", "ts", "value", 3)
        .orderBy("event_type", "lag")),

    // Drawup/CUSUM-style level-shift detector on the per-type daily
    // series: running DECIMAL-exact sum of detrended deviations
    // (x − global type mean), drawup = S_i − min(S_j, j ≤ i) — a rising
    // drawup is accumulating positive drift (Page's CUSUM without the
    // recursive reset, so it stays a PLAIN two-window expression rather
    // than an iterative op). Everything deterministic: daily totals and
    // the running sum accumulate in DECIMAL; the type mean divides the
    // DECIMAL total once in double; both engines evaluate the identical
    // two-window chain over the same total order.
    "win_cusum_drawup" -> ((s, d) =>
      cusumDrawupOf(Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
        "event_type", "ts", "value")
        .orderBy("event_type", "day")),

    // Wald-Wolfowitz runs test per event type over daily up/down moves
    // — does the feed streak (momentum) or oscillate (overcorrection),
    // or is day-over-day movement random? The randomness complement to
    // win_cusum_drawup's drift and agg_mann_kendall's trend: a series
    // can be trend-free yet glaringly non-random. Runs/up/down counts
    // are exact integers on the lag-windowed daily grid; z is a
    // fixed-order double expression from them.
    "win_runs_test" -> ((s, d) =>
      runsTestOf(Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
        "event_type", "ts")
        .orderBy("event_type")),

    // Classical seasonal decomposition (value = trend + seasonal +
    // residual) of the per-type daily series — the before-anomaly-
    // detection step that stops a weekly rhythm from reading as drift:
    // trend = centered 7-day moving average (full windows only),
    // seasonal = each weekday's mean detrended deviation, residual =
    // what's left. Determinism discipline: daily totals accumulate in
    // DECIMAL (order-exact), the 7-day window sums DECIMAL and divides
    // once in double, and the per-weekday seasonal mean folds over a
    // DAY-SORTED deviation list — no unordered float accumulation
    // anywhere. One shuffle to daily grain, one type-partitioned window,
    // one broadcast join back from the 7-row-per-type seasonal frame.
    "win_seasonal_decompose" -> ((s, d) =>
      seasonalDecomposeOf(Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
        "event_type", "ts", "value")
        .orderBy("event_type", "day")),

    // IGNORE NULLS navigation — the forward-fill idiom: last_value
    // IGNORE NULLS over a trailing frame carries the latest OBSERVED
    // reading across gaps (sensor dropouts, sparse telemetry) in ONE
    // window pass, no self-join; lag counts its offset in non-null rows
    // (previous observation, not previous row) and nth_value picks the
    // k-th observation of the partition. Same single user_id shuffle as
    // every other window key — null-skipping happens inside the frame
    // evaluator, not as an extra filter+join. ~29% of readings are
    // nulled by a deterministic event_id band so every column exercises
    // both arms.
    "win_ignore_nulls" -> ((s, d) => {
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSeq = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val wAll = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_id") % 7 < 2, lit(null))
            .otherwise(round(col("value"), 2)).as("v"))
        .withColumn("filled", last("v", ignoreNulls = true).over(wRun))
        .withColumn("prev_obs", lag(col("v"), 1, null, ignoreNulls = true).over(wSeq))
        .withColumn("second_obs", nth_value(col("v"), 2, ignoreNulls = true).over(wAll))
        .orderBy("event_id")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))) // r19 fuzz: delta arithmetic
        .select("user_id", "event_id", "ts", "value")
        .withColumn("delta", round(col("value") - lag("value", 1).over(w), 4))
        .withColumn("next_ts", lead("ts", 1).over(w))
        .orderBy("event_id")
    }),

    // (l_orderkey, l_linenumber) is NOT unique → the window order carries
    // l_quantity too (ties are then rows identical in every frame-relevant
    // column, so ROWS-frame sums are order-independent), and the output
    // order covers every column incl. the computed one.
    "win_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
                 col("l_linenumber").asc, col("l_quantity").asc)
        .rowsBetween(-3, 3)
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .withColumn("moving_qty", round(sum("l_quantity").over(w), 2))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate", "l_quantity", "moving_qty")
    }),

    "win_frame_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: RANGE key + sum
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .orderBy("o_orderkey")
    }),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("first_date", first("o_orderdate").over(w))
        .withColumn("last_date", last("o_orderdate").over(w))
        .orderBy("o_orderkey")
    }),

    // Time-interval RANGE frame: per-user rolling 1-hour event count/sum —
    // the batch twin of stream_sliding, expressed as a range frame over
    // epoch seconds (RANGE frames take numeric offsets; both engines
    // compute the identical frame over epoch(ts)). Ties on ts are fine: a
    // RANGE frame includes ALL peer rows, so the result is order-
    // independent within a timestamp.
    "win_rolling_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_s").asc)
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
                expr("unix_micros(ts) div 1000000").as("ts_s")) // integer div — no double rounding
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", round(sum("value").over(w), 2))
        .select("event_id", "user_id", "ts_s", "n_1h", "sum_1h")
        .orderBy("event_id")
    }),

    // Gap-based sessionization (batch): a new session starts after a
    // >30-min silence per user. The classic lag → flag → running-sum
    // pattern; the per-user micros comparison is exact (both engines floor
    // the parquet ns timestamps to µs). Scale: both windows and the final
    // agg partition by user_id — one shuffle total, no global window. The
    // streaming twin of this key is stream_session (session_window).
    "win_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select("user_id", "event_id", "ts")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
               unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum("new_s").over(run))
        .groupBy("user_id")
        .agg(max("sid").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Time-series gap fill + forward fill — the observability/feature-
    // engineering primitive ("carry the last reading across silent days"):
    // per user, the daily activity series is densified onto the full
    // day grid between that user's first and last active day (sequence()
    // + explode — each user's grid generates from its own 2-column span
    // row, no corpus-sized cross join), then missing days take the last
    // observed value via last(ignoreNulls) over an unbounded-preceding
    // frame. Plan: one groupBy (daily rollup), one tiny span agg, a
    // generator join, one user-partitioned window — every shuffle is on
    // user_id/day, nothing global. First grid day is an observation BY
    // CONSTRUCTION (the span starts at min(day)), so `filled` is total.
    // Scoped to user_id < 50 to keep the gate output bounded.
    "win_gap_fill" -> ((s, d) =>
      gapFillOf(Tables.events(s, d).filter(col("user_id") < 50)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
                "user_id", "ts", "value")
        .orderBy("user_id", "day")),

    // Gap fill + LINEAR interpolation — win_gap_fill's twin for signals
    // where carrying the last reading misrepresents the gap (a metric that
    // trends between samples): each missing day takes
    //   prev + (next − prev) · (day − prev_day)/(next_day − prev_day),
    // the straight line between its two observed anchors. Same densify
    // plumbing as gapFillOf (per-key sequence() grid — no corpus cross
    // join); the anchors come from TWO mirrored ignoreNulls windows over
    // one sort order (last/back + first/forward — Spark evaluates both in
    // a single WindowExec pass per direction, still one user_id shuffle).
    // The grid starts AND ends at observations, so every gap row has both
    // anchors and `interp` is total; observed rows short-circuit to their
    // own value (their 0/0 day-fraction never evaluates).
    "win_gap_interpolate" -> ((s, d) =>
      gapInterpolateOf(Tables.events(s, d).filter(col("user_id") < 50)
        .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: REAL-measure series
                       "user_id", "ts", "value")
        .orderBy("user_id", "day")),

    // Exponentially-weighted moving average (pandas ewm adjust=True) over
    // each user's daily series — the smoothing/feature-decay primitive
    // Spark has no builtin for. The recursion is eliminated by the
    // scale-invariant ratio form: with q = 1−α and weights q^(t−i),
    // ewma_t = cumsum(x_i·q^(−i)) / cumsum(q^(−i)) — the common q^t
    // factor CANCELS, so no per-row rescaling and both cumsums run in the
    // same ordered frame (sequential within each engine ⇒ cross-engine
    // deterministic). One user-partitioned window chain, no self-join.
    // q^(−i) grows exponentially in the row index — safe for bounded
    // per-key series (a month of days here); an unbounded 100 TB series
    // needs block-renormalized weights or a per-key sequential pass
    // (mapPartitions after repartition+sortWithin), documented trade-off.
    "win_ewma" -> ((s, d) => {
      val q = 1.0 - 0.3
      val wOrd = Window.partitionBy("user_id").orderBy("day")
      val run = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("user_id") < 50)
        .filter(graft.Contract.finiteOrNull(col("value"))) // r19 fuzz: REAL-measure series
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("v"))
        .withColumn("p", pow(lit(1.0 / q), row_number().over(wOrd)))
        .withColumn("ewma", round(
          sum(col("v") * col("p")).over(run) / sum("p").over(run), 4))
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
                col("v"), col("ewma"))
        .orderBy("user_id", "day")
    }),

    // Block-renormalized EWMA — same output as `win_ewma`, but safe for
    // UNBOUNDED per-key series (the plain ratio form's q^(−i) overflows
    // double at i ≈ 2000 for α=0.3 and the ewma goes NaN). Plan:
    //   1. rows chunk into fixed B-row blocks per key; the in-block ratio
    //      form's exponents are bounded by B, so they never overflow;
    //   2. each block's end-of-block numerator/denominator contribution
    //      (S = Σ x_j·q^(B−j), W = Σ q^(B−j)) is one map-side-combinable
    //      hash-agg — n/B rows total;
    //   3. the cross-block recurrence N_b = q^B·N_{b−1} + S_b is
    //      CONTRACTING (q^B < 1 — this is the renormalization: weights are
    //      re-anchored at every block boundary instead of growing with the
    //      global row index), so the carried prefix is bounded forever; it
    //      folds via Horner (`aggregate`) over the previous M block sums —
    //      q^(B·M) < 1e−19 puts the truncated tail below double precision,
    //      so block ≡ plain to well past the 4dp gate rounding;
    //   4. carries join back on (key, block) and each row combines its
    //      local cumsum with q^(j)·carry.
    // Every shuffle is on user_id(, blk) — no global state, no exponent
    // ever exceeds B·M. OperatorSpec pins block ≡ plain on the corpus AND
    // an overflow regime (3000-row series) where plain yields NaN and this
    // form stays finite and correct.
    "win_ewma_block" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("user_id") < 50)
        .filter(graft.Contract.finiteOrNull(col("value"))) // r19 fuzz: REAL-measure series
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum("value"), 2).as("v"))
      ewmaBlockOf(daily, "user_id", "day", "v", alpha = 0.3)
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
                col("v"), col("ewma"))
        .orderBy("user_id", "day")
    }),

    // Share-of-total within a group (Oracle's RATIO_TO_REPORT): each
    // part's price as a fraction of its brand total — one partition-only
    // window, no self-join back onto the aggregate. The brand total runs
    // in DECIMAL (order-exact) and shares round at 6dp.
    "win_ratio_to_report" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
      val total = sum(col("p_retailprice").cast("decimal(18,2)")).over(w)
      Tables.part(s, d)
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("brand_total", total.cast("double"))
        .withColumn("share", round(col("p_retailprice") / total.cast("double"), 6))
        .orderBy("p_partkey")
    }),

    // nth_value over a FULL frame: "who/what is the runner-up" — per
    // nation, every customer row carries the 2nd-highest balance and the
    // id of the 3rd-ranked customer. The frame must be spelled
    // UNBOUNDED..UNBOUNDED explicitly: the default frame stops at
    // CURRENT ROW, which silently yields NULL for rows ranked above n in
    // BOTH engines — the classic nth_value trap. Unique tiebreaker in the
    // ORDER BY keeps the nth pick engine-stable; one partition-keyed
    // window, one shuffle.
    "win_nth_value" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .withColumn("second_bal", nth_value(col("c_acctbal"), 2).over(w))
        .withColumn("third_id", nth_value(col("c_custkey"), 3).over(w))
        .orderBy("c_custkey")
    }),

    // Gaps-and-islands: per-user CONSECUTIVE-day activity streaks via the
    // classic row_number anchor (day − rn is constant exactly within a run
    // of consecutive days). The raw log collapses to distinct (user, day)
    // in the first shuffle's map-side combine; every window and aggregate
    // after that partitions on user_id — one shuffle chain, no global
    // window, streak state never materializes beyond a group key. The
    // engagement/retention primitive ("longest activity streak") at any
    // scale.
    "win_gaps_islands" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      days
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
             max("len").as("max_streak"),
             sum("len").as("n_active_days"))
        .orderBy("user_id")
    }),

    // Running COUNT DISTINCT over an ordered stream — the "how many
    // distinct parts has this supplier shipped so far" catalog-growth
    // curve, snapshotted per month. Plain count(DISTINCT) is not a
    // window function in either engine; the standard rewrite is
    // first-occurrence flag (row_number over (key, value) = 1) → running
    // sum of flags. Both windows shuffle on l_suppkey only (the flag
    // window's (suppkey, partkey) partitioning is strictly finer — no
    // extra exchange); the (shipdate, orderkey, linenumber) ordering is
    // unique per supplier so the running sum is deterministic, and the
    // monthly max is order-independent because the cumsum is monotone.
    // At 100 TB the per-supplier window is the hot-key risk — a skewed
    // supplier gets the win_ntile_scalable two-phase treatment (per-month
    // partial distinct counts + a month-level scan), same playbook.
    "win_cumulative_distinct" -> ((s, d) => {
      val wFirst = Window.partitionBy("l_suppkey", "l_partkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
      val wRun = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_partkey", "l_shipdate", "l_orderkey",
                "l_linenumber")
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("cum_distinct", sum("first_seen").over(wRun))
        .groupBy(col("l_suppkey"),
                 date_trunc("month", col("l_shipdate")).as("month"))
        .agg(max("cum_distinct").as("parts_seen"),
             count(lit(1)).as("n_lines"))
        .orderBy("l_suppkey", "month")
    }),

    // Moving MEDIAN over a rows frame — the robust-smoothing twin of a
    // rolling mean (outlier-immune trend line over each supplier's
    // shipment sizes). Spark's median is an ImperativeAggregate, so the
    // 7-row frame is re-evaluated per row by WindowExec — O(frame) per
    // row, fine for small fixed frames; a large frame would want the
    // two-heap mapPartitions treatment instead. One l_suppkey shuffle;
    // ordering unique per supplier ⇒ deterministic. Both engines
    // interpolate the even-count median identically (quantile_cont 0.5).
    "win_moving_median" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .rowsBetween(-6, 0)
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
                "l_quantity")
        .withColumn("med7",
          round(expr("percentile(l_quantity, 0.5)").over(w), 2))
        .withColumn("avg7", round(avg("l_quantity").over(w), 2))
        .withColumn("n7", count(lit(1)).over(w))
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    }),

    // Rolling z-score anomaly detection — the observability primitive
    // ("flag readings >3σ from their own recent history"): per supplier,
    // each quantity is scored against the mean/stddev of its 20 TRAILING
    // rows (frame ends at 1 PRECEDING — the current row never contaminates
    // its own baseline, the difference between detection and smoothing).
    // Moments are derived from sum/sum-of-squares rather than stddev_samp:
    // quantities are integral, so both running sums are EXACT doubles in
    // any accumulation order and the whole (μ, σ, z) chain is bit-identical
    // cross-engine — stddev_samp's internal streaming recurrences are not
    // contractually order-stable. Rows with <8 trailing points are warm-up
    // and dropped; an all-equal window (σ=0) yields NULL z, non-outlier.
    // One supplier-keyed shuffle; the frame is O(1) state per row at any
    // scale.
    "win_rolling_zscore" -> ((s, d) =>
      rollingZscoreOf(
        Tables.lineitem(s, d).filter(col("l_suppkey") < 20)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
                  col("l_linenumber"), col("l_quantity").cast("double").as("x")),
        "l_suppkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"), "x")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber"))
  ))

  /** Daily DECIMAL-exact rollup shared by the time-series trio: one
    * shuffle to (keyCol, day) grain, totals order-exact in
    * DECIMAL(18,2). */
  private def dailyTotals(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("dvd"))

  /** Classical seasonal decomposition (win_seasonal_decompose /
    * Ingest.seasonalDecompose): per-key daily series split into
    * value = trend + seasonal + residual — centered 7-day moving-average
    * trend (full windows only), per-weekday mean detrended deviation
    * folded over a DAY-SORTED list (bit-stable), residual the remainder.
    * Returns (keyCol, day, daily_total 2dp, trend/seasonal/residual
    * 4dp), unordered. */
  private[graft] def seasonalDecomposeOf(df: DataFrame, keyCol: String,
                                         tsCol: String,
                                         valueCol: String): DataFrame = {
    val daily = dailyTotals(df, keyCol, tsCol, valueCol)
      .withColumn("dv", col("dvd").cast("double"))
      .withColumn("dow", dayofweek(col("day")))
    val w7 = Window.partitionBy(keyCol).orderBy("day").rowsBetween(-3, 3)
    val t = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("ts7", sum("dvd").over(w7))
      .filter(col("n7") === 7)
      .withColumn("trend", col("ts7").cast("double") / 7.0)
      .withColumn("dev", col("dv") - col("trend"))
    val seas = t.groupBy(keyCol, "dow")
      .agg(sort_array(collect_list(struct(col("day"), col("dev"))))
        .as("ds"))
      .select(col(keyCol), col("dow"),
        expr("""aggregate(ds, CAST(0.0 AS DOUBLE), (a, x) -> a + x.dev)
                / size(ds)""").as("seasonal"))
    t.join(broadcast(seas), Seq(keyCol, "dow"))
      .select(col(keyCol), col("day"),
        round(col("dv"), 2).as("daily_total"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("dv") - col("trend") - col("seasonal"), 4).as("residual"))
  }

  /** Drawup/CUSUM level-shift detector (win_cusum_drawup /
    * Ingest.cusumDrawup): running DECIMAL-exact sum of detrended
    * deviations, drawup = Sᵢ − min(S_j, j ≤ i) — Page's CUSUM without
    * the recursive reset, a plain two-window expression. Returns
    * (keyCol, day, daily_total 2dp, cusum 4dp, drawup 4dp),
    * unordered. */
  private[graft] def cusumDrawupOf(df: DataFrame, keyCol: String,
                                   tsCol: String,
                                   valueCol: String): DataFrame = {
    val daily = dailyTotals(df, keyCol, tsCol, valueCol)
    val wAll = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("mu",
        sum("dvd").over(wAll).cast("double") / count(lit(1)).over(wAll))
      .withColumn("srun", sum("dvd").over(wRun).cast("double")
                          - col("mu") * count(lit(1)).over(wRun))
      .withColumn("smin", min("srun").over(wRun))
      .select(col(keyCol), col("day"),
        round(col("dvd").cast("double"), 2).as("daily_total"),
        round(col("srun"), 4).as("cusum"),
        round(col("srun") - col("smin"), 4).as("drawup"))
  }

  /** Wald-Wolfowitz runs test per `keyCol` over the daily count series
    * of `tsCol` (win_runs_test / Stats.runsTest) — is the feed's
    * day-over-day movement RANDOM, or does it streak (momentum) or
    * oscillate (overcorrection)? Up/down signs come from a lag window
    * on the calendar-bounded daily grid (flat days dropped, the
    * standard convention); R = number of sign runs, and with n1 ups /
    * n2 downs the normal approximation uses mu = 2*n1*n2/n + 1,
    * sigma^2 = 2*n1*n2*(2*n1*n2 - n) / (n^2*(n-1)). R/n1/n2 are exact
    * integers; mu/sigma/z are fixed-order double expressions from
    * them. Verdict `random` = |z| <= 1.96 on the ROUNDED z. Degenerate
    * series with at least one move but all one way (or fewer than 2
    * moves) report z = 0 and random = true; a series with NO
    * day-over-day moves at all is OMITTED from the report — there is
    * no movement to test. Returns (key, n_up, n_down, n_runs, z 4dp,
    * random), unordered. */
  private[graft] def runsTestOf(df: DataFrame, keyCol: String,
                                tsCol: String): DataFrame = {
    val w = Window.partitionBy("g").orderBy("day")
    val moves = AggOps.dailyGridOf(df, keyCol, tsCol)
      .withColumn("prev", lag("c", 1).over(w))
      .filter(col("prev").isNotNull && col("c") =!= col("prev"))
      .withColumn("s", signum(col("c") - col("prev")).cast("int"))
    moves
      .withColumn("ps", lag("s", 1).over(w))
      .groupBy("g")
      .agg(sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_up"),
           sum(when(col("s") === -1, 1L).otherwise(0L)).as("n_down"),
           (sum(when(col("ps").isNotNull && col("s") =!= col("ps"), 1L)
                  .otherwise(0L)) + 1L).as("n_runs"))
      .select(col("g").as(keyCol), col("n_up"), col("n_down"),
              col("n_runs"),
        round({
          val n1 = col("n_up").cast("double")
          val n2 = col("n_down").cast("double")
          val n = (col("n_up") + col("n_down")).cast("double")
          val a = lit(2.0) * n1 * n2
          val sig2 = a * (a - n) / (n * n * (n - lit(1.0)))
          when(col("n_up") > 0L && col("n_down") > 0L &&
               col("n_up") + col("n_down") > 1L && sig2 > 0.0,
            (col("n_runs").cast("double") - (a / n + lit(1.0))) / sqrt(sig2))
            .otherwise(lit(0.0))
        }, 4).as("z"))
      .withColumn("random", abs(col("z")) <= 1.96)
  }

  /** Autocorrelation function at lags 1..maxLag (win_autocorr /
    * Stats.autocorr): Pearson r from EXPLICIT sufficient moments — the
    * engines' corr() streaming recurrences are not order-stable, while
    * 2dp daily totals have exact pairwise products that sum exactly in
    * double. One window pass fans the lags via stack(). Returns
    * (keyCol, lag, n_pairs, acf 4dp), unordered. */
  private[graft] def autocorrOf(df: DataFrame, keyCol: String,
                                tsCol: String, valueCol: String,
                                maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 10, s"maxLag $maxLag out of range")
    val wL = Window.partitionBy(keyCol).orderBy("day")
    var daily = dailyTotals(df, keyCol, tsCol, valueCol)
      .withColumn("x", col("dvd").cast("double"))
    (1 to maxLag).foreach { k =>
      daily = daily.withColumn(s"l$k", lag("x", k).over(wL))
    }
    val stackArgs = (1 to maxLag).map(k => s"$k, l$k").mkString(", ")
    daily
      .selectExpr(keyCol, s"stack($maxLag, $stackArgs) AS (lag, y)", "x")
      .filter(col("y").isNotNull)
      .groupBy(keyCol, "lag")
      .agg(count(lit(1)).as("n_pairs"),
           sum("x").as("sx"), sum("y").as("sy"),
           sum(col("x") * col("y")).as("sxy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"))
      .withColumn("den",
        (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
        * (col("n_pairs") * col("syy") - col("sy") * col("sy")))
      .select(col(keyCol), col("lag"), col("n_pairs"),
        // a zero-variance (constant) series has no defined ACF — NULL,
        // never a 0/0 NaN
        when(col("den") > 0,
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
                / sqrt(col("den")), 4)).as("acf"))
  }

  /** Rolling z-score core (win_rolling_zscore / Ingest.rollingZscore):
    * each value scored against the mean/σ of its `lookback` TRAILING rows
    * (frame ends at 1 PRECEDING — the current row never contaminates its
    * own baseline). μ/σ derive from frame sum / sum-of-squares — for
    * integral-valued series both sums are exact doubles in any
    * accumulation order, making the chain bit-identical cross-engine,
    * which stddev_samp's streaming recurrences do not guarantee. Rows
    * with < `minPoints` trailing values are warm-up and dropped; a
    * zero-variance window yields NULL z (never ±Inf/NaN). Adds (z 4dp,
    * is_outlier at 3σ); one keyCol shuffle, O(1) frame state per row. */
  private[graft] def rollingZscoreOf(df: DataFrame, keyCol: String,
                                     orderCols: Seq[String], valueCol: String,
                                     lookback: Int = 20,
                                     minPoints: Int = 8): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-lookback, -1)
    val x = col(valueCol)
    df.withColumn("__nw", count(x).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .filter(col("__nw") >= minPoints)
      .withColumn("__mu", col("__sx") / col("__nw"))
      .withColumn("__sd", sqrt(
        (col("__sxx") - col("__sx") * col("__sx") / col("__nw")) /
          (col("__nw") - 1)))
      .withColumn("z",
        when(col("__sd") > 0, round((x - col("__mu")) / col("__sd"), 4)))
      .withColumn("is_outlier",
        when(col("__sd") > 0, abs(x - col("__mu")) > col("__sd") * 3)
          .otherwise(lit(false)))
      .drop("__nw", "__sx", "__sxx", "__mu", "__sd")
  }

  /** Gap-fill + forward-fill core (win_gap_fill / Ingest.gapFill): the
    * per-key daily rollup of `valueCol` (2dp) densified onto each key's
    * own [min(day), max(day)] grid (sequence + explode from the key's
    * 2-column span row), missing days forward-filled with
    * last(ignoreNulls). Returns (keyCol, day TIMESTAMP-at-midnight,
    * observed, filled); `filled` is total because each grid starts at an
    * observation. Day surfaces as midnight TIMESTAMP: engine DATEs render
    * as incomparable pandas types (date object vs datetime64) at the
    * cross-engine gate, and timestamps compare bit-for-bit. */
  private[graft] def gapFillOf(df: DataFrame, keyCol: String,
                               tsCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sum(valueCol), 2).as("v"))
    val span = daily.groupBy(keyCol)
      .agg(min("day").as("d0"), max("day").as("d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("filled", last("v", ignoreNulls = true).over(w))
      .select(col(keyCol), col("day").cast("timestamp").as("day"),
              col("v").as("observed"), col("filled"))
  }

  /** Gap fill + LINEAR interpolation core (win_gap_interpolate): same
    * per-key densify plumbing as [[gapFillOf]], but each missing day takes
    * the straight line between its two observed anchors instead of a
    * carried value. Anchors come from two mirrored ignoreNulls windows
    * over the one (key, day) sort — still a single key shuffle. The grid
    * starts and ends at observations, so both anchors always exist and
    * `interp` (4dp) is total; observed rows short-circuit to their own
    * value. Returns (keyCol, day TIMESTAMP-at-midnight, observed, interp)
    * — same midnight-TIMESTAMP convention as gapFillOf. */
  private[graft] def gapInterpolateOf(df: DataFrame, keyCol: String,
                                      tsCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sum(valueCol), 2).as("v"))
    val span = daily.groupBy(keyCol)
      .agg(min("day").as("d0"), max("day").as("d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val back = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(back))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
                             ignoreNulls = true).over(back))
      .withColumn("nv", first("v", ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
                              ignoreNulls = true).over(fwd))
      .withColumn("interp", round(
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")) /
            datediff(col("nd"), col("pd"))), 4))
      .select(col(keyCol), col("day").cast("timestamp").as("day"),
              col("v").as("observed"), col("interp"))
  }

  /** Plain ratio-form EWMA (pandas ewm adjust=True): adds an `ewma` column
    * (4dp) to a (key, ord, value) frame. One user-partitioned window chain;
    * q^(−i) grows with the row index, so this form is only safe for
    * BOUNDED per-key series — beyond ~2000 rows (α=0.3) the weights
    * overflow double and the output goes NaN. The unbounded-series path is
    * [[ewmaBlockOf]]; OperatorSpec pins both regimes. */
  private[graft] def ewmaPlainOf(df: DataFrame, keyCol: String,
                                 ordCol: String, valCol: String,
                                 alpha: Double): DataFrame = {
    val q = 1.0 - alpha
    val wOrd = Window.partitionBy(keyCol).orderBy(ordCol)
    val run = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("p", pow(lit(1.0 / q), row_number().over(wOrd)))
      .withColumn("ewma", round(
        sum(col(valCol) * col("p")).over(run) / sum("p").over(run), 4))
      .drop("p")
  }

  /** Block-renormalized EWMA: identical output to [[ewmaPlainOf]] (the
    * truncated tail is < q^(B·M) ≈ 1e−19 relative, below the 4dp
    * rounding), but every exponent is bounded by B, so UNBOUNDED per-key
    * series never overflow. Rows chunk into B-row blocks; in-block cumsums
    * use local exponents; the cross-block recurrence N_b = q^B·N_{b−1} +
    * S_b is contracting and folds via Horner over the previous M block
    * sums. Shuffles only on (key[, blk]). */
  private[graft] def ewmaBlockOf(df: DataFrame, keyCol: String,
                                 ordCol: String, valCol: String,
                                 alpha: Double): DataFrame = {
    val q = 1.0 - alpha
    val B = 8   // in-block exponent bound
    val M = 16  // carried blocks: q^(B·M) = 0.7^128 ≈ 1.6e−20 < ulp
    val qB = math.pow(q, B)
    val wOrd = Window.partitionBy(keyCol).orderBy(ordCol)
    val daily = df
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("blk", ((col("rn") - 1) / B).cast("int"))
      .withColumn("j", ((col("rn") - 1) % B + 1).cast("int"))
    // In-block running sums: exponents ≤ B by construction.
    val wBlk = Window.partitionBy(keyCol, "blk").orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = pow(lit(1.0 / q), col("j"))
    // NULL values contribute 0 with full weight: the plain windowed sum
    // SKIPS a null, but a block whose PREFIX is all-null would make the
    // in-block sum NULL and poison the carry combine — coalesce keeps the
    // decomposition exactly equal to the one-window formula (the oracle
    // carries the same coalesce)
    val vSafe = coalesce(col(valCol), lit(0.0))
    val rows = daily
      .withColumn("lnum", sum(vSafe * p).over(wBlk) * pow(lit(q), col("j")))
      .withColumn("lden", sum(p).over(wBlk) * pow(lit(q), col("j")))
    // Per-block end sums (n/B rows), then the carried prefix via a Horner
    // fold over the previous ≤M blocks: the frame is ordered by blk
    // ascending, so foldLeft(acc·q^B + x) reproduces the recurrence.
    val wPrev = Window.partitionBy(keyCol).orderBy("blk").rowsBetween(-M, -1)
    val horner = (arrCol: Column) => aggregate(
      arrCol, lit(0.0), (acc, x) => acc * lit(qB) + x)
    val carries = daily
      .groupBy(keyCol, "blk")
      .agg(sum(vSafe * pow(lit(q), lit(B) - col("j"))).as("sblk"),
           sum(pow(lit(q), lit(B) - col("j"))).as("wblk"))
      .withColumn("cnum", horner(collect_list("sblk").over(wPrev)))
      .withColumn("cden", horner(collect_list("wblk").over(wPrev)))
      .select(col(keyCol), col("blk"), col("cnum"), col("cden"))
    rows.join(carries, Seq(keyCol, "blk"))
      .withColumn("ewma", round(
        (col("lnum") + pow(lit(q), col("j")) * col("cnum")) /
        (col("lden") + pow(lit(q), col("j")) * col("cden")), 4))
      .drop("rn", "blk", "j", "lnum", "lden", "cnum", "cden")
  }

  val oracle: Map[String, String] = graft.Contract.uniqueMap("WinOps.oracle", Seq(
    // generate_series over DATE+INTERVAL yields timestamps — cast back;
    // same grid, same IGNORE NULLS forward fill.
    "win_gap_fill" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v
        FROM events
        WHERE user_id < 50 AND (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM span),
      j AS (SELECT g.user_id, g.day, d.v
            FROM grid g LEFT JOIN daily d USING (user_id, day))
      SELECT user_id, CAST(day AS TIMESTAMP) AS day, v AS observed,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM j ORDER BY user_id, day""",

    // Same grid; anchors via mirrored IGNORE NULLS frames, same literal
    // arithmetic order (((nv−pv)·Δ)/Δ2) so the doubles match bit-for-bit
    // before the 4dp rounding.
    "win_gap_interpolate" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v
        FROM events
        WHERE user_id < 50 AND (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM span),
      j AS (SELECT g.user_id, g.day, d.v
            FROM grid g LEFT JOIN daily d USING (user_id, day)),
      f AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS) OVER back AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                 OVER back AS pd,
               first_value(v IGNORE NULLS) OVER fwd AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                 OVER fwd AS nd
        FROM j
        WINDOW back AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, CAST(day AS TIMESTAMP) AS day, v AS observed,
             round(CASE WHEN v IS NOT NULL THEN v
                        ELSE pv + (nv - pv) * date_diff('day', pd, day)
                                            / date_diff('day', pd, nd) END,
                   4) AS interp
      FROM f ORDER BY user_id, day""",

    // Same ratio-form derivation; both cumsums are sequential ROWS frames.
    "win_ewma" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v
        FROM events
        WHERE user_id < 50 AND (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, v,
               pow(1.0 / 0.7, row_number() OVER (PARTITION BY user_id ORDER BY day)) AS p
        FROM daily)
      SELECT user_id, CAST(day AS TIMESTAMP) AS day, v,
             round(sum(coalesce(v, 0.0) * p) OVER w / sum(p) OVER w, 4) AS ewma
      FROM r
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day""",

    // The block form computes the SAME ewma (truncation tail < 1e-19
    // relative, far below the 4dp gate rounding) — one oracle serves both.
    "win_ewma_block" -> """
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 2) AS v
        FROM events
        WHERE user_id < 50 AND (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      r AS (
        SELECT user_id, day, v,
               pow(1.0 / 0.7, row_number() OVER (PARTITION BY user_id ORDER BY day)) AS p
        FROM daily)
      SELECT user_id, CAST(day AS TIMESTAMP) AS day, v,
             round(sum(coalesce(v, 0.0) * p) OVER w / sum(p) OVER w, 4) AS ewma
      FROM r
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day""",

    "win_ratio_to_report" -> """
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS brand_total,
             round(p_retailprice / CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 6) AS share
      FROM part
      WINDOW w AS (PARTITION BY p_brand)
      ORDER BY p_partkey""",

    "win_nth_value" -> """
      SELECT c_custkey, c_nationkey, c_acctbal,
             nth_value(c_acctbal, 2) OVER w AS second_bal,
             nth_value(c_custkey, 3) OVER w AS third_id
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_custkey""",

    // DATE − INTEGER is a DATE in DuckDB (Postgres rule), matching
    // Spark's date_sub; the anchor is only a grouping key, never output.
    "win_gaps_islands" -> """
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      runs AS (
        SELECT user_id,
               day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS anchor
        FROM days),
      streaks AS (
        SELECT user_id, anchor, count(*) AS len
        FROM runs GROUP BY user_id, anchor)
      SELECT user_id, count(*) AS n_streaks,
             CAST(max(len) AS BIGINT) AS max_streak,
             CAST(sum(len) AS BIGINT) AS n_active_days
      FROM streaks GROUP BY user_id ORDER BY user_id NULLS FIRST""",

    "win_rank_dense_rownum" -> """
      SELECT * FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(rank() OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               CAST(row_number() OVER w AS INTEGER) AS rn
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC))
      WHERE rn <= 10
      ORDER BY p_brand NULLS FIRST, rn""",

    "win_ntile_percent" -> """
      SELECT c_custkey, c_acctbal,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM customer
      WINDOW w AS (ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC)
      ORDER BY c_custkey""",

    // Same declared semantics as win_ntile_percent — the scalable plan must
    // reproduce the single-window answer exactly.
    "win_ntile_scalable" -> """
      SELECT c_custkey, c_acctbal,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM customer
      WINDOW w AS (ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC)
      ORDER BY c_custkey""",

    // Same exact-moment derivation; DuckDB unpivots via UNION ALL of the
    // three lag columns (no stack()).
    "win_autocorr" -> """
      WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
        FROM events
        WHERE (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, x,
               lag(x, 1) OVER w AS l1,
               lag(x, 2) OVER w AS l2,
               lag(x, 3) OVER w AS l3
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      p AS (
        SELECT event_type, 1 AS lag, x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2 AS lag, x, l2 AS y FROM lagged WHERE l2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3 AS lag, x, l3 AS y FROM lagged WHERE l3 IS NOT NULL),
      m AS (
        SELECT event_type, lag, count(*) AS n_pairs,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM p GROUP BY 1, 2)
      SELECT event_type, lag, n_pairs,
             CASE WHEN (n_pairs * sxx - sx * sx)
                       * (n_pairs * syy - sy * sy) > 0
                  THEN round((n_pairs * sxy - sx * sy)
                             / sqrt((n_pairs * sxx - sx * sx)
                                    * (n_pairs * syy - sy * sy)), 4)
             END AS acf
      -- NULLS FIRST matches the Spark side's orderBy default (r21 fuzz:
      -- a fuzzed NULL event_type group sorted last here, first there)
      FROM m ORDER BY event_type NULLS FIRST, lag""",

    // Same lag-window sign sequence; R/n1/n2 exact ints, z the same
    // fixed-order double chain, verdict on the rounded z.
    "win_runs_test" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events
        WHERE (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      mv AS (
        SELECT g, day, CAST(sign(c - prev) AS INTEGER) AS s
        FROM (
          SELECT g, day, c,
                 lag(c) OVER (PARTITION BY g ORDER BY day) AS prev
          FROM daily)
        WHERE prev IS NOT NULL AND c <> prev),
      sq AS (
        SELECT g, s, lag(s) OVER (PARTITION BY g ORDER BY day) AS ps
        FROM mv),
      a AS (
        SELECT g,
               CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_up,
               CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_down,
               CAST(sum(CASE WHEN ps IS NOT NULL AND s <> ps
                             THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
        FROM sq GROUP BY g),
      f AS (
        SELECT g, n_up, n_down, n_runs,
               2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE) AS aa,
               CAST(n_up + n_down AS DOUBLE) AS n
        FROM a)
      SELECT g AS event_type, n_up, n_down, n_runs, z, abs(z) <= 1.96 AS random
      FROM (
        SELECT g, n_up, n_down, n_runs,
               round(CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1
                           AND aa * (aa - n) / (n * n * (n - 1.0)) > 0.0
                 THEN (CAST(n_runs AS DOUBLE) - (aa / n + 1.0))
                      / sqrt(aa * (aa - n) / (n * n * (n - 1.0)))
                 ELSE 0.0 END, 4) AS z
        FROM f)
      ORDER BY event_type NULLS FIRST""",

    // Same DECIMAL running sums; srun = CAST(S AS DOUBLE) − mu·i is the
    // identical literal chain, so smin compares identical doubles.
    "win_cusum_drawup" -> """
      WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS dvd
        FROM events
        WHERE (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      t AS (
        SELECT event_type, day, dvd,
               CAST(sum(dvd) OVER (PARTITION BY event_type) AS DOUBLE)
                 / count(*) OVER (PARTITION BY event_type) AS mu,
               CAST(sum(dvd) OVER w AS DOUBLE) AS s_raw,
               count(*) OVER w AS i
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      u AS (
        SELECT event_type, day, dvd, s_raw - mu * i AS srun
        FROM t),
      v AS (
        SELECT event_type, day, dvd, srun,
               min(srun) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS smin
        FROM u)
      SELECT event_type, day,
             round(CAST(dvd AS DOUBLE), 2) AS daily_total,
             round(srun, 4) AS cusum,
             round(srun - smin, 4) AS drawup
      FROM v ORDER BY event_type NULLS FIRST, day""",

    // Same DECIMAL daily totals, DECIMAL 7-day window sum, and
    // day-sorted seasonal fold; dow buckets differ by a constant across
    // engines (Spark 1-7 vs DuckDB 0-6) but never surface — only the
    // grouping matters, and it is bijective.
    "win_seasonal_decompose" -> """
      WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               sum(CAST(value AS DECIMAL(18,2))) AS dvd
        FROM events
        WHERE (value IS NULL OR isfinite(value))
        GROUP BY 1, 2),
      t AS (
        SELECT event_type, day, CAST(dvd AS DOUBLE) AS dv,
               dayofweek(day) AS dow,
               count(*) OVER w AS n7, sum(dvd) OVER w AS ts7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      f AS (
        SELECT event_type, day, dv, dow,
               CAST(ts7 AS DOUBLE) / 7.0 AS trend,
               dv - CAST(ts7 AS DOUBLE) / 7.0 AS dev
        FROM t WHERE n7 = 7),
      seas AS (
        SELECT event_type, dow,
               list_sum(list_transform(
                 list(struct_pack(day := day, dev := dev) ORDER BY day),
                 x -> x.dev)) / count(*) AS seasonal
        FROM f GROUP BY 1, 2)
      SELECT f.event_type, f.day, round(f.dv, 2) AS daily_total,
             round(f.trend, 4) AS trend,
             round(s.seasonal, 4) AS seasonal,
             round(f.dv - f.trend - s.seasonal, 4) AS residual
      FROM f JOIN seas s ON f.event_type = s.event_type AND f.dow = s.dow
      ORDER BY f.event_type, f.day""",

    // DuckDB spells the modifier INSIDE the call parens:
    // fn(args IGNORE NULLS); offsets count non-null rows in both engines.
    "win_ignore_nulls" -> """
      WITH b AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_id % 7 < 2 THEN NULL
                    ELSE round(value, 2) END AS v
        FROM events)
      SELECT user_id, event_id, ts, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
             lag(v, 1 IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_obs,
             nth_value(v, 2 IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_obs
      FROM b
      ORDER BY event_id""",

    "win_lag_lead" -> """
      SELECT user_id, event_id, ts, value,
             round(value - lag(value, 1) OVER w, 4) AS delta,
             lead(ts, 1) OVER w AS next_ts
      FROM events
      WHERE (value IS NULL OR isfinite(value))
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY event_id""",

    "win_frame_rows" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
             round(sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 2) AS moving_qty
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_suppkey, l_shipdate, l_quantity, moving_qty""",

    "win_frame_range" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice ASC NULLS FIRST
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      ORDER BY o_orderkey""",

    "win_first_last" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
             first_value(o_orderdate) OVER w AS first_date,
             last_value(o_orderdate) OVER w AS last_date
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey""",

    "win_rolling_time" -> """
      WITH e AS (
        SELECT event_id, user_id, value,
               epoch_us(ts) // 1000000 AS ts_s
        FROM events)
      SELECT event_id, user_id, ts_s,
             count(*) OVER w AS n_1h,
             round(sum(value) OVER w, 2) AS sum_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",

    "win_sessionize" -> """
      WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      s AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM s GROUP BY user_id ORDER BY user_id NULLS FIRST""",

    "win_cumulative_distinct" -> """
      WITH f AS (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CASE WHEN row_number() OVER (
                      PARTITION BY l_suppkey, l_partkey
                      ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM lineitem),
      r AS (
        SELECT l_suppkey, l_shipdate,
               sum(first_seen) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                 ROWS UNBOUNDED PRECEDING) AS cum_distinct
        FROM f)
      SELECT l_suppkey,
             date_trunc('month', l_shipdate) AS month,
             CAST(max(cum_distinct) AS BIGINT) AS parts_seen,
             count(*) AS n_lines
      FROM r
      GROUP BY 1, 2
      ORDER BY l_suppkey, month""",

    "win_moving_median" -> """
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
             round(median(l_quantity) OVER w, 2) AS med7,
             round(avg(l_quantity) OVER w, 2) AS avg7,
             count(*) OVER w AS n7
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""",

    // Same exact integer-moment derivation (sums of integral doubles are
    // order-exact), same literal arithmetic order through μ/σ/z.
    "win_rolling_zscore" -> """
      WITH b AS (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS x
        FROM lineitem WHERE l_suppkey < 20),
      f AS (
        SELECT *,
               count(x) OVER w AS n20,
               sum(x)   OVER w AS sx,
               sum(x*x) OVER w AS sxx
        FROM b
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      m AS (
        SELECT *, sx / n20 AS mu,
               sqrt((sxx - sx * sx / n20) / (n20 - 1)) AS sd
        FROM f WHERE n20 >= 8)
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, x,
             CASE WHEN sd > 0 THEN round((x - mu) / sd, 4) END AS z,
             CASE WHEN sd > 0 THEN (abs(x - mu) > sd * 3)
                  ELSE false END AS is_outlier
      FROM m
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""
  ))
}
