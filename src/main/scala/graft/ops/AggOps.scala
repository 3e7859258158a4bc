package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2-D aggregation surface.
  *
  * Scale notes (100 TB): every groupBy below compiles to a partial (map-side)
  * + final HashAggregate, so the shuffle carries pre-aggregated rows — the
  * dominant cost is the scan, which prunes to only the referenced columns.
  * Group-key cardinalities here are tiny (flags, priorities, segments), so
  * the final aggregate is never skewed; count_distinct is the one expensive
  * shape (expand + 2-phase) and approx_count_distinct is the documented
  * at-scale alternative.
  */
object AggOps {
  type Q = (SparkSession, String) => DataFrame

  /** agg_count_min sketch geometry (depth = independent hash rows, width
    * = buckets per row) — shared with the oracle SQL and the PropertySpec
    * overestimate pin. 4×64 on a ~2000-key domain guarantees visible
    * collisions, so the key demonstrates estimation, not a lookup table. */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 64

  /** agg_bloom_membership geometry (k hash functions, m bits) — shared
    * with the oracle SQL and the PropertySpec no-false-negative pin. */
  private[graft] val BloomK = 4
  private[graft] val BloomBits = 4096

  /** Count–min cells (j, bucket, c) over `items(keyCol)` — the
    * agg_count_min core and the `Sketch.countMin` facade. The stream
    * collapses to per-key counts FIRST (the only corpus-scale op,
    * map-side combinable); cells sum those counts — equivalent by
    * linearity, one md5 per distinct key. Hash rows are disjoint
    * 6-hex-char slices of the digest, so depth ≤ 5. */
  private[graft] def countMinCellsOf(items: DataFrame, keyCol: String,
                                     depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 5, "md5 supplies 5 disjoint 6-hex slices")
    val perKey = items.groupBy(col(keyCol).as("cms_k"))
      .agg(count(lit(1)).as("kc"))
      .withColumn("h", md5(col("cms_k").cast("string")))
    perKey
      .select(col("kc"), cmsBuckets(depth, width).as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(sum("kc").as("c"))
  }

  /** Point estimates est(key) = min over hash rows of cell(j, h_j(key))
    * for every distinct probe key → (keyCol, cms_est). `cells` must come
    * from [[countMinCellsOf]] with the same (depth, width). Zero-count
    * buckets are ABSENT rows in `cells`, so the probe side LEFT-joins and
    * coalesces a missing cell to 0 — an untouched bucket proves the key
    * was never seen, and the estimate for unseen probes is an honest 0
    * (still overestimate-only) rather than a silently dropped row. */
  private[graft] def countMinEstimateOf(cells: DataFrame, probes: DataFrame,
                                        keyCol: String, depth: Int,
                                        width: Int): DataFrame =
    probes.select(col(keyCol)).distinct()
      .withColumn("h", md5(col(keyCol).cast("string")))
      .select(col(keyCol), cmsBuckets(depth, width).as(Seq("j", "bucket")))
      .join(cells, Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))

  private def cmsBuckets(depth: Int, width: Int): org.apache.spark.sql.Column =
    posexplode(expr(
      s"""transform(sequence(0, ${depth - 1}), j ->
          CAST(conv(substring(h, 1 + 6 * j, 6), 16, 10) AS BIGINT) % $width)"""))

  /** Bloom bit set (j, bit) over `members(keyCol)` — ≤ k·m rows at any
    * scale; broadcast it to pre-filter a probe stream (agg_bloom_
    * membership / `Sketch.bloomBits`). */
  private[graft] def bloomBitsOf(members: DataFrame, keyCol: String,
                                 k: Int, m: Int): DataFrame =
    members.select(col(keyCol).as("bloom_k")).distinct()
      .select(col("bloom_k"),
              explode(array((0 until k).map(lit): _*)).as("j"))
      .select(col("j"), bloomBit(col("j"), col("bloom_k"), m).as("bit"))
      .distinct()

  /** Probe verdicts → (keyCol, bloom_hit 0/1): hit iff ALL k bits are
    * set. No false negatives ever; false-positive rate is the standard
    * (1−e^{−kn/m})^k. */
  private[graft] def bloomProbeOf(bits: DataFrame, probes: DataFrame,
                                  keyCol: String, k: Int, m: Int): DataFrame =
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until k).map(lit): _*)).as("j"))
      .withColumn("bit", bloomBit(col("j"), col(keyCol), m))
      .join(broadcast(bits.withColumn("present", lit(1))),
            Seq("j", "bit"), "left")
      .groupBy(keyCol)
      .agg(sum(coalesce(col("present"), lit(0))).as("nbits"))
      .select(col(keyCol),
              when(col("nbits") === k.toLong, lit(1)).otherwise(lit(0))
                .as("bloom_hit"))

  private def bloomBit(j: org.apache.spark.sql.Column,
                       key: org.apache.spark.sql.Column,
                       m: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(concat_ws(":", j, key)), 1, 6), 16, 10)
      .cast("long"), lit(m.toLong))

  /** Misra–Gries heavy-hitter summary state: `keys` sorted ascending (for
    * the O(log k) membership probe), `counts` parallel. Arrays are mutated
    * in place on the hot paths (hit increment, full-table decrement) —
    * safe because udaf(Aggregator) is object-based aggregation
    * (TypedImperativeAggregate): the buffer lives as this object per
    * partition and only serializes at the partial/final boundary. */
  case class MgState(keys: Array[String], counts: Array[Long])
  /** finish() wrapper so the result is a product (Encoders.product) whose
    * one field is a SQL array<string> the caller can explode. */
  case class MgOut(cands: Seq[String])

  /** Misra–Gries with k=256 counters over a stream of strings. Classic
    * update: hit → +1; miss with spare room → insert at 1; miss while full
    * → decrement ALL by 1, dropping zeros (the new item is not inserted).
    * merge = sum-combine the two summaries, then if over k entries subtract
    * the (k+1)-th largest count from all and keep positives — the
    * mergeable-summaries reduction (Agarwal et al., PODS'12), which keeps
    * the combined undercount ≤ n/(k+1) REGARDLESS of merge order/tree
    * shape. Hence the candidate set provably contains every item with true
    * frequency > n/(k+1) ⊇ { freq > n/k } — nondeterministic partials, a
    * deterministic guarantee, which is what lets the exact second pass
    * produce a hash-gated answer. */
  object MisraGries extends org.apache.spark.sql.expressions.Aggregator[String, MgState, MgOut] {
    val K = 256
    override def zero: MgState = MgState(Array.empty, Array.empty)
    override def reduce(b: MgState, x: String): MgState = {
      if (x == null) return b // nulls carry no frequency; also guards the
                              // compareTo probes below against NPE
      val i = java.util.Arrays.binarySearch(b.keys.asInstanceOf[Array[AnyRef]], x)
      if (i >= 0) { b.counts(i) += 1; b }
      else if (b.keys.length < K) {
        val at = -i - 1
        val nk = new Array[String](b.keys.length + 1)
        val nc = new Array[Long](b.keys.length + 1)
        System.arraycopy(b.keys, 0, nk, 0, at); System.arraycopy(b.counts, 0, nc, 0, at)
        nk(at) = x; nc(at) = 1L
        System.arraycopy(b.keys, at, nk, at + 1, b.keys.length - at)
        System.arraycopy(b.counts, at, nc, at + 1, b.keys.length - at)
        MgState(nk, nc)
      } else {
        // full-table decrement: in place when nothing hits zero (the
        // common case under near-uniform load), compact otherwise
        var zeros = 0
        var j = 0
        while (j < b.counts.length) { if (b.counts(j) == 1L) zeros += 1; j += 1 }
        if (zeros == 0) {
          j = 0; while (j < b.counts.length) { b.counts(j) -= 1L; j += 1 }
          b
        } else {
          val nk = new Array[String](b.keys.length - zeros)
          val nc = new Array[Long](b.keys.length - zeros)
          var o = 0; j = 0
          while (j < b.counts.length) {
            if (b.counts(j) > 1L) { nk(o) = b.keys(j); nc(o) = b.counts(j) - 1L; o += 1 }
            j += 1
          }
          MgState(nk, nc)
        }
      }
    }
    override def merge(a: MgState, b: MgState): MgState = {
      // merge two sorted summaries, summing shared keys
      val mk = new Array[String](a.keys.length + b.keys.length)
      val mc = new Array[Long](mk.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.keys.length && j < b.keys.length) {
        val c = a.keys(i).compareTo(b.keys(j))
        if (c == 0) { mk(o) = a.keys(i); mc(o) = a.counts(i) + b.counts(j); i += 1; j += 1 }
        else if (c < 0) { mk(o) = a.keys(i); mc(o) = a.counts(i); i += 1 }
        else { mk(o) = b.keys(j); mc(o) = b.counts(j); j += 1 }
        o += 1
      }
      while (i < a.keys.length) { mk(o) = a.keys(i); mc(o) = a.counts(i); i += 1; o += 1 }
      while (j < b.keys.length) { mk(o) = b.keys(j); mc(o) = b.counts(j); j += 1; o += 1 }
      if (o <= K) MgState(mk.take(o), mc.take(o))
      else {
        // subtract the (K+1)-th largest count; strictly-greater entries
        // number ≤ K by construction, ties drop to zero and vanish
        val sorted = mc.take(o); java.util.Arrays.sort(sorted)
        val v = sorted(o - K - 1)
        var keep = 0; var t = 0
        while (t < o) { if (mc(t) > v) keep += 1; t += 1 }
        val nk = new Array[String](keep); val nc = new Array[Long](keep)
        var p = 0; t = 0
        while (t < o) { if (mc(t) > v) { nk(p) = mk(t); nc(p) = mc(t) - v; p += 1 }; t += 1 }
        MgState(nk, nc)
      }
    }
    override def finish(b: MgState): MgOut = MgOut(b.keys.toSeq)
    override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
  }

  /** Exact heavy hitters over `valueCol` of `items` — the one definition
    * shared by the agg_heavy_hitters key and Stats.heavyHitters: pass 1 =
    * Misra–Gries + total in one aggregation (the 1-row head() is the same
    * driver-scalar discipline as the BPE trainer's per-round winner); pass
    * 2 = exact recount restricted to the ≤k candidates (isin compiles to
    * an InSet — no join, no full-cardinality shuffle), filtered to
    * `cnt·k > n`. Output: (valueCol, cnt, n_total), exactly the items with
    * frequency > n/k (see MisraGries for the guarantee). */
  /** Market-basket association rules (agg_association_rules /
    * Stats.associationRules): from a (basket, item) frame, all item
    * pairs co-occurring in ≥ `minPairs` baskets with
    * support/confidence/lift. Pair expansion self-joins CO-PARTITIONED
    * on the basket key (bounded by basket size, never
    * corpus-quadratic); item supports broadcast onto the surviving pair
    * table; metrics are ratios of exact integer counts. Returns
    * (item_a, item_b, n_pair, support 6dp, confidence 4dp, lift 4dp),
    * unordered. */
  private[graft] def associationRulesOf(baskets: DataFrame,
                                        minPairs: Long): DataFrame = {
    // r21 (guide §3.3 "explode before a join multiplies the shuffle" /
    // VERDICT r20 #4 "attack the pair self-join itself"): the pair
    // expansion no longer self-joins. ONE basket-keyed collect_set
    // aggregation (the coPurchaseOf shape) collapses each basket to a
    // sorted distinct-item array — collect_set IS the old
    // distinct(basket, item), map-side combinable — and the C(k,2)
    // pairs generate ROW-LOCALLY from the sorted array (a < b ⟺ the
    // old x.item < y.item on numerically sorted items), so the
    // SortMergeJoin, its duplicate exchange and both sort passes
    // disappear. The basket-level frame is cached: all three consumers
    // (pair explode, item supports, basket count) read the ~|baskets|
    // rows instead of re-shuffling the corpus (unlike r20's rejected
    // cache of the corpus-sized distinct frame, this one is
    // basket-sized). NULL handling is value-identical to the join
    // shape: a NULL basket groups into one row whose items still feed
    // the supports (the old distinct deduped them the same way) but is
    // excluded from pair generation (the old join's NULL key never
    // matched) and from n_baskets (countDistinct ignored NULL); NULL
    // items vanish from collect_set, and the old shape's NULL-item
    // support group could never join back on item_a/item_b anyway.
    // (r20 wave-2 negative results — REPARTITION_BY_NUM pins before or
    // after the distinct, and caching the corpus-sized frame — applied
    // to the SELF-JOIN shape and are moot now; kept in git history.)
    val sets = graft.GraftCaches.track(
      baskets.groupBy(col("basket"))
        .agg(sort_array(collect_set(col("item"))).as("items"))
        .cache())
    val n = sets.agg(
      count(when(col("basket").isNotNull, 1)).as("n_baskets"))
    val item = sets.select(explode(col("items")).as("pi"))
      .groupBy("pi").agg(count(lit(1)).as("ni"))
    val pairs = sets.filter(col("basket").isNotNull)
      .select(explode(expr(
        """flatten(transform(items, (a, i) ->
             transform(slice(items, i + 2, size(items)),
                       b -> struct(a AS item_a, b AS item_b))))""")).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    pairs
      .join(broadcast(item.select(col("pi").as("item_a"), col("ni").as("na"))),
            "item_a")
      .join(broadcast(item.select(col("pi").as("item_b"), col("ni").as("nb"))),
            "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        round(col("n_pair").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_pair").cast("double") / col("na"), 4).as("confidence"),
        round((col("n_pair") * col("n_baskets")).cast("double")
              / (col("na") * col("nb")), 4).as("lift"))
  }

  /** Benford first-digit screen (agg_benford / Stats.benford) over a
    * 2dp money column: digits derive from the EXACT integer cents
    * (string head of a BIGINT), never floor(log10(double)). Returns
    * (digit, n, observed 4dp, expected 4dp), unordered. */
  private[graft] def benfordOf(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol) > 0) // zero/negative rows have no first digit
      .select(expr(
        s"CAST(substring(CAST(CAST(round($valueCol * 100) AS BIGINT) AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
      .select(col("digit"), col("n"),
        round(col("n") / col("total").cast("double"), 4).as("observed"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("expected"))

  /** Decile lift table (agg_decile_lift / Stats.decileLift) over a
    * pre-scored (idCol, scoreCol, respCol 0/1) frame: EXPLICIT decile
    * index ((r−1)·10 div n + 1, not engine-defined NTILE), integer-count
    * rates. The global rank is the win_ntile_scalable two-pass plan, not
    * a single-partition window: (1) one agg gives n/base/score-range
    * (1 row, broadcast); (2) range-bucket the score, per-bucket counts,
    * cumulative offsets via a window over the BUCKET STATS (≤1024 rows
    * at any scale — the only total-order pass); (3) broadcast offsets
    * back and rank locally inside each bucket. Rank values are exact
    * (bucketing is monotone in score; equal scores share a bucket and
    * break ties on idCol locally), so the decile arithmetic transfers
    * unchanged. Returns (decile, n_users, n_resp, resp_rate 4dp,
    * lift 4dp — NULL when the corpus has zero responders), unordered. */
  private[graft] def decileLiftOf(scoredIn: DataFrame, idCol: String,
                                  scoreCol: String,
                                  respCol: String): DataFrame = {
    val nBkts = 1024
    // three consumers (range stats, bucket counts, final rank join) —
    // cache the dimension-sized scored frame so its upstream aggregation
    // runs once, not per consumer (hitsOf economics; tracked for
    // Graft.clearCaches)
    val scored = graft.GraftCaches.track(scoredIn.cache())
    // lo/hi over the NON-NaN scores only: Spark's min/max order NaN above
    // every double, so a single NaN score would make hi NaN and poison
    // every row's bucket arithmetic ((x-lo)/NaN = NaN ⇒ one giant bucket)
    val sd = col(scoreCol).cast("double")
    val stats = scored.agg(
      count(lit(1)).as("n"),
      sum(respCol).cast("long").as("base"),
      min(when(!isnan(sd), sd)).as("lo"),
      max(when(!isnan(sd), sd)).as("hi"))
    val bucketed = scored.crossJoin(broadcast(stats))
      // NULL scores pin to bucket -1, which sorts LAST under bkt DESC —
      // the same place the r15 global `score DESC` window put them
      // (desc = NULLS LAST); without the explicit branch a NULL score
      // would yield a NULL bkt and silently vanish at the offs equi-join.
      // NaN scores pin to the TOP bucket (ADVICE r16): the r15 global
      // window ranked NaN FIRST (NaN > any double under desc), and the
      // within-bucket score-desc window below orders NaN first inside
      // that top bucket, so the two-pass rank matches the global one on
      // NaN input too instead of silently demoting NaN to bucket 0 via
      // floor(NaN)→0.
      .withColumn("bkt",
        when(col(scoreCol).isNull, lit(-1L))
          .when(isnan(sd), lit(nBkts - 1L))
          .when(col("hi") > col("lo"),
            least(floor((sd - col("lo"))
                        / ((col("hi") - col("lo")) / nBkts)),
                  lit(nBkts - 1L)))
          .otherwise(lit(0L)))
    val wS = Window.orderBy(col("bkt").desc)
    val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(wS.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bkt", "off")
    val wL = Window.partitionBy("bkt")
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    bucketed.join(broadcast(offs), "bkt")
      .withColumn("r", col("off") + row_number().over(wL))
      .withColumn("decile", expr("CAST(((r - 1) * 10) DIV n + 1 AS INT)"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
           sum(respCol).as("n_resp"),
           max(expr("CAST(base AS DOUBLE) / n")).as("base_rate"))
      .select(col("decile"), col("n_users"), col("n_resp"),
        round(col("n_resp") / col("n_users").cast("double"), 4).as("resp_rate"),
        // base_rate = 0 (no responders at all) would make lift IEEE
        // Infinity — surface NULL instead
        when(col("base_rate") > 0,
          round((col("n_resp") / col("n_users").cast("double"))
                / col("base_rate"), 4)).as("lift"))
  }

  /** Shannon entropy (bits) of `typeCol`'s mix per `groupCol`
    * (agg_entropy / Stats.entropy): two map-side-combinable hash-aggs;
    * the p·log2 p fold runs over a SORTED (type, count) list so the
    * non-associative double sum is bit-identical at any parallelism.
    * Per-group state is bounded by the type-universe size. Returns
    * (groupCol, n, n_types, entropy_bits 4dp), unordered. */
  private[graft] def entropyOf(df: DataFrame, groupCol: String,
                               typeCol: String): DataFrame =
    df.groupBy(groupCol, typeCol).agg(count(lit(1)).as("c"))
      .groupBy(groupCol)
      .agg(sum("c").as("n"),
           sort_array(collect_list(struct(col(typeCol), col("c"))))
             .as("cs"))
      .select(col(groupCol), col("n"),
        expr("CAST(size(cs) AS INT)").as("n_types"),
        round(expr(
          """aggregate(cs, CAST(0.0 AS DOUBLE),
             (a, x) -> a - (CAST(x.c AS DOUBLE) / n)
                         * log2(CAST(x.c AS DOUBLE) / n))"""), 4)
          .as("entropy_bits"))

  /** Two-sample Kolmogorov–Smirnov D of `valueCol` between `tagCol`
    * cohorts `a` and `b` (agg_ks_test / Stats.ksTest): the corpus
    * collapses to per-distinct-value counts first, so the cumulative
    * ECDF window runs on the value GRID, not the corpus — bounded by
    * grid cardinality at any data scale; cumulative counts are
    * integer-exact. Returns one row (n_a, n_b, ks_d 4dp). */
  private[graft] def ksTestOf(df: DataFrame, valueCol: String,
                              tagCol: String, a: String,
                              b: String): DataFrame = {
    val w = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // NULLs excluded for the same reason as mannWhitneyOf: no ECDF
    // position for a missing value, and the engines' null ordering
    // conventions differ (Spark NULLS FIRST, DuckDB NULLS LAST)
    df.filter(col(tagCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(valueCol)
      .agg(sum(when(col(tagCol) === a, 1L).otherwise(0L)).as("ca"),
           sum(when(col(tagCol) === b, 1L).otherwise(0L)).as("cb"))
      .select(col(valueCol),
              sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"),
              sum("ca").over(wAll).as("na"), sum("cb").over(wAll).as("nb"))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
           round(max(abs(col("cuma") / col("na") -
                         col("cumb") / col("nb"))), 4).as("ks_d"))
  }

  /** Pearson χ² independence of the `aCol` × `bCol` contingency
    * (agg_chi_square / Stats.chiSquare): one corpus hash-agg builds the
    * cells, marginals broadcast-join on the dimension-sized cell table,
    * the χ² fold runs over a SORTED cell array (bit-stable). Returns one
    * row (n_cells, dof, chi2 4dp). */
  /** Shared 1-row contingency stats behind [[chiSquareOf]] and
    * [[cramersVOf]]: (n_cells, ra, cb, n, chi2raw UNROUNDED) with the
    * chi-square folded over the SORTED cell array (bit-stable). */
  private def chi2StatsOf(df: DataFrame, aCol: String,
                          bCol: String): DataFrame = {
    val cells = df.groupBy(aCol, bCol).agg(count(lit(1)).as("c"))
    val rl = cells.groupBy(aCol).agg(sum("c").as("rl"))
    val cs = cells.groupBy(bCol).agg(sum("c").as("cs"))
    cells.join(broadcast(rl), aCol).join(broadcast(cs), bCol)
      .crossJoin(broadcast(cells.agg(sum("c").as("n"))))
      .agg(count(lit(1)).cast("int").as("n_cells"),
           countDistinct(col(aCol)).cast("int").as("ra"),
           countDistinct(col(bCol)).cast("int").as("cb"),
           max("n").as("n"),
           sort_array(collect_list(struct(col(aCol), col(bCol),
             col("c"), col("rl"), col("cs"), col("n")))).as("cl"))
      .select(col("n_cells"), col("ra"), col("cb"), col("n"),
        expr(
          """aggregate(cl, CAST(0.0 AS DOUBLE),
             (a, x) -> a + pow(CAST(x.c AS DOUBLE)
                               - CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                                 / CAST(x.n AS DOUBLE), 2)
                           / (CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                              / CAST(x.n AS DOUBLE)))""")
          .as("chi2raw"))
  }

  private[graft] def chiSquareOf(df: DataFrame, aCol: String,
                                 bCol: String): DataFrame =
    chi2StatsOf(df, aCol, bCol)
      .select(col("n_cells"),
        ((col("ra") - 1) * (col("cb") - 1)).cast("int").as("dof"),
        round(col("chi2raw"), 4).as("chi2"))

  /** Cramer's V effect size over the same contingency
    * (agg_cramers_v / Stats.cramersV): chi-square answers IS there an
    * association; V = sqrt(chi2 / (n * min(r-1, c-1))) answers HOW
    * STRONG, normalized to [0, 1] so it is comparable across table
    * shapes and corpus sizes (a huge n makes microscopic associations
    * "significant" — V is what you act on). Same sorted-fold chi2 as
    * [[chiSquareOf]] (shared core), one extra sqrt+divide; the
    * conventional strength verdict reads the ROUNDED V. Inherited
    * convention from the shared core: only OBSERVED cells contribute
    * (a structurally absent cell's (0-E)^2/E term is dropped), so V
    * understates on tables with empty cells — both engines agree
    * because the oracle folds the identical observed-cell list.
    * Returns one row (n, n_cells, dof, chi2 4dp, cramers_v 4dp,
    * strength). */
  private[graft] def cramersVOf(df: DataFrame, aCol: String,
                                bCol: String): DataFrame =
    chi2StatsOf(df, aCol, bCol)
      .select(col("n"), col("n_cells"),
        ((col("ra") - 1) * (col("cb") - 1)).cast("int").as("dof"),
        round(col("chi2raw"), 4).as("chi2"),
        round(when(least(col("ra") - 1, col("cb") - 1) > 0,
            sqrt(col("chi2raw") /
              (col("n") * least(col("ra") - 1, col("cb") - 1))
                .cast("double")))
          .otherwise(lit(0.0)), 4).as("cramers_v"))
      .withColumn("strength",
        when(col("cramers_v") < 0.1, "negligible")
          .when(col("cramers_v") < 0.3, "weak")
          .when(col("cramers_v") < 0.5, "moderate")
          .otherwise("strong"))

  /** Mann-Whitney U rank-sum test of `valueCol` between `tagCol`
    * cohorts `a` and `b` (agg_mann_whitney / Stats.mannWhitney) — the
    * rank-based cohort comparison that sees LOCATION shift where
    * [[ksTestOf]] sees any distribution gap, and needs no normality
    * like the t-test does. The corpus collapses to the distinct-VALUE
    * grid first (ks_test economics — the ranking window runs on grid
    * cardinality, never corpus size); with tied blocks of size t at
    * cumulative offset prev, the doubled a-side rank sum
    * 2R_a = sum ca*(2*prev + t + 1) is an exact integer, as are
    * 2U_a = 2R_a - na(na+1) and the tie term sum(t^3 - t). The normal
    * approximation z = (U - na*nb/2)/sigma uses the tie-corrected
    * sigma^2 = (na*nb/12)((n+1) - T/(n(n-1))) written in the same
    * operation order in both engines. Returns one row (n_a, n_b,
    * u_a — exact halves, z 4dp, significant at |z| > 1.96 on the
    * rounded z). */
  private[graft] def mannWhitneyOf(df: DataFrame, valueCol: String,
                                   tagCol: String, a: String,
                                   b: String): DataFrame = {
    val w = Window.orderBy(valueCol).rowsBetween(Window.unboundedPreceding, -1)
    // NULL observations are excluded: a rank-sum test has no rank for a
    // missing value, and Spark (NULLS FIRST) and DuckDB (NULLS LAST)
    // would grid-order a null row differently anyway
    val grid = df.filter(col(tagCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(valueCol)
      .agg(sum(when(col(tagCol) === a, 1L).otherwise(0L)).as("ca"),
           sum(when(col(tagCol) === b, 1L).otherwise(0L)).as("cb"))
      .withColumn("nv", col("ca") + col("cb"))
    val agg = grid
      .select(col("ca"), col("cb"), col("nv"),
              coalesce(sum("nv").over(w), lit(0L)).as("prev"))
      .agg(sum("ca").as("na"), sum("cb").as("nb"),
           sum(col("ca") * (col("prev") * 2L + col("nv") + 1L)).as("r2a"),
           sum(col("nv") * col("nv") * col("nv") - col("nv")).as("tsum"))
      .withColumn("n", col("na") + col("nb"))
      .withColumn("u2", col("r2a") - col("na") * (col("na") + 1L))
      .withColumn("sigma2",
        (col("na").cast("double") * col("nb").cast("double") / 12.0) *
          ((col("n") + 1L).cast("double") -
           col("tsum").cast("double") /
             (col("n") * (col("n") - 1L)).cast("double")))
      .withColumn("z", round(
        when(col("sigma2") > 0.0,
          (col("u2") - col("na") * col("nb")).cast("double") /
            (sqrt(col("sigma2")) * 2.0))
          .otherwise(lit(0.0)), 4))
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      (col("u2").cast("double") / 2.0).as("u_a"), col("z"),
      (abs(col("z")) > 1.96).as("significant"))
  }

  /** Calendar-bounded (g, day, c) daily-count grid shared by the trend
    * keys ([[mannKendallOf]], [[theilSenOf]], WinOps.runsTestOf): the
    * corpus collapses here FIRST — one map-side-combinable hash-agg
    * bounded by |groups| x |days| — so every downstream pair join and
    * window is grid-sized, never corpus-sized. */
  private[graft] def dailyGridOf(df: DataFrame, groupCol: String,
                                 tsCol: String): DataFrame =
    df.select(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .groupBy("g", "day").agg(count(lit(1)).as("c"))

  /** [[dailyGridOf]] plus the distinct-`userCol` reach column
    * (x = daily count, y = daily reach) — the volume/reach grid behind
    * [[kendallTauOf]] and [[spearmanOf]]. */
  private[graft] def dailyReachGridOf(df: DataFrame, groupCol: String,
                                      tsCol: String,
                                      userCol: String): DataFrame =
    df.select(col(groupCol).as("g"), to_date(col(tsCol)).as("day"),
              col(userCol).as("u"))
      .groupBy("g", "day")
      .agg(count(lit(1)).as("x"), countDistinct(col("u")).as("y"))

  /** Mann-Kendall monotonic-trend test per `groupCol`
    * (agg_mann_kendall / Stats.mannKendall): is each group's daily
    * activity series trending, without assuming linearity or a
    * distribution? S = sum over ordered day pairs of sign(c_j - c_i)
    * with the tie-corrected variance Var(S)*18 = n(n-1)(2n+5) -
    * sum_k t_k(t_k-1)(2t_k+5) (Mann 1945 / Kendall 1975), z via the
    * standard continuity correction. Engineering: the corpus collapses
    * FIRST to (group, day, count) — one map-side-combinable hash-agg
    * bounded by |groups| x |days|, never corpus size — and the O(n^2)
    * pair join runs on that calendar-bounded grid, so the statistic is
    * corpus-scale-free. Counts are exact integers, so S, the tie term,
    * and var18 carry zero float drift; z is one sqrt+divide from exact
    * ints. Returns (group, n_days, s_stat, var18, z 4dp, trend), where
    * trend applies the |z| > 1.96 two-sided 5% verdict to the ROUNDED z
    * (so both engines judge the same value). Groups observed on a
    * single day are OMITTED (the inner join with the pair frame drops
    * them) — a trend verdict needs at least two points. */
  private[graft] def mannKendallOf(df: DataFrame, groupCol: String,
                                   tsCol: String): DataFrame = {
    val daily = dailyGridOf(df, groupCol, tsCol)
    val a = daily.select(col("g"), col("day").as("d1"), col("c").as("c1"))
    val b = daily.select(col("g").as("gb"), col("day").as("d2"),
                         col("c").as("c2"))
    val s = a.join(b, col("g") === col("gb") && col("d1") < col("d2"))
      .groupBy("g")
      .agg(sum(signum(col("c2") - col("c1")).cast("long")).as("s_stat"))
    val n = daily.groupBy("g").agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy("g", "c").agg(count(lit(1)).as("t"))
      .groupBy("g")
      .agg(sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L)).as("tie18"))
    val zCol = when(col("s_stat") > 0, (col("s_stat") - 1L).cast("double") /
                 sqrt(col("var18").cast("double") / 18.0))
      .when(col("s_stat") < 0, (col("s_stat") + 1L).cast("double") /
        sqrt(col("var18").cast("double") / 18.0))
      .otherwise(lit(0.0))
    n.join(s, "g").join(ties, "g")
      .select(col("g").as(groupCol), col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1L) * (col("n_days") * 2L + 5L)
          - col("tie18")).as("var18"))
      .withColumn("z", round(zCol, 4))
      .withColumn("trend",
        when(col("z") > 1.96, "increasing")
          .when(col("z") < -1.96, "decreasing")
          .otherwise("none"))
  }

  /** Theil-Sen robust trend line per `groupCol` over the daily count
    * series of `tsCol` (agg_theil_sen / Stats.theilSen) — the
    * outlier-resistant companion to agg_regression's OLS and the
    * magnitude twin of [[mannKendallOf]]'s direction test: slope =
    * median of all pairwise slopes (Theil 1950/Sen 1968, ~29%
    * breakdown point vs OLS's zero), intercept = median(y - m*x).
    * Engineering: the corpus collapses FIRST to the calendar-bounded
    * (group, day, count) grid, the O(days^2) pair expansion runs on
    * that grid, and the group-dimension-sized fit broadcasts back —
    * corpus-scale-free like the Mann-Kendall key. Every slope is one
    * double division of exact ints and both engines interpolate the
    * median identically, so the gate is hash-exact. x is epoch days.
    * Groups observed on a single day are OMITTED (no pairwise slope
    * evidence exists; same contract as [[mannKendallOf]]). Returns
    * (group, n_days, n_pairs, slope 4dp, intercept 4dp), unordered. */
  private[graft] def theilSenOf(df: DataFrame, groupCol: String,
                                tsCol: String): DataFrame = {
    val daily = dailyGridOf(df, groupCol, tsCol)
    val a = daily.select(col("g"), col("day").as("d1"), col("c").as("c1"))
    val b = daily.select(col("g").as("gb"), col("day").as("d2"),
                         col("c").as("c2"))
    val slopes = a.join(b, col("g") === col("gb") && col("d1") < col("d2"))
      .select(col("g"), ((col("c2") - col("c1")).cast("double") /
        datediff(col("d2"), col("d1")).cast("double")).as("m"))
    val fit = slopes.groupBy("g")
      .agg(expr("percentile(m, 0.5)").as("m"), count(lit(1)).as("n_pairs"))
    daily.join(broadcast(fit), "g")
      .select(col("g"), col("n_pairs"), col("m"),
        (col("c").cast("double") - col("m") *
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("double")).as("b0"))
      .groupBy("g", "n_pairs", "m")
      .agg(count(lit(1)).as("n_days"), expr("percentile(b0, 0.5)").as("b0"))
      .select(col("g").as(groupCol), col("n_days"), col("n_pairs"),
        round(col("m"), 4).as("slope"), round(col("b0"), 4).as("intercept"))
  }

  /** Kendall tau-b rank correlation per `groupCol` between two daily
    * series — count and distinct-`userCol` reach — over `tsCol`
    * (agg_kendall_tau / Stats.kendallTau): "do volume and reach move
    * together, or is growth coming from a shrinking user set?" Rank
    * correlation is outlier-proof where Pearson (agg_corr_stats) is
    * not, and tau-b's tie correction keeps flat stretches honest:
    * tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)) with n0 = n(n-1)/2 and
    * n1/n2 the per-series tie-pair counts (Kendall 1945). Engineering:
    * the corpus collapses FIRST to the calendar-bounded (group, day,
    * count, distinct-users) grid — count-distinct state bounded by the
    * per-day user set — then C - D = sum over day pairs of
    * sign(dx)*sign(dy) and the tie terms are exact integers on that
    * grid; the one sqrt+divide comes last. Groups observed on a single
    * day are OMITTED (same contract as [[mannKendallOf]]). Returns
    * (group, n_days, cd, n0, n1, n2, tau 4dp), unordered. */
  private[graft] def kendallTauOf(df: DataFrame, groupCol: String,
                                  tsCol: String,
                                  userCol: String): DataFrame = {
    val daily = dailyReachGridOf(df, groupCol, tsCol, userCol)
    val a = daily.select(col("g"), col("day").as("d1"),
                         col("x").as("x1"), col("y").as("y1"))
    val b = daily.select(col("g").as("gb"), col("day").as("d2"),
                         col("x").as("x2"), col("y").as("y2"))
    val cd = a.join(b, col("g") === col("gb") && col("d1") < col("d2"))
      .groupBy("g")
      .agg(sum((signum(col("x2") - col("x1")) *
                signum(col("y2") - col("y1"))).cast("long")).as("cd"))
    val n = daily.groupBy("g").agg(count(lit(1)).as("n_days"))
    val tx = daily.groupBy("g", "x").agg(count(lit(1)).as("t"))
      .groupBy("g").agg(sum(col("t") * (col("t") - 1L)).as("n1x2"))
    val ty = daily.groupBy("g", "y").agg(count(lit(1)).as("t"))
      .groupBy("g").agg(sum(col("t") * (col("t") - 1L)).as("n2x2"))
    n.join(cd, "g").join(tx, "g").join(ty, "g")
      .select(col("g").as(groupCol), col("n_days"), col("cd"),
        // `div`, not `/`: Column./ on longs widens to double
        expr("n_days * (n_days - 1L) div 2L").as("n0"),
        expr("n1x2 div 2L").as("n1"), expr("n2x2 div 2L").as("n2"))
      .withColumn("tau", round(
        when((col("n0") - col("n1")) * (col("n0") - col("n2")) > 0L,
          col("cd").cast("double") /
            sqrt(((col("n0") - col("n1")) *
                  (col("n0") - col("n2"))).cast("double")))
          .otherwise(lit(0.0)), 4))
  }

  /** Spearman rank correlation per `groupCol` between the same two
    * daily series as [[kendallTauOf]] — count and distinct-`userCol`
    * reach (agg_spearman / Stats.spearman): the third leg of the
    * correlation board (Pearson = linear on values, tau-b = concordant
    * pairs, rho = linear on RANKS — monotone association with more
    * statistical efficiency than tau on near-linear data). Ties take
    * the conventional average rank r_min + (t-1)/2 — an exact multiple
    * of 1/2 — so every moment (sums of ranks, squares, cross products)
    * is an exact multiple of 1/4 far below 2^53: the distributed sums
    * are order-free EXACT doubles, and rho = (n*Sxy - Sx*Sy) /
    * sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is deterministic with one
    * sqrt+divide last (0 when either series is constant). Same
    * calendar-bounded grid economics; single-day groups yield rho 0
    * (constant-series guard). Returns (group, n_days, rho 4dp),
    * unordered. */
  private[graft] def spearmanOf(df: DataFrame, groupCol: String,
                                tsCol: String, userCol: String): DataFrame = {
    val daily = dailyReachGridOf(df, groupCol, tsCol, userCol)
    val rx = rank().over(Window.partitionBy("g").orderBy("x")).cast("double") +
      (count(lit(1)).over(Window.partitionBy("g", "x")) - 1L)
        .cast("double") / 2.0
    val ry = rank().over(Window.partitionBy("g").orderBy("y")).cast("double") +
      (count(lit(1)).over(Window.partitionBy("g", "y")) - 1L)
        .cast("double") / 2.0
    daily.select(col("g"), rx.as("rx"), ry.as("ry"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_days"),
           sum("rx").as("sx"), sum("ry").as("sy"),
           sum(col("rx") * col("rx")).as("sxx"),
           sum(col("ry") * col("ry")).as("syy"),
           sum(col("rx") * col("ry")).as("sxy"))
      .select(col("g").as(groupCol), col("n_days"),
        round({
          val n = col("n_days").cast("double")
          val vx = n * col("sxx") - col("sx") * col("sx")
          val vy = n * col("syy") - col("sy") * col("sy")
          when(vx > 0.0 && vy > 0.0,
            (n * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy))
            .otherwise(lit(0.0))
        }, 4).as("rho"))
  }

  /** Herfindahl-Hirschman concentration per `keyCol`
    * (agg_hhi / Stats.hhi): how concentrated is each key's composition
    * over `catCol` — the category-mix audit (a nation whose customers
    * sit in one market segment is a sampling red flag; the same shape
    * prices market concentration or corpus domain mix). With exact
    * per-(key, category) counts c_s and n = sum c_s: HHI = sum c_s^2 /
    * n^2, top share = max c_s / n, effective category count = n^2 /
    * sum c_s^2 (inverse Simpson). ONE hash-agg to the (key, category)
    * grid — bounded by the domain product, never corpus size — then a
    * per-key rollup; every ratio is a single division from exact int64.
    * Returns (keyCol, n_rows, n_cats, hhi 4dp, top_share 4dp,
    * eff_cats 4dp), unordered. */
  private[graft] def hhiOf(df: DataFrame, keyCol: String,
                           catCol: String): DataFrame = {
    df.groupBy(keyCol, catCol).agg(count(lit(1)).as("__hhi_c"))
      .groupBy(keyCol)
      .agg(sum("__hhi_c").as("n_rows"),
           count(lit(1)).as("n_cats"),
           sum(col("__hhi_c") * col("__hhi_c")).as("sq"),
           max("__hhi_c").as("mx"))
      .select(col(keyCol), col("n_rows"), col("n_cats"),
        round(col("sq").cast("double") /
              (col("n_rows") * col("n_rows")).cast("double"), 4).as("hhi"),
        round(col("mx").cast("double") / col("n_rows").cast("double"), 4)
          .as("top_share"),
        round((col("n_rows") * col("n_rows")).cast("double") /
              col("sq").cast("double"), 4).as("eff_cats"))
  }

  /** Median-absolute-deviation outlier screen per `keyCol`
    * (agg_mad_outliers / Stats.madOutliers): exact percentile(0.5)
    * median and MAD (both engines interpolate identically), deviations
    * joined back on the SAME key partitioning, flag at
    * `k`·1.4826·MAD on UNROUNDED values. Returns per-key
    * (keyCol, n, median 4dp, mad 4dp, n_outliers), unordered. */
  private[graft] def madOutliersOf(df: DataFrame, keyCol: String,
                                   valueCol: String,
                                   k: Double = 3.0): DataFrame = {
    val ev = df.select(col(keyCol), col(valueCol).as("__x"))
    val med = ev.groupBy(keyCol)
      .agg(expr("percentile(__x, 0.5)").as("med"))
    val dev = ev.join(med, keyCol)
      .withColumn("dev", abs(col("__x") - col("med")))
    val mad = dev.groupBy(keyCol)
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(mad, keyCol)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
           round(first("med"), 4).as("median"),
           round(first("mad"), 4).as("mad"),
           // mad = 0 (a >50% constant cohort) would flag EVERY deviation —
           // the zscore sd=0 failure mode; a zero-MAD cohort flags nothing
           sum(when(col("mad") > 0 &&
                    col("dev") > lit(k) * lit(1.4826) * col("mad"), 1L)
             .otherwise(0L)).as("n_outliers"))
  }

  /** Gini-coefficient core (agg_gini / Stats.gini): per `cohortCol`, the
    * concentration of `valueCol` — with values ranked ascending,
    * G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx). `tieCol` only stabilizes the rank
    * column (ties are algebraically harmless to G). One cohort-keyed
    * window + one aggregate; DECIMAL-exact moments. */
  private[graft] def giniOf(df: DataFrame, cohortCol: String,
                            valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(cohortCol)
      .orderBy(col("xd").asc, col(tieCol).asc) // cast is order-preserving
    df.select(col(cohortCol), col(valueCol).cast("decimal(18,2)").as("xd"),
              col(tieCol))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(cohortCol)
      .agg(count(lit(1)).as("n"),
           sum("xd").as("sx"),
           sum(col("xd") * col("i")).as("six"))
      .select(col(cohortCol), col("n"), {
        // n·Σx = 0 (an all-zero cohort) leaves G undefined — report NULL
        // instead of an ANSI DIVIDE_BY_ZERO; the when-guard is the
        // identity whenever mass exists, and the oracle carries the same
        // NULLIF, so fixture hashes and the cross-engine contract hold.
        val den = col("n").cast("double") * col("sx").cast("double")
        round((lit(2) * col("six").cast("double") -
               (col("n") + 1).cast("double") * col("sx").cast("double")) /
              when(den =!= 0.0, den), 6)
          .as("gini")
      })
  }

  /** Poisson-bootstrap mean-CI core (agg_bootstrap_ci /
    * Stats.bootstrapMeanCi): 32 deterministic resamples of `valueCol`'s
    * mean in ONE scan — per-row Poisson(1) weights from md5(`keyCol`)
    * bytes through a fixed inverse-CDF ladder, accumulated as 64
    * conditional-aggregate slots — no row explosion (the posexplode +
    * groupBy(b) formulation shuffles row×32 generated rows: measured
    * 4–9.6 s vs 0.18 s at sf0.1). The md5s are lambda-var-bound transform
    * inputs so they run once per row — a plain column alias gets
    * CollapseProject'd INTO the byte lambda and recomputed 16×, the
    * TextOps.fingerprintsOf kgram trap. Returns one row
    * (n_resamples, ci_lo, ci_hi, boot_mean); the CI is the 2nd/31st
    * order statistic of the resample means. `keyCol` must be unique per
    * row (it seeds the per-row draws). */
  private[graft] def bootstrapMeanCiOf(df: DataFrame, valueCol: String,
                                       keyCol: String): DataFrame = {
    val withBytes = df.select(
        col(valueCol).cast("decimal(18,2)").as("xd"),
        col(keyCol).cast("string").as("k"))
      .select(col("xd"), expr(
        """flatten(transform(
             array(md5(concat('a:', k)), md5(concat('b:', k))),
             h -> transform(sequence(0, 15), i ->
               CAST(conv(substring(h, i * 2 + 1, 2), 16, 10) AS INT))))""")
        .as("bytes"))
    def w(b: Int) = expr( // P(W=k) ladder for Poisson(1), byte /256
      s"""CASE WHEN bytes[$b] < 94 THEN 0 WHEN bytes[$b] < 188 THEN 1
               WHEN bytes[$b] < 235 THEN 2 WHEN bytes[$b] < 251 THEN 3
               WHEN bytes[$b] < 255 THEN 4 ELSE 5 END""")
    val slots = (0 until 32).flatMap(b => Seq(
      sum(col("xd") * w(b)).as(s"sx$b"), sum(w(b)).as(s"sw$b")))
    val meanArr = (0 until 32)
      .map(b => s"CAST(sx$b AS DOUBLE) / CAST(sw$b AS DOUBLE)")
      .mkString("array(", ", ", ")")
    withBytes
      .agg(slots.head, slots.tail: _*)
      .select(expr(s"sort_array($meanArr)").as("ms"))
      .select(expr("CAST(size(ms) AS BIGINT)").as("n_resamples"),
              round(element_at(col("ms"), 2), 4).as("ci_lo"),
              round(element_at(col("ms"), 31), 4).as("ci_hi"),
              round(expr("aggregate(ms, CAST(0.0 AS DOUBLE), (a, x) -> a + x)") /
                    expr("size(ms)"), 4).as("boot_mean"))
  }

  /** Welch two-sample t-test core (agg_ab_ttest / Stats.welchTTest): one
    * conditional-aggregation pass collects each cohort's (n, Σx, Σx²) —
    * DECIMAL-accumulated, so the sums are order-exact however the
    * partial aggregates merge — then mean/variance/t/Welch-df are scalar
    * double arithmetic on the single result row. Sufficient statistics
    * are map-side-combinable and mergeable across partitions/days; the
    * fact is scanned once and never revisited. Output: one row
    * (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, welch_df). */
  private[graft] def ttestOf(df: DataFrame, cohortCol: String,
                             a: String, b: String, valueCol: String): DataFrame = {
    val xd = col(valueCol).cast("decimal(18,2)")
    def grp(p: String, t: String) = Seq(
      count(when(col(cohortCol) === p, 1)).as(s"n_$t"),
      sum(when(col(cohortCol) === p, xd)).cast("double").as(s"sx_$t"),
      sum(when(col(cohortCol) === p, xd * xd)).cast("double").as(s"sxx_$t"))
    val cols = grp(a, "a") ++ grp(b, "b")
    // Every denominator that CAN be zero on degenerate input (empty or
    // single-row cohort, zero pooled variance) is nullif-guarded: under
    // ANSI SQL a bare division would throw DIVIDE_BY_ZERO; the guarded
    // stats come back NULL instead ("not estimable"), and nullif is the
    // identity on every non-degenerate input so fixture hashes are
    // untouched. The oracle carries the same NULLIFs — the cross-engine
    // contract holds on any data, not just the non-degenerate fixture.
    df.agg(cols.head, cols.tail: _*)
      .selectExpr(
        "n_a", "n_b",
        "round(sx_a / nullif(n_a, 0), 4) AS mean_a",
        "round(sx_b / nullif(n_b, 0), 4) AS mean_b",
        "round((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0), 2) AS var_a",
        "round((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0), 2) AS var_b",
        """round((sx_a / nullif(n_a, 0) - sx_b / nullif(n_b, 0)) /
             nullif(sqrt(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a
                + ((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b), 0), 4)
           AS t_stat""",
        """round(pow(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a
                   + ((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b, 2) /
             nullif(pow(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a, 2) / nullif(n_a - 1, 0)
            + pow(((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b, 2) / nullif(n_b - 1, 0), 0), 2)
           AS welch_df""")
  }

  private[graft] def heavyHittersOf(items0: DataFrame, valueCol: String): DataFrame = {
    val mg = udaf(MisraGries)
    val v = col(valueCol)
    // nulls are not countable items: drop them from BOTH passes so n_total
    // and the threshold agree (reduce also skips them defensively)
    val items = items0.filter(v.isNotNull)
    val first = items.agg(mg(v).as("mg"), count(lit(1)).as("n_total")).head()
    val cands = first.getStruct(0).getSeq[String](0)
    val nTotal = first.getLong(1)
    items.filter(v.isin(cands: _*))
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .withColumn("n_total", lit(nTotal))
      .filter(col("cnt") * MisraGries.K > col("n_total"))
  }

  val queries: Map[String, Q] = graft.Contract.uniqueMap("AggOps.queries", Seq(
    "agg_hash_global" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"),
        countDistinct("l_orderkey").as("n_orders"))
    }),

    // TPC-H Q1 shape — the flagship aggregation.
    "agg_groupby" -> ((s, d) => {
      Tables.lineitem(s, d)
        // measure-ingest guard (r19 fuzz): partial-agg ORDER makes the
        // NaN a sum emits bit-nondeterministic across engines AND runs
        .filter(graft.Contract.finiteOrNull(col("l_discount")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_count_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // max_by / min_by (SQL:2023 argmax/argmin): "the key of the priciest
    // order per priority" in ONE aggregation — the spelling that replaces
    // the window-rank-then-filter (full sort per group) or the
    // self-join-on-max (second corpus pass) anti-patterns; single hash-agg
    // carrying (best value, payload) pairs that merge map-side. Both
    // engines leave argmax TIES unspecified, so the ordering value is made
    // unique by construction: v = totalprice + orderkey·1e-6 (distinct
    // orderkeys ⇒ distinct v; the 1e-6 step is ~10⁴ ulps at the 1e5 price
    // scale, so the tiebreak never drowns in float granularity) — the
    // deterministic-argmax convention a production pipeline should adopt
    // anyway.
    "agg_max_by" -> ((s, d) => {
      val v = col("o_totalprice") + col("o_orderkey") * 1e-6
      Tables.orders(s, d)
        // measure-ingest guard (r19 fuzz): argmax over NaN/Inf is
        // engine-ordering-defined — reject at ingest, keep NULLs
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(max_by(col("o_orderkey"), v).as("priciest_key"),
             min_by(col("o_orderkey"), v).as("cheapest_key"),
             round(max("o_totalprice"), 2).as("max_price"),
             round(min("o_totalprice"), 2).as("min_price"))
        .orderBy("o_orderpriority")
    }),

    // Boolean aggregates: bool_and / bool_or (SQL:2023 EVERY/ANY) +
    // count_if — the data-quality assertion shape ("does EVERY row in the
    // partition satisfy the invariant, does ANY row violate it, how many")
    // computed as ordinary one-bit hash-agg state with map-side partials;
    // at 100 TB this replaces the anti-pattern of count(*) WHERE NOT(p)
    // sub-queries per invariant (N invariants, one pass, no self-joins).
    "agg_bool_logic" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
             expr("bool_or(o_totalprice > 400000.0)").as("any_over_400k"),
             expr("count_if(o_orderpriority = '1-URGENT')").as("n_urgent"),
             expr("bool_and(o_custkey >= 0)").as("keys_nonneg"),
             count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Linear-regression aggregates (SQL:2023 regr_* family, Spark 3.4+):
    // per-group OLS slope/intercept/R² of totalprice ~ custkey in ONE
    // hash-aggregate pass — closed-form moment arithmetic (Σx, Σy, Σxy,
    // Σx², n), so the fit costs exactly what any sum does: map-side
    // partials, one bounded shuffle, no iteration and no ML library. The
    // 100 TB use is per-segment trend/drift fitting (price vs time,
    // quality vs length) where collecting to a driver-side regression is
    // impossible; moments also make the fit MERGEABLE across days like
    // every other algebraic aggregate. DuckDB implements the same family
    // — identical SQL is the oracle (rounding absorbs moment
    // reassociation noise).
    "agg_regression" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: variance folds over a REAL measure
        .groupBy("o_orderpriority")
        .agg(expr("round(regr_slope(o_totalprice, o_custkey), 4)").as("slope"),
             expr("round(regr_intercept(o_totalprice, o_custkey), 2)").as("intercept"),
             expr("round(regr_r2(o_totalprice, o_custkey), 6)").as("r2"),
             expr("regr_count(o_totalprice, o_custkey)").as("n"),
             expr("round(regr_avgx(o_totalprice, o_custkey), 4)").as("avg_x"),
             expr("round(regr_avgy(o_totalprice, o_custkey), 2)").as("avg_y"))
        .orderBy("o_orderpriority")
    }),

    // EXACT distinct via bitmaps (Spark 3.5 bitmap_* family): each group's
    // key space is carved into 32k-bit buckets, per-(group, bucket) bitmaps
    // OR-merge in the partial aggregate, and the final count is a sum of
    // per-bucket popcounts. Same answer as count(distinct) but a different
    // scale contract: countDistinct expands rows and re-shuffles the raw
    // key stream, while the bitmap path shuffles only (group, bucket)
    // bitmaps whose size is bounded by the bucket width — and the bitmaps
    // themselves are REUSABLE artifacts (OR-mergeable across days/rollup
    // levels, the roaring-bitmap segment pattern; a second distinct over a
    // superset group-by merges the stored bitmaps instead of rescanning the
    // corpus). Oracle = plain count(DISTINCT) — the gate proves exactness.
    "agg_bitmap_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .selectExpr("o_orderpriority",
          "bitmap_bucket_number(o_custkey) AS bkt",
          "bitmap_bit_position(o_custkey) AS pos")
        .groupBy("o_orderpriority", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy("o_orderpriority")
        .agg(sum(expr("bitmap_count(bm)")).as("n_custs"))
        .orderBy("o_orderpriority")
    }),

    // HLL sketch — algo-dependent value, bench-only (no oracle); the 100 TB
    // replacement for exact count-distinct.
    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
    }),

    // collect_set sorted then joined to a string: array hash-compare across
    // engines is brittle, a canonical string is not.
    "agg_collect" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("priorities"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Spark 4's native LISTAGG (SQL:2023) — ordered within-group string
    // concatenation, the report/export shape agg_collect approximates via
    // collect_set+sort_array; the WITHIN GROUP order makes the result
    // deterministic without a post-sort of arrays.
    "agg_listagg" -> ((s, d) => {
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
             count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }),

    // The SQL FILTER clause on aggregates — per-predicate conditional
    // aggregation in ONE pass over the group (the spelling that replaces
    // N self-joins or sum(CASE...) towers); all filters evaluate inside
    // the same hash aggregate, so the corpus is read and shuffled once.
    "agg_filter_clause" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_big"),
             expr("round(sum(l_extendedprice) FILTER (WHERE l_discount = 0), 2)").as("rev_nodisc"),
             expr("count(*) FILTER (WHERE l_tax > 0.05)").as("n_hitax"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Sketch percentiles — the 100 TB path: approx_percentile keeps a
    // bounded per-group sketch with map-side merge (one shuffle of sketch
    // bytes), where the exact interpolating percentile above must shuffle
    // every VALUE to its group. Accuracy 10000 ⇒ rank error ≤ n/10000 —
    // algorithm-dependent values, so NO cross-engine oracle (DuckDB's
    // approx_quantile is t-digest, Spark's is GK); the OperatorSpec
    // tolerance test bounds it against the exact key instead.
    "agg_approx_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        // measure-ingest guard (r20): same convention as the exact twin
        // agg_percentile — a NaN/Inf measure has no defined rank; the
        // envelope gate (tools/selfcheck.py ENVELOPES) compares this key
        // against guarded exact quantiles on the fuzzed copies too
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(
          round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("p50"),
          round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 2).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Exact percentiles (interpolating), not approx — matches quantile_cont.
    "agg_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        // measure-ingest guard (r19 fuzz): a quantile of a measure with
        // NaN/Inf rows is ordering-convention garbage (Spark sorts NaN
        // last, DuckDB ranks it greatest) — reject at ingest, keep NULLs
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // rollup/cube after a join trip Spark's ambiguous-self-join detector
    // when rebuilt from the same files; the SQL-text path resolves by name
    // and is immune. Same plan (Expand + HashAggregate) either way.
    "agg_rollup" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_ru")
      Tables.customer(s, d).createOrReplaceTempView("customer_ru")
      s.sql("""
        SELECT c_mktsegment, o_orderstatus, grouping_id() AS gid,
               count(1) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_ru JOIN customer_ru ON o_custkey = c_custkey
        WHERE (o_totalprice IS NULL OR
               (NOT isnan(o_totalprice) AND abs(o_totalprice) < CAST('Infinity' AS DOUBLE)))
        GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
        ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
      """)
    }),

    "agg_cube" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_cu")
      Tables.customer(s, d).createOrReplaceTempView("customer_cu")
      Tables.nation(s, d).createOrReplaceTempView("nation_cu")
      s.sql("""
        SELECT /*+ BROADCAST(nation_cu) */
               n_name, o_orderpriority, grouping_id() AS gid,
               count(1) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_cu
        JOIN customer_cu ON o_custkey = c_custkey
        JOIN nation_cu ON c_nationkey = n_nationkey
        WHERE (o_totalprice IS NULL OR
               (NOT isnan(o_totalprice) AND abs(o_totalprice) < CAST('Infinity' AS DOUBLE)))
        GROUP BY CUBE (n_name, o_orderpriority)
        ORDER BY gid, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    }),

    "agg_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, grouping_id() AS gid,
               count(1) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        WHERE (o_totalprice IS NULL OR
               (NOT isnan(o_totalprice) AND abs(o_totalprice) < CAST('Infinity' AS DOUBLE)))
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    }),

    // Unpivot (melt): wide measure columns → long (measure, value) rows,
    // then re-aggregated. Pure projection+Expand — no shuffle added beyond
    // the final agg; the inverse demo of agg_pivot.
    "agg_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("val"), 2).as("total"))
        .orderBy("measure")
    }),

    // Pivot: orderpriority columns per order-year. The pivot value list is
    // EXPLICIT — with an explicit list Spark skips the extra distinct-values
    // job and the plan is a single hash-agg with conditional aggregates,
    // identical in shape to the CASE-based oracle (and scale-safe: output
    // width is fixed, not data-dependent).
    "agg_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .groupBy("o_year")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_year") +:
          Seq("1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
              "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5").map {
            // empty pivot cells are null in Spark but 0 under the oracle's
            // count(CASE ...) — normalize
            case (v, n) => coalesce(col(s"`$v`"), lit(0L)).as(n)
          }: _*)
        .orderBy("o_year")
    }),

    // Exact median + DETERMINISTIC mode per group. Spark's mode() leaves
    // tie-breaking unspecified, so the mode is derived explicitly:
    // count per (group, value), rank by (count DESC, value ASC), take the
    // top row — reproducible on any engine. Scale: the rank runs over the
    // group×distinct-value COUNTS (already aggregated, tiny), never the
    // raw rows; median is the one full-shuffle agg and agg_approx_percentile
    // is its documented 100 TB replacement.
    "agg_mode_median" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("cnt").desc, col("l_quantity").asc)
      val mode = li.groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      li.groupBy("l_returnflag")
        .agg(median(col("l_quantity")).as("med_qty"), count(lit(1)).as("n"))
        .join(mode, "l_returnflag")
        .select("l_returnflag", "med_qty", "mode_qty", "n")
        .orderBy("l_returnflag")
    }),

    // Bivariate/statistical aggregates — population forms only: corr and
    // the *_pop moments share one closed formula across engines, where
    // sample skewness/kurtosis use engine-specific bias corrections
    // (DuckDB ≠ Spark) and can't be oracle-gated at all. (Accumulation
    // order still differs — Spark merges partition co-moments — so like
    // every float aggregate in this suite the gate relies on the rounding
    // absorbing last-ULP drift, not on bit-identical arithmetic.)
    // GINI COEFFICIENT per cohort — the concentration/inequality metric
    // ("do a few giant orders carry this priority class?"): with values
    // ranked ascending, G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx). One ranked
    // window + one aggregate, both partitioned on the cohort — a single
    // shuffle chain. Rank ties are harmless by algebra (equal values
    // permuting among tied ranks leave Σi·xᵢ unchanged), but the unique
    // tiebreaker keeps the rank column itself engine-stable. Both moments
    // accumulate in DECIMAL (order-exact); G is one double expression.
    "agg_gini" -> ((s, d) =>
      // measure-ingest guard (r19 fuzz): rank-weighted DECIMAL sums
      giniOf(Tables.orders(s, d)
               .filter(graft.Contract.finiteOrNull(col("o_totalprice"))),
             "o_orderpriority", "o_totalprice", "o_orderkey")
        .orderBy("o_orderpriority")),

    // POISSON-BOOTSTRAP confidence interval — the resampling pattern that
    // actually works at 100 TB: classic bootstrap draws n-with-replacement
    // per resample (B full shuffles of the corpus); the Poisson(1)
    // approximation gives each row an independent per-resample weight, so
    // ALL B resamples compute in ONE pass — per-row weights, map-side-
    // combined per-resample sums, a B-row shuffle. Everything is
    // deterministic by construction: the weight is a DEFINED function of
    // md5(salt:key) bytes through a fixed inverse-CDF ladder (the ladder
    // IS the resampling scheme — cross-engine identical, no RNG), one
    // md5 yields 16 resamples (one byte each), two per row for B=32.
    // Means accumulate in DECIMAL (order-exact); the CI is the 2nd/31st
    // ORDER STATISTIC of the 32 resample means — order stats, not
    // interpolated percentiles, because engines interpolate differently.
    // Plan notes (ARRAY-SLOT, no row expansion; the CollapseProject md5
    // trap; measured 0.18 s at sf0.1, 55× the explode plan) live on
    // [[bootstrapMeanCiOf]].
    "agg_bootstrap_ci" -> ((s, d) =>
      // measure-ingest guard (r19 fuzz): resample means are DECIMAL sums
      bootstrapMeanCiOf(Tables.orders(s, d)
                          .filter(graft.Contract.finiteOrNull(col("o_totalprice"))),
                        "o_totalprice", "o_orderkey")),

    // grouping()/grouping_id() over a ROLLUP — the disambiguation the
    // multi-level aggregate family (agg_rollup/cube/grouping_sets) stops
    // short of: in rollup output a NULL group key is AMBIGUOUS (a real
    // NULL-valued group vs "this level aggregates the column away");
    // grouping(col) is the authoritative 0/1 flag and grouping_id() the
    // level bitmask, from the Expand operator's metadata rather than the
    // (lossy) key values — any BI tool rendering subtotal rows depends on
    // exactly this. The bitmask also yields a readable level label in
    // plain SQL. Same single Expand+hash-agg plan as agg_rollup.
    "agg_grouping_id" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
             grouping_id().cast("long").as("gid"),
             grouping(col("o_orderpriority")).cast("int").as("g_pri"),
             grouping(col("o_orderstatus")).cast("int").as("g_status"))
        .select(col("o_orderpriority"), col("o_orderstatus"),
          when(col("gid") === 0, "detail")
            .when(col("gid") === 1, "priority_subtotal")
            .otherwise("grand_total").as("level"),
          col("gid"), col("g_pri"), col("g_status"), col("n"))
        // within each gid tier the non-aggregated keys are unique, so
        // (gid, keys) is a total order with no NULL-vs-value comparisons
        .orderBy("gid", "o_orderpriority", "o_orderstatus")),

    // Welch's two-sample t-test from sufficient statistics — the A/B
    // primitive: does the URGENT cohort spend differently from the LOW
    // cohort? ONE pass over the fact computes each cohort's (n, Σx, Σx²)
    // via conditional aggregation (no self-join, no second scan); mean,
    // variance, t and the Welch–Satterthwaite df are scalar arithmetic on
    // the 1-row result. Engine-parity discipline: the moments accumulate
    // in DECIMAL (order-exact — a t-stat is a difference of close means
    // over a small σ, so float accumulation noise amplifies exactly where
    // it hurts), then every downstream op is the same literal double
    // expression in both engines. This is the 100 TB experimentation
    // shape: sufficient statistics are map-side-combinable and mergeable
    // across days/partitions — the raw data is never revisited.
    "agg_ab_ttest" -> ((s, d) =>
      // measure-ingest guard (r19 fuzz): the t-stat's DECIMAL money sums
      // assume a REAL measure — NaN/Inf rejected, NULLs keep their
      // r18 convention (oracle restates the same predicate)
      ttestOf(Tables.orders(s, d)
                .filter(graft.Contract.finiteOrNull(col("o_totalprice"))),
              "o_orderpriority", "1-URGENT", "5-LOW", "o_totalprice")),

    // Shannon entropy of each user's event-type mix — the behavioral-
    // diversity signal (bot detection: near-zero entropy = single-action
    // automation; quality scoring uses the same formula over token
    // distributions). Two map-side-combinable hash-aggs: per-(user, type)
    // counts, then per-user fold. The fold runs over a SORTED struct
    // array, not a bare SUM of p·log2 p terms — float addition is
    // non-associative, and an unordered agg's accumulation order is
    // engine-/partitioning-dependent; sorting the ≤5-element count list
    // first makes the entropy bit-identical cross-engine at any
    // parallelism. Per-user state is bounded by the type-universe size.
    "agg_entropy" -> ((s, d) =>
      entropyOf(Tables.events(s, d), "user_id", "event_type")
        .orderBy("user_id")),

    // Two-sample Kolmogorov–Smirnov D — distribution-drift detection
    // between cohorts (the train/serve skew check every data pipeline
    // needs): D = max |ECDF_click − ECDF_view| over the purchase-value
    // axis. The corpus collapses to per-distinct-value (ca, cb) counts
    // FIRST (one hash-agg, map-side combined) — the 2dp value grid is
    // ≤ 49k cells, so the cumulative window that follows runs on the
    // CELL table, not the corpus: the single-partition ECDF window is
    // bounded by the value-grid cardinality at any data scale. All
    // cumulative counts are integers (order-exact); D is one division +
    // max per cell.
    "agg_ks_test" -> ((s, d) =>
      ksTestOf(Tables.events(s, d), "value", "event_type", "click", "view")
        .withColumnRenamed("n_a", "n_click")
        .withColumnRenamed("n_b", "n_view")),

    // Pearson χ² independence test on the lang × source contingency of
    // the document corpus — the bias/drift check for training-data
    // curation ("is my source mix confounded with language?"). One
    // corpus-scale hash-agg builds the contingency cells; marginals and
    // the χ² fold are arithmetic on the CELL table (≤ |langs|·|sources|
    // rows), broadcast-joined — the corpus is scanned once, everything
    // downstream is dimension-sized. The cell-term sum is folded over a
    // SORTED cell array (same order both engines) so the double sum is
    // bit-stable, then rounded 4dp.
    "agg_chi_square" -> ((s, d) =>
      chiSquareOf(Tables.documents(s, d), "lang", "source")),

    // Cramer's V effect size on the same lang x source contingency as
    // agg_chi_square — significance says an association EXISTS; V
    // says how strong, normalized to [0,1] so it survives corpus
    // growth (at 100 TB everything is "significant"; V is what you
    // act on). Shared sorted-fold chi2 core, one extra sqrt+divide.
    "agg_cramers_v" -> ((s, d) =>
      cramersVOf(Tables.documents(s, d), "lang", "source")),

    // Mann-Whitney U rank-sum between the click and view cohorts'
    // values — the rank-based location test next to agg_ks_test's
    // any-gap test and agg_ab_ttest's normal-theory one. Ranks, U, and
    // the tie term are exact integers on the distinct-value grid; the
    // tie-corrected normal z is written in the same operation order in
    // both engines.
    "agg_mann_whitney" -> ((s, d) =>
      mannWhitneyOf(Tables.events(s, d), "value", "event_type",
                    "click", "view")
        .withColumnRenamed("n_a", "n_click")
        .withColumnRenamed("n_b", "n_view")),

    // Mann-Kendall monotonic-trend test per event type over the daily
    // activity series — "is this feed growing, decaying, or flat?"
    // without assuming linearity (the seasonal_decompose/cusum
    // companion for MONOTONIC drift). The corpus collapses first to the
    // calendar-bounded (type, day, count) grid; the O(days^2) pair join
    // and tie-corrected variance run on that grid with exact integer
    // counts, so S and var18 carry zero float drift; z is one
    // sqrt+divide, and the 5% two-sided verdict is applied to the
    // rounded z in both engines.
    "agg_mann_kendall" -> ((s, d) =>
      mannKendallOf(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // Theil-Sen robust trend line per event type over the daily count
    // series — HOW FAST is the feed moving (events/day), where
    // agg_mann_kendall only answers WHETHER it moves; the median of
    // pairwise slopes shrugs off the outlier days that would drag
    // agg_regression's OLS line. Pair expansion runs on the
    // calendar-bounded daily grid; both engines interpolate the median
    // identically from exact-int-derived slopes.
    "agg_theil_sen" -> ((s, d) =>
      theilSenOf(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // Kendall tau-b rank correlation per event type between daily
    // volume and daily distinct-user reach — is growth real users or a
    // shrinking set hammering harder? Outlier-proof where Pearson
    // (agg_corr_stats) is not; C-D and both tie terms are exact
    // integers on the calendar-bounded daily grid, one sqrt+divide
    // last.
    "agg_kendall_tau" -> ((s, d) =>
      kendallTauOf(Tables.events(s, d), "event_type", "ts", "user_id")
        .orderBy("event_type")),

    // Spearman rho per event type over the same daily volume/reach
    // grid as agg_kendall_tau — rank-linear association beside tau-b's
    // concordance and agg_corr_stats' value-linear Pearson. Average-tie
    // ranks are exact halves, so every moment sum is an exact
    // order-free double; one sqrt+divide last.
    "agg_spearman" -> ((s, d) =>
      spearmanOf(Tables.events(s, d), "event_type", "ts", "user_id")
        .orderBy("event_type")),

    // Herfindahl-Hirschman concentration of each nation's customer mix
    // over market segments — the category-concentration audit (corpus
    // domain mix, market share, sampling skew all share this shape).
    // One (nation, segment) hash-agg bounded by the domain product;
    // HHI / top-share / effective-category-count are single divisions
    // from exact int64 counts.
    "agg_hhi" -> ((s, d) =>
      hhiOf(Tables.customer(s, d), "c_nationkey", "c_mktsegment")
        .orderBy("c_nationkey")),

    // Median-absolute-deviation outlier screen — the ROBUST twin of
    // win_rolling_zscore's 3σ rule: median and MAD are unmoved by the
    // very outliers being hunted (a z-score's own μ/σ are contaminated
    // by them). Exact per-user median via percentile(0.5) (both engines
    // interpolate lower + frac·(upper−lower) identically), deviations
    // joined back on the SAME user_id partitioning (no extra shuffle
    // pattern: med/mad frames are user-dimension-sized), flag at the
    // standard 3·1.4826·MAD ≈ 3σ-equivalent threshold computed on
    // UNROUNDED values. Output is per-user (dimension-sized, not
    // per-event).
    "agg_mad_outliers" -> ((s, d) =>
      madOutliersOf(Tables.events(s, d)
          .filter(graft.Contract.finiteOrNull(col("value"))), // r19 fuzz: median over a REAL measure
        "user_id", "value")
        .orderBy("user_id")),

    // Market-basket association rules over order baskets — the classic
    // "bought A, also bought B" co-occurrence mining, and the same
    // pair-support computation recommender candidate generation starts
    // from. The basket frame dedups to (order, part) FIRST; pair
    // expansion is a SELF-JOIN CO-PARTITIONED ON THE BASKET KEY with
    // p_a < p_b, so pairs per order are bounded by basket size (≤ tens),
    // never corpus-quadratic; item supports broadcast back onto the
    // ≤|parts|² surviving pair table. support/confidence/lift are ratios
    // of exact integer counts in one literal expression order —
    // no float accumulation anywhere.
    "agg_association_rules" -> ((s, d) =>
      associationRulesOf(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
        minPairs = 3)
        .withColumnRenamed("item_a", "p_a")
        .withColumnRenamed("item_b", "p_b")
        .orderBy("p_a", "p_b")),

    // Spark 4's NATIVE bitmap aggregate family (bitmap_bucket_number /
    // bitmap_bit_position / bitmap_construct_agg / bitmap_or_agg /
    // bitmap_count) — the exact-distinct-at-scale pattern
    // agg_bitmap_distinct hand-rolls, as shipped builtins: keys bucket
    // into 32k-bit bitmap segments, per-(group, bucket) bitmaps build
    // map-side, counts sum by bucket-disjointness; the or_agg arm merges
    // the per-type bitmaps back into a global distinct — the mergeable
    // pre-aggregation shape (persist per-day bitmaps, OR at query time)
    // that makes exact distincts cheap at 100 TB. Oracle: plain COUNT
    // DISTINCT twice — same numbers, different machinery.
    "agg_bitmap_functions" -> ((s, d) => {
      val sub = Tables.events(s, d).selectExpr(
        "event_type",
        "bitmap_bucket_number(user_id) AS bkt",
        "bitmap_bit_position(user_id) AS pos")
        .groupBy("event_type", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      val perType = sub.groupBy("event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
      val global = sub.groupBy("bkt")
        .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("c"))
        .agg(sum("c").as("n_total"))
      perType.crossJoin(broadcast(global)).orderBy("event_type")
    }),

    // Decile lift table — the campaign-targeting / model-calibration
    // report (rank entities by score, cut into ten equal bands, compare
    // each band's response rate to the base rate): per-user score and
    // response collapse in ONE hash-agg; the decile index is EXPLICIT
    // integer arithmetic on (rank, n) — ((r-1)·10) div n + 1 — not SQL
    // NTILE, whose remainder placement is engine-defined; rates are
    // ratios of integer counts. Ranking runs the win_ntile_scalable
    // two-pass plan (range-bucket → bucket-stat offsets → local rank) —
    // no single-partition window even when users ARE the scaled
    // dimension (notes on decileLiftOf).
    "agg_decile_lift" -> ((s, d) => {
      val scored = Tables.events(s, d)
        .filter(graft.Contract.finiteOrNull(col("value"))) // r19 fuzz: DECIMAL score sum
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("score"),
             sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("np"))
        .select(col("user_id"), col("score"),
                (col("np") >= 14).cast("long").as("resp"))
      decileLiftOf(scored, "user_id", "score", "resp").orderBy("decile")
    }),

    "agg_benford" -> ((s, d) =>
      // measure-ingest guard (r19 fuzz): the cents-string digit is an
      // exact BIGINT derivation — NaN/Inf cannot cast (and DuckDB's
      // NaN > 0 is TRUE while Spark's is false, so the existing > 0
      // filter alone diverges); NULLs already drop at > 0
      benfordOf(Tables.orders(s, d)
                  .filter(graft.Contract.finiteOrNull(col("o_totalprice"))),
                "o_totalprice").orderBy("digit")),

    "agg_corr_stats" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: moment folds over a REAL measure
        .groupBy("o_orderpriority")
        .agg(
          round(corr(col("o_totalprice"), col("o_custkey")), 4).as("price_cust_corr"),
          round(covar_pop(col("o_totalprice"), col("o_custkey")), 2).as("cv_pop"),
          round(stddev_pop(col("o_totalprice")), 2).as("sd_pop"),
          round(var_pop(col("o_totalprice")), 2).as("v_pop"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Mergeable Datasketches HLL: per-(group, half) sketches unioned into a
    // per-group estimate. This is the 100 TB pre-aggregation pattern —
    // persist sketch BYTES per partition/day, merge at query time; no raw
    // re-scan, union cost ∝ #sketches. Estimate is algo-dependent ⇒ no
    // cross-engine oracle; OperatorSpec bounds it against exact
    // count-distinct and pins union-vs-direct consistency.
    "agg_sketch_union" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("half", pmod(col("event_id"), lit(2)).cast("int"))
        .groupBy("event_type", "half")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
             count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("approx_users"),
             sum("n").as("n_events"))
        .orderBy("event_type")
    }),

    // Time-decayed / windowed sketch maintenance (r19): the streaming-
    // freshness companion to agg_sketch_union. Per-DAY exact mergeable
    // distinct-user partials (the shipped bitmap sketch — the same
    // bucket/position machinery as agg_bitmap_functions) are built ONCE
    // in one map-side-combined hash-agg, then every output day merges
    // only its trailing windows of PARTIALS at query time:
    //   - rolling7_users: bitmap_or_agg over the trailing 7 days' bitmaps
    //     → exact windowed distinct, never a raw re-scan (merge cost ∝
    //     days × window, not corpus size — at 100 TB the per-day bitmaps
    //     persist and a day's refresh ORs 7 small bitmaps);
    //   - decayed_users: exponential half-life-1-day decay folded over
    //     the trailing 14 days' per-day distinct counts, Σ n_d / 2^(t−d).
    //     The weight is built by integer shiftleft so every term (and
    //     every partial sum: counts < 2^20, shift ≤ 13 ⇒ ≤ 34 significand
    //     bits) is EXACT in binary floating point — summation order
    //     cannot perturb the value, so the double hash-gates unrounded.
    // Day×day range joins run over the ~30-row AGGREGATED day frame
    // (broadcast), never over raw events.
    "agg_sketch_decay" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(date_trunc("DAY", col("ts")).as("day"), col("user_id"))
        .selectExpr("day",
          "bitmap_bucket_number(user_id) AS bkt",
          "bitmap_bit_position(user_id) AS pos")
        .groupBy("day", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .withColumn("di", datediff(col("day"), lit("2024-01-01").cast("date")))
      val counts = daily.groupBy("day", "di")
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      val days = counts.select(col("day"), col("di"))
      val roll = days.as("t")
        .join(broadcast(daily.as("p")),
              col("p.di").between(col("t.di") - 6, col("t.di")))
        .groupBy(col("t.day").as("day"), col("p.bkt"))
        .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("c"))
        .groupBy("day").agg(sum("c").as("rolling7_users"))
      val ndays = days.as("t")
        .join(broadcast(days.as("p")),
              col("p.di").between(col("t.di") - 6, col("t.di")))
        .groupBy(col("t.day").as("day"))
        .agg(count(lit(1)).cast("int").as("n_days"))
      val dec = days.as("t")
        .join(broadcast(counts.as("p")),
              col("p.di").between(col("t.di") - 13, col("t.di")))
        .groupBy(col("t.day").as("day"))
        .agg(sum(expr(
          "n_users / CAST(shiftleft(1L, t.di - p.di) AS DOUBLE)"))
          .as("decayed_users"))
      roll.join(dec, "day").join(ndays, "day")
        .select("day", "rolling7_users", "decayed_users", "n_days")
        .orderBy("day")
    }),

    // Theta-sketch set operations (Datasketches): the cardinality algebra
    // HLL cannot do — |A ∪ B|, |A ∩ B|, |A \ B| from mergeable per-set
    // sketches. The production shape: persist per-day/per-segment theta
    // bytes, answer "users who signed up but never errored" at query time
    // with no raw re-scan. Per-HALF sketches are theta_union_agg-merged
    // first (the mergeable path is the point), then combined. EXACTNESS
    // PRECONDITION (pinned in OperatorSpec): a theta sketch is exact below
    // its nominal capacity (lgK=12 ⇒ 4096) and the corpus has ≤1500
    // distinct users at every SF, so the estimates are exact integers and
    // the gate hash-matches DuckDB's exact distinct counts; beyond
    // capacity the same plan degrades to ±1.6 % estimates.
    "agg_theta_setops" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("graft_theta_events")
      s.sql("""
        WITH halves AS (
          SELECT event_type, pmod(event_id, 2) AS half,
                 theta_sketch_agg(user_id, 12) AS sk
          FROM graft_theta_events
          WHERE event_type IN ('signup', 'error')
          GROUP BY event_type, pmod(event_id, 2)),
        merged AS (
          SELECT event_type, theta_union_agg(sk, 12) AS sk
          FROM halves GROUP BY event_type),
        s AS (SELECT sk FROM merged WHERE event_type = 'signup'),
        e AS (SELECT sk FROM merged WHERE event_type = 'error')
        SELECT
          CAST(theta_sketch_estimate((SELECT sk FROM s)) AS BIGINT) AS n_signup,
          CAST(theta_sketch_estimate((SELECT sk FROM e)) AS BIGINT) AS n_error,
          CAST(theta_sketch_estimate(theta_union((SELECT sk FROM s), (SELECT sk FROM e), 12)) AS BIGINT) AS n_union,
          CAST(theta_sketch_estimate(theta_intersection((SELECT sk FROM s), (SELECT sk FROM e))) AS BIGINT) AS n_intersect,
          CAST(theta_sketch_estimate(theta_difference((SELECT sk FROM s), (SELECT sk FROM e))) AS BIGINT) AS n_signup_only
      """)
    }),

    // Datasketches frequent-items via approx_top_k, run at FULL capacity:
    // maxItemsTracked (100k) far exceeds the gram vocabulary, so the
    // sketch never evicts and the counts are exact — the same
    // exact-below-capacity gate pattern as agg_theta_setops; production
    // sizing (items ≫ capacity) degrades to guaranteed-error estimates.
    // Re-sorted by item so ties in count cannot reorder the output.
    "agg_approx_topk" -> ((s, d) => {
      val grams = Tables.documentsWide(s, d)
        .filter(length(col("text")) >= 4)
        .select(lower(col("text")).as("t"))
        .select(explode(expr(
          "transform(sequence(1, length(t) - 3), i -> substring(t, i, 4))")).as("g"))
      // k == maxItemsTracked (r19 fuzz): with k below the tracked
      // capacity a vocabulary crossing k made the returned set a
      // tie-order-unspecified top-k cut while the sketch itself was
      // still exact — returning everything tracked keeps the whole
      // result inside the exact-below-capacity contract at any gate SF
      // r20 (ADVICE r19): the exact-mode claim silently depends on the
      // vocabulary staying under capacity — a corpus crossing it would
      // surface as an opaque hash mismatch. The first cut of this guard
      // (r19) paid a SECOND full pass (explode + exact distinct) just to
      // count the vocabulary; the sketch's own output already carries
      // the same signal — below capacity it returns exactly one entry
      // per distinct gram, so a full 100000-entry result ⟺ the
      // vocabulary reached capacity. Guard IN-PLAN on the 1-row agg
      // output (guide §1.2: don't compute things twice): free below
      // capacity, fails NAMED at the crossing.
      grams.agg(expr("approx_top_k(g, 100000, 100000)").as("tk"))
        .filter(expr(
          """IF(size(tk) < 100000, true,
                raise_error('agg_approx_topk: distinct 4-gram vocabulary reached the exact-mode capacity 100000 — the sketch would evict and the result turn approximate; raise maxItemsTracked before trusting the gate'))"""))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("g"), col("e.count").as("cnt"))
        .orderBy("g")
    }),

    // Mergeable KLL quantile sketches per group, merged across halves.
    // EXACTNESS PRECONDITION (pinned in OperatorSpec): with k=65535 a KLL
    // sketch stays in exact mode until it holds more items than capacity;
    // every (returnflag) group is under that at the oracle SFs, so the
    // quantiles are exact discrete quantiles (bit-identical to DuckDB's
    // quantile_disc — verified) AND deterministic. Past capacity the same
    // plan answers with rank-error bounds but randomized compaction —
    // which is why the contract pins the exact regime and documents the
    // approximate one instead of hash-gating it.
    "agg_kll_quantiles" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_kll_lineitem")
      s.sql("""
        WITH halves AS (
          SELECT l_returnflag, pmod(l_orderkey, 2) AS half,
                 kll_sketch_agg_double(l_extendedprice, 65535) AS sk,
                 count(*) AS n
          FROM graft_kll_lineitem
          GROUP BY l_returnflag, pmod(l_orderkey, 2)),
        merged AS (
          -- kll_sketch_merge_double is a two-sketch scalar (not an agg):
          -- pair the two halves per group; exactly one non-null per arm
          SELECT l_returnflag,
                 kll_sketch_merge_double(
                   first(CASE WHEN half = 0 THEN sk END, true),
                   first(CASE WHEN half = 1 THEN sk END, true)) AS sk,
                 CAST(sum(n) AS BIGINT) AS n
          FROM halves GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round(kll_sketch_get_quantile_double(sk, 0.01), 2) AS q01,
               round(kll_sketch_get_quantile_double(sk, 0.5), 2) AS median,
               round(kll_sketch_get_quantile_double(sk, 0.9), 2) AS q90,
               round(kll_sketch_get_quantile_double(sk, 0.99), 2) AS q99
        FROM merged ORDER BY l_returnflag
      """)
    }),

    // Heavy hitters with an EXACT hash-gated answer from a sketch-first
    // plan: pass 1 = Misra–Gries (k=256) + total count in ONE aggregation
    // over the char-4-gram stream (map-side partials of ≤k counters, the
    // shuffle carries k rows per partition — never the full gram
    // cardinality); pass 2 = exact counts restricted to the ≤k candidates
    // via a broadcast semi-join (shuffle ≤k distinct keys). MG guarantees
    // candidates ⊇ {freq > n/(k+1)} ⊇ {freq > n/k}, so the exact pass's
    // `cnt*k > n` filter yields precisely the true heavy-hitter set — the
    // 100 TB shape for "top substrings/URLs/tokens" where a full groupBy
    // would shuffle billions of distinct keys to find a few hundred.
    "agg_heavy_hitters" -> ((s, d) => {
      val grams = Tables.documentsWide(s, d)
        .filter(length(col("text")) >= 4)
        .select(lower(col("text")).as("t"))
        .select(explode(expr(
          "transform(sequence(1, length(t) - 3), i -> substring(t, i, 4))")).as("g"))
      heavyHittersOf(grams, "g").orderBy("g")
    }),

    // Count–min sketch: the classic mergeable frequency sketch (bounded
    // memory, overestimate-only error) — [[CmsDepth]]×[[CmsWidth]] cells
    // over lineitem's part-key stream, then point estimates est(x) =
    // min_j cell(j, h_j(x)) for the 20 lowest part keys next to their
    // true counts (the overestimate invariant est ≥ truth is
    // PropertySpec-pinned). Build cost: the depth-way explode combines
    // map-side to depth×width cells per partition before ONE exchange of
    // a 256-row frame — the sketch, like all the D-family sketches, is
    // what you ship when the true per-key count table is corpus-sized.
    // h_j is the repo's md5-fold (oracle-parity hash; production would
    // swap xxhash64 exactly like the TextHash flag family).
    "agg_count_min" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"))
      val cells = countMinCellsOf(li, "l_partkey", CmsDepth, CmsWidth)
      val truth = li.filter(col("l_partkey") <= 20)
        .groupBy("l_partkey").agg(count(lit(1)).as("true_n"))
      countMinEstimateOf(cells, truth, "l_partkey", CmsDepth, CmsWidth)
        .join(truth, "l_partkey")
        .select(col("l_partkey"), col("true_n"), col("cms_est"))
        .orderBy("l_partkey")
    }),

    // Bloom-filter membership: the OTHER classic bounded-memory set
    // structure (no false negatives, tunable false positives) — build an
    // explicit [[BloomK]]×[[BloomBits]] bit set over "big-urgent"
    // customers (URGENT order > 450k), then probe EVERY customer and emit
    // the bloom verdict next to ground truth. The bit set is (j, bit)
    // rows after a distinct — ≤ k·m rows at ANY scale, the shape you
    // broadcast to pre-filter a 100 TB probe stream before the exact
    // join (Spark's own runtime bloom join — opt_runtime_bloom_join — is
    // the optimizer-injected twin; this key is the explicit, mergeable,
    // cross-engine-checkable spelling). PropertySpec pins the
    // no-false-negative invariant. Same md5-fold hash family as
    // agg_count_min.
    "agg_bloom_membership" -> ((s, d) => {
      val members = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
                col("o_totalprice") > 450000.0)
        .select(col("o_custkey").as("k")).distinct()
      val bits = bloomBitsOf(members, "k", BloomK, BloomBits)
      val probes = Tables.customer(s, d).select(col("c_custkey"))
      probes
        .join(members, col("c_custkey") === col("k"), "left")
        .select(col("c_custkey"),
                when(col("k").isNotNull, lit(1)).otherwise(lit(0)).as("in_set"))
        .join(bloomProbeOf(bits, probes, "c_custkey", BloomK, BloomBits),
              "c_custkey")
        .select(col("c_custkey"), col("in_set"), col("bloom_hit"))
        .orderBy("c_custkey")
    }),

    // Fixed-width histogram: bin id is pure row-local arithmetic, so the
    // whole key is ONE map-side-combinable hash aggregate whose output is
    // bounded by the bin count (~dozens of rows at any scale) — the
    // distribution-profiling primitive that precedes any skew decision.
    // Static bin edges (width 50k from 0) keep the binning independent of
    // a min/max pre-pass.
    "agg_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: BIGINT bin derivation
        .groupBy(floor(col("o_totalprice") / 50000.0).as("bin"))
        .agg(count(lit(1)).as("n"),
             round(avg("o_totalprice"), 2).as("avg_price"))
        .withColumn("lo", (col("bin") * 50000.0).cast("double"))
        .select("bin", "lo", "n", "avg_price")
        .orderBy("bin")),

    // Weighted median: smallest value whose cumulative weight (RANGE
    // frame — all value-peers included, so the cumsum is order-independent
    // within ties) reaches half the group's total. Quantities are
    // integer-valued doubles ⇒ both cumulative and total sums are EXACT in
    // double arithmetic, so the >= boundary cannot flip between engines.
    // One user-partitioned window + one agg — the exact-quantile shape
    // for grouped data that sorts once per group and never collects.
    "agg_weighted_median" -> ((s, d) => {
      val wCum = Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .withColumn("cum", sum("l_quantity").over(wCum))
        .withColumn("total", sum("l_quantity").over(wAll))
        .filter(col("cum") >= col("total") / 2)
        .groupBy("l_returnflag")
        .agg(min("l_extendedprice").as("w_median"))
        .orderBy("l_returnflag")
    }),

    // Higher-moment distribution shape per group — population skewness
    // (m3/m2^1.5) and excess kurtosis (m4/m2² − 3): the one-pass tail
    // diagnostic that tells you WHICH way a column is skewed before you
    // pick a salting/partitioning strategy. Spark's implementations are
    // single-pass streaming central-moment updates (Pébay's mergeable
    // formulas — exactly what map-side combine needs); the oracle
    // reconstructs the same population moments in two explicit passes.
    "agg_skew_kurtosis" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: moment folds
        .groupBy("o_orderpriority")
        .agg(round(skewness(col("o_totalprice")), 4).as("skew"),
             round(kurtosis(col("o_totalprice")), 4).as("kurt"),
             count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // Geometric mean via log-domain aggregation — exp(avg(ln x)): the
    // numerically stable product aggregate (a direct product over 100 TB
    // of rows over/underflows doubles within one partition). All prices
    // are strictly positive, so ln is total; 2dp rounding absorbs the
    // ~1e-9 relative reassociation noise exp re-amplifies.
    "agg_geomean" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(exp(avg(log(col("l_extendedprice")))), 2).as("geomean"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag"))
  ))

  val oracle: Map[String, String] = graft.Contract.uniqueMap("AggOps.oracle", Seq(
    // The identical 4×64 md5-fold sketch built in SQL: hex→int via the
    // '0x' cast (DuckDB has no conv()); both engines hash the same
    // "j:key" strings, so cells and estimates are bit-identical.
    "agg_count_min" -> s"""
      WITH cells AS (
        SELECT j,
               ('0x' || substring(md5(l_partkey::VARCHAR),
                                  1 + 6 * j, 6))::BIGINT % $CmsWidth AS bucket,
               count(*) AS c
        FROM lineitem, range(0, $CmsDepth) t(j)
        GROUP BY 1, 2),
      truth AS (
        SELECT l_partkey, count(*) AS true_n FROM lineitem
        WHERE l_partkey <= 20 GROUP BY l_partkey),
      probes AS (
        SELECT t.l_partkey, t.true_n, r.j,
               ('0x' || substring(md5(t.l_partkey::VARCHAR),
                                  1 + 6 * r.j, 6))::BIGINT % $CmsWidth AS bucket
        FROM truth t, range(0, $CmsDepth) r(j))
      SELECT p.l_partkey, p.true_n, min(c.c) AS cms_est
      FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
      GROUP BY p.l_partkey, p.true_n
      ORDER BY p.l_partkey""",

    // The identical k×m bit set in SQL; the left join + k-count is the
    // AND over hash bits.
    "agg_bloom_membership" -> s"""
      WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000.0),
      bits AS (
        SELECT DISTINCT j,
               ('0x' || substring(md5(j::VARCHAR || ':' || k::VARCHAR),
                                  1, 6))::BIGINT % $BloomBits AS bit
        FROM members, range(0, $BloomK) t(j)),
      probes AS (
        SELECT c_custkey, r.j,
               ('0x' || substring(md5(r.j::VARCHAR || ':' ||
                                      c_custkey::VARCHAR),
                                  1, 6))::BIGINT % $BloomBits AS bit
        FROM customer, range(0, $BloomK) r(j)),
      hitc AS (
        SELECT p.c_custkey,
               sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nbits
        FROM probes p LEFT JOIN bits b ON b.j = p.j AND b.bit = p.bit
        GROUP BY p.c_custkey)
      SELECT c.c_custkey,
             CAST(CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS in_set,
             CAST(CASE WHEN h.nbits = $BloomK THEN 1 ELSE 0 END AS INT)
               AS bloom_hit
      FROM customer c
      LEFT JOIN members m ON c.c_custkey = m.k
      JOIN hitc h ON h.c_custkey = c.c_custkey
      ORDER BY c.c_custkey""",

    // DuckDB floor() yields DOUBLE (Spark's yields LONG) — cast the bin id.
    "agg_histogram" -> """
      SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
             CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS lo,
             count(*) AS n,
             round(avg(o_totalprice), 2) AS avg_price
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY 1, 2
      ORDER BY bin NULLS FIRST""",

    // Same RANGE-frame cumulative-weight derivation; integer-valued
    // weights keep both sums exact.
    "agg_weighted_median" -> """
      WITH c AS (
        SELECT l_returnflag, l_extendedprice,
               sum(l_quantity) OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(l_quantity) OVER (PARTITION BY l_returnflag) AS total
        FROM lineitem)
      SELECT l_returnflag, min(l_extendedprice) AS w_median
      FROM c WHERE cum >= total / 2
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // DuckDB's skewness/kurtosis are SAMPLE-corrected — reconstruct
    // Spark's population definitions from explicit centered moments.
    "agg_skew_kurtosis" -> """
      WITH oo AS (
        SELECT o_orderpriority, o_totalprice FROM orders
        WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))),
      mu AS (
        SELECT o_orderpriority AS g, avg(o_totalprice) AS m
        FROM oo GROUP BY 1),
      c AS (
        SELECT g,
               avg(pow(o_totalprice - m, 2)) AS m2,
               avg(pow(o_totalprice - m, 3)) AS m3,
               avg(pow(o_totalprice - m, 4)) AS m4,
               count(*) AS n
        FROM oo JOIN mu ON o_orderpriority IS NOT DISTINCT FROM g
        GROUP BY g)
      SELECT g AS o_orderpriority,
             round(m3 / pow(m2, 1.5), 4) AS skew,
             round(m4 / pow(m2, 2) - 3, 4) AS kurt,
             n
      FROM c ORDER BY o_orderpriority NULLS FIRST""",

    "agg_geomean" -> """
      SELECT l_returnflag,
             round(exp(avg(ln(l_extendedprice))), 2) AS geomean,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // DuckDB spells the pair arg_max/arg_min; same unique ordering value.
    "agg_max_by" -> """
      SELECT o_orderpriority,
             arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-6) AS priciest_key,
             arg_min(o_orderkey, o_totalprice + o_orderkey * 1e-6) AS cheapest_key,
             round(max(o_totalprice), 2) AS max_price,
             round(min(o_totalprice), 2) AS min_price
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    "agg_bool_logic" -> """
      SELECT o_orderstatus,
             bool_and(o_totalprice > 1000.0) AS all_over_1k,
             bool_or(o_totalprice > 400000.0) AS any_over_400k,
             CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
             bool_and(o_custkey >= 0) AS keys_nonneg,
             count(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "agg_regression" -> """
      SELECT o_orderpriority,
             round(regr_slope(o_totalprice, o_custkey), 4) AS slope,
             round(regr_intercept(o_totalprice, o_custkey), 2) AS intercept,
             round(regr_r2(o_totalprice, o_custkey), 6) AS r2,
             CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS n,
             round(regr_avgx(o_totalprice, o_custkey), 4) AS avg_x,
             round(regr_avgy(o_totalprice, o_custkey), 2) AS avg_y
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    // Bitmaps are plumbing, not semantics — exactness is the claim, so the
    // oracle is the plain distinct count.
    "agg_bitmap_distinct" -> """
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    // Same ranked-moment formula; DuckDB sums of DECIMAL×BIGINT are exact
    // like Spark's, the final expression is literal-identical doubles.
    "agg_benford" -> """
      WITH dig AS (
        SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
        -- isfinite required explicitly: DuckDB's NaN > 0 is TRUE
        FROM orders WHERE o_totalprice > 0 AND isfinite(o_totalprice)),
      c AS (SELECT digit, count(*) AS n FROM dig GROUP BY 1),
      t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM c)
      SELECT digit, n,
             round(CAST(n AS DOUBLE) / total, 4) AS observed,
             round(log10(1.0 + 1.0 / digit), 4) AS expected
      FROM t ORDER BY digit""",

    // The oracle states the SEMANTICS (exact distinct counts); the key's
    // bitmap machinery must land on the same integers.
    "agg_bitmap_functions" -> """
      WITH pt AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events GROUP BY 1),
      g AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
            FROM events)
      SELECT pt.event_type, pt.n_distinct, g.n_total
      FROM pt CROSS JOIN g
      ORDER BY pt.event_type NULLS FIRST""",

    // Exact restatement of the windowed/decayed sketch maintenance: the
    // rolling distinct re-derives from raw events (count DISTINCT over the
    // trailing-7-day join — same integers as the bitmap-OR merge), the
    // decay folds the same shiftleft-exact weights over per-day distinct
    // counts (every term and partial sum exact in binary ⇒ the DOUBLE
    // hash-gates unrounded, summation order irrelevant).
    "agg_sketch_decay" -> """
      WITH e AS (
        SELECT date_trunc('day', ts) AS day, user_id,
               date_diff('day', DATE '2024-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di
        FROM events),
      days AS (SELECT DISTINCT day, di FROM e),
      daily AS (
        SELECT day, di, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM e GROUP BY 1, 2),
      roll AS (
        SELECT t.day AS day,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS rolling7_users
        FROM days t JOIN e ON e.di BETWEEN t.di - 6 AND t.di
        GROUP BY 1),
      nd AS (
        SELECT t.day AS day, CAST(count(*) AS INTEGER) AS n_days
        FROM days t JOIN days p ON p.di BETWEEN t.di - 6 AND t.di
        GROUP BY 1),
      dec AS (
        SELECT t.day AS day,
               sum(p.n_users / CAST(1::BIGINT << (t.di - p.di) AS DOUBLE))
                 AS decayed_users
        FROM days t JOIN daily p ON p.di BETWEEN t.di - 13 AND t.di
        GROUP BY 1)
      SELECT roll.day, roll.rolling7_users, dec.decayed_users, nd.n_days
      FROM roll JOIN dec USING (day) JOIN nd USING (day)
      ORDER BY day""",

    // Same explicit ((r-1)*10)//n + 1 decile index (NOT NTILE — its
    // remainder placement is engine-defined), same integer-count rates.
    "agg_decile_lift" -> """
      WITH u AS (
        SELECT user_id,
               sum(CAST(value AS DECIMAL(18,2))) AS score,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS resp
        FROM events
        WHERE (value IS NULL OR isfinite(value))
        GROUP BY 1),
      r AS (
        SELECT user_id, resp,
               row_number() OVER (ORDER BY score DESC, user_id ASC) AS r,
               count(*) OVER () AS n,
               CAST(sum(resp) OVER () AS BIGINT) AS base
        FROM u),
      d AS (
        SELECT CAST((r - 1) * 10 // n + 1 AS INTEGER) AS decile, resp,
               base, n
        FROM r)
      SELECT decile,
             count(*) AS n_users,
             CAST(sum(resp) AS BIGINT) AS n_resp,
             round(CAST(sum(resp) AS DOUBLE) / count(*), 4) AS resp_rate,
             CASE WHEN max(base) > 0 THEN
               round((CAST(sum(resp) AS DOUBLE) / count(*))
                     / (CAST(max(base) AS DOUBLE) / max(n)), 4)
             END AS lift
      FROM d GROUP BY decile
      ORDER BY decile""",

    // Pure integer-count ratios in one literal expression order; DuckDB
    // count(*) needs no HUGEINT cast but the products do BIGINT casts to
    // match Spark's long arithmetic.
    "agg_association_rules" -> """
      WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
      item AS (SELECT l_partkey AS pi, count(*) AS ni FROM b GROUP BY 1),
      pairs AS (
        SELECT x.l_partkey AS p_a, y.l_partkey AS p_b, count(*) AS n_pair
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p_a, p_b, n_pair,
             round(CAST(n_pair AS DOUBLE) / n_orders, 6) AS support,
             round(CAST(n_pair AS DOUBLE) / ia.ni, 4) AS confidence,
             round(CAST(n_pair * n_orders AS DOUBLE) / (ia.ni * ib.ni), 4)
               AS lift
      FROM pairs
      JOIN item ia ON ia.pi = p_a
      JOIN item ib ON ib.pi = p_b
      CROSS JOIN n
      ORDER BY p_a, p_b""",

    // Same sorted-count-list fold (list(... ORDER BY event_type) ==
    // Spark's sort_array) so the non-associative double sum runs in the
    // identical order; DuckDB sum(BIGINT) is HUGEINT → cast.
    "agg_entropy" -> """
      WITH c AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS INTEGER) AS n_types,
               list(c ORDER BY event_type) AS cs
        FROM c GROUP BY 1)
      SELECT user_id, n, n_types,
             round(list_sum(list_transform(cs,
               x -> -(CAST(x AS DOUBLE) / n) * log2(CAST(x AS DOUBLE) / n))),
               4) AS entropy_bits
      FROM g ORDER BY user_id NULLS FIRST""",

    // Integer cumulative counts over the distinct-value grid — the max
    // |ECDF gap| is one division per cell, no double accumulation.
    "agg_ks_test" -> """
      WITH c AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) AS cb
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        GROUP BY value),
      e AS (
        SELECT CAST(sum(ca) OVER w AS BIGINT) AS cuma,
               CAST(sum(cb) OVER w AS BIGINT) AS cumb,
               CAST(sum(ca) OVER () AS BIGINT) AS na,
               CAST(sum(cb) OVER () AS BIGINT) AS nb
        FROM c
        WINDOW w AS (ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT max(na) AS n_click, max(nb) AS n_view,
             round(max(abs(CAST(cuma AS DOUBLE) / na
                           - CAST(cumb AS DOUBLE) / nb)), 4) AS ks_d
      FROM e""",

    // Same sorted cell-list fold as the Spark side (list ORDER BY
    // (lang, source) == sort_array of the struct) — bit-stable χ² sum.
    "agg_chi_square" -> """
      WITH cells AS (
        SELECT lang, source, count(*) AS c
        FROM documents GROUP BY 1, 2),
      m AS (
        SELECT cells.lang, cells.source, cells.c,
               CAST(rl.rl AS BIGINT) AS rl, CAST(cs.cs AS BIGINT) AS cs,
               CAST(t.n AS BIGINT) AS n
        FROM cells
        JOIN (SELECT lang, sum(c) AS rl FROM cells GROUP BY 1) rl USING (lang)
        JOIN (SELECT source, sum(c) AS cs FROM cells GROUP BY 1) cs USING (source)
        CROSS JOIN (SELECT sum(c) AS n FROM cells) t),
      l AS (
        SELECT CAST(count(*) AS INTEGER) AS n_cells,
               CAST((count(DISTINCT lang) - 1)
                    * (count(DISTINCT source) - 1) AS INTEGER) AS dof,
               list(struct_pack(c := c, rl := rl, cs := cs, n := n)
                    ORDER BY lang, source) AS cl
        FROM m)
      SELECT n_cells, dof,
             round(list_sum(list_transform(cl,
               x -> pow(CAST(x.c AS DOUBLE)
                        - CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                          / CAST(x.n AS DOUBLE), 2)
                    / (CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                       / CAST(x.n AS DOUBLE)))), 4) AS chi2
      FROM l""",

    // Exact-integer S and tie-corrected var18 over the (type, day,
    // count) grid; z is one sqrt+divide and the 1.96 verdict reads the
    // ROUNDED z, matching the Spark side.
    "agg_mann_kendall" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      s AS (
        SELECT a.g, CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day
        GROUP BY a.g),
      n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1),
      ties AS (
        SELECT g, CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie18
        FROM (SELECT g, c, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY g),
      j AS (
        SELECT n.g, n.n_days, s.s_stat,
               CAST(n.n_days * (n.n_days - 1) * (n.n_days * 2 + 5)
                    - ties.tie18 AS BIGINT) AS var18
        FROM n JOIN s ON n.g = s.g JOIN ties ON n.g = ties.g),
      z AS (
        SELECT g, n_days, s_stat, var18,
               round(CASE
                 WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                 WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                      / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                 ELSE 0.0 END, 4) AS z
        FROM j)
      SELECT g AS event_type, n_days, s_stat, var18, z,
             CASE WHEN z > 1.96 THEN 'increasing'
                  WHEN z < -1.96 THEN 'decreasing'
                  ELSE 'none' END AS trend
      FROM z ORDER BY event_type""",

    // Same sorted cell-list fold as the agg_chi_square oracle, plus n
    // and the V = sqrt(chi2/(n*min(r-1,c-1))) rollup; strength reads
    // the rounded V.
    "agg_cramers_v" -> """
      WITH cells AS (
        SELECT lang, source, count(*) AS c
        FROM documents GROUP BY 1, 2),
      m AS (
        SELECT cells.lang, cells.source, cells.c,
               CAST(rl.rl AS BIGINT) AS rl, CAST(cs.cs AS BIGINT) AS cs,
               CAST(t.n AS BIGINT) AS n
        FROM cells
        JOIN (SELECT lang, sum(c) AS rl FROM cells GROUP BY 1) rl USING (lang)
        JOIN (SELECT source, sum(c) AS cs FROM cells GROUP BY 1) cs USING (source)
        CROSS JOIN (SELECT sum(c) AS n FROM cells) t),
      l AS (
        SELECT CAST(count(*) AS INTEGER) AS n_cells,
               CAST(count(DISTINCT lang) AS INTEGER) AS ra,
               CAST(count(DISTINCT source) AS INTEGER) AS cb,
               CAST(max(n) AS BIGINT) AS n,
               list(struct_pack(c := c, rl := rl, cs := cs, n := n)
                    ORDER BY lang, source) AS cl
        FROM m),
      r AS (
        SELECT n, n_cells, CAST((ra - 1) * (cb - 1) AS INTEGER) AS dof,
               ra, cb,
               list_sum(list_transform(cl,
                 x -> pow(CAST(x.c AS DOUBLE)
                          - CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                            / CAST(x.n AS DOUBLE), 2)
                      / (CAST(x.rl AS DOUBLE) * CAST(x.cs AS DOUBLE)
                         / CAST(x.n AS DOUBLE)))) AS chi2raw
        FROM l),
      v AS (
        SELECT n, n_cells, dof, round(chi2raw, 4) AS chi2,
               round(CASE WHEN least(ra - 1, cb - 1) > 0
                 THEN sqrt(chi2raw
                           / CAST(n * least(ra - 1, cb - 1) AS DOUBLE))
                 ELSE 0.0 END, 4) AS cramers_v
        FROM r)
      SELECT n, n_cells, dof, chi2, cramers_v,
             CASE WHEN cramers_v < 0.1 THEN 'negligible'
                  WHEN cramers_v < 0.3 THEN 'weak'
                  WHEN cramers_v < 0.5 THEN 'moderate'
                  ELSE 'strong' END AS strength
      FROM v""",

    // Exact-integer doubled rank sum / U / tie term over the
    // distinct-value grid; the tie-corrected sigma^2 and z match the
    // Spark side's operation order term for term.
    "agg_mann_whitney" -> """
      WITH grid AS (
        SELECT value,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        GROUP BY value),
      g2 AS (
        SELECT ca, cb, ca + cb AS nv,
               CAST(coalesce(sum(ca + cb) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS prev
        FROM grid),
      s AS (
        SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb,
               CAST(sum(ca * (prev * 2 + nv + 1)) AS BIGINT) AS r2a,
               CAST(sum(nv * nv * nv - nv) AS BIGINT) AS tsum
        FROM g2),
      k AS (
        SELECT na, nb, na + nb AS n,
               r2a - na * (na + 1) AS u2, tsum
        FROM s),
      f AS (
        SELECT na, nb, u2,
               (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                 * (CAST(n + 1 AS DOUBLE)
                    - CAST(tsum AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)) AS sigma2
        FROM k)
      SELECT na AS n_click, nb AS n_view,
             CAST(u2 AS DOUBLE) / 2.0 AS u_a, z,
             abs(z) > 1.96 AS significant
      FROM (
        SELECT na, nb, u2,
               round(CASE WHEN sigma2 > 0.0
                 THEN CAST(u2 - na * nb AS DOUBLE) / (sqrt(sigma2) * 2.0)
                 ELSE 0.0 END, 4) AS z
        FROM f)""",

    // Pairwise slopes from exact ints; quantile_cont == Spark's
    // percentile interpolation; x = epoch days in both engines.
    "agg_theil_sen" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      sl AS (
        SELECT a.g,
               CAST(b.c - a.c AS DOUBLE)
                 / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS m
        FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day),
      fit AS (
        SELECT g, quantile_cont(m, 0.5) AS m,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM sl GROUP BY g),
      ic AS (
        SELECT d.g, fit.n_pairs, fit.m,
               CAST(d.c AS DOUBLE) - fit.m
                 * CAST(date_diff('day', DATE '1970-01-01', d.day)
                        AS DOUBLE) AS b0
        FROM daily d JOIN fit ON d.g = fit.g),
      f AS (
        SELECT g, n_pairs, m, CAST(count(*) AS BIGINT) AS n_days,
               quantile_cont(b0, 0.5) AS b0
        FROM ic GROUP BY g, n_pairs, m)
      SELECT g AS event_type, n_days, n_pairs,
             round(m, 4) AS slope, round(b0, 4) AS intercept
      FROM f ORDER BY event_type""",

    // Exact-integer C-D and tie terms over the daily grid; sign() and
    // the final sqrt+divide mirror the Spark side.
    "agg_kendall_tau" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x,
               CAST(count(DISTINCT user_id) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      cd AS (
        SELECT a.g,
               CAST(sum(sign(b.x - a.x) * sign(b.y - a.y)) AS BIGINT) AS cd
        FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day
        GROUP BY a.g),
      n AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1),
      tx AS (
        SELECT g, CAST(sum(t * (t - 1)) AS BIGINT) AS n1x2
        FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2) GROUP BY g),
      ty AS (
        SELECT g, CAST(sum(t * (t - 1)) AS BIGINT) AS n2x2
        FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2) GROUP BY g),
      j AS (
        SELECT n.g, n.n_days, cd.cd,
               CAST(n.n_days * (n.n_days - 1) // 2 AS BIGINT) AS n0,
               CAST(tx.n1x2 // 2 AS BIGINT) AS n1,
               CAST(ty.n2x2 // 2 AS BIGINT) AS n2
        FROM n JOIN cd ON n.g = cd.g
               JOIN tx ON n.g = tx.g JOIN ty ON n.g = ty.g)
      SELECT g AS event_type, n_days, cd, n0, n1, n2,
             round(CASE WHEN (n0 - n1) * (n0 - n2) > 0
               THEN CAST(cd AS DOUBLE)
                    / sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))
               ELSE 0.0 END, 4) AS tau
      FROM j ORDER BY event_type""",

    // rank() + same-value count windows give the identical average-tie
    // ranks; the moment sums are exact doubles, so any evaluation order
    // agrees bit-for-bit.
    "agg_spearman" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS x,
               CAST(count(DISTINCT user_id) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT g,
               CAST(rank() OVER (PARTITION BY g ORDER BY x) AS DOUBLE)
                 + CAST(count(*) OVER (PARTITION BY g, x) - 1 AS DOUBLE)
                   / 2.0 AS rx,
               CAST(rank() OVER (PARTITION BY g ORDER BY y) AS DOUBLE)
                 + CAST(count(*) OVER (PARTITION BY g, y) - 1 AS DOUBLE)
                   / 2.0 AS ry
        FROM daily),
      m AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n_days,
               sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
               sum(rx * ry) AS sxy
        FROM r GROUP BY g)
      SELECT g AS event_type, n_days,
             round(CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0.0
                         AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0.0
               THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                    / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                           * (CAST(n_days AS DOUBLE) * syy - sy * sy))
               ELSE 0.0 END, 4) AS rho
      FROM m ORDER BY event_type NULLS FIRST""",

    // Single divisions from exact int64 counts over the
    // (nation, segment) grid.
    "agg_hhi" -> """
      WITH c AS (
        SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS c
        FROM customer GROUP BY 1, 2),
      g AS (
        SELECT c_nationkey,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_cats,
               CAST(sum(c * c) AS BIGINT) AS sq,
               CAST(max(c) AS BIGINT) AS mx
        FROM c GROUP BY 1)
      SELECT c_nationkey, n_rows, n_cats,
             round(CAST(sq AS DOUBLE)
                   / CAST(n_rows * n_rows AS DOUBLE), 4) AS hhi,
             round(CAST(mx AS DOUBLE) / CAST(n_rows AS DOUBLE), 4)
               AS top_share,
             round(CAST(n_rows * n_rows AS DOUBLE)
                   / CAST(sq AS DOUBLE), 4) AS eff_cats
      FROM g ORDER BY c_nationkey""",

    // quantile_cont == Spark's percentile (lower + frac·(upper−lower));
    // the outlier threshold compares UNROUNDED med/mad exactly like the
    // Spark side.
    "agg_mad_outliers" -> """
      WITH ev AS (
        SELECT user_id, value FROM events
        WHERE (value IS NULL OR isfinite(value))),
      med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM ev GROUP BY 1),
      dev AS (
        SELECT e.user_id, abs(e.value - med.med) AS dev, med.med
        FROM ev e JOIN med USING (user_id)),
      mad AS (
        SELECT user_id, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT dev.user_id, count(*) AS n,
             round(any_value(dev.med), 4) AS median,
             round(any_value(mad.mad), 4) AS mad,
             CAST(sum(CASE WHEN mad.mad > 0
                            AND dev.dev > 3.0 * 1.4826 * mad.mad
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev JOIN mad USING (user_id)
      GROUP BY dev.user_id
      ORDER BY dev.user_id""",

    "agg_gini" -> """
      WITH r AS (
        SELECT o_orderpriority,
               CAST(o_totalprice AS DECIMAL(18,2)) AS xd,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                 -- NULLS FIRST matches Spark's asc default (r21 fuzz):
                 -- NULL-price rows shift every real row's rank i, so the
                 -- two engines must rank them on the same side
                 ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC) AS BIGINT) AS i
        FROM orders
        WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))),
      m AS (
        SELECT o_orderpriority, count(*) AS n,
               sum(xd) AS sx, sum(xd * i) AS six
        FROM r GROUP BY 1)
      SELECT o_orderpriority, n,
             round((2 * CAST(six AS DOUBLE)
                    - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
                   / nullif(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6) AS gini
      FROM m ORDER BY o_orderpriority NULLS FIRST""",

    // Same md5-byte ladder, same DECIMAL resample sums, same order-stat
    // CI — the ladder is the DEFINED scheme, so both engines draw the
    // same 32 resamples.
    "agg_bootstrap_ci" -> """
      WITH pre AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS xd,
               md5('a:' || o_orderkey::VARCHAR) AS h1,
               md5('b:' || o_orderkey::VARCHAR) AS h2
        FROM orders
        WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))),
      rb AS (
        SELECT xd, b,
               ('0x' || substring(CASE WHEN b < 16 THEN h1 ELSE h2 END,
                                  (b % 16) * 2 + 1, 2))::BIGINT AS byte
        FROM pre, (SELECT unnest(range(0, 32)) AS b) t),
      wt AS (
        SELECT xd, b,
               CASE WHEN byte < 94 THEN 0 WHEN byte < 188 THEN 1
                    WHEN byte < 235 THEN 2 WHEN byte < 251 THEN 3
                    WHEN byte < 255 THEN 4 ELSE 5 END AS w
        FROM rb),
      m AS (SELECT b, CAST(sum(xd * w) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
            FROM wt WHERE w > 0 GROUP BY b),
      s AS (SELECT list_sort(list(m)) AS ms, count(*) AS n, avg(m) AS am FROM m)
      SELECT CAST(n AS BIGINT) AS n_resamples,
             round(ms[2], 4) AS ci_lo,
             round(ms[31], 4) AS ci_hi,
             round(am, 4) AS boot_mean
      FROM s""",

    // DuckDB's grouping(a, b) returns the same MSB-first level bitmask as
    // Spark's grouping_id().
    "agg_grouping_id" -> """
      SELECT o_orderpriority, o_orderstatus,
             CASE grouping(o_orderpriority, o_orderstatus)
                  WHEN 0 THEN 'detail'
                  WHEN 1 THEN 'priority_subtotal'
                  ELSE 'grand_total' END AS level,
             CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
             CAST(grouping(o_orderpriority) AS INTEGER) AS g_pri,
             CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
             count(*) AS n
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""",

    // Same DECIMAL sufficient statistics, same literal double arithmetic.
    // Spark count(CASE…) ignores the ELSE-NULL rows exactly like DuckDB's
    // count(CASE…); both sums are DECIMAL-exact before the DOUBLE cast.
    "agg_ab_ttest" -> """
      WITH m AS (
        SELECT
          count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_a,
          CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sx_a,
          CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sxx_a,
          count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_b,
          CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sx_b,
          CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sxx_b
        FROM orders
        WHERE (o_totalprice IS NULL OR isfinite(o_totalprice)))
      SELECT n_a, n_b,
             round(sx_a / nullif(n_a, 0), 4) AS mean_a,
             round(sx_b / nullif(n_b, 0), 4) AS mean_b,
             round((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0), 2) AS var_a,
             round((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0), 2) AS var_b,
             round((sx_a / nullif(n_a, 0) - sx_b / nullif(n_b, 0)) /
               nullif(sqrt(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a
                  + ((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b), 0), 4) AS t_stat,
             round(pow(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a
                     + ((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b, 2) /
               nullif(pow(((sxx_a - sx_a * sx_a / nullif(n_a, 0)) / nullif(n_a - 1, 0)) / n_a, 2) / nullif(n_a - 1, 0)
              + pow(((sxx_b - sx_b * sx_b / nullif(n_b, 0)) / nullif(n_b - 1, 0)) / n_b, 2) / nullif(n_b - 1, 0), 0), 2)
             AS welch_df
      FROM m""",

    "agg_corr_stats" -> """
      SELECT o_orderpriority,
             round(corr(o_totalprice, o_custkey), 4) AS price_cust_corr,
             round(covar_pop(o_totalprice, o_custkey), 2) AS cv_pop,
             round(stddev_pop(o_totalprice), 2) AS sd_pop,
             round(var_pop(o_totalprice), 2) AS v_pop,
             count(*) AS n
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    // Same explicit deterministic-mode derivation; median interpolates on
    // doubles in both engines.
    "agg_mode_median" -> """
      WITH c AS (
        SELECT l_returnflag, l_quantity, count(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT l_returnflag, l_quantity,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity ASC) AS rn
        FROM c),
      m AS (
        SELECT l_returnflag, median(l_quantity) AS med_qty, count(*) AS n
        FROM lineitem GROUP BY 1)
      SELECT m.l_returnflag, m.med_qty, r.l_quantity AS mode_qty, m.n
      FROM m JOIN r ON m.l_returnflag = r.l_returnflag AND r.rn = 1
      ORDER BY m.l_returnflag""",

    // Portable UNION ALL formulation of the melt.
    "agg_unpivot" -> """
      WITH m AS (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem)
      SELECT measure, count(*) AS n, round(sum(val), 2) AS total
      FROM m
      GROUP BY measure
      ORDER BY measure""",

    // Portable CASE formulation — the same conditional-aggregate plan Spark
    // compiles the explicit-list pivot into.
    "agg_pivot" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p1,
             count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p2,
             count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p3,
             count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p4,
             count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p5
      FROM orders
      GROUP BY 1
      ORDER BY o_year""",

    "agg_hash_global" -> """
      SELECT count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(min(l_extendedprice), 2) AS min_price,
             round(max(l_extendedprice), 2) AS max_price,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem""",

    "agg_groupby" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE (l_discount IS NULL OR isfinite(l_discount))
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "agg_count_distinct" -> """
      SELECT event_type,
             count(DISTINCT user_id) AS n_users,
             count(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY event_type NULLS FIRST""",

    "agg_collect" -> """
      SELECT o_orderstatus,
             string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
             count(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "agg_listagg" -> """
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             count(*) AS n
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey""",

    // Identical FILTER-clause SQL runs in DuckDB.
    "agg_filter_clause" -> """
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_quantity > 25) AS n_big,
             round(sum(l_extendedprice) FILTER (WHERE l_discount = 0), 2) AS rev_nodisc,
             count(*) FILTER (WHERE l_tax > 0.05) AS n_hitax,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "agg_percentile" -> """
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
             round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
             count(*) AS n
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    "agg_rollup" -> """
      SELECT c_mktsegment, o_orderstatus, grouping_id(c_mktsegment, o_orderstatus) AS gid,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
      ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""",

    "agg_cube" -> """
      SELECT n_name, o_orderpriority, grouping_id(n_name, o_orderpriority) AS gid,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY CUBE (n_name, o_orderpriority)
      ORDER BY gid, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "agg_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, grouping_id(o_orderstatus, o_orderpriority) AS gid,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    // Exact distinct-count algebra the theta estimates must reproduce
    // (exact-below-capacity precondition; see the key).
    "agg_theta_setops" -> """
      -- user_id IS NOT NULL mirrors theta_sketch_agg's aggregate-input
      -- NULL skip (r21 fuzz: count(*) over DISTINCT counted a fuzzed
      -- NULL user as one extra distinct; NOT IN with a NULL rhs would
      -- also empty n_signup_only)
      WITH s AS (SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'signup' AND user_id IS NOT NULL),
      e AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'error' AND user_id IS NOT NULL)
      SELECT (SELECT count(*) FROM s) AS n_signup,
             (SELECT count(*) FROM e) AS n_error,
             (SELECT count(*) FROM (SELECT user_id FROM s UNION SELECT user_id FROM e)) AS n_union,
             (SELECT count(*) FROM s WHERE user_id IN (SELECT user_id FROM e)) AS n_intersect,
             (SELECT count(*) FROM s WHERE user_id NOT IN (SELECT user_id FROM e)) AS n_signup_only""",

    // Full-capacity approx_top_k is the exact frequency table.
    "agg_approx_topk" -> """
      WITH d AS (SELECT lower(text) AS t FROM documents WHERE length(text) >= 4),
      w AS (SELECT unnest(list_transform(range(1, len(t) - 2), i -> substr(t, i, 4))) AS g
            FROM d)
      SELECT g, count(*) AS cnt FROM w GROUP BY g ORDER BY g""",

    // Exact-mode KLL ≡ discrete quantiles (verified bit-identical).
    "agg_kll_quantiles" -> """
      SELECT l_returnflag, count(*) AS n,
             round(quantile_disc(l_extendedprice, 0.01), 2) AS q01,
             round(quantile_disc(l_extendedprice, 0.5), 2) AS median,
             round(quantile_disc(l_extendedprice, 0.9), 2) AS q90,
             round(quantile_disc(l_extendedprice, 0.99), 2) AS q99
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // Exact definition the sketch-first plan must reproduce: every 4-gram
    // with count*k > n. DuckDB just does the full groupBy (fine at oracle
    // scale); the Spark side's MG guarantee is what makes the two agree.
    "agg_heavy_hitters" -> """
      WITH d AS (SELECT lower(text) AS t FROM documents WHERE length(text) >= 4),
      w AS (SELECT unnest(list_transform(range(1, len(t) - 2), i -> substr(t, i, 4))) AS g
            FROM d),
      n AS (SELECT count(*) AS n_total FROM w)
      SELECT g, count(*) AS cnt, (SELECT n_total FROM n) AS n_total
      FROM w GROUP BY g
      HAVING count(*) * 256 > (SELECT n_total FROM n)
      ORDER BY g"""
  ))
}
