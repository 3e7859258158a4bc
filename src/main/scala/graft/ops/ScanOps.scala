package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._

/** §2-A scans, sources and sinks.
  *
  * Scale notes (100 TB): `scan_pruned` / `scan_filter_pushdown` exist to
  * prove that projection and predicates reach the parquet reader (check
  * `ReadSchema` / `PushedFilters` in the formatted plan) — at 100 TB these
  * two properties are the difference between scanning terabytes and
  * scanning gigabytes. The sink roundtrips write to per-query temp dirs;
  * `sink_parquet_partitioned` demonstrates partitioned layout + partition
  * pruning on read-back.
  */
object ScanOps {
  type Q = (SparkSession, String) => DataFrame

  private val obsCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Temp dir with a RECURSIVE shutdown delete — File.deleteOnExit on a
    * dir that gains children is a silent no-op (delete fails on
    * non-empty), which leaked one table copy per roundtrip-key invocation
    * per JVM until the OS reaper ran. One definition for every sink/
    * roundtrip key. */
  /** Population-stability index of `valueCol` between the rows flagged
    * by `isExpCol` (expected period) and the rest (actual period) —
    * obs_drift_psi / Quality.psi. ONE conditional hash-agg collapses the
    * corpus to `nBands` fixed-width band counts per period (values are
    * clamped into [0, nBands-1] — negatives pin to band 0, overflow to
    * the top band); the PSI fold runs over the sorted band list
    * (bit-stable); cells are Haldane-smoothed so a tail band emptying in
    * ONE period stays finite: +0.5 is added per OBSERVED band's cell (a
    * band empty in BOTH periods contributes no row and so no numerator
    * term), while the denominator keeps the FIXED-UNIVERSE smoothing
    * mass nBands·0.5 — when some bands are empty in both periods the
    * smoothed cell probabilities deliberately sum to <1 (a stable
    * convention: the statistic never depends on which bands happen to be
    * observed in a sample, and the oracle applies it identically).
    * Returns one row (n_expected, n_actual, psi 4dp). */
  private[graft] def psiOf(df: DataFrame, valueCol: String,
                           isExpCol: String, bandWidth: Double,
                           nBands: Int): DataFrame = {
    val sm = nBands * 0.5
    df.select(greatest(least(floor(col(valueCol) / bandWidth),
                             lit(nBands - 1.0)), lit(0.0)).cast("int").as("band"),
              col(isExpCol).as("is_exp"))
      .groupBy("band")
      .agg(sum(when(col("is_exp"), 1L).otherwise(0L)).as("ne"),
           sum(when(col("is_exp"), 0L).otherwise(1L)).as("na"))
      .agg(sum("ne").as("n_expected"), sum("na").as("n_actual"),
           sort_array(collect_list(struct(col("band"), col("ne"),
                                          col("na")))).as("bs"))
      .select(col("n_expected"), col("n_actual"),
        round(expr(
          s"""aggregate(bs, CAST(0.0 AS DOUBLE),
             (acc, x) -> acc +
               ((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + $sm)
                - (CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + $sm))
               * ln(((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + $sm))
                    / ((CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + $sm))))"""), 4)
          .as("psi"))
  }

  /** Embedding-drift core (obs_drift_embedding / Quality.embeddingDrift):
    * input needs (is_exp BOOLEAN, embedding ARRAY<numeric>) with non-null
    * vectors and a non-empty expected period. One row out: PSI over 20
    * bands of each vector's cosine to the EXPECTED-period (training)
    * 6dp-rounded centroid (band = (cos+1)/0.1 — raw L2-norm bands
    * collapse to one cell on a unit-norm corpus, and the GLOBAL centroid
    * would be drift-BLIND to symmetric rotations since both clusters sit
    * equidistant from the mean; alignment to the training centroid is
    * the scalar that actually drops under serving drift), the cosine
    * between the two periods' centroids, and each period's mean L2 norm
    * (4dp). One posexplode agg collapses the corpus to d stat rows; the
    * reference centroid returns as a LITERAL array (d-row driver read,
    * the llm_embed_standardize economics) so per-vector cosines are
    * row-local — the corpus never shuffles. Banding the computed float
    * is safe because the dot/norm folds are sequential in dim order on
    * both engines (zip_with/aggregate ≙ list_zip/list_sum) over
    * identical rounded centroids — the banded double is bit-identical. */
  private[graft] def embeddingDriftOf(e: DataFrame): DataFrame = {
    val stats = e.select(col("is_exp"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("is_exp"), col("pos"), col("v").cast("double").as("v"))
      .groupBy("pos")
      .agg(round(avg(when(col("is_exp"), col("v"))), 6).as("mu_e"),
           round(avg(when(!col("is_exp"), col("v"))), 6).as("mu_a"))
    val cc = stats.agg(
      round(sum(col("mu_e") * col("mu_a")) /
            (sqrt(sum(col("mu_e") * col("mu_e"))) *
             sqrt(sum(col("mu_a") * col("mu_a")))), 4).as("centroid_cos"))
    // r20 (ADVICE r19): an empty EXPECTED (training) period leaves every
    // mu_e NULL — fail with the contract message, not a Row.getDouble NPE
    // (the same named-require convention as Similarity.trainCentroids).
    val muRows = stats.orderBy("pos").select("mu_e").collect()
    require(muRows.nonEmpty && !muRows.exists(_.isNullAt(0)),
      "embeddingDrift: EXPECTED (training) period has no vectors — the " +
      "reference centroid is undefined; supply at least one is_exp=true row")
    val mus = array(muRows.map(r => lit(r.getDouble(0))).toSeq: _*)
    val dot = aggregate(
      zip_with(col("embedding"), mus, (x, m) => x.cast("double") * m),
      lit(0.0), (a, x) => a + x)
    val nv = sqrt(aggregate(col("embedding"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    val nc = sqrt(aggregate(mus, lit(0.0), (a, m) => a + m * m))
    val vals = e.select(col("is_exp"), (dot / (nv * nc) + 1.0).as("value"),
                        nv.as("nv"))
    val psi = psiOf(vals, "value", "is_exp", bandWidth = 0.1, nBands = 20)
    val nrm = vals.agg(
      round(avg(when(col("is_exp"), col("nv"))), 4).as("avg_norm_exp"),
      round(avg(when(!col("is_exp"), col("nv"))), 4).as("avg_norm_act"))
    psi.crossJoin(broadcast(cc)).crossJoin(broadcast(nrm))
  }

  /** Row-local data-quality core (obs_dq_checks / `Quality.expect`):
    * every rule is `name -> violation predicate`, all evaluated as
    * conditional sums in ONE pass over `df`, unstacked to (rule,
    * n_violations) rows — never a scan per rule. Relational rules
    * (referential integrity, uniqueness) need their own join/agg shapes
    * and are composed by the caller. */
  private[graft] def expectOf(df: org.apache.spark.sql.DataFrame,
                              rules: Seq[(String, org.apache.spark.sql.Column)])
      : org.apache.spark.sql.DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    rules.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"), s"rule name '$n' must be an identifier") }
    // coalesce: sum over ZERO rows is NULL — an empty frame must report
    // 0 violations per rule, not null (the oracle's CTE sums hit the
    // same SQL rule and carry the same coalesce)
    val aggs = rules.zipWithIndex.map { case ((_, cond), i) =>
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"v$i") }
    val stacked = rules.zipWithIndex
      .map { case ((name, _), i) => s"'$name', v$i" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)")
  }

  /** k-anonymity audit core (obs_k_anonymity / Quality.kAnonymity) over
    * any frame and quasi-identifier column set: per threshold in `ks`,
    * the count and row-fraction of QI groups smaller than k, plus the
    * actual min group size. ONE map-side-combinable hash-agg to (QI, n)
    * — cardinality-bounded by the QI domain, never the corpus — then a
    * 1-row conditional rollup unstacked to the k-table; every output
    * derives from exact integer counts. Returns (k, min_k,
    * n_groups_below, n_rows_below, frac_rows_below 4dp), unordered. */
  private[graft] def kAnonymityOf(df: DataFrame, qiCols: Seq[String],
                                  ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ks.nonEmpty && ks.forall(_ >= 1),
      s"bad k-anonymity knobs: $qiCols / $ks")
    thresholdTableOf(
      df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n")),
      measure = "n", ks = ks, kName = "k")
  }

  /** l-diversity audit core (obs_l_diversity / Quality.lDiversity) — the
    * homogeneity-attack companion to [[kAnonymityOf]]: a QI group can be
    * large (k-anonymous) yet share ONE sensitive value, so membership
    * still discloses it. Per threshold in `ls`: the count and
    * row-fraction of QI groups with fewer than l DISTINCT sensitive
    * values, plus the corpus's actual min diversity. Same QI hash-agg
    * economics (the distinct-count state is bounded by the sensitive
    * domain); same exact-integer k-table shape. Returns (l, min_l,
    * n_groups_below, n_rows_below, frac_rows_below 4dp), unordered. */
  private[graft] def lDiversityOf(df: DataFrame, qiCols: Seq[String],
                                  sensCol: String, ls: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ls.nonEmpty && ls.forall(_ >= 1),
      s"bad l-diversity knobs: $qiCols / $ls")
    thresholdTableOf(
      df.groupBy(qiCols.map(col): _*)
        .agg(count(lit(1)).as("n"),
             countDistinct(col(sensCol)).as("ldiv")),
      measure = "ldiv", ks = ls, kName = "l")
  }

  /** Shared threshold rollup behind the two privacy audits: `groups`
    * carries one row per QI group with its size `n` and the audited
    * `measure` column (group size for k-anonymity, distinct-sensitive
    * count for l-diversity); for each threshold, the groups and ROWS
    * (always n-weighted) where measure < threshold, unstacked to the
    * k-table — one 1-row conditional agg, exact integer counts. */
  private def thresholdTableOf(groups: DataFrame, measure: String,
                               ks: Seq[Int], kName: String): DataFrame = {
    val aggs = Seq(sum("n").as("n_rows"), min(measure).as(s"min_$kName")) ++
      ks.flatMap(k => Seq(
        sum(when(col(measure) < k, 1L).otherwise(0L)).as(s"g$k"),
        sum(when(col(measure) < k, col("n")).otherwise(0L)).as(s"r$k")))
    val stacked = ks.map(k => s"$k, g$k, r$k").mkString(", ")
    groups.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"min_$kName", "n_rows",
        s"stack(${ks.size}, $stacked) AS ($kName, n_groups_below, n_rows_below)")
      .select(col(kName), col(s"min_$kName"),
        col("n_groups_below"), col("n_rows_below"),
        round(col("n_rows_below") / col("n_rows").cast("double"), 4)
          .as("frac_rows_below"))
  }

  /** t-closeness audit core (obs_t_closeness / Quality.tCloseness) — the
    * third privacy gate after [[kAnonymityOf]] and [[lDiversityOf]]: a QI
    * group can be large AND diverse yet still disclosing when its
    * sensitive DISTRIBUTION is skewed against the corpus (90% of one
    * group in the lowest balance band says plenty). Per Li et al. 2007,
    * the ordered-attribute Earth Mover's Distance between a group's
    * banded distribution and the global one is the mean absolute
    * cumulative difference: EMD = (1/(m-1)) * sum_i |P_i - Q_i| over the
    * first m-1 cumulative fractions. Engineering: ONE (QI, band)
    * hash-agg — cardinality bounded by |QI domain| * m, never corpus
    * size — then the m-row global histogram broadcasts and the per-group
    * EMD NUMERATOR folds in EXACT integer arithmetic: with C_i/G_i the
    * cumulative group/global counts, num = sum_i |N*C_i - n_g*G_i| and
    * EMD = num / ((m-1)*n_g*N), so every threshold verdict is an integer
    * compare (num*100 > t100*(m-1)*n_g*N) with zero float drift; the one
    * double division feeds only the reported max. int64-safe while
    * 100*(m-1)*n_g*N < 2^63 (corpora under ~1e8 rows per call — swap the
    * fold to DECIMAL(38,0) past that). `bandCol` must be a LONG band id;
    * non-null values are clamped into [0, nBands) and NULL-band rows are
    * EXCLUDED (Spark's least/greatest skip nulls, which would otherwise
    * silently reclassify a null as the TOP band and fabricate skew —
    * callers auditing null-heavy sensitive columns should band the nulls
    * explicitly first). Thresholds arrive in hundredths
    * (t100 = 20 means t = 0.20). Returns (t, max_emd 4dp,
    * n_groups_above, n_rows_above, frac_rows_above 4dp), unordered. */
  private[graft] def tClosenessOf(df: DataFrame, qiCols: Seq[String],
                                  bandCol: String, nBands: Int,
                                  t100s: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && nBands >= 2 &&
            t100s.nonEmpty && t100s.forall(t => t >= 1 && t <= 100) &&
            t100s.distinct.size == t100s.size,
      s"bad t-closeness knobs: $qiCols / $nBands / $t100s")
    val counts = df
      .filter(col(bandCol).isNotNull)
      .select(qiCols.map(col) :+
        greatest(least(col(bandCol), lit((nBands - 1).toLong)),
                 lit(0L)).as("band"): _*)
      .groupBy((qiCols :+ "band").map(col): _*).agg(count(lit(1)).as("c"))
    val groups = counts.groupBy(qiCols.map(col): _*)
      .agg(sum("c").as("n_g"),
           map_from_entries(collect_list(struct(col("band"), col("c"))))
             .as("pm"))
    val glob = counts.groupBy("band").agg(sum("c").as("g"))
      .agg(sum("g").as("n_tot"),
           map_from_entries(collect_list(struct(col("band"), col("g"))))
             .as("qm"))
    // Fold over bands 0..m-2 carrying (cumulative group count, cumulative
    // global count, integer numerator) — collect_list order is irrelevant
    // because lookups go through the maps.
    val numExpr = expr(
      s"""aggregate(sequence(0L, ${nBands - 2}L),
           named_struct('cc', 0L, 'gc', 0L, 'acc', 0L),
           (a, i) -> named_struct(
             'cc', a.cc + coalesce(pm[i], 0L),
             'gc', a.gc + coalesce(qm[i], 0L),
             'acc', a.acc + abs(n_tot * (a.cc + coalesce(pm[i], 0L))
                                - n_g * (a.gc + coalesce(qm[i], 0L)))),
           a -> a.acc)""")
    val scored = groups.crossJoin(broadcast(glob))
      .select(col("n_g"), col("n_tot"), numExpr.as("num"))
    val den = col("n_g") * col("n_tot") * lit((nBands - 1).toLong)
    val aggs = Seq(sum("n_g").as("n_rows"),
        round(max(col("num").cast("double") / den.cast("double")), 4)
          .as("max_emd")) ++
      t100s.flatMap(t => Seq(
        sum(when(col("num") * 100L > den * t, 1L).otherwise(0L)).as(s"g$t"),
        sum(when(col("num") * 100L > den * t, col("n_g")).otherwise(0L))
          .as(s"r$t")))
    val stacked =
      t100s.map(t => s"CAST($t AS DOUBLE) / 100.0, g$t, r$t").mkString(", ")
    scored.agg(aggs.head, aggs.tail: _*)
      .selectExpr("max_emd", "n_rows",
        s"stack(${t100s.size}, $stacked) AS (t, n_groups_above, n_rows_above)")
      .select(col("t"), col("max_emd"), col("n_groups_above"),
        col("n_rows_above"),
        round(col("n_rows_above") / col("n_rows").cast("double"), 4)
          .as("frac_rows_above"))
  }

  /** Column-profile audit core (obs_profile / Quality.profile) — the
    * Deequ/pandas-profiling table scan a pipeline runs on first contact
    * with a feed: per column, row count, null count/fraction, EXACT
    * distinct count, and numeric min/max. Engineering: the columns
    * STACK to (column, value) rows in ONE scan (never a scan or a
    * distinct-expand per column), a (column, value) pre-agg bounds the
    * distinct state by each column's actual domain, and the per-column
    * rollup is dimension-sized — one scan + one shuffle however many
    * columns are profiled. Values group on their string form (injective
    * per column type, used only as the grouping carrier, never output);
    * min/max are taken on the double cast and are null for non-numeric
    * columns, so no engine-specific string formatting ever reaches the
    * output. Returns (column, n_rows, n_null, frac_null 4dp,
    * n_distinct, min_v, max_v), unordered. */
  private[graft] def profileOf(df: DataFrame, cols: Seq[String],
                               numericCols: Set[String]): DataFrame = {
    require(cols.nonEmpty && numericCols.subsetOf(cols.toSet),
      s"bad profile columns: $cols / $numericCols")
    cols.foreach { c =>
      require(c.matches("[A-Za-z0-9_]+"), s"column '$c' must be an identifier") }
    val arms = cols.map { c =>
      val num = if (numericCols(c)) s"CAST($c AS DOUBLE)"
                else "CAST(NULL AS DOUBLE)"
      s"'$c', CAST($c AS STRING), $num"
    }.mkString(", ")
    val agg = df.selectExpr(s"stack(${cols.size}, $arms) AS (c, v, vn)")
      .groupBy("c", "v")
      .agg(count(lit(1)).as("nv"), min("vn").as("mn"), max("vn").as("mx"))
      .groupBy("c")
      .agg(sum("nv").as("n_rows"),
           sum(when(col("v").isNull, col("nv")).otherwise(0L)).as("n_null"),
           count(col("v")).as("n_distinct"),
           min("mn").as("min_v"), max("mx").as("max_v"))
    // An EMPTY frame must still profile as one zero-count row per column
    // (the honest "this table is empty" report), not vanish: left-join
    // the aggregate onto the literal column list. On any non-empty frame
    // every column has a group, so the join and coalesces are the
    // identity and the contract hash is untouched; frac_null is
    // when-guarded (NULL at n_rows = 0 — an ANSI DIVIDE_BY_ZERO
    // otherwise).
    val base = df.sparkSession
      .createDataset(cols)(org.apache.spark.sql.Encoders.STRING).toDF("c")
    base.join(agg, Seq("c"), "left")
      .select(col("c").as("col_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        round(col("n_null") /
          when(col("n_rows") =!= 0L, col("n_rows").cast("double")), 4)
          .as("frac_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"))
  }

  private[graft] def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      try Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      catch { case _: Throwable => () } // tmp reaper is the backstop
    }))
    p.toString
  }

  /** Copy-on-write MERGE core: `updates` rows replace base rows sharing
    * the key columns, unmatched updates insert. Both frames must share a
    * schema (updates may carry extra marker columns the base also has).
    * The updates side is broadcast — a CDC delta is the small side by
    * definition, so the base snapshot never shuffles; drop the broadcast
    * hint at the call site if the delta outgrows the threshold and the
    * plan degrades to a shuffled anti-join on the merge key (the
    * Delta/Iceberg MERGE shape). Shared by sink_merge_upsert and
    * graft.api.Ingest.mergeUpsert. */
  private[graft] def mergeUpsertOf(base: DataFrame, updates: DataFrame,
                                   keys: Seq[String]): DataFrame =
    base.join(broadcast(updates.select(keys.head, keys.tail: _*)),
              keys, "left_anti")
      .unionByName(updates)

  private val compactFor = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** sink_compaction's layout pair, built ONCE per (JVM, sfDir): orders
    * fragmented into 64 shards under `<base>/small`, then compacted to 4
    * right-sized files under `<base>/compact` (returned). The fragmented
    * write exists only to be compacted — both halves under one
    * recursively-reaped temp root. */
  private[graft] def compactedOrders(s: SparkSession, d: String): String =
    compactFor.computeIfAbsent(d, _ => {
      val base = tmpDir("graft_compact")
      Tables.orders(s, d).repartition(64).write.parquet(s"$base/small")
      s.read.parquet(s"$base/small").repartition(4).write.parquet(s"$base/compact")
      s"$base/compact"
    })

  private val bloomFor = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Orders re-written with a PARQUET BLOOM FILTER on o_custkey, once per
    * (JVM, sfDir) — the layout lever for high-cardinality POINT lookups,
    * exactly where min/max row-group stats (opt_zorder's tool) are
    * useless: a random-valued key spans ~the full domain in every row
    * group, so range stats prune nothing, while a per-row-group bloom
    * answers "custkey ∉ this group" in O(1) with no false negatives. At
    * 100 TB: blooms live in the footer (read once), row groups are
    * skipped before any page I/O, and the write-side cost is one hash per
    * row — the standard layout for needle-in-haystack serving tables. */
  private[graft] def bloomOrders(s: SparkSession, d: String): String =
    bloomFor.computeIfAbsent(d, _ => {
      val dir = s"${tmpDir("graft_bloom")}/orders"
      Tables.orders(s, d)
        .sort("o_orderkey") // stable file/row-group layout across runs
        .write
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "200000")
        // parquet-mr silently SKIPS the bloom when every page of the
        // column ends up dictionary-encoded (the dictionary already gives
        // exact membership) — true at test SFs, where custkey NDV is tiny.
        // Disabling dictionary for just this column forces the bloom so
        // the layout under test actually exists; at production NDV the
        // dictionary overflows to plain encoding on its own and this
        // toggle is unnecessary.
        .option("parquet.enable.dictionary#o_custkey", "false")
        .parquet(dir)
      dir
    })

  private val vjsonFor = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Events staged as JSON-LINES with a NESTED object (props parsed into
    * `p.k`), once per (JVM, sfDir) — the raw landing-zone layout
    * src_json_variant ingests schema-free. Derived deterministically from
    * the events table, so the oracle can restate the expected content
    * from the original columns without touching the staging dir. */
  private[graft] def variantJsonDir(s: SparkSession, d: String): String =
    vjsonFor.computeIfAbsent(d, _ => {
      val dir = s"${tmpDir("graft_vjson")}/events"
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
        .write.json(dir)
      dir
    })

  /** Shared embedded-Derby connection properties (driver class in one
    * place — it appears in several keys). */
  private[graft] def derbyProps: java.util.Properties = {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    props
  }

  /** Per-doc binary files staged once per (JVM, sfDir) — the raw-asset
    * layout a multimodal corpus arrives in (one image/audio blob per
    * file): doc_id < 50's text bytes written as `doc_<id>.bin`, plus one
    * decoy `.skip` file the pathGlobFilter must exclude. Driver-side file
    * writes are scaffolding (the fixture stands in for an external object
    * store), like BusRegistry.publish. */
  private val binFilesFor = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def binFilesDir(s: SparkSession, d: String): String =
    binFilesFor.computeIfAbsent(d, _ => {
      val dir = tmpDir("graft_binfiles")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 50).collect().foreach { r =>
          // a NULL or EMPTY payload stages NO file — a missing asset has
          // nothing to write, and the binaryFile source skips zero-length
          // files anyway; the oracle filters the same rows out
          if (!r.isNullAt(1) && r.getString(1).nonEmpty)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, s"doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes("UTF-8"))
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "ignore_me.skip"),
        "decoy".getBytes("UTF-8"))
      dir
    })

  /** Orders staged into a per-JVM Derby database, once per sfDir (the JDBC
    * SOURCE for scan_jdbc_pushdown; same computeIfAbsent discipline as the
    * other per-JVM fixtures). */
  private val jdbcOrdersFor = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def jdbcOrdersUrl(s: SparkSession, d: String): String =
    jdbcOrdersFor.computeIfAbsent(d, _ => {
      val db = tmpDir("graft_derby_src") + "/ordersdb"
      val url = s"jdbc:derby:$db;create=true"
      // Derby DOUBLE has no IEEE NaN/±Inf — the JDBC ingest edge rejects
      // them (r19 fuzz); every oracle over this store restates the WHERE
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).jdbc(url, "orders_src", derbyProps)
      url
    })

  /** sink_dynamic_overwrite's table, built ONCE per (JVM, sfDir): orders
    * written partitioned by ship year, then ONE year's partition replaced
    * with value-bumped rows under partitionOverwriteMode=dynamic. Dynamic
    * mode rewrites only the partitions the incoming frame TOUCHES — the
    * default (static) mode would have deleted every other year first,
    * which at 100 TB is the difference between replacing one day and
    * truncating the table (OperatorSpec stages the static-mode contrast).
    * The conf is scoped to the overwrite and restored. */
  private val dynOverwriteFor = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def dynOverwriteDir(s: SparkSession, d: String): String =
    dynOverwriteFor.computeIfAbsent(d, _ => {
      val dir = tmpDir("graft_dynover") + "/orders_by_year"
      val base = Tables.orders(s, d).withColumn("yr", year(col("o_orderdate")))
      base.write.partitionBy("yr").mode(SaveMode.Overwrite).parquet(dir)
      val updated = base.filter(col("yr") === 1997)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val saved = s.conf.getOption(key)
      s.conf.set(key, "dynamic")
      try updated.write.partitionBy("yr").mode(SaveMode.Overwrite).parquet(dir)
      finally saved match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
      dir
    })

  /** src_csv_malformed's fixture, staged ONCE per (JVM, sfDir): orders as
    * header-less CSV lines where every `o_orderkey % 10 == 3` row carries
    * a non-numeric totalprice field — the deterministic stand-in for the
    * malformed fraction every real 100 TB CSV drop contains. Doubles
    * round-trip exactly through CAST AS STRING (Java Double.toString /
    * parse are inverses), so the GOOD rows stay hash-comparable. */
  private val badCsvFor = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def badCsvDir(s: SparkSession, d: String): String =
    badCsvFor.computeIfAbsent(d, _ => {
      val dir = tmpDir("graft_badcsv") + "/orders_csv"
      Tables.orders(s, d)
        .select(concat_ws(",",
          col("o_orderkey"),
          when(col("o_orderkey") % 10 === 3, lit("not_a_number"))
            .otherwise(col("o_totalprice").cast("string")),
          col("o_orderpriority")).as("value"))
        .write.mode(SaveMode.Overwrite).text(dir)
      dir
    })

  val queries: Map[String, Q] = graft.Contract.uniqueMap("ScanOps.queries", Seq(
    // Full scan. NOTE: (l_orderkey, l_linenumber) is NOT unique in this
    // testdata — the only safe total order is over every output column
    // (full rows verified duplicate-free; ties would be identical anyway).
    "scan_parquet" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.orderBy(l.columns.map(col): _*)
    }),

    // Column pruning: only 3 of 11 columns should appear in ReadSchema.
    "scan_pruned" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // Hidden file-metadata columns (`_metadata.file_name` etc., constant
    // per split — no I/O beyond the listing the scan already did): the
    // provenance primitive at 100 TB — "which file did this corrupt row
    // come from", per-file row audits, incremental-load bookkeeping — all
    // without a filename column baked into the data. The oracle reads the
    // same parquet with DuckDB's filename=true projection.
    "scan_metadata_cols" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("_metadata.file_name").as("file_name"), col("doc_id"))
        .groupBy("file_name")
        .agg(count(lit(1)).as("n_rows"), min("doc_id").as("first_doc"))
        .orderBy("file_name")
    }),

    // Predicate pushdown: the timestamp filter lands in PushedFilters and
    // skips row groups at scale.
    "scan_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    }),

    // JSON-lines source surface: events.props is a JSON string {"k": int}.
    "src_jsonlines" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"),
          col("event_type"))
        .orderBy("event_id")
    }),

    // CSV sink + source roundtrip; verified by joining back to the origin.
    // CSV + GZIP codec roundtrip — the compressed-text landing-zone path
    // (logs, exports) distinct from src_csv_roundtrip's plain files: the
    // writer emits .csv.gz parts, the reader decompresses by extension.
    // Gzip is NOT splittable — one file = one task however big, which is
    // exactly why a 100 TB pipeline re-stages gzip landings into parquet
    // (or zstd/bzip2) before heavy processing; this key pins the
    // read-back correctness of the codec path, join-verified against the
    // parquet original.
    // Parquet ZSTD codec roundtrip — the layout default a 100 TB estate
    // actually ships (zstd ≈ gzip ratios at ~3× the decode speed, and
    // parquet stays SPLITTABLE under it because compression is per-page,
    // unlike whole-file .csv.gz): written with compression=zstd,
    // read back join-verified against the snappy-coded original.
    "src_parquet_zstd" -> ((s, d) => {
      val dir = tmpDir("graft_pqzstd")
      val n = Tables.nation(s, d)
      n.write.mode(SaveMode.Overwrite)
        .option("compression", "zstd").parquet(dir)
      val back = s.read.parquet(dir)
      back.join(n, Seq("n_nationkey"))
        .select(col("n_nationkey"), back("n_name").as("n_name"),
                back("n_regionkey").as("n_regionkey"))
        .orderBy("n_nationkey")
    }),

    "src_csv_compressed" -> ((s, d) => {
      val dir = tmpDir("graft_csvgz")
      val sup = Tables.supplier(s, d)
      sup.write.mode(SaveMode.Overwrite)
        .option("header", "true").option("compression", "gzip").csv(dir)
      val back = s.read.schema(sup.schema).option("header", "true").csv(dir)
      back.join(sup, Seq("s_suppkey"))
        .select(col("s_suppkey"), back("s_name").as("s_name"),
                round(back("s_acctbal"), 2).as("s_acctbal"))
        .orderBy("s_suppkey")
    }),

    "src_csv_roundtrip" -> ((s, d) => {
      val dir = tmpDir("graft_csv")
      val r = Tables.region(s, d)
      r.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
      val back = s.read.schema(r.schema).option("header", "true").csv(dir)
      back.join(r, Seq("r_regionkey"))
        .select(col("r_regionkey"), back("r_name").as("r_name"))
        .orderBy("r_regionkey")
    }),

    // JSON-lines FILE sink + source roundtrip (src_jsonlines parses a JSON
    // string column; this is the json datasource itself): nation written
    // as .json lines, read back with an EXPLICIT schema — inference would
    // sample-scan the corpus (at 100 TB always pin the schema; same rule
    // as the XML key) — and join-verified against the parquet original so
    // the gate covers the full write+read path.
    "src_json_roundtrip" -> ((s, d) => {
      val dir = tmpDir("graft_json")
      val n = Tables.nation(s, d)
      n.write.mode(SaveMode.Overwrite).json(dir)
      val back = s.read.schema(n.schema).json(dir)
      back.join(n.select(col("n_nationkey"), col("n_name").as("orig_name")),
                "n_nationkey")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
                (col("n_name") === col("orig_name")).as("name_ok"))
        .orderBy("n_nationkey")
    }),

    // Schema evolution read: generation 1 (even keys) lacks
    // o_orderpriority, generation 2 (odd keys) carries it; mergeSchema
    // unions the footers into one frame where the missing column is NULL
    // for gen-1 rows — the 100 TB reality that a corpus accretes columns
    // over time and history cannot be rewritten. Pinned-schema reads stay
    // the default everywhere else (mergeSchema costs a footer pass per
    // file at listing); this key is the explicit evolution path.
    "src_schema_evolution" -> ((s, d) => {
      val dir = tmpDir("graft_evo")
      val o = Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: REAL-measure sums
      o.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/gen1")
      o.filter(pmod(col("o_orderkey"), lit(2)) =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/gen2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/gen1", s"$dir/gen2")
        .groupBy(coalesce(col("o_orderpriority"), lit("<pre-evolution>")).as("gen"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("gen")
    }),

    // Small-file compaction — the table-maintenance pass every long-lived
    // 100 TB dataset needs: a fragmented write (64 shards here; in
    // production, thousands of per-minute micro-batch files whose
    // per-file overhead dominates scan cost) is rewritten into a few
    // right-sized files. repartition(4) is a full round-robin shuffle —
    // the balanced choice; coalesce(4) would skip the shuffle but inherit
    // input skew. The audit aggregate hash-matches the ORIGINAL orders,
    // proving compaction moved bytes, not semantics; OperatorSpec pins the
    // actual file counts on both sides.
    "sink_compaction" -> ((s, d) => {
      val dir = compactedOrders(s, d)
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n"),
             round(sum("o_totalprice"), 2).as("total"),
             min("o_orderkey").as("min_key"),
             max("o_orderkey").as("max_key"))
    }),

    // Text sink + source roundtrip — the last native file source
    // (parquet/csv/json/orc/xml/binaryFile/jdbc are the other keys).
    // Lines are `doc_id|lang|text`; the read-back split carries limit=3,
    // so a '|' INSIDE the text cannot shear the payload (only the two
    // leading fields must be separator-free: a numeric id and a lang
    // code). The audit folds an md5 prefix of every text into the sum, so
    // the gate covers payload bytes end-to-end, not just counts.
    "src_text_roundtrip" -> ((s, d) => {
      val dir = tmpDir("graft_text")
      // A text line cannot carry NULL: concat_ws SKIPS null fields, so a
      // null lang/text would shear the layout (and the read-back
      // getItem(2) is an ANSI INVALID_ARRAY_INDEX crash). The writer
      // canonicalizes NULL to '' — the documented lossiness of the
      // format — and the oracle audits the same coalesce, so the
      // contract holds on null-bearing corpora too (identity on the
      // fixture).
      Tables.documents(s, d)
        .select(concat_ws("|", col("doc_id"),
                coalesce(col("lang"), lit("")),
                coalesce(col("text"), lit(""))).as("value"))
        .write.mode(SaveMode.Overwrite).text(dir)
      s.read.text(dir)
        .select(split(col("value"), "\\|", 3).as("p"))
        .select(col("p").getItem(0).cast("long").as("doc_id"),
                col("p").getItem(1).as("lang"),
                col("p").getItem(2).as("text"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct("doc_id").as("n_ids"),
             sum(length(col("text"))).as("total_chars"),
             sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
               .as("content_sum"))
        .orderBy("lang")
    }),

    // Partitioned parquet sink + read-back aggregation. The read-back
    // filter prunes whole partition directories (static partition pruning).
    "sink_parquet_partitioned" -> ((s, d) => {
      val dir = tmpDir("graft_part")
      Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: REAL-measure sums
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_year") >= 1996)
        .groupBy("o_year")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_year")
    }),

    // Copy-on-write MERGE/upsert (the Delta/Iceberg MERGE shape without a
    // table format): updates matched on the merge key replace base rows,
    // unmatched updates insert; the merged snapshot is rewritten
    // partitioned and read back for the audit. Scale contract: the CDC
    // delta is the SMALL side by definition, so the base snapshot never
    // shuffles — one broadcast ANTI join + union + write; a
    // non-broadcastable delta degrades to the same plan with a shuffled
    // anti-join on the merge key. The update rule is an exact double add
    // (+1000.0, no per-row rounding), so the audit sums are bit-stable
    // across engines. Base = keys with o_orderkey % 5 != 0 (yesterday's
    // snapshot); delta = keys % 2 == 0 — overlapping keys exercise the
    // update arm, % 10 == 0 keys the insert arm.
    // Single-pass audit metrics via `Dataset.observe` (CollectMetrics):
    // the 100 TB pattern for "process the data AND collect quality
    // counters" in ONE scan — a separate audit aggregation would be a
    // second full pass over the corpus. The metrics ride the existing
    // plan as accumulator-style aggregates evaluated where the rows
    // already flow (CollectMetricsExec passes rows through untouched);
    // any action materializes them. In production the same Observation
    // hangs off a streaming sink or an ETL write; here the audited "job"
    // is a count over the filtered scan, and the key RETURNS the observed
    // metrics row — so the oracle hash-checks that the in-flight counters
    // equal the ground-truth aggregation.
    // Data-quality expectations (the Deequ/Great-Expectations gate shape):
    // declared rules evaluated over the orders feed, one row per rule
    // with its violation count — the report a pipeline asserts on before
    // promoting a batch. Plan shape is the 100 TB lesson: the three
    // ROW-LOCAL rules (null key, non-positive amount, date out of range)
    // fuse into ONE scan as conditional sums unstacked to rows — never a
    // scan per rule; the two RELATIONAL rules each need their own shape
    // anyway (referential integrity = an anti join on the dimension,
    // uniqueness = a keyed count — both shuffle on the key they check,
    // nothing else). Five 1-row frames union at the end.
    // Data-freshness monitoring — the "is this feed stale?" check every
    // ingest pipeline runs: each event source's latest event-time lag
    // behind the freshest source, with a 120-minute SLO verdict. The
    // reference clock is the corpus's own global max(ts) — NOT now() —
    // so the check is deterministic and the oracle can restate it; in
    // production you'd swap the reference for the wall clock and keep
    // everything else. Two tiny aggregates (per-type + global 1-row
    // broadcast), lag computed on exact integer micros.
    "obs_freshness" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perType = e.groupBy("event_type")
        .agg(max(unix_micros(col("ts"))).as("mx_us"), count(lit(1)).as("n"))
      val global = e.agg(max(unix_micros(col("ts"))).as("gx_us"))
      perType.crossJoin(broadcast(global))
        // integer DIV on exact micros — a double divide + cast would
        // round/truncate differently across engines at minute boundaries
        .withColumn("lag_min", expr("(gx_us - mx_us) DIV 60000000"))
        .select(col("event_type"), col("n"), col("lag_min"),
                (col("lag_min") <= 120).as("fresh"))
        .orderBy("event_type")
    }),

    // Population-stability index between the month's first and last
    // 10-day windows of purchase values — the standard "did my feature
    // distribution drift between training and serving" monitor (PSI > 0.2
    // is the conventional re-train alarm). The corpus collapses to 10
    // fixed-width value-band counts per period in ONE conditional
    // hash-agg (map-side combined, band arithmetic codegen'd); the PSI
    // fold runs over the sorted band list — bounded, bit-stable, and the
    // bands are fixed-width so expected/actual use the SAME bins by
    // construction (no quantile-estimation dependency between the two
    // periods). Cell counts are Haldane-smoothed (+0.5 per cell over the
    // fixed 10-band universe) — the standard guard that keeps PSI finite
    // when a sparse tail band empties in one period; an unsmoothed
    // ln(p/0) would blow up exactly on the drifted band being hunted.
    "obs_drift_psi" -> ((s, d) =>
      psiOf(
        Tables.events(s, d)
          .filter(graft.Contract.finiteOrNull(col("value"))) // r19 fuzz: band a REAL measure
          .filter(col("event_type") === "purchase")
          .filter(col("ts") < lit("2024-01-11").cast("timestamp") ||
                  col("ts") >= lit("2024-01-21").cast("timestamp"))
          .withColumn("is_exp",
            col("ts") < lit("2024-01-11").cast("timestamp")),
        "value", "is_exp", bandWidth = 50.0, nBands = 10)),

    // obs_drift_psi's twin for VECTOR columns (r19) — the training/serving
    // skew check every embedding pipeline runs between corpus snapshots
    // (halves here, split by vec_id parity). Three facets in one row:
    //   - psi over 20 bands of each vector's cosine to the GLOBAL 6dp-
    //     rounded centroid (the corpus is unit-norm, so raw L2-norm bands
    //     would all collapse into one cell — alignment-to-centroid is the
    //     scalar that actually moves under embedding drift);
    //   - centroid_cos: cosine between the two halves' centroids (1.0 =
    //     no shift) from ONE conditional per-dim agg;
    //   - avg L2 norm per half (the norm-drift facet; ≈1.0 on this
    //     corpus by construction).
    // Scale shape: one posexplode agg collapses the corpus to d=64 stat
    // rows; the centroid returns as a LITERAL array (d-row driver read,
    // the llm_embed_standardize economics) so per-vector cosines are
    // row-local arithmetic — the corpus never shuffles; psiOf folds 20
    // band cells. Banding a COMPUTED float is safe here because the dot/
    // norm folds are sequential in dim order on BOTH engines (zip_with/
    // aggregate vs list_zip/list_sum) over identical 6dp-rounded centroid
    // values — the banded double is bit-identical, not merely close.
    "obs_drift_embedding" -> ((s, d) =>
      embeddingDriftOf(
        Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .withColumn("is_exp", pmod(col("vec_id"), lit(2)) === 0))),

    "obs_dq_checks" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val rowLocal = expectOf(o, Seq(
        "key_not_null" -> col("o_orderkey").isNull,
        "positive_amount" -> (col("o_totalprice") <= 0.0),
        "date_in_range" ->
          (col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
           col("o_orderdate") >= lit("2002-01-01").cast("timestamp"))))
      val orphan = o.join(Tables.customer(s, d).select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_customer_exists").as("rule"), col("n_violations"))
      val dups = o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("key_unique").as("rule"), col("n_violations"))
      rowLocal.unionByName(orphan).unionByName(dups).orderBy("rule")
    }),

    // k-anonymity audit over a quasi-identifier tuple — the compliance
    // check a training-data pipeline runs BEFORE releasing or joining
    // user-derived rows: for each k threshold, how many QI groups (and
    // what fraction of rows) are smaller than k, i.e. re-identifiable at
    // that privacy level, plus the corpus's actual min group size. ONE
    // map-side-combinable hash-agg to (QI, n) — cardinality-bounded by
    // the QI domain, never the corpus — then one 1-row conditional agg
    // unstacked to the k-table; every output derives from exact integer
    // counts. QI here = (nation, market segment) on customer.
    "obs_k_anonymity" -> ((s, d) =>
      kAnonymityOf(Tables.customer(s, d),
                   Seq("c_nationkey", "c_mktsegment"), Seq(2, 5, 10, 20))
        .orderBy("k")),

    // l-diversity audit — k-anonymity's homogeneity-attack companion: a
    // QI group can be comfortably large yet share ONE sensitive value,
    // so group membership still discloses it. Sensitive attribute here =
    // the customer's 2500-wide account-balance band; per l threshold,
    // how many QI groups (and what row fraction) carry fewer than l
    // distinct bands. Same QI hash-agg economics as obs_k_anonymity
    // (distinct-count state bounded by the sensitive domain), all exact
    // integer counts.
    "obs_l_diversity" -> ((s, d) =>
      lDiversityOf(Tables.customer(s, d)
          .withColumn("bal_band",
            floor(col("c_acctbal").cast("double") / 2500.0).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", Seq(2, 3, 4))
        .orderBy("l")),

    // t-closeness audit — the distribution-skew companion completing the
    // privacy trio: a QI group can be k-anonymous AND l-diverse yet leak
    // when its sensitive-value DISTRIBUTION diverges from the corpus
    // (ordered-band EMD, Li et al. 2007). Sensitive attribute = the
    // 2500-wide account-balance band shifted positive ((bal+1000)/2500,
    // 5 bands); per t threshold, how many QI groups (and what row
    // fraction) sit farther than t from the global distribution. The
    // EMD numerator is exact int64 (see tClosenessOf), so the verdicts
    // carry zero float drift.
    "obs_t_closeness" -> ((s, d) =>
      tClosenessOf(Tables.customer(s, d)
          .withColumn("bal_band",
            floor((col("c_acctbal").cast("double") + 1000.0) / 2500.0)
              .cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", nBands = 5,
        t100s = Seq(10, 20, 30))
        .orderBy("t")),

    // Column-profile audit over the orders feed — first-contact data
    // profiling (the Deequ-profile shape): per column, rows, nulls,
    // EXACT distinct count, numeric min/max. One stacked scan + one
    // (column, value) pre-agg — never a scan or distinct-expand per
    // column; min/max ride the double cast so no engine-specific string
    // formatting reaches the output.
    "obs_profile" -> ((s, d) =>
      profileOf(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
            "o_orderpriority"),
        numericCols = Set("o_orderkey", "o_custkey", "o_totalprice"))
        .orderBy("col_name")),

    "obs_metrics" -> ((s, d) => {
      val o = new org.apache.spark.sql.Observation(
        s"graft_obs_${obsCounter.incrementAndGet()}")
      val audited = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 10.0)
        .observe(o,
          count(lit(1)).as("n_rows"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          // DISTINCT aggregates are rejected in observed metrics
          // (INVALID_OBSERVED_METRICS) — bounds stand in for cardinality
          max(col("l_orderkey")).as("max_order"))
      audited.write.format("noop").mode(SaveMode.Overwrite).save()
      val m = o.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
           m("sum_qty").asInstanceOf[Double],
           m("avg_disc").asInstanceOf[Double],
           m("max_order").asInstanceOf[Long]))
        .toDF("n_rows", "sum_qty", "avg_disc", "max_order")
    }),

    "sink_merge_upsert" -> ((s, d) => {
      val dir = tmpDir("graft_merge")
      val orders = Tables.orders(s, d)
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: REAL-measure sums
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = orders.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
      val upd = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("src", lit("upd"))
      val merged = mergeUpsertOf(base.withColumn("src", lit("base")), upd,
                                 Seq("o_orderkey"))
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy("o_orderstatus").parquet(dir)
      s.read.parquet(dir)
        .groupBy("o_orderstatus", "src")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus", "src")
    }),

    // Real JDBC sink + source roundtrip against embedded Derby (on the
    // Spark classpath as the metastore DB — no egress needed). The tiny agg
    // is coalesced to one partition: embedded Derby is a single-JVM store,
    // fine for a dimension-sized result in local mode. On a real cluster the
    // identical .write.format("jdbc") call points at a server database and
    // each partition opens its own connection — the plan shape is unchanged.
    "sink_jdbc" -> ((s, d) => {
      val db = tmpDir("graft_derby") + "/sinkdb"
      val url = s"jdbc:derby:$db;create=true"
      val props = derbyProps
      val agg = Tables.orders(s, d)
        // Derby DOUBLE has no IEEE NaN/±Inf (r19 fuzz): reject at ingest
        .filter(graft.Contract.finiteOrNull(col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      agg.coalesce(1).write.mode(SaveMode.Overwrite)
        .jdbc(url, "priority_totals", props)
      s.read.jdbc(url, "priority_totals", props).orderBy("o_orderpriority")
    }),

    // JDBC SOURCE with predicate pushdown: the full orders table is staged
    // into embedded Derby once per JVM, then read back with a filter +
    // projection that Spark pushes INTO the JDBC query (PushedFilters on
    // the JDBCRelation scan — at scale the database does the filtering and
    // only qualifying rows cross the wire; PlanSpec pins it). The
    // read-back aggregate hash-matches the same computation on parquet.
    "scan_jdbc_pushdown" -> ((s, d) => {
      s.read.jdbc(jdbcOrdersUrl(s, d), "orders_src", derbyProps)
        .filter(col("o_totalprice") > 300000.0)
        .select("o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // ORC sink + source roundtrip (the second columnar format Spark ships
    // natively). Same pushdown properties as parquet: the read-back filter
    // and 3-column projection reach the ORC reader (ORC predicate pushdown
    // + column pruning), verified by the aggregate matching the oracle
    // computed from the parquet original.
    "src_orc_roundtrip" -> ((s, d) => {
      val dir = tmpDir("graft_orc")
      Tables.orders(s, d).write.mode(SaveMode.Overwrite).orc(dir)
      s.read.orc(dir)
        .filter(col("o_totalprice") > 50000.0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("o_orderstatus")
    }),

    // XML roundtrip over Spark 4's NATIVE xml datasource (the spark-xml
    // integration that moved into core): nation written as <nation> rows,
    // read back with an explicit schema (inference would sample-scan — at
    // 100 TB always pin the schema) + rowTag, then joined against the
    // parquet original so the gate hashes the full read path. XML is the
    // interchange format feeds/dumps still arrive in; the writer/parser
    // are distributed per-partition like csv/json.
    "src_xml_roundtrip" -> ((s, d) => {
      val dir = tmpDir("graft_xml")
      val n = Tables.nation(s, d)
      n.write.mode(SaveMode.Overwrite).option("rowTag", "nation").xml(dir)
      val back = s.read.schema(n.schema).option("rowTag", "nation").xml(dir)
      back.join(n, Seq("n_nationkey"))
        .select(col("n_nationkey"), back("n_name").as("n_name"),
                back("n_regionkey").as("n_regionkey"))
        .orderBy("n_nationkey")
    }),

    // Raw binary-file ingest — Spark's native distributed read for the
    // opaque blobs a multimodal corpus arrives as (one image/audio file
    // per asset; llm_multimodal_features is the downstream decode stage).
    // `binaryFile` partitions work by FILES (each a task unit, driver
    // lists once) and `pathGlobFilter` prunes non-matching paths at the
    // listing — at 100 TB the glob is the difference between reading the
    // asset set and reading the whole bucket. The key stages doc texts as
    // .bin files plus a decoy the glob must skip, then emits per-file
    // byte counts + content digests; the oracle derives the identical
    // rows from the documents table (same bytes by construction), so the
    // whole read path — listing, glob pruning, content fetch — is
    // hash-gated.
    // Schema-FREE semi-structured ingestion: the whole JSONL record lands
    // in ONE VARIANT column (`singleVariantColumn`) — no schema inference
    // pass, no silent column drift when upstream adds fields; typed reads
    // happen at QUERY time via variant_get paths (incl. through the
    // nested object). This is the modern lake landing pattern — ingest is
    // schema-blind and O(parse-once-per-row) into the binary variant
    // encoding; fn_variant covers the expression surface, this key covers
    // the SOURCE surface. At 100 TB: inference over raw JSON is a full
    // extra corpus scan that this path never pays.
    "src_json_variant" -> ((s, d) =>
      s.read.format("json").option("singleVariantColumn", "v")
        .load(variantJsonDir(s, d))
        .select(
          expr("variant_get(v, '$.event_id', 'bigint')").as("event_id"),
          expr("variant_get(v, '$.event_type', 'string')").as("event_type"),
          expr("variant_get(v, '$.value', 'double')").as("value"),
          expr("variant_get(v, '$.p.k', 'int')").as("k"))
        // measure-ingest guard (r19 fuzz): REAL measure for the DECIMAL cast
        .filter(graft.Contract.finiteOrNull(col("value")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             round(sum(col("value").cast("decimal(14,2)")), 2)
               .cast("double").as("sv"),
             sum(col("k").cast("long")).as("sk"),
             countDistinct("event_id").as("n_ids"))
        .orderBy("event_type")),

    // Point lookup against the bloom-filtered layout (fixture notes on
    // bloomOrders): a 3-key IN probe on the bloomed column. The predicate
    // reaches the reader as a pushed In filter; with
    // parquet.filter.bloom.enabled (default on) every row group whose
    // bloom rejects all three keys is skipped footer-side. Content is
    // unchanged by the re-layout — the oracle runs the same probe on the
    // ORIGINAL orders. PlanSpec pins the pushed filter; OperatorSpec pins
    // the footer actually carrying the bloom (offset ≥ 0 for o_custkey).
    "src_parquet_bloom" -> ((s, d) =>
      s.read.parquet(bloomOrders(s, d))
        .filter(col("o_custkey").isin(7L, 19L, 23L))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")),

    "src_binary_files" -> ((s, d) => {
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(binFilesDir(s, d))
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
            .cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_hash"))
        .orderBy("doc_id")
    }),

    // Dynamic partition overwrite read-back: the per-year audit over the
    // table whose 1997 partition was replaced in place (see
    // dynOverwriteDir). The oracle reconstructs the expected content from
    // the ORIGINAL orders (+1000 on 1997 rows), so a green row proves the
    // overwrite touched exactly one partition: had static mode deleted
    // the other years, their groups would be missing; had the bump leaked,
    // their sums would drift.
    "sink_dynamic_overwrite" -> ((s, d) => {
      s.read.parquet(dynOverwriteDir(s, d))
        .filter(graft.Contract.finiteOrNull(col("o_totalprice"))) // r19 fuzz: REAL-measure sums
        .groupBy("yr")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr")
    }),

    // Malformed-record handling on a raw CSV drop (PERMISSIVE mode): the
    // schema declares a corrupt-record column, parse failures land there
    // with parseable fields preserved, and ONE pass yields the operational
    // triad — total rows, bad rows, clean-rows aggregate. At 100 TB this
    // is the difference between a pipeline that dies on row
    // 3,000,000,017 (FAILFAST — OperatorSpec pins that it throws), one
    // that silently shrinks (DROPMALFORMED), and one that quarantines and
    // accounts for every byte. The corrupt fraction is deterministic by
    // construction (orderkey % 10 == 3 — see badCsvDir), which is what
    // lets the oracle hash-gate an error-handling path at all.
    "src_csv_malformed" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey LONG, o_totalprice DOUBLE, o_orderpriority STRING, _corrupt STRING")
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(badCsvDir(s, d))
        .agg(count(lit(1)).as("n_rows"),
             count(col("_corrupt")).as("n_bad"),
             round(sum("o_totalprice"), 2).as("sum_good"),
             min(when(col("_corrupt").isNotNull, col("o_orderkey"))).as("first_bad_key"))
    }),

    // The zero-I/O generator source: spark.range synthesizes rows
    // DISTRIBUTED — each of the 32 declared partitions computes its own
    // [start, end) slice locally (RangeExec, whole-stage codegen'd), no
    // file listing, no driver materialization, no shuffle until the
    // aggregation. This is the scale tool for backfills, synthetic
    // benchmark corpora, calendar/dimension enumeration and cross-join
    // seeding; at 100 TB-scale generation the partition count is the only
    // knob that matters (it bounds per-task memory and sets parallelism).
    // The modular arithmetic makes every generated value verifiable
    // cross-engine against DuckDB's range() table function.
    "src_range_generator" -> ((s, d) => {
      s.range(0L, 1000000L, 1L, 32)
        .select((col("id") % 97).as("bucket"),
                ((col("id") * col("id")) % 10007).as("h"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("h").as("sum_h"))
        .orderBy("bucket")
    }),

    // Hive-layout PARTITION DISCOVERY + static partition pruning: read
    // back a dataset laid out as .../yr=YYYY/ (OptOps' partitioned
    // lineitem fixture), where Spark infers the yr column FROM THE
    // DIRECTORY NAMES and a filter on it prunes whole directories at
    // planning time (PartitionFilters in the scan — PlanSpec pins it; the
    // non-matching years' files are never listed into tasks, let alone
    // read). This static twin of opt_dpp_prune is THE layout decision at
    // 100 TB: a date-partitioned corpus makes every time-banded query
    // I/O-proportional to the band, for free, forever.
    "src_partition_discovery" -> ((s, d) => {
      val dir = OptOps.partitionedLineitem(s, d)
      s.read.parquet(dir)
        .filter(col("yr") === 1996)
        .groupBy(month(col("l_shipdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("mo")
    }),

    // PARALLEL JDBC ingest: partitionColumn/bounds/numPartitions split the
    // table into stride predicates (o_custkey ranges), one concurrent
    // connection per partition — the difference between a single-threaded
    // database drain and a parallel lift-out (OperatorSpec pins the 4-way
    // split). Bounds only set the stride: rows OUTSIDE [lower, upper)
    // still land in the first/last slice, so fixed bounds stay CORRECT at
    // any scale factor (though a production lift computes real min/max
    // first — uneven strides serialize on the fat slice). The aggregate
    // result is bound-independent; same oracle as any orders rollup.
    "src_jdbc_partitioned" -> ((s, d) => {
      s.read
        .option("partitionColumn", "o_custkey")
        .option("lowerBound", "0")
        .option("upperBound", "10000")
        .option("numPartitions", "4")
        .jdbc(jdbcOrdersUrl(s, d), "orders_src", derbyProps)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    })
  ))

  val oracle: Map[String, String] = graft.Contract.uniqueMap("ScanOps.oracle", Seq(
    "src_partition_discovery" -> """
      SELECT CAST(month(l_shipdate) AS INT) AS mo,
             count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      WHERE year(l_shipdate) = 1996
      GROUP BY 1
      ORDER BY mo""",

    "src_jdbc_partitioned" -> """
      SELECT o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    "scan_parquet" -> """
      SELECT * FROM lineitem ORDER BY ALL""",

    "scan_pruned" -> """
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",

    // The oracle runs over the harness's gate dir (fixed sf0.01 for the
    // driver; `graft.oracle.sfdir` — set by Verify — for local sweeps at
    // another SF, same convention as every store-path oracle constant).
    "scan_metadata_cols" -> s"""
      SELECT parse_filename(filename) AS file_name,
             count(*) AS n_rows, min(doc_id) AS first_doc
      FROM read_parquet('${graft.StoreDir.oracleSfDir}/documents.parquet', filename=true)
      GROUP BY 1 ORDER BY 1""",

    "scan_filter_pushdown" -> """
      SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      ORDER BY l_orderkey, l_linenumber, l_shipdate, l_extendedprice""",

    "src_jsonlines" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             event_type
      FROM events
      ORDER BY event_id""",

    // Roundtrip is plumbing — the table itself, name_ok true by
    // construction.
    "src_json_roundtrip" -> """
      SELECT n_nationkey, n_name, n_regionkey, true AS name_ok
      FROM nation
      ORDER BY n_nationkey""",

    // gen-1 rows (even keys) read back with a NULL priority — the CASE
    // reconstructs exactly what mergeSchema produces.
    "src_schema_evolution" -> """
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
                  ELSE coalesce(o_orderpriority, '<pre-evolution>') END AS gen,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY 1
      ORDER BY gen""",

    // Compaction is plumbing — the audit over the original orders; a
    // mismatch means the rewrite lost or duplicated rows.
    "sink_compaction" -> """
      SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders""",

    // Roundtrip is plumbing — the audit over the documents table itself;
    // the md5-prefix fold is the same ascii trick as llm_fingerprint's.
    // coalesce mirrors the writer's NULL → '' canonicalization (a text
    // line cannot carry NULL) — identity on the non-null fixture.
    "src_text_roundtrip" -> """
      WITH t AS (
        SELECT doc_id, coalesce(lang, '') AS lang, coalesce(text, '') AS text
        FROM documents)
      SELECT lang, count(*) AS n_docs, count(DISTINCT doc_id) AS n_ids,
             CAST(sum(length(text)) AS BIGINT) AS total_chars,
             CAST(sum(list_reduce(list_transform(range(1, 9), j ->
               CAST(CASE WHEN ascii(substr(md5(text), j, 1)) >= 97
                         THEN ascii(substr(md5(text), j, 1)) - 87
                         ELSE ascii(substr(md5(text), j, 1)) - 48 END AS BIGINT)),
               (a, b) -> a * 16 + b)) AS BIGINT) AS content_sum
      FROM t
      GROUP BY lang
      ORDER BY lang""",

    "src_parquet_zstd" -> """
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      ORDER BY n_nationkey""",

    "src_csv_compressed" -> """
      SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
      FROM supplier ORDER BY s_suppkey""",

    "src_csv_roundtrip" -> """
      SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",

    // The XML writer/reader are plumbing; the oracle is the table itself.
    "src_xml_roundtrip" -> """
      SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",

    // The staged .bin files hold exactly documents.text's UTF-8 bytes for
    // doc_id < 50, so byte counts and md5 digests derive straight from
    // the table; a glob failure (decoy read, or a lost file) breaks the
    // row count or a hash.
    // The JSONL staging derives from events, so the expected aggregate
    // restates from the ORIGINAL columns (k via json path on props) —
    // n == n_ids doubles as the lossless-roundtrip canary.
    "src_json_variant" -> """
      SELECT event_type, count(*) AS n,
             CAST(round(sum(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sv,
             CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sk,
             count(DISTINCT event_id) AS n_ids
      FROM events
      WHERE (value IS NULL OR isfinite(value))
      GROUP BY event_type
      ORDER BY event_type NULLS FIRST""",

    // The re-layout is content-preserving — same probe on ORIGINAL orders.
    "src_parquet_bloom" -> """
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_custkey IN (7, 19, 23)
      ORDER BY o_orderkey""",

    "src_binary_files" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_hash
      FROM documents
      WHERE doc_id < 50 AND length(text) > 0
      ORDER BY doc_id""",

    // Expected table content reconstructed from the ORIGINAL orders: the
    // 1997 bump present, every other year untouched.
    "sink_dynamic_overwrite" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
             round(sum(o_totalprice +
               CASE WHEN year(o_orderdate) = 1997 THEN 1000.0 ELSE 0 END), 2) AS total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY 1
      ORDER BY yr""",

    // The corrupt fraction is the modular rule the fixture was built with.
    "src_csv_malformed" -> """
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE o_orderkey % 10 = 3) AS n_bad,
             round(sum(CASE WHEN o_orderkey % 10 <> 3 THEN o_totalprice END), 2) AS sum_good,
             min(CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey END) AS first_bad_key
      FROM orders""",

    // DuckDB's range() table function is the generator twin (its column is
    // named `range`); HUGEINT sum cast down per convention.
    "src_range_generator" -> """
      SELECT id % 97 AS bucket, count(*) AS n,
             CAST(sum((id * id) % 10007) AS BIGINT) AS sum_h
      FROM (SELECT range AS id FROM range(0, 1000000))
      GROUP BY 1
      ORDER BY bucket""",

    "sink_parquet_partitioned" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE year(o_orderdate) >= 1996
        AND (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY 1
      ORDER BY o_year""",

    // Same MERGE semantics, declaratively: updates win on key overlap,
    // anti-joined base rows survive, inserts are the update keys absent
    // from base.
    // The observed counters must equal the ground-truth aggregation over
    // the same filter — that equality IS what the key demonstrates.
    // Stacked conditional sums spelled as UNION ALL arms; counts BIGINT
    // on both sides.
    // Same exact-micros integer division; epoch_us is DuckDB's
    // unix_micros. events ts is ns in the raw file — epoch_us on the
    // TIMESTAMP read floors to µs exactly like Tables.events' conversion.
    // Same fixed bands, same sorted 10-element PSI fold (list ORDER BY
    // band == sort_array); DuckDB sum(BIGINT) is HUGEINT → cast.
    "obs_drift_psi" -> """
      WITH b AS (
        SELECT CAST(greatest(least(floor(value / 50.0), 9.0), 0.0) AS INTEGER) AS band,
               (ts < TIMESTAMP '2024-01-11') AS is_exp
        FROM events
        WHERE event_type = 'purchase'
          AND (value IS NULL OR isfinite(value))
          AND (ts < TIMESTAMP '2024-01-11' OR ts >= TIMESTAMP '2024-01-21')),
      c AS (
        SELECT band,
               CAST(sum(CASE WHEN is_exp THEN 1 ELSE 0 END) AS BIGINT) AS ne,
               CAST(sum(CASE WHEN is_exp THEN 0 ELSE 1 END) AS BIGINT) AS na
        FROM b GROUP BY band),
      t AS (
        SELECT CAST(sum(ne) AS BIGINT) AS n_expected,
               CAST(sum(na) AS BIGINT) AS n_actual,
               list(struct_pack(ne := ne, na := na) ORDER BY band) AS bs
        FROM c)
      SELECT n_expected, n_actual,
             round(list_sum(list_transform(bs,
               x -> ((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + 5.0)
                     - (CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + 5.0))
                    * ln(((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + 5.0))
                         / ((CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + 5.0))))), 4) AS psi
      FROM t""",

    // Embedding-drift twin: same 6dp-rounded half centroids (the
    // EXPECTED one is the banding reference), dot and norm folds
    // sequential in dim order (list_zip/list_sum mirrors
    // zip_with/aggregate) so the banded cosine is bit-identical before
    // floor(); same 20-band sorted psi fold with the fixed-universe
    // smoothing mass 20*0.5 = 10.
    "obs_drift_embedding" -> s"""
      ${graft.Contract.embIngestCteSql},
      e AS (
        SELECT vec_id, embedding, vec_id % 2 = 0 AS is_exp
        FROM embeddings WHERE embedding IS NOT NULL),
      x AS (
        SELECT vec_id, is_exp, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM e),
      c AS (
        SELECT pos,
               round(avg(CASE WHEN is_exp THEN v END), 6) AS mu_e,
               round(avg(CASE WHEN NOT is_exp THEN v END), 6) AS mu_a
        FROM x GROUP BY pos),
      cl AS (SELECT list(mu_e ORDER BY pos) AS cl FROM c),
      cc AS (
        SELECT round(sum(mu_e * mu_a)
                     / (sqrt(sum(mu_e * mu_e)) * sqrt(sum(mu_a * mu_a))), 4)
                 AS centroid_cos
        FROM c),
      d AS (
        SELECT e.vec_id, e.is_exp,
               list_sum(list_transform(list_zip(e.embedding, cl.cl),
                 z -> CAST(z[1] AS DOUBLE) * z[2])) AS dot,
               sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv,
               sqrt(list_sum(list_transform(cl.cl, m -> m * m))) AS nc
        FROM e CROSS JOIN cl),
      vals AS (SELECT is_exp, dot / (nv * nc) + 1.0 AS val, nv FROM d),
      b AS (
        SELECT CAST(greatest(least(floor(val / 0.1), 19.0), 0.0) AS INTEGER) AS band,
               is_exp
        FROM vals),
      bc AS (
        SELECT band,
               CAST(sum(CASE WHEN is_exp THEN 1 ELSE 0 END) AS BIGINT) AS ne,
               CAST(sum(CASE WHEN is_exp THEN 0 ELSE 1 END) AS BIGINT) AS na
        FROM b GROUP BY band),
      t AS (
        SELECT CAST(sum(ne) AS BIGINT) AS n_expected,
               CAST(sum(na) AS BIGINT) AS n_actual,
               list(struct_pack(ne := ne, na := na) ORDER BY band) AS bs
        FROM bc),
      nrm AS (
        SELECT round(avg(CASE WHEN is_exp THEN nv END), 4) AS avg_norm_exp,
               round(avg(CASE WHEN NOT is_exp THEN nv END), 4) AS avg_norm_act
        FROM vals)
      SELECT t.n_expected, t.n_actual,
             round(list_sum(list_transform(bs,
               x -> ((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + 10.0)
                     - (CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + 10.0))
                    * ln(((CAST(x.na AS DOUBLE) + 0.5) / (n_actual + 10.0))
                         / ((CAST(x.ne AS DOUBLE) + 0.5) / (n_expected + 10.0))))), 4)
               AS psi,
             cc.centroid_cos, nrm.avg_norm_exp, nrm.avg_norm_act
      FROM t CROSS JOIN cc CROSS JOIN nrm""",

    "obs_freshness" -> """
      WITH t AS (
        SELECT event_type, max(epoch_us(ts)) AS mx_us, count(*) AS n
        FROM events GROUP BY 1),
      g AS (SELECT max(epoch_us(ts)) AS gx_us FROM events)
      SELECT event_type, n,
             (gx_us - mx_us) // 60000000 AS lag_min,
             ((gx_us - mx_us) // 60000000 <= 120) AS fresh
      FROM t, g
      ORDER BY event_type NULLS FIRST""",

    // Same grouped rollup with a distinct-band count per QI group; the
    // band is floor(acctbal/2500) computed identically in both engines.
    "obs_l_diversity" -> """
      WITH g AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n,
               count(DISTINCT CAST(floor(CAST(c_acctbal AS DOUBLE) / 2500.0)
                                   AS BIGINT)) AS ldiv
        FROM customer GROUP BY c_nationkey, c_mktsegment),
      t AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_rows, CAST(min(ldiv) AS BIGINT) AS min_l,
               CAST(sum(CASE WHEN ldiv < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
               CAST(sum(CASE WHEN ldiv < 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
               CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3,
               CAST(sum(CASE WHEN ldiv < 3 THEN n ELSE 0 END) AS BIGINT) AS r3,
               CAST(sum(CASE WHEN ldiv < 4 THEN 1 ELSE 0 END) AS BIGINT) AS g4,
               CAST(sum(CASE WHEN ldiv < 4 THEN n ELSE 0 END) AS BIGINT) AS r4
        FROM g)
      SELECT l, min_l, n_groups_below, n_rows_below,
             round(CAST(n_rows_below AS DOUBLE) / n_rows, 4) AS frac_rows_below
      FROM (
        SELECT 2 AS l, min_l, g2 AS n_groups_below, r2 AS n_rows_below, n_rows FROM t
        UNION ALL SELECT 3, min_l, g3, r3, n_rows FROM t
        UNION ALL SELECT 4, min_l, g4, r4, n_rows FROM t)
      ORDER BY l""",

    // Independent EMD restatement: grid (QI groups x full band universe)
    // + window cumulatives instead of the engine's map fold — legal
    // because the numerator is exact integer arithmetic, so ANY
    // evaluation order agrees bit-for-bit. band < 4 keeps the first
    // m-1 = 4 cumulative terms, matching the fold over 0..m-2.
    "obs_t_closeness" -> """
      WITH b AS (
        SELECT c_nationkey AS nk, c_mktsegment AS seg,
               LEAST(GREATEST(CAST(floor((CAST(c_acctbal AS DOUBLE) + 1000.0)
                                         / 2500.0) AS BIGINT), 0), 4) AS band
        FROM customer
        WHERE c_acctbal IS NOT NULL),
      c AS (SELECT nk, seg, band, CAST(count(*) AS BIGINT) AS c
            FROM b GROUP BY 1, 2, 3),
      gt AS (SELECT band, CAST(sum(c) AS BIGINT) AS g FROM c GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM c),
      grp AS (SELECT nk, seg, CAST(sum(c) AS BIGINT) AS n_g
              FROM c GROUP BY 1, 2),
      grid AS (
        SELECT grp.nk, grp.seg, grp.n_g, bands.band,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS c,
               CAST(COALESCE(gt.g, 0) AS BIGINT) AS g
        FROM grp
        CROSS JOIN (SELECT UNNEST(range(0, 5)) AS band) bands
        -- IS NOT DISTINCT FROM: grp/c group on the QI columns, where a
        -- NULL segment IS a group (GROUP BY semantics) — plain equality
        -- here zeroed a fuzzed NULL-seg group's band counts while the
        -- Spark side's groupBy kept them (r21 fuzz)
        LEFT JOIN c ON c.nk IS NOT DISTINCT FROM grp.nk
                   AND c.seg IS NOT DISTINCT FROM grp.seg
                   AND c.band = bands.band
        LEFT JOIN gt ON gt.band = bands.band),
      cum AS (
        SELECT nk, seg, n_g, band,
               CAST(SUM(c) OVER w AS BIGINT) AS cc,
               CAST(SUM(g) OVER w AS BIGINT) AS gc
        FROM grid
        WINDOW w AS (PARTITION BY nk, seg ORDER BY band
                     ROWS UNBOUNDED PRECEDING)),
      e AS (
        SELECT nk, seg, n_g,
               CAST(SUM(CASE WHEN band < 4
                             THEN abs(n_tot * cc - n_g * gc)
                             ELSE 0 END) AS BIGINT) AS num,
               CAST(max(n_tot) AS BIGINT) AS n_tot
        FROM cum, tot GROUP BY nk, seg, n_g),
      t AS (
        SELECT CAST(sum(n_g) AS BIGINT) AS n_rows,
               round(max(CAST(num AS DOUBLE)
                         / (4.0 * n_g * n_tot)), 4) AS max_emd,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 10
                             THEN 1 ELSE 0 END) AS BIGINT) AS g10,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 10
                             THEN n_g ELSE 0 END) AS BIGINT) AS r10,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 20
                             THEN 1 ELSE 0 END) AS BIGINT) AS g20,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 20
                             THEN n_g ELSE 0 END) AS BIGINT) AS r20,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 30
                             THEN 1 ELSE 0 END) AS BIGINT) AS g30,
               CAST(sum(CASE WHEN num * 100 > 4 * n_g * n_tot * 30
                             THEN n_g ELSE 0 END) AS BIGINT) AS r30
        FROM e)
      SELECT t, max_emd, n_groups_above, n_rows_above,
             round(CAST(n_rows_above AS DOUBLE) / n_rows, 4)
               AS frac_rows_above
      FROM (
        SELECT CAST(10 AS DOUBLE) / 100.0 AS t, max_emd,
               g10 AS n_groups_above, r10 AS n_rows_above, n_rows FROM t
        UNION ALL SELECT CAST(20 AS DOUBLE) / 100.0, max_emd, g20, r20,
                         n_rows FROM t
        UNION ALL SELECT CAST(30 AS DOUBLE) / 100.0, max_emd, g30, r30,
                         n_rows FROM t)
      ORDER BY t""",

    // One UNION ALL arm per profiled column; DuckDB's exact
    // count(DISTINCT) and double-cast min/max mirror the stacked plan.
    "obs_profile" -> """
      SELECT col_name, n_rows, n_null,
             round(CAST(n_null AS DOUBLE) / nullif(n_rows, 0), 4) AS frac_null,
             n_distinct, min_v, max_v
      FROM (
        SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_null,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(min(o_orderkey) AS DOUBLE) AS min_v,
               CAST(max(o_orderkey) AS DOUBLE) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT),
               CAST(count(DISTINCT o_custkey) AS BIGINT),
               CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT),
               CAST(count(DISTINCT o_totalprice) AS BIGINT),
               CAST(min(o_totalprice) AS DOUBLE),
               CAST(max(o_totalprice) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT),
               CAST(count(DISTINCT o_orderdate) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders)
      ORDER BY col_name""",

    // One grouped count + one 1-row conditional rollup, unstacked to the
    // same k-table (UNION ALL of the four thresholds).
    "obs_k_anonymity" -> """
      WITH g AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment),
      t AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_rows, CAST(min(n) AS BIGINT) AS min_k,
               CAST(sum(CASE WHEN n < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
               CAST(sum(CASE WHEN n < 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
               CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
               CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS r5,
               CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT) AS g10,
               CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) AS r10,
               CAST(sum(CASE WHEN n < 20 THEN 1 ELSE 0 END) AS BIGINT) AS g20,
               CAST(sum(CASE WHEN n < 20 THEN n ELSE 0 END) AS BIGINT) AS r20
        FROM g)
      SELECT k, min_k, n_groups_below, n_rows_below,
             round(CAST(n_rows_below AS DOUBLE) / n_rows, 4) AS frac_rows_below
      FROM (
        SELECT 2 AS k, min_k, g2 AS n_groups_below, r2 AS n_rows_below, n_rows FROM t
        UNION ALL SELECT 5, min_k, g5, r5, n_rows FROM t
        UNION ALL SELECT 10, min_k, g10, r10, n_rows FROM t
        UNION ALL SELECT 20, min_k, g20, r20, n_rows FROM t)
      ORDER BY k""",

    "obs_dq_checks" -> """
      WITH rl AS (
        SELECT coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS nk,
               coalesce(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END), 0) AS np,
               coalesce(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                          OR o_orderdate >= TIMESTAMP '2002-01-01'
                        THEN 1 ELSE 0 END), 0) AS dr
        FROM orders)
      SELECT rule, CAST(n_violations AS BIGINT) AS n_violations FROM (
        SELECT 'key_not_null' AS rule, nk AS n_violations FROM rl
        UNION ALL SELECT 'positive_amount', np FROM rl
        UNION ALL SELECT 'date_in_range', dr FROM rl
        UNION ALL
        SELECT 'fk_customer_exists', count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'key_unique', count(*) FROM (
          SELECT o_orderkey FROM orders
          GROUP BY o_orderkey HAVING count(*) > 1))
      ORDER BY rule""",

    "obs_metrics" -> """
      SELECT count(*) AS n_rows,
             round(sum(l_quantity), 2) AS sum_qty,
             round(avg(l_discount), 4) AS avg_disc,
             max(l_orderkey) AS max_order
      FROM lineitem
      WHERE l_quantity > 10.0""",

    "sink_merge_upsert" -> """
      WITH upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
               'upd' AS src
        FROM orders WHERE o_orderkey % 2 = 0
          AND (o_totalprice IS NULL OR isfinite(o_totalprice))),
      base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 'base' AS src
        FROM orders WHERE o_orderkey % 5 <> 0
          AND (o_totalprice IS NULL OR isfinite(o_totalprice))),
      merged AS (
        SELECT * FROM upd
        UNION ALL
        SELECT * FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey))
      SELECT o_orderstatus, src, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM merged
      GROUP BY 1, 2
      ORDER BY o_orderstatus, src""",

    "sink_jdbc" -> """
      SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE (o_totalprice IS NULL OR isfinite(o_totalprice))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority NULLS FIRST""",

    "src_orc_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
      FROM orders
      WHERE o_totalprice > 50000.0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "scan_jdbc_pushdown" -> """
      SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE o_totalprice > 300000.0
        AND isfinite(o_totalprice)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""
  ))
}
