package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2-B projection/filter, §2-F sort/limit/top-k, §2-G set operations.
  *
  * Scale notes (100 TB): `limit_topn` compiles to TakeOrderedAndProject —
  * a per-partition top-N then a single driver-side merge of N×partitions
  * rows, never a full sort. `topk_per_group` shuffles once on the group key
  * and sorts within partitions. The set ops are aggregate-style (distinct =
  * shuffle on the full row); union_all is shuffle-free.
  */
object RelOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.Contract.uniqueMap("RelOps.queries", Seq(
    // ---- B. projection / predicates ----
    // revenue rounded to 4 (the product of two 2-decimal values has exactly
    // 4 decimal digits — rounding at 2 hits .xx5 ties where Spark HALF_UP
    // and DuckDB double-rounding disagree; at 4 both recover the exact value).
    // (l_orderkey, l_linenumber) is not unique → order by all output cols.
    "proj_expr" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_status"),
        when(col("l_quantity") > 40, "heavy")
          .when(col("l_quantity") > 20, "mid")
          .otherwise("light").as("qty_band"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "flag_status", "qty_band")
    }),

    "filter_in_between_like" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(50000, 200000) &&
          (col("o_orderstatus").like("F%") || col("o_orderstatus") === "O") &&
          col("o_orderdate").isNotNull)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- F. sort / limit / top-k ----
    "sort_multi" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_returnflag").desc, col("l_shipdate").asc,
                 col("l_orderkey").asc, col("l_linenumber").asc, col("l_quantity").asc)
    }),

    "limit_topn" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
    }),

    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    }),

    // ---- G. set operations ----
    "set_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"), lit("1996-01-31").cast("timestamp")))
        .select(col("o_orderkey"), col("o_custkey"), lit("jan").as("tag"))
      val feb = o.filter(col("o_orderdate").between(lit("1996-02-01").cast("timestamp"), lit("1996-02-29").cast("timestamp")))
        .select(col("o_orderkey"), col("o_custkey"), lit("feb").as("tag"))
      jan.unionByName(feb).orderBy("o_orderkey")
    }),

    "set_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1).select("o_custkey")
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2).select("o_custkey")
      jan.union(feb).distinct().orderBy("o_custkey")
    }),

    "set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1).select("o_custkey")
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2).select("o_custkey")
      jan.intersect(feb).orderBy("o_custkey")
    }),

    "set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1).select("o_custkey")
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2).select("o_custkey")
      jan.except(feb).orderBy("o_custkey")
    }),

    // MULTISET difference (EXCEPT ALL): keeps per-key multiplicity —
    // jan-orders minus one occurrence per feb-order of the same customer.
    // Result is re-aggregated (multiset row order is nondeterministic);
    // same left-anti-with-counts plan DuckDB runs.
    "set_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1).select("o_custkey")
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2).select("o_custkey")
      jan.exceptAll(feb)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy("o_custkey")
    }),

    // MULTISET intersection (INTERSECT ALL): keeps min(count_left,
    // count_right) occurrences per key — jan-orders matched one-to-one
    // with feb-orders of the same customer. Same re-aggregated output
    // convention as set_except_all; Spark plans intersectAll as one
    // count-pair aggregate + generator, a single shuffle on the key.
    "set_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val jan = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 1).select("o_custkey")
      val feb = o.filter(year(col("o_orderdate")) === 1996 && month(col("o_orderdate")) === 2).select("o_custkey")
      jan.intersectAll(feb)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy("o_custkey")
    }),

    // Snapshot diff / CDC derivation — the reverse of sink_merge_upsert:
    // given two full table versions, emit WHICH keys were added, deleted
    // or changed (the delta a downstream incremental consumer needs when
    // upstream only republishes snapshots). The next snapshot is derived
    // deterministically from orders (keys %13 dropped, %7 repriced, %11
    // cloned under shifted keys), so the oracle can state the expected
    // delta analytically — an independent derivation, not a re-run of the
    // diff. See [[snapshotDiff]] for the one-shuffle mechanics.
    "set_snapshot_diff" -> ((s, d) => {
      val base = Tables.orders(s, d)
      val kept = base.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      // clone keys mapped to -k-1: strictly negative for every real key
      // (orderkeys are ≥ 0 — the corpus DOES carry key 0, whose plain
      // negation is itself), so clones can never collide with real keys
      // at ANY scale factor, where a fixed +10M shift would overlap real
      // keys from sf≈2 up and silently turn expected 'added' rows into
      // fan-out 'changed' ones
      val added = base.filter(col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", -col("o_orderkey") - 1)
      snapshotDiff(base, kept.unionByName(added), Seq("o_orderkey"))
        .orderBy("o_orderkey", "change")
    })
  ))

  /** (keys..., change ∈ added|deleted|changed) between two snapshot
    * versions of one table. Each side collapses to (key, multiset
    * fingerprint) AT THE SCAN — two salted xxhash64 of
    * to_json(non-key struct), codegen'd per-row, summed per key — so the
    * one full-outer shuffle joins key+~3-number rows, never the payload.
    * At 100 TB both snapshots shuffle once on the key — the floor for
    * snapshot CDC; co-bucketed layouts (join_bucketed) remove even that
    * exchange. Unchanged keys (fingerprints equal) are dropped in the
    * same stage. Equal rows serialize to equal JSON, so the
    * classification is exact up to the ~2^-128 hash-collision bound. */
  private[graft] def snapshotDiff(base: DataFrame, next: DataFrame,
                                  keys: Seq[String]): DataFrame = {
    def fp(df: DataFrame, keyAs: String => String, h: String): DataFrame = {
      val others = df.columns.filterNot(keys.contains).sorted
      // ONE fingerprint per KEY over the MULTISET of per-row hashes
      // (r19 fuzz: a duplicate-key snapshot must not fan out 2x2 in the
      // full outer; key-level CDC over a possibly-multirow key is the
      // defined semantics — deleting one COPY of a duplicated row reads
      // as 'changed', which is exactly right). r20 (ADVICE r19): the
      // multiset digest is an ORDER-INDEPENDENT COMMUTATIVE combine —
      // (count, sum h1, sum h2) over two independently-salted 64-bit row
      // hashes — instead of md5(sorted collect_list): sums flow through
      // the map-side partial aggregate in constant memory per key, so a
      // hot key with millions of duplicate rows never concentrates a
      // row-hash buffer on one task. Sums accumulate in DECIMAL(38,0)
      // (exact; ANSI-safe — BIGINT sums would overflow-throw) — equal
      // multisets give equal triples, unequal ones collide with ~2^-128
      // probability, the same bound the md5 digest carried.
      val json = to_json(struct(others.map(col): _*))
      val dec = "decimal(38,0)"
      df.select(keys.map(k => col(k).as(keyAs(k))) :+
          xxhash64(json).cast(dec).as("rh1") :+
          xxhash64(json, lit("graft_fp_salt2")).cast(dec).as("rh2"): _*)
        .groupBy(keys.map(k => col(keyAs(k))): _*)
        .agg(struct(count(lit(1)).as("n"), sum("rh1").as("h1"),
                    sum("rh2").as("h2")).as(h))
    }
    // NULL-SAFE key equality (<=>): a plain equi-join never matches NULL
    // keys, which would misreport an unchanged null-keyed row as a
    // deleted+added pair; the output key coalesces the two sides
    val b = fp(base, k => s"${k}__b", "bh")
    val n = fp(next, k => s"${k}__n", "nh")
    val cond = keys.map(k => col(s"${k}__b") <=> col(s"${k}__n")).reduce(_ && _)
    b.join(n, cond, "full_outer")
      .withColumn("change",
        when(col("bh").isNull, "added")
          .when(col("nh").isNull, "deleted")
          .when(col("bh") =!= col("nh"), "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"${k}__b"), col(s"${k}__n")).as(k)) :+ col("change"): _*)
  }

  val oracle: Map[String, String] = graft.Contract.uniqueMap("RelOps.oracle", Seq(
    "proj_expr" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 4) AS revenue,
             l_returnflag || '-' || l_linestatus AS flag_status,
             CASE WHEN l_quantity > 40 THEN 'heavy'
                  WHEN l_quantity > 20 THEN 'mid'
                  ELSE 'light' END AS qty_band
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, revenue NULLS FIRST, flag_status, qty_band""",

    "filter_in_between_like" -> """
      SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_totalprice BETWEEN 50000 AND 200000
        AND (o_orderstatus LIKE 'F%' OR o_orderstatus = 'O')
        AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey""",

    "sort_multi" -> """
      SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      ORDER BY l_returnflag DESC, l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC""",

    "limit_topn" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 100""",

    "topk_per_group" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
      FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               CAST(row_number() OVER (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS INTEGER) AS rn
        FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, rn""",

    "set_union_all" -> """
      SELECT o_orderkey, o_custkey, 'jan' AS tag FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-01-31'
      UNION ALL
      SELECT o_orderkey, o_custkey, 'feb' AS tag FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-02-01' AND TIMESTAMP '1996-02-29'
      ORDER BY o_orderkey""",

    "set_union_distinct" -> """
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
      UNION
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
      ORDER BY o_custkey""",

    "set_intersect" -> """
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
      ORDER BY o_custkey""",

    "set_except" -> """
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
      ORDER BY o_custkey
      """,

    "set_except_all" -> """
      WITH m AS (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2)
      SELECT o_custkey, count(*) AS n
      FROM m
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    "set_intersect_all" -> """
      WITH m AS (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2)
      SELECT o_custkey, count(*) AS n
      FROM m
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    // The EXPECTED delta stated analytically from the derivation rules —
    // an independent statement of what the diff must find, not a re-run
    // of the fingerprint join.
    // DISTINCT per arm: the diff is KEY-level (one multiset fingerprint
    // per key), so duplicate-PK rows yield one verdict per key. The
    // changed arm also excludes NaN/Inf prices: +10 on an IEEE special
    // is a fixed point, so the fingerprint doesn't move (r19 fuzz).
    "set_snapshot_diff" -> """
      SELECT DISTINCT -o_orderkey - 1 AS o_orderkey, 'added' AS change
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT DISTINCT o_orderkey, 'deleted' FROM orders WHERE o_orderkey % 13 = 0
      UNION ALL
      SELECT DISTINCT o_orderkey, 'changed'
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        AND o_totalprice IS NOT NULL AND isfinite(o_totalprice)
      ORDER BY o_orderkey, change"""
  ))
}
