package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-H scalar function surface, bundled into one wide query per family.
  * All of these are codegen'd built-ins (whole-stage codegen keeps them in
  * one fused pipeline over the scan — no UDF boundary, no serialization).
  *
  * Oracle-parity notes: DuckDB return types differ from Spark for several
  * functions (year → BIGINT vs INT, ceil → DOUBLE vs LONG, dayofweek 0- vs
  * 1-based…) — each oracle casts/adjusts to match Spark exactly, and doubles
  * from libm (exp/ln/pow) are rounded to 4 decimals on both sides.
  */
object FnOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.Contract.uniqueMap("FnOps.queries", Seq(
    // Spark 4 COLLATIONS: UTF8_LCASE comparisons/distincts evaluate
    // case-insensitively IN the operators (hash-agg keys, equality) —
    // no lower() rewrite of the data, and unlike a lower() projection the
    // collation survives into every downstream comparison. A third of the
    // segments are lowercased first so the two collations genuinely
    // disagree; DuckDB mirrors with lower()-folded equivalents.
    "fn_collation" -> ((s, d) => {
      val segs = Tables.customer(s, d).withColumn("seg",
        when(col("c_custkey") % 3 === 0, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
      segs.agg(
        countDistinct(col("seg")).as("distinct_binary"),
        countDistinct(collate(col("seg"), "UTF8_LCASE")).as("distinct_lcase"),
        count(when(col("seg") === "BUILDING", 1)).as("eq_binary"),
        count(when(collate(col("seg"), "UTF8_LCASE") === "building", 1)).as("eq_lcase"))
    }),

    "fn_string" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
        substring(col("p_name"), 1, 8).as("sub8"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
        .orderBy("p_partkey")
    }),

    "fn_date" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"),
        add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"),
        last_day(col("o_orderdate")).cast("timestamp").as("eom"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    }),

    "fn_math" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("r1"),
        abs(col("l_discount") - 0.05).as("ad"),
        ceil(col("l_extendedprice")).as("ce"),
        floor(col("l_extendedprice")).as("fl"),
        round(sqrt(col("l_quantity")), 4).as("sq"),
        round(exp(col("l_discount")), 4).as("ex"),
        round(log(col("l_extendedprice")), 4).as("ln_p"),
        round(log10(col("l_extendedprice")), 4).as("log10_p"),
        round(pow(col("l_quantity"), 2.0), 2).as("p2"),
        pmod(col("l_orderkey"), lit(7)).as("pm"),
        signum(col("l_discount") - 0.05).as("sg"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Rounding-MODE semantics: round (HALF_UP — ties away from zero) vs
    // bround (HALF_EVEN — banker's, ties to the even neighbor). On a
    // money pipeline the difference compounds: HALF_UP biases every
    // .5-tie upward, HALF_EVEN is unbiased in expectation, which is why
    // accounting standards mandate it — and why an engine must expose
    // BOTH and never silently swap them. The fixture derives exact
    // half-step ties (k/2 − 2.5 is exactly representable), so every row
    // sits ON the tie and the two modes visibly diverge on odd halves.
    // DuckDB spells the pair round/roundbankers with the same contracts.
    "fn_round_modes" -> ((s, d) =>
      Tables.orders(s, d)
        .select(((col("o_orderkey") % 12).cast("double") / 2.0 - 2.5).as("x"))
        .distinct()
        // + 0.0 normalizes IEEE signed zero: DuckDB's roundbankers(-0.5,0)
        // returns -0.0 while BigDecimal HALF_EVEN has no negative zero —
        // equal values, different bytes, hash-fail at the gate (r14).
        .select(col("x"),
          (round(col("x"), 0) + lit(0.0)).as("half_up"),
          (bround(col("x"), 0) + lit(0.0)).as("banker"),
          (round(col("x"), 0) =!= bround(col("x"), 0)).as("differs"))
        .orderBy("x")),

    // IPv4 arithmetic — parse/format/CIDR-test addresses with pure
    // integer expressions (Spark has no inet type; none is needed — an
    // IPv4 is a 32-bit int and CIDR membership is one shift+compare,
    // all whole-stage-codegen'd). Addresses derive deterministically
    // from md5(user_id) (8 hex chars = 32 bits, the engine's standard
    // cross-engine hash idiom), are FORMATTED to dotted-quad, re-PARSED
    // back via split+cast, and classified: RFC1918 private ranges and a
    // /1-prefix test done as integer compares on the parsed value. The
    // round_trips column pins format∘parse = id.
    "fn_ipv4" -> ((s, d) =>
      // a NULL user synthesizes no IP: concat_ws would SKIP the null
      // octets and the round-trip cast would ANSI-crash on ''
      Tables.events(s, d).select(col("user_id")).distinct()
        .filter(col("user_id").isNotNull)
        .withColumn("v",
          conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("long"))
        .withColumn("o1", expr("v div 16777216"))
        .withColumn("o2", expr("(v div 65536) % 256"))
        .withColumn("o3", expr("(v div 256) % 256"))
        .withColumn("o4", expr("v % 256"))
        .select(col("user_id"),
          concat_ws(".", col("o1"), col("o2"), col("o3"), col("o4")).as("ip"),
          col("v").as("ip_num"),
          (col("o1") === 10 ||
           (col("o1") === 172 && col("o2").between(16, 31)) ||
           (col("o1") === 192 && col("o2") === 168)).as("is_private"),
          (col("v") >= 2147483648L).as("upper_half"))
        .withColumn("round_trips",
          expr("""CAST(element_at(split(ip, '\\.'), 1) AS BIGINT) * 16777216
                  + CAST(element_at(split(ip, '\\.'), 2) AS BIGINT) * 65536
                  + CAST(element_at(split(ip, '\\.'), 3) AS BIGINT) * 256
                  + CAST(element_at(split(ip, '\\.'), 4) AS BIGINT)""")
            === col("ip_num"))
        .orderBy("user_id")),

    // Haversine great-circle distances with pure trig expressions — the
    // geo primitive (store-to-customer distance, geofence tests) without
    // any geo extension: coordinates derive deterministically from two
    // disjoint md5 slices per key (lat ∈ [−90, 90), lon ∈ [−180, 180),
    // 2dp grid — cast to DOUBLE before the division: Spark parses 100.0
    // as a DECIMAL literal and would do exact-decimal coordinate math
    // where DuckDB's / is float division, bit-diverging every latitude),
    // the distance is the standard 2R·asin(√…) formula, and
    // everything stays inside whole-stage codegen. 2dp rounding absorbs
    // any cross-engine libm last-ulp drift in sin/cos/asin.
    "fn_haversine" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey"))
        .withColumn("h", md5(col("c_custkey").cast("string")))
        .withColumn("lat1", expr(
          "CAST(CAST(conv(substring(h, 1, 6), 16, 10) AS BIGINT) % 18000 AS DOUBLE) / 100.0 - 90.0"))
        .withColumn("lon1", expr(
          "CAST(CAST(conv(substring(h, 7, 6), 16, 10) AS BIGINT) % 36000 AS DOUBLE) / 100.0 - 180.0"))
        .withColumn("lat2", expr(
          "CAST(CAST(conv(substring(h, 13, 6), 16, 10) AS BIGINT) % 18000 AS DOUBLE) / 100.0 - 90.0"))
        .withColumn("lon2", expr(
          "CAST(CAST(conv(substring(h, 19, 6), 16, 10) AS BIGINT) % 36000 AS DOUBLE) / 100.0 - 180.0"))
        .withColumn("dist_km", round(expr(
          """2.0 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat2 - lat1) / 2), 2)
               + cos(radians(lat1)) * cos(radians(lat2))
                 * pow(sin(radians(lon2 - lon1) / 2), 2)))"""), 2))
        .select(col("c_custkey"), col("lat1"), col("lon1"), col("lat2"),
                col("lon2"), col("dist_km"),
                (col("dist_km") <= 5000.0).as("within_5000km"))
        .orderBy("c_custkey")),

    // Binary-codec surface: base64/unbase64 and hex/unhex with explicit
    // UTF-8 decode on the way back — the interchange primitives for
    // embedding opaque bytes in text protocols (webhook payloads, JSON
    // envelopes). Both roundtrip columns pin decode∘encode = id; all
    // four functions are codegen'd built-ins over the scan, no UDF.
    "fn_base64_codec" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 24).as("head"))
        .select(col("doc_id"),
          base64(col("head").cast("binary")).as("b64"),
          hex(col("head")).as("hx"),
          (decode(unbase64(base64(col("head").cast("binary"))), "UTF-8")
            === col("head")).as("b64_rt"),
          (decode(unhex(hex(col("head"))), "UTF-8") === col("head"))
            .as("hex_rt"))
        .orderBy("doc_id")),

    // Generator NULL semantics: explode vs explode_outer. A plain explode
    // silently DROPS rows whose array is empty — in an ETL flatten that
    // means parent records vanish from the output (the join-shaped twin
    // of INNER-vs-LEFT). explode_outer keeps the parent with a NULL
    // element. The fixture array ("rare" long tokens per doc) is empty
    // for ~20% of docs, so both semantics are exercised; n_rare makes the
    // empty-parent rows self-describing. DuckDB has no outer unnest —
    // the oracle states the semantics via a [NULL] substitution, which is
    // also its cleanest documentation.
    "fn_explode_outer" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> length(t) >= 8)").as("rare"))
        .select(col("doc_id"), size(col("rare")).as("n_rare"),
                explode_outer(col("rare")).as("token"))
        .orderBy(col("doc_id"), col("token").asc_nulls_first)),

    "fn_array" -> ((s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 5).as("first"),
        round(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
                        lit(0.0), (acc, x) => acc + x), 4).as("sq_norm"),
        size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("head_sum"))
        .orderBy("vec_id")
    }),

    "fn_map" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(
          col("event_id"),
          size(col("m")).as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(col("m"), "k").as("k_val"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").as("absent"))
        .orderBy("event_id")
    }),

    // Spark 4's VARIANT type — the open-format semi-structured path (the
    // same binary-variant design parquet adopted): parse ONCE into the
    // typed binary encoding, then field accesses are O(field) reads of the
    // encoded value, not per-access string re-parses like get_json_object.
    // At 100 TB the difference is parsing the JSON blob once per row vs
    // once per extracted field per row. schema_of_variant documents the
    // inferred shape; the typed variant_get gives post-cast SQL types.
    "fn_variant" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'string')").as("absent"),
          expr("schema_of_variant(v)").as("vschema"))
        .orderBy("event_id")
    }),

    "fn_conditional" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        when(col("c_acctbal") < 0, "debt").otherwise("credit").as("bal_band"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("pos_bal"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("capped"),
        nvl(nullif(col("c_name"), lit("")), lit("anon")).as("name_nn"))
        .orderBy("c_custkey")
    }),

    // Bitwise surface: scalar shifts/xor plus the bit_and/or/xor
    // AGGREGATES (bitmap-style rollups — flag unions over partitioned
    // data, codegen'd with map-side partial aggregation like any hash agg).
    "fn_bitwise" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("bit_and(l_orderkey)").as("ba"),
          expr("bit_or(l_orderkey)").as("bo"),
          expr("bit_xor(l_orderkey)").as("bx"),
          min(expr("shiftleft(l_orderkey, 2) ^ l_partkey")).as("mixed_min"),
          max(expr("shiftright(l_orderkey, 1) | l_linenumber")).as("mixed_max"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Cryptographic content digests — the content-addressing primitive
    // (dedup fingerprints, cache keys, provenance ids): md5 + sha256 hex
    // over each document's text. Row-local codegen'd built-ins; at 100 TB
    // this is the map-side pass every exact-dedup/freshness pipeline
    // starts with (llm_exact_dedup builds on exactly this md5).
    "fn_hash_digests" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
                md5(col("text").cast("binary")).as("md5_hex"),
                sha2(col("text").cast("binary"), 256).as("sha256_hex"))
        .orderBy("doc_id")),

    // Edit-distance (Levenshtein) fuzzy matching — the entity-resolution /
    // typo-tolerant-lookup primitive: distance of every part name to a
    // probe string, kept when within 6 edits, plus a bounded variant
    // (Spark's 3-arg levenshtein stops the DP early at the threshold —
    // the version to use in a 100 TB fuzzy join, where the full DP on
    // clearly-distant pairs is wasted work). Row-local, codegen'd,
    // embarrassingly parallel; the selective filter keeps output bounded.
    "fn_edit_distance" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"),
                levenshtein(col("p_name"), lit("large widget")).as("dist"),
                levenshtein(col("p_name"), lit("large widget"), 3).as("dist_capped"))
        .filter(col("dist") <= 6)
        .orderBy("p_partkey")
    }),

    // try_* error-safe arithmetic — the ANSI-mode survival kit. Spark 4
    // runs ANSI by default, so plain division-by-zero / overflow / bad
    // casts FAIL the job; at 100 TB one malformed row out of a trillion
    // must not kill a 6-hour pipeline, and the try_ family is the
    // per-expression remedy (NULL instead of error, no session-wide
    // ansi=off hammer). Each column exercises one failure class:
    // div-by-zero, BIGINT and INT overflow, unparseable cast, and
    // out-of-bounds array index (note: try_element_at forgives only
    // out-of-RANGE indexes — index 0 is a structural error it still
    // raises, so the index expression is kept in 1..4). DuckDB has no
    // try_ arithmetic, so
    // the oracle reconstructs each NULL-domain with an explicit CASE —
    // which also documents exactly where the nulls come from.
    "fn_try_arith" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        round(expr("try_divide(value, CAST(user_id % 5 AS DOUBLE))"), 4).as("div_mod5"),
        expr("try_multiply(user_id, 9223372036854775807L)").as("mul_of"),
        expr("try_add(CAST(user_id AS INT), 2147483647)").as("add_of"),
        expr("try_cast(CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS STRING) " +
             "ELSE event_type END AS BIGINT)").as("parsed"),
        expr("try_element_at(array(10, 20, 30), CAST(event_id % 4 + 1 AS INT))").as("elem"))
        .orderBy("event_id")
    }),

    // Nested STRUCT surface: build (struct / nested struct / array of
    // structs), dot-path access through two levels, and field access
    // through higher-order array ops (filter on a field, fold over a
    // field). Structs are Spark's native nested row type — all of this is
    // codegen'd per-row expression work with zero shuffle; at 100 TB the
    // point is that a struct column is COLUMNAR in parquet (each leaf its
    // own column chunk), so building/accessing structs costs nothing at
    // the storage layer — see opt_nested_schema_pruning for the read-side
    // leaf pruning this enables.
    "fn_struct_nested" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("cust", struct(
          col("c_name").as("name"),
          round(col("c_acctbal"), 2).as("bal"),
          struct(col("c_nationkey").as("nation"),
                 col("c_mktsegment").as("seg")).as("geo")))
        .withColumn("tags", array(
          struct(lit("bal").as("k"), round(col("c_acctbal"), 2).as("v")),
          struct(lit("half").as("k"), round(col("c_acctbal") / 2, 4).as("v"))))
        .select(
          col("c_custkey"),
          col("cust.name").as("name"),
          col("cust.geo.nation").as("nation"),
          col("cust.geo.seg").as("seg"),
          element_at(filter(col("tags"), t => t.getField("k") === "half"), 1)
            .getField("v").as("half_bal"),
          round(aggregate(col("tags"), lit(0.0),
                          (acc, t) => acc + t.getField("v")), 4).as("tag_sum"))
        .orderBy("c_custkey")
    }),

    // Regex family: extract (group ref), extract-all count, global replace,
    // boolean match, regex split. Patterns stay in the RE2∩Java-regex
    // common subset ([a-z] classes, no backrefs/lookaround) so Spark and
    // DuckDB agree byte-for-byte. All codegen'd built-ins over a pruned
    // 2-column scan.
    "fn_regex" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("head40", substring(col("text"), 1, 40))
        .select(
          col("doc_id"),
          regexp_extract(col("head40"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          expr("size(regexp_extract_all(head40, '[a-z]+', 0))").as("n_words40"),
          regexp_replace(col("head40"), "[aeiou]", "#").as("devoweled"),
          col("text").rlike("table .* value").as("has_tv"),
          size(split(col("text"), "\\s+")).as("n_split"))
        .orderBy("doc_id")
    })
  ))

  val oracle: Map[String, String] = graft.Contract.uniqueMap("FnOps.oracle", Seq(
    // Same md5-slice coordinates (('0x'||…)::BIGINT) and the same
    // literal haversine chain; radians() exists in both engines.
    "fn_haversine" -> """
      WITH h AS (
        SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS h
        FROM customer),
      c AS (
        SELECT c_custkey,
               ('0x' || substring(h, 1, 6))::BIGINT % 18000 / 100.0 - 90.0 AS lat1,
               ('0x' || substring(h, 7, 6))::BIGINT % 36000 / 100.0 - 180.0 AS lon1,
               ('0x' || substring(h, 13, 6))::BIGINT % 18000 / 100.0 - 90.0 AS lat2,
               ('0x' || substring(h, 19, 6))::BIGINT % 36000 / 100.0 - 180.0 AS lon2
        FROM h),
      f AS (
        SELECT *, round(2.0 * 6371.0 * asin(sqrt(
                 pow(sin(radians(lat2 - lat1) / 2), 2)
                 + cos(radians(lat1)) * cos(radians(lat2))
                   * pow(sin(radians(lon2 - lon1) / 2), 2))), 2) AS dist_km
        FROM c)
      SELECT c_custkey, lat1, lon1, lat2, lon2, dist_km,
             (dist_km <= 5000.0) AS within_5000km
      FROM f ORDER BY c_custkey""",

    // Same md5-slice address derivation; DuckDB's div is // and hex
    // parse is the ('0x'||…)::BIGINT idiom.
    "fn_ipv4" -> """
      WITH v AS (
        SELECT DISTINCT user_id,
               ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS v
        FROM events WHERE user_id IS NOT NULL),
      o AS (
        SELECT user_id, v,
               v // 16777216 AS o1, (v // 65536) % 256 AS o2,
               (v // 256) % 256 AS o3, v % 256 AS o4
        FROM v),
      f AS (
        SELECT user_id, v AS ip_num,
               o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
               (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                OR (o1 = 192 AND o2 = 168)) AS is_private,
               (v >= 2147483648) AS upper_half
        FROM o)
      SELECT user_id, ip, ip_num, is_private, upper_half,
             (CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
              + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
              + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
              + CAST(string_split(ip, '.')[4] AS BIGINT)) = ip_num AS round_trips
      FROM f ORDER BY user_id""",

    // DuckDB codecs are blob-typed: to_base64/from_base64 + decode()
    // back to VARCHAR; hex is uppercase in both engines.
    "fn_base64_codec" -> """
      WITH h AS (
        SELECT doc_id, substring(text, 1, 24) AS head FROM documents)
      -- encode(): the UTF-8 STRING->BLOB conversion (::BLOB requires
      -- ascii-only and crashes on multi-byte text — r19 fuzz)
      SELECT doc_id,
             to_base64(encode(head)) AS b64,
             hex(head) AS hx,
             (decode(from_base64(to_base64(encode(head)))) = head) AS b64_rt,
             (decode(unhex(hex(head))) = head) AS hex_rt
      FROM h ORDER BY doc_id""",

    "fn_hash_digests" -> """
      SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
      FROM documents
      ORDER BY doc_id""",

    // DuckDB has no thresholded levenshtein — the CASE reconstructs
    // Spark's -1-past-threshold contract; casts align INTEGER widths.
    "fn_edit_distance" -> """
      SELECT p_partkey, p_name,
             CAST(levenshtein(p_name, 'large widget') AS INTEGER) AS dist,
             CAST(CASE WHEN levenshtein(p_name, 'large widget') > 3 THEN -1
                       ELSE levenshtein(p_name, 'large widget') END
                  AS INTEGER) AS dist_capped
      FROM part
      WHERE levenshtein(p_name, 'large widget') <= 6
      ORDER BY p_partkey""",

    // Each try_* NULL-domain reconstructed with CASE (DuckDB would raise
    // on the error arms, so the CASE guards keep them unevaluated).
    "fn_try_arith" -> """
      SELECT event_id,
             CASE WHEN user_id % 5 = 0 THEN NULL
                  ELSE round(value / (user_id % 5), 4) END AS div_mod5,
             CASE WHEN user_id = 0 THEN 0
                  WHEN user_id = 1 THEN 9223372036854775807
                  ELSE NULL END AS mul_of,
             CASE WHEN user_id = 0 THEN 2147483647 ELSE CAST(NULL AS INT) END AS add_of,
             TRY_CAST(CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS VARCHAR)
                           ELSE event_type END AS BIGINT) AS parsed,
             CASE event_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 20 WHEN 2 THEN 30
                  ELSE CAST(NULL AS INT) END AS elem
      FROM events
      ORDER BY event_id""",

    "fn_collation" -> """
      WITH segs AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg
        FROM customer)
      SELECT count(DISTINCT seg) AS distinct_binary,
             count(DISTINCT lower(seg)) AS distinct_lcase,
             count(*) FILTER (WHERE seg = 'BUILDING') AS eq_binary,
             count(*) FILTER (WHERE lower(seg) = 'building') AS eq_lcase
      FROM segs""",

    "fn_string" -> """
      SELECT p_partkey,
             lower(p_name) AS lo,
             upper(p_brand) AS up,
             trim('  ' || p_type || ' ') AS trimmed,
             substring(p_name, 1, 8) AS sub8,
             lpad(p_brand, 12, '*') AS padded,
             replace(p_name, ' ', '_') AS underscored,
             CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
             CASE WHEN p_name IS NULL THEN NULL
                  ELSE coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') END AS first_word,
             CAST(levenshtein(p_brand, p_type) AS INTEGER) AS lev,
             CAST(length(p_name) AS INTEGER) AS len,
             concat_ws('|', p_brand, p_type) AS joined
      FROM part
      ORDER BY p_partkey""",

    "fn_date" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             date_trunc('month', o_orderdate) AS month_start,
             CAST(date_diff('day', TIMESTAMP '1995-01-01', date_trunc('day', o_orderdate)) AS INTEGER) AS days_since,
             o_orderdate + INTERVAL 3 MONTH AS plus3m,
             CAST(last_day(o_orderdate) AS TIMESTAMP) AS eom,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders
      ORDER BY o_orderkey""",

    "fn_math" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 1) AS r1,
             abs(l_discount - 0.05) AS ad,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             round(sqrt(l_quantity), 4) AS sq,
             round(exp(l_discount), 4) AS ex,
             round(ln(l_extendedprice), 4) AS ln_p,
             round(log10(l_extendedprice), 4) AS log10_p,
             round(pow(l_quantity, 2.0), 2) AS p2,
             ((l_orderkey % 7) + 7) % 7 AS pm,
             -- NaN seam (r19 fuzz): Spark's signum PROPAGATES NaN while
             -- DuckDB's sign(NaN) = 0 — mirror Spark's IEEE behavior
             CASE WHEN isnan(l_discount - 0.05) THEN 'NaN'::DOUBLE
                  ELSE CAST(sign(l_discount - 0.05) AS DOUBLE) END AS sg
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""",

    // DuckDB's round on DOUBLE is C half-away-from-zero == Spark HALF_UP
    // on every tie; roundbankers == bround (HALF_EVEN).
    "fn_round_modes" -> """
      WITH x AS (
        SELECT DISTINCT CAST(o_orderkey % 12 AS DOUBLE) / 2.0 - 2.5 AS x
        FROM orders)
      SELECT x, round(x, 0) + 0.0 AS half_up, roundbankers(x, 0) + 0.0 AS banker,
             (round(x, 0) <> roundbankers(x, 0)) AS differs
      FROM x ORDER BY x""",

    // Outer-unnest emulation: an empty list becomes [NULL] so the parent
    // row survives — exactly explode_outer's contract.
    "fn_explode_outer" -> """
      WITH r AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> length(t) >= 8) AS rare
        FROM documents)
      SELECT doc_id, CAST(len(rare) AS INTEGER) AS n_rare,
             unnest(CASE WHEN rare IS NULL OR len(rare) = 0 THEN [NULL] ELSE rare END) AS token
      FROM r
      ORDER BY doc_id, token ASC NULLS FIRST""",

    "fn_array" -> s"""
      ${graft.Contract.embIngestCteSql}
      SELECT vec_id,
             CAST(len(embedding) AS INTEGER) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 5) AS first,
             round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4) AS sq_norm,
             CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
             round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 4) AS head_sum
      FROM embeddings
      ORDER BY vec_id""",

    "fn_map" -> """
      SELECT event_id,
             CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
             array_to_string(json_keys(props), ',') AS keys,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      FROM events
      ORDER BY event_id""",

    "fn_json" -> """
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
             json_extract_string(props, '$.missing') AS absent
      FROM events
      ORDER BY event_id""",

    // DuckDB has no VARIANT; the oracle checks the VALUES the variant path
    // must produce — json extraction + the known object shape.
    "fn_variant" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
             json_extract_string(props, '$.k') AS k_str,
             json_extract_string(props, '$.missing') AS absent,
             'OBJECT<k: BIGINT>' AS vschema
      FROM events
      ORDER BY event_id""",

    "fn_conditional" -> """
      SELECT c_custkey,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
             CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_band,
             round(greatest(c_acctbal, 0.0), 2) AS pos_bal,
             round(least(c_acctbal, 1000.0), 2) AS capped,
             coalesce(nullif(c_name, ''), 'anon') AS name_nn
      FROM customer
      ORDER BY c_custkey""",

    "fn_bitwise" -> """
      SELECT l_returnflag,
             CAST(bit_and(l_orderkey) AS BIGINT) AS ba,
             CAST(bit_or(l_orderkey) AS BIGINT) AS bo,
             CAST(bit_xor(l_orderkey) AS BIGINT) AS bx,
             CAST(min(xor(l_orderkey << 2, l_partkey)) AS BIGINT) AS mixed_min,
             CAST(max((l_orderkey >> 1) | l_linenumber) AS BIGINT) AS mixed_max,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // DuckDB struct_pack + dot access + lambda field refs mirror the
    // Spark struct surface one-to-one.
    "fn_struct_nested" -> """
      WITH base AS (
        SELECT c_custkey,
               struct_pack(name := c_name, bal := round(c_acctbal, 2),
                           geo := struct_pack(nation := c_nationkey,
                                              seg := c_mktsegment)) AS cust,
               [struct_pack(k := 'bal', v := round(c_acctbal, 2)),
                struct_pack(k := 'half', v := round(c_acctbal / 2, 4))] AS tags
        FROM customer)
      SELECT c_custkey,
             cust.name AS name,
             cust.geo.nation AS nation,
             cust.geo.seg AS seg,
             list_filter(tags, t -> t.k = 'half')[1].v AS half_bal,
             round(list_sum(list_transform(tags, t -> t.v)), 4) AS tag_sum
      FROM base
      ORDER BY c_custkey""",

    "fn_regex" -> """
      WITH h AS (SELECT doc_id, text, substring(text, 1, 40) AS head40 FROM documents)
      SELECT doc_id,
             CASE WHEN head40 IS NULL THEN NULL
                  ELSE coalesce(regexp_extract(head40, '([a-z]+) ([a-z]+)', 2), '') END AS second_word,
             CAST(len(regexp_extract_all(head40, '[a-z]+')) AS INTEGER) AS n_words40,
             regexp_replace(head40, '[aeiou]', '#', 'g') AS devoweled,
             regexp_matches(text, 'table .* value') AS has_tv,
             CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_split
      FROM h
      ORDER BY doc_id"""
  ))
}
