package graft.ops

import graft.Tables
import graft.functions.CosineSimilarity
import graft.plans.{CosineBandedJoin, GraftRules}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §7.6 optimizer-rule demonstration keys. Each query is deliberately
  * written in its NAIVE all-pairs form — the banded plan exists only
  * because the optimizer rule rewrites it. That makes the correctness gate
  * a true end-to-end test of the rule:
  *
  *  - opt_hamming_rewrite's oracle is the plain all-pairs predicate. The
  *    rewrite is provably exact (pigeonhole), so if the rule fires the row
  *    matches; if the rule silently stops firing the query still returns
  *    the same (slow, nested-loop) answer — correctness never regresses,
  *    and RewriteSpec pins the plan shape so the speedup can't silently
  *    vanish either.
  *
  *  - opt_cosine_rewrite's oracle mirrors the banded DEFINITION (sign-bit
  *    16×4 candidates + exact confirm — deterministic; see
  *    BandedJoinRules for why no exact cosine banding exists). Here the
  *    gate cuts the other way: if the rule does NOT fire, Spark returns
  *    the exact all-pairs answer, the row mismatches, and the gate fails —
  *    so a green row proves the rule fired and produced exactly the
  *    declared banded semantics.
  */
object OptOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Naive all-pairs SimHash pair query (same signatures as llm_simhash):
    // a cross join with only `doc_a < doc_b AND bit_count(xor) <= 4` — no
    // equi key anywhere in the source. HammingBandedJoin turns it into the
    // 5-band bucketed equi-join.
    "opt_hamming_rewrite" -> ((s, d) => {
      GraftRules.install(s)
      val sigs = LlmOps.simhashSigs(s, d, LlmOps.TextHash)
      val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, col("doc_a") < col("doc_b") &&
          expr("bit_count(sig_a ^ sig_b) <= 4"))
        .select(col("doc_a"), col("doc_b"),
                expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)").as("hamming"))
        .orderBy("doc_a", "doc_b")
    }),

    // Naive all-pairs cosine-threshold query. With the opt-in conf set,
    // CosineBandedJoin rewrites it to sign-bit banded candidates + exact
    // confirm. The conf is scoped tightly: the result is materialized into
    // the cache WHILE the conf is on (rewrites happen at optimization
    // time, i.e. at action time, not DataFrame-construction time), then
    // the conf is unset so no other query in the session — in particular
    // llm_neardup_embedding's exact all-pairs — can be rewritten.
    "opt_cosine_rewrite" -> ((s, d) => {
      GraftRules.install(s)
      CosineSimilarity.register(s)
      // Declared 1000-vector subset: at τ=0.3 sign-bit banding only prunes
      // ~half of all pairs (see BandedJoinRules — the loose-threshold
      // regime is where LSH fundamentally can't win), so the uncapped demo
      // would spend bench time proving nothing extra about the RULE. The
      // rewrite fires identically on the subset. Wide scan: the rewritten
      // plan's probe side inherits the scan's parallelism, and a one-file
      // test-scale scan would run the whole banded probe in ONE task
      // (measured ~80% of this key's cost).
      val e = Tables.embeddingsWide(s, d).filter(col("vec_id") < 1000)
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      s.conf.set(CosineBandedJoin.ConfKey, "true")
      try {
        val out = a.join(b, col("a_id") < col("b_id") &&
            call_function("graft_cosine", col("a_emb"), col("b_emb")) >= 0.3)
          .select(col("a_id"), col("b_id"),
            round(call_function("graft_cosine", col("a_emb"), col("b_emb")), 4).as("cos"))
          .orderBy("a_id", "b_id")
        out.cache()
        out.count()
        out
      } finally s.conf.unset(CosineBandedJoin.ConfKey)
    })
  )

  val oracle: Map[String, String] = Map(
    // Exact rewrite ⇒ the honest all-pairs predicate (same as llm_simhash).
    "opt_hamming_rewrite" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      hx AS (
        SELECT doc_id, list_transform(ws, t ->
          list_reduce(list_transform(range(1, 16), i ->
            CAST(CASE WHEN ascii(substr(md5(t), i, 1)) >= 97
                      THEN ascii(substr(md5(t), i, 1)) - 87
                      ELSE ascii(substr(md5(t), i, 1)) - 48 END AS BIGINT)),
            (a, b) -> a * 16 + b)) AS harr
        FROM toks),
      v AS (
        SELECT doc_id, list_transform(range(0, 60), b ->
          list_sum(list_transform(harr, x -> 2 * ((x >> b) & 1) - 1))) AS votes
        FROM hx),
      sigs AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 60), b ->
            CASE WHEN votes[b + 1] > 0 THEN (CAST(1 AS BIGINT) << b)
                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        FROM v)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sig, b.sig)) <= 4
      ORDER BY doc_a, doc_b""",

    // Approximate rewrite ⇒ the oracle mirrors the banded DEFINITION:
    // candidates = pairs agreeing on >= 1 of 16 four-dim sign-bit bands,
    // then the exact double cosine confirm.
    "opt_cosine_rewrite" -> """
      WITH s AS (
        SELECT vec_id, embedding,
               list_transform(embedding, x -> x > 0) AS signs
        FROM embeddings WHERE vec_id < 1000),
      cand AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               a.embedding AS ea, b.embedding AS eb
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        WHERE len(list_filter(range(0, 16), j ->
              list_slice(a.signs, 4*j + 1, 4*j + 4)
                = list_slice(b.signs, 4*j + 1, 4*j + 4))) > 0),
      scored AS (
        SELECT a_id, b_id,
          list_sum(list_transform(list_zip(ea, eb),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / sqrt(list_sum(list_transform(ea, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
               * list_sum(list_transform(eb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          AS cos
        FROM cand)
      SELECT a_id, b_id, round(cos, 4) AS cos
      FROM scored
      WHERE cos >= 0.3
      ORDER BY a_id, b_id"""
  )
}
