package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the star schema's implicit graphs. The dedup
  * family already carries connected components (LlmOps.resolveClusters);
  * this module adds the other canonical iterative-graph shape, PageRank,
  * expressed as pure DataFrame joins/aggregations so the same code runs
  * unchanged on a cluster.
  *
  * Scale notes (100 TB):
  *  - the edge list is built ONCE, repartitioned on `src` and cached: every
  *    iteration's join then reuses that partitioning (EnsureRequirements
  *    inserts no new exchange on the edge side), so the per-iteration cost
  *    is one shuffle of the rank frame (nodes-sized, orders of magnitude
  *    smaller than edges) plus the contribution aggregation;
  *  - ranks are lineage-cut per iteration (LlmOps.cutLineage — reliable
  *    checkpoint under `spark.graft.checkpoint.reliable` for real
  *    clusters); without a cut the plan doubles per round and iteration 20
  *    would compile a 2^20-node tree;
  *  - a fixed iteration count (not convergence-to-epsilon) keeps the job a
  *    deterministic DAG — the production pattern for bounded-latency rank
  *    refreshes; the oracle unrolls the same three rounds in SQL.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Damping factor and iteration count of the contract key — shared with
    * the oracle SQL (unrolled) and the OperatorSpec fixpoint sanity test. */
  private[graft] val Damping = 0.85
  private[graft] val Iterations = 3

  /** graph_bfs hop cap — shared with the oracle's recursion bound. */
  private[graft] val BfsRounds = 6

  /** graph_random_walk steps — L sequential frontier joins by design. */
  private[graft] val RandomWalkLen = 4

  /** graph_kcore: the degree floor k and the fixed peel-round cap —
    * shared with the oracle's unrolled CTE rounds. A fixed round count
    * (not peel-to-fixpoint) keeps the job a deterministic DAG; rounds ≥
    * the peel depth of the graph give the exact k-core. */
  private[graft] val KcoreK = 2
  private[graft] val KcoreRounds = 4

  /** graph_label_propagation round cap — shared with the oracle. */
  private[graft] val LpaRounds = 3

  /** graph_sssp relaxation-round cap — shared with the oracle's
    * hop-bounded walk recursion. */
  private[graft] val SsspRounds = 4

  /** graph_harmonic seed count and hop bound — shared with the oracle's
    * recursion. Fixed hop bound keeps the per-distance counts a finite
    * set of integer slots, so the harmonic sum is ONE deterministic
    * expression over exact counts (bit-identical cross-engine). */
  private[graft] val HarmonicSeeds = 4
  private[graft] val HarmonicRounds = 4

  /** graph_betweenness source-sample size and BFS hop bound — shared
    * with the oracle's unrolled level CTEs. The FIXED deterministic
    * source set (lexicographically-smallest nodes, the graph_harmonic
    * convention) is what makes a sampled estimator hash-gatable; a
    * production run swaps in random sources at the same k. */
  private[graft] val BetweennessSeeds = 4
  private[graft] val BetweennessRounds = 4

  /** Sampled harmonic-centrality core (graph_harmonic / Graph.harmonic):
    * multi-source hop-bounded BFS from a (seed) frame over (src, dst)
    * edges — (seed, node) frontier state, one join + min-agg per round,
    * per-round lineage cuts — then per node harmonic = Σ_seeds 1/d over
    * seeds reaching it within `rounds` hops, computed from the
    * per-distance INTEGER counts in one fixed left-assoc double
    * expression (bit-identical at any parallelism; never a float fold
    * over an engine-ordered list). Returns (node, n_reached,
    * harmonic 4dp), unordered; seed self-rows (d = 0) are excluded. */
  private[graft] def harmonicOf(edges: DataFrame, seeds: DataFrame,
                                rounds: Int): DataFrame = {
    var dist = seeds.select(col("seed"), col("seed").as("node"),
                            lit(0).as("dist"))
    var frontier = dist
    for (_ <- 1 to rounds) {
      val cand = edges.join(frontier, col("src") === col("node"))
        .select(col("seed"), col("dst").as("node"),
                (col("dist") + 1).as("dist"))
        .groupBy("seed", "node").agg(min("dist").as("dist"))
      frontier = LlmOps.cutLineage(
        cand.join(dist.select(col("seed").as("s2"), col("node").as("seen")),
                  col("seed") === col("s2") && col("node") === col("seen"),
                  "left_anti"))
      dist = LlmOps.cutLineage(dist.unionByName(frontier))
    }
    val slots = (1 to rounds).map(h =>
      sum(when(col("dist") === h, 1L).otherwise(0L)).as(s"n$h"))
    dist.filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_reached"), slots: _*)
      .select(col("node"), col("n_reached"),
        round((1 to rounds).map(h =>
            col(s"n$h") / lit(h.toDouble)).reduce(_ + _), 4).as("harmonic"))
  }

  /** k-source sampled betweenness centrality (Brandes' dependency
    * accumulation, Alg. 1 of "A faster algorithm for betweenness
    * centrality" 2001; source sampling per Brandes–Pich 2007 — the
    * published scale path, exact Brandes is O(V·E)), hop-bounded at
    * `maxHops` (graph_betweenness / Graph.betweenness).
    *
    * Forward sweep: level-synchronous multi-source BFS carrying EXACT
    * INTEGER shortest-path counts — per level one frontier⋈edges join +
    * sum-agg (σ(v) = Σ σ over dist-(d−1) predecessors, the BFS
    * invariant) and an anti-join against the settled set; per-level
    * frames are (source, node)-sized, lineage-cut and cached (each is
    * read again by the backward sweep). Backward sweep: dependency
    * δ(v) = σ(v) · Σ_{w: succ} (1+δ(w))/σ(w) accumulated from the
    * deepest level inward, one join per level against the level-(d+1)
    * delta frame; the successor terms are folded over a node-SORTED
    * collected list and δ rounds 6dp per level (the graph_hits
    * convention — both engines feed bit-identical deltas inward).
    * bc(v) = Σ over sampled sources of δ(v), source self-rows (level 0)
    * excluded; the cross-source sum folds a source-sorted list (the
    * agg_chi_square discipline). At cluster scale every join is
    * (k·nodes)-sized against the one cached edge frame — no all-pairs
    * stage anywhere. Returns (node, bc 4dp) over nodes reached at
    * levels 1..maxHops, unordered. */
  private[graft] def betweennessOf(edges: DataFrame, seeds: DataFrame,
                                   maxHops: Int): DataFrame = {
    var settled = seeds.select(col("seed").as("s"), col("seed").as("node"),
                               lit(1L).as("sigma"))
    var frontier = settled
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    for (_ <- 1 to maxHops) {
      val cand = frontier.join(edges, col("node") === col("src"))
        .groupBy(col("s"), col("dst"))
        .agg(sum("sigma").as("sigma"))
        .select(col("s"), col("dst").as("node"), col("sigma"))
      val next = graft.GraftCaches.track(LlmOps.cutLineage(
        cand.join(settled.select(col("s").as("vs"), col("node").as("vn")),
                  col("s") === col("vs") && col("node") === col("vn"),
                  "left_anti")).cache())
      levels += next
      settled = LlmOps.cutLineage(settled.unionByName(next))
      frontier = next
    }
    var deltaNext = levels(maxHops).withColumn("delta", lit(0.0))
    val deltas = scala.collection.mutable.ArrayBuffer(deltaNext)
    for (lvl <- (maxHops - 1) to 0 by -1) {
      val contrib = levels(lvl).as("v")
        .join(edges.as("e"), col("v.node") === col("e.src"))
        .join(deltaNext.as("w"),
              col("v.s") === col("w.s") && col("e.dst") === col("w.node"))
        .groupBy(col("v.s").as("s"), col("v.node").as("node"))
        .agg(sort_array(collect_list(struct(col("w.node").as("wn"),
          ((lit(1.0) + col("w.delta")) / col("w.sigma").cast("double"))
            .as("t")))).as("ts"))
        .select(col("s"), col("node"),
          expr("aggregate(ts, CAST(0.0 AS DOUBLE), (a, x) -> a + x.t)")
            .as("dsum"))
      val cur = graft.GraftCaches.track(LlmOps.cutLineage(levels(lvl)
        .join(contrib, Seq("s", "node"), "left")
        .select(col("s"), col("node"), col("sigma"),
          round(coalesce(col("sigma").cast("double") * col("dsum"),
                         lit(0.0)), 6).as("delta"))).cache())
      deltas += cur
      deltaNext = cur
    }
    // deltas = [level maxHops, …, level 0]; drop the level-0 source rows
    deltas.init.map(_.select(col("s"), col("node"), col("delta")))
      .reduce(_ unionByName _)
      .groupBy("node")
      .agg(sort_array(collect_list(struct(col("s"), col("delta"))))
        .as("ds"))
      .select(col("node"),
        round(expr(
          "aggregate(ds, CAST(0.0 AS DOUBLE), (a, x) -> a + x.delta)"), 4)
          .as("bc"))
  }

  /** One row per undirected REPEAT-trade edge (threshold 3) — the sparse
    * subgraph graph_components and graph_bfs both run on. */
  private[graft] def repeatTradePairs(s: SparkSession, d: String): DataFrame =
    custSuppPairs(s, d, 3L).select("doc_a", "doc_b")

  /** The sparse repeat-trade graph in symmetric weighted form: edge weight
    * = (supporting-lineitem count % 5) + 1 ∈ 1..5 — a deterministic
    * integer weight derived from the SAME pair aggregation every other
    * graph key uses (integer weights keep the SSSP oracle's recursion
    * state finite and the cross-engine compare float-free). */
  private[graft] def weightedTradeEdges(s: SparkSession, d: String): DataFrame = {
    val p = custSuppPairs(s, d, 3L)
      .select(col("doc_a"), col("doc_b"), (col("n") % 5 + 1).as("w"))
    p.select(col("doc_a").as("src"), col("doc_b").as("dst"), col("w"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst"), col("w")))
  }

  /** [[repeatTradePairs]] in symmetric (src, dst) form. */
  private[graft] def repeatTradeEdges(s: SparkSession, d: String): DataFrame =
    symmetric(repeatTradePairs(s, d))

  /** One row per undirected customer–supplier pair with ≥ `minLineitems`
    * supporting lineitems, node ids namespaced `c<id>` / `s<id>` — the ONE
    * pair builder behind every graph key (threshold 1 = the dense trade
    * graph, 3 = the sparse repeat-trade subgraph), so the graph
    * definitions cannot drift apart.
    *
    * Store-read since r17 (r16 verdict #3): the pair aggregation is built
    * ONCE per (JVM, sfDir) by [[pairStorePath]] and every call reads the
    * persisted parquet with the threshold as a pushed-down `n >=` filter
    * — yesterday's edge list IS a store in production, and 19 graph keys
    * each re-running the lineitem⋈orders join to re-derive it measured
    * scaffolding, not algorithm. No oracle reads the store: every graph
    * oracle still recomputes the pairs from the base tables in SQL, so
    * the hash gates prove store-read ≡ fresh derivation (strings and
    * BIGINTs round-trip parquet exactly). */
  private def custSuppPairs(s: SparkSession, d: String,
                            minLineitems: Long): DataFrame = {
    val p = s.read.parquet(pairStorePath(s, d))
    if (minLineitems <= 1L) p else p.filter(col("n") >= minLineitems)
  }

  /** The fresh derivation custSuppPairs persists — only the store build
    * runs it. */
  private def custSuppPairsFresh(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
      .select(concat(lit("c"), col("o_custkey")).as("doc_a"),
              concat(lit("s"), col("l_suppkey")).as("doc_b"),
              col("n"))
  }

  /** Per-(JVM, sfDir) persisted trade-pair fixture — unique tempdir +
    * shutdown reaper ([[graft.StoreDir.of]]), like the dedup signature
    * store: only this JVM reads it. */
  private val pairStoreCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private[graft] def pairStorePath(s: SparkSession, d: String): String =
    graft.StoreDir.of(pairStoreCache, d, "graft-tradepairs-") { dir =>
      custSuppPairsFresh(s, d).write.mode("overwrite").parquet(dir)
    }

  /** Deterministic random-walk core (graph_random_walk /
    * Graph.randomWalks): from each row of `seeds` ("seed" column), a
    * `steps`-hop walk over the (src, dst) edge frame where step t out of
    * node v picks neighbor rank md5(seed:t:v) mod deg(v) — a pure
    * function of the walk state, reproducible across runs/engines/
    * cluster sizes. Ranked adjacency + degrees are cached (referenced
    * once per step; un-cached, the edge derivation re-runs L times) and
    * each step's frontier is lineage-cut (un-cut, the final union
    * re-derives step t's whole prefix — O(L²) join stages instead of L).
    * Walks truncate at dead-end nodes; returns (seed, step, node) with
    * step 0 = the seed itself. */
  private[graft] def randomWalkOf(edges: DataFrame, seeds: DataFrame,
                                  steps: Int): DataFrame = {
    val adj = graft.GraftCaches.track(edges.select("src", "dst").distinct()
      .withColumn("rnk",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long")).cache())
    val deg = graft.GraftCaches.track(
      adj.groupBy("src").agg(count(lit(1)).as("deg")).cache())
    var walk = seeds.select(col("seed"), lit(0).as("step"),
                            col("seed").as("node"))
    var out = walk
    for (st <- 1 to steps) {
      val pick = walk.join(deg, col("node") === deg("src")).drop("src")
        .withColumn("choice",
          conv(substring(md5(concat(col("seed"), lit(":"),
            lit(st.toString), lit(":"), col("node"))), 1, 6), 16, 10)
            .cast("long") % col("deg"))
      walk = graft.GraftCaches.track(pick.join(adj,
          pick("node") === adj("src") && pick("choice") === adj("rnk"))
        .select(col("seed"), lit(st).as("step"), col("dst").as("node"))
        .cache())
      out = out.unionByName(walk)
    }
    out
  }

  /** Market-basket bipartite-projection core (graph_copurchase /
    * Graph.coPurchase): from a (basket, item) frame, canonical item pairs
    * weighted by shared-basket count, min-support filtered, top-`topK`
    * per item_a by (weight DESC, item_b). NOT a self-join: each basket's
    * distinct items collapse to ONE sorted array (map-side-combinable —
    * the only corpus-sized shuffle) and the c(k,2) pairs generate
    * row-locally; blow-up is Σ c(k,2) over basket sizes, never
    * corpus-quadratic. At 100 TB cap pathological basket sizes first. */
  private[graft] def coPurchaseOf(basketItems: DataFrame, minSupport: Int,
                                  topK: Int): DataFrame = {
    // r20 wave 2 (guide §2.5, the 6e23a09 pattern): the basket exchange
    // carries a few KB of item ids but the stage ABOVE it does the
    // Σ c(k,2) pair explode — AQE's byte-based coalescing collapsed that
    // compute-heavy stage to 3-4 tasks (probe: an 812 ms stage at 4
    // tasks ≈ 40% of the key). Pin the exchange at defaultParallelism;
    // the groupBy reuses it (REPARTITION_BY_NUM is exempt from AQE
    // coalescing), so the explode runs cluster-wide. No-op at scale:
    // a corpus-sized basket exchange already exceeds the floor.
    // ADVICE r20 caveat: like sql_q2's hint this ships raw rows and
    // trades away map-side partial aggregation — measured a win on THIS
    // fixture's basket-size distribution (associationRulesOf documents
    // the identical pattern measuring WORSE); re-probe if the fixture's
    // basket sizes change.
    val pairs = basketItems
      .repartition(basketItems.sparkSession.sparkContext.defaultParallelism,
                   col("basket"))
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (a, i) ->
             transform(slice(ps, i + 2, size(ps)),
                       b -> struct(a AS part_a, b AS part_b))))""")).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
    val wTop = Window.partitionBy("part_a")
      .orderBy(col("w").desc, col("part_b").asc)
    pairs.withColumn("rk", row_number().over(wTop)).filter(col("rk") <= topK)
  }

  /** Adamic–Adar core (graph_adamic_adar / Graph.adamicAdar): over a
    * bipartite (doc_a, doc_b) membership frame, for left-side pairs
    * sharing ≥ `minCommon` right-side counterparties z, the score
    * Σ_z 1/ln(deg(z)) — rare shared counterparties weigh more than hubs.
    * A shared z has deg ≥ 2, so ln never divides by zero. */
  private[graft] def adamicAdarOf(pairs: DataFrame, minCommon: Int): DataFrame = {
    // three consumers (both pair sides + the counterparty-degree agg) —
    // cache so a join-derived membership fixture builds once (tracked
    // for Graft.clearCaches)
    val adj = graft.GraftCaches.track(pairs.select("doc_a", "doc_b").cache())
    val deg = adj.groupBy("doc_b").agg(count(lit(1)).as("ds"))
      .select(col("doc_b").as("zb"), col("ds"))
    adj.as("x")
      .join(adj.as("y"),
            col("x.doc_b") === col("y.doc_b") && col("x.doc_a") < col("y.doc_a"))
      .join(deg, col("x.doc_b") === col("zb"))
      .groupBy(col("x.doc_a").as("a"), col("y.doc_a").as("b"))
      .agg(count(lit(1)).as("n_common"),
           round(sum(lit(1.0) / log(col("ds").cast("double"))), 4).as("aa"))
      .filter(col("n_common") >= minCommon)
  }

  /** Degree-assortativity core (graph_assortativity /
    * Graph.assortativity): Pearson corr of (deg(src), deg(dst)) over all
    * directed edges of a (src, dst) frame → one row
    * (n_edges, assortativity 4dp, mean_deg 4dp). */
  private[graft] def assortativityOf(edgesIn: DataFrame): DataFrame = {
    // three consumers (the degree agg + the joined edge scan; deg itself
    // fans out to both endpoints) — cache so a join-derived fixture
    // builds once (tracked for Graft.clearCaches)
    val edges = graft.GraftCaches.track(edgesIn.cache())
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ds = deg.select(col("src").as("s_node"), col("deg").as("deg_s"))
    val dt = deg.select(col("src").as("t_node"), col("deg").as("deg_t"))
    edges
      .join(broadcast(ds), col("src") === col("s_node"))
      .join(broadcast(dt), col("dst") === col("t_node"))
      .agg(count(lit(1)).as("n_edges"),
           round(corr(col("deg_s").cast("double"),
                      col("deg_t").cast("double")), 4).as("assortativity"),
           round(avg(col("deg_s").cast("double")), 4).as("mean_deg"))
  }

  /** Bounded Bellman-Ford core (graph_sssp / Graph.shortestPaths): from a
    * (src, dst, w) edge frame and a seed node, `rounds` relaxation rounds
    * — each is one edge-sized join + one nodes-sized min-agg, lineage-cut
    * — yielding (node, dist) = min total weight over walks of ≤ `rounds`
    * edges. Weights must be non-negative (a negative weight makes the
    * bounded min a walk property, not a distance). The caller picks the
    * round cap: `rounds` ≥ graph diameter gives exact SSSP; a smaller cap
    * is the bounded-horizon variant that keeps the job a fixed DAG. */
  private[graft] def ssspOf(edges: DataFrame, seed: String, rounds: Int): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    var dist = Seq((seed, 0L)).toDF("node", "dist")
    for (_ <- 1 to rounds) {
      val relaxed = edges.join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = LlmOps.cutLineage(
        dist.unionByName(relaxed).groupBy("node").agg(min("dist").as("dist")))
    }
    dist
  }

  /** Undirected pairs in symmetric (src, dst) form. */
  private def symmetric(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))

  /** Customer–supplier trade edges (threshold 1), both directions emitted
    * so the bipartite graph is symmetric (every node has out-degree ≥ 1 ⇒
    * no dangling-mass redistribution term). */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame =
    symmetric(custSuppPairs(s, d, 1L))

  /** Scaled PageRank (ranks sum to N, init 1.0):
    * rank'(v) = (1-d) + d * Σ_{u→v} rank(u) / outdeg(u), run for `iters`
    * rounds over an edge frame pre-partitioned on `src`. Returns
    * (node, rank). Every node appears on both sides here (symmetric
    * edges), so the contribution aggregation covers all nodes — a graph
    * with sources/sinks would need the left-join-from-nodes guard. */
  /** Rank frames at or under this node count are broadcast into the
    * per-iteration join (a 5M-node rank frame is ~100 MB — at the edge of
    * sane broadcast); bigger graphs fall back to the shuffle join on the
    * cached src-partitioned edge frame, which scales to any node count. */
  private[graft] val BroadcastNodeCap = 5000000L

  private[graft] def pageRankOf(edges0: DataFrame, iters: Int): DataFrame =
    rankRounds(edges0, lit(1.0), iters)

  /** The ONE power-iteration loop behind pageRankOf AND pprOf — they
    * differ only in the restart distribution (uniform 1.0 vs concentrated
    * at a seed); init = restart in both conventions.
    *
    * Mechanics: out-degree via a whole-partition window — ONE shuffle on
    * src builds the (src, dst, outdeg) frame directly (a groupBy+join
    * formulation would materialize the edge frame twice); the window's
    * exchange leaves it hash-partitioned on src, which every fallback-path
    * iteration join then reuses. The node UNIVERSE is every src
    * (out-degree ≥ 1 is the documented precondition of both callers, so
    * this covers all nodes) — each round re-anchors on it so a node with
    * NO in-edges keeps its restart-only rank instead of silently vanishing
    * after round 1. The rank frame is nodes-sized, not edges-sized: below
    * the cap it broadcasts and an iteration costs one map-side join plus
    * one partially-aggregated contribution shuffle — the edge frame never
    * re-shuffles; past the cap the join degrades gracefully to
    * shuffle-on-src. `requireNode` fails fast (on the small cached node
    * frame, not the edges) when a caller's seed has no out-edges — the
    * rank would silently be all-zero otherwise. */
  private def rankRounds(edges0: DataFrame, restart: Column, iters: Int,
                         requireNode: Option[String] = None,
                         // per-edge contribution of the src node's rank
                         // (PageRank/PPR split it by out-degree; Katz
                         // passes it whole) and the per-node combine of
                         // the summed contribution — parameterized so all
                         // three centralities share ONE copy of the
                         // cache/universe/broadcast-cap/lineage-cut policy
                         contrib: Column = col("rank") / col("outdeg"),
                         combine: Column => Column = null): DataFrame = {
    val withDeg = edges0
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
      .cache()
    graft.GraftCaches.track(withDeg)
    val nodes = withDeg.select(col("src").as("node")).distinct().cache()
    graft.GraftCaches.track(nodes)
    requireNode.foreach { sd =>
      require(nodes.filter(col("node") === sd).count() == 1,
        s"seed '$sd' has no out-edges (the node universe is distinct src; " +
          "emit both directions for undirected graphs)")
    }
    var ranks = nodes.withColumn("rank", restart)
    val broadcastRanks = nodes.count() <= BroadcastNodeCap
    // literal 0.15 in the default combine, not (1.0 - 0.85): the
    // subtraction is 1 ulp off the nearest double to 0.15, which is what
    // the oracle's literal parses to; + is commutative in IEEE, so this
    // term order reproduces both PageRank callers' oracles bit-for-bit
    val comb: Column => Column =
      if (combine != null) combine
      else c => lit(Damping) * c + lit(0.15) * restart
    // r20 (guide §1.2/§2.4): NO per-iteration lineage cut. The iteration
    // count is FIXED and small, so the plan depth is bounded at `iters`
    // joins — the eager localCheckpoint this loop used to carry paid one
    // extra job + node-frame materialization per round (measured ~0.45 s
    // of the key's 3.4 s per round at sf0.1) purely to keep a plan small
    // that was never going to grow. Fixpoint loops with convergence
    // checks (components/BFS) still cut; a fixed-depth power iteration
    // builds one lazy DAG and lets the single terminal action pipeline
    // the rounds (each broadcast subplan still materializes exactly once
    // as its own broadcast job).
    // r21 scale validation (VERDICT r20 #4/#6): the O(iters²/2) chain
    // re-execution does NOT invert at scale — tools/scalecheck.json's
    // x10 point (lineitem/orders as 10 disjoint key-shifted copies:
    // nodes AND edges ×10) measures growth exponents b ≈ 0.50
    // (pagerank 1.41→4.44 s), 0.54 (katz 1.43→5.01 s), 0.07 (ppr) —
    // sub-linear in edges, nowhere near a cut-justifying blowup (the
    // re-executed chain is cached-edge joins whose cost amortizes across
    // the x10 width). The no-cut loop stands; revisit only if a future
    // caller raises `iters` beyond a small constant.
    for (_ <- 1 to iters) {
      val r = if (broadcastRanks) broadcast(ranks) else ranks
      val contribs = withDeg
        .join(r, col("src") === col("node"))
        .select(col("dst"), contrib.as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      // Deliberately NO per-round cache (r20, measured): round k's
      // broadcast child re-executes round k-1's chain, so the pure-lazy
      // loop runs O(iters²/2) chain executions — but each is a cheap
      // cached-edge join+agg, and the A/B subset benches put pure-lazy
      // at 0.67/0.78 s (pagerank/katz) vs 2.4-3.7 s with a per-round
      // LAZY .cache() (InMemoryRelation materialization inside AQE
      // broadcast jobs is far more expensive than the recompute) and
      // ~4 s with the old EAGER per-round checkpoint.
      ranks = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
                comb(coalesce(col("contrib"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Personalized PageRank from a single seed: rank'(v) = d·Σ contrib +
    * (1-d)·[v = seed], init = the restart distribution [v = seed]. Same
    * per-iteration mechanics as [[pageRankOf]] — one cached src-
    * partitioned edge frame, nodes-sized rank frame (broadcast under the
    * cap), lineage cut per round — the restart mass is just concentrated
    * at the seed instead of spread uniformly, which is what turns global
    * importance into importance RELATIVE to the seed (the "related
    * entities" primitive). Unreachable nodes hold exactly 0.0 in every
    * round (products and sums of zeros — exact in IEEE), so the
    * rank > 0 output filter is engine-stable. */
  private[graft] def pprOf(edges0: DataFrame, seed: String, iters: Int): DataFrame =
    rankRounds(edges0,
      when(col("node") === seed, lit(1.0)).otherwise(lit(0.0)),
      iters, requireNode = Some(seed))

  /** Katz centrality, `iters`-truncated series (graph_katz /
    * Graph.katz): x'(v) = 1 + alpha * sum_{u->v} x(u), init 1 — walk
    * counts damped by length, the in-degree-weighted cousin of PageRank
    * that does NOT normalize by out-degree (a hub passes its full
    * weight to every neighbor; alpha < 1/lambda_max converges the
    * infinite series, a FIXED iteration count truncates it
    * deterministically, same policy as [[pageRankOf]]). Mechanics
    * mirror [[rankRounds]] minus the degree division: cached edge
    * frame, nodes-sized x frame broadcast under [[BroadcastNodeCap]]
    * with graceful shuffle fallback, lineage cut per round. Without
    * the degree division the per-round sums are hub-degree-sized, so
    * each round's x is rounded 6dp (the graph_hits convention) — both
    * engines feed bit-identical scores forward and reassociation noise
    * cannot compound across rounds. Shares [[rankRounds]]' iteration
    * shell (cache/universe/broadcast-cap/lineage-cut policy lives in
    * ONE place): contribution = the whole rank, combine = the damped
    * Katz update. Node universe = distinct src (callers emit both
    * directions for undirected graphs). Returns (node, x). */
  private[graft] def katzOf(edges0: DataFrame, alpha: Double,
                            iters: Int): DataFrame =
    rankRounds(edges0, lit(1.0), iters,
      contrib = col("rank"),
      combine = c => round(lit(alpha) * c + lit(1.0), 6))
      .withColumnRenamed("rank", "x")

  /** Deterministic md5 day gate over a pair — layout-independent. */
  private def dayGate: Column =
    pmod(conv(substring(
      md5(concat_ws("|", col("doc_a"), col("doc_b"))), 1, 2), 16, 10)
      .cast("int"), lit(4))

  private[graft] def day1Pairs(s: SparkSession, d: String): DataFrame =
    repeatTradePairs(s, d).filter(dayGate =!= 0)
  private[graft] def day2Pairs(s: SparkSession, d: String): DataFrame =
    repeatTradePairs(s, d).filter(dayGate === 0)

  /** Persisted day-1 label forest (node, lbl) at a deterministic path —
    * yesterday's component labels ARE a store in production; building
    * them is day-1 work the incremental key must not re-measure. */
  private val forestCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private[graft] def forestStorePath(s: SparkSession, d: String): String =
    graft.StoreDir.fixed(forestCache,
        graft.StoreDir.fixedPath("graft-ccforest", d)) { dir =>
      LlmOps.resolveClusters(day1Pairs(s, d))
        .write.mode("overwrite").parquet(dir)
    }

  /** (node, triangles) over an ORIENTED edge frame (each undirected edge
    * exactly once as a < b): wedge join on the pivot + closing-edge
    * existence join enumerates each triangle once as a<b<c; the per-node
    * count unions the three corners. Shared with the OperatorSpec
    * hand-graph test (planted K4 ⇒ every node counts 3). */
  private[graft] def perNodeTriangles(eIn: DataFrame): DataFrame = {
    // three consumers (the triangle join's three legs) — cache so a
    // join-derived edge fixture builds once (tracked for
    // Graft.clearCaches; CacheManager dedupes by plan, so a caller that
    // already cached the same frame shares this entry)
    val e = graft.GraftCaches.track(eIn.cache())
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Bounded k-core peel core (graph_kcore / the OperatorSpec hand-graph
    * pin): from a SYMMETRIC (src, dst) edge frame, `rounds` rounds of
    * "drop nodes with degree < k, restrict edges to survivors". Survivor
    * sets are node-sized and broadcast into the LeftSemi restrictions;
    * lineage cut per round. Returns (node, core_degree) over the final
    * surviving subgraph. */
  private[graft] def kcoreOf(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = edges0.cache()
    graft.GraftCaches.track(edges)
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("survivor"))
      edges = LlmOps.cutLineage(
        edges.join(broadcast(keep), col("src") === col("survivor"), "left_semi")
          .join(broadcast(keep), col("dst") === col("survivor"), "left_semi"))
    }
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }

  /** Synchronous label-propagation core (graph_label_propagation / the
    * OperatorSpec hand-graph pin): from a SYMMETRIC edge frame, `rounds`
    * rounds of "adopt the most frequent neighbor label, ties toward the
    * LARGEST label" — the (count, label) argmax is one max(struct) per
    * node, a total order both engines implement exactly. Labels init to
    * the node's own id; the label frame stays node-sized and broadcasts
    * into the edge join. Returns the final (node, lbl). */
  private[graft] def lpaOf(edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = edges0.cache()
    graft.GraftCaches.track(edges)
    var lbls = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      val freq = edges.join(broadcast(lbls), col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
      lbls = LlmOps.cutLineage(
        freq.groupBy(col("dst").as("node"))
          .agg(max(struct(col("cnt"), col("lbl"))).as("m"))
          .select(col("node"), col("m.lbl").as("lbl")))
    }
    lbls
  }

  /** Local clustering coefficient over an ORIENTED (a < b, each
    * undirected edge once) edge frame: coeff(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)) for deg ≥ 2; triangle-less connected nodes
    * surface at 0.0 via the left join. Shares [[perNodeTriangles]]. */
  private[graft] def clusteringCoeffOf(eIn: DataFrame): DataFrame = {
    // both degree unions + the triangle join's three legs read the same
    // edge frame — one shared cache entry (plan-deduped with
    // perNodeTriangles' own cache of the identical frame)
    val e = graft.GraftCaches.track(eIn.cache())
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(perNodeTriangles(e).withColumnRenamed("node", "tn"),
            col("node") === col("tn"), "left")
      .select(col("node"), col("degree"),
              coalesce(col("triangles"), lit(0L)).as("triangles"),
              round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
                    (col("degree") * (col("degree") - 1)), 4).as("coeff"))
  }

  /** The trade graph in its natural DIRECTED bipartite form (customer →
    * supplier, threshold 1) — the input shape HITS wants: hubs live on
    * the src side, authorities on the dst side. */
  private[graft] def directedTradeEdges(s: SparkSession, d: String): DataFrame =
    custSuppPairs(s, d, 1L).select(col("doc_a").as("src"), col("doc_b").as("dst"))

  /** HITS (Kleinberg hubs & authorities) over a directed edge frame:
    * h(u) = Σ_{u→v} a(v), a(v) = Σ_{u→v} h(u), MAX-normalized each half
    * round. Returns (node, a) for the authority side.
    *
    * Cross-engine exactness: the normalizer is max (order-independent in
    * IEEE, unlike an L1/L2 sum), so the only float noise is sum
    * reassociation inside the contribution aggregates — normalized scores
    * round to 6dp each half-round (the kmeansCells convention) so both
    * engines feed bit-identical scores into the next round. Scale: same
    * mechanics as pageRankOf — the edge frame is cached and every
    * iteration is two edge-sized equi-joins + two map-side-combinable
    * hash-aggregates. Each half-round's raw-contribution frame is
    * lineage-cut BEFORE the max so the 1-row normalizer aggregate reads
    * the materialized node-sized frame instead of re-running the edge
    * join (the naive hr-crossJoin-max(hr) plan computed every
    * contribution twice — measured 7.6 s → 2.4 s at sf0.1); the max comes
    * back as a driver scalar literal (a 1-row aggregate, same economics
    * AQE relies on). Score frames stay node-sized and broadcast into the
    * edge joins under the same [[BroadcastNodeCap]] gate as PageRank. */
  private[graft] def hitsOf(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = edges0.cache()
    graft.GraftCaches.track(edges)
    var auth = edges.select(col("dst").as("node")).distinct()
      .withColumn("a", lit(1.0))
    // Degenerate input: an empty edge frame has no normalizer —
    // short-circuit to the (empty) auth frame.
    if (edges.head(1).isEmpty) return auth
    val smallGraph = edges.limit(BroadcastNodeCap.toInt + 1).count() <= BroadcastNodeCap
    def bc(df: DataFrame): DataFrame = if (smallGraph) broadcast(df) else df
    def maxOf(df: DataFrame, c: String): Option[Double] = {
      val r = df.agg(max(c)).head()
      if (r.isNullAt(0) || r.getDouble(0) <= 0.0) None else Some(r.getDouble(0))
    }
    // The half-round materialization is a CACHE whose materializing
    // action IS the 1-row max-normalizer collect, so each half-round
    // costs ONE job (compute + cache + max) instead of two. The
    // contributions compute once and the downstream score frame reads
    // the cached blocks. r20 wave 2 NEGATIVE RESULT, kept as a warning:
    // a pure-lazy variant with the normalizer as an in-plan
    // crossJoin(broadcast(hr.agg(max))) — the rankRounds economics —
    // measured 30-58 s vs ~4 s here: unlike rankRounds' linear chain,
    // the max branch FORKS the lineage each half-round and ReuseExchange
    // does not dedup the forked contribution subtrees across the nested
    // broadcast builds, so the edge join recomputes exponentially in the
    // round count. HITS needs the per-half-round materialization.
    def materialize(df: DataFrame): DataFrame = {
      val c = df.cache()
      graft.GraftCaches.track(c)
      c
    }
    // r21 probe, SECOND negative result (VERDICT r20 #7): replacing the
    // per-half-round driver head() with an IN-PLAN broadcast scalar —
    // crossJoin(broadcast(hr.agg(max))) over the CACHED half-round
    // frame, so the fork point is an InMemoryRelation and the max
    // broadcasts build inside the one terminal action — measured
    // 3.77 → 6.15 s at sf0.1/32c (clean runs, min of 3 sweeps): the
    // nested broadcast builds still re-execute the cached-scan chains
    // per nesting level and cost more than the 6 serialized driver
    // collects they replace. With BOTH lazy spellings measured worse
    // (r20: 30-58 s pure-lazy; r21: 6.15 s cached-fork), the
    // cache+collect shape below IS the floor for a per-half-round
    // max-normalized fixed-round HITS.
    for (_ <- 1 to iters) {
      val hr = materialize(
        edges.join(bc(auth), col("dst") === col("node"))
          .groupBy("src").agg(sum("a").as("hr")))
      val hmax = maxOf(hr, "hr").getOrElse(return auth)
      val hubs = hr.select(col("src").as("node"),
                           round(col("hr") / lit(hmax), 6).as("h"))
      val ar = materialize(
        edges.join(bc(hubs), col("src") === col("node"))
          .groupBy("dst").agg(sum("h").as("ar")))
      val amax = maxOf(ar, "ar").getOrElse(return auth)
      auth = ar.select(col("dst").as("node"),
                       round(col("ar") / lit(amax), 6).as("a"))
    }
    auth
  }

  val queries: Map[String, Q] = graft.Contract.uniqueMap("GraphOps.queries", Seq(
    // HITS hubs/authorities over the directed customer→supplier trade
    // graph, [[Iterations]] max-normalized rounds — "which suppliers does
    // the network of well-connected buyers concentrate on" (the bipartite
    // twin of graph_pagerank's importance question; on a bipartite graph
    // the two score vectors live on opposite sides, so the supplier
    // authority vector IS the full authority output). Oracle: the same
    // three rounds unrolled as CTEs.
    "graph_hits" -> ((s, d) => {
      hitsOf(directedTradeEdges(s, d), Iterations)
        .select(col("node"), col("a"))
        .orderBy("node")
    }),

    // PageRank over the customer–supplier trade graph, 3 fixed iterations;
    // output = the 100 supplier nodes' ranks (ranks ~N-scaled so the 4-dp
    // rounding keeps ~6 significant digits). The rank column is a sum of
    // a few hundred IEEE doubles — round(,4) absorbs reassociation noise
    // (same policy as every double aggregate in this repo).
    "graph_pagerank" -> ((s, d) => {
      pageRankOf(tradeEdges(s, d), Iterations)
        .filter(col("node").startsWith("s"))
        .select(col("node"), round(col("rank"), 4).as("rank"))
        .orderBy("node")
    }),

    // Katz centrality over the same trade graph, alpha = 0.005, 3 fixed
    // iterations — walk counts damped by length, the non-normalized
    // cousin of PageRank (a hub passes full weight to every neighbor).
    // alpha sits below 1/lambda_max for this graph (~1/60: supplier
    // degree ~600 x customer degree ~6), so the truncated series is a
    // genuine convergent-centrality prefix, not a divergent blowup;
    // same broadcast-under-cap iteration economics, same supplier-node
    // output convention.
    "graph_katz" -> ((s, d) => {
      katzOf(tradeEdges(s, d), alpha = 0.005, Iterations)
        .filter(col("node").startsWith("s"))
        .select(col("node"), round(col("x"), 4).as("x"))
        .orderBy("node")
    }),

    // Bounded BFS: hop distance from the graph's lexicographically
    // smallest node over the sparse repeat-trade graph, capped at
    // [[BfsRounds]] hops. Frontier expansion is one join + min-agg per
    // round (the rank frame stays nodes-sized; same broadcast-under-cap
    // economics as PageRank would apply — here the per-round frame is
    // tiny), lineage-cut per round; a FIXED round count keeps the job a
    // deterministic DAG and the oracle's recursion finite (the cap bounds
    // (node, dist) recursion that a cyclic graph would otherwise grow
    // forever). Nodes farther than the cap are absent from BOTH sides by
    // the same clamp.
    "graph_bfs" -> ((s, d) => {
      val edges = repeatTradeEdges(s, d).cache()
      graft.GraftCaches.track(edges)
      val seed = edges.agg(min("src")).head().getString(0)
      // the seed is already a driver scalar — a literal 1-row frame, not
      // a distinct scan of the edge set
      val sp = edges.sparkSession
      import sp.implicits._
      var dist = Seq((seed, 0)).toDF("node", "dist")
      // classic frontier expansion: only nodes settled THIS round join the
      // edge frame next round — per-round work is O(frontier), not
      // O(all reached so far); the anti-join against the settled set keeps
      // each node's FIRST (= minimal, BFS invariant) distance
      var frontier = dist
      for (_ <- 1 to BfsRounds) {
        val candidates = edges.join(frontier, col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
          .groupBy("node").agg(min("dist").as("dist"))
        frontier = LlmOps.cutLineage(
          candidates.join(dist.select(col("node").as("seen")),
                          col("node") === col("seen"), "left_anti"))
        dist = LlmOps.cutLineage(dist.unionByName(frontier))
      }
      dist.orderBy("node")
    }),

    // Bounded weighted single-source shortest paths (Bellman-Ford): the
    // graph_bfs walk with integer edge weights (1..5, derived from trade
    // volume). Each round relaxes EVERY edge against the current distance
    // frame — dist_{k+1}(v) = min(dist_k(v), min over edges (dist_k(u)+w))
    // — so after [[SsspRounds]] rounds the frame holds exactly the minimum
    // over ≤cap-hop walks, which is what the oracle's hop-bounded
    // recursion enumerates. Unlike BFS there is no settled-frontier
    // shortcut (a longer-hop walk can still be cheaper), so the per-round
    // join is edges ⋈ full dist — the textbook distributed SSSP round
    // (Pregel's shape): per-round cost is one edge-sized join + one
    // nodes-sized min-agg, lineage cut per round, cap fixed so the job is
    // a deterministic DAG at any scale.
    "graph_sssp" -> ((s, d) => {
      val edges = weightedTradeEdges(s, d).cache()
      graft.GraftCaches.track(edges)
      val seed = edges.agg(min("src")).head().getString(0)
      ssspOf(edges, seed, SsspRounds)
        .select(col("node"), col("dist").cast("int").as("dist")).orderBy("node")
    }),

    // Degree distribution of the trade graph — the first diagnostic run
    // on any production graph (it decides every downstream strategy:
    // broadcast vs shuffle, salting, orientation). Two bounded
    // aggregations: per-node degree (nodes-sized), then the histogram
    // (distinct-degrees-sized); the corpus-scale shuffle is only the
    // first, on the node key.
    "graph_degree_hist" -> ((s, d) => {
      tradeEdges(s, d)
        .groupBy("src").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // Per-node triangle counts over the CO-SUPPLY graph (suppliers sharing
    // ≥2 repeat customers — the bipartite trade graph has no triangles, so
    // the key first projects it to its supplier side). Edges are oriented
    // low-id → high-id, so each triangle materializes exactly once as
    // (a<b<c): the classic enumeration shape where the wedge join's
    // fan-out is bounded by out-degree — at real scale the orientation is
    // by DEGREE then id (caps out-degree at ~√m on any graph); id-order is
    // kept here because both engines must agree on it exactly and the
    // co-supply graph has no hubs by construction (the ≥2-shared-customer
    // threshold is the densification cap, same role as containment's
    // dfCap). Two shuffles: the wedge join on the pivot node and the
    // closing edge's existence join.
    "graph_triangles" -> ((s, d) => {
      val p = repeatTradePairs(s, d)
      val e = p.as("p1")
        .join(p.as("p2"),
              col("p1.doc_a") === col("p2.doc_a") && col("p1.doc_b") < col("p2.doc_b"))
        .groupBy(col("p1.doc_b").as("a"), col("p2.doc_b").as("b"))
        .agg(count(lit(1)).as("shared")).filter(col("shared") >= 2)
        .select("a", "b").cache()
      graft.GraftCaches.track(e)
      perNodeTriangles(e).orderBy("node")
    }),

    // Neighborhood (Jaccard) similarity between customer nodes of the
    // bipartite repeat-trade graph — the link-prediction / entity-
    // similarity primitive ("customers with overlapping supplier sets").
    // Plan: one self-join of the adjacency on the SHARED supplier (the
    // wedge enumeration graph_triangles also uses) + a broadcast-sized
    // degree frame; J = |∩| / (deg_a + deg_b − |∩|) is then row-local.
    // At 100 TB the wedge join's cost is Σ_supp deg², dominated by hub
    // suppliers — the repeat-trade threshold IS the hub guard (same
    // reasoning as graph_triangles); a general corpus would cap or sample
    // per-node neighbor lists first. Only pairs above the similarity
    // floor are emitted, so output is pair-sparse, never customers².
    // Deterministic "random" walks (node2vec/DeepWalk corpus generation —
    // the training-data step for graph embeddings): from every supplier
    // seed, a 4-step walk where step t out of node v picks neighbor rank
    // md5(seed:t:v) mod deg(v) — a pure function of the walk state, so
    // the corpus is reproducible across runs, engines and cluster sizes
    // (df.sample-style RNG walks are none of those). Plan: adjacency gets
    // a per-src (rank, degree) ONCE; each step is one join on the current
    // node — frontier-sized, not graph-sized, exactly L sequential
    // shuffles for L steps (the unavoidable dependency chain of a walk).
    // The symmetric trade graph has no dead ends (every node has an out
    // edge), so walks never truncate; seeding the hash with the SEED
    // keeps two walks through the same node independent.
    "graph_random_walk" -> ((s, d) => {
      val edges = repeatTradeEdges(s, d).distinct()
      val seeds = edges.filter(col("src").startsWith("s"))
        .select(col("src").as("seed")).distinct()
      randomWalkOf(edges, seeds, RandomWalkLen).orderBy("seed", "step", "node")
    }),

    // Bipartite projection / market-basket co-occurrence — the recsys
    // primitive ("parts bought together"): the order–part bipartite graph
    // projects onto part–part edges weighted by shared-order count, then
    // min-support filter and deterministic top-5 neighbors per part. NOT
    // a self-join: each order's distinct parts collapse to ONE sorted
    // array (map-side-combinable collect_set — the same shuffle a
    // distinct() would cost, and the only corpus-sized one), and the
    // c(k,2) canonical pairs generate ROW-LOCALLY from the array with an
    // indexed lambda. Blow-up is Σ c(k,2) over basket sizes (k ≤ ~7
    // here), never corpus-quadratic; at 100 TB the lever is a per-order
    // cap on k (a pathological 10⁶-line basket contributes 10¹² pairs —
    // cap or drop, the LSH hot-bucket discipline); support+top-k bound
    // the output to O(parts).
    "graph_copurchase" -> ((s, d) =>
      coPurchaseOf(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")),
        minSupport = 2, topK = 5)
        .orderBy("part_a", "rk")),

    // Degree ASSORTATIVITY — the one-number network-science diagnostic:
    // Pearson correlation of (deg(src), deg(dst)) over all directed
    // edges. Positive = hubs trade with hubs (resilient core, redundant
    // paths); negative = hub-and-spoke (hub loss partitions the graph) —
    // the number that tells you whether pagerank mass and failure modes
    // concentrate. Bipartite trade graphs are typically DISassortative
    // (big customers fan out to many small suppliers), which this corpus
    // reproduces. Plan: degree agg + two broadcast joins onto the edge
    // list + one corr aggregate — corr's accumulation is float (both
    // engines stream it), so 4dp absorbs merge-order noise, precedent
    // agg_corr_stats.
    "graph_assortativity" -> ((s, d) => assortativityOf(tradeEdges(s, d))),

    // Adamic–Adar link prediction — graph_jaccard_neighbors' weighted
    // sibling and THE classic "who should trade next" score: for customer
    // pairs sharing suppliers, Σ_z 1/ln(deg(z)) over the shared suppliers
    // z — a rare shared counterparty (low degree) is stronger evidence
    // than a hub everyone uses, which plain common-neighbor counts (and
    // Jaccard) weight equally. Same bounded common-neighbor join as the
    // Jaccard key (pair expansion is per-supplier c(k,2), never corpus-
    // quadratic; the hub cap is the supplier-degree skew lever); a shared
    // supplier has deg ≥ 2 by construction, so ln(deg) never divides by
    // zero. min-support 2 bounds output; 4dp absorbs double sum order.
    "graph_adamic_adar" -> ((s, d) =>
      adamicAdarOf(repeatTradePairs(s, d), minCommon = 2).orderBy("a", "b")),

    "graph_jaccard_neighbors" -> ((s, d) => {
      // four consumers (both pair sides + the degree frame read twice) —
      // cache the join-derived membership fixture
      val adj = graft.GraftCaches.track(repeatTradePairs(s, d).cache())
      val deg = adj.groupBy("doc_a").agg(count(lit(1)).as("deg"))
      val common = adj.as("x")
        .join(adj.as("y"),
              col("x.doc_b") === col("y.doc_b") && col("x.doc_a") < col("y.doc_a"))
        .groupBy(col("x.doc_a").as("a"), col("y.doc_a").as("b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(deg.select(col("doc_a").as("a"), col("deg").as("deg_a")), "a")
        .join(deg.select(col("doc_a").as("b"), col("deg").as("deg_b")), "b")
        .withColumn("jaccard",
          round(col("common") / (col("deg_a") + col("deg_b") - col("common")), 4))
        .filter(col("jaccard") >= 0.2)
        .select("a", "b", "common", "jaccard")
        .orderBy("a", "b")
    }),

    // Personalized PageRank over the sparse repeat-trade graph, seeded at
    // the lexicographically smallest SUPPLIER node (same deterministic
    // seed rule as graph_bfs), 3 fixed iterations — "which entities are
    // important RELATIVE to this one", the related-items primitive global
    // PageRank can't answer. Probability-scale ranks (they sum to ≤ 1)
    // emitted at 6 dp; only reached nodes (rank > 0, an exact-in-IEEE
    // predicate) appear, so output size is neighborhood- not graph-sized.
    "graph_ppr" -> ((s, d) => {
      val edges = repeatTradeEdges(s, d).cache()
      graft.GraftCaches.track(edges)
      val seed = edges.filter(col("src").startsWith("s"))
        .agg(min("src")).head().getString(0)
      pprOf(edges, seed, Iterations)
        .filter(col("rank") > 0)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node")
    }),

    // INCREMENTAL connected components — the day-2 economics for graphs:
    // day-1 components are summarized by their LABEL FOREST (one
    // node→component-root edge per node, a nodes-sized frame), and the
    // day-2 update runs propagation over (day-2 edges ∪ label forest)
    // only. Correct by contraction: within a day-1 component every node
    // links to the same root, so the forest carries exactly day-1's
    // connectivity, and components of the union equal components of the
    // FULL edge set — labels stay global min node ids, so the result is
    // BIT-FOR-BIT the full rebuild (WebGraphSpec pins it against
    // graph_components, same oracle). At 100 TB: day-2 work is
    // O(new edges + total NODES), never a re-walk of day-1's edge set
    // (edges ≫ nodes on dense graphs). The day split is an md5 gate on
    // the pair — deterministic, layout-independent.
    "graph_components_incremental" -> ((s, d) => {
      // day-1 labels come from the PERSISTED forest store (built once per
      // (JVM, sfDir), prewarmed by Bench — the same day-1-amortized shape
      // as llm_dedup_incremental / llm_ann_incremental): the measured key
      // is the day-2 UPDATE only, which is the recurring production cost
      val forest = s.read.parquet(forestStorePath(s, d))
        .select(col("node").as("doc_a"), col("lbl").as("doc_b"))
      LlmOps.resolveClusters(day2Pairs(s, d).unionByName(forest))
        .select(col("node"), col("lbl").as("component"))
        .orderBy("node")
    }),

    // Connected components over the REPEAT-trade graph (pairs with ≥3
    // lineitems — the sparse thresholded subgraph, so components are
    // non-trivial at sparse SFs and propagation depth is exercised at
    // dense ones). Reuses the llm_neardup_clusters core verbatim
    // (min-label propagation + pointer jumping, O(log n) rounds, no
    // driver-side union-find); labels are lexicographic-min node ids in
    // BOTH engines, so the gate is exact.
    "graph_components" -> ((s, d) => {
      LlmOps.resolveClusters(repeatTradePairs(s, d))
        .select(col("node"), col("lbl").as("component"))
        .orderBy("node")
    }),

    // Bounded k-core peel over the repeat-trade graph: [[KcoreRounds]]
    // synchronous rounds of "drop every node with degree < [[KcoreK]],
    // then re-derive degrees" — the densest-subgraph / spam-core
    // diagnostic. Each round is one nodes-sized degree aggregate + two
    // LeftSemi joins of the edge frame against the (node-sized, broadcast)
    // survivor set, lineage-cut so round R's plan does not embed rounds
    // 1..R-1. A fixed round cap keeps the job a deterministic DAG (the
    // production bounded-latency shape; rounds ≥ peel depth = exact core)
    // and the oracle's unrolled CTEs finite. Output = each surviving
    // node's degree WITHIN the surviving subgraph.
    "graph_kcore" -> ((s, d) =>
      kcoreOf(repeatTradeEdges(s, d), KcoreK, KcoreRounds).orderBy("node")),

    // Local clustering coefficient over the co-supply graph (the oriented
    // a<b edge frame graph_triangles builds): coeff(v) = 2·tri(v) /
    // (deg(v)·(deg(v)−1)) — "how clique-like is this node's
    // neighborhood", the community-structure diagnostic that turns raw
    // triangle counts into a comparable per-node score. Reuses
    // [[perNodeTriangles]] verbatim; the degree frame comes from the same
    // oriented edges (each endpoint counted once per edge), and nodes with
    // degree ≥ 2 but zero triangles surface with coeff 0.0 via the left
    // join (they are the interesting ones — connected but not clustered).
    // The ratio of two exact integers rounds 4dp identically cross-engine.
    "graph_clustering_coeff" -> ((s, d) => {
      val p = repeatTradePairs(s, d)
      val e = p.as("p1")
        .join(p.as("p2"),
              col("p1.doc_a") === col("p2.doc_a") && col("p1.doc_b") < col("p2.doc_b"))
        .groupBy(col("p1.doc_b").as("a"), col("p2.doc_b").as("b"))
        .agg(count(lit(1)).as("shared")).filter(col("shared") >= 2)
        .select("a", "b").cache()
      graft.GraftCaches.track(e)
      clusteringCoeffOf(e).orderBy("node")
    }),

    // Synchronous label propagation (community detection) over the
    // repeat-trade graph, [[LpaRounds]] fixed rounds: every node adopts
    // the most frequent label among its neighbors, ties broken toward the
    // LARGEST label — the (count, label) argmax is one max(struct) per
    // node, a total order both engines implement exactly, which is what
    // makes sync-LPA deterministic here (classic LPA's random tie-break
    // is the part that doesn't survive a cross-engine gate). Per round:
    // one edge-sized join against the node-sized label frame + two hash
    // aggregates, lineage-cut; labels init to the node's own id. Output =
    // final (node, label) — nodes sharing a label are one community.
    "graph_label_propagation" -> ((s, d) =>
      lpaOf(repeatTradeEdges(s, d), LpaRounds).orderBy("node"))
    ,

    // Newman modularity of the LPA partition — the "was this community
    // detection any good" number (Q > 0 = denser inside communities than
    // a degree-preserving random graph): Q = Σ_c [L_c/m − (deg_c/2m)²],
    // computed here on the symmetric frame where every undirected edge
    // appears twice, so with M = |directed| = 2m the per-community terms
    // reduce to intra_c/M − (deg_c/M)². One edge-sized join against the
    // broadcast node-sized label frame per endpoint, one hash-agg to
    // community granularity — everything after is arithmetic on the
    // ≤|communities| row set, folded over a SORTED community list so the
    // double sum is bit-stable cross-engine. Oracle: the LPA rounds
    // unrolled (same CTEs as graph_label_propagation) + the same fold.
    "graph_modularity" -> ((s, d) => {
      val e = repeatTradeEdges(s, d)
      modularityOf(e, lpaOf(e, LpaRounds))
    })    ,

    // Edge reciprocity of the DIRECTED trade graph — the "how mutual is
    // this network" scalar (near 1 = bilateral relationships, near 0 =
    // one-way flows; the first diagnostic before choosing directed vs
    // undirected algorithms). One self-equi-join on the flipped key pair
    // (co-partitionable — the edge frame shuffles once on (src, dst) and
    // once flipped, both linear), ratio of exact integer counts. The
    // directed frame here is customer→supplier with a REVERSED arc for
    // pairs above the repeat threshold, so reciprocity is genuinely
    // strictly between 0 and 1.
    // Sampled harmonic centrality (the Eppstein–Wang estimator shape):
    // multi-source hop-bounded BFS from a FIXED deterministic seed set
    // (the HarmonicSeeds lexicographically-smallest nodes — a production
    // run samples seeds; determinism here is what makes the row
    // hash-gatable), then per node harmonic = Σ_seeds 1/d(seed, node)
    // over seeds that reach it within HarmonicRounds hops. Exact
    // all-sources closeness is O(V·E) — the sampled-seed estimate is the
    // published scale path, and the per-round cost is one frontier join +
    // min-agg like graph_bfs, with (seed, node) state instead of node.
    // The harmonic sum is computed from the per-distance INTEGER counts
    // (n1/1 + n2/2 + n3/3 + n4/4), one fixed-shape double expression —
    // never a float fold over an engine-ordered list.
    "graph_harmonic" -> ((s, d) => {
      val edges = graft.GraftCaches.track(repeatTradeEdges(s, d).cache())
      val seeds = edges.select(col("src").as("seed")).distinct()
        .orderBy("seed").limit(HarmonicSeeds)
      harmonicOf(edges, seeds, HarmonicRounds).orderBy("node")
    }),

    // Sampled Brandes betweenness over the sparse repeat-trade graph:
    // k-source exact dependency accumulation (integer path counts
    // forward, δ backward), hop-bounded so the oracle's unrolled level
    // CTEs stay finite; the fixed lexicographic source set is the
    // graph_harmonic sampling convention (determinism = hash-gatable).
    "graph_betweenness" -> ((s, d) => {
      val edges = graft.GraftCaches.track(repeatTradeEdges(s, d).cache())
      val seeds = edges.select(col("src").as("seed")).distinct()
        .orderBy("seed").limit(BetweennessSeeds)
      betweennessOf(edges, seeds, BetweennessRounds).orderBy("node")
    }),

    "graph_reciprocity" -> ((s, d) =>
      reciprocityOf(reciprocityEdges(s, d)))
  ))

  /** graph_reciprocity's fixture: the directed trade arcs plus a
    * REVERSED arc for above-threshold pairs, deduped — mutuality is then
    * genuinely strictly between 0 and 1. Shared with ApiSpec. */
  private[graft] def reciprocityEdges(s: SparkSession, d: String): DataFrame =
    directedTradeEdges(s, d)
      .unionByName(
        custSuppPairs(s, d, 3L)
          .select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()

  /** Edge reciprocity of a directed (src, dst) frame
    * (graph_reciprocity / Graph.reciprocity): mutual-edge fraction via
    * ONE unordered-pair groupBy aggregation (canonical {src,dst} key,
    * map-side combinable, no join — r20) — the first diagnostic before
    * choosing directed vs undirected algorithms. Returns one row
    * (n_edges, n_recip, reciprocity 4dp). Callers should dedup the
    * frame first. */
  private[graft] def reciprocityOf(eIn: DataFrame): DataFrame = {
    // r20 wave 2: ONE canonical-pair aggregation replaces the cached
    // frame + flipped-pair semi-join + two separate count aggregates
    // (probe: 11 jobs, a cache materialization and three ~250 ms
    // 32-task stages for what is one map-side-combinable shuffle of
    // pair-sized partials). Group DEDUPED arcs by the unordered pair
    // {src,dst}: both directions present (ndir = 2) — or a self-loop,
    // whose flip is itself — makes every arc of the pair reciprocal.
    // NULL-endpoint arcs keep their (src, dst) as the group key with
    // fwd = NULL, so they count in n_edges and never in n_recip —
    // exactly the old semi-join's `=== NULL never matches` behavior.
    // Exact integer counts, same output, no cache, no join.
    val nullish = col("src").isNull || col("dst").isNull
    val pairs = eIn.select(
      when(nullish || col("src") <= col("dst"), col("src"))
        .otherwise(col("dst")).as("pa"),
      when(nullish || col("src") <= col("dst"), col("dst"))
        .otherwise(col("src")).as("pb"),
      when(nullish, lit(null).cast("boolean"))
        .otherwise(col("src") <= col("dst")).as("fwd"),
      coalesce(col("src") === col("dst"), lit(false)).as("loop"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_arcs"),
           count_distinct(col("fwd")).as("ndir"),
           max(col("loop")).as("has_loop"))
    pairs.agg(
        coalesce(sum("n_arcs"), lit(0L)).as("n_edges"),
        coalesce(sum(when(col("has_loop") || col("ndir") === 2,
                          col("n_arcs")).otherwise(0L)), lit(0L)).as("n_recip"))
      .select(col("n_edges"), col("n_recip"),
        round(col("n_recip").cast("double") / col("n_edges"), 4)
          .as("reciprocity"))
  }

  /** Newman modularity of a (node, lbl) partition over a SYMMETRIC
    * (src, dst) edge frame (graph_modularity / Graph.modularity):
    * Q = Σ_c [intra_c/M − (deg_c/M)²] with M the directed edge count
    * (= 2m undirected). One edge-sized join per endpoint against the
    * broadcast node-sized label frame, one hash-agg to community
    * granularity; the Q fold runs over a SORTED community list so the
    * double sum is bit-stable. Returns one row
    * (n_edges_directed, n_communities, modularity 4dp). */
  private[graft] def modularityOf(edges: DataFrame,
                                  labels: DataFrame): DataFrame =
    edges
      .join(broadcast(labels.select(col("node").as("sn"),
                                    col("lbl").as("slbl"))),
            col("src") === col("sn"))
      .join(broadcast(labels.select(col("node").as("dn"),
                                    col("lbl").as("dlbl"))),
            col("dst") === col("dn"))
      .groupBy("slbl")
      .agg(count(lit(1)).as("deg"),
           sum(when(col("slbl") === col("dlbl"), 1L).otherwise(0L)).as("intra"))
      .agg(sum("deg").as("m2"), count(lit(1)).cast("int").as("n_communities"),
           sort_array(collect_list(struct(col("slbl"), col("intra"),
                                          col("deg")))).as("cs"))
      .select(col("m2").as("n_edges_directed"), col("n_communities"),
        round(expr(
          """aggregate(cs, CAST(0.0 AS DOUBLE),
             (a, x) -> a + CAST(x.intra AS DOUBLE) / m2
                         - pow(CAST(x.deg AS DOUBLE) / m2, 2))"""), 4)
          .as("modularity"))

  /** One unrolled PPR round as a DuckDB CTE block (see graph_ppr). */
  private def pprRoundSql(i: Int): String = s"""r$i AS (
        SELECT n.node,
               0.85 * coalesce(c.s, 0) +
               0.15 * CASE WHEN n.node = (SELECT sn FROM seed) THEN 1.0 ELSE 0.0 END AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, sum(r${i - 1}.rank / e.outdeg) AS s
          FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node GROUP BY e.dst) c
        ON n.node = c.node)"""

  /** One forward Brandes level as DuckDB CTEs (see graph_betweenness):
    * candidate path-count agg over the previous level's frontier, then
    * the anti-join against every prior level (the BFS settled set). */
  private def bwLevelSql(i: Int): String = {
    val prior = (0 until i).map(j => s"SELECT s, node FROM l$j")
      .mkString(" UNION ALL ")
    s"""c$i AS (
        SELECT f.s, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM l${i - 1} f JOIN e ON e.src = f.node GROUP BY 1, 2),
      l$i AS (
        SELECT c.s, c.node, c.sigma FROM c$i c
        LEFT JOIN ($prior) v ON v.s = c.s AND v.node = c.node
        WHERE v.node IS NULL)"""
  }

  /** One backward Brandes level as DuckDB CTEs: the inner-join successor
    * contribution (terms folded over a node-SORTED list — the Spark
    * side's sort_array/aggregate discipline) then the LEFT JOIN that
    * keeps successor-less nodes at δ = 0, δ rounded 6dp per level. */
  private def bwDeltaSql(i: Int): String = s"""x$i AS (
        SELECT v.s, v.node,
               list_sum(list_transform(
                 list(struct_pack(wn := w.node,
                      t := (1.0 + w.delta) / CAST(w.sigma AS DOUBLE))
                      ORDER BY w.node), x -> x.t)) AS dsum
        FROM l$i v JOIN e ON e.src = v.node
        JOIN d${i + 1} w ON w.s = v.s AND w.node = e.dst
        GROUP BY v.s, v.node),
      d$i AS (
        SELECT v.s, v.node, v.sigma,
               round(COALESCE(CAST(v.sigma AS DOUBLE) * x.dsum, 0.0), 6)
                 AS delta
        FROM l$i v LEFT JOIN x$i x ON x.s = v.s AND x.node = v.node)"""

  /** Oracle: the same three rounds unrolled as chained CTEs (DuckDB has no
    * iterative DataFrame loop; recursion with per-round global aggregation
    * does not fit a plain recursive CTE's single-reference rule). */
  val oracle: Map[String, String] = graft.Contract.uniqueMap("GraphOps.oracle", Seq(
    // Three max-normalized HITS rounds unrolled as CTEs; max is
    // order-exact, scores round 6dp per half-round exactly like the
    // Spark loop, so every round's inputs are bit-identical cross-engine.
    "graph_hits" -> """
      WITH edges AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      a0 AS (SELECT DISTINCT dst AS node, 1.0 AS a FROM edges),
      h1 AS (SELECT node, round(hr / max(hr) OVER (), 6) AS h FROM (
               SELECT e.src AS node, sum(a.a) AS hr
               FROM edges e JOIN a0 a ON e.dst = a.node GROUP BY e.src)),
      a1 AS (SELECT node, round(ar / max(ar) OVER (), 6) AS a FROM (
               SELECT e.dst AS node, sum(h.h) AS ar
               FROM edges e JOIN h1 h ON e.src = h.node GROUP BY e.dst)),
      h2 AS (SELECT node, round(hr / max(hr) OVER (), 6) AS h FROM (
               SELECT e.src AS node, sum(a.a) AS hr
               FROM edges e JOIN a1 a ON e.dst = a.node GROUP BY e.src)),
      a2 AS (SELECT node, round(ar / max(ar) OVER (), 6) AS a FROM (
               SELECT e.dst AS node, sum(h.h) AS ar
               FROM edges e JOIN h2 h ON e.src = h.node GROUP BY e.dst)),
      h3 AS (SELECT node, round(hr / max(hr) OVER (), 6) AS h FROM (
               SELECT e.src AS node, sum(a.a) AS hr
               FROM edges e JOIN a2 a ON e.dst = a.node GROUP BY e.src)),
      a3 AS (SELECT node, round(ar / max(ar) OVER (), 6) AS a FROM (
               SELECT e.dst AS node, sum(h.h) AS ar
               FROM edges e JOIN h3 h ON e.src = h.node GROUP BY e.dst))
      SELECT node, a FROM a3 ORDER BY node""",

    "graph_pagerank" -> """
      WITH pairs AS (
        SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT cust AS src, supp AS dst FROM pairs
        UNION ALL
        SELECT supp AS src, cust AS dst FROM pairs),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      e AS (SELECT edges.src, edges.dst, deg.outdeg
            FROM edges JOIN deg ON edges.src = deg.src),
      r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
      r1 AS (SELECT e.dst AS node, 0.15 + 0.85 * sum(r0.rank / e.outdeg) AS rank
             FROM e JOIN r0 ON e.src = r0.node GROUP BY e.dst),
      r2 AS (SELECT e.dst AS node, 0.15 + 0.85 * sum(r1.rank / e.outdeg) AS rank
             FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst),
      r3 AS (SELECT e.dst AS node, 0.15 + 0.85 * sum(r2.rank / e.outdeg) AS rank
             FROM e JOIN r2 ON e.src = r2.node GROUP BY e.dst)
      SELECT node, round(rank, 4) AS rank
      FROM r3 WHERE node LIKE 's%' ORDER BY node""",

    // Same 3 unrolled rounds as the pagerank oracle, minus the degree
    // division: x_k = round(0.005 * sum of in-neighbor x_{k-1} + 1, 6)
    // — the per-round 6dp rounding matches the Spark side so both
    // engines feed bit-identical scores forward. Each round LEFT JOINs
    // from the r0 node universe with COALESCE(sum, 0) so nodes with no
    // in-edges hold x = 1 every round exactly as the Spark side's left
    // join does — equivalent on any directed graph, not just the
    // both-directions trade graph.
    "graph_katz" -> """
      WITH pairs AS (
        SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT cust AS src, supp AS dst FROM pairs
        UNION ALL
        SELECT supp AS src, cust AS dst FROM pairs),
      r0 AS (SELECT DISTINCT src AS node, 1.0 AS x FROM edges),
      r1 AS (SELECT n.node, round(0.005 * COALESCE(sum(p.x), 0) + 1.0, 6) AS x
             FROM (SELECT node FROM r0) n
             LEFT JOIN edges e ON e.dst = n.node
             LEFT JOIN r0 p ON e.src = p.node GROUP BY n.node),
      r2 AS (SELECT n.node, round(0.005 * COALESCE(sum(p.x), 0) + 1.0, 6) AS x
             FROM (SELECT node FROM r0) n
             LEFT JOIN edges e ON e.dst = n.node
             LEFT JOIN r1 p ON e.src = p.node GROUP BY n.node),
      r3 AS (SELECT n.node, round(0.005 * COALESCE(sum(p.x), 0) + 1.0, 6) AS x
             FROM (SELECT node FROM r0) n
             LEFT JOIN edges e ON e.dst = n.node
             LEFT JOIN r2 p ON e.src = p.node GROUP BY n.node)
      SELECT node, round(x, 4) AS x
      FROM r3 WHERE node LIKE 's%' ORDER BY node""",

    // Recursive frontier expansion, capped at the same hop bound as the
    // Spark rounds — the cap is what keeps (node, dist) recursion finite
    // on a cyclic graph.
    "graph_bfs" -> s"""
      WITH RECURSIVE p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s AS src, c AS dst FROM p),
      seed AS (SELECT min(src) AS node FROM e),
      reach(node, dist) AS (
        SELECT node, 0 FROM seed
        UNION
        SELECT e.dst, r.dist + 1 FROM reach r JOIN e ON e.src = r.node
        WHERE r.dist < $BfsRounds)
      SELECT node, CAST(min(dist) AS INTEGER) AS dist
      FROM reach GROUP BY node ORDER BY node""",

    // Min over hop-bounded weighted walks — the recursion state is finite
    // because weights are small integers (dist ≤ 5·cap) and UNION dedups
    // (node, dist, hops) tuples; equals Bellman-Ford after `cap` rounds.
    // Multi-seed hop-bounded BFS as one recursive CTE with (seed, node)
    // state; harmonic from per-distance integer counts in the same fixed
    // expression shape as the Spark side (left-assoc n1/1 + … + n4/4).
    "graph_harmonic" -> s"""
      WITH RECURSIVE p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s AS src, c AS dst FROM p),
      seeds AS (SELECT src AS seed FROM e GROUP BY 1 ORDER BY 1 LIMIT $HarmonicSeeds),
      reach(seed, node, dist) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT r.seed, e.dst, r.dist + 1 FROM reach r JOIN e ON e.src = r.node
        WHERE r.dist < $HarmonicRounds),
      d AS (SELECT seed, node, min(dist) AS dist FROM reach GROUP BY 1, 2)
      SELECT node, CAST(count(*) AS BIGINT) AS n_reached,
             round(${(1 to HarmonicRounds).map(h =>
               s"CAST(sum(CASE WHEN dist = $h THEN 1 ELSE 0 END) AS DOUBLE) / $h")
               .mkString(" + ")}, 4) AS harmonic
      FROM d WHERE dist > 0 GROUP BY node ORDER BY node""",

    // Sampled Brandes, every stage mirrored: path-count BFS levels with
    // anti-joins against the settled set (exact integer σ), backward δ
    // accumulation with per-level 6dp rounding and node-sorted term
    // folds, then the source-sorted cross-sample fold — so each level's
    // inputs are bit-identical cross-engine.
    "graph_betweenness" -> s"""
      WITH p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p
            UNION ALL SELECT s AS src, c AS dst FROM p),
      seeds AS (SELECT src AS sd FROM e GROUP BY 1
                ORDER BY 1 LIMIT $BetweennessSeeds),
      l0 AS (SELECT sd AS s, sd AS node, CAST(1 AS BIGINT) AS sigma
             FROM seeds),
      ${(1 to BetweennessRounds).map(bwLevelSql).mkString(",\n      ")},
      d$BetweennessRounds AS (
        SELECT s, node, sigma, CAST(0.0 AS DOUBLE) AS delta
        FROM l$BetweennessRounds),
      ${((BetweennessRounds - 1) to 0 by -1).map(bwDeltaSql)
        .mkString(",\n      ")},
      allv AS (${(1 to BetweennessRounds)
        .map(i => s"SELECT s, node, delta FROM d$i").mkString(" UNION ALL ")})
      SELECT node,
             round(list_sum(list_transform(
               list(struct_pack(s := s, delta := delta) ORDER BY s, delta),
               x -> x.delta)), 4) AS bc
      FROM allv GROUP BY node ORDER BY node""",

    "graph_sssp" -> s"""
      WITH RECURSIVE p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s,
               count(*) % 5 + 1 AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst, w FROM p
            UNION ALL SELECT s AS src, c AS dst, w FROM p),
      seed AS (SELECT min(src) AS node FROM e),
      reach(node, dist, hops) AS (
        SELECT node, 0, 0 FROM seed
        UNION
        SELECT e.dst, r.dist + e.w, r.hops + 1
        FROM reach r JOIN e ON e.src = r.node
        WHERE r.hops < $SsspRounds)
      SELECT node, CAST(min(dist) AS INT) AS dist
      FROM reach GROUP BY node ORDER BY node""",

    // The same 3 rounds unrolled (generated one CTE block per round):
    // restart mass at the seed instead of uniform, LEFT join keeps
    // contribution-less nodes at their restart-only rank.
    "graph_ppr" -> s"""
      WITH p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e0 AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s AS src, c AS dst FROM p),
      deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
      e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg ON e0.src = deg.src),
      seed AS (SELECT min(src) AS sn FROM e0 WHERE src LIKE 's%'),
      nodes AS (SELECT src AS node FROM deg),
      r0 AS (SELECT node,
               CASE WHEN node = (SELECT sn FROM seed) THEN 1.0 ELSE 0.0 END AS rank
             FROM nodes),
      ${(1 to Iterations).map(pprRoundSql).mkString(",\n      ")}
      SELECT node, round(rank, 6) AS rank
      FROM r$Iterations WHERE rank > 0 ORDER BY node""",

    // Same wedge-join + degree derivation; HUGEINT common cast to BIGINT,
    // DuckDB's int/int division is already true division.
    // Same hash-choice walk as recursion: rank/degree derived identically
    // (row_number−1 per src ordered by dst), the step picks
    // md5(seed:step:node) mod deg — DuckDB hex→int via the '0x' cast
    // idiom; walk depth bounds the recursion.
    "graph_random_walk" -> s"""
      WITH RECURSIVE p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT DISTINCT src, dst FROM (
              SELECT c AS src, s AS dst FROM p
              UNION ALL SELECT s AS src, c AS dst FROM p)),
      adj AS (
        SELECT src, dst,
               CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                    AS BIGINT) AS rnk
        FROM e),
      deg AS (SELECT src, count(*) AS deg FROM adj GROUP BY src),
      seeds AS (SELECT DISTINCT src AS seed FROM e WHERE src LIKE 's%'),
      walk(seed, step, node) AS (
        SELECT seed, 0, seed FROM seeds
        UNION ALL
        SELECT w.seed, w.step + 1, a.dst
        FROM walk w
        JOIN deg dg ON dg.src = w.node
        JOIN adj a ON a.src = w.node
         AND a.rnk = ('0x' || substring(
               md5(w.seed || ':' || (w.step + 1)::VARCHAR || ':' || w.node),
               1, 6))::BIGINT % dg.deg
        WHERE w.step < $RandomWalkLen)
      SELECT seed, CAST(step AS INTEGER) AS step, node
      FROM walk ORDER BY seed, step, node""",

    "graph_copurchase" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      pairs AS (
        SELECT x.pk AS part_a, y.pk AS part_b, count(*) AS w
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        GROUP BY 1, 2
        HAVING count(*) >= 2),
      ranked AS (
        SELECT part_a, part_b, w,
               CAST(row_number() OVER (PARTITION BY part_a
                 ORDER BY w DESC, part_b ASC) AS INTEGER) AS rk
        FROM pairs)
      SELECT part_a, part_b, w, rk
      FROM ranked WHERE rk <= 5
      ORDER BY part_a, rk""",

    // corr() is Pearson in both engines; the dense (threshold-1) trade
    // graph in symmetric form, like the pagerank oracle's derivation.
    "graph_assortativity" -> """
      WITH p AS (
        SELECT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      e AS (SELECT a AS src, b AS dst FROM p
            UNION ALL SELECT b AS src, a AS dst FROM p),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)
      SELECT count(*) AS n_edges,
             round(corr(CAST(ds.deg AS DOUBLE), CAST(dt.deg AS DOUBLE)), 4)
               AS assortativity,
             round(avg(CAST(ds.deg AS DOUBLE)), 4) AS mean_deg
      FROM e
      JOIN deg ds ON e.src = ds.src
      JOIN deg dt ON e.dst = dt.src""",

    // ln() both engines; the repeat-trade pair derivation matches the
    // Jaccard oracle's CTE.
    "graph_adamic_adar" -> """
      WITH p AS (
        SELECT 'c' || o_custkey AS doc_a, 's' || l_suppkey AS doc_b
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      deg AS (SELECT doc_b, count(*) AS ds FROM p GROUP BY 1)
      SELECT x.doc_a AS a, y.doc_a AS b, count(*) AS n_common,
             round(sum(1.0 / ln(CAST(deg.ds AS DOUBLE))), 4) AS aa
      FROM p x
      JOIN p y ON x.doc_b = y.doc_b AND x.doc_a < y.doc_a
      JOIN deg ON x.doc_b = deg.doc_b
      GROUP BY 1, 2
      HAVING count(*) >= 2
      ORDER BY a, b""",

    "graph_jaccard_neighbors" -> """
      WITH p AS (
        SELECT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      deg AS (SELECT cust, count(*) AS deg FROM p GROUP BY cust),
      common AS (
        SELECT x.cust AS a, y.cust AS b, count(*) AS common
        FROM p x JOIN p y ON x.supp = y.supp AND x.cust < y.cust
        GROUP BY 1, 2),
      j AS (
        SELECT a, b, CAST(common AS BIGINT) AS common,
               round(common / (da.deg + db.deg - common), 4) AS jaccard
        FROM common
        JOIN deg da ON common.a = da.cust
        JOIN deg db ON common.b = db.cust)
      SELECT a, b, common, jaccard
      FROM j WHERE jaccard >= 0.2
      ORDER BY a, b""",

    "graph_degree_hist" -> """
      WITH pairs AS (
        SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (
        SELECT cust AS src FROM pairs
        UNION ALL
        SELECT supp AS src FROM pairs),
      deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
      SELECT degree, count(*) AS n_nodes
      FROM deg GROUP BY degree ORDER BY degree""",

    // Same orientation (string < on namespaced ids), same wedge+closure
    // joins; the per-node count unions each triangle's three corners.
    "graph_triangles" -> """
      WITH p AS (
        SELECT o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (
        SELECT p1.s AS a, p2.s AS b FROM p p1 JOIN p p2
        ON p1.c = p2.c AND p1.s < p2.s
        GROUP BY 1, 2 HAVING count(*) >= 2),
      t AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT node, count(*) AS triangles
      FROM (SELECT x AS node FROM t UNION ALL
            SELECT y FROM t UNION ALL SELECT z FROM t)
      GROUP BY node ORDER BY node""",

    // Transitive closure by recursive CTE (UNION-deduped label spread to
    // fixpoint), component = min reachable label — the same
    // lexicographic-min convention as the Spark propagation. Closure size
    // is bounded by nodes × component size: fine at oracle scale, which is
    // exactly why the SPARK side uses O(log n) pointer jumping instead.
    "graph_components" -> ComponentsOracleSql,

    // Incremental ≡ full rebuild by the contraction argument (key doc),
    // so the oracle IS the full-graph closure — ONE constant for both
    // keys (an independent derivation that never sees the day split).
    "graph_components_incremental" -> ComponentsOracleSql,

    // The same fixed peel rounds unrolled as CTE pairs (survivors_i,
    // edges_i); the final degree count runs over the round-4 edge set.
    "graph_kcore" -> s"""
      WITH p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e0 AS (SELECT c AS src, s AS dst FROM p
             UNION ALL SELECT s AS src, c AS dst FROM p),
      ${(1 to KcoreRounds).map(i => s"""n$i AS (
        SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= $KcoreK),
      e$i AS (
        SELECT e.src, e.dst FROM e${i - 1} e
        JOIN n$i a ON e.src = a.src
        JOIN n$i b ON e.dst = b.src)""").mkString(",\n      ")}
      SELECT src AS node, count(*) AS core_degree
      FROM e$KcoreRounds GROUP BY src ORDER BY node""",

    // graph_triangles' wedge/closure CTEs + an oriented-degree CTE; the
    // left join keeps triangle-less nodes at coeff 0.0.
    "graph_clustering_coeff" -> """
      WITH p AS (
        SELECT o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (
        SELECT p1.s AS a, p2.s AS b FROM p p1 JOIN p p2
        ON p1.c = p2.c AND p1.s < p2.s
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (
        SELECT node, count(*) AS degree FROM (
          SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node),
      t AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      tri AS (
        SELECT node, count(*) AS triangles
        FROM (SELECT x AS node FROM t UNION ALL
              SELECT y FROM t UNION ALL SELECT z FROM t)
        GROUP BY node)
      SELECT d.node, d.degree,
             CAST(coalesce(tri.triangles, 0) AS BIGINT) AS triangles,
             round(2.0 * coalesce(tri.triangles, 0)
                   / (d.degree * (d.degree - 1)), 4) AS coeff
      FROM deg d LEFT JOIN tri ON d.node = tri.node
      WHERE d.degree >= 2
      ORDER BY d.node""",

    // The same synchronous rounds unrolled; the (count, label) argmax is
    // a row_number window ordered (cnt DESC, lbl DESC) — identical total
    // order to the Spark side's max(struct(cnt, lbl)).
    "graph_label_propagation" -> s"""
      WITH p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p
            UNION ALL SELECT s AS src, c AS dst FROM p),
      l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
      ${(1 to LpaRounds).map(i => s"""l$i AS (
        SELECT dst AS node, lbl FROM (
          SELECT e.dst, l.lbl,
                 row_number() OVER (PARTITION BY e.dst
                                    ORDER BY count(*) DESC, l.lbl DESC) AS rn
          FROM e JOIN l${i - 1} l ON e.src = l.node
          GROUP BY e.dst, l.lbl)
        WHERE rn = 1)""").mkString(",\n      ")}
      SELECT node, lbl FROM l$LpaRounds ORDER BY node""",

    // Directed trade arcs + reversed above-threshold arcs, the same
    // semi-join reciprocity count.
    "graph_reciprocity" -> """
      WITH p1 AS (
        SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      p3 AS (
        SELECT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM p1 UNION ALL SELECT src, dst FROM p3)),
      r AS (
        SELECT count(*) AS n_recip FROM e
        WHERE EXISTS (SELECT 1 FROM e e2
                      WHERE e2.src = e.dst AND e2.dst = e.src)),
      n AS (SELECT count(*) AS n_edges FROM e)
      SELECT n.n_edges, r.n_recip,
             round(CAST(r.n_recip AS DOUBLE) / n.n_edges, 4) AS reciprocity
      FROM n CROSS JOIN r""",

    // The graph_label_propagation rounds verbatim, then modularity as a
    // sorted community-list fold (same order as the Spark sort_array).
    "graph_modularity" -> s"""
      WITH p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p
            UNION ALL SELECT s AS src, c AS dst FROM p),
      l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
      ${(1 to LpaRounds).map(i => s"""l$i AS (
        SELECT dst AS node, lbl FROM (
          SELECT e.dst, l.lbl,
                 row_number() OVER (PARTITION BY e.dst
                                    ORDER BY count(*) DESC, l.lbl DESC) AS rn
          FROM e JOIN l${i - 1} l ON e.src = l.node
          GROUP BY e.dst, l.lbl)
        WHERE rn = 1)""").mkString(",\n      ")},
      j AS (
        SELECT ls.lbl AS slbl, ld.lbl AS dlbl
        FROM e JOIN l$LpaRounds ls ON e.src = ls.node
               JOIN l$LpaRounds ld ON e.dst = ld.node),
      c AS (
        SELECT slbl, CAST(count(*) AS BIGINT) AS deg,
               CAST(sum(CASE WHEN slbl = dlbl THEN 1 ELSE 0 END) AS BIGINT) AS intra
        FROM j GROUP BY 1),
      t AS (
        SELECT CAST(sum(deg) AS BIGINT) AS m2,
               CAST(count(*) AS INTEGER) AS n_communities,
               list(struct_pack(intra := intra, deg := deg)
                    ORDER BY slbl) AS cs
        FROM c)
      SELECT m2 AS n_edges_directed, n_communities,
             round(list_sum(list_transform(cs,
               x -> CAST(x.intra AS DOUBLE) / m2
                    - pow(CAST(x.deg AS DOUBLE) / m2, 2))), 4) AS modularity
      FROM t"""
  ))

  private lazy val ComponentsOracleSql: String = """
      WITH RECURSIVE p AS (
        SELECT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 3),
      e AS (SELECT c AS src, s AS dst FROM p UNION ALL SELECT s AS src, c AS dst FROM p),
      reach(node, lbl) AS (
        SELECT DISTINCT src, src FROM e
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node)
      SELECT node, min(lbl) AS component FROM reach GROUP BY node ORDER BY node"""
}
