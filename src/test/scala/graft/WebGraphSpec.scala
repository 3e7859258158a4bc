package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted properties for the web-curation family (WebOps) and the
  * triangle counter — beyond OperatorSpec's generic non-empty/determinism
  * loop and the driver's oracle gate. */
class WebGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir
  import spark.implicits._

  test("canonicalUrl collapses case/port/utm/fragment variants to one spelling") {
    val variants = Seq(
      "https://SRC2.Example.COM:443/en/doc4?utm_source=feed&utm_campaign=w1&id=3#top",
      "https://src2.example.com/en/doc4?id=3",
      "https://src2.example.com:443/en/doc4?utm_medium=mail&id=3",
      "https://src2.example.com/en/doc4?id=3#section-9")
    val out = variants.toDF("url")
      .select(graft.ops.WebOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out === Set("https://src2.example.com/en/doc4?id=3"))
    // non-variants must NOT collapse: different id param / different path
    val distinct = Seq(
      "https://src2.example.com/en/doc4?id=4",
      "https://src2.example.com/en/doc5?id=3",
      "https://src3.example.com/en/doc4?id=3")
      .toDF("url").select(graft.ops.WebOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(distinct.size === 3 && !distinct.contains("https://src2.example.com/en/doc4?id=3"))
  }

  test("canonicalUrl generalizes: http default port, path-less, scheme-less inputs") {
    def canon(u: String) =
      Seq(u).toDF("url").select(graft.ops.WebOps.canonicalUrl(col("url")))
        .head().getString(0)
    assert(canon("http://A.Example.COM:80/x?utm_x=1&p=1") === "http://a.example.com/x?p=1")
    assert(canon("http://a.example.com:443/x") === "http://a.example.com:443/x",
      ":443 is NOT http's default port and must survive")
    assert(canon("https://Host.Com?x=1") === "https://host.com?x=1",
      "path-less URLs must not duplicate their query")
    assert(canon("ftp://Files.Example.com/pub") === "ftp://files.example.com/pub")
    assert(canon("no scheme here#frag") === "no scheme here",
      "unparseable rows fall back to fragment-stripping, never collapse to ''")
  }

  test("llm_url_dedup partitions the corpus: n_dups sums to the doc count, groups > 1 exist") {
    val out = SparkEntry.queries("llm_url_dedup")(spark, d).collect()
    val total = out.map(_.getAs[Long]("n_dups")).sum
    val docs = Tables.documents(spark, d).count()
    assert(total === docs, "every document lands in exactly one canonical group")
    assert(out.exists(_.getAs[Long]("n_dups") > 1), "the derivation plants real dup groups")
  }

  test("llm_domain_filter drops exactly the blocklisted hosts") {
    val hosts = SparkEntry.queries("llm_domain_filter")(spark, d)
      .collect().map(_.getAs[String]("host")).toSet
    assert(graft.ops.WebOps.BlockedHosts.forall(b => !hosts.contains(b)))
    assert(hosts.forall(_.endsWith(".example.com")))
    // at sf0.001 only a subset of the 20 sources may appear, but none blocked
    assert(hosts.nonEmpty)
  }

  test("fn_url_parse components recompose to the original URL") {
    val parsed = SparkEntry.queries("fn_url_parse")(spark, d)
    val rebuilt = parsed
      .join(graft.ops.WebOps.urls(spark, d), "doc_id")
      .withColumn("again", concat(
        lit("https://"), col("host"),
        when(col("url").contains(":443"), lit(":443")).otherwise(lit("")),
        col("path"), lit("?"), col("query"),
        when(col("frag") === "", lit("")).otherwise(concat(lit("#"), col("frag")))))
      .filter(col("again") =!= col("url"))
    assert(rebuilt.count() === 0)
  }

  test("llm_bm25_topk: scores positive, sorted, and bounded by the saturation ceiling") {
    val rows = SparkEntry.queries("llm_bm25_topk")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= graft.ops.WebOps.Bm25TopK)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // ceiling: tf-saturation bounds each term's contribution by idf*(k1+1);
    // idf ≤ ln(1 + (N+0.5)/0.5) with N docs
    val n = Tables.documents(spark, d).count().toDouble
    val ceiling = graft.ops.WebOps.Bm25Terms.size *
      math.log(1.0 + (n + 0.5) / 0.5) * (graft.ops.WebOps.Bm25K1 + 1.0)
    assert(scores.forall(_ <= ceiling))
  }

  test("llm_bm25_index equals llm_bm25_topk; search plan never reads the corpus") {
    val viaIndex = SparkEntry.queries("llm_bm25_index")(spark, d)
    val viaScan = SparkEntry.queries("llm_bm25_topk")(spark, d)
    assert(viaIndex.collect().toSeq === viaScan.collect().toSeq)
    // the whole point of the index: per-query work is posting-proportional
    // — the corpus parquet must be absent from the search plan, and the
    // posting scan must carry partition filters on the term buckets
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"), "index search must not scan the corpus")
    assert(plan.contains("PartitionFilters: [tb"), "bucket literals must prune partitions")
  }

  test("Web.buildBm25Index + bm25IndexSearch round-trip equals Web.bm25 (custom store)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx-test").toString
    try {
      val docs = Tables.documents(spark, d)
      graft.api.Web.buildBm25Index(docs, dir)
      val idx = graft.api.Web.bm25IndexSearch(spark, dir, graft.ops.WebOps.Bm25Terms)
        .orderBy(col("doc_id")).collect().toSeq
      val scan = graft.api.Web.bm25(docs, graft.ops.WebOps.Bm25Terms)
        .orderBy(col("doc_id")).collect().toSeq
      assert(idx === scan && idx.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("llm_bm25_incremental: two-batch append is bit-for-bit a single-batch rebuild") {
    val viaInc = SparkEntry.queries("llm_bm25_incremental")(spark, d).collect().toSeq
    val viaScan = SparkEntry.queries("llm_bm25_topk")(spark, d).collect().toSeq
    assert(viaInc === viaScan, "incremental search must equal the scan-side key")
    // and against a fresh SINGLE-batch store over the same corpus
    val dir = java.nio.file.Files.createTempDirectory("bm25inc-test").toString
    try {
      graft.api.Web.appendBm25Batch(Tables.documents(spark, d), dir, "all")
      val single = graft.api.Web.bm25IncrementalSearch(
          spark, dir, Seq("all"), graft.ops.WebOps.Bm25Terms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(graft.ops.WebOps.Bm25TopK).collect().toSeq
      assert(single === viaInc, "batch count must not perturb scores")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("stream_index_sink: streamed index maintenance equals the batch scan; replayed batch is idempotent") {
    val viaStream = SparkEntry.queries("stream_index_sink")(spark, d).collect().toSeq
    val viaScan = SparkEntry.queries("llm_bm25_topk")(spark, d).collect().toSeq
    assert(viaStream === viaScan, "streamed maintenance must equal the scan-side key")
    // replay idempotency: re-appending one batch's part over itself (the
    // crash-between-write-and-commit case) must not change the search
    val dir = graft.ops.WebOps.streamIndexPath(spark, d)
    val parts = graft.ops.WebOps.indexParts(dir)
    assert(parts.size === graft.ops.WebOps.IndexStreamChunks)
    val docs = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(graft.ops.WebOps.IndexStreamChunks)) === 0)
    graft.api.Web.appendBm25Batch(docs, dir, "0")
    val replayed = graft.ops.WebOps
      .bm25IncSearch(spark, dir, parts, graft.ops.WebOps.Bm25Terms,
                     graft.ops.WebOps.Bm25K1, graft.ops.WebOps.Bm25B)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(graft.ops.WebOps.Bm25TopK).collect().toSeq
    assert(replayed === viaStream, "a replayed batch must converge, not double-count")
  }

  test("llm_index_compact: compacted search equals the scan key and exactly one part remains") {
    val viaCompact = SparkEntry.queries("llm_index_compact")(spark, d).collect().toSeq
    val viaScan = SparkEntry.queries("llm_bm25_topk")(spark, d).collect().toSeq
    assert(viaCompact === viaScan, "compaction must move bytes, not change content")
    val dir = graft.ops.WebOps.compactIndexPath(spark, d)
    assert(graft.ops.WebOps.indexParts(dir) === Seq("c"),
      "the original batch parts must be gone after compaction")
  }

  test("compactIndex: repeated compaction folds prior compacted content in, never drops it") {
    val dir = java.nio.file.Files.createTempDirectory("bm25recompact").toString
    try {
      val docs = Tables.documents(spark, d)
      graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 1), dir, "1")
      graft.api.Web.compactBm25Index(spark, dir)          // parts -> ["c"]
      graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 0), dir, "2")
      graft.api.Web.compactBm25Index(spark, dir)          // MUST keep batch-1 docs
      assert(graft.ops.WebOps.indexParts(dir) === Seq("c"))
      val viaStore = graft.api.Web.bm25IncrementalSearch(
          spark, dir, Seq("c"), graft.ops.WebOps.Bm25Terms)
        .orderBy($"doc_id").collect().toSeq
      val viaScan = graft.api.Web.bm25(docs, graft.ops.WebOps.Bm25Terms)
        .orderBy($"doc_id").collect().toSeq
      assert(viaStore === viaScan && viaStore.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("canonicalUrl strips only utm_* — a param merely starting with 'utm' survives") {
    def canon(u: String) =
      Seq(u).toDF("url").select(graft.ops.WebOps.canonicalUrl(col("url")))
        .head().getString(0)
    assert(canon("https://a.example.com/x?utmost=1&p=2") ===
      "https://a.example.com/x?utmost=1&p=2",
      "'utmost' is not a tracking param (ADVICE r11)")
    assert(canon("https://a.example.com/x?utm=1&p=2") ===
      "https://a.example.com/x?utm=1&p=2",
      "bare 'utm' (no underscore) is not a tracking param")
    assert(canon("https://a.example.com/x?utm_source=f&p=2") ===
      "https://a.example.com/x?p=2")
  }

  test("compactIndex recovers a crashed compaction from its staging dirs") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def copyTree(from: String, to: String): Unit =
      Files.walk(Paths.get(from)).forEach { p =>
        val dst = Paths.get(to, Paths.get(from).relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      }
    def rmTree(p: String): Unit =
      if (Files.exists(Paths.get(p)))
        Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
    val a = java.nio.file.Files.createTempDirectory("bm25crash-a").toString
    val b = java.nio.file.Files.createTempDirectory("bm25crash-b").toString
    try {
      val docs = Tables.documents(spark, d)
      Seq(a, b).foreach { dir =>
        graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 1), dir, "1")
        graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 0), dir, "2")
      }
      graft.api.Web.compactBm25Index(spark, a)   // clean run = ground truth

      // worst crash point in B: staging complete, originals DELETED, rename
      // never ran — previously unrecoverable (zero visible parts)
      copyTree(s"$a/postingc", s"$b/.compact-posting")
      copyTree(s"$a/statsc", s"$b/.compact-stats")
      Seq("1", "2").foreach { p => rmTree(s"$b/posting$p"); rmTree(s"$b/stats$p") }
      assert(graft.ops.WebOps.indexParts(b).isEmpty, "crash fixture: no visible parts")
      graft.api.Web.compactBm25Index(spark, b)   // must recover, not require-fail
      assert(graft.ops.WebOps.indexParts(b) === Seq("c"))
      def search(dir: String) = graft.api.Web.bm25IncrementalSearch(
          spark, dir, Seq("c"), graft.ops.WebOps.Bm25Terms)
        .orderBy($"doc_id").collect().toSeq
      assert(search(b) === search(a) && search(b).nonEmpty,
        "recovered compaction must equal the clean one")

      // INCOMPLETE staging (no _SUCCESS) with originals intact: discarded,
      // normal compaction proceeds
      val c = java.nio.file.Files.createTempDirectory("bm25crash-c").toString
      try {
        graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 1), c, "1")
        graft.api.Web.appendBm25Batch(docs.filter($"doc_id" % 2 === 0), c, "2")
        Files.createDirectories(Paths.get(s"$c/.compact-posting"))
        Files.write(Paths.get(s"$c/.compact-posting/garbage.bin"), Array[Byte](1, 2))
        graft.api.Web.compactBm25Index(spark, c)
        assert(graft.ops.WebOps.indexParts(c) === Seq("c"))
        assert(search(c) === search(a))
      } finally rmTree(c)
    } finally { rmTree(a); rmTree(b) }
  }

  test("phraseSearch: planted docs pin adjacency, overlap, and absence semantics") {
    val dir = java.nio.file.Files.createTempDirectory("posidx-test").toString
    try {
      val docs = Seq(
        (1L, "x a b y a b z"),   // two clean occurrences of "a b"
        (2L, "a a a"),           // overlapping "a a" occurs twice
        (3L, "b a"),             // reversed — NOT a match for "a b"
        (4L, "a x b")            // gap — not adjacent
      ).toDF("doc_id", "text")
      graft.api.Web.buildPositionalIndex(docs, dir)
      def occ(phrase: Seq[String]) =
        graft.api.Web.phraseSearch(spark, dir, phrase).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(occ(Seq("a", "b")) === Map(1L -> 2L))
      assert(occ(Seq("a", "a")) === Map(2L -> 2L))
      assert(occ(Seq("b", "a")) === Map(3L -> 1L), "doc 1 has 'a b' twice but never 'b a'")
      assert(occ(Seq("a", "x", "b")) === Map(4L -> 1L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("proximitySearch: planted pair counts per slop; slop 1 equals the exact phrase") {
    val dir = java.nio.file.Files.createTempDirectory("proxidx-test").toString
    try {
      val docs = Seq((1L, "a b c a b"), (2L, "b x x x a"), (3L, "a x x x x x b"))
        .toDF("doc_id", "text")
      graft.api.Web.buildPositionalIndex(docs, dir)
      def pairs(slop: Int) =
        graft.api.Web.proximitySearch(spark, dir, "a", "b", slop)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pairs(2) === Map(1L -> 2L), "a@{0,3}, b@{1,4}: diffs 1,1 qualify; 4 does not")
      assert(pairs(4) === Map(1L -> 3L), "slop 4 admits the (0,4) pair")
      assert(pairs(6) === Map(1L -> 3L, 3L -> 1L), "doc 3's distance-6 pair needs slop 6")
      // doc 2 has b BEFORE a — ordered proximity must never match it
      assert(!pairs(10).contains(2L))
      // slop 1 degenerates to the exact 2-term phrase
      val phrase = graft.api.Web.phraseSearch(spark, dir, Seq("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pairs(1) === phrase)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("snippets: edge clipping, first-occurrence-only, non-matches absent") {
    val docs = Seq(
      (1L, "w1 w2 hash join w5 w6 w7 w8"),   // interior match, left edge clips
      (2L, "hash join x"),                   // match at the very start
      (3L, "p q r s t u hash join"),         // match at the very end
      (4L, "hash join y hash join"),         // TWO matches — first one wins
      (5L, "no match here"),
      (6L, "hash")                           // single token — must not crash
    ).toDF("doc_id", "text")
    val out = graft.api.Web.snippets(docs, "hash", "join")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "w1 w2 hash join w5 w6 w7",
      2L -> "hash join x",
      3L -> "s t u hash join",
      4L -> "hash join y hash join"))
  }

  test("pmiTerms: hand-computed PMI on a planted corpus") {
    val docs = Seq(
      (1L, "q a"), (2L, "q a"), (3L, "q b"), (4L, "a b"), (5L, "c d")
    ).toDF("doc_id", "text")
    val out = graft.api.Web.pmiTerms(docs, "q", minCooc = 1L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toList
    // N=5, c(q)=3; a: c=3, cooc=2 -> ln(10/9)=0.1054; b: c=2, cooc=1 -> ln(5/6)=-0.1823
    assert(out === List(("a", 0.1054, 2L), ("b", -0.1823, 1L)))
  }

  test("llm_phrase_search plan prunes to term buckets and never reads the corpus") {
    val q = SparkEntry.queries("llm_phrase_search")(spark, d)
    assert(q.collect().nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"), "phrase search must not scan the corpus")
    assert(plan.contains("PartitionFilters: [tb"), "bucket literals must prune partitions")
  }

  test("perNodeTriangles: planted K4 gives every node 3 triangles, path graph gives none") {
    val k4 = Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"))
      .toDF("a", "b")
    val out = graft.ops.GraphOps.perNodeTriangles(k4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    val path = Seq(("a","b"),("b","c"),("c","d")).toDF("a", "b")
    assert(graft.ops.GraphOps.perNodeTriangles(path).count() === 0)
  }

  test("personalizedPageRank: analytic 2-node chain values; corpus rank mass bounded by 1") {
    // symmetric chain a—b seeded at a: r1 = (0.15, 0.85),
    // r2 = (0.8725, 0.1275), r3 = (0.258375, 0.741625) by hand
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val out = graft.api.Graph.personalizedPageRank(edges, "a", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 0.258375) < 1e-12)
    assert(math.abs(out("b") - 0.741625) < 1e-12)
    // corpus key: probability-scale — mass conserves at 1 over the reached
    // set (every node has out-degree ≥ 1, so nothing leaks; tolerance =
    // the 6-dp per-node output rounding summed)
    val corpus = SparkEntry.queries("graph_ppr")(spark, d).collect()
    assert(corpus.nonEmpty)
    val mass = corpus.map(_.getAs[Double]("rank")).sum
    assert(math.abs(mass - 1.0) < 1e-3)
    assert(corpus.forall(_.getAs[Double]("rank") > 0.0), "only reached nodes appear")
  }

  test("graph_components_incremental is bit-for-bit the full rebuild; planted merge case") {
    val inc = SparkEntry.queries("graph_components_incremental")(spark, d).collect().toSeq
    val full = SparkEntry.queries("graph_components")(spark, d).collect().toSeq
    assert(inc === full && inc.nonEmpty)
    // planted: two day-1 components {a,b} and {c,d} merged by one day-2
    // edge b—c; the label forest alone must carry day-1 connectivity
    val day1 = Seq(("a", "b"), ("c", "d")).toDF("doc_a", "doc_b")
    val forest = graft.api.Graph.components(day1, srcCol = "doc_a", dstCol = "doc_b")
      .select(col("node").as("doc_a"), col("component").as("doc_b"))
    val day2 = Seq(("b", "c")).toDF("doc_a", "doc_b")
    val merged = graft.api.Graph.components(
        day2.unionByName(forest), srcCol = "doc_a", dstCol = "doc_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("graph_triangles total is divisible by 3 and nodes are suppliers") {
    val rows = SparkEntry.queries("graph_triangles")(spark, d).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("triangles")).sum % 3 === 0)
    assert(rows.forall(_.getAs[String]("node").startsWith("s")))
  }

  test("snapshotDiff: planted add/delete/change/unchanged classify exactly; null payloads compare") {
    val base = Seq((1L, Some("a"), 10), (2L, Some("b"), 20),
                   (3L, Option.empty[String], 30), (4L, Some("d"), 40))
      .toDF("k", "s", "v")
    val next = Seq((2L, Some("b"), 99),                    // changed value
                   (3L, Option.empty[String], 30),        // unchanged (null payload)
                   (4L, Some("d"), 40),                   // unchanged
                   (5L, Some("e"), 50))                   // added
      .toDF("k", "s", "v")
    val out = graft.api.Ingest.snapshotDiff(base, next, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "deleted", 2L -> "changed", 5L -> "added"))
    // a null payload turning non-null MUST classify as changed (the
    // to_json fingerprint distinguishes absent from present fields)
    val next2 = Seq((3L, Some("x"), 30)).toDF("k", "s", "v")
    val out2 = graft.api.Ingest.snapshotDiff(base.filter($"k" === 3), next2, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 === Map(3L -> "changed"))
    // NULL keys join null-safely: an unchanged null-keyed row emits
    // nothing (a plain equi-join would misreport it as deleted+added)
    val nb = Seq((Option.empty[Long], "a", 1), (Some(7L), "b", 2)).toDF("k", "s", "v")
    val nn = Seq((Option.empty[Long], "a", 1), (Some(7L), "b", 9)).toDF("k", "s", "v")
    val out3 = graft.api.Ingest.snapshotDiff(nb, nn, Seq("k")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(out3 === Map(7L -> "changed"))
  }

  test("personalizedPageRank rejects a seed with no out-edges") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      graft.api.Graph.personalizedPageRank(edges, "b").collect()
    }
    assert(e.getMessage.contains("no out-edges"))
  }

  test("join_asof_nearest: always the closer of the two directional candidates, ties backward") {
    val e = Tables.events(spark, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val sg = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts").as("sts"))
    def side(fwd: Boolean) = graft.api.Graft
      .asofJoin(p, sg, Seq("user_id"), Seq("su"), "ts", "sts",
                outer = true, forward = fwd)
      .select(col("event_id").as("eid"), col("sts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val back = side(fwd = false); val fwd = side(fwd = true)
    val near = SparkEntry.queries("join_asof_nearest")(spark, d).collect()
    assert(near.nonEmpty)
    near.foreach { r =>
      val (eid, ts, n) = (r.getLong(0), r.getTimestamp(2), Option(r.getTimestamp(3)))
      val (b, f) = (back(eid), fwd(eid))
      def dist(o: Option[java.sql.Timestamp]) =
        o.map(x => math.abs(x.getTime - ts.getTime)).getOrElse(Long.MaxValue)
      val expect =
        if (b.isEmpty && f.isEmpty) None
        else if (dist(b) <= dist(f)) b else f
      assert(n === expect, s"event $eid: nearest $n, backward $b, forward $f")
    }
  }

  test("sql_q18_large_orders: every returned order's quantity exceeds the threshold") {
    val rows = SparkEntry.queries("sql_q18_large_orders")(spark, d).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
  }
}
