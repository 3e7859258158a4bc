package graft

import graft.ops.{LlmOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The text-signature family's banding guarantees must be HASH-AGNOSTIC:
  * the SPARK_GRAFT_TEXT_HASH flag swaps the md5 oracle-parity hash for
  * production xxhash64, and these pins prove the swap changes cost, not
  * semantics, for both impls:
  *  - SimHash: 5 bands × 12 bits with Hamming ≤ 4 ⇒ pigeonhole recall 1.0,
  *    checked against a real all-pairs sweep of the corpus signatures;
  *  - winnowing: two docs sharing a long substring share fingerprints
  *    (the guarantee document-fingerprinting exists to provide). */
class TextHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  for (impl <- Seq("md5", "xxhash64")) {
    test(s"simhash banding finds EVERY Hamming<=4 pair under $impl") {
      val sigs = LlmOps.simhashSigs(spark, d, impl)
      val banded = LlmOps.simhashPairs(spark, d, impl)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val allPairs = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
              col("doc_a") < col("doc_b"))
        .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)"))
        .filter(col("hamming") <= 4)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
                             r.getAs[Long]("hamming"))).toSet
      assert(banded === allPairs,
        s"banding recall broke under $impl: banded=${banded.size} allpairs=${allPairs.size}")
    }

    test(s"winnowing: docs sharing a substring share fingerprints under $impl") {
      import spark.implicits._
      val core = "the quick brown fox jumps over the lazy dog while seventeen " +
        "zebras quietly graze beside a meandering river under amber skies"
      val docs = Seq(
        (1L, s"completely unrelated preamble text here $core"),
        (2L, s"$core and then an entirely different continuation follows"),
        (3L, "nothing in common with the others at all, not a single shared gram x")
      ).toDF("doc_id", "t")
      val fps = TextOps.fingerprintsOf(docs, impl)
        .select(col("doc_id"), col("fps")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      // structural bounds hold for every doc
      fps.values.foreach(s => assert(s.nonEmpty))
      val shared = fps(1L) intersect fps(2L)
      assert(shared.nonEmpty,
        s"docs sharing a ${core.length}-char substring share no fingerprints under $impl")
      // and the unrelated doc shares (essentially) nothing with either
      assert((fps(3L) intersect fps(1L)).isEmpty)
      assert((fps(3L) intersect fps(2L)).isEmpty)
    }
  }

  test("the flag defaults to md5 (oracle parity under the harness)") {
    assert(LlmOps.TextHash === sys.env.getOrElse("SPARK_GRAFT_TEXT_HASH", "md5"))
  }
}
