package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r20) — delete before round end. */
object QuickCos {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.CosineSimilarity.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    val sigExpr = expr(
      """aggregate(sequence(0, 63), 0L,
           (acc, i) -> acc + IF(element_at(embedding, i + 1) > 0F, shiftleft(1L, i), 0L))""")
    val e = Tables.embeddingsWide(spark, sfDir).filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding"), sigExpr.as("sig"))
    def banded(side: String) = e.select(
        col("vec_id").as(s"${side}_id"), col("embedding").as(s"${side}_emb"),
        col("sig").as(s"${side}_sig"),
        explode(expr("transform(sequence(0, 15), j -> shiftleft(CAST(j AS BIGINT), 4) + (shiftrightunsigned(sig, j * 4) & 15))")).as(s"${side}_band"))
    val A = banded("a").cache(); val B = banded("b").cache()
    println("A rows=" + A.count() + " B rows=" + B.count())
    val bare = A.join(broadcast(B), col("a_band") === col("b_band"))
    // minimalBand twin: keep only the first matching band (j = a_band >> 4)
    def bandEq(j: Int) =
      (shiftrightunsigned(col("a_sig"), j * 4).bitwiseAND(15)) ===
      (shiftrightunsigned(col("b_sig"), j * 4).bitwiseAND(15))
    val minimal = (0 until 16).foldRight(lit(false)) { (j, els) =>
      val noEarlier: org.apache.spark.sql.Column =
        if (j == 0) lit(true) else !(0 until j).map(bandEq).reduce(_ || _)
      when(shiftrightunsigned(col("a_band"), 4) === j, noEarlier).otherwise(els)
    }
    // linear-code-size twin: first zero nibble of sig xor == current band
    val minimal2 = shiftrightunsigned(col("a_band"), 4) === least(
      (0 until 16).map { j =>
        when((shiftrightunsigned(col("a_sig").bitwiseXOR(col("b_sig")), j * 4)
          .bitwiseAND(15)) === 0, lit(j)).otherwise(lit(16))
      }: _*)
    for (i <- 1 to 2) {
      time(s"bare equi $i")(println("  n=" + bare.count()))
      time(s"+minimal $i")(println("  n=" + bare.filter(minimal).count()))
      time(s"+minimal+cos $i")(println("  n=" + bare.filter(minimal &&
        col("a_id") < col("b_id") &&
        call_function("graft_cosine", col("a_emb"), col("b_emb")) >= 0.3).count()))
      time(s"+minimal2 $i")(println("  n=" + bare.filter(minimal2).count()))
      time(s"+minimal2+cos $i")(println("  n=" + bare.filter(minimal2 &&
        col("a_id") < col("b_id") &&
        call_function("graft_cosine", col("a_emb"), col("b_emb")) >= 0.3).count()))
    }
    spark.stop()
  }
}
