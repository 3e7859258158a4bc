package graft

// Scratch profiler for opt_cosine_rewrite (sbt Test/runMain graft.ProfileCosine).
// Not a Suite — `sbt test` ignores it.
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._
    graft.plans.GraftRules.install(spark)
    graft.functions.CosineSimilarity.register(spark)
    val e = Tables.embeddingsWide(spark, d).filter(col("vec_id") < 1000)
    time("scan+filter count")(e.count())
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    spark.conf.set(graft.plans.CosineBandedJoin.ConfKey, "true")
    // candidates only: same join but condition lacks the cosine confirm
    val cand = a.join(b, col("a_id") < col("b_id") &&
        call_function("graft_cosine", col("a_emb"), col("b_emb")) >= -2.0)
      .select("a_id", "b_id")
    (1 to 2).foreach(i => time(s"candidates-only count rep $i")(println(cand.count())))
    val j = a.join(b, col("a_id") < col("b_id") &&
        call_function("graft_cosine", col("a_emb"), col("b_emb")) >= 0.3)
      .select(col("a_id"), col("b_id"),
        round(call_function("graft_cosine", col("a_emb"), col("b_emb")), 4).as("cos"))
    (1 to 3).foreach(i => time(s"banded join count rep $i")(println(j.count())))
    (1 to 3).foreach { i =>
      time(s"full query rep $i") {
        graft.ops.OptOps.queries("opt_cosine_rewrite")(spark, d).count()
      }
      spark.catalog.clearCache()
    }
    println(j.queryExecution.executedPlan.toString.take(1500))
    spark.conf.unset(graft.plans.CosineBandedJoin.ConfKey)
    spark.stop()
  }
}
