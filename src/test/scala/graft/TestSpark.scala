package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run in one JVM
  * under sbt; repeated session churn dominates test time otherwise). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      // exercise the production registration path (GraftExtensions) —
      // ExtensionsSpec asserts graft_cosine resolves without any
      // per-session register() call
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}
