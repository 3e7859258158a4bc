package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table access. Every query goes through here so scale-critical
  * reader concerns (schema pinning, the events ns-timestamp workaround,
  * partition sizing) live in exactly one place.
  *
  * Scale note (100 TB): these are plain parquet scans — Catalyst handles
  * column pruning + predicate pushdown as long as callers keep filters and
  * projections declarative. No collect(), no schema inference by sampling.
  */
object Tables {
  /** Plain parquet table (all star-schema tables + documents/embeddings). */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")

  /** File count of a table's parquet dir, cached per (sfDir, name) for the
    * JVM's lifetime. `df.inputFiles` resolves from the already-listed
    * FileIndex — no plan-to-RDD conversion (the previous
    * `df.rdd.getNumPartitions` materialized an RDD conversion per call and
    * made the widen decision depend on `defaultParallelism`-sized splits
    * rather than the data layout). Testdata is immutable (`/root/testdata`
    * is read-only), so the cache cannot go stale within a run. */
  private val fileCount = scala.collection.concurrent.TrieMap.empty[(String, String), Int]
  private def filesOf(df: DataFrame, d: String, name: String): Int =
    fileCount.getOrElseUpdate((d, name), df.inputFiles.length)

  /** Widen a table to the session's parallelism when its parquet layout
    * has fewer files than cores. The per-row-compute-heavy pipelines
    * (shingles, token hashes, winnowing k-grams, banded-join probes over
    * `embedding` vectors) otherwise serialize on a single task at test
    * scale — documents/embeddings are each ONE small file (measured: the
    * single-task shingle build was ~60% of every minhash-family query's
    * cost at sf0.1; the single-task banded-cosine probe was ~80% of
    * opt_cosine_rewrite's). The widen is a round-robin exchange bounded by
    * corpus bytes, and a no-op exactly when it should be: a many-file
    * 100 TB corpus already scans wider than this condition. */
  private def wide(s: SparkSession, d: String, name: String): DataFrame = {
    val df = t(s, d, name)
    val target = s.sparkContext.defaultParallelism
    if (filesOf(df, d, name) < target) df.repartition(target) else df
  }

  def documentsWide(s: SparkSession, d: String): DataFrame = wide(s, d, "documents")

  /** Vector-ingest contract (r19 fuzz sweep): a zero-LENGTH vector makes
    * every element_at/fold crash or produce dim-dependent garbage, and a
    * zero-NORM vector has no cosine direction (0/0) — both are
    * un-embeddable rows a production vector pipeline rejects at the
    * ingest edge, once, instead of guarding every consumer. This reader
    * IS that edge: it drops them (codegen'd size + short-circuit exists,
    * no shuffle). NULL vectors pass through — their handling is each
    * key's own r18-pinned null convention. Every embedding oracle
    * restates the same reject as a shadowing `embeddings AS (...)` CTE. */
  private def validVectors(df: DataFrame): DataFrame =
    df.filter(col("embedding").isNull ||
      (size(col("embedding")) > 0 &&
       exists(col("embedding"), x => x =!= 0.0f)))

  def embeddings(s: SparkSession, d: String): DataFrame =
    validVectors(t(s, d, "embeddings"))
  /** `embeddings` for join-probe-side consumers (see [[wide]]). Keep the
    * plain `embeddings` for broadcast/build/aggregate-only consumers — an
    * exchange ahead of a broadcast or a hash-agg buys nothing. */
  def embeddingsWide(s: SparkSession, d: String): DataFrame =
    validVectors(wide(s, d, "embeddings"))

  /** `events.parquet`'s `ts` physical type has varied across testdata
    * generations — INT64 TIMESTAMP(NANOS) originally, TIMESTAMP_NTZ(µs)
    * since the r9/r10 refresh — so this reader normalizes whatever it
    * finds to ONE canonical shape every downstream query (and the DuckDB
    * oracle, which reads the same file) agrees on: a session-TZ
    * TimestampType column at µs precision.
    *
    *  - INT64 nanos: Spark 4.x refuses the column by default
    *    (PARQUET_TYPE_ILLEGAL); `nanosAsLong` reads it as Long, then
    *    INTEGER floor-division rebuilds µs (a double division would lose
    *    precision above 2^53; `ts div 1000` alone truncates toward zero,
    *    which differs from floor for pre-epoch negative nanos —
    *    `(ts - pmod(ts,1000)) div 1000` is exact floor for any sign).
    *    DuckDB floors ns→µs the same way.
    *  - TIMESTAMP_NTZ (the current files): cast to TimestampType. The
    *    session TZ is pinned UTC by every entry point, so the cast is
    *    wall-clock-identity and matches DuckDB's naive TIMESTAMP read.
    *
    * Invariant: `nanosAsLong` is set SESSION-WIDE here and never unset.
    * That is safe in this codebase because no OTHER table carries an
    * INT64 TIMESTAMP(NANOS) column (SchemaPinSpec pins every other
    * table's schema, so a ns column sneaking into one of them fails the
    * suite rather than silently reading as Long). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already session-TZ µs
    }
  }
}
