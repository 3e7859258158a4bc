package graft
/** Test-tree helper: dumps the live contract keys for doc-sync checks. */
object KeyDump extends App {
  SparkEntry.queries.keys.toSeq.sorted.foreach(println)
  System.err.println("TOTAL=" + SparkEntry.queries.size +
    " ORACLE=" + SparkEntry.oracleSql.size)
}
