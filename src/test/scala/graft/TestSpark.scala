package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (sbt forks one). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // subset co-partitioning: a child hash-partitioned on a SUBSET of
      // the join keys co-partitions the join (the wg4 redirect assembly
      // pre-partitions its four inputs on (visit_id, old_request_id) and
      // every URL-suffixed join + window reuses that one exchange —
      // PLANS.md wg4 row); engine repartitions are all deliberate
      // high-cardinality keys, so the skew guard the default protects
      // against does not apply
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
