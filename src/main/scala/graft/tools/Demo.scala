package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the flagship pipeline end-to-end through the public API —
  * the library's "does it actually run" surface. Prints the top-ranked
  * pages and the physical plan of the per-superstep join for inspection. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
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
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val top = graft.SparkEntry.entry(spark)
    top.show(20, truncate = false)
    println(f"entry() wall: ${(System.nanoTime() - t0) / 1e9}%.1fs")

    args.headOption match {
      case Some(dir) =>
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          val n = fn(spark, dir).count()
          // same sweep hygiene as Bench/Verify: the query is fully consumed,
          // so drop any algo-internal checkpoint blocks before the next one
          graft.QueryUtil.releaseScratch(spark)
          println(s"query $name -> $n rows")
        }
      case None =>
    }
    spark.stop()
  }
}
