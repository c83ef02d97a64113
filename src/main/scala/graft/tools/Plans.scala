package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection harness: prints `explain("formatted")` for the
  * plan-shape-critical queries so scan pushdown (PushedFilters/ReadSchema),
  * join strategies (broadcast vs SMJ), and exchange counts are reviewable —
  * findings and invariants live in PLANS.md. */
object Plans {
  def main(args: Array[String]): Unit = {
    // --no-broadcast: preview the CORPUS-SCALE plan shape — force every
    // join to its shuffle strategy (autoBroadcastJoinThreshold=-1), the
    // regime where small-SF broadcasts hide exchange-reuse differences
    val noBcast = args.contains("--no-broadcast")
    val rest = args.filterNot(_ == "--no-broadcast")
    val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else Seq("a1_agg_lineitem", "p1_project_flags", "j1_join_chain",
        "w1_latest_per_user", "d2_jaccard_pairs", "e1_knn_bruteforce",
        "t2_quality", "g20_clustering", "g22_assortativity",
        "g24_hostgraph", "g26_crawldiff", "g27_hostdiff")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        if (noBcast) "-1" else "10485760")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
