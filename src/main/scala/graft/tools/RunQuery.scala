package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: run one registry query by name `reps` times
  * against an sf dir and print per-rep wall/process-CPU seconds. Pairs with
  * an external profiler (e.g. `-XX:StartFlightRecording` on this forked
  * JVM) to attribute the CPU the full-registry Bench can only total.
  *
  * Usage: RunQuery <sfDir> <queryName> [reps=3] [cores=32]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("wg7_unified_nodes")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
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
    spark.sparkContext.setLogLevel("ERROR")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (1 to reps).foreach { i =>
      val (c0, t0) = (os.getProcessCpuTime, System.nanoTime())
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (os.getProcessCpuTime - c0) / 1e9
      graft.QueryUtil.releaseScratch(spark)
      println(f"[runquery] $name rep=$i rows=$n wall=$wall%.2f cpu=$cpu%.2f")
    }
    spark.stop()
  }
}
