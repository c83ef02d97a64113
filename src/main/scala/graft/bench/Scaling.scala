package graft.bench

import org.apache.spark.sql.SparkSession

import graft.algo.PageRank

/** Two-parallelism-level scaling evidence (BASELINE.md protocol): the
  * north rule's N→4N-executor efficiency criterion, evidenced in-sandbox by
  * the same PageRank job at `local[N]` and `local[4N]` on the same on-disk
  * edge table.
  *
  *  - The edge table is synthesized ONCE (deterministic, power-law-ish hub
  *    structure from the pages generator shape) and written to parquet, so
  *    both runs read identical bytes.
  *  - Fixed superstep count (tol=0, maxIter=K) so both runs do identical
  *    work — convergence is benchmarked in graft.Bench; here we isolate
  *    throughput.
  *  - `spark.sql.shuffle.partitions` = cores in each run; a JIT-warmup run
  *    precedes both measurements; each config runs `reps` times, best taken
  *    (cold-cache noise suppression on a shared box).
  *
  * Prints one JSON line:
  *   {"edges":…,"steps":…,"n_cores":…,"sec_n":…,"tput_n":…,
  *    "n4_cores":…,"sec_4n":…,"tput_4n":…,"efficiency":…,
  *    "protocol":…,"deviations":[…],"heap_gib":…}
  *
  * The PROTOCOL CONFIG (the one BASELINE.md's acceptance rows use) is
  * pinned here as the defaults: 6M pages (→ ~24M edges), 8 steps, N=2
  * (so both sides sit below the single-JVM memory-bus ceiling — see
  * BASELINE.md's N-pair analysis), 3 reps, heap ≤ 16 GiB. A run that
  * deviates still executes (exploration is legitimate) but the artifact
  * line carries `"protocol":false` plus the deviation list, so a
  * nonstandard measurement can never be mistaken for an acceptance run
  * (the negative-control class: half-size graph + 48 GiB heap scored
  * 0.317 of garbage).
  */
object Scaling {

  /** Protocol constants — change BASELINE.md if you change these. */
  final val ProtocolPages = 6000000L
  final val ProtocolSteps = 8
  final val ProtocolN = 2
  final val ProtocolReps = 3
  final val ProtocolMaxHeapGiB = 16.0

  /** Every way `(pages, steps, n, reps, heap)` deviates from the pinned
    * acceptance protocol; empty = this run's efficiency number is
    * comparable to BASELINE.md's acceptance rows. */
  def protocolDeviations(nPages: Long, steps: Int, nCores: Int, reps: Int,
                         heapGiB: Double): Seq[String] = Seq(
    (nPages != ProtocolPages) -> s"pages=$nPages (protocol $ProtocolPages)",
    (steps != ProtocolSteps) -> s"steps=$steps (protocol $ProtocolSteps)",
    (nCores != ProtocolN) -> s"n=$nCores (protocol $ProtocolN)",
    (reps < ProtocolReps) -> s"reps=$reps (protocol >= $ProtocolReps)",
    (heapGiB > ProtocolMaxHeapGiB) ->
      f"heap=$heapGiB%.1f GiB (protocol <= $ProtocolMaxHeapGiB%.0f)"
  ).collect { case (true, why) => why }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
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
      .config("spark.sql.requireAllClusterKeysForCoPartition", sys.env.getOrElse("SPARK_GRAFT_SUBSET_COPART", "false"))
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Deterministic synthetic edge table with hub skew: ring + hash cross
    * links + a global hub every page links to (the PagesGen link shape,
    * without paying HTML assembly at 10⁷ rows). */
  private def genEdges(spark: SparkSession, nPages: Long, out: String): Unit = {
    import spark.implicits._
    import graft.core.Hashing.{bounded, h}
    spark.range(0, nPages, 1, 256).flatMap { i =>
      val ring = (i, (i + 1) % nPages)
      val jump = (i, h(42L, i, 1) match { case x => math.floorMod(x, nPages) })
      val hub = (i, math.floorMod(h(42L, i, 2), 1000L)) // 1000 hub targets
      val cross = (i, math.floorMod(h(42L, i, 3), nPages))
      Seq(ring, jump, hub, cross).filter(e => e._1 != e._2)
    }.toDF("src", "dst")
      .write.mode("overwrite").parquet(out)
  }

  def main(args: Array[String]): Unit = {
    // machine-read JSON below is built with the f-interpolator, which
    // formats via the JVM default locale (comma decimals under de_DE etc.)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nPages = sys.env.get("SPARK_GRAFT_SCALE_PAGES")
      .map(_.toLong).getOrElse(ProtocolPages)
    val steps = sys.env.get("SPARK_GRAFT_SCALE_STEPS")
      .map(_.toInt).getOrElse(ProtocolSteps)
    val nCores = sys.env.get("SPARK_GRAFT_SCALE_N")
      .map(_.toInt).getOrElse(ProtocolN)
    val reps = sys.env.get("SPARK_GRAFT_SCALE_REPS")
      .map(_.toInt).getOrElse(ProtocolReps)
    val path = "/tmp/graft_scaling_edges"

    val heapGiB = Runtime.getRuntime.maxMemory / 1024.0 / 1024.0 / 1024.0
    val deviations = protocolDeviations(nPages, steps, nCores, reps, heapGiB)
    if (deviations.nonEmpty)
      System.err.println(
        "Scaling: NONSTANDARD config, not an acceptance run: " +
          deviations.mkString("; "))

    // generation + warmup (JIT, classloading) in a throwaway session
    val gen = session(16)
    genEdges(gen, nPages, path)
    val nEdges = gen.read.parquet(path).count()
    PageRank.run(gen.read.parquet(path).limit(200000),
      PageRank.Params(tol = 0.0, maxIter = 3, numPartitions = 16))
    gen.stop()

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean

    // per-rep walls + ambient load + process cpu per config: a contended
    // box (the BENCH_r02 artifact class) is visible in the artifact itself
    // as load ≫ the job's own cores or wall ≫ cpu/cores
    def measure(cores: Int): (Seq[Double], Seq[Double], Seq[Double]) = {
      val s = session(cores)
      val edges = s.read.parquet(path)
      val cpuBean = java.lang.management.ManagementFactory.getThreadMXBean
      val walls = Seq.newBuilder[Double]
      val loads = Seq.newBuilder[Double]
      val cpus = Seq.newBuilder[Double]
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val c0 = processCpuNanos
        PageRank.run(edges, PageRank.Params(tol = 0.0, maxIter = steps,
            numPartitions = cores),
          Some(graft.algo.Superstep.Config(cores, steps, tol = 0.0,
            fixedStep = true)))
        walls += (System.nanoTime() - t0) / 1e9
        cpus += (processCpuNanos - c0) / 1e9
        loads += osBean.getSystemLoadAverage
      }
      s.stop()
      (walls.result(), loads.result(), cpus.result())
    }

    def processCpuNanos: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => 0L
    }

    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")

    val (wallsN, loadsN, cpusN) = measure(nCores)
    val (walls4N, loads4N, cpus4N) = measure(4 * nCores)
    val secN = wallsN.min
    val sec4N = walls4N.min
    val tputN = nEdges.toDouble * steps / secN
    val tput4N = nEdges.toDouble * steps / sec4N
    val eff = tput4N / (4.0 * tputN)
    println(f"""{"edges":$nEdges,"steps":$steps,""" +
      f""""n_cores":$nCores,"sec_n":$secN%.2f,"tput_n":$tputN%.0f,""" +
      f""""n4_cores":${4 * nCores},"sec_4n":$sec4N%.2f,"tput_4n":$tput4N%.0f,""" +
      f""""efficiency":$eff%.3f,""" +
      s""""protocol":${deviations.isEmpty},""" +
      deviations.map(graft.core.Json.str)
        .mkString(""""deviations":[""", ",", "],") +
      f""""heap_gib":$heapGiB%.1f,""" +
      s""""reps_n":${fmt(wallsN)},"reps_4n":${fmt(walls4N)},""" +
      s""""cpu_n":${fmt(cpusN)},"cpu_4n":${fmt(cpus4N)},""" +
      s""""load_n":${fmt(loadsN)},"load_4n":${fmt(loads4N)}}""")
  }
}
