package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.checkpoint.{CheckpointStore, StepMetrics}

/** Shared fixpoint superstep driver for the iterative graph algorithms
  * (PageRank / connected components / label propagation / BFS — SURVEY.md
  * §2.8, §4.2). Catalyst has no recursion; a naive DataFrame loop grows
  * lineage unboundedly and replans an ever-deeper tree each iteration. This
  * driver pins the execution shape:
  *
  *  - state is ALWAYS hash-partitioned on the vertex-id column with a fixed
  *    partition count, so the per-superstep join against the (cached,
  *    identically partitioned) edge table never re-shuffles the edges;
  *  - each superstep materializes via `localCheckpoint(eager)` — truncates
  *    lineage AND preserves the physical output partitioning (Spark keeps
  *    `outputPartitioning` on the LogicalRDD);
  *  - AQE partition coalescing is disabled for the loop's duration (and
  *    restored after): a runtime re-plan that changes the partition count
  *    mid-convergence would force a re-shuffle every subsequent superstep;
  *  - exactly one scalar convergence measure crosses to the driver per
  *    superstep — no other collects inside the loop (BASELINE.md protocol:
  *    keep supersteps shuffle-dominated so N→4N efficiency survives);
  *  - optional CheckpointStore commit every `checkpointEvery` steps with
  *    per-partition row counts → resumable mid-convergence.
  */
object Superstep {

  final case class Config(
      numPartitions: Int,
      maxIter: Int,
      tol: Double,
      checkpointEvery: Int = 0, // 0 = no durable checkpoints
      store: Option[CheckpointStore] = None,
      verbose: Boolean = false,
      /** Run exactly maxIter steps and skip the per-step convergence
        * measure — one Spark job per superstep instead of two. For
        * fixed-iteration oracles and throughput benchmarks; convergence-
        * driven runs (even with tol=0, e.g. "no label changed") must keep
        * this false. */
      fixedStep: Boolean = false,
      /** Commit checkpoint snapshots OFF the superstep critical path: the
        * store write runs on a background thread against the already-
        * materialized (localCheckpoint'd) state while the loop keeps
        * iterating — at corpus scale a snapshot write costs many compute
        * steps (sf10 soak: ~77 s write vs 5-20 s steps). Durability
        * semantics are unchanged except in timing: commits land in step
        * order (single writer thread), each is atomic, and a crash before
        * a pending commit lands resumes from the previous committed
        * snapshot. Costs one extra pinned state copy while a write is in
        * flight (released by a per-step poll as soon as the write lands).
        * A failed background commit surfaces loudly at the next superstep,
        * checkpoint, or loop end — whichever comes first. */
      asyncCheckpoint: Boolean = false
  )

  final case class Result(state: DataFrame, steps: Int, metrics: Seq[StepMetrics])

  // The AQE-coalesce toggle is session-global; concurrent runs on one
  // session must not restore it while a sibling loop is mid-convergence.
  // Reference-counted PER SESSION (keyed by the session's RuntimeConfig
  // identity — a process-global counter would let a second concurrent
  // SparkSession enter with count>0, never get its flag disabled, and have
  // the last exit write the FIRST session's saved value into the LAST
  // session's conf): the first run in on a session saves + disables, the
  // last run out on that session restores.
  private val lock = new Object
  private val active = scala.collection.mutable.Map[
    org.apache.spark.sql.RuntimeConfig, (Int, Option[String])]()

  private def enterLoop(conf: org.apache.spark.sql.RuntimeConfig,
                        key: String): Unit = lock.synchronized {
    active.get(conf) match {
      case None =>
        val saved = conf.getOption(key)
        conf.set(key, "false")
        active(conf) = (1, saved)
      case Some((n, saved)) => active(conf) = (n + 1, saved)
    }
  }

  private def exitLoop(conf: org.apache.spark.sql.RuntimeConfig,
                       key: String): Unit = lock.synchronized {
    active.get(conf) match {
      case Some((1, saved)) =>
        active.remove(conf)
        saved match {
          case Some(v) => conf.set(key, v)
          case None    => conf.unset(key)
        }
      case Some((n, saved)) => active(conf) = (n - 1, saved)
      case None             => () // unbalanced exit — ignore
    }
  }

  /** Run `next` until `measure(state) <= cfg.tol` or maxIter.
    *
    * @param init    initial state (caller repartitions by the key column)
    * @param next    lazy next-state plan; must keep key-hash partitioning
    * @param measure scalar convergence measure over the MATERIALIZED state
    *                (reads cached partitions — cheap). Carried "delta"/
    *                "changed" columns in the state are the usual vehicle.
    */
  def run(spark: SparkSession, init: DataFrame, cfg: Config)(
      next: (DataFrame, Int) => DataFrame)(
      measure: DataFrame => Double): Result = {

    val conf = spark.conf
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    enterLoop(conf, coalesceKey)
    // async-checkpoint machinery: ONE background writer thread (commits
    // land in step order), at most one commit in flight; the pending
    // snapshot's blocks stay pinned until its write lands (a
    // localCheckpoint'd RDD cannot recompute a dropped block).
    var ckptPool: java.util.concurrent.ExecutorService = null
    var pending: Option[(java.util.concurrent.Future[_], DataFrame)] = None
    // Complete a finished/awaited commit; a failed background write
    // surfaces here (unwrapped), never silently.
    def finishPending(f: java.util.concurrent.Future[_], df: DataFrame,
                      current: DataFrame): Unit = {
      pending = None // cleared on ALL paths; a failed commit must not
      try f.get()    // leave the snapshot's blocks pinned for the session
      catch {
        case e: java.util.concurrent.ExecutionException =>
          if (df ne current) graft.core.Checkpoints.release(df)
          throw e.getCause
        case e: Throwable => // interrupt/cancellation: pending is already
          // cleared, so the finally sweep can no longer see this snapshot
          // — release it here or its blocks pin for the session
          if (df ne current) graft.core.Checkpoints.release(df)
          throw e
      }
      if (df ne current) graft.core.Checkpoints.release(df)
    }
    // BLOCK on the in-flight commit (checkpoint boundaries / loop end).
    def awaitPending(current: DataFrame): Unit =
      pending.foreach { case (f, df) => finishPending(f, df, current) }
    // Non-blocking per-step poll: release the pending snapshot's blocks as
    // soon as its write actually lands (not checkpointEvery steps later —
    // the snapshot is a full extra state copy, GBs at corpus scale, and
    // pinning it across the whole checkpoint window shrinks execution
    // memory in exactly the regime async mode targets) and surface a
    // failed commit within one step instead of running up to
    // checkpointEvery further supersteps after durability was lost.
    def pollPending(current: DataFrame): Unit =
      pending.foreach { case (f, df) =>
        if (f.isDone) finishPending(f, df, current) }
    // loop-carried checkpoints, visible to the abort-path finally: on an
    // exception nothing downstream can read them again, so they must be
    // released (Dataset.unpersist would silently no-op — Checkpoints doc)
    var state: DataFrame = null
    var prevState: DataFrame = null
    var completed = false
    try {
      val metrics = scala.collection.mutable.ArrayBuffer[StepMetrics]()
      // resume from the newest committed superstep if a store has one
      var (startStep, state0) = cfg.store.flatMap(_.latest(spark)) match {
        case Some((k, df, _)) =>
          if (cfg.verbose) println(s"[superstep] resuming at step $k")
          (k, df.repartition(cfg.numPartitions,
            org.apache.spark.sql.functions.col(df.columns.head)))
        case None => (0, init)
      }
      state = state0.localCheckpoint(true)
      var step = startStep
      var m = Double.MaxValue
      while (step < cfg.maxIter && m > cfg.tol) {
        pollPending(state) // free a landed snapshot / surface its failure
        val t0 = System.nanoTime()
        val prev = state
        prevState = prev
        state = next(prev, step).localCheckpoint(true) // job 1: materialize
        m = if (cfg.fixedStep) Double.MaxValue
            else measure(state)                        // job 2: cached scan
        step += 1
        val secs = (System.nanoTime() - t0) / 1e9
        if (cfg.verbose) println(f"[superstep] step=$step measure=$m%.3e ${secs}%.2fs")
        val doCkpt = cfg.store.nonEmpty && cfg.checkpointEvery > 0 &&
          (step % cfg.checkpointEvery == 0 || m <= cfg.tol)
        val sm = if (doCkpt) {
          // rows/partition-rows are cached scans (cheap); only the store
          // WRITE leaves the critical path in async mode
          val rows = state.count()
          val pr = CheckpointStore.partitionRows(state)
          val met = StepMetrics(step, m, rows, secs, pr)
          if (cfg.asyncCheckpoint) {
            awaitPending(state) // ≤1 in flight; ordered commits
            if (ckptPool == null)
              ckptPool = java.util.concurrent.Executors.newSingleThreadExecutor(
                r => { val t = new Thread(r, "superstep-ckpt"); t.setDaemon(true); t })
            val (snap, stepNow) = (state, step)
            val fut = ckptPool.submit(new Runnable {
              override def run(): Unit = cfg.store.get.commit(stepNow, snap, met)
            })
            pending = Some((fut, snap))
          } else cfg.store.get.commit(step, state, met)
          met
        } else StepMetrics(step, m, -1L, secs, Seq.empty)
        metrics += sm
        // the pending snapshot's blocks must outlive its background write
        if (!pending.exists(_._2 eq prev)) graft.core.Checkpoints.release(prev)
        prevState = null
      }
      awaitPending(state) // final commit durable before Result returns
      completed = true
      Result(state, step, metrics.toSeq)
    } finally {
      exitLoop(conf, coalesceKey)
      // abort path (exception in next()/measure()/a failed commit): wait
      // any in-flight write out, then release every pinned checkpoint the
      // caller can no longer reach — the pending snapshot, the in-flight
      // prev, and the current state. The primary exception wins; a commit
      // failure here is not rethrown.
      pending.foreach { case (f, df) =>
        try f.get() catch { case _: Throwable => () }
        if ((df ne state) && (df ne prevState)) graft.core.Checkpoints.release(df)
        pending = None
      }
      if (!completed) {
        if (prevState != null && (prevState ne state))
          graft.core.Checkpoints.release(prevState)
        if (state != null) graft.core.Checkpoints.release(state)
      }
      if (ckptPool != null) ckptPool.shutdown() // daemon thread; in-flight
      // work only matters on the success path, which awaited it above
    }
  }
}
