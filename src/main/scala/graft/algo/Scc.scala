package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a digraph — the directed counterpart of
  * [[ConnectedComponents]] for the link-graph tier (a web graph's bow-tie
  * structure — one giant SCC plus IN/OUT tendrils — is THE canonical SCC
  * workload; the reference's per-visit graphs are analyzed undirected, so
  * this extends the north-rule algorithm family rather than mirroring a
  * reference op).
  *
  * Algorithm: forward/backward min-label refinement (the label-pair variant
  * of FW-BW / Orzan coloring used by distributed SCC systems — Slota,
  * Rajamanickam & Madduri, IPDPS'14 describe the family):
  *
  *  - each ROUND restricts edges to endpoints in the same refinement class
  *    (cross-class edges can never participate in an SCC-internal path again
  *    and are discarded permanently — any path between two vertices of one
  *    SCC stays inside that SCC, so class-restricted reachability preserves
  *    SCC-internal reachability exactly);
  *  - two pointer-jumped min-label fixpoints per round:
  *    f(v) = min id that reaches v within the class,
  *    b(v) = min id v reaches within the class (f on reversed edges);
  *  - f(v) == b(v) == m finalizes v into SCC m (m reaches v and v reaches m,
  *    both within the class ⇒ mutual): every class emits the SCC of its
  *    minimum id each round, so the remaining classes — re-keyed by the
  *    exact (f, b) pair, never a lossy hash — shrink strictly.
  *
  * Scale shape: inner fixpoints converge in O(log diameter) supersteps via
  * the same hook+shortcut as [[ConnectedComponents]] (f(v) ← f(f(v)) is
  * sound: f(v)=u means u reaches v in-class, f(u)=w means w reaches u
  * in-class, so w reaches v in-class); round count is the length of the
  * longest chain of SCCs whose minimum is blocked by a smaller-id
  * same-class vertex — 2-4 rounds on web-shaped graphs with random ids
  * (the (f,b) re-key splits pure DAG chains in ONE round, where classic
  * peel-one-root coloring needs O(n)). `maxRounds` fails loudly rather
  * than spinning.
  */
object Scc {

  /** @param edges DataFrame(src: long, dst: long); self-loops ignored.
    * @return DataFrame(id: long, scc: long) — scc = min vertex id of the
    *         strongly connected component (canonical, deterministic). */
  def run(edges: DataFrame, numPartitions: Int = 32, maxRounds: Int = 64,
          maxIter: Int = 256): DataFrame = {
    val spark = edges.sparkSession
    val P = numPartitions

    var e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .localCheckpoint(true)

    // active vertices carry their refinement-class key; round 0 is one class
    var verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .repartition(P, col("id"))
      .select(col("id"), lit(0L).as("cf"), lit(0L).as("cb"))
      .localCheckpoint(true)

    var done = verts.select(col("id"), col("id").as("scc")).limit(0)
      .localCheckpoint(true)
    var remaining = verts.count()
    var round = 0
    var completed = false
    try {
      while (remaining > 0) {
        require(round < maxRounds,
          s"Scc: $remaining vertices unresolved after $maxRounds refinement " +
            "rounds — raise maxRounds (adversarial id/SCC chain) or check the input")
        round += 1

        // edges whose endpoints share a class THIS round (classes are fixed
        // for the round, so the inner fixpoints need no per-step class check)
        val vs = verts.select(col("id").as("sid"),
          col("cf").as("scf"), col("cb").as("scb"))
        val vd = verts.select(col("id").as("did"),
          col("cf").as("dcf"), col("cb").as("dcb"))
        val eCls = e.join(vs, e("src") === col("sid"))
          .join(vd, e("dst") === col("did"))
          .where(col("scf") === col("dcf") && col("scb") === col("dcb"))
          .select(col("src"), col("dst"))
          .repartition(P, col("src"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(e)
        e = eCls

        val ids = verts.select(col("id"))
        val f = minLabel(ids, e, P, maxIter)
          .select(col("id"), col("lab").as("f"))
        val b = minLabel(ids,
          e.select(col("dst").as("src"), col("src").as("dst")), P, maxIter)
          .select(col("id").as("bid"), col("lab").as("b"))
        val fb = f.join(b, col("id") === col("bid"))
          .select(col("id"), col("f"), col("b"))
          .repartition(P, col("id"))
          .localCheckpoint(true)
        // the per-phase Superstep final states are consumed by fb — release
        // their checkpoint leaves now (leaking them pins 2 state copies per
        // round until the scratch sweeps)
        graft.core.Checkpoints.releaseLeaves(f)
        graft.core.Checkpoints.releaseLeaves(b)

        val grown = done.union(
          fb.where(col("f") === col("b"))
            .select(col("id"), col("f").as("scc")))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(done)
        done = grown

        val nextVerts = fb.where(col("f") =!= col("b"))
          .select(col("id"), col("f").as("cf"), col("b").as("cb"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(fb)
        graft.core.Checkpoints.release(verts)
        verts = nextVerts
        remaining = verts.count()

        if (remaining > 0) {
          // drop edges touching finalized vertices (their SCCs are whole,
          // so no surviving SCC-internal path ever crossed them)
          val keep = verts.select(col("id"))
          val eNext = e.join(keep, e("src") === keep("id"), "left_semi")
            .join(keep, e("dst") === keep("id"), "left_semi")
            .repartition(P, col("src"))
            .localCheckpoint(true)
          graft.core.Checkpoints.release(e)
          e = eNext
        }
      }
      completed = true
      done
    } finally {
      graft.core.Checkpoints.release(e)
      graft.core.Checkpoints.release(verts)
      // on success `done` is the result — its blocks stay pinned for the
      // caller (released by the registry/bench scratch sweeps, like
      // Reachability); an abort drops it NOW
      if (!completed) graft.core.Checkpoints.release(done)
    }
  }

  /** Pointer-jumped min-label fixpoint over DIRECTED in-edges:
    * lab(v) = min({v} ∪ {lab(u) : (u,v) ∈ edges}) to convergence — i.e. the
    * minimum vertex id that reaches v. Same hook+shortcut shape as
    * [[ConnectedComponents.run]] without the symmetrization. */
  private def minLabel(verts: DataFrame, edges: DataFrame, P: Int,
                       maxIter: Int): DataFrame = {
    val spark = verts.sparkSession
    val init = verts
      .repartition(P, col("id"))
      .select(col("id"), col("id").as("lab"), lit(1L).as("changed"))
    val cfg = Superstep.Config(P, maxIter, tol = 0.0)
    val res = Superstep.run(spark, init, cfg) { (state, _) =>
      val nbrMin = edges
        .join(state.select(col("id"), col("lab").as("nlab")),
          edges("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("nlab")).as("nmin"))
      val hooked = state.select(col("id"), col("lab"))
        .join(nbrMin, col("id") === nbrMin("dst"), "left")
        .select(col("id"), col("lab").as("old"),
          least(col("lab"), coalesce(col("nmin"), col("lab"))).as("m"))
      val labels = state.select(col("id").as("lid"), col("lab").as("llab"))
      hooked
        .join(labels, hooked("m") === col("lid"), "left")
        .select(col("id"),
          least(col("m"), coalesce(col("llab"), col("m"))).as("lab"),
          col("old"))
        .withColumn("changed", when(col("lab") =!= col("old"), 1L).otherwise(0L))
        .drop("old")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0)
        .getLong(0).toDouble
    }
    res.state.select("id", "lab")
  }
}
