package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the exactness
  * baseline) and a random-hyperplane-LSH bucketed variant (the scale path).
  *
  * Vectors are `array<float>` columns; all math runs in double — the
  * per-pair dot product is the native codegen'd `vec_dot` expression
  * (graft.ext.VecExpressions), per-vector prep (normalize, signatures)
  * stays on Spark higher-order functions (once per vector, not per pair).
  * Scale shape: brute force is probes × corpus (only sane when one side is
  * tiny and broadcast); the LSH path buckets the corpus once (narrow map +
  * one shuffle on the signature) and joins probes to their own bucket, so
  * cost is |bucket| · k, not |corpus| · |probes|.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double (sequential fold — deterministic). Plans the native
    * codegen'd `vec_dot` (graft.ext.VecExpressions): the HOF formulation
    * (`aggregate(zip_with(…))`) materializes the zipped array per PAIR and
    * evaluates interpreted — the wrong constant factor for pairs × dims
    * work. Registers GraftExtensions on the ACTIVE session (idempotent, a
    * map insert) so the helper stays self-contained on plain sessions —
    * call_function resolves at analysis, which needs the function present
    * on whatever session analyzes the enclosing DataFrame. */
  def dot(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.ext.GraftExtensions.register)
    call_function("vec_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalized copy of a vector (double elements). Pre-normalizing
    * each side ONCE turns the per-pair cosine (3 array aggregates) into a
    * single dot product — the only sane shape for pairs × dims work. */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** All pairs with cosine ≥ minCos — brute force over the (small) corpus;
    * the embedding-near-dup oracle primitive. Output (a_id, b_id). */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  minCos: Double): DataFrame = {
    graft.ext.GraftExtensions.register(vecs.sparkSession)
    val nv = vecs.select(col(idCol).as("a_id"), normalized(col(vecCol)).as("va"))
    val a = nv
    val b = nv.select(col("a_id").as("b_id"), col("va").as("vb"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .where(dot(col("va"), col("vb")) >= minCos)
      .select("a_id", "b_id")
  }

  /** Exact top-k cosine neighbors for each probe (probe side broadcast).
    * Deterministic tie-break: (sim desc, neighbor id asc).
    * Output (query_id, rank, neighbor_id). */
  def bruteForceKnn(corpus: DataFrame, probes: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.ext.GraftExtensions.register(corpus.sparkSession)
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      normalized(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      normalized(col(vecCol)).as("cv"))
    val scored = c.crossJoin(p)
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Empty (query_id, rank, neighbor_id) frame with the SAME column types
    * the non-empty path produces — query_id from the probes' id, neighbor_id
    * from the corpus' id. A hardcoded long-typed empty frame forks the
    * schema between the two return branches and breaks any caller that
    * unions results across shards/batches on the empty-input path. */
  private def emptyResult(spark: org.apache.spark.sql.SparkSession,
                          probes: DataFrame, corpus: DataFrame,
                          idCol: String): DataFrame =
    spark.range(0).select(
      col("id").cast(probes.schema(idCol).dataType).as("query_id"),
      lit(0).as("rank"),
      col("id").cast(corpus.schema(idCol).dataType).as("neighbor_id"))

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * xxhash64 mapped to [-1, 1). Content-derived — identical across runs
    * and cluster sizes (SURVEY.md §2.7 F19 rule). */
  private def planeComponent(i: Int, j: Column): Column =
    (xxhash64(lit(i), j).cast("double") / lit(Long.MaxValue.toDouble))

  /** nBits-bit random-hyperplane signature of a vector: bit i = sign of
    * ⟨v, plane_i⟩. Computed via one aggregate over (dim, value) pairs per
    * plane — no stored plane matrix, the planes are pure hash functions. */
  def rhpSignature(vec: Column, nBits: Int): Column = {
    val withIdx = zip_with(vec, sequence(lit(0), size(vec) - 1),
      (v, j) => struct(v.cast("double").as("v"), j.as("j")))
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(withIdx, lit(0.0),
        (acc, e) => acc + e.getField("v") * planeComponent(i, e.getField("j")))
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Engine-portable quantized RHP signature — the ORACLE-TIER plane family
    * (the d4 SimHash move, taken one step further): the plane component for
    * (bit i, dim j) is a signed 24-bit integer from md5("i_j"), and vector
    * values quantize to round(v·2²⁰), so the projection is an EXACT BIGINT
    * sum — the sign decision is integer arithmetic and cannot differ between
    * engines under any summation order (no float-margin argument needed),
    * and any engine with md5 rebuilds the signature bit-for-bit. Bounds:
    * |pc| < 2²³ and |q| ≤ 2²³ (vectors with |v| ≤ 8) keep 64-dim sums
    * < 2⁵³ — no overflow. Any hash family is a valid RHP family, so this
    * changes only the bucketing randomness, never the operator semantics;
    * the production default stays [[rhpSignature]] (xxhash64 planes). */
  def rhpSignatureQuant(vec: Column, nBits: Int): Column = {
    val withIdx = zip_with(vec, sequence(lit(0), size(vec) - 1),
      (v, j) => struct(
        round(v.cast("double") * lit(1048576.0)).cast("long").as("q"),
        j.as("j")))
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(withIdx, lit(0L),
        (acc, e) => acc + e.getField("q") *
          (conv(substring(md5(concat_ws("_", lit(i), e.getField("j"))), 1, 6),
            16, 10).cast("long") - lit(8388608L)))
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: bucket corpus by rhp signature; probes search only
    * their own bucket plus `probeBits`-hamming-adjacent buckets (multi-probe
    * over single-bit flips). Recall/cost dial: nBits ↑ → smaller buckets,
    * probeBits ↑ → higher recall. `signature` picks the plane family:
    * production xxhash64 (default) or the engine-portable
    * [[rhpSignatureQuant]] oracle tier. Output (query_id, rank, neighbor_id). */
  def lshKnn(corpus: DataFrame, probes: DataFrame, idCol: String,
             vecCol: String, k: Int, nBits: Int = 12,
             probeBits: Int = 1,
             signature: (Column, Int) => Column = rhpSignature(_, _)): DataFrame = {
    graft.ext.GraftExtensions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signature(col(vecCol), nBits).as("sig"))
    // multi-probe: every XOR mask of hamming weight ≤ probeBits — true
    // probeBits-adjacent buckets (Σ C(nBits,i) masks), not just 1-bit flips.
    // The mask count is combinatorial in probeBits (C(32,8) ≈ 10.5M would
    // OOM the driver building the literal array and explode the probe side
    // 10M× per probe) — cap it so a mis-dialed call fails loudly instead
    val masks: Seq[Long] = 0L +: (1 to probeBits).flatMap(w =>
      (0 until nBits).combinations(w).map(_.map(1L << _).reduce(_ | _)).toSeq)
    require(masks.size <= 4096,
      s"lshKnn multi-probe would search ${masks.size} buckets per probe " +
        s"(nBits=$nBits, probeBits=$probeBits); cap is 4096 — lower " +
        "probeBits or nBits, or raise nProbe on the IVF path instead")
    val probeSigs = array(masks.map(lit): _*)
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signature(col(vecCol), nBits).as("psig"))
      .select(col("query_id"), col("qv"), col("psig"),
        explode(probeSigs).as("flip"))
      .select(col("query_id"), col("qv"),
        col("psig").bitwiseXOR(col("flip")).as("sig"))
    // no broadcast hint: a corpus-scale probe batch × masks would blow the
    // broadcast limit; AQE broadcasts small probe sets at runtime anyway
    val scored = c.join(p, Seq("sig"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Integer-lattice IVF — the ENGINE-PORTABLE ORACLE TIER of the IVF
    * family (the d4/e2 move applied to the whole quantizer): plain-dot
    * k-means (the FAISS IVFFlat shape) over vectors quantized to
    * round(v·2²⁰), with md5-ordered seeding, exact BIGINT sums for every
    * Lloyd update, truncating integer division for the centroid means
    * (Java/DuckDB `//` agree bit-for-bit), and exact integer dot products
    * for every assignment and probe-cell choice — there is no float
    * anywhere until the final candidate re-score, so any engine with md5
    * reproduces the inverted file EXACTLY under any execution order. Only
    * the last top-k ordering rides the float cosine, which the e1 oracle's
    * verified sim-gap already covers. The production scale path stays
    * [[ivfKnn]] (spherical k-means on normalized float vectors, decimal
    * Lloyd means) with its AnnSpec recall/determinism pins.
    * Output (query_id, rank, neighbor_id), ties (sim desc, id asc). */
  def ivfKnnLattice(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, k: Int, nList: Int = 16, nProbe: Int = 4,
                    iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    graft.ext.GraftExtensions.register(spark)
    val quant = (c: Column) =>
      transform(c, v => round(v.cast("double") * lit(1048576.0)).cast("long"))
    val nc = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      quant(col(vecCol)).as("q")).persist()

    // deterministic PORTABLE seeds: md5-hex order of the id string (both
    // engines produce identical lowercase hex → identical order)
    var centroids: Array[Array[Long]] = nc
      .orderBy(md5(col("neighbor_id").cast("string")), col("neighbor_id"))
      .limit(nList)
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    if (centroids.isEmpty) {
      nc.unpersist(false)
      return emptyResult(spark, probes, corpus, idCol)
    }

    // exact integer argmax (strict >, ties → lowest cell): |q| ≤ 2²³,
    // |centroid| ≤ 2²³ ⇒ 64-dim dots < 2⁵³ — no overflow
    def assignUdf(cs: Array[Array[Long]]) = udf { (v: Seq[Long]) =>
      var best = 0; var bestDot = Long.MinValue; var c = 0
      while (c < cs.length) {
        val cent = cs(c); var d = 0L; var i = 0
        while (i < cent.length && i < v.length) { d += cent(i) * v(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }

    var it = 0
    while (it < iters) {
      val assigned = nc.withColumn("cell", assignUdf(centroids)(col("q")))
      // per-(cell, dim) BIGINT sum + count → nList bounded centroid rows at
      // the driver (the same bounded-pull class as the production path);
      // centroid mean = Java truncating long division, which DuckDB's `//`
      // reproduces exactly — empty cells keep their centroid
      val sums = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone)
      sums.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) =
          r.getAs[Long]("s") / r.getAs[Long]("n")
      }
      centroids = next
      it += 1
    }

    // the returned plan is fully LAZY and stateless (same contract as
    // ivfKnn): quantization + final cell assignment recompute from `corpus`
    // at action time — one extra corpus pass in exchange for zero retained
    // blocks after this call (registry hygiene). Callers reusing the
    // inverted file across query batches should persist `cells` themselves.
    val cells = nc.withColumn("cell", assignUdf(centroids)(col("q")))
    nc.unpersist(false)
    val probeCells = udf { (v: Seq[Long]) =>
      centroids.indices.map { c =>
        val cent = centroids(c); var d = 0L; var i = 0
        while (i < cent.length && i < v.length) { d += cent(i) * v(i); i += 1 }
        (d, c)
      }.sortBy { case (d, c) => (-d, c) }.take(nProbe).map(_._2)
    }
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        quant(col(vecCol)).as("pq"))
      .withColumn("cell", explode(probeCells(col("pq"))))
    val scored = cells.join(p, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cv")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path
    * (public design: Sivic & Zisserman's "Video Google" inverted index;
    * the FAISS IVF family): spherical-k-means Lloyd iterations build
    * `nList` centroids, the corpus partitions into cells with ONE shuffle,
    * and each query probes only its `nProbe` nearest cells — per-query
    * cost ≈ |corpus| · nProbe / nList instead of a full scan, and the
    * cell assignment is reusable across query batches.
    *
    * Determinism (F19 rule): initial centroids are the xxhash64-smallest
    * corpus vectors; every Lloyd step is a groupBy(cell, dim) mean whose
    * only driver-side data is the nList centroid vectors themselves
    * (bounded, same class as a convergence measure — never the corpus).
    * Output (query_id, rank, neighbor_id), ties (sim desc, id asc). */
  def ivfKnn(corpus: DataFrame, probes: DataFrame, idCol: String,
             vecCol: String, k: Int, nList: Int = 16, nProbe: Int = 4,
             iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    graft.ext.GraftExtensions.register(spark)
    val nc = corpus.select(col(idCol).as("neighbor_id"),
      normalized(col(vecCol)).as("cv")).persist()

    // deterministic seeds: hash-order sample of the corpus itself
    var centroids: Array[Array[Double]] = nc
      .orderBy(xxhash64(col("neighbor_id")), col("neighbor_id"))
      .limit(nList)
      .collect().map(_.getSeq[Double](1).toArray)
    if (centroids.isEmpty) { // empty corpus → empty result, not a crash
      nc.unpersist(false)
      return emptyResult(spark, probes, corpus, idCol)
    }

    def assignUdf(cs: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
      var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
      while (c < cs.length) {
        val cent = cs(c); var d = 0.0; var i = 0
        while (i < cent.length && i < v.length) { d += cent(i) * v(i); i += 1 }
        if (d > bestDot) { bestDot = d; best = c }
        c += 1
      }
      best
    }

    var it = 0
    while (it < iters) {
      val assigned = nc.withColumn("cell", assignUdf(centroids)(col("cv")))
      // per-(cell, dim) means → nList small centroid rows at the driver.
      // The mean rides DECIMAL (exact, order-independent) so centroids —
      // and therefore cell assignments — are identical under any
      // partition layout, not just under a fixed one (F19 rule; the
      // dsumSql discipline applied to the Lloyd step)
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x").cast("decimal(30,18)")).cast("double").as("m"))
        .collect()
      val next = Array.fill(nList)(
        new Array[Double](centroids.head.length))
      means.foreach(r => next(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) =
        r.getAs[Double]("m"))
      // spherical k-means: re-normalize; empty cells keep their centroid
      centroids = next.zip(centroids).map { case (m, old) =>
        val n = math.sqrt(m.map(x => x * x).sum)
        if (n > 0) m.map(_ / n) else old
      }
      it += 1
    }

    // the returned plan is fully LAZY and stateless: normalization + cell
    // assignment recompute from `corpus` at action time (one pass), so no
    // checkpoint/cache block outlives this call — a registry sweep retains
    // nothing. Callers reusing the inverted file across query batches
    // should persist `cells` themselves.
    val cells = nc.withColumn("cell", assignUdf(centroids)(col("cv")))
    nc.unpersist(false)
    val probeCells = udf { (v: Seq[Double]) =>
      centroids.indices.map { c =>
        val cent = centroids(c); var d = 0.0; var i = 0
        while (i < cent.length && i < v.length) { d += cent(i) * v(i); i += 1 }
        (d, c)
      }.sortBy { case (d, c) => (-d, c) }.take(nProbe).map(_._2)
    }
    val p = probes.select(col(idCol).as("query_id"),
        normalized(col(vecCol)).as("qv"))
      .withColumn("cell", explode(probeCells(col("qv"))))
    // shuffle hash join on `cell` stays correct at any probe cardinality;
    // AQE picks broadcast when the exploded probe side is actually small
    val scored = cells.join(p, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qv"), col("cv")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
