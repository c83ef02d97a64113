package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.algo.{Bfs, ConnectedComponents, GraphStats, LabelPropagation,
  PageRank, Reachability, Superstep, TriangleCount}
import graft.graphbuild.HostGraph

/** Graph-operator oracles (SURVEY.md §2.8 + the north-rule algorithms).
  *
  * The pages-table link graph can't be seen by DuckDB, so these run the SAME
  * engine operators over deterministic digraphs derived from `lineitem` in
  * pure SQL — DuckDB rebuilds the identical graph and checks per-vertex
  * outputs exactly. Iterative algorithms get *generated* fixed-iteration SQL
  * (chained CTEs) or recursive CTEs; convergence-based runs are covered by
  * ScalaTest golden tests instead (convergence isn't SQL-expressible).
  *
  * Three graph shapes:
  *  - `relEdges`  (dense, ≤500 vertices)  — degrees, hubs;
  *  - `bedges`    (9 disjoint blocks of ≤100 vertices, sparse) — CC / BFS /
  *                reachability / PageRank / label propagation (block
  *                structure keeps SQL closures small and components plural);
  *  - `tedges`    (sparse, ≤700 vertices) — triangle counts.
  */
object QueriesGraph {

  // ---- dense graph (degree/hub oracles) ---------------------------------
  private def relEdges(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem")
      .select((col("l_orderkey") % 500).as("src"), (col("l_partkey") % 500).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  private val relEdgesSql =
    """edges AS (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      |  FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500)""".stripMargin

  // ---- blocked sparse graph (iterative-algorithm oracles) ---------------
  private def bedges(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem")
      .select((col("l_orderkey") % 900).as("src"), (col("l_partkey") % 900).as("dst"))
      .where(col("src") =!= col("dst") && col("src") % 9 === col("dst") % 9)
      .distinct()

  private val bedgesSql =
    """bedges AS (SELECT DISTINCT l_orderkey % 900 AS src, l_partkey % 900 AS dst
      |  FROM lineitem
      |  WHERE l_orderkey % 900 <> l_partkey % 900
      |    AND (l_orderkey % 900) % 9 = (l_partkey % 900) % 9)""".stripMargin

  // NOTE: inside DuckDB's WITH RECURSIVE, UNION in a non-recursive CTE
  // behaves as UNION ALL — dedup must be an explicit DISTINCT.
  private val bvertsSql =
    """bverts AS (SELECT DISTINCT id FROM
      |  (SELECT src AS id FROM bedges UNION ALL SELECT dst FROM bedges))""".stripMargin

  // ---- sparse triangle graph -------------------------------------------
  /** Converged 10-round LP communities over bedges — the community table
    * g21 (modularity) AND g23 (conductance) decompose. Shared through a
    * session-scoped parquet memo so the sweep runs the 10-superstep loop
    * ONCE (VERDICT r4 next-steps #4: ~18 s of redundant loop at sf0.1);
    * both oracles still re-derive l10 independently via lpSqlBody. */
  private def lpLabels10(dir: String)(implicit s: SparkSession): DataFrame =
    sharedTable(s"lp10_${dirTag(dir)}") {
      LabelPropagation.run(bedges(dir), numPartitions = P, maxIter = 10,
        cfg0 = Some(Superstep.Config(P, 10, tol = 0.0, fixedStep = true))).state
    }

  private def tedges(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem")
      .where((col("l_orderkey") + col("l_partkey")) % 11 === 0)
      .select((col("l_orderkey") % 700).as("src"), (col("l_partkey") % 700).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  private val tedgesSql =
    """tedges AS (SELECT DISTINCT l_orderkey % 700 AS src, l_partkey % 700 AS dst
      |  FROM lineitem
      |  WHERE (l_orderkey + l_partkey) % 11 = 0
      |    AND l_orderkey % 700 <> l_partkey % 700)""".stripMargin

  private val P = 8 // fixed partitioning for oracle runs (verify is local[4])

  /** Url-level link edges synthesized from events (same derivation law on
    * both engines, the wg-family recipe): hosts are 2-3-label names in
    * unknown-TLD space (`w3.h17.example`), where the PSL fallback rule
    * makes etld1 ≡ last-two-labels — which IS SQL-expressible, so the
    * DuckDB mirror can replay the host contraction exactly while the
    * Spark side runs the real native `etld1`. */
  /** Carries the (k, c) slice keys alongside (src, dst) so g26's snapshot
    * slices reuse the SAME derivation (one recipe, both engines). */
  private def uedges(dir: String)(implicit s: SparkSession): DataFrame = {
    val k = jsonGet(col("props"), "k").cast("long")
    t(dir, "events").select(col("event_id").as("c"), k.as("k"))
      .select(
        concat(lit("http://w"), col("k") % 7, lit(".h"), col("k") % 40,
          lit(".example/p"), col("c") % 13).as("src"),
        concat(lit("http://h"), (col("k") * 3 + col("c")) % 40,
          lit(".example/q"), col("c") % 11).as("dst"),
        col("k"), col("c"))
  }

  private val uedgesSql =
    """uedges AS (SELECT
      |    'http://w' || (k%7) || '.h' || (k%40) || '.example/p' || (c%13) AS src,
      |    'http://h' || ((k*3+c)%40) || '.example/q' || (c%11) AS dst, k, c
      |  FROM (SELECT event_id AS c,
      |        CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events))""".stripMargin

  /** Host contraction mirror: DISTINCT url pairs → last-two-label hosts →
    * drop null/intra-host → count (HostGraph.contract's exact dataflow).
    * Parameterized on the source CTE so snapshot slices (g27) reuse the
    * ONE derivation instead of re-inlining it. */
  private def hostContractSql(from: String, name: String): String =
    s"""$name AS (SELECT sh AS src_host, dh AS dst_host,
       |    CAST(COUNT(*) AS BIGINT) AS weight FROM (
       |  SELECT regexp_extract(regexp_extract(src,'^http://([^/]+)',1),'([^.]+\\.[^.]+)$$',1) AS sh,
       |         regexp_extract(regexp_extract(dst,'^http://([^/]+)',1),'([^.]+\\.[^.]+)$$',1) AS dh
       |  FROM (SELECT DISTINCT src, dst FROM $from))
       |  WHERE sh IS NOT NULL AND dh IS NOT NULL AND sh <> dh
       |  GROUP BY sh, dh)""".stripMargin

  private val hedgesSql = hostContractSql("uedges", "hedges")

  /** Weighted fixed-iteration PageRank over the contracted host graph,
    * keyed on host STRINGS (ids are internal to the Spark side — the
    * comparison is on (host, pr), so the mirror never needs to replay the
    * xxhash64 vertex ids). Same loop law as [[wpagerankSql]]. */
  private def hostPrSql(iters: Int, d: Double): String = {
    val sb = new StringBuilder
    sb ++= s"WITH ${uedgesSql.replaceFirst("AS", "AS MATERIALIZED")},\n"
    sb ++= s"${hedgesSql.replaceFirst("AS", "AS MATERIALIZED")},\n"
    sb ++= "hw AS MATERIALIZED (SELECT src_host AS src, dst_host AS dst, CAST(weight AS DOUBLE) AS w FROM hedges),\n"
    sb ++= "hverts AS MATERIALIZED (SELECT DISTINCT h AS id FROM (SELECT src_host AS h FROM hedges UNION ALL SELECT dst_host FROM hedges)),\n"
    prLoopSql(sb, "hw", "hverts", iters, d,
      s"SELECT id AS host, ROUND(pr, 8) AS pr FROM r$iters")
  }

  /** Fixed-iteration PageRank as chained CTEs — the exact dataflow of
    * [[PageRank.run]] (dangling-mass redistribution included), unrolled. */
  private def pagerankSql(iters: Int, d: Double): String = {
    // every CTE MATERIALIZED: each r_k is referenced 3× — default inlining
    // would blow up 3^k and re-open the parquet per reference.
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    val matV = bvertsSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n$matV,\n"
    sb ++= "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bverts),\n"
    sb ++= "outdeg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM bedges GROUP BY src),\n"
    sb ++= "r0 AS MATERIALIZED (SELECT v.id, 1.0/nn.n AS pr FROM bverts v CROSS JOIN nn)"
    for (k <- 1 to iters) {
      sb ++= s""",
dm$k AS MATERIALIZED (SELECT COALESCE(SUM(r.pr), 0.0) AS m FROM r${k - 1} r LEFT JOIN outdeg o ON r.id = o.id WHERE o.id IS NULL),
c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.pr / o.deg) AS s FROM bedges e JOIN r${k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.id GROUP BY e.dst),
r$k AS MATERIALIZED (SELECT v.id, (1.0 - $d)/nn.n + $d * (COALESCE(c.s, 0.0) + dm$k.m/nn.n) AS pr FROM bverts v CROSS JOIN nn CROSS JOIN dm$k LEFT JOIN c$k c ON v.id = c.id)"""
    }
    sb ++= s"\nSELECT id, ROUND(pr, 8) AS pr FROM r$iters"
    sb.toString
  }

  /** Fixed-iteration PERSONALIZED PageRank (networkx semantics: teleport
    * AND dangling mass land on the seed distribution) — mirrors
    * [[PageRank.run]] with `reset`; seeds are `id % 37 = 0`. */
  private def pprSql(iters: Int, d: Double): String = {
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    val matV = bvertsSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n$matV,\n"
    sb ++= "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bverts),\n"
    sb ++= "outdeg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS deg FROM bedges GROUP BY src),\n"
    sb ++= "pw AS MATERIALIZED (SELECT id, CASE WHEN id % 37 = 0 THEN 1.0 ELSE 0.0 END AS w FROM bverts),\n"
    sb ++= "pt AS MATERIALIZED (SELECT SUM(w) AS t FROM pw),\n"
    sb ++= "pvec AS MATERIALIZED (SELECT pw.id, pw.w / pt.t AS p FROM pw CROSS JOIN pt),\n"
    sb ++= "r0 AS MATERIALIZED (SELECT v.id, 1.0/nn.n AS pr FROM bverts v CROSS JOIN nn)"
    for (k <- 1 to iters) {
      sb ++= s""",
dm$k AS MATERIALIZED (SELECT COALESCE(SUM(r.pr), 0.0) AS m FROM r${k - 1} r LEFT JOIN outdeg o ON r.id = o.id WHERE o.id IS NULL),
c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.pr / o.deg) AS s FROM bedges e JOIN r${k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.id GROUP BY e.dst),
r$k AS MATERIALIZED (SELECT v.id, (1.0 - $d) * pv.p + $d * (COALESCE(c.s, 0.0) + dm$k.m * pv.p) AS pr FROM bverts v JOIN pvec pv ON v.id = pv.id CROSS JOIN dm$k LEFT JOIN c$k c ON v.id = c.id)"""
    }
    sb ++= s"\nSELECT id, ROUND(pr, 8) AS pr FROM r$iters"
    sb.toString
  }

  /** Fixed-iteration WEIGHTED PageRank (networkx `pagerank(weight=…)`:
    * rank propagates proportionally to w/Σw) — mirrors [[PageRank.run]]
    * with `weightCol`; weights are the deterministic (src+dst)%7+1. */
  /** Shared unrolled weighted-PR loop law over weighted edges `ew`
    * (src, dst, w) and vertices `vv` (id) — appended to a caller-built
    * CTE prefix; the ONE place the dangling/damping expressions live
    * (g19's bedges mirror and g25's host mirror both instantiate it). */
  private def prLoopSql(sb: StringBuilder, ew: String, vv: String,
                        iters: Int, d: Double, finalSelect: String): String = {
    sb ++= s"nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM $vv),\n"
    sb ++= s"outdeg AS MATERIALIZED (SELECT src AS id, SUM(w) AS deg FROM $ew GROUP BY src),\n"
    sb ++= s"r0 AS MATERIALIZED (SELECT v.id, 1.0/nn.n AS pr FROM $vv v CROSS JOIN nn)"
    for (k <- 1 to iters) {
      sb ++= s""",
dm$k AS MATERIALIZED (SELECT COALESCE(SUM(r.pr), 0.0) AS m FROM r${k - 1} r LEFT JOIN outdeg o ON r.id = o.id WHERE o.id IS NULL),
c$k AS MATERIALIZED (SELECT e.dst AS id, SUM(r.pr * e.w / o.deg) AS s FROM $ew e JOIN r${k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.id GROUP BY e.dst),
r$k AS MATERIALIZED (SELECT v.id, (1.0 - $d)/nn.n + $d * (COALESCE(c.s, 0.0) + dm$k.m/nn.n) AS pr FROM $vv v CROSS JOIN nn CROSS JOIN dm$k LEFT JOIN c$k c ON v.id = c.id)"""
    }
    sb ++= s"\n$finalSelect"
    sb.toString
  }

  private def wpagerankSql(iters: Int, d: Double): String = {
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    val matV = bvertsSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n$matV,\n"
    sb ++= "bw AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS w FROM bedges),\n"
    prLoopSql(sb, "bw", "bverts", iters, d,
      s"SELECT id, ROUND(pr, 8) AS pr FROM r$iters")
  }

  /** Fixed-iteration synchronous label propagation, mirroring
    * [[LabelPropagation.run]] exactly: votes from symmetrized neighbors,
    * argmax by (count desc, label asc), isolated vertices keep their label.
    * `lpSqlBody` emits only the CTE chain so composed mirrors (g21
    * modularity) can build on the converged l<iters> table. */
  private def lpSqlBody(iters: Int): String = {
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"$mat,\n"
    sb ++= "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM bedges UNION ALL SELECT dst AS src, src AS dst FROM bedges)),\n"
    sb ++= "l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM sym)"
    for (k <- 1 to iters) {
      sb ++= s""",
v$k AS MATERIALIZED (SELECT s.dst AS id, l.label, COUNT(*) AS cnt FROM sym s JOIN l${k - 1} l ON s.src = l.id GROUP BY s.dst, l.label),
w$k AS MATERIALIZED (SELECT id, label FROM (SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn FROM v$k) WHERE rn = 1),
l$k AS MATERIALIZED (SELECT l.id, COALESCE(w.label, l.label) AS label FROM l${k - 1} l LEFT JOIN w$k w ON l.id = w.id)"""
    }
    sb.toString
  }

  private def lpSql(iters: Int): String =
    s"WITH ${lpSqlBody(iters)}\nSELECT id, label FROM l$iters"

  /** Fixed-iteration h-index coreness (the exact dataflow of
    * [[graft.algo.Coreness.run]]) unrolled. The update is INTEGER and
    * reaches its fixpoint well inside `iters`, so the engine's
    * converge-early loop and this exactly-`iters`-rounds mirror agree
    * bit-for-bit (extra rounds past the fixpoint are identities). */
  private def kcoreSql(iters: Int): String = {
    val sb = new StringBuilder
    val mat = relEdgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n"
    sb ++= "sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges)),\n"
    sb ++= "c0 AS MATERIALIZED (SELECT src AS id, COUNT(*) AS core FROM sym GROUP BY src)"
    for (k <- 1 to iters) {
      sb ++= s""",
nb$k AS (SELECT s.dst AS id, c.core AS cv FROM sym s JOIN c${k - 1} c ON s.src = c.id),
c$k AS MATERIALIZED (SELECT id, MAX(LEAST(rn, cv)) AS core FROM (SELECT id, cv, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cv DESC) AS rn FROM nb$k) GROUP BY id)"""
    }
    sb ++= s"\nSELECT id, CAST(core AS BIGINT) AS core FROM c$iters"
    sb.toString
  }

  /** Fixed-iteration HITS (the exact dataflow of [[graft.algo.Hits.run]]:
    * authorities from hubs, L1-normalize, hubs from authorities,
    * L1-normalize) unrolled; 8dp rounding absorbs double reduce-order
    * noise, same policy as the PageRank mirrors. */
  private def hitsSql(iters: Int): String = {
    val sb = new StringBuilder
    val mat = relEdgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n"
    sb ++= "verts AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),\n"
    sb ++= "h0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM verts)"
    for (k <- 1 to iters) {
      sb ++= s""",
ar$k AS MATERIALIZED (SELECT e.dst AS id, SUM(h.h) AS s FROM edges e JOIN h${k - 1} h ON e.src = h.id GROUP BY e.dst),
at$k AS MATERIALIZED (SELECT SUM(s) AS t FROM ar$k),
a$k AS MATERIALIZED (SELECT v.id, COALESCE(r.s, 0.0) / (CASE WHEN t.t > 0 THEN t.t ELSE 1.0 END) AS a FROM verts v LEFT JOIN ar$k r ON v.id = r.id CROSS JOIN at$k t),
hr$k AS MATERIALIZED (SELECT e.src AS id, SUM(a.a) AS s FROM edges e JOIN a$k a ON e.dst = a.id GROUP BY e.src),
ht$k AS MATERIALIZED (SELECT SUM(s) AS t FROM hr$k),
h$k AS MATERIALIZED (SELECT v.id, COALESCE(r.s, 0.0) / (CASE WHEN t.t > 0 THEN t.t ELSE 1.0 END) AS h FROM verts v LEFT JOIN hr$k r ON v.id = r.id CROSS JOIN ht$k t)"""
    }
    sb ++= s"\nSELECT v.id, ROUND(h.h, 8) AS hub, ROUND(a.a, 8) AS auth\nFROM verts v JOIN h$iters h ON v.id = h.id JOIN a$iters a ON v.id = a.id"
    sb.toString
  }

  /** Fixed-round synchronous k-truss peel (the exact dataflow of
    * [[graft.algo.KTruss.run]]) unrolled: each round recounts per-edge
    * support over the surviving set via the oriented wedge join and drops
    * every edge below k-2. Integer support + shrink-only edge set ⇒ rounds
    * past the fixpoint are identities, so the engine's converge-early loop
    * and this exactly-`rounds` mirror agree bit-for-bit (the g13 argument). */
  private def ktrussSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    val mat = tedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n"
    sb ++= "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM tedges),\n"
    sb ++= "s0 AS MATERIALIZED (SELECT a, b, CAST(0 AS BIGINT) AS sup FROM und)"
    for (r <- 1 to rounds) {
      sb ++= s""",
tr$r AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM s${r - 1} e1 JOIN s${r - 1} e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN s${r - 1} e3 ON e3.a = e1.b AND e3.b = e2.b),
sp$r AS MATERIALIZED (SELECT a, b, COUNT(*) AS sup FROM (
  SELECT u AS a, v AS b FROM tr$r UNION ALL SELECT u AS a, w AS b FROM tr$r
  UNION ALL SELECT v AS a, w AS b FROM tr$r) GROUP BY a, b),
s$r AS MATERIALIZED (SELECT s.a, s.b, COALESCE(p.sup, 0) AS sup
  FROM s${r - 1} s LEFT JOIN sp$r p ON p.a = s.a AND p.b = s.b
  WHERE COALESCE(p.sup, 0) >= ${k - 2})"""
    }
    sb ++= s"\nSELECT a, b, CAST(sup AS BIGINT) AS support FROM s$rounds"
    sb.toString
  }

  /** Fixed-length deterministic hash-draw walks (the exact dataflow of
    * [[graft.algo.RandomWalks.run]]) unrolled: step k's frontier joins the
    * edge table and every walker takes the (h, dst)-lexicographic minimum,
    * h being the shared md5-derived 32-bit draw key (conv/'0x' parity —
    * the d4/e2/e3 integer recipe, so both engines replay identical walks). */
  private def walksSql(length: Int): String = {
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH $mat,\n$bvertsSql,\n"
    sb ++= "p0 AS MATERIALIZED (SELECT id AS walker, 0 AS step, id AS node FROM bverts WHERE id % 5 = 0)"
    for (k <- 1 to length) {
      sb ++= s""",
c$k AS (SELECT p.walker, e.dst,
  CAST(('0x' || substring(md5(CAST(p.walker AS VARCHAR) || '_' || CAST($k AS VARCHAR) || '_' || CAST(e.dst AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM p${k - 1} p JOIN bedges e ON e.src = p.node WHERE p.step = ${k - 1}),
p$k AS MATERIALIZED (
  SELECT * FROM p${k - 1}
  UNION ALL
  SELECT walker, $k AS step, dst AS node FROM (
    SELECT walker, dst, ROW_NUMBER() OVER (PARTITION BY walker ORDER BY h, dst) AS rn
    FROM c$k) WHERE rn = 1)"""
    }
    sb ++= s"\nSELECT walker, step, node FROM p$length"
    sb.toString
  }

  /** Betweenness mirror: dmin via recursive CTE (the g9 walk), σ (shortest-
    * path counts, BIGINT) via `levels` unrolled per-level joins against
    * dmin, then the DIRECT pair formula bc(v) = Σ_{s,t} σ(s,v)·σ(v,t)/σ(s,t)
    * over shortest decompositions (sv.d + vt.d = st.d) — algebraically what
    * Brandes' recursion accumulates. σ must exist from ALL vertices (middle
    * segments start anywhere); only the SOURCE side is restricted to the
    * id%3 pivot set, mirroring [[graft.algo.Betweenness.run]]'s `sources`.
    * 6dp rounding: Brandes associates the float ops differently from the
    * direct formula — bc magnitudes ~10⁴ with ~1e-10 association noise make
    * 8dp rounding-edge flips likely (~10⁻¹) and 6dp safe (~10⁻³). */
  private def betweennessSql(levels: Int): String = {
    val sb = new StringBuilder
    val mat = bedgesSql.replaceFirst("AS", "AS MATERIALIZED")
    sb ++= s"WITH RECURSIVE $mat,\n$bvertsSql,\n"
    sb ++= """walk(s, v, d) AS (
  SELECT id, id, 0 FROM bverts
  UNION
  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN bedges e ON e.src = w.v WHERE w.d < """
    sb ++= s"$levels),\n"
    sb ++= "dmin AS MATERIALIZED (SELECT s, v, MIN(d) AS dist FROM walk GROUP BY s, v),\n"
    sb ++= "sg0 AS MATERIALIZED (SELECT id AS s, id AS v, 0 AS d, CAST(1 AS BIGINT) AS sigma FROM bverts)"
    for (k <- 1 to levels) {
      sb ++= s""",
sg$k AS MATERIALIZED (SELECT p.s, e.dst AS v, $k AS d, CAST(SUM(p.sigma) AS BIGINT) AS sigma
  FROM sg${k - 1} p JOIN bedges e ON e.src = p.v
  JOIN dmin m ON m.s = p.s AND m.v = e.dst AND m.dist = $k
  GROUP BY p.s, e.dst)"""
    }
    sb ++= ",\nsig AS MATERIALIZED ("
    sb ++= (0 to levels).map(k => s"SELECT * FROM sg$k").mkString("\n  UNION ALL ")
    sb ++= """),
bcp AS (SELECT sv.v AS id, SUM(CAST(sv.sigma AS DOUBLE) * vt.sigma / st.sigma) AS bc
  FROM sig sv
  JOIN sig vt ON vt.s = sv.v AND vt.d > 0
  JOIN sig st ON st.s = sv.s AND st.v = vt.v AND st.d = sv.d + vt.d
  WHERE sv.d > 0 AND sv.s % 3 = 0
  GROUP BY sv.v)
SELECT b.id, ROUND(COALESCE(bcp.bc, 0.0), 6) AS bc
FROM bverts b LEFT JOIN bcp ON bcp.id = b.id"""
    sb.toString
  }

  val reg: Seq[Entry] = Seq(

    // G1 (SURVEY §2.8): in/out degree on the dense edge table.
    ("g1_degree", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = relEdges(dir)
      val outd = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_degree"))
      val ind = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))
      outd.join(ind, Seq("id"), "full_outer")
        .na.fill(0L, Seq("out_degree", "in_degree"))
    }, Some(
      s"""WITH $relEdgesSql,
         |o AS (SELECT src AS id, COUNT(*) AS out_degree FROM edges GROUP BY src),
         |i AS (SELECT dst AS id, COUNT(*) AS in_degree FROM edges GROUP BY dst)
         |SELECT COALESCE(o.id, i.id) AS id,
         |  COALESCE(out_degree, 0) AS out_degree,
         |  COALESCE(in_degree, 0) AS in_degree
         |FROM o FULL OUTER JOIN i ON o.id = i.id""".stripMargin)),

    // Hub detection: global top-20 by in-degree, deterministic tie-break.
    // (Scale path is orderBy().limit() = distributed TakeOrdered; the
    // row_number window here is the small-side formulation the oracle needs.)
    ("g8_hubs_topk", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val ind = relEdges(dir).groupBy(col("dst").as("id"))
        .agg(count(lit(1)).as("in_degree"))
      ind.withColumn("rnk",
        row_number().over(Window.orderBy(col("in_degree").desc, col("id").asc)))
        .where(col("rnk") <= 20)
    }, Some(
      s"""WITH $relEdgesSql,
         |i AS (SELECT dst AS id, COUNT(*) AS in_degree FROM edges GROUP BY dst)
         |SELECT id, in_degree, rnk FROM (
         |  SELECT id, in_degree,
         |    ROW_NUMBER() OVER (ORDER BY in_degree DESC, id ASC) AS rnk FROM i)
         |WHERE rnk <= 20""".stripMargin)),

    // North-rule CC: min-label + pointer jumping vs a recursive-CTE
    // transitive closure (undirected), exact component ids.
    ("g2_connected_components", (s: SparkSession, dir: String) => {
      implicit val sp = s
      ConnectedComponents.run(bedges(dir), numPartitions = P).state
    }, Some(
      s"""WITH RECURSIVE $bedgesSql,
         |sym AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM bedges UNION ALL SELECT dst AS src, src AS dst FROM bedges)),
         |reach(s, v) AS (
         |  SELECT DISTINCT src, src FROM sym
         |  UNION
         |  SELECT r.s, e.dst FROM reach r JOIN sym e ON e.src = r.v)
         |SELECT s AS id, MIN(v) AS comp FROM reach GROUP BY s""".stripMargin)),

    // North-rule triangle counting: degree-oriented wedge join vs a plain
    // SQL 3-way join on the sparse graph; exact per-vertex counts.
    ("g3_triangles", (s: SparkSession, dir: String) => {
      implicit val sp = s
      TriangleCount.perVertexAndTotal(tedges(dir), numPartitions = P)._1
    }, Some(
      s"""WITH $tedgesSql,
         |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM tedges),
         |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
         |        FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
         |pv AS (SELECT id, COUNT(*) AS triangles FROM (
         |        SELECT u AS id FROM tri UNION ALL SELECT v FROM tri
         |        UNION ALL SELECT w FROM tri) GROUP BY id),
         |uverts AS (SELECT a AS id FROM und UNION SELECT b FROM und)
         |SELECT uv.id, COALESCE(pv.triangles, 0) AS triangles
         |FROM uverts uv LEFT JOIN pv ON uv.id = pv.id""".stripMargin)),

    // BFS / multi-source shortest distances (G3/G5 primitive), directed,
    // -1 sentinel for unreachable (SURVEY §2.11.7).
    ("g4_bfs_distances", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir)
      val verts = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val seeds = verts.where(col("id") % 97 === 0)
      Bfs.run(e, seeds, undirected = false, numPartitions = P, maxIter = 256).state
    }, Some(
      s"""WITH RECURSIVE $bedgesSql,
         |$bvertsSql,
         |seeds AS (SELECT id FROM bverts WHERE id % 97 = 0),
         |walk(v, d) AS (
         |  SELECT id, 0 FROM seeds
         |  UNION
         |  SELECT e.dst, w.d + 1 FROM walk w JOIN bedges e ON e.src = w.v WHERE w.d < 200),
         |md AS (SELECT v, MIN(d) AS dist FROM walk GROUP BY v)
         |SELECT b.id, COALESCE(md.dist, -1) AS dist
         |FROM bverts b LEFT JOIN md ON b.id = md.v""".stripMargin)),

    // G2 (ancestors/descendants): semi-naïve transitive closure vs
    // recursive CTE; exact per-vertex descendant counts.
    ("g5_descendants", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Reachability.descendantCounts(bedges(dir), numPartitions = P)
    }, Some(
      s"""WITH RECURSIVE $bedgesSql,
         |$bvertsSql,
         |reach(s, v) AS (
         |  SELECT id, id FROM bverts
         |  UNION
         |  SELECT r.s, e.dst FROM reach r JOIN bedges e ON e.src = r.v)
         |SELECT s AS id, COUNT(*) - 1 AS descendants FROM reach GROUP BY s""".stripMargin)),

    // North-rule PageRank: 20 supersteps, dangling redistribution, ranks
    // rounded to 8dp (double reduce-order noise is ~1e-15; SURVEY §7.4.1).
    ("g6_pagerank20", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val res = PageRank.run(bedges(dir),
        PageRank.Params(tol = 0.0, maxIter = 20, numPartitions = P),
        Some(Superstep.Config(P, 20, tol = 0.0, fixedStep = true)))
      res.state.select(col("id"), round(col("rank"), 8).as("pr"))
    }, Some(pagerankSql(20, 0.85))),

    // Personalized PageRank: teleport + dangling mass biased to the seed
    // set (id % 37 = 0), 20 fixed supersteps — same unrolled-CTE mirror as
    // g6 with the uniform 1/n teleport replaced by the seed vector.
    ("g11_ppr20", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir)
      val seeds = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .where(col("id") % 37 === 0)
        .select(col("id"), lit(1.0).as("p"))
      val res = PageRank.run(e,
        PageRank.Params(tol = 0.0, maxIter = 20, numPartitions = P),
        Some(Superstep.Config(P, 20, tol = 0.0, fixedStep = true)),
        reset = Some(seeds))
      res.state.select(col("id"), round(col("rank"), 8).as("pr"))
    }, Some(pprSql(20, 0.85))),

    // Strongly connected components (directed): forward/backward min-label
    // refinement vs the closure-self-join definition — v ∈ SCC(s) iff s
    // reaches v AND v reaches s; scc = min member id. The blocked graph's
    // dense random blocks carry plural non-trivial SCCs plus DAG tendrils.
    ("g12_scc", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.Scc.run(bedges(dir), numPartitions = P)
    }, Some(
      s"""WITH RECURSIVE $bedgesSql,
         |$bvertsSql,
         |reach(s, v) AS (
         |  SELECT id, id FROM bverts
         |  UNION
         |  SELECT r.s, e.dst FROM reach r JOIN bedges e ON e.src = r.v)
         |SELECT r1.s AS id, MIN(r1.v) AS scc
         |FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s
         |GROUP BY r1.s""".stripMargin)),

    // k-core decomposition (coreness): iterated h-index to fixpoint vs the
    // same integer recurrence unrolled 30 rounds (identical either way —
    // rounds past the fixpoint are identities; Coreness scaladoc).
    ("g13_kcore", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.Coreness.run(relEdges(dir), numPartitions = P, maxIter = 30)
        .select(col("id"), col("core").cast("long").as("core"))
    }, Some(kcoreSql(30))),

    // HITS hubs & authorities: 20 fixed L1-normalized power-iteration steps
    // vs the unrolled mirror; 8dp rounding (double reduce-order noise).
    ("g14_hits", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.Hits.run(relEdges(dir), iters = 20, numPartitions = P)
        .select(col("id"), round(col("hub"), 8).as("hub"),
          round(col("auth"), 8).as("auth"))
    }, Some(hitsSql(20))),

    // North-rule label propagation: 10 synchronous supersteps, deterministic
    // (count desc, label asc) argmax, vs generated fixed-iteration SQL.
    ("g7_labelprop10", (s: SparkSession, dir: String) => {
      implicit val sp = s
      LabelPropagation.run(bedges(dir), numPartitions = P, maxIter = 10).state
    }, Some(lpSql(10))),

    // The whole structural-metrics layer (SURVEY §2.8 G1-G4, networkx
    // semantics incl. the successors-only "in+out" ADC quirk and directed
    // WF closeness) on the blocked graph, one "visit" per block — checked
    // against a recursive-CTE all-pairs-distance SQL mirror that was itself
    // validated against networkx 3.6 (900/900 vertices exact).
    ("g9_structure", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir).withColumn("visit_id", col("src") % 9)
      val nodes = e.select(col("visit_id"), col("src").as("name"))
        .union(e.select(col("visit_id"), col("dst").as("name"))).distinct()
        .withColumn("type", lit("Request")).withColumn("attr", lit(""))
      graft.features.GraphMetrics.structure(nodes, e)
        .select(col("name").as("id"), col("in_degree"), col("out_degree"),
          col("ancestors"), col("descendants"),
          round(col("closeness_centrality"), 8).as("closeness"),
          round(col("average_degree_connectivity"), 8).as("adc"),
          col("eccentricity"))
    }, Some(
      s"""WITH RECURSIVE ${bedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |e AS MATERIALIZED (SELECT src % 9 AS visit_id, src, dst FROM bedges),
         |eu AS MATERIALIZED (SELECT DISTINCT visit_id, src, dst FROM
         |  (SELECT visit_id, src, dst FROM e
         |   UNION ALL SELECT visit_id, dst AS src, src AS dst FROM e)),
         |verts AS MATERIALIZED (SELECT DISTINCT visit_id, id FROM
         |  (SELECT visit_id, src AS id FROM e UNION ALL SELECT visit_id, dst FROM e)),
         |nv AS MATERIALIZED (SELECT visit_id, COUNT(*) AS n FROM verts GROUP BY visit_id),
         |outd AS MATERIALIZED (SELECT visit_id, src AS id, COUNT(*) AS out_degree FROM e GROUP BY visit_id, src),
         |ind AS MATERIALIZED (SELECT visit_id, dst AS id, COUNT(*) AS in_degree FROM e GROUP BY visit_id, dst),
         |deg AS MATERIALIZED (SELECT v.visit_id, v.id,
         |    COALESCE(o.out_degree,0) AS out_degree, COALESCE(i.in_degree,0) AS in_degree,
         |    COALESCE(o.out_degree,0)+COALESCE(i.in_degree,0) AS k
         |  FROM verts v LEFT JOIN outd o ON v.visit_id=o.visit_id AND v.id=o.id
         |  LEFT JOIN ind i ON v.visit_id=i.visit_id AND v.id=i.id),
         |walk(visit_id, s, v, d) AS (
         |  SELECT visit_id, id, id, 0 FROM verts
         |  UNION
         |  SELECT w.visit_id, w.s, e.dst, w.d + 1 FROM walk w
         |    JOIN e ON e.visit_id = w.visit_id AND e.src = w.v WHERE w.d < 60),
         |uwalk(visit_id, s, v, d) AS (
         |  SELECT visit_id, id, id, 0 FROM verts
         |  UNION
         |  SELECT w.visit_id, w.s, eu.dst, w.d + 1 FROM uwalk w
         |    JOIN eu ON eu.visit_id = w.visit_id AND eu.src = w.v WHERE w.d < 60),
         |dmin AS MATERIALIZED (SELECT visit_id, s, v, MIN(d) AS dist FROM walk GROUP BY visit_id, s, v),
         |udmin AS MATERIALIZED (SELECT visit_id, s, v, MIN(d) AS dist FROM uwalk GROUP BY visit_id, s, v),
         |upairs AS MATERIALIZED (SELECT visit_id, COUNT(*) AS pairs FROM udmin GROUP BY visit_id),
         |eccr AS MATERIALIZED (SELECT visit_id, s AS id, MAX(dist) AS ecc_raw
         |  FROM udmin GROUP BY visit_id, s),
         |anc AS MATERIALIZED (SELECT visit_id, v AS id, COUNT(*)-1 AS ancestors,
         |  SUM(dist) AS sum_d, COUNT(*) AS r FROM dmin GROUP BY visit_id, v),
         |descn AS MATERIALIZED (SELECT visit_id, s AS id, COUNT(*)-1 AS descendants FROM dmin GROUP BY visit_id, s),
         |succsum AS MATERIALIZED (SELECT e.visit_id, e.src AS id, SUM(dv.k) AS ssum
         |  FROM e JOIN deg dv ON dv.visit_id=e.visit_id AND dv.id=e.dst GROUP BY e.visit_id, e.src),
         |adc AS MATERIALIZED (SELECT d.visit_id, d.k,
         |  CAST(SUM(COALESCE(s.ssum,0)) AS DOUBLE)/SUM(d.k) AS adc
         |  FROM deg d LEFT JOIN succsum s ON s.visit_id=d.visit_id AND s.id=d.id
         |  GROUP BY d.visit_id, d.k)
         |SELECT d.id, d.in_degree, d.out_degree, a.ancestors, ds.descendants,
         |  ROUND(CASE WHEN a.sum_d > 0 AND nv.n > 1
         |    THEN (CAST(a.r-1 AS DOUBLE)/a.sum_d) * (CAST(a.r-1 AS DOUBLE)/(nv.n-1))
         |    ELSE 0.0 END, 8) AS closeness,
         |  ROUND(adc.adc, 8) AS adc,
         |  CAST(CASE WHEN up.pairs = nv.n * nv.n THEN ec.ecc_raw ELSE -1 END AS BIGINT)
         |    AS eccentricity
         |FROM deg d
         |JOIN nv ON nv.visit_id=d.visit_id
         |JOIN upairs up ON up.visit_id=d.visit_id
         |JOIN anc a ON a.visit_id=d.visit_id AND a.id=d.id
         |JOIN descn ds ON ds.visit_id=d.visit_id AND ds.id=d.id
         |JOIN eccr ec ON ec.visit_id=d.visit_id AND ec.id=d.id
         |JOIN adc ON adc.visit_id=d.visit_id AND adc.k=d.in_degree+d.out_degree""".stripMargin)),

    // The 10^12-scale sketch tier for closeness/eccentricity (G3/G5):
    // HyperBall on the blocked graph. Ball sizes ≤ block size (≤100) keep
    // HLL++ in its sparse-EXACT regime, so the sketch is oracled exactly
    // against a recursive-CTE incoming-distance mirror — the estimate-error
    // regime only exists at true scale.
    ("g10_hyperball", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.HyperBall.run(bedges(dir), numPartitions = P)
        .select(col("id"), col("reach_approx"),
          col("sum_dist_approx").cast("long").as("sum_dist"),
          round(col("harmonic_approx"), 8).as("harmonic"),
          col("ecc_approx"),
          round(col("closeness_approx"), 8).as("closeness"))
    }, Some(
      s"""WITH RECURSIVE ${bedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |$bvertsSql,
         |nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM bverts),
         |walk(s, v, d) AS (
         |  SELECT id, id, 0 FROM bverts
         |  UNION
         |  SELECT w.s, e.dst, w.d + 1 FROM walk w
         |    JOIN bedges e ON e.src = w.v WHERE w.d < 60),
         |dmin AS MATERIALIZED (SELECT s, v, MIN(d) AS dist FROM walk GROUP BY s, v),
         |anc AS MATERIALIZED (SELECT v AS id, COUNT(*) - 1 AS reach,
         |    SUM(dist) AS sumd,
         |    SUM(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0.0 END) AS harm,
         |    MAX(dist) AS ecc FROM dmin GROUP BY v)
         |SELECT id, CAST(reach AS BIGINT) AS reach_approx,
         |  CAST(sumd AS BIGINT) AS sum_dist,
         |  ROUND(harm, 8) AS harmonic,
         |  CAST(ecc AS BIGINT) AS ecc_approx,
         |  ROUND(CASE WHEN sumd > 0 AND nv.n > 1
         |    THEN (CAST(reach AS DOUBLE) / sumd) * (CAST(reach AS DOUBLE) / (nv.n - 1))
         |    ELSE 0.0 END, 8) AS closeness
         |FROM anc, nv""".stripMargin)),

    // k-truss (edge-analog of k-core): synchronous support peel to fixpoint
    // vs the same integer recurrence unrolled 24 rounds (identities past
    // the fixpoint — KTruss scaladoc). 4-truss: every surviving edge closes
    // ≥ 2 triangles within the truss.
    ("g15_ktruss", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.KTruss.run(tedges(dir), k = 4, numPartitions = P, maxIter = 24)
    }, Some(ktrussSql(4, 24))),

    // Link prediction (common neighbors / Adamic-Adar / Jaccard) on the
    // triangle graph: top-100 non-adjacent pairs by the all-integer
    // (cn desc, a, b) order; float scores rounded 8dp (reduce-order noise).
    ("g16_linkpred", (s: SparkSession, dir: String) => {
      implicit val sp = s
      graft.algo.LinkPrediction.run(tedges(dir), topK = 100, numPartitions = P)
        .select(col("a"), col("b"), col("cn"), round(col("aa"), 8).as("aa"),
          round(col("jaccard"), 8).as("jaccard"), col("rnk"))
    }, Some(
      s"""WITH ${tedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM tedges),
         |sym AS MATERIALIZED (SELECT a AS z, b AS n FROM und UNION ALL SELECT b AS z, a AS n FROM und),
         |deg AS MATERIALIZED (SELECT z AS id, COUNT(*) AS deg FROM sym GROUP BY z),
         |cand AS MATERIALIZED (
         |  SELECT s1.n AS a, s2.n AS b, COUNT(*) AS cn, SUM(1.0 / LN(d.deg)) AS aa
         |  FROM sym s1 JOIN sym s2 ON s2.z = s1.z AND s1.n < s2.n
         |  JOIN deg d ON d.id = s1.z
         |  GROUP BY s1.n, s2.n),
         |ne AS MATERIALIZED (
         |  SELECT c.a, c.b, c.cn, c.aa FROM cand c
         |  LEFT JOIN und e ON e.a = c.a AND e.b = c.b WHERE e.a IS NULL),
         |rk AS (SELECT a, b, cn, aa,
         |  ROW_NUMBER() OVER (ORDER BY cn DESC, a ASC, b ASC) AS rnk FROM ne)
         |SELECT r.a, r.b, r.cn, ROUND(r.aa, 8) AS aa,
         |  ROUND(CAST(r.cn AS DOUBLE) / (da.deg + db.deg - r.cn), 8) AS jaccard,
         |  r.rnk
         |FROM rk r JOIN deg da ON da.id = r.a JOIN deg db ON db.id = r.b
         |WHERE r.rnk <= 100""".stripMargin)),

    // Deterministic hash-draw random walks (DeepWalk corpus extraction):
    // 8 steps from every id%5=0 seed on the blocked digraph, next hop =
    // argmin md5-derived draw key — both engines replay the exact walks.
    ("g17_walks", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir)
      val seeds = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .where(col("id") % 5 === 0)
      graft.algo.RandomWalks.run(e, seeds, length = 8, numPartitions = P)
    }, Some(walksSql(8))),

    // Betweenness centrality (Brandes supersteps, sampled-pivot sources
    // id%3=0 — the standard estimator at scale) vs the direct σ-formula
    // mirror; 6dp rounding (betweennessSql doc).
    ("g18_betweenness", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir)
      val seeds = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .where(col("id") % 3 === 0)
      graft.algo.Betweenness.run(e, sources = Some(seeds), numPartitions = P)
        .select(col("id"), round(col("bc"), 6).as("bc"))
    }, Some(betweennessSql(60))),

    // Weighted PageRank: rank splits proportionally to the deterministic
    // (src+dst)%7+1 edge weight (networkx pagerank(weight=…)); 20 fixed
    // supersteps vs the unrolled mirror, 8dp rounding like g6.
    ("g19_wpagerank20", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = bedges(dir).withColumn("w",
        ((col("src") + col("dst")) % 7 + 1).cast("double"))
      val res = PageRank.run(e,
        PageRank.Params(tol = 0.0, maxIter = 20, numPartitions = P,
          weightCol = Some("w")),
        Some(Superstep.Config(P, 20, tol = 0.0, fixedStep = true)))
      res.state.select(col("id"), round(col("rank"), 8).as("pr"))
    }, Some(wpagerankSql(20, 0.85))),

    // Local clustering coefficient (nx clustering(): 2T/d(d-1), 0 below
    // degree 2) — composes the g3 triangle kernel with undirected degree.
    ("g20_clustering", (s: SparkSession, dir: String) => {
      implicit val sp = s
      GraphStats.clustering(tedges(dir), P)
    }, Some(
      s"""WITH ${tedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM tedges),
         |deg AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM
         |  (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id),
         |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
         |        FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
         |pv AS (SELECT id, COUNT(*) AS triangles FROM (
         |        SELECT u AS id FROM tri UNION ALL SELECT v FROM tri
         |        UNION ALL SELECT w FROM tri) GROUP BY id)
         |SELECT d.id, d.deg, COALESCE(pv.triangles, 0) AS triangles,
         |  ROUND(CASE WHEN d.deg >= 2
         |    THEN 2.0 * COALESCE(pv.triangles, 0) / (d.deg * (d.deg - 1))
         |    ELSE 0.0 END, 8) AS cc
         |FROM deg d LEFT JOIN pv ON pv.id = d.id""".stripMargin)),

    // Modularity of the converged LP communities (Newman Q, per-community
    // decomposition: e_c/m − (D_c/2m)²): integer e_c/D_c aggregates over
    // the deterministic 10-round labels, one float formula at the end.
    ("g21_modularity", (s: SparkSession, dir: String) => {
      implicit val sp = s
      GraphStats.modularityContrib(bedges(dir), lpLabels10(dir))
    }, Some(
      s"""WITH ${lpSqlBody(10)},
         |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM bedges),
         |deg AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM
         |  (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id),
         |m AS MATERIALIZED (SELECT COUNT(*) AS m FROM und),
         |ec AS MATERIALIZED (SELECT la.label, COUNT(*) AS ec FROM und
         |  JOIN l10 la ON la.id = und.a JOIN l10 lb ON lb.id = und.b
         |  WHERE la.label = lb.label GROUP BY la.label),
         |dc AS MATERIALIZED (SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS dc
         |  FROM l10 l JOIN deg d ON d.id = l.id GROUP BY l.label)
         |SELECT dc.label, COALESCE(ec.ec, 0) AS ec, dc.dc,
         |  ROUND(CAST(COALESCE(ec.ec, 0) AS DOUBLE) / m.m -
         |    (CAST(dc.dc AS DOUBLE) / (2 * m.m)) *
         |    (CAST(dc.dc AS DOUBLE) / (2 * m.m)), 8) AS q_contrib
         |FROM dc LEFT JOIN ec ON ec.label = dc.label CROSS JOIN m""".stripMargin)),

    // Per-community conductance over the same converged LP communities as
    // g21 (nx conductance: cut / min(vol, 2m−vol)) — the boundary-quality
    // complement of modularity's internal-density view.
    ("g23_conductance", (s: SparkSession, dir: String) => {
      implicit val sp = s
      GraphStats.conductance(bedges(dir), lpLabels10(dir))
    }, Some(
      s"""WITH ${lpSqlBody(10)},
         |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM bedges),
         |deg AS MATERIALIZED (SELECT id, COUNT(*) AS deg FROM
         |  (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id),
         |m AS MATERIALIZED (SELECT COUNT(*) AS m FROM und),
         |tagged AS MATERIALIZED (SELECT la.label AS la, lb.label AS lb FROM und
         |  JOIN l10 la ON la.id = und.a JOIN l10 lb ON lb.id = und.b),
         |cut AS MATERIALIZED (SELECT label, COUNT(*) AS cut FROM (
         |  SELECT la AS label FROM tagged WHERE la <> lb
         |  UNION ALL SELECT lb FROM tagged WHERE la <> lb) GROUP BY label),
         |vol AS MATERIALIZED (SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS vol
         |  FROM l10 l JOIN deg d ON d.id = l.id GROUP BY l.label)
         |SELECT v.label, COALESCE(c.cut, 0) AS cut, v.vol,
         |  ROUND(CASE WHEN LEAST(CAST(v.vol AS DOUBLE), 2 * m.m - CAST(v.vol AS DOUBLE)) > 0
         |    THEN CAST(COALESCE(c.cut, 0) AS DOUBLE) /
         |      LEAST(CAST(v.vol AS DOUBLE), 2 * m.m - CAST(v.vol AS DOUBLE))
         |    ELSE 0.0 END, 8) AS conductance
         |FROM vol v LEFT JOIN cut c ON c.label = v.label CROSS JOIN m""".stripMargin)),

    // Degree assortativity (nx degree_assortativity_coefficient, undirected:
    // Pearson r over the degree pairs of every edge stub). All sums are
    // exact BIGINT; the closed-form float evaluation is a fixed expression
    // tree both engines execute identically (IEEE), rounded 8dp.
    ("g22_assortativity", (s: SparkSession, dir: String) => {
      implicit val sp = s
      GraphStats.assortativity(tedges(dir))
    }, Some(
      s"""WITH ${tedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM tedges),
         |sym AS MATERIALIZED (SELECT a AS p, b AS q FROM und UNION ALL SELECT b AS p, a AS q FROM und),
         |deg AS MATERIALIZED (SELECT p AS id, COUNT(*) AS deg FROM sym GROUP BY p),
         |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(dj.deg) AS sj, SUM(dk.deg) AS sk,
         |    SUM(dj.deg * dk.deg) AS sjk,
         |    SUM(dj.deg * dj.deg) AS sj2,
         |    SUM(dk.deg * dk.deg) AS sk2
         |  FROM sym s JOIN deg dj ON dj.id = s.p JOIN deg dk ON dk.id = s.q)
         |SELECT n,
         |  ROUND(CASE WHEN (CAST(n AS DOUBLE) * sj2 - CAST(sj AS DOUBLE) * sj) *
         |             (CAST(n AS DOUBLE) * sk2 - CAST(sk AS DOUBLE) * sk) > 0
         |    THEN (CAST(n AS DOUBLE) * sjk - CAST(sj AS DOUBLE) * sk) /
         |      SQRT((CAST(n AS DOUBLE) * sj2 - CAST(sj AS DOUBLE) * sj) *
         |           (CAST(n AS DOUBLE) * sk2 - CAST(sk AS DOUBLE) * sk))
         |    ELSE 0.0 END, 8) AS assortativity
         |FROM sums""".stripMargin)),

    // Common-Crawl host-graph contraction: url edges → registrable-domain
    // edges with link multiplicities (HostGraph.contract, native etld1;
    // the mirror replays the PSL unknown-TLD fallback as last-two-labels,
    // exact on the fixture's host space).
    ("g24_hostgraph", (s: SparkSession, dir: String) => {
      implicit val sp = s
      HostGraph.contract(uedges(dir))
    }, Some(
      s"""WITH ${uedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |$hedgesSql
         |SELECT src_host, dst_host, weight FROM hedges""".stripMargin)),

    // Weighted PageRank over the contracted host graph — the Common-Crawl
    // domain-ranking job end-to-end (contract → xxhash64 vertex ids →
    // weighted superstep loop → ranks joined back to host names). The
    // mirror runs the identical loop keyed on host strings.
    ("g25_hostrank", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val (e, hosts) = HostGraph.withIds(HostGraph.contract(uedges(dir)))
      val res = PageRank.run(e,
        PageRank.Params(tol = 0.0, maxIter = 20, numPartitions = P,
          weightCol = Some("weight")),
        Some(Superstep.Config(P, 20, tol = 0.0, fixedStep = true)))
      res.state.join(hosts, Seq("id"))
        .select(col("host"), round(col("rank"), 8).as("pr"))
    }, Some(hostPrSql(20, 0.85))),

    // Crawl-snapshot link churn (CrawlDiff): two deterministic snapshot
    // slices of the url edge table (k%5 / (k+c)%5 — overlapping sets),
    // edge-level added/removed/persisted, aggregated per source host.
    ("g26_crawldiff", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val base = uedges(dir)
      val snapA = base.where(col("k") % 5 =!= 0).select("src", "dst")
      val snapB = base.where((col("k") + col("c")) % 5 =!= 0)
        .select("src", "dst")
      graft.graphbuild.CrawlDiff.hostChurn(
        graft.graphbuild.CrawlDiff.edgeDiff(snapA, snapB))
    }, Some(
      s"""WITH ${uedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |sa AS MATERIALIZED (SELECT DISTINCT src, dst FROM uedges WHERE k%5 <> 0),
         |sb AS MATERIALIZED (SELECT DISTINCT src, dst FROM uedges WHERE (k+c)%5 <> 0),
         |diff AS MATERIALIZED (SELECT COALESCE(sa.src, sb.src) AS src,
         |    CASE WHEN sa.src IS NOT NULL AND sb.src IS NOT NULL THEN 'persisted'
         |         WHEN sa.src IS NOT NULL THEN 'removed' ELSE 'added' END AS status
         |  FROM sa FULL OUTER JOIN sb ON sa.src = sb.src AND sa.dst = sb.dst)
         |SELECT regexp_extract(regexp_extract(src,'^http://([^/]+)',1),'([^.]+\\.[^.]+)$$',1) AS host,
         |  CAST(SUM(CASE WHEN status='added' THEN 1 ELSE 0 END) AS BIGINT) AS added,
         |  CAST(SUM(CASE WHEN status='removed' THEN 1 ELSE 0 END) AS BIGINT) AS removed,
         |  CAST(SUM(CASE WHEN status='persisted' THEN 1 ELSE 0 END) AS BIGINT) AS persisted
         |FROM diff GROUP BY 1""".stripMargin)),

    // Domain-graph evolution (CrawlDiff.contractedDiff): the same two
    // snapshot slices as g26, each contracted to the host graph, diffed on
    // the host pair with weight deltas — the monthly Common-Crawl
    // domain-graph churn artifact. Mirror reuses the one contraction
    // derivation (hostContractSql) per slice.
    ("g27_hostdiff", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val base = uedges(dir)
      val snapA = base.where(col("k") % 5 =!= 0).select("src", "dst")
      val snapB = base.where((col("k") + col("c")) % 5 =!= 0)
        .select("src", "dst")
      graft.graphbuild.CrawlDiff.contractedDiff(snapA, snapB)
    }, Some(
      s"""WITH ${uedgesSql.replaceFirst("AS", "AS MATERIALIZED")},
         |sa AS MATERIALIZED (SELECT src, dst FROM uedges WHERE k%5 <> 0),
         |sb AS MATERIALIZED (SELECT src, dst FROM uedges WHERE (k+c)%5 <> 0),
         |${hostContractSql("sa", "ha").replaceFirst("AS", "AS MATERIALIZED")},
         |${hostContractSql("sb", "hb").replaceFirst("AS", "AS MATERIALIZED")}
         |SELECT COALESCE(ha.src_host, hb.src_host) AS src_host,
         |  COALESCE(ha.dst_host, hb.dst_host) AS dst_host,
         |  CAST(COALESCE(ha.weight, 0) AS BIGINT) AS w_a,
         |  CAST(COALESCE(hb.weight, 0) AS BIGINT) AS w_b,
         |  CAST(COALESCE(hb.weight, 0) - COALESCE(ha.weight, 0) AS BIGINT) AS delta,
         |  CASE WHEN ha.weight IS NOT NULL AND hb.weight IS NOT NULL THEN 'persisted'
         |       WHEN ha.weight IS NOT NULL THEN 'removed' ELSE 'added' END AS status
         |FROM ha FULL OUTER JOIN hb
         |  ON ha.src_host = hb.src_host AND ha.dst_host = hb.dst_host""".stripMargin))
  )
}
