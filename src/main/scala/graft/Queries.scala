package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The operator registry behind SparkEntry.queries / oracleSql.
  *
  * Naming convention ties each query to its SURVEY.md §2 operator id
  * (p_* projections/filters, j_* joins, a_* aggregations, w_* windows,
  * u_* set ops, f_* scalar functions, dt_* date ops, g_* graph ops,
  * t_* text-pipeline ops, d_* dedup ops, e_* embedding/ANN ops,
  * m_* multimodal ops). Registry lives in three files:
  * [[QueriesRel]] (relational), [[QueriesGraph]] (graph algorithms with
  * generated iterative SQL oracles), [[QueriesText]] (text / dedup /
  * similarity / multimodal).
  *
  * Oracle determinism rules (driver compares Spark parquet vs DuckDB by
  * sorted-column value hash):
  *  - no raw double AGGREGATES cross the boundary: sums ride through
  *    DECIMAL (exact, order-independent in both engines) and are cast to
  *    double at the end; min/max over doubles are exact; per-row double
  *    arithmetic is IEEE-identical when both sides evaluate the same
  *    expression tree;
  *  - iterative/float graph outputs round to a coarse fixed scale (8dp —
  *    reduce-order noise is ~1e-15);
  *  - threshold predicates over engine-computed doubles must sit in a
  *    verified gap of the data's value distribution (see d5/e1 notes);
  *  - every computed column is aliased identically on both sides;
  *  - approximate operators (LSH, SimHash, multi-probe ANN) are either
  *    oracled against exact ground truth where recall is provably certain
  *    for this corpus (d3), or oracled exactly through an engine-portable
  *    hash/quantizer tier — md5-derived token hash with recall-lossless
  *    blocking (d4), quantized-plane signatures whose bucket sign is an
  *    exact BIGINT sum (e2), integer-lattice IVF with BIGINT Lloyd
  *    arithmetic (e3), md5-derived generator shape parameters (m1). The
  *    production xxhash64/float paths keep ScalaTest recall/determinism
  *    pins. Every registered query carries an oracle.
  */
object Queries {

  private val reg: Seq[QueryUtil.Entry] =
    QueriesRel.reg ++ QueriesGraph.reg ++ QueriesText.reg ++
      QueriesWebGraph.reg ++ QueriesFeatures.reg

  require(reg.map(_._1).distinct.size == reg.size, "duplicate query names")

  val all: Map[String, (SparkSession, String) => DataFrame] =
    reg.map { case (n, f, _) => n -> f }.toMap

  val oracles: Map[String, String] =
    reg.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
