package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}

/** The operator registry behind SparkEntry.queries / oracleSql.
  *
  * Naming convention ties each query to its SURVEY.md §2 operator id
  * (p_* projections/filters, j_* joins, a_* aggregations, w_* windows,
  * u_* set ops, f_* scalar functions, g_* graph ops, t_* text-pipeline ops,
  * d_* dedup ops, e_* embedding/ANN ops).
  *
  * Oracle determinism rules (driver compares Spark parquet vs DuckDB by
  * sorted-column value hash):
  *  - no raw double AGGREGATES cross the boundary: sums ride through
  *    DECIMAL (exact, order-independent in both engines) and are cast to
  *    double at the end; per-row double arithmetic is IEEE-identical;
  *  - iterative/float graph outputs round to a coarse fixed scale;
  *  - every computed column is aliased identically on both sides.
  */
object Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Deterministic small digraph derived from lineitem — the shared edge
    * table for the DuckDB-checkable graph-operator oracles (the pages-table
    * graph can't be seen by DuckDB; this one can, identically, from SQL). */
  private def relEdges(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem")
      .select((col("l_orderkey") % 500).as("src"), (col("l_partkey") % 500).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  private val relEdgesSql =
    """edges AS (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      |  FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500)""".stripMargin

  /** Exact decimal sum surfaced as double (order-independent in both engines). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  // ----------------------------------------------------------------------
  // registry: name -> (spark fn, optional oracle sql)
  // ----------------------------------------------------------------------
  private val reg: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // A8-style fused filtered aggregation (SURVEY §2.4): one shuffle, many
    // conditional sums — the reference rescans per feature; we fuse.
    ("a1_agg_lineitem", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"),
          dsum(when(col("l_discount") > 0.05, col("l_quantity"))
            .otherwise(lit(0))).as("qty_hi_disc"))
    }, Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(30,6)) ELSE 0 END) AS DOUBLE) AS qty_hi_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // W1 (SURVEY §2.5): first-row-per-group by timestamp order — the
    // reference's "original cookie setter" pattern (desc + row_number=1,
    // quirk §2.11.1 replicated: LATEST event wins).
    ("w1_latest_per_user", (s: SparkSession, dir: String) => {
      implicit val sp = s
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("latest_event"),
          col("event_type").as("latest_type"))
    }, Some(
      """SELECT user_id, event_id AS latest_event, event_type AS latest_type
        |FROM (SELECT user_id, event_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin)),

    // P10/A10 (SURVEY §2.2): dedup on a column subset.
    ("p10_dedup", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "orders").select(col("o_custkey"), col("o_orderstatus")).distinct()
    }, Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders")),

    // P7 (SURVEY §2.2): anti-membership as a left-anti join — customers
    // with no completed ('F') orders, the reference's `~isin(completed_ids)`
    // shape (/root/reference/code/graph/request_edges.py:266).
    ("p7_anti_join", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "customer").join(
        t(dir, "orders").where(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin)),

    // J1-style multi-way equi join with a broadcastable dimension chain
    // (region ⋈ nation ⋈ customer ⋈ orders) + grouped agg.
    ("j1_join_chain", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val o = t(dir, "orders"); val c = t(dir, "customer")
      val n = t(dir, "nation"); val r = t(dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
    }, Some(
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)),

    // G1 (SURVEY §2.8): in/out degree on the shared relational edge table.
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

    // D1: exact/near-exact duplicate grouping by content fingerprint
    // (training-data dedup, exact tier): md5 over the whitespace-normalized
    // lowercased leading 40 chars — prefix fingerprinting, the cheap first
    // pass before MinHash (d2_*). 23 dup groups at sf0.01.
    ("d1_exact_dup_groups", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(substring(col("text"), 1, 40), "\\s+", " ")))
            .as("fp"))
        .groupBy(col("fp")).agg(count(lit(1)).as("dups"),
          min(col("doc_id")).as("keep_id"))
        .where(col("dups") > 1)
    }, Some(
      """SELECT fp, COUNT(*) AS dups, MIN(doc_id) AS keep_id
        |FROM (SELECT doc_id,
        |        md5(lower(regexp_replace(substr(text, 1, 40), '\s+', ' ', 'g'))) AS fp
        |      FROM documents)
        |GROUP BY fp HAVING COUNT(*) > 1""".stripMargin))
  )

  val all: Map[String, (SparkSession, String) => DataFrame] =
    reg.map { case (n, f, _) => n -> f }.toMap

  val oracles: Map[String, String] =
    reg.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
