package graft

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Relational operator coverage (SURVEY.md §2.2-2.7): projections, filters,
  * joins of every flavor the reference uses, aggregations, windows, set ops,
  * scalar functions — each over the driver's TPC-H-ish tables with a DuckDB
  * oracle. Names tie to SURVEY §2 operator ids. */
object QueriesRel {

  val reg: Seq[Entry] = Seq(

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
      s"""SELECT l_returnflag, l_linestatus,
        |  ${dsumSql("l_quantity")} AS sum_qty,
        |  ${dsumSql("l_extendedprice")} AS sum_price,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS DECIMAL(30,6)) ELSE 0 END) AS DOUBLE) AS qty_hi_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // P1/P2/P3/F13/F15 (SURVEY §2.2, §2.7): projection + rename + equality
    // filter + key synthesis + conditional flag, one codegen'd projection.
    ("p1_project_flags", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "part")
        .where(col("p_size") >= 10 && col("p_type") === "ECONOMY")
        .select(
          col("p_partkey").as("part_id"),
          concat_ws("_", col("p_brand"), col("p_size")).as("brand_key"),
          when(col("p_retailprice") > 1500.0, lit("premium"))
            .otherwise(lit("standard")).as("tier"),
          length(col("p_name")).as("name_len"))
    }, Some(
      """SELECT p_partkey AS part_id,
        |  p_brand || '_' || p_size AS brand_key,
        |  CASE WHEN p_retailprice > 1500.0 THEN 'premium' ELSE 'standard' END AS tier,
        |  LENGTH(p_name) AS name_len
        |FROM part WHERE p_size >= 10 AND p_type = 'ECONOMY'""".stripMargin)),

    // P4 (substring predicates) + P5 (IN-list) + P8 (boolean combination).
    ("p4_pred_mix", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "part")
        .where(col("p_name").contains("widget") ||
          (col("p_type").isin("SMALL", "LARGE") && col("p_name").rlike("^(red|blue) ")))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
    }, Some(
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%widget%'
        |   OR (p_type IN ('SMALL','LARGE') AND regexp_matches(p_name, '^(red|blue) '))""".stripMargin)),

    // P10/A10 (SURVEY §2.2): dedup on a column subset.
    ("p10_dedup", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "orders").select(col("o_custkey"), col("o_orderstatus")).distinct()
    }, Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders")),

    // P7 (SURVEY §2.2): anti-membership as a left-anti join — the
    // reference's `~isin(completed_ids)` shape
    // (/root/reference/code/graph/request_edges.py:266).
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

    // J12 (semi join): customers with ≥1 urgent order, counted by segment.
    ("j12_semi_join", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "customer")
        .join(t(dir, "orders").where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
    }, Some(
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin)),

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
      s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)),

    // J7/J10 (edge-table self-join 2-hop): per user, (view → purchase)
    // event pairs within one hour — the reference's set→get indirect-edge
    // join (/root/reference/code/features/utils.py:411-419) re-expressed
    // over the events table. Equi join on the entity key + theta predicate
    // on time, exactly the 2-hop shape.
    ("j7_two_hop_events", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val ev = t(dir, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          unix_micros(col("ts").cast("timestamp")).as("vts"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          unix_micros(col("ts").cast("timestamp")).as("bts"))
      views.join(buys, Seq("user_id"))
        .where(col("bts") > col("vts") && col("bts") - col("vts") <= 3600L * 1000000L)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
    }, Some(
      """SELECT v.user_id, COUNT(*) AS n_pairs
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS vts FROM events WHERE event_type='view') v
        |JOIN (SELECT user_id, event_id, epoch_us(ts) AS bts FROM events WHERE event_type='purchase') b
        |  ON v.user_id = b.user_id
        |WHERE b.bts > v.vts AND b.bts - v.vts <= 3600000000
        |GROUP BY v.user_id""".stripMargin)),

    // J9 (theta/cross join with containment predicate): keyword list ×
    // documents — the reference's cookie-value-in-URL nested loop
    // (/root/reference/code/features/utils.py:437-463) with the small side
    // broadcast, predicate in the join condition.
    ("j9_theta_keywords", (s: SparkSession, dir: String) => {
      implicit val sp = s
      import s.implicits._
      val kws = Seq("merge join", "hash join", "sort key", "window agg",
        "fast scan").toDF("kw")
      t(dir, "documents").where(col("doc_id") < 200)
        .crossJoin(broadcast(kws))
        .where(col("text").contains(col("kw")))
        .select(col("doc_id"), col("kw"))
    }, Some(
      """SELECT doc_id, kw FROM documents
        |CROSS JOIN (VALUES ('merge join'),('hash join'),('sort key'),('window agg'),('fast scan')) AS kws(kw)
        |WHERE doc_id < 200 AND contains(text, kw)""".stripMargin)),

    // W1 (SURVEY §2.5): first-row-per-group by timestamp order — the
    // reference's "original cookie setter" pattern (desc + row_number=1,
    // quirk §2.11.1 replicated: LATEST event wins).
    ("w1_latest_per_user", (s: SparkSession, dir: String) => {
      implicit val sp = s
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

    // W2/J8 (first vs subsequent split): per user, the first event's id and
    // how many later events are purchases — the reference's first-setter vs
    // later-setters temporal split (/root/reference/code/features/utils.py:81-105).
    ("w2_first_vs_rest", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(dir, "events")
        .withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("rn") === 1, col("event_id"))).as("first_event"),
          sum(when(col("rn") > 1 && col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("later_purchases"))
    }, Some(
      s"""SELECT user_id,
        |  MAX(CASE WHEN rn = 1 THEN event_id END) AS first_event,
        |  ${isumSql("CASE WHEN rn > 1 AND event_type = 'purchase' THEN 1 ELSE 0 END")} AS later_purchases
        |FROM (SELECT user_id, event_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |      FROM events)
        |GROUP BY user_id""".stripMargin)),

    // W3 (lead/lag along an ordered chain): inter-event gap per user — the
    // reference's shift-headers-by-one-hop along redirect chains
    // (/root/reference/code/graph/request_edges.py:95-108).
    ("w3_lead_lag", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(dir, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_event"),
          (unix_micros(col("ts").cast("timestamp")) - lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
            .as("gap_us"))
        .where(col("prev_event").isNotNull)
    }, Some(
      """SELECT user_id, event_id, prev_event, gap_us FROM (
        |  SELECT user_id, event_id,
        |    LAG(event_id) OVER w AS prev_event,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |WHERE prev_event IS NOT NULL""".stripMargin)),

    // U2 (set union) + U4 (set difference): nation ids seen on the customer
    // side vs supplier side (reference: id-list unions
    // /root/reference/code/graph/request_edges.py:332, CV-fold difference
    // /root/reference/code/classification/classify.py:352).
    ("u2_union_except", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val cu = t(dir, "customer").select(col("c_custkey").as("k"))
      val withOrders = t(dir, "orders").select(col("o_custkey").as("k")).distinct()
      val withUrgent = t(dir, "orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k")).distinct()
      cu.intersect(withOrders).except(withUrgent)
    }, Some(
      """SELECT c_custkey AS k FROM customer
        |INTERSECT (SELECT o_custkey FROM orders)
        |EXCEPT (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin)),

    // F3 (JSON-in-string field extraction): the reference's attr/header JSON
    // columns (/root/reference/code/graph/request_edges.py:20-21) — here the
    // events `props` payload; grouped numeric agg on the extracted field.
    ("f3_json_extract", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "events")
        .select(col("event_type"),
          QueryUtil.jsonGet(col("props"), "k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
    }, Some(
      s"""SELECT event_type, COUNT(*) AS n,
        |  ${isumSql("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin)),

    // F12 (digest/encoding functions): md5 + base64 — the reference hashes
    // cookie values to detect identifier sharing
    // (/root/reference/code/features/utils.py:239-281).
    ("f12_digests", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          md5(col("text")).as("text_md5"),
          base64(substring(col("text"), 1, 12).cast("binary")).as("prefix_b64"))
    }, Some(
      """SELECT doc_id, md5(text) AS text_md5,
        |  to_base64(encode(substr(text, 1, 12))) AS prefix_b64
        |FROM documents WHERE doc_id < 50""".stripMargin)),

    // Date/time bucketing (the engine-side generalization of the reference's
    // string-timestamp ordering): orders per month with revenue.
    ("dt_month_rollup", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "orders")
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    }, Some(
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, COUNT(*) AS n_orders,
        |  ${dsumSql("o_totalprice")} AS revenue
        |FROM orders GROUP BY 1""".stripMargin)),

    // A9 (min/max/avg family — exact min/max over doubles is engine-safe).
    ("a9_stats_by_brand", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          min(col("p_size")).as("min_size"),
          max(col("p_size")).as("max_size"))
    }, Some(
      """SELECT p_brand, COUNT(*) AS n,
        |  MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
        |  MIN(p_size) AS min_size, MAX(p_size) AS max_size
        |FROM part GROUP BY p_brand""".stripMargin)),

    // A10 (exact distinct counting — approx_count_distinct is the scale
    // path; the exact path is the oracle).
    ("a10_distinct_parts", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }, Some(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // A11 (label disjunction across a pattern list): per source, how many
    // docs match ANY of the ad-keyword-style patterns
    // (/root/reference/code/labelling/node_labelling.py:113-117).
    ("a11_flag_disjunction", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val flagged = when(
        col("text").contains("hash join") || col("text").contains("merge join") ||
          col("text").contains("window agg"), 1L).otherwise(0L)
      t(dir, "documents")
        .groupBy(col("source"))
        .agg(sum(flagged).as("n_flagged"), count(lit(1)).as("n_docs"))
    }, Some(
      s"""SELECT source,
        |  ${isumSql("""CASE WHEN contains(text,'hash join') OR contains(text,'merge join')
        |            OR contains(text,'window agg') THEN 1 ELSE 0 END""")} AS n_flagged,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY source""".stripMargin))
  )
}
