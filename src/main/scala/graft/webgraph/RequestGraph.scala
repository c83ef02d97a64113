package graft.webgraph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HTTP request/redirect/call-stack graph construction (reference:
  * /root/reference/code/graph/request_edges.py, SURVEY.md §2.3 J1-J3,
  * §2.4 A4, §2.5 W3) as declarative Spark dataflows.
  *
  * The reference assembles redirect chains with a per-group Python apply
  * that shifts response headers by one hop via list append
  * (request_edges.py:84-112); here the same shift is `lead()` over a
  * window ordered by (time_stamp, new_request_url) within each
  * (visit_id, old_request_id) chain — no grouped UDF, fully codegen'd.
  * Chain order: the reference relies on input-table row order; we pin the
  * explicit (time_stamp, new_request_url) sort so results are deterministic
  * under any partitioning (conscious fix, SURVEY.md §2.11 spirit).
  */
object RequestGraph {

  /** F13: the (visit_id, request_id) linking key. */
  private def key(v: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    concat_ws("_", v.cast("long"), r.cast("long"))

  /** Request nodes with F14 type promotion (script→Script,
    * main_frame→Document) and JSON attr (content_policy_type kept verbatim). */
  def requestNodes(requests: Dataset[HttpRequest]): DataFrame =
    requests.toDF()
      .select(col("visit_id"), col("url").as("name"), col("top_level_url"),
        when(col("resource_type") === "script", "Script")
          .when(col("resource_type") === "main_frame", "Document")
          .otherwise("Request").as("type"),
        to_json(struct(col("resource_type").as("content_policy_type"),
          col("top_level_url"))).as("attr"))
      .dropDuplicates()

  /** J1/A4/W3: redirect-chain edges.
    * @return (edges, completedKeys(key)) — keys consumed here are excluded
    *         from normal-edge assembly (P7 anti join downstream). */
  def redirectEdges(requests: Dataset[HttpRequest],
                    redirects: Dataset[HttpRedirect],
                    responses: Dataset[HttpResponse]): (DataFrame, DataFrame) = {
    // One hash partitioning serves the whole assembly (round 5, VERDICT r4
    // #8 / ROUND_NOTES wg4 item): all four join inputs pre-partition on
    // (visit_id, old_request_id) — a SUBSET of every join's keys, which
    // EnsureRequirements accepts as co-partitioning (requireAllClusterKeys
    // defaults off), so the three URL-suffixed joins AND the chain window
    // all reuse it instead of re-exchanging on their full key each stage.
    // At broadcast-able SF this is moot (AQE broadcasts the dimension
    // sides); at corpus scale it cuts the redirect-region exchanges from 6
    // to 4 and the hop stream is shuffled ONCE (measured with Plans
    // --no-broadcast — ROUND_NOTES round-5 notes).
    val byChain = Seq(col("visit_id"), col("old_request_id"))
    val req = requests.toDF()
    val red = redirects.toDF()
    val resp = responses.toDF()

    // hop rows: redirect (3xx response headers = respattr1) ⋈ source
    // request (request headers = reqattr1, timestamp anchors the chain) ⋈
    // target request (reqattr2) ⟕ target response (final hop's
    // respattr/status).
    val x1 = red.select(col("visit_id"), col("old_request_id"),
        col("old_request_url"), col("new_request_url"),
        col("headers").as("respattr1"),
        col("response_status").as("red_status"))
      .repartition(byChain: _*)
      .join(req.select(col("visit_id"), col("request_id").as("old_request_id"),
          col("url").as("old_request_url"),
          col("headers").as("reqattr1"), col("top_level_url"),
          col("time_stamp").as("src_ts"))
          .repartition(byChain: _*),
        Seq("visit_id", "old_request_id", "old_request_url"))

    val x2 = x1.join(
      req.select(col("visit_id"), col("request_id").as("old_request_id"),
        col("url").as("new_request_url"), col("headers").as("reqattr2"))
        .repartition(byChain: _*),
      Seq("visit_id", "old_request_id", "new_request_url"))

    val x3 = x2.join(
      resp.select(col("visit_id"), col("request_id").as("old_request_id"),
        col("url").as("new_request_url"), col("headers").as("resp_final"),
        col("response_status").as("status_final"))
        .repartition(byChain: _*),
      Seq("visit_id", "old_request_id", "new_request_url"), "left")

    val w = Window.partitionBy(col("visit_id"), col("old_request_id"))
      .orderBy(col("src_ts").asc, col("new_request_url").asc)
    val hops = x3.withColumn("rn", row_number().over(w))

    // respattr/status shift by one hop: hop i carries hop i+1's 3xx
    // response headers; the last hop takes its own target response — the
    // reference's append-then-assign-positionally header_list
    // (request_edges.py:95-112) as a lead() window.
    val hopEdges = hops.select(
      col("visit_id"),
      col("old_request_url").as("src"),
      col("new_request_url").as("dst"),
      col("top_level_url"),
      col("reqattr2").as("reqattr"),
      coalesce(lead(col("respattr1"), 1).over(w), col("resp_final")).as("respattr"),
      coalesce(lead(col("red_status"), 1).over(w), col("status_final"))
        .cast("string").as("response_status"),
      col("src_ts").as("time_stamp"))

    // chain-entry edge: top_level_url → first hop source, carrying the
    // first source request's headers and the first 3xx response.
    val initialEdges = hops.where(col("rn") === 1).select(
      col("visit_id"),
      col("top_level_url").as("src"),
      col("old_request_url").as("dst"),
      col("top_level_url"),
      col("reqattr1").as("reqattr"),
      col("respattr1").as("respattr"),
      col("red_status").cast("string").as("response_status"),
      col("src_ts").as("time_stamp"))

    val edges = initialEdges.unionByName(hopEdges)
      .withColumn("content_hash", lit("N/A"))
      .withColumn("post_body", lit(null).cast("string"))
      .withColumn("post_body_raw", lit(null).cast("string"))
      .withColumn("action", lit("N/A"))

    val completed = x3.select(key(col("visit_id"), col("old_request_id")).as("key"))
      .distinct()
    (edges, completed)
  }

  /** Call-stack hop extraction: http(s) URLs per stack frame, bottom-up,
    * consecutive-duplicate-collapsed. The reference additionally passes the
    * list through Python `set()` (request_edges.py:177) whose order is
    * hash-randomized — a genuine nondeterminism; we pin stable
    * first-occurrence dedup instead (documented fix). */
  // compiled once — stackUrls runs per call-stack row inside the csEdges
  // UDF; a per-call Pattern.compile would dominate the frame scan
  private val urlRe = "(https?://[^\\s:]+)".r

  private[webgraph] def stackUrls(callStack: String): Seq[String] = {
    if (callStack == null) return Seq.empty
    val urls = callStack.split("\\s+").toSeq
      .flatMap(line => urlRe.findFirstIn(line))
      .reverse
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    urls.foreach(seen += _)
    val dedup = seen.toSeq
    // collapse consecutive duplicates (no-op after global dedup; kept for
    // shape parity with the reference's two-stage collapse)
    dedup.foldLeft(Vector.empty[String]) {
      case (acc, u) if acc.nonEmpty && acc.last == u => acc
      case (acc, u) => acc :+ u
    }
  }

  /** J2 + UDTF: call-stack edges. Chain hops carry "CS" sentinels; the
    * final hop lands on the requested URL with the real HTTP attributes. */
  def csEdges(requests: Dataset[HttpRequest], responses: Dataset[HttpResponse],
              callstacks: Dataset[CallStack]): (DataFrame, DataFrame) = {
    val spark = requests.sparkSession
    import spark.implicits._

    val merged = requests.toDF().as("q")
      .join(responses.toDF().as("p"), Seq("visit_id", "request_id"))
      .join(callstacks.toDF().dropDuplicates(), Seq("visit_id", "request_id"))
      .select(col("visit_id"), col("request_id"),
        col("q.url").as("name"), col("q.top_level_url"),
        col("q.headers").as("reqattr"), col("p.headers").as("respattr"),
        col("q.time_stamp").as("time_stamp"), col("p.response_status"),
        col("q.post_body"), col("q.post_body_raw"), col("p.content_hash"),
        col("call_stack"))

    val gen = udf { (cs: String, name: String, reqattr: String,
                     respattr: String, status: Int, ts: String,
                     contentHash: String, postBody: String, postBodyRaw: String) =>
      val urls = stackUrls(cs)
      val hops =
        if (urls.length > 1)
          urls.sliding(2).map { p =>
            (p(0), p(1), "CS", "CS", "CS", ts, contentHash, "CS", "CS")
          }.toSeq
        else Seq.empty
      val terminal =
        if (urls.nonEmpty)
          Seq((urls.last, name, reqattr, respattr, status.toString, ts,
            contentHash, postBody, postBodyRaw))
        else Seq.empty
      hops ++ terminal
    }

    val exploded = merged
      // explode_OUTER + isNotNull: plain explode would infer a pushed-down
      // size() filter that runs the stack-hop UDF twice per row
      // (Dedup.shingleTable documents the optimizer shape)
      .withColumn("e", explode_outer(gen(col("call_stack"), col("name"),
        col("reqattr"), col("respattr"), col("response_status"),
        col("time_stamp"), col("content_hash"), col("post_body"),
        col("post_body_raw"))))
      .where(col("e").isNotNull)
      .select(col("visit_id"), col("top_level_url"), col("request_id"),
        col("e._1").as("src"), col("e._2").as("dst"),
        col("e._3").as("reqattr"), col("e._4").as("respattr"),
        col("e._5").as("response_status"), col("e._6").as("time_stamp"),
        col("e._7").as("content_hash"), col("e._8").as("post_body"),
        col("e._9").as("post_body_raw"))
      .withColumn("action", lit("N/A"))

    val completed = merged
      .select(key(col("visit_id"), col("request_id")).as("key")).distinct()
    (exploded.drop("request_id"), completed)
  }

  /** J3/P7: plain request→response edges for keys not consumed by redirect
    * or call-stack assembly (left-anti on the completed-key union). */
  def normalEdges(requests: Dataset[HttpRequest],
                  responses: Dataset[HttpResponse],
                  completedKeys: DataFrame): DataFrame = {
    val req = requests.toDF()
      .withColumn("key", key(col("visit_id"), col("request_id")))
    val resp = responses.toDF()
      .withColumn("key", key(col("visit_id"), col("request_id")))
    req.join(completedKeys, Seq("key"), "left_anti")
      .join(resp.select(col("key"), col("headers").as("respattr"),
        col("response_status"), col("content_hash")), Seq("key"))
      .select(col("visit_id"),
        col("top_level_url").as("src"), col("url").as("dst"),
        col("top_level_url"),
        col("headers").as("reqattr"), col("respattr"),
        col("response_status").cast("string").as("response_status"),
        col("time_stamp"), col("content_hash"),
        col("post_body"), col("post_body_raw"))
      .withColumn("action", lit("N/A"))
  }

  /** Full HTTP component: nodes + (redirect ∪ call-stack ∪ normal) edges. */
  def build(requests: Dataset[HttpRequest], responses: Dataset[HttpResponse],
            redirects: Dataset[HttpRedirect],
            callstacks: Dataset[CallStack]): (DataFrame, DataFrame) = {
    val nodes = requestNodes(requests)
    val (redE, redKeys) = redirectEdges(requests, redirects, responses)
    val (csE, csKeys) = csEdges(requests, responses, callstacks)
    val completed = redKeys.union(csKeys).distinct()
    val normE = normalEdges(requests, responses, completed)
    val edges = redE.unionByName(csE).unionByName(normE)
    (nodes, edges)
  }
}
