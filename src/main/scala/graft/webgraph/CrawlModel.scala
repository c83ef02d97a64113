package graft.webgraph

/** OpenWPM-shaped crawl tables (FIXTURES.md §3; source schemas at
  * /root/reference/code/graph/database.py:48-75) and the unified
  * property-graph rows the construction layer emits (reference 23-column
  * graph.csv schema, /root/reference/code/features.yaml:21-44 — SURVEY.md
  * §1.1).
  *
  * Engine-side type decisions vs the reference (conscious fixes, SURVEY.md
  * §2.11):
  *  - `response_status` is Int everywhere (kills the int/str dual-matching
  *    hack, §2.11.4);
  *  - sentinels: "N/A"/"CS" kept where semantically load-bearing (they
  *    discriminate edge kinds); absent values are null, never NaN strings;
  *  - `time_stamp` stays a string ordered lexically (the reference's
  *    ordering contract, /root/reference/code/graph/utils.py:57) — ISO-8601
  *    fixture timestamps make lexical == chronological.
  */
final case class HttpRequest(
    visit_id: Long, request_id: Long, url: String, headers: String,
    top_level_url: String, resource_type: String, time_stamp: String,
    post_body: String, post_body_raw: String)

final case class HttpResponse(
    visit_id: Long, request_id: Long, url: String, headers: String,
    response_status: Int, time_stamp: String, content_hash: String)

final case class HttpRedirect(
    visit_id: Long, old_request_id: Long, old_request_url: String,
    new_request_url: String, response_status: Int, headers: String,
    time_stamp: String)

final case class CallStack(visit_id: Long, request_id: Long, call_stack: String)

/** One row of the content store: the reference keeps response bodies in
  * LevelDB keyed by content_hash (/root/reference/code/run.py:41,
  * features/structure.py:37-41); the engine models it as a table joined by
  * hash (SURVEY.md §2.1 S3) — point-gets become one equi join. */
final case class ContentBody(content_hash: String, body: String)

/** One row of OpenWPM's `javascript` instrumentation table. */
final case class JsCall(
    visit_id: Long, script_url: String, script_line: String,
    script_loc_eval: String, top_level_url: String, document_url: String,
    symbol: String, call_stack: String, operation: String, arguments: String,
    attributes: String, value: String, time_stamp: String)

/** Unified graph node row (pre-consolidation; A1 merges duplicates). */
final case class GraphNode(
    visit_id: Long, name: String, top_level_url: String, `type`: String,
    attr: String)

/** Unified graph edge row. */
final case class GraphEdge(
    visit_id: Long, src: String, dst: String, top_level_url: String,
    reqattr: String, respattr: String, response_status: String,
    time_stamp: String, content_hash: String, post_body: String,
    post_body_raw: String, action: String)
