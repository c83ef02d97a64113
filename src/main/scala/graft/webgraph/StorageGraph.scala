package graft.webgraph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.GraftExtensions

/** JS storage (localStorage + document.cookie) graph construction
  * (reference: /root/reference/code/graph/storage_edges.py — SURVEY.md
  * §2.2 P3/P4, §2.7 F2/F7/F8, §2.9 UDTFs).
  *
  * Cookie keys are `name|$$|eTLD+1(document_url)` (+"|$$|LS" for
  * localStorage) — graft.norm.Etld1 stands in for tldextract
  * (/root/reference/code/graph/utils.py:6-21). eTLD+1 and the cookie-payload
  * parse plan as native codegen'd expressions (graft.ext); the call-stack
  * hop generator stays a Scala UDF deliberately — it is the engine's
  * showcase UDTF-style explode (SURVEY.md §2.9).
  */
object StorageGraph {

  private def etld1(c: org.apache.spark.sql.Column) =
    call_function("etld1", c)

  /** localStorage accesses: symbol contains "Storage." (P4); name from
    * arguments JSON [name, value]; action from the Storage.(get|set|remove)
    * Item symbol (F7). */
  def localStorage(js: Dataset[JsCall]): (DataFrame, DataFrame) = {
    GraftExtensions.register(js.sparkSession)
    val rows = js.toDF()
      .where(col("symbol").contains("Storage."))
      // native single-pass array reads (builtin get_json_object builds a
      // Jackson parser per row per call — graft.ext.JsonExpressions)
      .withColumn("sname", call_function("json_array_get",
        col("arguments"), lit(0)))
      .withColumn("arg1", call_function("json_array_get",
        col("arguments"), lit(1)))
      .withColumn("attr",
        when(col("arg1").isNotNull,
          to_json(struct(col("arg1").as("value"))))
          .otherwise(lit("")))
      // non-*Item Storage symbols (clear/length/key) get action "" — the
      // reference's get_storage_action re.search fails, the exception is
      // swallowed and "" returned (storage_edges.py:46-61); blindly
      // appending the suffix would mint a phantom "_storage_js" action
      .withColumn("action",
        when(col("symbol").rlike("Storage\\..*Item"),
          concat(regexp_extract(col("symbol"), "Storage\\.(.*)Item", 1),
            lit("_storage_js")))
          .otherwise(lit("")))
      .withColumn("domain", etld1(col("document_url")))
      .withColumn("skey",
        concat_ws("|$$|", col("sname"), col("domain"), lit("LS")))

    val nodes = rows.select(col("visit_id"), col("skey").as("name"),
        lit("Storage").as("type"), lit("N/A").as("attr"),
        col("document_url"), col("domain"), col("top_level_url"))
      .dropDuplicates()
    val edges = rows.select(col("visit_id"), col("script_url").as("src"),
        col("skey").as("dst"), col("top_level_url"), col("action"),
        col("attr"), col("time_stamp"))
    (nodes, edges)
  }

  /** document.cookie accesses: explode parsed name/value pairs (get splits
    * multi-cookie strings; set yields one pair with attrs folded into the
    * value), then call-stack hop edges ("CS") + the terminal
    * script→cookie-key edge with a JSON attr payload. */
  def jsCookies(js: Dataset[JsCall]): (DataFrame, DataFrame) = {
    val spark = js.sparkSession
    import spark.implicits._
    GraftExtensions.register(spark)

    // stack frames: "fn@url:line:col" → url (split on [@;], rsplit ':' ×2)
    val stackGen = udf { (cs: String, cookieName: String, cookieVal: String,
                          operation: String, ts: String) =>
      val urls0 =
        if (cs == null) Seq.empty[String]
        else cs.split("\\s+").toSeq.flatMap { line =>
          val comps = line.split("[@;]")
          if (comps.length >= 2) {
            val u = comps(1)
            val cut = u.lastIndexOf(':')
            val cut2 = if (cut > 0) u.lastIndexOf(':', cut - 1) else -1
            Some(if (cut2 > 0) u.substring(0, cut2) else u)
          } else None
        }
      val urls = urls0.reverse.foldLeft(Vector.empty[String]) {
        case (acc, u) if acc.nonEmpty && acc.last == u => acc
        case (acc, u) => acc :+ u
      }
      val op = operation + "_js"
      val hops =
        if (urls.length > 1)
          urls.sliding(2).map(p => (p(0), p(1), "CS", "CS", ts)).toSeq
        else Seq.empty
      val terminal =
        if (urls.nonEmpty && cookieName != null && cookieName.nonEmpty) {
          val attr =
            if (op == "set_js") {
              // value tail "v; k=v2; Secure" → {"value": v, "k": v2}
              val info = cookieVal.split(";").toSeq
              val pairs = info.drop(1).flatMap { ci =>
                val kv = ci.split("=")
                if (kv.length == 2) Some(kv(0) -> kv(1)) else None
              }
              val J = graft.core.Json
              val fields = (("value" -> info.head) +: pairs)
                .map { case (k, v) => s"${J.str(k.trim)}:${J.str(v.trim)}" }
              // deterministic key order: insertion order, as built
              fields.mkString("{", ",", "}")
            } else s"""{"value":${graft.core.Json.str(cookieVal)}}"""
          Seq((urls.last, cookieName, op, attr, ts))
        } else Seq.empty
      hops ++ terminal
    }

    val rows = js.toDF()
      .where(col("symbol") === "window.document.cookie")
      // explode_OUTER + isNotNull (both hops): plain explode lets
      // InferFiltersFromGenerate add a size()>0 filter that re-runs the
      // cookie parse / the stack UDF a second time per row (graft.dedup
      // .Dedup.shingleTable has the full story)
      .withColumn("nv", explode_outer(call_function("js_cookie_pairs",
        coalesce(col("value"), lit("")), coalesce(col("operation"), lit("")))))
      .where(col("nv").isNotNull)
      .withColumn("e", explode_outer(stackGen(col("call_stack"), col("nv._1"),
        col("nv._2"), col("operation"), col("time_stamp"))))
      .where(col("e").isNotNull)
      .select(col("visit_id"), col("document_url"), col("top_level_url"),
        col("e._1").as("script_url"), col("e._2").as("cname"),
        col("e._3").as("action"), col("e._4").as("attr"),
        col("e._5").as("time_stamp"))
      .withColumn("domain", etld1(col("document_url")))
      .withColumn("ckey",
        when(col("action") === "CS", col("cname"))
          .otherwise(concat_ws("|$$|", col("cname"), col("domain"))))

    val nodes = rows.where(col("action") =!= "CS")
      .select(col("visit_id"), col("ckey").as("name"), col("top_level_url"),
        col("document_url"), col("domain"))
      .dropDuplicates()
      .withColumn("type", lit("Storage"))
      .withColumn("attr", lit("Cookie"))
    val edges = rows.select(col("visit_id"), col("script_url").as("src"),
      col("ckey").as("dst"), col("top_level_url"), col("action"),
      col("attr"), col("time_stamp"))
    (nodes, edges)
  }

  /** Full storage component with the sentinel edge columns attached. */
  def build(js: Dataset[JsCall]): (DataFrame, DataFrame) = {
    val (lsNodes, lsEdges) = localStorage(js)
    val (ckNodes, ckEdges) = jsCookies(js)
    val nodes = lsNodes.unionByName(
      ckNodes.select(lsNodes.columns.map(col): _*))
    val edges = lsEdges.unionByName(ckEdges)
      .withColumn("reqattr", lit("N/A"))
      .withColumn("respattr", lit("N/A"))
      .withColumn("response_status", lit("N/A"))
      .withColumn("post_body", lit(null).cast("string"))
      .withColumn("post_body_raw", lit(null).cast("string"))
      .withColumn("content_hash", lit(null).cast("string"))
    (nodes, edges)
  }
}
