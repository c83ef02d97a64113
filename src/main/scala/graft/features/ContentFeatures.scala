package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-node URL/content lexical features (reference:
  * /root/reference/code/features/content.py, SURVEY.md §2.7 F5/F10/F11/
  * F15/F16/F18): query/param parsing, ad-keyword detection with the
  * preceding-delimiter check, screen/ad-size patterns, type label encoding.
  *
  * The urlparse/parse_qs fidelity lives in one scalar UDF (python stdlib
  * semantics: query after '?', path-params after ';' in the last segment,
  * parse_qs drops blank values and counts DISTINCT keys); everything else
  * is codegen'd Column expressions. At 10^12 rows the UDF is the promotion
  * candidate to a native Expression (SURVEY.md §2.9).
  */
object ContentFeatures {

  /** The reference's ad-keyword list (content.py:21-23 — the IDENTICAL
    * list appears at utils.py:30-32 for the ascendant feature; one shared
    * constant here serves both sites). The reference matches each entry
    * with `re.finditer(key, url, re.I)`, i.e. AS A REGEX: "pb.min"'s dot
    * is a wildcard ("pb8min" matches). */
  val keywordRaw = Seq("ad", "ads", "advert", "popup", "banner",
    "sponsor", "iframe", "googlead", "adsys", "adser", "advertise",
    "redirect", "popunder", "punder", "popout", "click", "track", "play",
    "pop", "prebid", "bid", "pb.min", "affiliate", "ban", "delivery",
    "promo", "tag", "zoneid", "siteid", "pageid", "size", "viewid",
    "zone_id", "google_afc", "google_afs")
  private val keywordPatterns = keywordRaw.map(k =>
    java.util.regex.Pattern.compile(k, java.util.regex.Pattern.CASE_INSENSITIVE))
  private val keywordChar = Set('.', '/', '&', '=', ';', '-', '_', '*', '^',
    '?', '|', ',')
  private val screenRes = Seq("screenheight", "screenwidth", "browserheight",
    "browserwidth", "screendensity", "screen_res", "screen_param",
    "screenresolution", "browsertimeoffset")

  /** (query, params) of a URL with python-urlparse semantics. */
  def urlQueryParams(url: String): (String, String) = {
    if (url == null) return ("", "")
    val noFrag = { val i = url.indexOf('#'); if (i >= 0) url.substring(0, i) else url }
    val qi = noFrag.indexOf('?')
    val (beforeQ, query) =
      if (qi >= 0) (noFrag.substring(0, qi), noFrag.substring(qi + 1))
      else (noFrag, "")
    // path params: after ';' in the LAST path segment only (urlparse)
    val schemeEnd = beforeQ.indexOf("://")
    val pathStart =
      if (schemeEnd >= 0) {
        val slash = beforeQ.indexOf('/', schemeEnd + 3)
        if (slash >= 0) slash else beforeQ.length
      } else 0
    val path = beforeQ.substring(pathStart)
    val lastSeg = path.substring(path.lastIndexOf('/') + 1)
    val si = lastSeg.indexOf(';')
    val params = if (si >= 0) lastSeg.substring(si + 1) else ""
    (query, params)
  }

  /** parse_qs: distinct keys with non-empty values. */
  def qsKeys(qs: String): Seq[String] =
    if (qs == null || qs.isEmpty) Seq.empty
    else qs.split("[&;]").toSeq
      .map { kv => val i = kv.indexOf('='); if (i >= 0) (kv.substring(0, i), kv.substring(i + 1)) else (kv, "") }
      .filter(_._2.nonEmpty)
      .map(_._1).distinct

  /** keyword_raw_present / keyword_char_present (content.py:77-89): any ad
    * keyword occurrence; char flag if any occurrence is preceded by a
    * delimiter character. */
  def keywordFlags(url: String): (Int, Int) = {
    if (url == null) return (0, 0)
    var raw = 0; var chr = 0
    val it = keywordPatterns.iterator
    while (chr == 0 && it.hasNext) {
      // regex semantics (re.finditer, non-overlapping, case-insensitive) —
      // "pb.min"'s '.' is a wildcard, exactly as the reference matches
      val m = it.next().matcher(url)
      while (chr == 0 && m.find()) {
        raw = 1
        val from = m.start()
        // python url[m-1]: index -1 wraps to the LAST char (parity quirk)
        val prev = if (from == 0) url.charAt(url.length - 1) else url.charAt(from - 1)
        if (keywordChar.contains(prev)) chr = 1
      }
    }
    (raw, chr)
  }

  private val urlFeatNames = Seq("is_valid_qs", "num_url_queries",
    "num_url_params", "num_id_in_query_field", "num_id_in_param_field",
    "base_domain_in_query", "semicolon_in_query", "semicolon_in_params",
    "screen_size_present", "ad_size_present", "ad_size_in_qs_present",
    "keyword_raw_present", "keyword_char_present")

  private val adSize = "\\d{2,4}[xX]\\d{2,4}".r

  /** The 13 URL features as a fixed Array[Int] (position = urlFeatNames
    * index) — the row-hot kernel behind [[graft.ext.UrlFeatsExpression]]
    * (native codegen'd Expression; the former UDF path is gone — a UDF
    * pays ScalaUDF invocation + converter cost per row, ROUND_NOTES r2 #3). */
  def urlFeats(url: String, domain: String): Array[Int] = {
    val (query, params) = urlQueryParams(url)
    val qk = qsKeys(query); val pk = qsKeys(params)
    val (kraw, kchar) = keywordFlags(url)
    val dom = if (domain == null) "" else domain
    val ql = query.toLowerCase; val pl = params.toLowerCase
    Array(
      1, // is_valid_qs
      qk.size,
      pk.size,
      qk.count(_.contains("id")),
      pk.count(_.contains("id")),
      if (dom.nonEmpty && query.contains(dom)) 1 else 0,
      if (query.contains(";")) 1 else 0,
      if (params.contains(";")) 1 else 0,
      if (screenRes.exists(k => ql.contains(k) || pl.contains(k))) 1 else 0,
      if (url != null && adSize.findFirstIn(url).isDefined) 1 else 0,
      if (adSize.findFirstIn(query).isDefined) 1 else 0,
      kraw,
      kchar)
  }

  /** F16: fixed label encoding (sklearn LabelEncoder = alphabetical). */
  def typeCode(typ: Column): Column =
    when(typ === "Document", 0).when(typ === "Element", 1)
      .when(typ === "Request", 2).when(typ === "Script", 3)
      .when(typ === "Storage", 4).otherwise(-1)

  /** F17: OpenWPM resource-type dictionary
    * (/root/reference/code/classification/classify.py:18-60) — the 19
    * content_policy_type strings → their enumeration index, so the RF sees
    * the feature as numeric (the reference remaps in classify.py:394-397;
    * round 1 left it a string and the classifier silently dropped it).
    * Unknown/absent types → −1. */
  private val cptTypes = Seq("beacon", "csp_report", "font", "image",
    "imageset", "main_frame", "media", "object", "object_subrequest", "ping",
    "script", "stylesheet", "sub_frame", "web_manifest", "websocket",
    "xml_dtd", "xmlhttprequest", "xslt", "other")

  def cptCode(cpt: Column): Column =
    coalesce(element_at(typedLit(cptTypes.zipWithIndex.toMap), cpt), lit(-1))

  /** Per-node content features over the consolidated node table
    * (visit_id, name, type, attr, domain, top_level_domain). */
  def content(nodes: DataFrame): DataFrame = {
    val head = Seq(
      col("visit_id"), col("name"),
      typeCode(col("type")).as("node_type"),
      call_function("json_get", col("attr"), lit("content_policy_type"))
        .as("content_policy_type"),
      cptCode(call_function("json_get", col("attr"),
        lit("content_policy_type"))).as("cpt_code"),
      length(col("name")).as("url_length"),
      when(col("domain").isNotNull && col("top_level_domain").isNotNull &&
        col("domain") === col("top_level_domain"), 1).otherwise(0)
        .as("is_subdomain"),
      // content.py:51: `len(base_domain) > 0 and base_domain !=
      // top_level_domain` — a NaN top_level_domain compares UNEQUAL to a
      // real domain, so null TLD with a non-null domain IS third-party
      // (null-safe inequality); null domain stays 0
      when(col("domain").isNotNull && length(col("domain")) > 0 &&
        !(col("domain") <=> col("top_level_domain")), 1).otherwise(0)
        .as("is_third_party"))
    val urlCols = urlFeatNames.zipWithIndex.map { case (nm, i) =>
      element_at(col("uf"), i + 1).as(nm)
    }
    // native expression (graft.ext.UrlFeatsExpression) via the session
    // function registry — SparkSessionExtensions is the sanctioned way to
    // plan a custom Expression. Empty string and null produce identical
    // features, so coalesce keeps the nullSafe codegen path.
    graft.ext.GraftExtensions.register(nodes.sparkSession)
    nodes
      .withColumn("uf", expr("url_feats(coalesce(name, ''), coalesce(domain, ''))"))
      .select(head ++ urlCols: _*)
  }
}
