package graft.features

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Indirect" shared-information edges (reference:
  * /root/reference/code/features/utils.py:395-500 — SURVEY.md §2.3 J7-J10):
  * scripts linked through shared storage, not direct calls.
  *
  *  - set_get (J7): setter → getter of the same storage key; edge-table
  *    self-join on the key — the canonical 2-hop join. Hot cookies are the
  *    skew risk at scale (SURVEY §4.2): the join key is the storage key, so
  *    AQE skew-split applies; counts are algebraic.
  *  - set_modify (J8): FIRST setter (earliest timestamp) → every later
  *    setter of the same key; window rank split, then equi join.
  *  - set_url (J9): cookie-value-in-URL theta join — distinct cookie values
  *    (len > 3 prefilter, utils.py:295) broadcast against Request/Script/
  *    Document URL nodes; predicate = raw | split-part | base64 | md5 |
  *    sha1 containment.
  *  - get_url (J10): request 2-hop (dst=src self-join) where the first
  *    hop's Cookie header values appear in the second hop's URL.
  *
  * Determinism fix vs the reference: set_url's source is "the first row
  * with that value" (pandas iloc[0], input-order-dependent) — we take the
  * MIN(src) setter (documented, stable under any partitioning).
  */
object IndirectEdges {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def hex(d: Array[Byte]): String =
    d.map("%02x".format(_)).mkString
  private def md5hex(s: String): String =
    hex(MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8)))
  private def sha1hex(s: String): String =
    hex(MessageDigest.getInstance("SHA-1").digest(s.getBytes(StandardCharsets.UTF_8)))

  private val partialSplit =
    "[.;\\]!@#$%^&*()\\-_+~`{}\\[\\\\|:\"'<>,?/]+"

  /** value-in-url predicate family (utils.py:283-368). Reference kernel —
    * the joins plan [[valueProbes]] + `contains_any` instead (probe
    * derivation hoisted out of the pair loop); IndirectEdgesSpec pins the
    * two paths equal. */
  def cookieValueInUrl(value: String, dest: String): Boolean = {
    if (value == null || dest == null) return false
    val full = value.length > 3 && dest.contains(value)
    lazy val partial = value.split(partialSplit)
      .exists(p => p.length > 3 && dest.contains(p))
    lazy val b = value.length > 3 && dest.contains(b64(value))
    lazy val m = value.length > 3 && dest.contains(md5hex(value))
    lazy val s = value.length > 3 && dest.contains(sha1hex(value))
    full || partial || b || m || s
  }

  private val headerPairRe =
    "\\[\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*\\]".r

  /** Cookie-header values (list tail after first '=') in url
    * (utils.py:370-392). Reference kernel for [[headerProbes]] parity. */
  def cookiePresence(reqattrJson: String, dest: String): Boolean = {
    if (reqattrJson == null || dest == null) return false
    headerPairRe.findAllMatchIn(reqattrJson).exists { mm =>
      mm.group(1).contains("Cookie") && {
        val hv = mm.group(2).replace("\\\"", "\"")
        hv.split(";").exists { pair =>
          // values = segments after the first '=' (the reference keeps the
          // LIST of segments and tests each, utils.py:380)
          val segs = pair.trim.split("=").drop(1)
          segs.exists(v => cookieValueInUrl(v, dest))
        }
      }
    }
  }

  /** Probe strings whose existential substring match reproduces
    * [[cookieValueInUrl]]: the value itself + its b64/md5/sha1 digests
    * (len > 3 gate) and the len > 3 delimiter-split parts. Computing these
    * ONCE per value moves the digest work out of the J9/J10 theta joins —
    * O(values) instead of O(values × urls) digests at corpus scale. */
  def valueProbes(value: String): Array[String] = {
    if (value == null) return Array.empty
    val out = new java.util.LinkedHashSet[String]
    if (value.length > 3) {
      out.add(value); out.add(b64(value))
      out.add(md5hex(value)); out.add(sha1hex(value))
    }
    value.split(partialSplit).foreach(p => if (p.length > 3) out.add(p))
    out.toArray(Array.empty[String])
  }

  /** Union of [[valueProbes]] over every Cookie-header value segment of a
    * request-headers JSON payload — `probes.exists(dest.contains)` ≡
    * [[cookiePresence]](reqattr, dest). */
  def headerProbes(reqattrJson: String): Array[String] = {
    if (reqattrJson == null) return Array.empty
    val out = new java.util.LinkedHashSet[String]
    headerPairRe.findAllMatchIn(reqattrJson).foreach { mm =>
      if (mm.group(1).contains("Cookie")) {
        val hv = mm.group(2).replace("\\\"", "\"")
        hv.split(";").foreach { pair =>
          pair.trim.split("=").drop(1)
            .foreach(v => valueProbes(v).foreach(out.add))
        }
      }
    }
    out.toArray(Array.empty[String])
  }

  private val setActions = Seq("set", "set_js", "set_storage_js")
  private val getActions = Seq("get", "get_js", "get_storage_js")

  /** All four indirect-edge families, unioned:
    * (visit_id, src, dst, attr = multiplicity, type).
    *
    * @param urlTargets optional (visit_id, url) table of set_url match
    *   targets — the reference scans node-table names of type
    *   Request/Script/Document (utils.py:444-448); [[FeatureExtraction]]
    *   passes them. When absent (edge-only callers, the if1/if2 oracle
    *   queries) targets fall back to distinct reqattr-bearing edge dsts. */
  def build(edges: DataFrame,
            urlTargets: Option[DataFrame] = None): DataFrame = {
    graft.ext.GraftExtensions.register(edges.sparkSession)
    val sets = edges.where(col("action").isin(setActions: _*))
      .select(col("visit_id"), col("src"), col("dst"), col("attr"),
        col("time_stamp"))
    val gets = edges.where(col("action").isin(getActions: _*))
      .select(col("visit_id"), col("src"), col("dst"))

    // J7 set → get. The reference dedups pairs AFTER the merge
    // (utils.py:420 drop_duplicates); within one (visit, key) cell the pair
    // set is the cross product of the distinct setter and getter srcs, so
    // distinct-after-join ≡ distinct-each-side-then-join — and the join
    // cost drops from |set rows| × |get rows| per cell (quadratic in raw
    // event multiplicity — the sf1 soak measured exactly that blowup) to
    // |distinct setters| × |distinct getters|.
    val setGet = sets.select(col("visit_id"), col("src").as("s_src"), col("dst"))
      .distinct()
      .join(gets.select(col("visit_id"), col("src").as("g_src"), col("dst"))
        .distinct(),
        Seq("visit_id", "dst"))
      .groupBy(col("visit_id"), col("s_src").as("src"), col("g_src").as("dst"))
      .agg(count(lit(1)).as("attr"))
      .withColumn("type", lit("set_get"))

    // J8 set → modify: earliest setter per key vs the rest
    val allSets = edges.where(col("action").isin(
        (setActions :+ "remove_storage_js"): _*))
      .select(col("visit_id"), col("src"), col("dst"), col("time_stamp"))
    val w = Window.partitionBy(col("visit_id"), col("dst"))
      .orderBy(col("time_stamp").asc, col("src").asc)
    val ranked = allSets.withColumn("rn", row_number().over(w))
    val firstSet = ranked.where(col("rn") === 1)
      .select(col("visit_id"), col("src").as("f_src"), col("dst"))
    // later-setter side deduped BEFORE the join (same argument as set_get:
    // firstSet is exactly one row per (visit, key), so pair-distinct ≡
    // side-distinct) — the join is |distinct later setters| per key, not
    // |later set rows|
    val laterSets = ranked.where(col("rn") > 1)
      .select(col("visit_id"), col("src").as("l_src"), col("dst"))
      .distinct()
    // reference quirk (utils.py:81-105 + 433): find_modified_storage
    // groups per (src, dst) INSIDE each storage-key group and the per-key
    // frames are concatenated WITHOUT re-grouping — so the output is one
    // row PER SHARED KEY with attr = 1, not one grouped row per pair
    // (unlike set_get, whose groupby runs across keys)
    val setModify = firstSet.join(laterSets, Seq("visit_id", "dst"))
      .select(col("visit_id"), col("f_src").as("src"), col("l_src").as("dst"),
        lit(1L).as("attr"))
      .withColumn("type", lit("set_modify"))

    // J9 set → URL: distinct cookie values × URL-ish nodes; probe strings
    // (value + digests + splits) derived ONCE per value, join predicate is
    // a bare codegen'd contains_any — no per-pair digest work
    val cookieSets = edges.where(col("action").isin("set", "set_js"))
      .select(col("visit_id"), col("src"),
        call_function("json_get", col("attr"), lit("value")).as("cv"))
      .where(col("cv").isNotNull && length(col("cv")) > 3)
    val valueSrc = cookieSets.groupBy(col("visit_id"), col("cv"))
      .agg(min(col("src")).as("src")) // deterministic "first" setter
      .withColumn("probes", call_function("cookie_value_probes", col("cv")))
    setGet.unionByName(setModify)
      .unionByName(setUrl(edges, valueSrc, urlTargets))
      .unionByName(getUrl(edges))
  }

  private def setUrl(edges: DataFrame, valueSrc: DataFrame,
                     urlTargets: Option[DataFrame]): DataFrame = {
    // URL-node side: the reference's Request/Script/Document node names
    // when the caller supplies them; otherwise distinct reqattr-bearing
    // edge dsts (the edge-only approximation the oracle queries mirror)
    val targets = urlTargets.getOrElse(edges
        .where(col("reqattr").isNotNull && col("reqattr") =!= "CS" &&
          col("reqattr") =!= "N/A")
        .select(col("visit_id"), col("dst").as("url")))
      .select(col("visit_id"), col("url")).distinct()
    // Broadcast the SMALL side: distinct len>3 cookie values + their probes
    // (reference design note SURVEY §2.3 J9). `targets` is every distinct
    // HTTP URL — the corpus-scale fact side — and must stream, never
    // broadcast.
    broadcast(valueSrc).join(targets, Seq("visit_id"))
      .where(call_function("contains_any", col("url"), col("probes")))
      .select(col("visit_id"), col("src"), col("url").as("dst"))
      .groupBy(col("visit_id"), col("src"), col("dst"))
      .agg(count(lit(1)).as("attr"))
      .withColumn("type", lit("set_url"))
  }

  /** A8 ×8: per-node in/out counts over each indirect-edge family
    * (the reference's indirect-type count features,
    * /root/reference/code/features/dataflow.py:148-155) — one pivot-style
    * aggregation per direction over the unioned indirect edges.
    *
    * Reference semantics: the indirect table has one ROW per
    * (src, dst, type) with attr = multiplicity (utils.py:424,466,484), and
    * the features are `len(rows)` — distinct-partner counts, NOT weight
    * sums. Names follow features.yaml (num_set_get_src … num_get_url_dst;
    * type set_modify shortens to set_mod). Takes the BUILT indirect table
    * so callers share one build with [[weights]] / composed metrics. */
  def counts(ind: DataFrame): DataFrame = {
    val types = Seq("set_get" -> "set_get", "set_modify" -> "set_mod",
      "set_url" -> "set_url", "get_url" -> "get_url")
    def aggs(dir0: String) = types.map { case (t, short) =>
      sum(when(col("type") === t, 1L).otherwise(0L))
        .as(s"num_${short}_$dir0")
    }
    val oa = aggs("src"); val ia = aggs("dst")
    val outC = ind.groupBy(col("visit_id"), col("src").as("name"))
      .agg(oa.head, oa.tail: _*)
    val inC = ind.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(ia.head, ia.tail: _*)
    outC.join(inC, Seq("visit_id", "name"), "full_outer").na.fill(0L)
  }

  /** Indirect edge-weight stats per node (dataflow.py:169-180): mean/min/
    * max over the attr multiplicities of in- and out-edges across ALL four
    * families. Only nodes with edges in that direction get values; the
    * caller fills the reference's −1 default. */
  def weights(ind: DataFrame): DataFrame = {
    val outW = ind.groupBy(col("visit_id"), col("src").as("name"))
      .agg(avg(col("attr")).as("indirect_mean_out_weights"),
        min(col("attr")).as("indirect_min_out_weights"),
        max(col("attr")).as("indirect_max_out_weights"))
    val inW = ind.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(avg(col("attr")).as("indirect_mean_in_weights"),
        min(col("attr")).as("indirect_min_in_weights"),
        max(col("attr")).as("indirect_max_in_weights"))
    inW.join(outW, Seq("visit_id", "name"), "full_outer")
  }

  private def getUrl(edges: DataFrame): DataFrame = {
    // pandas filter parity (utils.py:471): NaN != 'CS' is True, so rows
    // with null reqattr/src/action stay ELIGIBLE (second hops are often
    // storage/html edges whose reqattr is null) — null-safe inequality,
    // not =!= (which drops nulls)
    val http = edges.where(!(col("reqattr") <=> "CS") &&
      !(col("src") <=> "N/A") && !(col("action") <=> "CS"))
    // The reference counts RAW pair multiplicity (utils.py:484 groupby size
    // over every matched merge row — no dedup), so the sides cannot simply
    // be distinct'd. Instead each side pre-aggregates to its distinct
    // predicate-relevant combination with a multiplicity, the join runs on
    // the (small) combination space, and attr = Σ nx·ny reproduces the raw
    // pair count exactly. The sf1 soak measured the raw-pair variant at
    // |hop1 rows| × |hop2 rows| per (visit, mid) cell — quadratic in event
    // multiplicity; this shape is quadratic only in DISTINCT combinations.
    // Probe extraction (header JSON parse + digests) also drops from
    // once-per-row to once-per-distinct-reqattr-group.
    val hop1 = http.where(col("reqattr").isNotNull)
      .groupBy(col("visit_id"), col("src").as("src_x"), col("dst").as("mid"),
        col("reqattr"))
      .agg(count(lit(1)).as("nx"))
      .withColumn("probes", call_function("cookie_header_probes", col("reqattr")))
      .where(size(col("probes")) > 0)
      .drop("reqattr")
    val hop2 = http
      .groupBy(col("visit_id"), col("src").as("mid"), col("dst").as("dst_y"))
      .agg(count(lit(1)).as("ny"))
    hop1.join(hop2, Seq("visit_id", "mid"))
      .where(call_function("contains_any", col("dst_y"), col("probes")))
      .groupBy(col("visit_id"), col("src_x").as("src"), col("dst_y").as("dst"))
      .agg(sum(col("nx") * col("ny")).as("attr"))
      .withColumn("type", lit("get_url"))
  }
}
