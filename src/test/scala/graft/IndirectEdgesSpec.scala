package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.features.IndirectEdges

/** J7-J10 shared-information edges on a hand-built storage/http edge table:
  * set→get pairing, first-setter→modifier split, cookie-value-in-URL theta
  * (raw/split/b64/md5 variants), Cookie-header 2-hop presence. */
class IndirectEdgesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val md5abcd1234 = "e19d5cd5af0378da05f63f891c7467af" // md5("abcd1234")

  private def edgeRows = Seq(
    // (visit, src, dst, action, attr, reqattr, time_stamp)
    (1L, "http://s1.x/a.js", "ck|$$|x", "set_js", """{"value":"abcd1234"}""", "N/A", "t1"),
    (1L, "http://s2.x/b.js", "ck|$$|x", "set_js", """{"value":"zzzz9999"}""", "N/A", "t2"),
    (1L, "http://s3.x/c.js", "ck|$$|x", "get_js", null, "N/A", "t3"),
    (1L, "http://s1.x/a.js", "ls|$$|x|$$|LS", "set_storage_js", """{"value":"vv"}""", "N/A", "t4"),
    // http chain: page -> tracker (carries Cookie header) -> beacon url
    // containing the cookie value
    (1L, "http://page.x/", "http://t.x/sync", "N/A",
      null, """[["Cookie","uid=abcd1234"]]""", "t5"),
    (1L, "http://t.x/sync", "http://b.x/p?uid=abcd1234", "N/A",
      null, """[["Accept","*"]]""", "t6"),
    // a request whose URL embeds md5 of the cookie value (set_url catch)
    (1L, "http://page.x/", s"http://cdn.x/img/$md5abcd1234.gif", "N/A",
      null, """[["Accept","*"]]""", "t7")
  ).toDF("visit_id", "src", "dst", "action", "attr", "reqattr", "time_stamp")

  private lazy val out = IndirectEdges.build(edgeRows)
    .collect()
    .groupBy(_.getAs[String]("type"))

  test("set_get links every setter to every getter of the key") {
    val sg = out("set_get").map(r =>
      (r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[Long]("attr"))).toSet
    assert(sg === Set(
      ("http://s1.x/a.js", "http://s3.x/c.js", 1L),
      ("http://s2.x/b.js", "http://s3.x/c.js", 1L)))
  }

  test("set_modify links the earliest setter to later setters only") {
    val sm = out("set_modify").map(r =>
      (r.getAs[String]("src"), r.getAs[String]("dst"))).toSet
    assert(sm === Set(("http://s1.x/a.js", "http://s2.x/b.js")))
  }

  test("set_url finds raw and md5-hashed cookie values in request URLs") {
    val su = out("set_url").map(r =>
      (r.getAs[String]("src"), r.getAs[String]("dst"))).toSet
    assert(su.contains(("http://s1.x/a.js", "http://b.x/p?uid=abcd1234")))
    assert(su.contains(("http://s1.x/a.js", s"http://cdn.x/img/$md5abcd1234.gif")))
    assert(!su.exists(_._1 == "http://s2.x/b.js")) // zzzz9999 appears nowhere
  }

  test("get_url follows the 2-hop request chain via Cookie header values") {
    val gu = out("get_url").map(r =>
      (r.getAs[String]("src"), r.getAs[String]("dst"))).toSet
    assert(gu === Set(("http://page.x/", "http://b.x/p?uid=abcd1234")))
  }

  test("counts are distinct-partner ROW counts; weights are attr stats") {
    // P sets k1,k2; Q gets both; R gets k1 → set_get P→Q (attr 2), P→R (1)
    val rows = Seq(
      (1L, "P", "k1", "set", null, "N/A", "t1"),
      (1L, "P", "k2", "set", null, "N/A", "t2"),
      (1L, "Q", "k1", "get", null, "N/A", "t3"),
      (1L, "Q", "k2", "get", null, "N/A", "t4"),
      (1L, "R", "k1", "get", null, "N/A", "t5")
    ).toDF("visit_id", "src", "dst", "action", "attr", "reqattr", "time_stamp")
    val ind = IndirectEdges.build(rows)
    val c = IndirectEdges.counts(ind).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    // reference len(rows), NOT sum(attr): P has 2 set_get rows (to Q and R)
    assert(c("P").getAs[Long]("num_set_get_src") === 2L)
    assert(c("Q").getAs[Long]("num_set_get_dst") === 1L)
    assert(c("R").getAs[Long]("num_set_get_dst") === 1L)
    assert(c("P").getAs[Long]("num_set_mod_src") === 0L)
    val w = IndirectEdges.weights(ind).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(w("P").getAs[Double]("indirect_mean_out_weights") === 1.5)
    assert(w("P").getAs[Long]("indirect_min_out_weights") === 1L)
    assert(w("P").getAs[Long]("indirect_max_out_weights") === 2L)
    assert(w("Q").getAs[Long]("indirect_max_in_weights") === 2L)
    assert(w("R").getAs[Long]("indirect_max_in_weights") === 1L)
  }

  test("set_modify emits one row PER SHARED KEY with attr=1 (reference " +
    "per-key concat, utils.py:81-105)") {
    // P first-sets k1 and k2; Q later-sets both. find_modified_storage
    // groups inside each key group and the frames concatenate without
    // re-grouping: two (P,Q) rows with attr=1 — NOT one row with attr=2
    val rows = Seq(
      (1L, "P", "k1", "set", null, "N/A", "t1"),
      (1L, "P", "k2", "set", null, "N/A", "t2"),
      (1L, "Q", "k1", "set", null, "N/A", "t3"),
      (1L, "Q", "k2", "set", null, "N/A", "t4")
    ).toDF("visit_id", "src", "dst", "action", "attr", "reqattr", "time_stamp")
    val ind = IndirectEdges.build(rows)
    val sm = ind.where(col("type") === "set_modify").collect()
    assert(sm.length === 2)
    assert(sm.forall(r => r.getAs[String]("src") === "P" &&
      r.getAs[String]("dst") === "Q" && r.getAs[Long]("attr") === 1L))
    val c = IndirectEdges.counts(ind).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(c("P").getAs[Long]("num_set_mod_src") === 2L) // len(rows) = keys
    val w = IndirectEdges.weights(ind).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(w("P").getAs[Double]("indirect_mean_out_weights") === 1.0)
    assert(w("P").getAs[Long]("indirect_max_out_weights") === 1L)
  }

  test("get_url second hop stays eligible with null reqattr/action " +
    "(pandas NaN != 'CS' filter parity)") {
    val rows = Seq(
      (1L, "http://page.x/", "http://t.x/sync", "N/A", null,
        """[["Cookie","uid=abcd1234"]]""", "t1"),
      // second hop is a storage/html-style edge: null action AND reqattr —
      // pandas keeps it (NaN != 'CS'), null-unsafe =!= would drop it
      (1L, "http://t.x/sync", "http://b.x/p?uid=abcd1234", null, null,
        null, "t2")
    ).toDF("visit_id", "src", "dst", "action", "attr", "reqattr", "time_stamp")
    val gu = IndirectEdges.build(rows).where(col("type") === "get_url")
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst")))
    assert(gu.toSet === Set(("http://page.x/", "http://b.x/p?uid=abcd1234")))
  }

  test("set_url matches node-table targets when provided (Document URLs " +
    "with no reqattr edge, utils.py:444-448)") {
    val edges = Seq(
      (1L, "http://s1.x/a.js", "ck|$$|x", "set_js",
        """{"value":"abcd1234"}""", "N/A", "t1")
    ).toDF("visit_id", "src", "dst", "action", "attr", "reqattr", "time_stamp")
    // a Document node URL embedding the cookie value — never a dst of a
    // reqattr-bearing edge, so the edge-derived fallback cannot see it
    val targets = Seq((1L, "http://site.x/?sess=abcd1234"))
      .toDF("visit_id", "url")
    val withT = IndirectEdges.build(edges, Some(targets))
      .where(col("type") === "set_url").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")))
    assert(withT.toSet ===
      Set(("http://s1.x/a.js", "http://site.x/?sess=abcd1234")))
    val withoutT = IndirectEdges.build(edges)
      .where(col("type") === "set_url").count()
    assert(withoutT === 0L) // edge-derived fallback has no targets here
  }

  test("predicates: split-partial and length guard") {
    assert(IndirectEdges.cookieValueInUrl("ab.cdefgh", "http://x/?q=cdefgh"))
    assert(!IndirectEdges.cookieValueInUrl("ab", "http://x/?q=ab")) // len <= 3
    assert(IndirectEdges.cookiePresence(
      """[["Cookie","sid=longvalue123"]]""", "http://x/?v=longvalue123"))
    assert(!IndirectEdges.cookiePresence(
      """[["Accept","longvalue123"]]""", "http://x/?v=longvalue123"))
  }

  // deterministic probe corpus spanning every predicate branch: raw
  // containment, delimiter-split partials, b64/md5/sha1 digests, the
  // len<=3 gate, null/empty inputs, multi-pair cookie headers
  private def b64(s: String) = java.util.Base64.getEncoder
    .encodeToString(s.getBytes("UTF-8"))
  private def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def sha1(s: String) = java.security.MessageDigest.getInstance("SHA-1")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val probeValues: Seq[String] = Seq(
    "abcd1234", "ab", "abc", "abcd", "ab.cdefgh", "x-y_z!longpart",
    "a;b;c;d", "partone.parttwo", "sess=inner", "", "zzzz9999")
  private val probeDests: Seq[String] = probeValues.flatMap(v => Seq(
    s"http://x/?q=$v", s"http://x/?q=${b64(v)}", s"http://x/?q=${md5(v)}",
    s"http://x/?q=${sha1(v)}", s"http://x/p/${v.take(4)}",
    "http://x/plain", s"http://x/?q=cdefgh&r=longpart"))

  test("cookie_value_probes + contains_any ≡ cookieValueInUrl (hoisted " +
    "probe parity over the branch corpus)") {
    val pairs = for (v <- probeValues; d <- probeDests) yield (v, d)
    val df = pairs.toDF("cv", "url")
      .withColumn("fast", call_function("contains_any", col("url"),
        call_function("cookie_value_probes", col("cv"))))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getBoolean(2)).toMap
    for ((v, d) <- pairs)
      assert(got((v, d)) === IndirectEdges.cookieValueInUrl(v, d),
        s"parity broke for value=$v dest=$d")
    assert(pairs.count { case (v, d) => IndirectEdges.cookieValueInUrl(v, d) } > 20)
  }

  test("cookie_header_probes + contains_any ≡ cookiePresence") {
    val headers = Seq(
      """[["Cookie","uid=abcd1234"]]""",
      """[["Cookie","uid=abcd1234; sid=zzzz9999"]]""",
      """[["Cookie","short=ab"],["Accept","*"]]""",
      """[["Set-Cookie-Not","uid=abcd1234"]]""",
      """[["Cookie","noequals"]]""",
      """[["Cookie","k=ab.cdefgh"]]""",
      """[["Accept","*"]]""", "", "[]")
    val pairs = for (h <- headers; d <- probeDests) yield (h, d)
    val df = pairs.toDF("reqattr", "url")
      .withColumn("fast", call_function("contains_any", col("url"),
        call_function("cookie_header_probes", col("reqattr"))))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getBoolean(2)).toMap
    for ((h, d) <- pairs)
      assert(got((h, d)) === IndirectEdges.cookiePresence(h, d),
        s"parity broke for reqattr=$h dest=$d")
    assert(pairs.count { case (h, d) => IndirectEdges.cookiePresence(h, d) } > 5)
  }

  test("indirect-edge construction plans no ScalaUDF (probe expressions " +
    "native)") {
    // range-derived inputs: non-foldable, so nothing constant-folds away
    val edges = spark.range(20).select(
      lit(1L).as("visit_id"),
      concat(lit("http://s"), col("id") % 4, lit(".x/a.js")).as("src"),
      concat(lit("url|$$|k"), col("id") % 3).as("dst"),
      when(col("id") % 2 === 0, "set_js").otherwise("get_js").as("action"),
      concat(lit("""{"value":"val"""), col("id"), lit("\"}")).as("attr"),
      concat(lit("""[["Cookie","u=longvalue"""), col("id"), lit("\"]]"))
        .as("reqattr"),
      col("id").cast("string").as("time_stamp"))
    val plan = IndirectEdges.build(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "indirect build fell back to a UDF")
  }
}
