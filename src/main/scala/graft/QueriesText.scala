package graft

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.ann.Similarity
import graft.dedup.Dedup
import graft.multimodal.Assets
import graft.text.TextStats

/** Training-data pipeline operators: text analysis, deduplication,
  * similarity search, multimodal plumbing — each over the driver's
  * `documents` / `embeddings` tables with a DuckDB oracle where the
  * computation is SQL-expressible (approximate operators are oracled
  * against their exact ground truth when the data's similarity gap makes
  * recall certain; see individual notes). */
object QueriesText {

  // SQL helper: marker-hit count for a language profile.
  private def hitsSql(words: Seq[String]): String =
    s"length(list_filter(string_split(text, ' '), x -> list_contains([${
      words.map(w => s"'$w'").mkString(",")}], x)))"

  private val Seq(deW, enW, esW, frW) = TextStats.markers.map(_._2)

  /** DuckDB mirror of [[graft.ann.Similarity.ivfKnnLattice]]: the `iters`
    * Lloyd iterations unroll as chained CTEs (assign_k → cent_{k+1});
    * everything up to the final cosine re-score is exact integer
    * arithmetic (BIGINT sums, truncating `//` division — Java `/` parity
    * verified), so the inverted file matches the engine bit-for-bit. */
  private def ivfLatticeSql(nList: Int, nProbe: Int, iters: Int,
                            k: Int): String = {
    val steps = (0 until iters).map { i =>
      s"""assign$i AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT d.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
         |        ORDER BY SUM(d.x * c.cj) DESC, c.cell ASC) AS rn
         |    FROM qd d JOIN cent$i c ON c.j = d.j
         |    GROUP BY d.vec_id, c.cell)
         |  WHERE rn = 1),
         |cent${i + 1} AS (
         |  SELECT p.cell, p.j, COALESCE(CAST(u.s AS BIGINT) // u.n, p.cj) AS cj
         |  FROM cent$i p LEFT JOIN (
         |    SELECT a.cell, d.j, SUM(d.x) AS s, COUNT(*) AS n
         |    FROM assign$i a JOIN qd d ON d.vec_id = a.vec_id
         |    GROUP BY a.cell, d.j) u
         |  ON u.cell = p.cell AND u.j = p.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH qd AS (
       |  SELECT vec_id, e.j AS j, e.x AS x FROM (
       |    SELECT vec_id, unnest([{'j': i - 1,
       |        'x': CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576.0)
       |                  AS BIGINT)}
       |      for i in generate_series(1, len(embedding))]) AS e
       |    FROM embeddings)),
       |seeds AS (
       |  SELECT vec_id, rn - 1 AS cell FROM (
       |    SELECT vec_id, ROW_NUMBER() OVER
       |      (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |    FROM embeddings)
       |  WHERE rn <= $nList),
       |cent0 AS (
       |  SELECT s.cell, d.j, d.x AS cj FROM seeds s
       |  JOIN qd d ON d.vec_id = s.vec_id),
       |$steps,
       |assignF AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT d.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY SUM(d.x * c.cj) DESC, c.cell ASC) AS rn
       |    FROM qd d JOIN cent$iters c ON c.j = d.j
       |    GROUP BY d.vec_id, c.cell)
       |  WHERE rn = 1),
       |pcells AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT d.vec_id, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY SUM(d.x * c.cj) DESC, c.cell ASC) AS rn
       |    FROM qd d JOIN cent$iters c ON c.j = d.j
       |    WHERE d.vec_id < 10
       |    GROUP BY d.vec_id, c.cell)
       |  WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM pcells p JOIN assignF a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id)
       |SELECT query_id, rnk, neighbor_id FROM (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY cand.query_id
       |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                 CAST(c.embedding AS DOUBLE[])) DESC,
       |               cand.neighbor_id ASC) AS rnk
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
       |            JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |WHERE rnk <= $k""".stripMargin
  }

  /** Shared shingle/Jaccard SQL (word 3-grams, join-blocked pairs). */
  private val jaccardSqlBody =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s AS sh FROM (
      |       SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                              for i in generate_series(1, len(w) - 2)]) AS s
      |       FROM toks)),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |          GROUP BY a.doc_id, b.doc_id)""".stripMargin

  val reg: Seq[Entry] = Seq(

    // T1: token statistics per language label — whitespace tokens + BPE-ish
    // subword pre-tokenization counts.
    ("t1_token_stats", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents")
        .select(col("lang"), TextStats.tokenCount(col("text")).as("nt"),
          TextStats.bpeishCount(col("text")).as("nb"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_tokens"),
          sum(col("nb")).as("sum_bpeish"),
          min(col("nt")).as("min_tokens"),
          max(col("nt")).as("max_tokens"))
    }, Some(
      s"""SELECT lang, COUNT(*) AS n_docs,
        |  ${QueryUtil.isumSql("length(string_split(text, ' '))")} AS sum_tokens,
        |  ${QueryUtil.isumSql("length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))")} AS sum_bpeish,
        |  MIN(length(string_split(text, ' '))) AS min_tokens,
        |  MAX(length(string_split(text, ' '))) AS max_tokens
        |FROM documents GROUP BY lang""".stripMargin)),

    // T2: per-document quality signals (Gopher/C4-style heuristics): token
    // count, mean token length, stopword ratio, punctuation density, and a
    // composite score — one codegen'd projection, no UDFs.
    ("t2_quality", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents").select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        TextStats.meanTokenLen(col("text")).as("mean_tok_len"),
        TextStats.wordRatio(col("text"), TextStats.markers.toMap.apply("en")).as("stop_ratio"),
        TextStats.nonAlphaRatio(col("text")).as("non_alpha_ratio"),
        TextStats.qualityScore(col("text")).as("quality"))
    }, Some {
      val n = "CAST(length(string_split(text, ' ')) AS DOUBLE)"
      val stop = s"CAST(${hitsSql(enW)} AS DOUBLE) / $n"
      val punct = "CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)"
      s"""SELECT doc_id,
         |  length(string_split(text, ' ')) AS n_tokens,
         |  CAST(length(text) - length(string_split(text, ' ')) + 1 AS DOUBLE)
         |    / $n AS mean_tok_len,
         |  $stop AS stop_ratio,
         |  $punct AS non_alpha_ratio,
         |  (LEAST($n / 64.0, 1.0) + LEAST(($stop) * 8.0, 1.0)
         |   + (1.0 - LEAST(($punct) * 4.0, 1.0))) / 3.0 AS quality
         |FROM documents""".stripMargin
    }),

    // T3: heuristic language ID (CJK share → zh; else stopword-profile
    // argmax with deterministic tie order; no hits → und), aggregated.
    ("t3_langid", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents")
        .select(TextStats.langId(col("text")).as("lang_detected"))
        .groupBy(col("lang_detected")).agg(count(lit(1)).as("n"))
    }, Some {
      val Seq(de, en, es, fr) = Seq(deW, enW, esW, frW).map(hitsSql)
      s"""SELECT CASE
         |  WHEN CAST(length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS DOUBLE)
         |       / CAST(length(text) AS DOUBLE) > 0.3 THEN 'zh'
         |  WHEN $de + $en + $es + $fr = 0 THEN 'und'
         |  WHEN $de >= $en AND $de >= $es AND $de >= $fr THEN 'de'
         |  WHEN $en >= $es AND $en >= $fr THEN 'en'
         |  WHEN $es >= $fr THEN 'es'
         |  ELSE 'fr' END AS lang_detected, COUNT(*) AS n
         |FROM documents GROUP BY 1""".stripMargin
    }),

    // T4: normalized-content fingerprinting per source (document-level
    // exact-dedup cardinality).
    ("t4_fingerprint", (s: SparkSession, dir: String) => {
      implicit val sp = s
      t(dir, "documents")
        .groupBy(col("source"))
        .agg(countDistinct(TextStats.fingerprintMd5(col("text"))).as("n_unique"),
          count(lit(1)).as("n_docs"))
    }, Some(
      """SELECT source,
        |  COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY source""".stripMargin)),

    // D1: exact/near-exact duplicate grouping by content fingerprint —
    // prefix fingerprinting, the cheap first pass before MinHash.
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
        |GROUP BY fp HAVING COUNT(*) > 1""".stripMargin)),

    // D2: exact n-gram Jaccard near-dup pairs via shingle-join blocking
    // (only overlapping pairs materialize — never the n² cross product).
    ("d2_jaccard_pairs", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Dedup.jaccardPairs(t(dir, "documents"), "doc_id", "text", n = 3, minJ = 0.8)
    }, Some(
      s"""WITH $jaccardSqlBody
         |SELECT i.a_id, i.b_id, i.inter, sa.sz + sb.sz - i.inter AS uni,
         |  CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
         |FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id
         |             JOIN sizes sb ON i.b_id = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.8""".stripMargin)),

    // D3: MinHash (k=128) + banded LSH (32×4) + exact verification.
    // Oracle = the exact-Jaccard pair set: every true pair here has j ≥ 0.9
    // (the corpus has a clean [0.15, 0.9] similarity gap), where the banding
    // miss probability is (1−0.9⁴)³² ≈ 1.5e-15 — recall is certain, and the
    // verify step makes precision exact.
    ("d3_minhash_lsh", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Dedup.minHashLsh(t(dir, "documents"), "doc_id", "text",
        n = 3, k = 128, bands = 32, minJ = 0.8)
    }, Some(
      s"""WITH $jaccardSqlBody
         |SELECT i.a_id, i.b_id
         |FROM inter i JOIN sizes sa ON i.a_id = sa.doc_id
         |             JOIN sizes sb ON i.b_id = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.8""".stripMargin)),

    // D4: SimHash near-dup pairs, FULLY oracled (round-4 close of the last
    // avoidable no_oracle row): the token hash here is the md5-derived
    // 64-bit variant both engines compute bit-identically, so DuckDB can
    // mirror the complete signature build (per-bit ±1 votes → sign → 64-bit
    // sig). Spark runs the pigeonhole-blocked candidate join (the scale
    // shape — never all-pairs); the oracle brute-forces bit_count(xor)≤6
    // over the same signatures, which is the identical pair set because
    // maxHam < blocks guarantees blocking recall. The xxhash64 production
    // path keeps its DedupSpec recall/ground-truth pins.
    ("d4_simhash_pairs", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Dedup.simHashPairs(t(dir, "documents"), "doc_id", "text",
        maxHam = 6, blocks = 8, tokenHash = Dedup.md5TokenHash)
        .select(col("a_id"), col("b_id"))
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS h
        |  FROM (SELECT doc_id,
        |          CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT) AS hi,
        |          CAST(('0x' || substring(md5(t), 9, 8)) AS BIGINT) AS lo
        |        FROM toks)),
        |votes AS (
        |  SELECT doc_id, bit,
        |    SUM(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
        |  GROUP BY doc_id, bit),
        |sig AS (
        |  SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN
        |      CASE WHEN bit = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << bit) END ELSE 0 END) AS BIGINT) AS sig
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 6""".stripMargin)),

    // D5: embedding-cosine near-dup pairs (brute force — the oracle tier;
    // threshold 0.40 sits 1.3e-4 away from the nearest similarity, so
    // engine double-rounding can't flip membership).
    ("d5_embed_pairs", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Similarity.cosinePairs(t(dir, "embeddings"), "vec_id", "embedding", 0.40)
    }, Some(
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])) >= 0.40""".stripMargin)),

    // E1: exact top-5 cosine neighbors for 10 probe vectors (brute force;
    // ties broken by id — the minimum 5th↔6th sim gap is 1.9e-5, far above
    // double noise, so rank order is engine-stable).
    ("e1_knn_bruteforce", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val emb = t(dir, "embeddings")
      Similarity.bruteForceKnn(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .withColumnRenamed("rank", "rnk")
    }, Some(
      """SELECT query_id, rnk, neighbor_id FROM (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
        |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rnk
        |  FROM embeddings p JOIN embeddings c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 10)
        |WHERE rnk <= 5""".stripMargin)),

    // E2: LSH-bucketed approximate KNN (the scale path: bucket join instead
    // of probes × corpus), FULLY oracled (round-4 close, the d4 move): the
    // oracle tier uses the engine-portable quantized plane family
    // (Similarity.rhpSignatureQuant — md5-derived 24-bit integer planes ×
    // round(v·2²⁰) values → the bucketing sign is an EXACT BIGINT sum both
    // engines compute identically under any summation order), so DuckDB
    // mirrors the complete pipeline: signatures → 1-bit multi-probe bucket
    // join → exact cosine re-score → top-5. Final ordering rides the same
    // verified sim-gap as e1 (min adjacent gap ≫ double noise). The
    // xxhash64 production family keeps its AnnSpec recall pins.
    ("e2_knn_lsh", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val emb = t(dir, "embeddings")
      Similarity.lshKnn(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nBits = 8, probeBits = 1,
          signature = Similarity.rhpSignatureQuant)
        .withColumnRenamed("rank", "rnk")
    }, Some(
      """WITH dims AS (
        |  SELECT vec_id, unnest([{'j': i - 1, 'v': CAST(embedding[i] AS DOUBLE)}
        |                         for i in generate_series(1, len(embedding))]) AS e
        |  FROM embeddings),
        |qd AS (SELECT vec_id, e.j AS j,
        |         CAST(round(e.v * 1048576.0) AS BIGINT) AS q FROM dims),
        |proj AS (
        |  SELECT vec_id, bit,
        |    CAST(SUM(q * (CAST(('0x' || substring(md5(bit || '_' || j), 1, 6))
        |                       AS BIGINT) - 8388608)) AS BIGINT) AS p
        |  FROM qd CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bit)
        |  GROUP BY vec_id, bit),
        |sig AS (
        |  SELECT vec_id, CAST(SUM(CASE WHEN p > 0 THEN (1::BIGINT << bit)
        |                           ELSE 0 END) AS BIGINT) AS sig
        |  FROM proj GROUP BY vec_id),
        |probes AS (
        |  SELECT s.vec_id AS query_id, xor(s.sig, f.flip) AS sig
        |  FROM sig s CROSS JOIN
        |    (SELECT unnest([0,1,2,4,8,16,32,64,128]) AS flip) f
        |  WHERE s.vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
        |  FROM probes p JOIN sig c ON c.sig = p.sig
        |  WHERE c.vec_id <> p.query_id)
        |SELECT query_id, rnk, neighbor_id FROM (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY cand.query_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                 CAST(c.embedding AS DOUBLE[])) DESC,
        |               cand.neighbor_id ASC) AS rnk
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
        |            JOIN embeddings c ON c.vec_id = cand.neighbor_id)
        |WHERE rnk <= 5""".stripMargin)),

    // E3: IVF (inverted-file) approximate KNN — the coarse-quantizer scale
    // path (cells built once, queries probe nProbe cells), FULLY oracled
    // (round-4 close): the oracle tier is the integer-lattice IVF
    // (Similarity.ivfKnnLattice — plain-dot k-means on round(v·2²⁰)
    // vectors, md5-ordered seeds, BIGINT Lloyd sums, truncating `//`
    // centroid means), so every seed, assignment, centroid and probe-cell
    // choice is exact integer arithmetic both engines reproduce under any
    // execution order; DuckDB unrolls the 5 Lloyd iterations as chained
    // CTEs. Only the final re-score cosine is float (the e1-verified
    // sim-gap). The spherical float production path (ivfKnn) keeps its
    // AnnSpec recall/determinism pins.
    ("e3_knn_ivf", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val emb = t(dir, "embeddings")
      Similarity.ivfKnnLattice(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, nList = 16, nProbe = 4, iters = 5)
        .withColumnRenamed("rank", "rnk")
    }, Some(ivfLatticeSql(nList = 16, nProbe = 4, iters = 5, k = 5))),

    // DF1: the fused per-node dataflow-feature layer (SURVEY §2.4 A8) over
    // an events-derived storage/http edge table both engines can build —
    // checks the conditional-sum fusion and the redirect-depth plumbing
    // (bipartite u→k edges ⇒ depths ∈ {0,1}).
    ("df1_dataflow_features", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val edges = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("u"), col("user_id")).as("src"),
        concat(lit("k"), QueryUtil.jsonGet(col("props"), "k")).as("dst"),
        when(col("event_type") === "click", "get_js")
          .when(col("event_type") === "signup", "set_js")
          .when(col("event_type") === "purchase", "set_storage_js")
          .when(col("event_type") === "view", "get_storage_js")
          .otherwise("set").as("action"),
        when(col("event_type") === "error", """[["Accept","*"]]""")
          .otherwise("N/A").as("reqattr"),
        when(col("value") > 15.0, "301").otherwise("200")
          .as("response_status"))
      graft.features.DataflowFeatures.dataflow(edges)
    }, Some(
      """WITH edges AS (SELECT user_id % 10 AS visit_id,
        |    'u' || user_id AS src,
        |    'k' || json_extract_string(props, '$.k') AS dst,
        |    CASE event_type WHEN 'click' THEN 'get_js' WHEN 'signup' THEN 'set_js'
        |      WHEN 'purchase' THEN 'set_storage_js' WHEN 'view' THEN 'get_storage_js'
        |      ELSE 'set' END AS action,
        |    CASE WHEN event_type = 'error' THEN '[["Accept","*"]]' ELSE 'N/A' END AS reqattr,
        |    CASE WHEN value > 15.0 THEN '301' ELSE '200' END AS response_status
        |  FROM events),
        |s AS (SELECT visit_id, src AS name,
        |    SUM(CASE WHEN action IN ('get','get_js') THEN 1 ELSE 0 END) AS num_get_cookie,
        |    SUM(CASE WHEN action IN ('set','set_js') THEN 1 ELSE 0 END) AS num_set_cookie,
        |    SUM(CASE WHEN action = 'get_storage_js' THEN 1 ELSE 0 END) AS g_ls,
        |    SUM(CASE WHEN action = 'set_storage_js' THEN 1 ELSE 0 END) AS s_ls,
        |    SUM(CASE WHEN TRY_CAST(response_status AS INT) IN (300,301,302,303,307,308) THEN 1 ELSE 0 END) AS num_redirects_sent,
        |    SUM(CASE WHEN reqattr IS NOT NULL AND reqattr NOT IN ('CS','N/A') THEN 1 ELSE 0 END) AS num_requests_sent
        |  FROM edges GROUP BY visit_id, src),
        |d AS (SELECT visit_id, dst AS name,
        |    SUM(CASE WHEN TRY_CAST(response_status AS INT) IN (300,301,302,303,307,308) THEN 1 ELSE 0 END) AS num_redirects_rec,
        |    SUM(CASE WHEN reqattr IS NOT NULL AND reqattr NOT IN ('CS','N/A') THEN 1 ELSE 0 END) AS num_requests_received
        |  FROM edges GROUP BY visit_id, dst),
        |redverts AS (SELECT DISTINCT visit_id, name FROM (
        |    SELECT visit_id, src AS name FROM edges WHERE TRY_CAST(response_status AS INT) IN (300,301,302,303,307,308)
        |    UNION ALL
        |    SELECT visit_id, dst FROM edges WHERE TRY_CAST(response_status AS INT) IN (300,301,302,303,307,308))),
        |dep AS (SELECT rv.visit_id, rv.name,
        |    CASE WHEN EXISTS (SELECT 1 FROM edges e WHERE e.visit_id = rv.visit_id
        |      AND e.dst = rv.name AND TRY_CAST(e.response_status AS INT) IN (300,301,302,303,307,308))
        |    THEN 1 ELSE 0 END AS max_depth_redirect
        |  FROM redverts rv)
        |SELECT COALESCE(s.visit_id, d.visit_id) AS visit_id,
        |  COALESCE(s.name, d.name) AS name,
        |  CAST(COALESCE(num_get_cookie, 0) AS BIGINT) AS num_get_cookie,
        |  CAST(COALESCE(num_set_cookie, 0) AS BIGINT) AS num_set_cookie,
        |  CAST(COALESCE(num_redirects_sent, 0) AS BIGINT) AS num_redirects_sent,
        |  CAST(COALESCE(num_requests_sent, 0) AS BIGINT) AS num_requests_sent,
        |  CAST(COALESCE(num_redirects_rec, 0) AS BIGINT) AS num_redirects_rec,
        |  CAST(COALESCE(num_requests_received, 0) AS BIGINT) AS num_requests_received,
        |  COALESCE(dep.max_depth_redirect, 0) AS max_depth_redirect,
        |  CAST(COALESCE(num_get_cookie, 0) + COALESCE(g_ls, 0) AS BIGINT) AS num_get_storage,
        |  CAST(COALESCE(num_set_cookie, 0) + COALESCE(s_ls, 0) AS BIGINT) AS num_set_storage
        |FROM s FULL OUTER JOIN d ON s.visit_id = d.visit_id AND s.name = d.name
        |LEFT JOIN dep ON dep.visit_id = COALESCE(s.visit_id, d.visit_id)
        |  AND dep.name = COALESCE(s.name, d.name)""".stripMargin)),

    // M1: multimodal metadata decode — synthetic binary assets (REAL
    // PPM/BMP/WAV containers + the GRFT video stub), partition-parallel
    // mapPartitions decode, aggregated per kind. FULLY oracled (round-4
    // close of the LAST rows-only registry row): the generator's SHAPE
    // parameters ride the engine-portable md5Shape hash, so DuckDB
    // recomputes the expected aggregates directly from the generation law
    // over generate_series — an INDEPENDENT formula-level check of the
    // whole encode→decode round trip (header sizes, row padding, PCM
    // frame math). Payload bytes stay SplitMix (oracle-invisible);
    // the default-generator goldens stay pinned in MultimodalSpec.
    ("m1_asset_meta", (s: SparkSession, dir: String) => {
      implicit val sp = s
      Assets.decodeMeta(Assets.generate(s, n = 300,
          shapeHash = Assets.md5Shape))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), max(col("width")).as("max_width"),
          max(col("frames")).as("max_frames"),
          sum(col("byte_len")).as("total_bytes"))
    }, Some(
      """WITH ii AS (SELECT unnest(generate_series(0, 299)) AS i),
        |hk AS (
        |  SELECT i, k,
        |    (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
        |      * 4294967296 + lo AS hv
        |  FROM (
        |    SELECT ii.i, kk.k,
        |      CAST(('0x' || substring(md5('42_' || ii.i || '_' || kk.k), 1, 8))
        |           AS BIGINT) AS hi,
        |      CAST(('0x' || substring(md5('42_' || ii.i || '_' || kk.k), 9, 8))
        |           AS BIGINT) AS lo
        |    FROM ii CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,8]) AS k) kk)),
        |hp AS (
        |  SELECT i,
        |    MAX(CASE WHEN k = 0 THEN hv END) AS h0,
        |    MAX(CASE WHEN k = 1 THEN hv END) AS h1,
        |    MAX(CASE WHEN k = 2 THEN hv END) AS h2,
        |    MAX(CASE WHEN k = 3 THEN hv END) AS h3,
        |    MAX(CASE WHEN k = 4 THEN hv END) AS h4,
        |    MAX(CASE WHEN k = 5 THEN hv END) AS h5,
        |    MAX(CASE WHEN k = 6 THEN hv END) AS h6,
        |    MAX(CASE WHEN k = 8 THEN hv END) AS h8
        |  FROM hk GROUP BY i),
        |params AS (
        |  SELECT i,
        |    ((h0 % 3) + 3) % 3 AS t,
        |    4 + (((h1 % 8) + 8) % 8) * 4 AS w,
        |    3 + ((h2 % 10) + 10) % 10 AS ht,
        |    1 + ((h3 % 2) + 2) % 2 AS ch,
        |    100 + ((h4 % 900) + 900) % 900 AS fra,
        |    8 + ((h5 % 24) + 24) % 24 AS fr,
        |    64 + ((h6 % 192) + 192) % 192 AS bodylen,
        |    ((h8 % 2) + 2) % 2 AS isppm
        |  FROM hp),
        |assets AS (
        |  SELECT i,
        |    CASE t WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |           ELSE 'video' END AS kind,
        |    CASE WHEN t = 0 THEN w WHEN t = 1 THEN 8000 ELSE 64 END AS width,
        |    CASE WHEN t = 0 THEN 1 WHEN t = 1 THEN fra ELSE fr END AS frames,
        |    CASE WHEN t = 0 AND isppm = 0
        |           THEN 9 + length(CAST(w AS VARCHAR))
        |                + length(CAST(ht AS VARCHAR)) + w * ht * 3
        |         WHEN t = 0 THEN 54 + ((w * 3 + 3) // 4 * 4) * ht
        |         WHEN t = 1 THEN 44 + 2 * fra * ch
        |         ELSE 16 + bodylen END AS byte_len
        |  FROM params)
        |SELECT kind, COUNT(*) AS n,
        |  CAST(MAX(width) AS INT) AS max_width,
        |  CAST(MAX(frames) AS INT) AS max_frames,
        |  CAST(SUM(byte_len) AS BIGINT) AS total_bytes
        |FROM assets GROUP BY kind""".stripMargin))
  )
}
