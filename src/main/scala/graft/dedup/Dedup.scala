package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for the training-data pipeline tier:
  * exact (fingerprint groupBy), exact n-gram Jaccard (shingle join),
  * MinHash + banded LSH, SimHash + pigeonhole blocking.
  *
  * Everything is declarative DataFrame ops — shuffles are per-stage
  * groupBy/join on compact keys, all codegen'd built-ins (no UDF in a hot
  * path). Scale shape (100 TB corpus):
  *   shingle/signature build — narrow map;
  *   LSH bucket grouping     — one shuffle on (band, bucket-hash), bucket
  *                             sizes bounded by banding so no quadratic blow-up;
  *   verify                  — join only candidate pairs back to features.
  * The all-pairs exact path ([[jaccardPairs]]) is the small-scale oracle and
  * the verifier primitive, NOT the scale path — [[minHashLsh]] is.
  */
object Dedup {

  /** Distinct word n-gram shingles from a PRE-SPLIT token-array column.
    * The token array must be materialized as its own projected column
    * (see [[shingled]]): referencing `split(text)` directly inside the
    * transform lambda embeds it once per element_at, so the full-text
    * regex split re-evaluates O(n · positions) times per document —
    * JFR-profiled as the dominant CPU of the d2/d3 shingle builds. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    array_distinct(
      when(cnt > 0,
        transform(sequence(lit(0), cnt - 1),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
        .otherwise(array()))
  }

  /** Single-Column shingle form (tests / non-hot callers). Dataflows use
    * [[shingled]], which binds the token split once per row. */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(split(text, " "), n)

  /** (id, shingle-array) with the tokenize bound ONCE per row behind a
    * projection boundary (CollapseProject keeps multi-referenced non-cheap
    * aliases materialized, so the lambda's element_ats read the row value). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), n).as("shs"))

  /** (id, shingle) exploded table — the join-shaped shingle view.
    * explode_OUTER + isNotNull, not plain explode: InferFiltersFromGenerate
    * turns `explode(shs)` into a `size(shs) > 0` filter that PushDownPredicates
    * substitutes through the defining projections — the full shingle
    * expression (splits included) then re-evaluates per row in the Filter
    * AND in the parquet scan's DataFilters. The outer variant infers
    * nothing; the cheap isNotNull on the GENERATED column drops the same
    * empty-array rows and cannot be pushed below the Generate. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingled(docs, idCol, textCol, n)
      .select(col("id"), explode_outer(col("shs")).as("sh"))
      .where(col("sh").isNotNull)

  /** Exact pairwise Jaccard ≥ minJ via PREFIX FILTERING (the AllPairs/PPJoin
    * candidate bound: Bayardo et al. WWW'07, Xiao et al. WWW'08 — public
    * algorithms): order shingles globally by (document frequency, shingle)
    * ascending and keep only each doc's first `|d| − ⌈minJ·|d|⌉ + 1`
    * shingles for candidate generation. Any pair with J ≥ minJ must share a
    * prefix shingle (if not, all shared shingles fit in suffixes of length
    * ⌈minJ·|d|⌉ − 1 < the required overlap), so recall is GUARANTEED — and
    * corpus-frequent hub shingles sort last, so they almost never enter a
    * prefix: the d² blow-up of a naive shingle self-join on hub shingles
    * (the 100 TB scale-killer) is structurally gone. Candidates are then
    * verified exactly with array_intersect on the full shingle sets.
    * Output: (a_id, b_id, inter, uni, jaccard ≥ minJ) — identical to the
    * naive exact join. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minJ: Double = 0.8): DataFrame = {
    val withSh = shingled(docs, idCol, textCol, n)
    // candidate generation runs entirely on 64-bit shingle HASHES (narrow
    // shuffle keys); a hash collision can only ADD a candidate, and the
    // exact array_intersect verify below removes it — exactness holds
    // explode_outer + isNotNull for the same InferFiltersFromGenerate
    // reason as shingleTable (plain explode re-evaluates the shingle
    // build in a pushed-down size() filter)
    val sh = withSh.select(col("id"),
      explode_outer(col("shs")).as("s0"))
      .where(col("s0").isNotNull)
      .select(col("id"), xxhash64(col("s0")).as("sh"))
      .distinct() // keep SET semantics if two shingles of one doc collide
    val dfc = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfc, Seq("sh"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("sh").asc)))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("id"))))
    // df=1 prefix shingles can't produce a candidate — drop before the join
    val prefix = ranked
      .where(col("df") > 1 && col("rn") <= col("sz") - ceil(col("sz") * minJ) + 1)
      .select(col("id"), col("sh"))
    val cands = prefix.select(col("sh"), col("id").as("a_id"))
      .join(prefix.select(col("sh"), col("id").as("b_id")), Seq("sh"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cands
      .join(withSh.select(col("id").as("a_id"), col("shs").as("sha")), Seq("a_id"))
      .join(withSh.select(col("id").as("b_id"), col("shs").as("shb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("uni",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .where(col("jaccard") >= minJ)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** MinHash signatures: k independent permutations simulated by
    * xxhash64(i, shingle); one explode + one groupBy with k algebraic mins
    * (map-side partial agg keeps hub shingles cheap).
    * Output: (id, h0..h{k-1}). */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 128): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH candidate pairs from minhash signatures: b bands of r rows;
    * docs agreeing on any whole band collide. One explode to (id, band,
    * bandHash), one self-join per bucket. Bucket sizes are the skew risk at
    * corpus scale — countBucket caps runaway buckets (hash of a universal
    * shingle) by dropping buckets above `maxBucket`. */
  def lshCandidates(sigs: DataFrame, bands: Int, rows: Int,
                    maxBucket: Int = 1000): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rows).map(r => col(s"h${b * rows + r}")): _*).as("bh"))
    }
    val buckets = sigs
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val sized = buckets.groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > 1 && col("bsz") <= maxBucket)
    val inB = buckets.join(sized, Seq("band", "bh"), "left_semi")
    inB.select(col("band"), col("bh"), col("id").as("a_id"))
      .join(inB.select(col("band"), col("bh"), col("id").as("b_id")),
        Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification of candidates only.
    * Output: (a_id, b_id) with true Jaccard ≥ minJ. */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 128, bands: Int = 32,
                 minJ: Double = 0.8): DataFrame = {
    val rows = k / bands
    val cands = lshCandidates(
      minHashSignatures(docs, idCol, textCol, n, k), bands, rows)
    val withSh = shingled(docs, idCol, textCol, n)
    cands
      .join(withSh.select(col("id").as("a_id"), col("shs").as("sha")), Seq("a_id"))
      .join(withSh.select(col("id").as("b_id"), col("shs").as("shb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .where(col("inter").cast("double") / col("uni").cast("double") >= minJ)
      .select("a_id", "b_id")
  }

  /** Default SimHash token hash: xxhash64 — the fast codegen'd production
    * path (one hash instruction per token, no string materialization). */
  def xxTokenHash(t: Column): Column = xxhash64(t)

  /** MD5-derived 64-bit token hash: the first 16 hex chars of md5(t) as a
    * two's-complement BIGINT (hi<<32 | lo). Slower than [[xxTokenHash]] but
    * computable bit-for-bit by any engine with md5 — it is what makes the
    * d4 SimHash oracle fully DuckDB-mirrorable (no Spark-only hash, no
    * sidecar files crossing the engine boundary). */
  def md5TokenHash(t: Column): Column =
    shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** 64-bit SimHash over whitespace tokens (term-frequency weighted):
    * per token t, h = tokenHash(t); bit i votes +1 if set else −1; result bit
    * i is 1 iff the vote sum is positive. Shaped as explode(tokens) ×
    * explode(bits 0..63) → two grouped sums — pure codegen'd aggregation. */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
              tokenHash: Column => Column = xxTokenHash): DataFrame = {
    // explode_outer + isNotNull: see shingleTable — plain explode makes
    // InferFiltersFromGenerate re-evaluate the split in a pushed filter
    val toks = docs.select(col(idCol).as("id"),
      explode_outer(split(col(textCol), " ")).as("t"))
      .where(col("t").isNotNull)
      .select(col("id"), tokenHash(col("t")).as("h"))
    val votes = toks
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(63))).as("bit"))
      .groupBy(col("id"), col("bit"))
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1L, 1L)
        .otherwise(-1L)).as("v"))
    votes.groupBy(col("id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, bit)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxHam, blocked by the
    * pigeonhole principle: split 64 bits into `blocks` equal chunks — any
    * pair within distance < blocks must agree on ≥1 chunk, so candidate
    * generation is an equi-join on (chunkIdx, chunkValue), never all-pairs.
    * Requires maxHam < blocks for guaranteed recall. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHam: Int = 6, blocks: Int = 8,
                   tokenHash: Column => Column = xxTokenHash): DataFrame = {
    require(maxHam < blocks, "pigeonhole recall needs maxHam < blocks")
    val width = 64 / blocks
    val sh = simHash(docs, idCol, textCol, tokenHash)
    val chunkCols = (0 until blocks).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("cv"))
    }
    val chunks = sh.select(col("id"), col("simhash"),
      explode(array(chunkCols: _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunks.select(col("ci"), col("cv"), col("id").as("a_id"), col("simhash").as("ha"))
      .join(chunks.select(col("ci"), col("cv"), col("id").as("b_id"),
        col("simhash").as("hb")), Seq("ci", "cv"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("ham"))
      .distinct()
      .where(col("ham") <= maxHam)
  }
}
