package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Dedup-operator semantics on hand-built corpora: exact Jaccard math,
  * MinHash-LSH recall/precision vs brute force, SimHash hamming behavior. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def wordShingles(t: String, n: Int): Set[String] = {
    val w = t.split(" ")
    if (w.length < n) Set.empty
    else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
  }

  private def jac(a: String, b: String, n: Int): Double = {
    val (sa, sb) = (wordShingles(a, n), wordShingles(b, n))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
  private val unrelated = "completely different words about spark catalyst optimizer plans and shuffles everywhere"

  test("jaccardPairs matches hand-computed jaccard and finds only true pairs") {
    val texts: Map[Long, String] = Map(1L -> base, 2L -> nearDup,
      3L -> unrelated, 4L -> (base + " extra tail words here"), 5L -> "tiny doc")
    val d = docs(texts.toSeq.sortBy(_._1): _*)
    val got = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, minJ = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    val expected = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
      j = jac(texts(a), texts(b), 3) if j >= 0.5
    } yield (a, b) -> j).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-12) }
  }

  test("minHashLsh finds exactly the >=minJ pairs on a clean-gap corpus") {
    // 40 docs: 10 near-dup pairs (j >= 0.85) + 20 unrelated docs (j < 0.2)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho",
      "sigma", "tau", "ups")
    def doc(seed: Int): String =
      (0 until 40).map(i => words(math.abs(graft.core.Hashing.h(seed, i).toInt) % words.length)).mkString(" ")
    val pairs = (0 until 10).flatMap { k =>
      val t = doc(k)
      // mutate one word near the end -> very high jaccard
      val mut = { val w = t.split(" "); w(37) = "changed"; w.mkString(" ") }
      Seq((2L * k, t), (2L * k + 1, mut))
    }
    val noise = (0 until 20).map(k => (100L + k, doc(1000 + k * 7)))
    val d = (pairs ++ noise).toDF("doc_id", "text")
    val texts = (pairs ++ noise).toMap
    val truth = (for {
      a <- texts.keys; b <- texts.keys if a < b
      if jac(texts(a), texts(b), 3) >= 0.6
    } yield (a, b)).toSet
    assert(truth.size >= 10) // the built pairs really are near-dups
    val got = Dedup.minHashLsh(d, "doc_id", "text", n = 3, k = 128,
      bands = 32, minJ = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth)
  }

  test("simHashPairs: near-dups within hamming radius, unrelated far") {
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated))
    val sh = Dedup.simHash(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) <= 10)
    assert(ham(sh(1L), sh(3L)) > 10)
    val pairs = Dedup.simHashPairs(d, "doc_id", "text", maxHam = 10, blocks = 16)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("md5TokenHash: engine-portable 64-bit token hash matches JDK MD5, " +
    "and the md5-variant pigeonhole pairs equal brute-force hamming pairs") {
    import org.apache.spark.sql.functions.col
    // bit-for-bit parity with the definition both engines implement:
    // first 8 bytes of md5(token), big-endian, two's complement
    val toks = Seq("hello", "a", "", "café", "x=1; y").toDF("t")
    val got = toks.select(Dedup.md5TokenHash(col("t")).as("h"), col("t"))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    for ((t, h) <- got) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val expect = java.nio.ByteBuffer.wrap(md, 0, 8).getLong
      assert(h === expect, s"token '$t'")
    }
    // the d4-oracle equivalence argument, pinned locally: with maxHam <
    // blocks the pigeonhole-blocked join returns EXACTLY the ≤maxHam pairs
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated),
      (4L, base + " tail"), (5L, unrelated + " x"))
    val sigs = Dedup.simHash(d, "doc_id", "text", Dedup.md5TokenHash)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 10
    } yield (a, b)).toSet
    val blocked = Dedup.simHashPairs(d, "doc_id", "text", maxHam = 10,
        blocks = 16, tokenHash = Dedup.md5TokenHash)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
  }

  test("simHash is deterministic across partitionings") {
    val d1 = docs((1L, base), (2L, nearDup), (3L, unrelated)).repartition(1)
    val d8 = docs((1L, base), (2L, nearDup), (3L, unrelated)).repartition(8)
    val h1 = Dedup.simHash(d1, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h8 = Dedup.simHash(d8, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === h8)
  }
}
