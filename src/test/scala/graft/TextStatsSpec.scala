package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextStats

/** Text-analysis semantics on hand-written rows: token counts, quality
  * signals, language ID on real per-language samples, fingerprints. */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c).collect()(0).get(0)

  test("tokenCount / meanTokenLen / wordRatio") {
    assert(one("a bb ccc", TextStats.tokenCount(col("text"))) === 3)
    assert(one("a bb ccc", TextStats.meanTokenLen(col("text"))) === 2.0)
    assert(one("the cat and the dog", TextStats.wordRatio(col("text"),
      Seq("the", "and"))) === 0.6)
  }

  test("bpeishCount splits letter runs, digit runs, marks") {
    // "abc 123 x!y" -> abc, 123, x, !, y
    assert(one("abc 123 x!y", TextStats.bpeishCount(col("text"))) === 5)
  }

  test("nonAlphaRatio counts non-lowercase-alpha non-space chars") {
    assert(one("ab, C!", TextStats.nonAlphaRatio(col("text"))) === 3.0 / 6.0)
  }

  test("langId identifies real language samples and falls back cleanly") {
    val samples = Seq(
      "the cat sat on the mat and it was happy that day" -> "en",
      "der hund und die katze sind nicht mit dem ball" -> "de",
      "le chat est dans la maison et il dort pour une heure" -> "fr",
      "el perro es grande y los gatos son una familia por siempre" -> "es",
      "中文文本处理引擎测试" -> "zh",
      "zzz qqq vvv kkk" -> "und")
    samples.foreach { case (text, expect) =>
      assert(one(text, TextStats.langId(col("text"))) === expect, text)
    }
  }

  test("fingerprintMd5 normalizes whitespace and case") {
    val a = one("Hello   World", TextStats.fingerprintMd5(col("text")))
    val b = one("hello world", TextStats.fingerprintMd5(col("text")))
    val c = one("hello worlds", TextStats.fingerprintMd5(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("rollingFp is deterministic, normalization-invariant, collision-apart") {
    val a = one("Hello   World", TextStats.rollingFp(col("text")))
    val b = one("hello world", TextStats.rollingFp(col("text")))
    val c = one("hello worlds", TextStats.rollingFp(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("qualityScore orders trash below clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and it is a fine day for running in the park with friends " * 2
    val trash = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    val q = Seq(clean, trash).toDF("text")
      .select(TextStats.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(q(0) > 0.8)
    assert(q(1) < 0.35)
  }
}
