package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("token counts: whitespace (keeps empties, oracle-consistent) and regex") {
    val df = one("ab cd  ef")
    assert(df.select(TextAnalysis.tokenCountWhitespace(col("text"))).as[Int].head() == 4)
    assert(df.select(TextAnalysis.tokenCountRegex(col("text"))).as[Int].head() == 3)
    assert(df.select(TextAnalysis.nWords(col("text"))).as[Int].head() == 3)
  }

  test("language ID heuristic picks stopword language") {
    val cases = Seq(
      "over the lazy dog" -> "en",
      "sur le pont" -> "fr",
      "los datos grandes" -> "es",
      "xyz qqq" -> "unk")
    cases.foreach { case (t, want) =>
      assert(one(t).select(TextAnalysis.langIdHeuristic(col("text"))).as[String].head() == want,
        s"for '$t'")
    }
  }

  test("avg word length and density") {
    val df = one("ab cdef") // 6 letters, 2 words, len 7
    assert(df.select(TextAnalysis.avgWordLen(col("text"))).as[Double].head() == 3.0)
    val density = df.select(TextAnalysis.densityScore(col("text"))).as[Double].head()
    assert(math.abs(density - 0.8571) < 1e-9)
  }

  test("rolling-hash fingerprint matches reference implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
    val texts = Seq("hello world", "", "a", "the quick brown fox")
    val got = texts.map(t =>
      one(t).select(TextAnalysis.fingerprint(col("text"))).as[Long].head())
    assert(got == texts.map(ref))
  }

  test("fingerprint is order-sensitive (permuted words differ)") {
    val a = one("alpha beta").select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    val b = one("beta alpha").select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    assert(a != b)
  }
}
