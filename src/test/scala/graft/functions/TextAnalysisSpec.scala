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

  test("PII redaction replaces emails and phones with typed placeholders") {
    def redact(t: String): String =
      one(t).select(TextAnalysis.redactPii(col("text"))).as[String].head()
    assert(redact("mail Jane.Doe+spam@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("call 555-867-5309 today") == "call <PHONE> today")
    assert(redact("a@b.co and c_d%e@f-g.museum; 111-222-3333.") ==
      "<EMAIL> and <EMAIL>; <PHONE>.")
    // clean text is untouched; redaction is idempotent
    assert(redact("no pii here") == "no pii here")
    assert(redact(redact("x y@z.io 999-888-7777")) == "x <EMAIL> <PHONE>")
  }

  test("PII counts match the spans redacted") {
    val df = one("a@b.co c@d.io 123-456-7890")
    assert(df.select(TextAnalysis.emailCount(col("text"))).as[Int].head() == 2)
    assert(df.select(TextAnalysis.phoneCount(col("text"))).as[Int].head() == 1)
    val clean = one("nothing sensitive")
    assert(clean.select(TextAnalysis.emailCount(col("text"))).as[Int].head() == 0)
    assert(clean.select(TextAnalysis.phoneCount(col("text"))).as[Int].head() == 0)
  }
}
