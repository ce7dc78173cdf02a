package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funspec.AnyFunSpec

/** Pins the round-18 TextHash kernels BIT-IDENTICAL to the original
  * Catalyst formulations they replace (the optimization contract:
  * change how, never what). Each case builds the ORIGINAL expression
  * tree inline — posexplode+window+lead, interpreted HOF shingles,
  * md5→substr→conv→cast — and compares against the kernel on the gate
  * corpus plus adversarial strings (empty, all-spaces, multi-space
  * runs, multi-byte UTF-8, fewer-than-k tokens).
  */
class TextHashSpec extends AnyFunSpec {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "one  two   three four",
    " leading and trailing ",
    "a b c d e f g h",
    "répé tée répé tée über schnee",
    "日本語 トークン 分割 テスト 行",
    "same same same same same",
    "x ​y z w",     // zero-width space inside a token (not 0x20)
    "tab\tis one token here"
  )

  private def corpus = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    docs.unionAll(adversarial.zipWithIndex
      .map { case (t, i) => (s"adv$i", t) }.toDF("id", "text"))
  }

  // the ORIGINAL interpreted-HOF tokenization (pre-round-19
  // Dedup.tokens), kept inline as the reference tree — Dedup.tokens
  // itself is the kernel now, so referencing it here would compare
  // the kernel against itself
  private def tokens = filter(split(col("text"), " "), t => length(t) > 0)

  describe("LangIdScored") {
    it("matches the split+distinct+array_intersect+greatest tree, ties included") {
      val rows = corpus.unionAll(Seq(
        "the le der el",            // 4-way tie at 1 → first declared (en)
        "le la the and",            // en/fr tie at 2 → en
        "der und le la les",        // fr 3 beats de 2
        "el los las y es una",      // es sweep; 'es' also a stopword of es
        "the the the the",          // distinct: score 1, not 4
        "les und is est une ist"    // fr 3 vs de 2 vs en 1
      ).zipWithIndex.map { case (t, i) => (s"lang$i", t) }.toDF("id", "text"))
      val want = rows.select(col("id"),
        graft.functions.TextAnalysis.langIdScoredExpr(col("text")).as("lang"))
      val got = rows.select(col("id"),
        TextHashCols.langIdScored(col("text"),
          graft.functions.TextAnalysis.stopwords).as("lang"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
    }
  }

  describe("ShingleXx64") {
    it("matches posexplode + window.lead + xxhash64 (k=3, with fallback)") {
      val k = 3
      val df = corpus
      // original shape (Dedup.shingleHashes pre-round-18)
      val long0 = df.filter(size(tokens) >= k)
        .select(col("id"), posexplode(tokens))
      val w = Window.partitionBy("id").orderBy("pos")
      val parts = col("col") +: (1 until k).map(j => lead(col("col"), j).over(w))
      val longH = long0
        .select(col("id"), xxhash64(parts: _*).as("h"), parts.last.isNotNull.as("full"))
        .filter(col("full")).drop("full")
      val shortH = df.filter(size(tokens) < k)
        .select(col("id"), xxhash64(concat_ws(" ", tokens)).as("h"))
      val want = longH.unionAll(shortH)
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      val got = df
        .select(col("id"), explode(TextHashCols.shingleXx64(col("text"), k, fallback = true)).as("h"))
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === df.filter(col("text").isNotNull).count())
    }

    it("k=1 matches per-token xxhash64 and its length matches size(tokens)") {
      val df = corpus
      val want = df.select(col("id"), explode(tokens).as("t"))
        .select(col("id"), xxhash64(col("t")).as("h"))
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      val got = df
        .select(col("id"), explode(TextHashCols.shingleXx64(col("text"), 1, fallback = false)).as("h"))
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      val lens = df.filter(col("text").isNotNull).select(
        ((size(TextHashCols.shingleXx64(col("text"), 1, fallback = false)) ===
          size(tokens)) &&
          (TextHashCols.tokenCount(col("text")) === size(tokens))).as("ok"))
      assert(lens.filter(!col("ok")).isEmpty)
    }

    it("matches the no-fallback span shape (k=5)") {
      val k = 5
      val df = corpus
      val long0 = df.filter(size(tokens) >= k)
        .select(col("id"), posexplode(tokens))
      val w = Window.partitionBy("id").orderBy("pos")
      val parts = col("col") +: (1 until k).map(j => lead(col("col"), j).over(w))
      val want = long0
        .select(col("id"), xxhash64(parts: _*).as("h"), parts.last.isNotNull.as("full"))
        .filter(col("full")).drop("full")
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      val got = df
        .select(col("id"), explode(TextHashCols.shingleXx64(col("text"), k, fallback = false)).as("h"))
        .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("ShingleMd5") {
    it("matches unhex(md5(concat_ws of window tokens)) (k=5)") {
      val k = 5
      val df = corpus
      val long0 = df.filter(size(tokens) >= k)
        .select(col("id"), posexplode(tokens))
      val w = Window.partitionBy("id").orderBy("pos")
      val parts = col("col") +: (1 until k).map(j => lead(col("col"), j).over(w))
      val want = long0
        .select(col("id"),
          unhex(md5(concat_ws(" ", parts: _*).cast("binary"))).as("hb"),
          parts.last.isNotNull.as("full"))
        .filter(col("full")).drop("full")
        .select(col("id"), lower(hex(col("hb"))).as("hx"))
        .groupBy("id").agg(sort_array(collect_list("hx")).as("hs"))
      val got = df
        .select(col("id"), explode(TextHashCols.shingleMd5(col("text"), k)).as("hb"))
        .select(col("id"), lower(hex(col("hb"))).as("hx"))
        .groupBy("id").agg(sort_array(collect_list("hx")).as("hs"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("MinhashSig") {
    it("matches the explode + double-md5 + 64 min-aggregates form") {
      val k = 3
      val numHashes = 64
      val M = 2305843009213693951L
      val df = corpus.filter(col("text").isNotNull)
      // original shape (Dedup.minhashSignatures pre-round-18)
      val sh = graft.functions.Dedup.shingles(col("text"), k)
      val base = df.select(col("id"), explode(sh).as("s"))
        .select(col("id"),
          expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("h1"),
          expr("CAST(conv(substr(md5(concat(s, '#')), 1, 14), 16, 10) AS BIGINT)").as("h2"))
      val mins = (0 until numHashes).map { i =>
        min((col("h1") + lit(i.toLong) * col("h2")) % lit(M)).as(s"m$i")
      }
      val want = base.groupBy(col("id"))
        .agg(mins.head, mins.tail: _*)
        .select(col("id"), array((0 until numHashes).map(h => col(s"m$h")): _*).as("sig"))
      val got = df.select(col("id"),
        TextHashCols.minhashSig(col("text"), k, numHashes).as("sig"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
    }
  }

  describe("SimhashSig") {
    it("matches the explode + md5-prefix + 60 vote-sum form") {
      val df = corpus.filter(col("text").isNotNull)
      val base = df.select(col("id"), explode(tokens).as("t"))
        .select(col("id"),
          expr("CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val sums = (0 until 60).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1)).as(s"s$i")
      }
      val bits = (0 until 60).map(i =>
        when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      val want = base.groupBy(col("id"))
        .agg(sums.head, sums.tail: _*)
        .select(col("id"), bits.reduce(_ + _).as("sh"))
      val got = df.select(col("id"), TextHashCols.simhashSig(col("text")).as("sh"))
        .filter(col("sh").isNotNull)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // zero-token docs: kernel says null, explode form emits nothing
      val nullIds = df.select(col("id"), TextHashCols.simhashSig(col("text")).as("sh"))
        .filter(col("sh").isNull).select("id")
      val missingIds = df.select("id").exceptAll(want.select("id"))
      assert(nullIds.exceptAll(missingIds).isEmpty && missingIds.exceptAll(nullIds).isEmpty)
    }
  }

  describe("DeletionVariantHashes") {
    it("matches explode(array_distinct deletion variants) + xxhash64(block..., v)") {
      val names = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(col("c_custkey").cast("long").as("blk"), col("c_name").as("nm"))
        .unionAll((adversarial :+ "ab" :+ "abc").zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("blk", "nm"))
      val want = names
        .select(col("blk"), col("nm"),
          explode(graft.operators.EditDistanceJoin.deletionVariants(col("nm"))).as("v"))
        .select(col("blk"), xxhash64(col("blk"), col("v")).as("bkey"))
        .groupBy("blk").agg(sort_array(collect_set("bkey")).as("ks"))
      val got = names
        .select(col("blk"),
          explode(TextHashCols.deletionVariantHashes(col("nm"), xxhash64(col("blk")))).as("bkey"))
        .groupBy("blk").agg(sort_array(collect_set("bkey")).as("ks"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // the kernel also matches the variant COUNT (distinct semantics)
      val wc = names.select(col("blk"),
        size(array_distinct(graft.operators.EditDistanceJoin.deletionVariants(col("nm")))).as("c"))
      val gc = names.select(col("blk"),
        size(TextHashCols.deletionVariantHashes(col("nm"), lit(42L))).as("c"))
      assert(gc.exceptAll(wc).isEmpty && wc.exceptAll(gc).isEmpty)
    }
  }

  describe("Md5Prefix") {
    it("matches conv(substr(md5, 1, n), 16, 10) cast long, n in {1, 14, 15}") {
      val df = corpus.filter(col("text").isNotNull)
      for (n <- Seq(1, 14, 15)) {
        val want = df.select(col("id"),
          conv(substring(md5(col("text").cast("binary")), 1, n), 16, 10)
            .cast("long").as("v"))
        val got = df.select(col("id"), TextHashCols.md5Prefix(col("text"), n).as("v"))
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"n=$n")
      }
    }
    it("tagged suffix matches md5(concat(s, '#'))") {
      val df = corpus.filter(col("text").isNotNull)
      val want = df.select(col("id"),
        expr("CAST(conv(substr(md5(concat(text, '#')), 1, 14), 16, 10) AS BIGINT)").as("v"))
      val got = df.select(col("id"),
        TextHashCols.md5PrefixTagged(col("text"), 14, '#').as("v"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("Tokens (round 19)") {
    it("matches filter(split(text, ' '), t -> length(t) > 0) element-for-element") {
      val df = corpus
      val want = df.select(col("id"), tokens.as("ts"))
      val got = df.select(col("id"), TextHashCols.tokens(col("text")).as("ts"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // null text → null array, exactly like the HOF form
      val nulls = Seq(("n1", null: String)).toDF("id", "text")
      assert(nulls.select(TextHashCols.tokens(col("text"))).head.isNullAt(0))
      assert(nulls.select(tokens).head.isNullAt(0))
    }
  }

  describe("TokenBigrams (round 19)") {
    it("matches posexplode + window.lead(1) adjacent string pairs") {
      val df = corpus
      val tok = df.select(col("id"), posexplode(tokens).as(Seq("pos", "t")))
      val w = Window.partitionBy("id").orderBy("pos")
      val want = tok
        .select(col("id"), col("t").as("t1"), lead(col("t"), 1).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .groupBy("id", "t1", "t2").agg(count(lit(1)).as("c"))
      val got = df
        .select(col("id"), explode(TextHashCols.tokenBigrams(col("text"))).as("bg"))
        .select(col("id"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
        .groupBy("id", "t1", "t2").agg(count(lit(1)).as("c"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("MinhashSig null-text semantics (ADVICE r18)") {
    it("null text signatures to null and minhashSignatures drops the row") {
      val df = Seq(("1", "a b c"), ("2", null: String)).toDF("id", "text")
      val sigs = df.select(col("id"),
        TextHashCols.minhashSig(col("text"), 3, 64).as("sig"))
      assert(sigs.filter(col("sig").isNull).select("id").head.getString(0) === "2")
      // the operator face filters the null sig (documented intent:
      // null text has no shingle set, so it joins NO near-dup pairs —
      // not a shared null-slice band bucket)
      val rows = graft.functions.Dedup.minhashSignatures(df, "id", "text")
      assert(rows.count() === 1L && rows.head.getString(0) === "1")
    }
  }
}
