package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass, codegen-friendly text-hashing kernels (optimization
  * round 18, guide §1.2 step 2 "per-task work" + §4 "prefer codegen").
  *
  * Every function here computes values BIT-IDENTICAL to a pre-existing
  * Catalyst formulation (pinned by TextHashSpec against the original
  * expression trees) — they change HOW the engine computes, never WHAT:
  *
  *  - [[TextHash.shingleXx64]] ≡ the posexplode + Window.lead +
  *    `xxhash64(tok_i..tok_{i+k-1})` shape of Dedup.shingleHashes /
  *    spanRows: one tokenize pass per document, no per-token rows, no
  *    per-partition sort. The window shape spent ~21 CPU-seconds per
  *    edge-family query at sf0.1 building 224k shingles (StageProfile).
  *  - [[TextHash.shingleMd5]] ≡ `unhex(md5(concat_ws(" ", toks)))` per
  *    window (Dedup.spanRowsMd5).
  *  - [[TextHash.minhashSig]] ≡ Dedup.minhashSignatures' explode +
  *    2×(md5→substr→conv→cast) + 64 min-aggregates: the whole signature
  *    is computed per DOCUMENT row — the explode, the 64-column hash
  *    aggregate and its shuffle disappear. md5 is called once per
  *    DISTINCT shingle, exactly like the array_distinct it replaces.
  *  - [[TextHash.simhashSig]] ≡ Dedup.simhashes' explode + md5-prefix +
  *    60 conditional sums: per-doc loop, md5 once per DISTINCT token
  *    with occurrence counts (the vote sums are linear, so
  *    count×(±1) ≡ per-occurrence ±1 exactly, in integers).
  *  - [[TextHash.md5Prefix]] ≡ `CAST(conv(substr(md5(x),1,n),16,10) AS
  *    BIGINT)` (EngineNeutral.md5Long60 and friends) without the hex
  *    string, substring copy, base-conversion string or string→long
  *    parse: the value is read straight off the digest bytes.
  *
  * Tokenization is the byte-level twin of
  * `filter(split(text, " "), t -> length(t) > 0)`: maximal runs of
  * non-0x20 bytes (0x20 never occurs inside a UTF-8 multibyte
  * sequence, so byte scanning is exact).
  *
  * All kernels are static methods on the object's mirror class, so the
  * expressions' codegen is a single static call — whole-stage codegen
  * spans stay intact.
  */
object TextHash {
  private val Space: Byte = 0x20
  private val MersennePrime61 = 2305843009213693951L // 2^61 - 1, matches Dedup

  /** Per-thread scratch: token offsets, a join buffer, the MD5 instance
    * (MessageDigest.getInstance per call is measurable at millions of
    * calls), and a reusable window-dedup set.
    */
  private final class Scratch {
    var starts = new Array[Int](256)
    var lens = new Array[Int](256)
    var buf = new Array[Byte](4096)
    val dig = new Array[Byte](16) // reused digest output (md5 is 16 B)
    val md: MessageDigest = MessageDigest.getInstance("MD5")
    def digestInto(): Array[Byte] = { md.digest(dig, 0, 16); dig }
    val seen = new java.util.HashSet[UTF8String](1024)
    var hashes = new Array[Long](1024)
    def ensureTokens(n: Int): Unit = if (n > starts.length) {
      starts = java.util.Arrays.copyOf(starts, n * 2)
      lens = java.util.Arrays.copyOf(lens, n * 2)
    }
    def ensureBuf(n: Int): Unit =
      if (n > buf.length) buf = new Array[Byte](Integer.highestOneBit(n) * 2)
    def ensureHashes(n: Int): Unit =
      if (n > hashes.length) hashes = new Array[Long](Integer.highestOneBit(n) * 2)
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Fill sc.starts/sc.lens with the byte ranges of the whitespace
    * tokens of `s`; returns the token count.
    */
  private def tokenize(s: UTF8String, sc: Scratch): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == Space) i += 1
      if (i < n) {
        val st = i
        while (i < n && Platform.getByte(base, off + i) != Space) i += 1
        sc.ensureTokens(cnt + 1)
        sc.starts(cnt) = st
        sc.lens(cnt) = i - st
        cnt += 1
      }
    }
    cnt
  }

  /** Join tokens [from, from+count) into sc.buf separated by single
    * spaces (≡ concat_ws(" ", ...)); returns the byte length.
    */
  private def joinTokens(s: UTF8String, sc: Scratch, from: Int, count: Int): Int = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var len = 0
    var j = 0
    while (j < count) { len += sc.lens(from + j); j += 1 }
    if (count > 1) len += count - 1
    sc.ensureBuf(len)
    var pos = 0
    j = 0
    while (j < count) {
      if (j > 0) { sc.buf(pos) = Space; pos += 1 }
      Platform.copyMemory(base, off + sc.starts(from + j),
        sc.buf, Platform.BYTE_ARRAY_OFFSET + pos, sc.lens(from + j).toLong)
      pos += sc.lens(from + j)
      j += 1
    }
    pos
  }

  /** First `nibbles` hex characters of an MD5 digest as a long —
    * the value of CAST(conv(substr(md5hex, 1, nibbles), 16, 10) AS
    * BIGINT) for nibbles ≤ 15 (always positive, < 2^60).
    */
  private def digestPrefix(dig: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = dig(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** ≡ chained xxhash64 over k-token windows (seed 42, one
    * hashUnsafeBytes fold per token — the builtin XxHash64's exact
    * string chaining). `fallback=true` adds Dedup.shingleHashes' short-
    * doc branch: documents with fewer than k tokens emit ONE hash of
    * the space-joined tokens instead of nothing.
    */
  def shingleXx64(s: UTF8String, k: Int, fallback: Boolean): ArrayData = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    if (nt >= k) {
      val m = nt - k + 1
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h = 42L
        var j = 0
        while (j < k) {
          h = XXH64.hashUnsafeBytes(base, off + sc.starts(i + j), sc.lens(i + j), h)
          j += 1
        }
        out(i) = h
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else if (fallback) {
      val len = joinTokens(s, sc, 0, nt)
      val h = XXH64.hashUnsafeBytes(sc.buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      UnsafeArrayData.fromPrimitiveArray(Array(h))
    } else {
      UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    }
  }

  /** ≡ unhex(md5(concat_ws(" ", tok_i..tok_{i+k-1}))) per window: the
    * raw 16-byte MD5 of each space-joined k-token span. No short-doc
    * fallback (spanRowsMd5 has none) — fewer than k tokens → empty.
    */
  def shingleMd5(s: UTF8String, k: Int, fallback: Boolean): ArrayData = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    if (nt < k && !fallback) return new GenericArrayData(Array.empty[Any])
    val m = if (nt >= k) nt - k + 1 else 1
    val span = if (nt >= k) k else nt
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val len = joinTokens(s, sc, i, span)
      sc.md.update(sc.buf, 0, len)
      out(i) = sc.md.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ Dedup.minhashSignatures for one document: over the DISTINCT
    * k-token shingle strings (short docs fall back to the single
    * space-joined whole text, exactly like Dedup.shingles), with
    * h1 = md5 prefix 15 nibbles, h2 = md5(shingle ++ "#") prefix 14
    * nibbles, signature component i = min over shingles of
    * (h1 + i·h2) mod (2^61−1). All arithmetic identical to the
    * aggregate form; md5 runs once per distinct shingle (the
    * array_distinct of the original).
    */
  def minhashSig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    sc.seen.clear()
    val windows = if (nt >= k) nt - k + 1 else 1
    val span = if (nt >= k) k else nt
    var i = 0
    while (i < windows) {
      val len = joinTokens(s, sc, i, span)
      val sh = UTF8String.fromBytes(java.util.Arrays.copyOf(sc.buf, len))
      if (sc.seen.add(sh)) {
        sc.md.update(sc.buf, 0, len)
        val h1 = digestPrefix(sc.digestInto(), 15)
        sc.md.update(sc.buf, 0, len)
        sc.md.update('#'.toByte)
        val h2 = digestPrefix(sc.digestInto(), 14)
        var p = 0
        var v = h1 // h1 + p*h2 accumulated additively (exact: < 2^63)
        while (p < numHashes) {
          val m = v % MersennePrime61
          if (m < mins(p)) mins(p) = m
          v += h2
          p += 1
        }
      }
      i += 1
    }
    sc.seen.clear()
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** ≡ Dedup.simhashes for one document: per token OCCURRENCE a ±1
    * vote on each of the 60 bits of the token's md5-prefix hash, bit
    * set iff the vote sum is positive. md5 runs once per DISTINCT
    * token, votes weighted by the occurrence count (integer-exact).
    * Documents with zero tokens return null — the explode+groupBy
    * form emits no row for them.
    */
  def simhashSig(s: UTF8String): java.lang.Long = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    if (nt == 0) return null
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // distinct tokens with occurrence counts
    val counts = new java.util.HashMap[UTF8String, Array[Int]](64)
    var i = 0
    while (i < nt) {
      val len = sc.lens(i)
      sc.ensureBuf(len)
      Platform.copyMemory(base, off + sc.starts(i),
        sc.buf, Platform.BYTE_ARRAY_OFFSET, len.toLong)
      val tok = UTF8String.fromBytes(java.util.Arrays.copyOf(sc.buf, len))
      val c = counts.get(tok)
      if (c == null) counts.put(tok, Array(1)) else c(0) += 1
      i += 1
    }
    val votes = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tok = e.getKey
      val c = e.getValue()(0)
      sc.md.update(tok.getBytes)
      val h = digestPrefix(sc.digestInto(), 15)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += c else votes(b) -= c
        b += 1
      }
    }
    var sh = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sh |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sh)
  }

  /** Splice up to three byte ranges of (base, off) into `buf` and
    * xxhash64 the result with seed `pre` — the per-variant inner step
    * of [[deletionVariantHashes]]. Unused segments pass (0, 0).
    */
  private def spliceHash(base: AnyRef, off: Long, buf: Array[Byte],
                         a1: Int, b1: Int, a2: Int, b2: Int,
                         a3: Int, b3: Int, pre: Long): Long = {
    var pos = 0
    if (b1 > a1) {
      Platform.copyMemory(base, off + a1, buf, Platform.BYTE_ARRAY_OFFSET + pos, (b1 - a1).toLong)
      pos += b1 - a1
    }
    if (b2 > a2) {
      Platform.copyMemory(base, off + a2, buf, Platform.BYTE_ARRAY_OFFSET + pos, (b2 - a2).toLong)
      pos += b2 - a2
    }
    if (b3 > a3) {
      Platform.copyMemory(base, off + a3, buf, Platform.BYTE_ARRAY_OFFSET + pos, (b3 - a3).toLong)
      pos += b3 - a3
    }
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, pre)
  }

  /** ≡ explode(array_distinct(concat(array(s), d1, d2))) hashed with
    * `xxhash64(blockCols..., v)` — the FastSS deletion-neighborhood
    * keys of EditDistanceJoin, with `pre` the xxhash64 fold of the
    * block columns (xxhash64(b1, b2, v) ≡ hash(v, xxhash64(b1, b2)) by
    * the chain rule). Variants are the string itself, every single-
    * CHARACTER deletion and every two-character deletion (1-based
    * substr clamping reproduced exactly: L=0 → {""}, L=1 → {s, ""}).
    *
    * round-19: deduped on the 64-bit HASH (sort + unique over a
    * reused scratch array) instead of materializing every variant as
    * a UTF8String into a HashSet — the old form paid four allocations
    * per variant (segment-tuple array, byte array, UTF8String, boxed
    * Long; 172 variants per 18-char name, 64.9 CPU-s at sf1 in the
    * q_linkage key stage). Distinct variant strings have distinct
    * hashes modulo the family's documented 2⁻⁶⁴ collision convention,
    * and downstream only consumes the hash SET (bucket grouping;
    * TextHashSpec pins sorted-set equality against the HOF form), so
    * hash-dedup ≡ string-dedup there. Output order is ascending hash
    * (was first-seen) — order-insensitive consumers only (explode →
    * groupBy / collect_set).
    */
  def deletionVariantHashes(s: UTF8String, pre: Long): ArrayData = {
    val sc = scratch.get()
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // char start offsets (UTF-8): starts(0..L), starts(L) = n
    sc.ensureTokens(1)
    var L = 0
    var i = 0
    while (i < n) {
      sc.ensureTokens(L + 2)
      sc.starts(L) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      L += 1
    }
    sc.ensureTokens(L + 2)
    sc.starts(L) = n
    sc.ensureBuf(n)
    sc.ensureHashes(2 + L + L * (L - 1) / 2)
    val buf = sc.buf
    val hs = sc.hashes
    val st = sc.starts
    var m = 0
    // the string itself — contiguous, no splice needed
    hs(m) = XXH64.hashUnsafeBytes(base, off, n, pre); m += 1
    if (L == 0) {
      // d1/d2 degenerate to "" via substr clamping
      hs(m) = spliceHash(base, off, buf, 0, 0, 0, 0, 0, 0, pre); m += 1
    } else {
      // single deletions
      var a = 0
      while (a < L) {
        hs(m) = spliceHash(base, off, buf, 0, st(a), st(a + 1), n, 0, 0, pre)
        m += 1
        a += 1
      }
      if (L == 1) {
        // the clamped (i=1, j=2) double deletion
        hs(m) = spliceHash(base, off, buf, 0, 0, 0, 0, 0, 0, pre); m += 1
      } else {
        var x = 0
        while (x < L - 1) {
          val px = st(x)
          val sx = st(x + 1)
          var y = x + 1
          while (y < L) {
            hs(m) = spliceHash(base, off, buf, 0, px, sx, st(y), st(y + 1), n, pre)
            m += 1
            y += 1
          }
          x += 1
        }
      }
    }
    java.util.Arrays.sort(hs, 0, m)
    var u = 0
    var k = 0
    while (k < m) {
      if (u == 0 || hs(k) != hs(u - 1)) { hs(u) = hs(k); u += 1 }
      k += 1
    }
    val res = new Array[Long](u)
    System.arraycopy(hs, 0, res, 0, u)
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  /** Compiled per-language stopword table for [[langIdScore]]: the
    * flattened word byte arrays with their language index, built once
    * per expression instance from the declared (lang, words) list.
    */
  final class CompiledStopwords(stopwords: Seq[(String, Seq[String])])
      extends Serializable {
    val langs: Array[UTF8String] =
      stopwords.map(x => UTF8String.fromString(x._1)).toArray
    val unk: UTF8String = UTF8String.fromString("unk")
    val words: Array[Array[Byte]] =
      stopwords.flatMap(_._2).map(_.getBytes("UTF-8")).toArray
    val langOf: Array[Int] = stopwords.zipWithIndex
      .flatMap { case ((_, ws), li) => ws.map(_ => li) }.toArray
  }

  /** ≡ TextAnalysis.langIdScored's expression tree (split → length
    * filter → array_distinct → one size(array_intersect(·, words)) per
    * language → greatest → first-declared-language tie-break → "unk"
    * on zero hits), in ONE pass over the text bytes: distinct-token
    * semantics reduce to a per-stopword seen flag (only membership in
    * the fixed word list matters), scores are per-language seen
    * counts, and `>` keeps the FIRST declared language at a tie
    * exactly like the reversed when-fold it replaces. No token array,
    * no per-language hash set, no intersection arrays.
    */
  def langIdScore(s: UTF8String, cw: CompiledStopwords): UTF8String = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nw = cw.words.length
    val seen = new Array[Boolean](nw)
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == Space) i += 1
      if (i < n) {
        val start = i
        while (i < n && Platform.getByte(base, off + i) != Space) i += 1
        val len = i - start
        var w = 0
        while (w < nw) {
          if (!seen(w)) {
            val wb = cw.words(w)
            if (wb.length == len) {
              var k = 0
              var eq = true
              while (eq && k < len) {
                if (wb(k) != Platform.getByte(base, off + start + k)) eq = false
                else k += 1
              }
              if (eq) seen(w) = true
            }
          }
          w += 1
        }
      }
    }
    val nl = cw.langs.length
    val scores = new Array[Int](nl)
    var w = 0
    while (w < nw) { if (seen(w)) scores(cw.langOf(w)) += 1; w += 1 }
    var best = 0
    var bi = -1
    var li = 0
    while (li < nl) { if (scores(li) > best) { best = scores(li); bi = li }; li += 1 }
    if (best == 0) cw.unk else cw.langs(bi)
  }

  /** ≡ size(filter(split(s, " "), t -> length(t) > 0)): the
    * whitespace token count, without building the token array.
    */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == Space) i += 1
      if (i < n) {
        cnt += 1
        while (i < n && Platform.getByte(base, off + i) != Space) i += 1
      }
    }
    cnt
  }

  /** ≡ filter(split(s, " "), t -> length(t) > 0): the whitespace token
    * array itself, as UTF8String slices of the input (one pass, no
    * regex, no interpreted HOF lambda per element). Kept for the
    * pipelines whose token STRINGS are output- or key-bearing (gini /
    * zipf / vocab-coverage / entropy / HLL token counting), where the
    * hash-only shingle kernels cannot apply.
    */
  def tokens(s: UTF8String): ArrayData = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nt)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token bytes are copied out — the result must not alias a scan
    // buffer the reader will overwrite
    var i = 0
    while (i < nt) {
      val arr = new Array[Byte](sc.lens(i))
      Platform.copyMemory(base, off + sc.starts(i), arr,
        Platform.BYTE_ARRAY_OFFSET, sc.lens(i).toLong)
      out(i) = UTF8String.fromBytes(arr)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ the posexplode + window.lead(1) adjacent-token STRING pairs of
    * the bigram pipelines whose tokens are output columns (kneser-ney:
    * p_kn's t1/t2 are result fields, so the hash-keyed bigram kernels
    * cannot apply): one struct(t1, t2) per consecutive token pair, in
    * document order.
    */
  def tokenBigrams(s: UTF8String): ArrayData = {
    val sc = scratch.get()
    val nt = tokenize(s, sc)
    if (nt < 2) return new GenericArrayData(Array.empty[Any])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    def tok(i: Int): UTF8String = {
      val arr = new Array[Byte](sc.lens(i))
      Platform.copyMemory(base, off + sc.starts(i), arr,
        Platform.BYTE_ARRAY_OFFSET, sc.lens(i).toLong)
      UTF8String.fromBytes(arr)
    }
    val out = new Array[Any](nt - 1)
    var prev = tok(0)
    var i = 1
    while (i < nt) {
      val cur = tok(i)
      out(i - 1) = InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ CAST(conv(substr(md5(x), 1, nibbles), 16, 10) AS BIGINT) over
    * the UTF-8 bytes of `s` (optionally followed by one suffix
    * character — Dedup's `md5(concat(s, '#'))` without the concat).
    */
  def md5Prefix(s: UTF8String, nibbles: Int, suffix: Byte, useSuffix: Boolean): Long = {
    val sc = scratch.get()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    base match {
      case bytes: Array[Byte] =>
        sc.md.update(bytes, (off - Platform.BYTE_ARRAY_OFFSET).toInt, n)
      case _ =>
        sc.ensureBuf(n)
        Platform.copyMemory(base, off, sc.buf, Platform.BYTE_ARRAY_OFFSET, n.toLong)
        sc.md.update(sc.buf, 0, n)
    }
    if (useSuffix) sc.md.update(suffix)
    digestPrefix(sc.digestInto(), nibbles)
  }
}

/** Base for the TextHash expression faces: unary over a string child,
  * null-propagating, codegen = one static call (defineCodeGen).
  */
sealed abstract class TextHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }
}

/** array<long> of chained-xxhash64 k-token window hashes — see
  * [[TextHash.shingleXx64]].
  */
case class ShingleXx64(child: Expression, k: Int, fallback: Boolean)
    extends TextHashExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_xxhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleXx64(input.asInstanceOf[UTF8String], k, fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.shingleXx64($c, $k, $fallback)")
  override protected def withNewChildInternal(c: Expression): ShingleXx64 = copy(child = c)
}

/** array<binary> of 16-byte MD5 digests of space-joined k-token
  * windows — see [[TextHash.shingleMd5]].
  */
case class ShingleMd5(child: Expression, k: Int, fallback: Boolean = false)
    extends TextHashExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "shingle_md5"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleMd5(input.asInstanceOf[UTF8String], k, fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.shingleMd5($c, $k, $fallback)")
  override protected def withNewChildInternal(c: Expression): ShingleMd5 = copy(child = c)
}

/** array<long> MinHash signature of the whole document — see
  * [[TextHash.minhashSig]].
  */
case class MinhashSig(child: Expression, k: Int, numHashes: Int)
    extends TextHashExpression {
  require(numHashes >= 1 && numHashes <= 64,
    "numHashes must be in [1, 64] (h1 + i*h2 overflows past 64)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.minhashSig($c, $k, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinhashSig = copy(child = c)
}

/** 60-bit SimHash of the whole document (null when the document has no
  * tokens) — see [[TextHash.simhashSig]].
  */
case class SimhashSig(child: Expression) extends TextHashExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"
  override protected def nullSafeEval(input: Any): Any = {
    val r = TextHash.simhashSig(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Long $boxed = graft.plans.TextHash.simhashSig($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SimhashSig = copy(child = c)
}

/** array<long> of FastSS deletion-neighborhood bucket keys — see
  * [[TextHash.deletionVariantHashes]]. `left` = the name string,
  * `right` = the xxhash64 fold of the block columns.
  */
case class DeletionVariantHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"deletion_variant_hashes requires (string, long), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "deletion_variant_hashes"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.deletionVariantHashes(a.asInstanceOf[UTF8String], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.TextHash.deletionVariantHashes($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DeletionVariantHashes =
    copy(left = l, right = r)
}

/** Whitespace token array — see [[TextHash.tokens]]. */
case class Tokens(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.tokens($c)")
  override protected def withNewChildInternal(c: Expression): Tokens = copy(child = c)
}

/** Adjacent-token string pairs — see [[TextHash.tokenBigrams]]. */
case class TokenBigrams(child: Expression) extends TextHashExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t1", StringType, nullable = false),
    StructField("t2", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "token_bigrams"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.tokenBigrams($c)")
  override protected def withNewChildInternal(c: Expression): TokenBigrams = copy(child = c)
}

/** Scored stopword language ID — see [[TextHash.langIdScore]]. */
case class LangIdScored(child: Expression,
                        stopwords: Seq[(String, Seq[String])])
    extends TextHashExpression {
  @transient private lazy val compiled = new TextHash.CompiledStopwords(stopwords)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_scored"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.langIdScore(input.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", compiled,
      classOf[TextHash.CompiledStopwords].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.langIdScore($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): LangIdScored =
    copy(child = c)
}

/** Whitespace token count — see [[TextHash.tokenCount]]. */
case class TokenCount(child: Expression) extends TextHashExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression): TokenCount = copy(child = c)
}

/** Long value of the first `nibbles` hex chars of md5(child[, suffix])
  * — see [[TextHash.md5Prefix]].
  */
case class Md5Prefix(child: Expression, nibbles: Int, suffix: Option[Byte] = None)
    extends TextHashExpression {
  require(nibbles >= 1 && nibbles <= 15, "nibbles must be in [1, 15] to fit a positive long")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"
  private val suffixByte: Byte = suffix.getOrElse(0.toByte)
  private val useSuffix: Boolean = suffix.isDefined
  override protected def nullSafeEval(input: Any): Any =
    TextHash.md5Prefix(input.asInstanceOf[UTF8String], nibbles, suffixByte, useSuffix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHash.md5Prefix($c, $nibbles, (byte) $suffixByte, $useSuffix)")
  override protected def withNewChildInternal(c: Expression): Md5Prefix = copy(child = c)
}

/** Column faces. */
object TextHashCols {
  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def shingleXx64(text: Column, k: Int, fallback: Boolean): Column =
    bridge(ShingleXx64(expr(text), k, fallback))
  def shingleMd5(text: Column, k: Int): Column =
    bridge(ShingleMd5(expr(text), k))
  /** [[shingleMd5]] with the short-doc fallback: fewer than k tokens
    * emit ONE digest of the whole space-joined text (q_winnowing's
    * clamped-slice gram).
    */
  def shingleMd5Padded(text: Column, k: Int): Column =
    bridge(ShingleMd5(expr(text), k, fallback = true))
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    bridge(MinhashSig(expr(text), k, numHashes))
  def simhashSig(text: Column): Column =
    bridge(SimhashSig(expr(text)))
  def tokenCount(text: Column): Column = bridge(TokenCount(expr(text)))
  def tokens(text: Column): Column = bridge(Tokens(expr(text)))
  def langIdScored(text: Column, stopwords: Seq[(String, Seq[String])]): Column =
    bridge(LangIdScored(expr(text), stopwords))
  def tokenBigrams(text: Column): Column = bridge(TokenBigrams(expr(text)))
  def deletionVariantHashes(name: Column, pre: Column): Column =
    bridge(DeletionVariantHashes(expr(name), expr(pre)))
  def md5Prefix(c: Column, nibbles: Int): Column =
    bridge(Md5Prefix(expr(c), nibbles))
  def md5PrefixTagged(c: Column, nibbles: Int, suffix: Char): Column =
    bridge(Md5Prefix(expr(c), nibbles, Some(suffix.toByte)))
}
