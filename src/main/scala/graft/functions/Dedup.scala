package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora.
  *
  * Scale design (SURVEY.md §5): signatures are computed
  * partition-local with codegen'd expressions (`xxhash64`,
  * `transform`, `aggregate` — no UDFs); only small fixed-width keys
  * (md5 hex / band hashes / 64-bit simhashes) ever shuffle, so
  * shuffle bytes grow with row count, not corpus bytes. Self-joins
  * are halved with `id_a < id_b` and guarded against degenerate
  * buckets by a bucket-size cap.
  */
object Dedup {

  /** Exact dedup: group on a 128-bit content hash (md5) and keep the
    * smallest id. At 100 TB this is the standard pattern — the
    * shuffle carries 32-byte hashes, never document bytes.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Whitespace tokens with empties removed. */
  def tokens(textCol: Column): Column =
    filter(split(textCol, " "), t => length(t) > 0)

  /** Distinct k-word shingles; documents shorter than k words fall
    * back to a single whole-text shingle so they still participate.
    */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val ts = tokens(textCol)
    array_distinct(
      when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", ts))))
  }

  /** MinHash signature: element h is min over shingles of
    * xxhash64(shingle, h) — h acts as the hash-family index.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shinglesCol, s => xxhash64(s, h))))

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), hash each band, shuffle only (band, bandHash, id),
    * and self-join buckets. `maxBucket` drops degenerate buckets
    * (boilerplate shingles) that would otherwise explode
    * quadratically — the standard skew guard at corpus scale.
    *
    * Returns (id_a, id_b, est_jaccard) with est_jaccard = fraction of
    * matching signature components.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, numHashes: Int = 64,
                        bands: Int = 16, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df
      .select(col(idCol).as("id"), minhashSignature(shingles(col(textCol), shingleK), numHashes).as("sig"))
    // unrolled at plan-build time: band b hashes signature rows [b*R, (b+1)*R)
    val bandHashes = (0 until bands).map { b =>
      xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))
    }
    val banded = sigs.select(
        col("id"), col("sig"), posexplode(array(bandHashes: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = capped.select(col("band"), col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("band"), col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), p => p))
          .cast("double") / numHashes).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard on candidate pairs: re-attach shingle sets
    * (broadcast-sized candidate list joins back to the corpus) and
    * compute |∩| / |∪| exactly — the verify step after LSH.
    */
  def ngramJaccard(df: DataFrame, candidates: DataFrame, idCol: String,
                   textCol: String, shingleK: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** 64-bit SimHash: bit i is the sign of Σ_tokens (±1 by bit i of
    * xxhash64(token)). Pure expression — 64 nested folds fuse into
    * one codegen stage.
    */
  def simhash(textCol: Column): Column = {
    // hash each token once; 64 per-bit folds unroll at plan-build time
    val hs = transform(tokens(textCol), t => xxhash64(t))
    val bitCols = (0 until 64).map { i =>
      when(
        aggregate(hs, lit(0),
          (a, h) => a + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming (< 16):
    * pigeonhole over four 16-bit bands — any pair within distance 3
    * must agree on ≥1 band — then exact popcount verify on the pair.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val bandCols = (0 until 4).map(b => shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sh.select(col("id"), col("sh"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }
}
