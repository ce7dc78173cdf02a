package graft.queries

import graft.Tables
import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighth query wave: span-level dedup and decontamination — the
  * substring-granularity curation family (dedup at the repeated-
  * passage level rather than whole-document level, per the published
  * "deduplicating training data" line of work, e.g. exact-substring
  * dedup via suffix structures; here re-expressed as fixed-k span
  * hashing, the shape that distributes). Everything shuffles hashes
  * and ids, never text:
  *
  *  - span dedup: which exact k-word passages repeat across
  *    documents (boilerplate, licence blocks, templated intros);
  *  - per-doc duplicated-span fraction: how much of each document is
  *    made of corpus-repeated passages — the keep/trim/drop signal
  *    span-level dedup acts on;
  *  - decontamination overlap: fraction of a doc's k-grams present
  *    in a benchmark/eval gram set — the train-test leakage scan run
  *    before any release (benchmark side is distinct-hashed and
  *    broadcast: eval suites are MBs against a 100 TB corpus);
  *  - containment: asymmetric |A∩B|/|A| on blocked candidate pairs —
  *    catches subset/quote relations whole-doc Jaccard misses.
  */
object SpanQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Span width for cross-doc repeat detection. 8 words ≈ the
    * granularity where exact repeats stop being coincidence (50-gram
    * in the literature for web scale; 8 keeps the synthetic 10-99
    * word docs participating).
    */
  private val SpanK = 8

  /** Decontamination gram width (13-gram at web scale; 5 here). */
  private val DecontamK = 5

  val queries: Map[String, Q] = Map(
    // 105. Cross-document repeated spans: every k-word passage
    //      appearing in ≥2 distinct documents, with its reach and
    //      first holder. Spans are reduced to md5 in the scan stage —
    //      the groupBy shuffles (32-byte hex, doc_id) pairs with
    //      map-side partial aggregation, and output is bounded by the
    //      number of *repeated* spans, not corpus size.
    "q_span_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(Dedup.spanHashesMd5(col("text"), SpanK)).as("span_hash"))
        .groupBy("span_hash")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("span_hash")),

    // 106. Per-document duplicated-span fraction: of a doc's distinct
    //      k-word spans, how many also occur in some other document.
    //      This is the number a span-level dedup pass trims on (docs
    //      near 1.0 are pure boilerplate; near 0.0 are original). Two
    //      hash-keyed aggregations, then a hash-keyed join back —
    //      every shuffle carries (hash, id) pairs. The dup-span side
    //      is output-bounded (only repeated spans), so the join's
    //      build side shrinks with corpus quality, not size.
    "q_span_dup_frac" -> ((s, d) => {
      val spans = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(Dedup.spanHashesMd5(col("text"), SpanK)))
            .as("span_hash"))
      val dup = spans.groupBy("span_hash")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("span_hash"), lit(1).as("dup"))
      spans.join(dup, Seq("span_hash"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), count(col("dup")).as("n_dup"))
        .withColumn("dup_frac", col("n_dup") / col("n_spans"))
        .orderBy("doc_id")
    }),

    // 107. Decontamination scan: fraction of each corpus doc's
    //      distinct k-grams that appear in the benchmark set (here:
    //      source 'src0' stands in for an eval suite). The benchmark
    //      gram set is distinct-hashed then BROADCAST — eval suites
    //      are megabytes against a 100 TB corpus, so the scan is one
    //      shuffle (per-doc agg) with a map-side hash probe; corpus
    //      text never moves. Reports every non-benchmark doc so the
    //      0-overlap baseline is visible (release gates threshold on
    //      overlap_frac downstream).
    "q_decontam_overlap" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(Dedup.spanHashesMd5(col("text"), DecontamK)))
            .as("g"))
      val bench = grams.filter(col("source") === "src0")
        .select(col("g")).distinct()
        .withColumn("hit", lit(1))
      grams.filter(col("source") =!= "src0")
        .join(broadcast(bench), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .withColumn("overlap_frac", col("n_hit") / col("n_grams"))
        .orderBy("doc_id")
    }),

    // 108. Asymmetric containment on deterministically-blocked
    //      candidate pairs (same shared-shingle blocking as
    //      q_ngram_jaccard, so the whole query is SQL-expressible):
    //      cont_a = |A∩B|/|A| flags quote/subset relations that
    //      Jaccard structurally under-scores. `relation` classifies
    //      the direction at 0.8 — the actionable split (drop the
    //      contained doc vs. cluster the overlap).
    "q_containment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = Dedup.sharedShingleEdges(docs, "doc_id", "text",
        shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
        .select("id_a", "id_b")
      Dedup.ngramContainment(docs, cands, "doc_id", "text")
        .withColumn("relation",
          when(col("cont_a") >= 0.8, lit("a_in_b"))
            .when(col("cont_b") >= 0.8, lit("b_in_a"))
            .otherwise(lit("overlap")))
        .orderBy("id_a", "id_b")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_span_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, unnest(
         |    [md5(array_to_string(toks[i+1:i+$SpanK], ' '))
         |     FOR i IN range(0, len(toks) - ${SpanK - 1})]) AS span_hash
         |  FROM t WHERE len(toks) >= $SpanK
         |)
         |SELECT span_hash, count(DISTINCT doc_id) AS n_docs,
         |  min(doc_id) AS first_doc
         |FROM s GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY span_hash""".stripMargin,
    "q_span_dup_frac" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i+1:i+$SpanK], ' '))
         |     FOR i IN range(0, len(toks) - ${SpanK - 1})])) AS span_hash
         |  FROM t WHERE len(toks) >= $SpanK
         |), dup AS (
         |  SELECT span_hash FROM (
         |    SELECT span_hash, count(DISTINCT doc_id) AS nd FROM s GROUP BY 1)
         |  WHERE nd >= 2
         |)
         |SELECT s.doc_id, count(*) AS n_spans, count(dup.span_hash) AS n_dup,
         |  count(dup.span_hash)::DOUBLE / count(*) AS dup_frac
         |FROM s LEFT JOIN dup ON s.span_hash = dup.span_hash
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_decontam_overlap" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, source, unnest(list_distinct(
         |    [md5(array_to_string(toks[i+1:i+$DecontamK], ' '))
         |     FOR i IN range(0, len(toks) - ${DecontamK - 1})])) AS g
         |  FROM t WHERE len(toks) >= $DecontamK
         |), bench AS (
         |  SELECT DISTINCT g FROM s WHERE source = 'src0'
         |)
         |SELECT s.doc_id, count(*) AS n_grams, count(bench.g) AS n_hit,
         |  count(bench.g)::DOUBLE / count(*) AS overlap_frac
         |FROM s LEFT JOIN bench ON s.g = bench.g
         |WHERE s.source <> 'src0'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Shingle parity with the Spark side is at the STRING level (the
    // Spark side intersects xxhash64 sets) — identical counts modulo
    // 2⁻⁶⁴ collisions; candidates replicate sharedShingleEdges
    // (df band [2,20], ≥5 shared); each containment is a ratio of the
    // same two integers in both engines, so the doubles match bitwise.
    "q_containment" ->
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), kept AS (
        |  SELECT id, shingle FROM (
        |    SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
        |  WHERE df BETWEEN 2 AND 20
        |), cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |), sizes AS (
        |  SELECT id, count(*) AS n FROM sh GROUP BY id
        |), inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS ni
        |  FROM cand c JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT i.id_a, i.id_b,
        |  i.ni::DOUBLE / sa.n AS cont_a,
        |  i.ni::DOUBLE / sb.n AS cont_b,
        |  CASE WHEN i.ni::DOUBLE / sa.n >= 0.8 THEN 'a_in_b'
        |       WHEN i.ni::DOUBLE / sb.n >= 0.8 THEN 'b_in_a'
        |       ELSE 'overlap' END AS relation
        |FROM inter i JOIN sizes sa ON sa.id = i.id_a
        |JOIN sizes sb ON sb.id = i.id_b
        |ORDER BY i.id_a, i.id_b""".stripMargin
  )
}
