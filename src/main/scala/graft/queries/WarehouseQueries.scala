package graft.queries

import graft.Tables
import graft.functions.{Dedup, EngineNeutral}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Twelfth query wave — warehouse-temporal and corpus-governance
  * operators (SURVEY.md §2 rows 135-141): the change-tracking /
  * interval / sampling shapes a production data platform runs beside
  * the curation pipeline. All are SQL-oracled except the zlib-backed
  * compression-ratio signal (rows-only — no portable SQL reproduces a
  * specific DEFLATE encoder).
  *
  * Scale notes common to the wave: every window partitions by a RAW
  * entity key (user_id / source), never a hash-derived one (ScaleGuard
  * lint #3); per-entity row counts are activity-bounded, so window
  * groups stay small at any corpus size. Integer-pure outputs
  * (epoch-micros longs, exact counts) keep every oracle comparison
  * bit-exact, the q_cusum/q_acf convention.
  */
object WarehouseQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Idempotent build of the per-sf-dir bucketed join tables (the
    * IVF-centroid session-caching convention, via the catalog itself:
    * `tableExists` makes retries and fresh sessions self-healing).
    * Bucketed+sorted on the join key with EQUAL bucket counts, both
    * sides of the recurring orders⋈lineitem join compile to a
    * SortMergeJoin with ZERO Exchange — at 100 TB, pay the
    * bucketed write once and every subsequent key-join is
    * shuffle-free (OperatorsSpec pins the exchange-free plan).
    */
  def ensureBucketed(s: SparkSession, d: String): (String, String) = synchronized {
    // 64-bit tag: a 32-bit string hash invites silent same-session
    // collisions between different sf dirs (wrong tables, no error)
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val li = s"graft_bkt_lineitem_$tag"
    val od = s"graft_bkt_orders_$tag"
    def build(name: String, df: => DataFrame): Unit =
      if (!s.catalog.tableExists(name)) {
        // a PREVIOUS session's managed-table files may survive in the
        // warehouse dir while the (in-memory) catalog entry did not —
        // creating over an existing location is refused, so clear the
        // stale derived cache first
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), name)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        graft.operators.Bucketing.writeBucketed(df, name, "l_orderkey", 8)
      }
    build(li, Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount"))
    build(od, Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")))
    (li, od)
  }

  /** ROOT dir of the per-sf-dir persisted graph index (the
    * lexical-index session-caching convention): built once with
    * q_triangles' edge parameters, then every graph analytic reads the
    * committed edge set instead of re-running the corpus-scanning
    * shingle blocking. The root (not the version dir) is cached so
    * derived indexes — the cluster labeling — can resolve it too.
    */
  private val graphIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def graphRoot(s: SparkSession, d: String): String =
    graphIndexCache.computeIfAbsent(d, _ => {
      val root = java.nio.file.Files.createTempDirectory("graft_gidx_q").toString
      graft.functions.GraphIndex.writeIndex(
        Tables.documents(s, d), "doc_id", "text", root)
      root
    })

  /** Root of the per-sf-dir cluster index derived from the graph
    * index (row 146).
    */
  private val clusterIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Root of the per-sf-dir coreness index derived from the graph
    * index (row 133b).
    */
  private val corenessIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Degree-oriented per-node triangle counts over an explicit edge
    * list — q_triangles' published O(√m) wedge shape with the edge
    * construction externalized (same merge-hint discipline).
    */
  private def triangleCounts(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg_u"))
    val dir = sym
      .join(deg.hint("merge"), "u")
      .join(deg.select(col("u").as("v"), col("deg_u").as("deg_v")).hint("merge"), "v")
      .filter(col("deg_u") < col("deg_v") ||
        (col("deg_u") === col("deg_v") && col("u") < col("v")))
      .select("u", "v")
      .persist(StorageLevel.MEMORY_ONLY)
    graft.plans.CacheHandles.track("query.trianglesIndexed.oriented", dir)
    val wedges = dir.select(col("u"), col("v").as("v1"))
      .join(dir.select(col("u"), col("v").as("v2")), "u")
      .filter(col("v1") =!= col("v2"))
    val tris = wedges.join(
      dir.select(col("u").as("v1"), col("v").as("v2")).hint("merge"),
      Seq("v1", "v2"), "left_semi")
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    // 135. SCD Type-2 change tracking: collapse each user's event-type
    //      stream into validity intervals [valid_from, valid_to) —
    //      the warehouse dimension-history op (Kimball). Runs detected
    //      by lag(), numbered by a running sum, closed by lead() over
    //      the run frame. Epoch-micros longs end to end: interval
    //      arithmetic never touches engine timestamp formatting.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val runs = ev
        .withColumn("chg",
          when(lag("event_type", 1).over(w).isNull ||
            lag("event_type", 1).over(w) =!= col("event_type"), 1).otherwise(0))
        .withColumn("run_id",
          sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = runs.groupBy("user_id", "run_id")
        .agg(min("event_type").as("event_type"),
          min("ts_us").as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val w2 = Window.partitionBy("user_id").orderBy("run_id")
      iv.withColumn("valid_to_us", lead("valid_from_us", 1).over(w2))
        .select(col("user_id"), col("run_id"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("n_events"))
        .orderBy("user_id", "run_id")
    }),

    // 136. Interval union (gaps-and-islands): merge each user's
    //      overlapping activity intervals [ts, ts + value·1s-scaled)
    //      and report merged-interval count + exact covered micros —
    //      the sessionless coverage/uptime op. Island boundaries via
    //      the running-max-of-end trick (max over the PRECEDING frame
    //      only); all arithmetic on exact longs.
    "q_interval_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) +
            round(col("value") * 1000).cast("long") * 1000L).as("e_us"))
      val w = Window.partitionBy("user_id").orderBy("s_us", "e_us", "event_id")
      val islands = ev
        .withColumn("pmax", max("e_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_i",
          when(col("pmax").isNull || col("s_us") > col("pmax"), 1).otherwise(0))
        .withColumn("island",
          sum("new_i").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      islands.groupBy("user_id", "island")
        .agg(min("s_us").as("m_s"), max("e_us").as("m_e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("m_e") - col("m_s")).as("covered_us"))
        .orderBy("user_id")
    }),

    // 137. Exact-k deterministic per-group sample: the first k docs of
    //      each source in content-hash order — the "give me exactly
    //      1000 per domain" curation op (q_sample_stratified keeps a
    //      hash FRACTION; budget caps spend characters). Native
    //      TopKPerKey: one bounded-heap pass, k rows per group through
    //      the shuffle — never a full per-group sort, never a window
    //      materializing every row.
    "q_sample_group_k" -> ((s, d) =>
      graft.plans.TopKPerKey.topK(
          Tables.documents(s, d)
            .select(col("source"), col("doc_id"),
              md5(col("text").cast("binary")).as("h")),
          Seq("source"), Seq("h" -> false, "doc_id" -> false), k = 10)
        .orderBy("source", "h", "doc_id")),

    // 138. Hapax-legomena scan: per source, tokens occurring EXACTLY
    //      once corpus-wide — the vocabulary-tail governance number
    //      (OCR noise and mojibake surface as hapax storms; a source
    //      with near-zero hapax is template spam). Corpus counts are
    //      one map-side-combinable groupBy; the hapax set flows back
    //      via a merge semi-join on the token key (vocabulary-sized —
    //      never a broadcast, the q_importance lesson).
    "q_rare_tokens" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .persist(StorageLevel.MEMORY_ONLY)
      graft.plans.CacheHandles.track("query.raretokens.toks", toks)
      val hapax = toks.groupBy("t").agg(count(lit(1)).as("c"))
        .filter(col("c") === 1).select("t")
      val hits = toks.join(hapax.hint("merge"), Seq("t"), "left_semi")
        .groupBy("source")
        .agg(count(lit(1)).as("n_hapax"),
          countDistinct("doc_id").as("n_docs_hapax"))
      val tot = toks.groupBy("source").agg(count(lit(1)).as("n_tokens"))
      tot.join(hits, Seq("source"), "left")
        .select(col("source"),
          coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
          coalesce(col("n_docs_hapax"), lit(0L)).as("n_docs_hapax"),
          EngineNeutral.r4(coalesce(col("n_hapax"), lit(0L)) * lit(1000.0) /
            col("n_tokens")).as("hapax_per_1k"))
        .orderBy("source")
    }),

    // 139. Two-hop neighborhood size (friend-of-friend) on the
    //      near-dup graph: per node, distinct nodes at distance
    //      EXACTLY 2 — the candidate-expansion count entity-resolution
    //      uses to bound transitive blocking before running CC. Same
    //      persisted edge machinery as q_triangles; the wedge join is
    //      Σ deg² (the triangle family's cost class on this sparse
    //      graph), direct neighbors excluded by a merge anti-join.
    "q_two_hop" -> ((s, d) => {
      val edges = graft.plans.CacheHandles.track("query.twohop.edges",
        Dedup.sharedShingleEdges(Tables.documents(s, d),
            "doc_id", "text", shingleK = 3, minShared = 3, minDf = 2, maxDf = 20)
          .select("id_a", "id_b")
          .persist(StorageLevel.MEMORY_ONLY))
      val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
        .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
        .persist(StorageLevel.MEMORY_ONLY)
      graft.plans.CacheHandles.track("query.twohop.sym", sym)
      val wedge = sym.select(col("u"), col("v").as("m"))
        .join(sym.select(col("u").as("m"), col("v").as("w")).hint("merge"), "m")
        .filter(col("w") =!= col("u"))
        .select("u", "w").distinct()
      val fof = wedge.join(sym.select(col("u"), col("v").as("w")).hint("merge"),
        Seq("u", "w"), "left_anti")
      fof.groupBy(col("u").as("id")).agg(count(lit(1)).as("n_two_hop"))
        .orderBy("id")
    }),

    // 140. Compression-ratio quality signal (rows-only #12): DEFLATE
    //      length / raw UTF-8 length per doc — the classic low-entropy
    //      detector (template spam and repeated boilerplate compress
    //      far below prose; Gopher's repetition rules approximate what
    //      this measures directly). Codegen'd native-zlib expression,
    //      partition-local, zero shuffle before the final sort. No
    //      portable SQL reproduces a specific DEFLATE encoder →
    //      rows-only; WarehouseSpec pins driver-recompute equality,
    //      determinism, and the repetitive≪prose separation.
    "q_compress_ratio" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          graft.plans.Deflate.deflate_size(col("text")).as("def_len"))
        .withColumn("ratio",
          when(col("n_bytes") > 0,
            EngineNeutral.r4(col("def_len").cast("double") / col("n_bytes"))))
        .orderBy("doc_id")),

    // 141. The bucketed-join production path, gated (the q_bm25_indexed
    //      convention: infrastructure the spec already pins, now
    //      driver-verified end to end): orders⋈lineitem through
    //      pre-bucketed co-located tables — the join stage itself
    //      compiles with zero Exchange (8 equal buckets both sides,
    //      sorted on the key), so only the 5-row priority aggregate
    //      shuffles. Money sums in exact decimal (the sf1 lesson).
    "q_join_bucketed" -> ((s, d) => {
      val (li, od) = ensureBucketed(s, d)
      graft.operators.Bucketing.bucketedJoin(s, od, li, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          EngineNeutral.exactSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // 142. Triangle counts through the PERSISTED graph index (the
    //      q_bm25_indexed convention): writeIndex commits postings +
    //      dfs + df-banded edges once per corpus version; the query
    //      reads the committed edge set — no re-tokenization, no
    //      posting self-join — and runs only the O(√m) wedge close.
    //      Gated against the SAME oracle as q_triangles, so index
    //      build + indexed serving are driver-verified end to end.
    "q_triangles_indexed" -> ((s, d) => {
      val vdir = graft.operators.Versioned.resolve(s, graphRoot(s, d)).get
      triangleCounts(
        graft.functions.GraphIndex.readEdges(s, vdir).select("id_a", "id_b"))
    }),

    // 146. Near-dup clusters through the PERSISTED cluster index: the
    //      graph index's committed edge set is labeled ONCE per corpus
    //      version (min-id connected components), incremental appends
    //      re-label only touched components (ClusterIndexSpec pins
    //      increment ≡ rebuild through merges AND band-crossing
    //      splits), and cluster membership becomes a label lookup.
    //      Gated against q_dedup_clusters' oracle — one truth, two
    //      physical routes.
    "q_dedup_clusters_indexed" -> ((s, d) => {
      val root = clusterIndexCache.computeIfAbsent(d, _ => {
        val cr = java.nio.file.Files.createTempDirectory("graft_cidx_q").toString
        graft.functions.ClusterIndex.writeIndex(s, graphRoot(s, d), cr)
        cr
      })
      val vdir = graft.operators.Versioned.resolve(s, root).get
      graft.functions.ClusterIndex.readLabels(s, vdir)
        .groupBy(col("label").as("comp"))
        .agg(count(lit(1)).as("n_docs"), min("id").as("keep_id"))
        .orderBy("comp")
    }),

    // 133b. Coreness through the PERSISTED index (rows-only like its
    //       in-job twin q_coreness — the shrink-until-stable fixpoint
    //       has no SQL form; RowsOnlyInvariantsSpec pins EXACT
    //       equality of the two routes on the gate corpus): the
    //       data-dependent k-core peel — the most re-run-hostile
    //       fixpoint in the inventory — runs ONCE per corpus version
    //       over the graph index's committed edges, incremental
    //       appends re-peel only touched components
    //       (CorenessIndexSpec pins increment ≡ rebuild through
    //       merges AND band-crossing splits), and the density
    //       governance number becomes a label lookup. Vertices with
    //       an incident edge have coreness ≥ 1, so the filter
    //       reproduces the in-job output domain exactly (the index
    //       also stores isolated docs at 0 for corpus-wide audits).
    "q_coreness_indexed" -> ((s, d) => {
      val root = corenessIndexCache.computeIfAbsent(d, _ => {
        val cr = java.nio.file.Files.createTempDirectory("graft_kidx_q").toString
        graft.functions.CorenessIndex.writeIndex(s, graphRoot(s, d), cr)
        cr
      })
      val vdir = graft.operators.Versioned.resolve(s, root).get
      graft.functions.CorenessIndex.readCoreness(s, vdir)
        .filter(col("coreness") >= 1)
        .select(col("id").as("doc_id"), col("coreness"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
        |), x AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), y AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id FROM x
        |), iv AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |    min(ts_us) AS valid_from_us, count(*) AS n_events
        |  FROM y GROUP BY 1, 2
        |)
        |SELECT user_id, run_id, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
        |  n_events
        |FROM iv ORDER BY user_id, run_id""".stripMargin,
    "q_interval_merge" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 1000 AS e_us
        |  FROM events
        |), x AS (
        |  SELECT *, max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, e_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM e
        |), y AS (
        |  SELECT *, CASE WHEN pmax IS NULL OR s_us > pmax THEN 1 ELSE 0 END AS new_i
        |  FROM x
        |), z AS (
        |  SELECT *, CAST(sum(new_i) OVER (PARTITION BY user_id
        |    ORDER BY s_us, e_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM y
        |), m AS (
        |  SELECT user_id, island, min(s_us) AS m_s, max(e_us) AS m_e
        |  FROM z GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(m_e - m_s) AS BIGINT) AS covered_us
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_sample_group_k" ->
      """SELECT source, doc_id, h FROM (
        |  SELECT source, doc_id, md5(text) AS h,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY source, h, doc_id""".stripMargin,
    "q_rare_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t
        |  FROM documents
        |), hap AS (
        |  SELECT t FROM (SELECT t, count(*) AS c FROM toks GROUP BY 1) WHERE c = 1
        |), tot AS (
        |  SELECT source, count(*) AS n_tokens FROM toks GROUP BY 1
        |), hits AS (
        |  SELECT source, count(*) AS n_hapax, count(DISTINCT doc_id) AS n_docs_hapax
        |  FROM toks WHERE t IN (SELECT t FROM hap) GROUP BY source
        |)
        |SELECT t.source,
        |  CAST(coalesce(h.n_hapax, 0) AS BIGINT) AS n_hapax,
        |  CAST(coalesce(h.n_docs_hapax, 0) AS BIGINT) AS n_docs_hapax,
        |  floor((coalesce(h.n_hapax, 0) * 1000.0 / t.n_tokens) * 10000 + 0.5) / 10000.0 AS hapax_per_1k
        |FROM tot t LEFT JOIN hits h ON h.source = t.source
        |ORDER BY t.source""".stripMargin,
    "q_two_hop" ->
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
        |), edges AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), sym AS (
        |  SELECT id_a AS u, id_b AS v FROM edges
        |  UNION ALL SELECT id_b, id_a FROM edges
        |), wedge AS (
        |  SELECT DISTINCT a.u AS u, b.v AS w
        |  FROM sym a JOIN sym b ON b.u = a.v
        |  WHERE b.v <> a.u
        |), fof AS (
        |  SELECT u, w FROM wedge EXCEPT SELECT u, v FROM sym
        |)
        |SELECT u AS id, count(*) AS n_two_hop FROM fof GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the indexed path must reproduce the in-job q_triangles result
    // exactly — one oracle, two physical routes
    "q_triangles_indexed" -> SelectionQueries.oracles("q_triangles"),
    // one truth, two physical routes (the q_triangles_indexed rule)
    "q_dedup_clusters_indexed" -> LlmQueries.oracles("q_dedup_clusters")
  )
}
