package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twelfth-wave invariants (SURVEY §2 rows 135-141). The DuckDB hash
  * oracle is the correctness gate for the six SQL-oracled queries;
  * this spec adds the independent recomputations rows-only policy
  * demands (q_compress_ratio) plus structural invariants a hash can't
  * express (interval disjointness, two-hop BFS equality, bucketed =
  * unbucketed join results).
  */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- q_compress_ratio (rows-only #12) ----

  test("compress ratio: driver recompute equality, determinism, rows") {
    val out = SparkEntry.queries("q_compress_ratio")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length > 0)
    // independent driver recompute through java.util.zip directly (not
    // the expression under test)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.take(50).foreach { case (id, nBytes, defLen) =>
      val bytes = docs(id).getBytes("UTF-8")
      assert(nBytes === bytes.length, s"doc $id raw length")
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](1 << 16)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      assert(defLen === total, s"doc $id deflate length")
    }
    val again = SparkEntry.queries("q_compress_ratio")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq === again.toSeq, "deflate output must be deterministic")
  }

  test("compress ratio separates repetitive text from prose") {
    import spark.implicits._
    val rep = ("all rights reserved " * 100).trim
    val prose = (1 to 400).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, prose)).toDF("doc_id", "text")
      .select(col("doc_id"),
        (graft.plans.Deflate.deflate_size(col("text")).cast("double") /
          octet_length(col("text"))).as("ratio"))
    val m = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) < 0.1, s"boilerplate ratio ${m(1L)} should compress hard")
    assert(m(2L) > 0.3, s"prose ratio ${m(2L)} should not")
    assert(m(1L) < m(2L) / 3, "repetitive text must compress ≥3× better")
  }

  // ---- q_scd2 ----

  test("scd2 intervals tile each user's history exactly") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
    assert(rows.length > 0)
    val byUser = rows.groupBy(_.getLong(0))
    val evCount = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_.getLong(1)) // run_id
      // run ids are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      // intervals tile: valid_to == next valid_from; last is open (null)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3), s"user $u: gap between runs")
          assert(a.getString(2) !== b.getString(2),
            s"user $u: consecutive runs must change event_type")
        case _ =>
      }
      assert(sorted.last.isNullAt(4), s"user $u: open current interval")
      // n_events partitions the user's events
      assert(sorted.map(_.getLong(5)).sum === evCount(u))
    }
  }

  // ---- q_interval_merge ----

  test("interval merge: coverage bounded and islands disjoint") {
    val outMap = SparkEntry.queries("q_interval_merge")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(outMap.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + round(col("value") * 1000).cast("long") * 1000L).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = raw.groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      val (n, covered) = outMap(u)
      // driver reference merge
      val sorted = evs.map(t => (t._2, t._3)).sortBy(identity)
      var islands = List.empty[(Long, Long)]
      sorted.foreach { case (s0, e0) =>
        islands match {
          case (a, b) :: tail if s0 <= b => islands = (a, math.max(b, e0)) :: tail
          case _ => islands = (s0, e0) :: islands
        }
      }
      assert(n === islands.length.toLong, s"user $u island count")
      assert(covered === islands.map(i => i._2 - i._1).sum, s"user $u coverage")
    }
  }

  // ---- q_sample_group_k ----

  test("sample_group_k equals the window row_number reference") {
    val got = SparkEntry.queries("q_sample_group_k")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    val want = Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    // exactly min(10, group size) per group
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size.toLong === math.min(10L, sizes(src)))
    }
  }

  // ---- q_rare_tokens ----

  test("rare tokens equals a driver recompute") {
    val got = SparkEntry.queries("q_rare_tokens")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, src, t))
    }
    val counts = toks.groupBy(_._3).map { case (t, xs) => t -> xs.length }
    val hapax = counts.filter(_._2 == 1).keySet
    val want = toks.groupBy(_._2).map { case (src, xs) =>
      val hits = xs.filter(x => hapax(x._3))
      (src, hits.length.toLong, hits.map(_._1).distinct.length.toLong)
    }.toSet
    assert(got === want)
  }

  // ---- q_two_hop ----

  test("two-hop counts equal a driver BFS over the same edges") {
    val got = SparkEntry.queries("q_two_hop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = graft.functions.Dedup.sharedShingleEdges(
        Tables.documents(spark, sf), "doc_id", "text",
        shingleK = 3, minShared = 3, minDf = 2, maxDf = 20)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (u, vs) => u -> vs.map(_._2).toSet }
    val want = adj.flatMap { case (u, nbrs) =>
      val two = nbrs.flatMap(adj.getOrElse(_, Set.empty)) -- nbrs - u
      if (two.nonEmpty) Some(u -> two.size.toLong) else None
    }
    assert(got === want)
  }

  // ---- q_join_bucketed ----

  test("bucketed join result equals the direct unbucketed join") {
    val got = SparkEntry.queries("q_join_bucketed")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.functions.EngineNeutral.exactSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }
}
