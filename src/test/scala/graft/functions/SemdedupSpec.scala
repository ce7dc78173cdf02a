package graft.functions

import graft.SparkTestSession
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle gates for the persisted SemDeDup index
  * ([[Semdedup]] + `Streams.semdedupIngest`): incremental verdicts
  * must EQUAL the batch dominator rule evaluated over the union, a
  * driver-side reference recomputes the whole pipeline independently,
  * replays are idempotent, and compaction preserves the member set.
  */
class SemdedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Tau = 0.9

  /** Driver-side reference: unit-normalize, assign to the unrounded
    * argmax centroid (first max on ties — array_position's rule),
    * drop iff some smaller-id same-cluster vector has r4 cosine ≥ τ.
    */
  private def reference(vecs: Seq[(Long, Array[Float])],
                        cents: Array[Array[Double]],
                        tau: Double): Map[Long, (Int, Boolean)] = {
    def unit(v: Array[Float]): Option[Array[Double]] = {
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      if (n == 0) None else Some(d.map(_ / n))
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val us = vecs.sortBy(_._1).flatMap { case (id, v) => unit(v).map(id -> _) }
    val assigned = us.map { case (id, u) =>
      val dots = cents.map(c => dot(u, c))
      (id, dots.indexOf(dots.max), u)
    }
    assigned.map { case (id, cl, u) =>
      val dropped = assigned.exists { case (j, cj, uj) =>
        j < id && cj == cl && r4(dot(uj, u)) >= tau
      }
      id -> (cl, dropped)
    }.toMap
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Boolean)] =
    df.select("vec_id", "cluster", "dropped")
      .as[(Long, Int, Boolean)].collect().map { case (i, c, d) => i -> (c, d) }.toMap

  test("dedupIncrement equals the batch dominator rule over index ∪ batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    val emb = AnnTestData.clustered(spark, n = 600, noise = 0.35)
    val base = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    Semdedup.writeIndex(base, s"$dir/index", k = 8)
    val vdir = graft.operators.Versioned.resolve(spark, s"$dir/index").get
    val cents = Semdedup.readCentroidsFrom(spark, vdir)
    val got = verdicts(Semdedup.dedupIncrement(
      batch, Semdedup.readMembersFrom(spark, vdir), Tau, cents))
    val all = emb.as[(Long, Array[Float])].collect().toSeq
    val want = reference(all, cents, Tau).filter(_._1 >= 300)
    assert(got == want, s"incremental verdicts diverge from the batch rule " +
      s"(got ${got.size} rows, want ${want.size})")
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "degenerate gate: need both dropped and kept vectors")
  }

  test("appendIndex is first-delivery-wins: replays grow nothing, verdicts stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup2").toString
    val emb = AnnTestData.clustered(spark, n = 400)
    val base = emb.filter(col("vec_id") < 200)
    val batch = emb.filter(col("vec_id") >= 200)
    Semdedup.writeIndex(base, s"$dir/index", k = 8)
    def members() = {
      val vd = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      Semdedup.readMembersFrom(spark, vd)
    }
    val cents = Semdedup.readCentroidsFrom(
      spark, graft.operators.Versioned.resolve(spark, s"$dir/index").get)
    val before = verdicts(Semdedup.dedupIncrement(batch, members(), Tau, cents))
    Semdedup.appendIndex(batch, s"$dir/index")
    val n1 = members().count()
    assert(n1 == 400, s"index must hold one row per vector id, got $n1")
    Semdedup.appendIndex(batch, s"$dir/index") // replay
    assert(members().count() == n1, "replayed append must commit nothing")
    // re-scoring after the batch's own append: ids never match
    // themselves (strict smaller-id filter), so verdicts are stable
    val after = verdicts(Semdedup.dedupIncrement(batch, members(), Tau, cents))
    assert(after == before, "verdicts changed after self-append")
  }

  test("semdedupIngest: micro-batches + redelivery equal the batch rule; index self-heals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup3").toString
    val emb = AnnTestData.clustered(spark, n = 600, noise = 0.35)
    Semdedup.writeIndex(emb.filter(col("vec_id") < 240), s"$dir/index", k = 8)
    val rows = emb.filter(col("vec_id") >= 240)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (b1, rest) = rows.splitAt(120)
    val (b2, b3) = rest.splitAt(120)
    val ch = Streams.Channel[(Long, Array[Float])](spark)
    ch.send(b1: _*)
    val q = Streams.semdedupIngest(ch.toDS.toDF("vec_id", "embedding"),
      s"$dir/index", s"$dir/out", s"$dir/ckpt", Tau)
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      ch.send(b3: _*)
      q.processAllAvailable()
      val vdir = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      assert(Semdedup.readMembersFrom(spark, vdir).count() == 600)
      val cents = Semdedup.readCentroidsFrom(spark, vdir)
      val want = reference(emb.as[(Long, Array[Float])].collect().toSeq,
        cents, Tau).filter(_._1 >= 240)
      val streamed = verdicts(spark.read.parquet(s"$dir/out"))
      assert(streamed == want,
        "streamed verdicts diverge from the batch dominator rule")
      // at-least-once redelivery: new batch_id, value-identical
      // verdicts (larger-id members never affect a smaller id), and
      // the index grows by nothing
      ch.send(b2: _*)
      q.processAllAvailable()
      val vdir2 = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      assert(Semdedup.readMembersFrom(spark, vdir2).count() == 600,
        "redelivery must append nothing")
      val redelivered = spark.read.parquet(s"$dir/out")
        .groupBy("vec_id", "cluster", "dropped")
        .agg(countDistinct("batch_id").as("nb"))
      val b2ids = b2.map(_._1).toSet
      val dup = redelivered.filter(col("nb") >= 2)
        .select("vec_id").as[Long].collect().toSet
      assert(dup == b2ids,
        "re-delivered rows must reappear VALUE-IDENTICAL under a new batch_id")
    } finally q.stop()
  }

  test("compactIndex folds deltas, preserving members and centroids exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup4").toString
    val emb = AnnTestData.clustered(spark, n = 400)
    Semdedup.writeIndex(emb.filter(col("vec_id") < 200), s"$dir/index", k = 8)
    Semdedup.appendIndex(emb.filter(col("vec_id") >= 200), s"$dir/index")
    def state() = {
      val vd = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      (Semdedup.readMembersFrom(spark, vd)
         .select("vec_id", "cluster", "u")
         .as[(Long, Int, Array[Double])].collect()
         .map { case (i, c, u) => (i, c, u.toSeq) }.toSet,
       Semdedup.readCentroidsFrom(spark, vd).map(_.toSeq).toSeq,
       graft.operators.Versioned.listDeltas(spark, vd).size)
    }
    val (m0, c0, d0) = state()
    assert(d0 == 1, s"expected one delta before compaction, got $d0")
    Semdedup.compactIndex(spark, s"$dir/index")
    val (m1, c1, d1) = state()
    assert(d1 == 0, "compacted version must be deltaless")
    assert(m1 == m0, "compaction changed the member set")
    assert(c1 == c0, "compaction changed the centroids")
  }

  test("oversized batches fall back to merge joins with identical verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup6").toString
    val emb = AnnTestData.clustered(spark, n = 400)
    val batch = emb.filter(col("vec_id") >= 200)
    Semdedup.writeIndex(emb.filter(col("vec_id") < 200), s"$dir/index", k = 8)
    val vd = graft.operators.Versioned.resolve(spark, s"$dir/index").get
    val cents = Semdedup.readCentroidsFrom(spark, vd)
    val viaBroadcast = verdicts(Semdedup.dedupIncrement(
      batch, Semdedup.readMembersFrom(spark, vd), Tau, cents))
    spark.conf.set("spark.graft.semdedup.maxBroadcastBatchRows", "1")
    try {
      val viaMerge = verdicts(Semdedup.dedupIncrement(
        batch, Semdedup.readMembersFrom(spark, vd), Tau, cents))
      assert(viaMerge == viaBroadcast && viaMerge.nonEmpty,
        "the no-broadcast fallback changed verdicts")
      // append path too: the merge-joined dedup must still be
      // first-delivery-wins idempotent
      Semdedup.appendIndex(batch, s"$dir/index")
      assert(Semdedup.readMembersFrom(spark, vd).count() == 400)
      Semdedup.appendIndex(batch, s"$dir/index")
      assert(Semdedup.readMembersFrom(spark, vd).count() == 400)
    } finally spark.conf.unset("spark.graft.semdedup.maxBroadcastBatchRows")
  }

  test("retrainIndex: verdicts equal a fresh rebuild over the same members") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup5").toString
    val emb = AnnTestData.clustered(spark, n = 600, noise = 0.35)
    Semdedup.writeIndex(emb.filter(col("vec_id") < 300), s"$dir/index", k = 4)
    Semdedup.appendIndex(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 480), s"$dir/index")
    val probe = emb.filter(col("vec_id") >= 480)
    val oldV = graft.operators.Versioned.resolve(spark, s"$dir/index").get
    // retrain with a k sized for the grown index (SemDeDup's k ~ √n)
    val newV = Semdedup.retrainIndex(spark, s"$dir/index", k = 8)
    assert(newV != oldV)
    assert(graft.operators.Versioned.resolve(spark, s"$dir/index").contains(newV))
    assert(graft.operators.Versioned.listDeltas(spark, newV).isEmpty)
    assert(Semdedup.readMembersFrom(spark, newV).count() == 480)
    val newCents = Semdedup.readCentroidsFrom(spark, newV)
    assert(newCents.length == 8)
    // equality with writeIndex over the SAME member rows the retrain
    // consumed (the OLD version's — newV's u are re-normalized once
    // more, last-bit different): identical inputs → deterministic
    // trainCentroids → identical state/verdicts
    val membersAsCorpus = Semdedup.readMembersFrom(spark, oldV)
      .select(col("vec_id"), col("u").as("embedding"))
    Semdedup.writeIndex(membersAsCorpus, s"$dir/rebuild", k = 8)
    val rv = graft.operators.Versioned.resolve(spark, s"$dir/rebuild").get
    assert(Semdedup.readCentroidsFrom(spark, rv).map(_.toSeq).toSeq ==
      newCents.map(_.toSeq).toSeq)
    val a = verdicts(Semdedup.dedupIncrement(
      probe, Semdedup.readMembersFrom(spark, newV), Tau, newCents))
    val b = verdicts(Semdedup.dedupIncrement(
      probe, Semdedup.readMembersFrom(spark, rv), Tau,
      Semdedup.readCentroidsFrom(spark, rv)))
    assert(a == b && a.nonEmpty, "post-retrain increments diverge from rebuild")
    // the superseded version stays intact for in-flight readers
    assert(Semdedup.readMembersFrom(spark, oldV).count() == 480)
    assert(new java.io.File(s"$oldV/_COMMITTED").exists())
  }
}
