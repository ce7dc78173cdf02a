package graft.plans

import graft.SparkTestSession
import org.apache.spark.SparkException
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withGuard(mode: String)(f: => Unit): Unit = {
    ScaleGuard.register(spark)
    spark.conf.set("spark.graft.scaleGuard", mode)
    try f
    finally {
      spark.conf.set("spark.graft.scaleGuard", "warn")
      ScaleGuard.unregister(spark)
    }
  }

  private def globalWindow() =
    Seq((1, 1.0), (2, 2.0)).toDF("id", "v")
      .withColumn("rk", rank().over(Window.orderBy($"v")))

  test("fail mode refuses an empty-partition window plan") {
    withGuard("fail") {
      val ex = intercept[SparkException] { globalWindow().collect() }
      assert(ex.getMessage.contains("ScaleGuard"))
      assert(ex.getMessage.contains("ONE task"))
    }
  }

  test("partitioned windows pass in fail mode") {
    withGuard("fail") {
      val got = Seq((1, 1.0), (1, 2.0), (2, 9.0)).toDF("id", "v")
        .withColumn("rk", rank().over(Window.partitionBy($"id").orderBy($"v")))
        .count()
      assert(got == 3)
    }
  }

  test("off mode lets a global window through") {
    withGuard("off") {
      assert(globalWindow().count() == 2)
    }
  }

  test("warn mode (default) does not block execution") {
    withGuard("warn") {
      assert(globalWindow().count() == 2)
    }
  }

  test("fail mode refuses a window partitioned by a hash-derived key, even renamed") {
    withGuard("fail") {
      // parquet-backed source: a local relation would be constant-
      // folded and the hash alias erased before the lint runs
      val ex = intercept[SparkException] {
        graft.Tables.documents(spark, "/root/testdata/sf0.001")
          .withColumn("k", xxhash64($"text"))
          .withColumnRenamed("k", "bucket") // renaming must not hide it
          .withColumn("df", count(lit(1)).over(Window.partitionBy($"bucket")))
          .collect()
      }
      assert(ex.getMessage.contains("hash-derived"))
      assert(ex.getMessage.contains("joinKeyStats"))
    }
  }

  test("windows over natural (non-hash) keys still pass in fail mode") {
    withGuard("fail") {
      val got = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("id", "pos")
        .withColumn("rk", rank().over(Window.partitionBy($"id").orderBy($"pos")))
        .count()
      assert(got == 3)
    }
  }

  test("fail mode refuses a join with no cross-side equality") {
    withGuard("fail") {
      val a = Seq((1, 10.0), (2, 20.0)).toDF("ida", "va")
      val b = Seq((1, 5.0), (2, 25.0)).toDF("idb", "vb")
      val ex = intercept[SparkException] {
        a.join(b, $"va" < $"vb").collect()
      }
      assert(ex.getMessage.contains("cartesian"))
    }
  }

  test("equi joins with range residuals pass in fail mode") {
    withGuard("fail") {
      val a = Seq((1, 10.0), (2, 20.0)).toDF("ida", "va")
      val b = Seq((1, 5.0), (2, 25.0)).toDF("idb", "vb")
      assert(a.join(b, $"ida" === $"idb" && $"va" < $"vb").count() == 1)
    }
  }

  test("a Not(EqualTo) condition is not an equi-key: fail mode refuses it") {
    withGuard("fail") {
      val a = Seq((1, 10.0), (2, 20.0)).toDF("ida", "va")
      val b = Seq((1, 5.0), (2, 25.0)).toDF("idb", "vb")
      val ex = intercept[SparkException] {
        a.join(b, $"ida" =!= $"idb").collect()
      }
      assert(ex.getMessage.contains("cartesian"))
    }
  }

  test("explicitly broadcast-hinted nested-loop joins pass in fail mode") {
    withGuard("fail") {
      val corpus = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("ida", "va")
      val queries = Seq((1, 5.0), (2, 25.0)).toDF("idb", "vb")
      // the deliberate brute-force shape: bounded broadcast side
      assert(corpus.join(broadcast(queries), $"ida" =!= $"idb").count() == 4)
    }
  }

  test("broadcast-scalar cross joins (<=1-row side) pass in fail mode") {
    withGuard("fail") {
      val rows = Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
      val scalar = rows.agg(max($"v").as("mx"))
      assert(rows.crossJoin(scalar).count() == 2)
    }
  }

  test("register is idempotent and unregister removes the rule") {
    ScaleGuard.register(spark)
    ScaleGuard.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[ScaleGuardRule]) == 1)
    ScaleGuard.unregister(spark)
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[ScaleGuardRule]))
  }

  test("auditPhysical flags a shuffle join whose side was broadcastable") {
    import spark.implicits._
    val big = (1L to 10000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val small = (1L to 50L).toDF("k2")
    // force the miss: broadcasts disabled, so the planner must
    // shuffle both sides of an equi-join with a tiny right side
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = big.join(small, $"k" === $"k2")
      val findings = ScaleGuard.auditPhysical(df, broadcastableBytes = 10L * 1024 * 1024)
      assert(findings.nonEmpty, df.queryExecution.sparkPlan.toString)
      assert(findings.head.contains("broadcast was missed"))
      // clean case: both sides declared "too big" for the passed
      // threshold -> nothing to flag
      assert(ScaleGuard.auditPhysical(df, broadcastableBytes = 1L).isEmpty)
    }
  }

  test("auditPhysical respects join-type legality: small PRESERVED outer side is not a miss") {
    import spark.implicits._
    val big = (1L to 10000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val small = (1L to 50L).toDF("k2")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // left-outer with the SMALL side on the left (preserved): Spark
      // can only broadcast the right side here, so SMJ is the only
      // legal plan — not a miss. Threshold 100 KB: small ≈ 800 B is
      // under it, big ≈ 240 KB is above, so only legality decides.
      val preserved = small.join(big, $"k2" === $"k", "left_outer")
      assert(ScaleGuard.auditPhysical(preserved, 100L * 1024).isEmpty,
        preserved.queryExecution.sparkPlan.toString)
      // flip it: small side on the right IS broadcastable — a real miss
      val missed = big.join(small, $"k" === $"k2", "left_outer")
      assert(ScaleGuard.auditPhysical(missed, 100L * 1024).nonEmpty)
    }
  }

  test("auditPhysical still sees misses when the session disables broadcasts") {
    import spark.implicits._
    val big = (1L to 10000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val small = (1L to 50L).toDF("k2")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // no explicit threshold passed: the audit falls back to the
      // stock 10 MB reference instead of going blind — the disabled
      // threshold is precisely the misconfiguration it must catch
      val df = big.join(small, $"k" === $"k2")
      assert(ScaleGuard.auditPhysical(df).nonEmpty)
    }
  }

  test("auditPhysical is silent on a broadcast join") {
    import spark.implicits._
    val big = (1L to 10000L).map(i => (i, i * 2.0)).toDF("k", "v")
    val small = (1L to 50L).toDF("k2")
    val df = big.join(org.apache.spark.sql.functions.broadcast(small), $"k" === $"k2")
    assert(ScaleGuard.auditPhysical(df, broadcastableBytes = 10L * 1024 * 1024).isEmpty)
  }

  test("auditBroadcastGenerate flags an exploded build side, exempts hinted ones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = (1L to 20000L).map(i => (i % 500, i)).toDF("k", "x")
    // a tiny agg whose explode multiplies it ~1000x: stats see the
    // pre-explode size, so the planner broadcasts the exploded side
    val grid = fact.groupBy("k").agg(min("x").as("lo"))
      .select($"k", explode(sequence($"lo", $"lo" + 999)).as("g"))
    val joined = fact.join(grid, Seq("k"))
    val findings = ScaleGuard.auditBroadcastGenerate(joined)
    assert(findings.nonEmpty, joined.queryExecution.sparkPlan.toString)
    assert(findings.head.contains("Generate"))
    // the same shape explicitly hinted is a conscious opt-in
    val hintedJoin = fact.join(broadcast(grid), Seq("k"))
    assert(ScaleGuard.auditBroadcastGenerate(hintedJoin).isEmpty,
      hintedJoin.queryExecution.sparkPlan.toString)
    // but exemptHinted=false still reports it
    assert(ScaleGuard.auditBroadcastGenerate(hintedJoin, exemptHinted = false).nonEmpty)
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
