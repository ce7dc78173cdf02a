package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedEquiJoin is row-identical to the plain join") {
    // skewed: 90% of rows share key 1
    val skewed = ((1 to 90).map(i => (1L, s"v$i")) ++ (1 to 10).map(i => (i.toLong + 1, s"w$i")))
      .toDF("k", "payload")
    val dim = (1L to 11L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).as[(Long, String, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, "k", salts = 8)
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salted left join preserves unmatched rows") {
    val skewed = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "p")
    val dim = Seq((1L, "d")).toDF("k", "n")
    val res = SkewJoin.saltedEquiJoin(skewed, dim, "k", salts = 4, joinType = "left")
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(res == Seq((1L, "a", Some("d")), (99L, "nomatch", None)))
  }

  test("bucketed join plans with no Exchange on either side") {
    // clean orphaned managed-table locations from previous JVMs (the
    // in-memory catalog forgets them but the warehouse dir persists)
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    val a = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i % 50, -i)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bucketed_a", "k", 4)
    Bucketing.writeBucketed(b, "bucketed_b", "k", 4)
    // force a sort-merge join (tiny test tables would broadcast,
    // which never consults bucketing) and assert zero shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 20000) // 20 rows per key each side / 50 keys
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("GraftExtensions registers SQL functions") {
    graft.plans.GraftExtensions.register(spark)
    val fp = spark.sql("SELECT rolling_hash('hello world') AS fp").as[Long].head()
    val ref = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
    assert(fp == ref)
    val d = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").as[Double].head()
    assert(d == 11.0)
  }
}
