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

  test("register is idempotent and unregister removes the rule") {
    ScaleGuard.register(spark)
    ScaleGuard.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[ScaleGuardRule]) == 1)
    ScaleGuard.unregister(spark)
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[ScaleGuardRule]))
  }
}
