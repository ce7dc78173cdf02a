package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the append-batch broadcast guard: a batch-sized count keeps
  * the broadcast probe, an index-scale count degrades it to a merge
  * join instead of riding an unconditional hint into a driver OOM.
  */
class IndexAppendSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  private def hintsOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import spark.implicits._
    val right = df
    val left = Seq(1L, 2L, 3L).toDF("id")
    val joined = left.join(right, Seq("id"))
    joined.queryExecution.analyzed.collect {
      case ResolvedHint(_, info) => info.strategy.map(_.toString).getOrElse("")
      case j: Join =>
        (j.hint.leftHint.toSeq ++ j.hint.rightHint.toSeq)
          .flatMap(_.strategy.map(_.toString)).mkString(",")
    }.filter(_.nonEmpty)
  }

  test("below the cap the probe broadcasts; above it degrades to merge") {
    import spark.implicits._
    val batchIds = Seq(1L, 2L).toDF("id")
    val small = IndexAppend.probeHint(100L, "test index", "/tmp/x")(batchIds)
    assert(hintsOf(small).exists(_.toLowerCase.contains("broadcast")),
      s"batch-sized probe lost its broadcast hint: ${hintsOf(small)}")
    val big = IndexAppend.probeHint(
      IndexAppend.MaxBroadcastRows + 1, "test index", "/tmp/x")(batchIds)
    val bh = hintsOf(big)
    assert(bh.exists(_.toLowerCase.contains("merge")) &&
      !bh.exists(_.toLowerCase.contains("broadcast")),
      s"index-scale probe must fall back to merge, got: $bh")
  }
}
