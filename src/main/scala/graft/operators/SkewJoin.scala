package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins — the fallback when AQE's
  * skew-join splitting can't apply (e.g. the skewed side feeds an
  * aggregation in the same stage, or a deterministic layout is
  * required).
  *
  * The skewed (large) side gets a deterministic salt in [0, salts)
  * hashed from its whole row; the build side is replicated `salts`
  * times. The join key becomes (key, salt), splitting each hot key's
  * rows across `salts` reducers. Result is row-identical to the
  * unsalted join.
  */
object SkewJoin {
  def saltedEquiJoin(skewed: DataFrame, build: DataFrame, key: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit every unmatched build row once per
    // salt replica — refuse rather than silently duplicate
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedEquiJoin does not support '$joinType': build-side replication " +
        "duplicates unmatched build rows under right/full outer joins")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts.toLong)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
