package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation for joins on hot keys (the 100 TB story's manual
  * fallback when AQE's skew-join split isn't available — e.g. bucketed
  * or pre-partitioned inputs that AQE won't re-split).
  *
  * `saltedJoin` spreads each hot key of the LEFT (large, skewed) side
  * over `salt` sub-keys and replicates the RIGHT side once per sub-key:
  * left rows get `salt_id = pmod(hash(cols…), salt)` (cheap, no extra
  * shuffle beyond the join's own), the right side explodes ×salt. Join
  * keys become (key, salt_id) — hot keys now land on `salt` reducers
  * instead of one. Semantics identical to the plain equi-join (inner /
  * left variants); the right side must be the smaller input since it is
  * replicated `salt` times.
  */
object Skew {

  private val SupportedJoinTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full-outer would surface every unmatched right row once per
    // salt replica — reject rather than silently duplicate
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin does not support '$joinType' (right side is replicated)")
    val saltCol = "__graft_salt"
    val l = left.withColumn(saltCol, pmod(hash(left.columns.map(col): _*), lit(salt)))
    val r = right.withColumn(saltCol, explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
