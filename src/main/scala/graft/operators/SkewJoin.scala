package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. When one join key dominates (a hot
 * user, a null-ish sentinel), the shuffle sends that key's entire volume
 * to one reducer. Salting splits each left key into `factor` sub-keys
 * (deterministically, by hashing a distinguishing left column) and
 * replicates the right side `factor` times, so the hot key fans out over
 * `factor` reducers. AQE's skew-join handles sort-merge cases adaptively;
 * this is the explicit, planner-independent form (and works for
 * shuffled-hash joins and in non-AQE contexts).
 *
 * Semantics: identical to `left.join(right, leftKey === rightKey, inner)`.
 */
object SkewJoin {

  /**
   * @param saltOn a left column whose hash spreads rows of the same key
   *               (e.g. the left table's primary key)
   */
  def salted(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltOn: String,
      factor: Int = 8): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(col(saltOn)), lit(factor)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until factor).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
