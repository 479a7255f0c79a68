package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (100 TB survival kit, SURVEY §4).
  *
  * AQE's skew-join handles sort-merge skew automatically when statistics
  * see it; salting is the explicit fallback when one side has pathological
  * hot keys (e.g. a null-heavy or celebrity key) and the other side is
  * small enough to replicate per salt but too big to broadcast.
  *
  * Mechanics: the probe (skewed) side gets a deterministic salt in
  * [0, saltFactor) derived from non-key columns via pmod(hash(...)); the
  * build side is exploded saltFactor× so every (key, salt) pair exists.
  * The join key becomes (key, salt) — hot keys now spread over saltFactor
  * shuffle partitions. Result multiset is identical to the unsalted join
  * (proved in PartitioningSpec).
  */
object SkewJoin {

  /** Inner equi-join of `skewed` (hot keys) with `dim` on `key`,
    * spreading each hot key over `saltFactor` partitions.
    * `saltSource` must be deterministic per row (defaults to the whole row
    * via a provided column); pass e.g. a unique id column.
    */
  def saltedInnerJoin(skewed: DataFrame, dim: DataFrame, key: String,
                      saltSource: Column, saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val exploded = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
