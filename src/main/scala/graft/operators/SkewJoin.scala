package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SCALE.md): when one join key carries a
  * disproportionate share of the probe side (the reference's own country
  * distribution sends 35% of rows to one key — `silver_to_gold.py:304`)
  * and the build side is too large to broadcast, a plain shuffle join
  * sends the whole hot key to ONE reducer.
  *
  * Salting spreads it: the probe side gets a uniform salt in [0, salt);
  * the build side is replicated once per salt value; the join key becomes
  * (key, salt). Every (probe row, build row) pair still meets exactly
  * once — result multiset identical to the unsalted join — but the hot
  * key now occupies `salt` reducers.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) handles most cases at runtime; explicit salting remains
  * the tool when a single key exceeds what one task can hold even after
  * AQE splits (AQE splits partitions, not keys).
  */
object SkewJoin {

  /** Inner/left equi-join with a salted key.
    *
    * @param probe    the large, skewed side
    * @param build    the smaller (but not broadcastable) side; replicated
    *                 `salt` times
    * @param key      equi-join column present on both sides
    * @param salt     number of splits per key
    * @param joinType "inner" or "left"
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int = 8, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedProbe = probe.withColumn("_salt",
      floor(rand(seed) * salt).cast("int"))
    val replicatedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe
      .join(replicatedBuild, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
