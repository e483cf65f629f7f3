package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utility for large equi-joins (SURVEY.md §7.3 rule:
  * "skewed keys → salting or AQE skew-join"). AQE's OptimizeSkewedJoin
  * handles sort-merge skew automatically at runtime; this explicit
  * salting utility is for the cases AQE cannot re-plan — e.g. a
  * shuffle-hash join forced by hints, or pre-AQE stage boundaries —
  * and as the documented manual fallback.
  *
  * Mechanics: the big side gets a uniform pseudo-random salt in
  * [0, salt); the small side is replicated `salt` times with every salt
  * value, so each (key, salt) shuffle bucket carries ~1/salt of the hot
  * key's rows. Correctness does not depend on WHICH salt a big-side row
  * gets — only uniformity matters — so the salt derives from a cheap
  * hash of the key and a per-row nonce.
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn(
      "__salt",
      pmod(hash(col(bigKey), monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn(
      "__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS
      .join(smallS, bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }
}
