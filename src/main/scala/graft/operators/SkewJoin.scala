package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join splitting handles moderate skew by splitting
  * oversized partitions, but a single hot key still lands every probe
  * row for that key in tasks that all read the same build rows. Salting
  * breaks the hot key itself: the probe side gets a uniform random salt
  * in [0, S), the build side is replicated S ways, and the join key
  * becomes (key, salt) — each hot key now spreads over S tasks at the
  * cost of an S× replication of the (small) build side.
  *
  * Result-equivalent to `large.join(small, key)` for inner joins.
  */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16, seed: Long = 42L): DataFrame = {
    require(saltBuckets > 0)
    val salted = large.withColumn(
      "__salt", (rand(seed) * saltBuckets).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
