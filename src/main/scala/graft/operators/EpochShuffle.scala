package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, RESUMABLE training-data order: every epoch is a
  * seeded pseudo-random permutation of the corpus, computed as pure
  * hash arithmetic on (epoch, id) — no RNG state, no materialized
  * shuffle files — so any worker can recompute any slice of any epoch
  * (the "deterministic data order" contract checkpoint-resumable
  * training loops need: resume = a filter on (epoch, position), never
  * a replay).
  *
  * The permutation key is a CRT pair of mirrorable multiplicative
  * rounds (q47/q72/q145's exact-integer discipline — products bounded
  * < 2^63 in both engines), epoch-mixed additively before each
  * modulus; see [[epochKey]] for the injectivity argument. Positions
  * come from
  * [[graft.plans.GlobalOrder]] (range-partitioned sort +
  * per-partition offsets), and because every epoch has exactly n rows
  * and epoch leads the sort, the within-epoch position is ARITHMETIC
  * on the global one — one sort for the whole multi-epoch schedule,
  * no per-epoch pass. */
object EpochShuffle {

  /** The epoch-mixed permutation key: two independent multiplicative
    * rounds modulo distinct 31-bit primes, CRT-combined —
    * k1 = ((id + 131071·epoch) mod p1)·M1 mod p1,
    * k2 = ((id + 524287·epoch) mod p2)·M2 mod p2, key = k1·p2 + k2
    * with p1 = 2147483647, p2 = 2147483629, M1 = 2654435761,
    * M2 = 2246822519. Every intermediate product is < 2^63, so the
    * arithmetic is EXACT integer math both engines compute identically
    * (the q47 mirrorability contract, without DuckDB overflow). Each
    * round is a bijection of its residue ring (gcd(M, p) = 1 and the
    * epoch shift is additive), so by CRT the pair (k1, k2) — hence the
    * combined key — is INJECTIVE over ids within any single epoch up
    * to p1·p2 ≈ 4.6e18: a true permutation key at any corpus size,
    * not a hash that degrades to id-order runs once ids outnumber the
    * key space (the pre-round-10 mod-1000003 key collided every
    * ~n/1e6 ids at the 1e9-doc scale the 100 TB story targets, and
    * the id tie-break served those runs in ascending-id order). */
  def epochKey(id: Column, epoch: Column): Column = {
    val k1 = pmod(pmod(id + lit(131071L) * epoch, lit(2147483647L))
      * lit(2654435761L), lit(2147483647L))
    val k2 = pmod(pmod(id + lit(524287L) * epoch, lit(2147483629L))
      * lit(2246822519L), lit(2147483629L))
    k1 * lit(2147483629L) + k2
  }

  /** The full `numEpochs`-epoch schedule: (epoch, position, id, key)
    * with position 1..n within each epoch. */
  def schedule(df: DataFrame, numEpochs: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(numEpochs >= 1, s"numEpochs must be >= 1, got $numEpochs")
    val n = df.count()
    val keyed = df.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0), lit(numEpochs - 1))))
      .withColumn("hk", epochKey(col(idCol), col("epoch")))
    graft.plans.GlobalOrder
      .withPositions(keyed, Seq(col("epoch"), col("hk"), col(idCol)))
      .withColumn("position", col("__pos") - col("epoch") * n)
      .select(col("epoch"), col("position"), col(idCol), col("hk"))
  }

  /** Resume the schedule after a checkpoint at (epoch, position):
    * everything strictly later, in order — a filter, not a replay. */
  def resumeFrom(sched: DataFrame, epoch: Int, position: Long): DataFrame =
    sched.filter(col("epoch") > epoch ||
        (col("epoch") === epoch && col("position") > position))
      .orderBy(col("epoch"), col("position"))
}
