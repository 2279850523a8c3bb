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
  * The permutation key is the repo's mirrorable Knuth multiplicative
  * hash (q47/q72/q145's discipline — exact integer arithmetic both
  * engines compute identically, products bounded < 2^63), epoch-mixed
  * additively before the modulus. Positions come from
  * [[graft.plans.GlobalOrder]] (range-partitioned sort +
  * per-partition offsets), and because every epoch has exactly n rows
  * and epoch leads the sort, the within-epoch position is ARITHMETIC
  * on the global one — one sort for the whole multi-epoch schedule,
  * no per-epoch pass. */
object EpochShuffle {

  /** The epoch-mixed permutation key: ((id + 131071·epoch) mod
    * 1000003) · 2654435761 mod 2^32, ties broken by id downstream.
    * Collisions are fine (they only bind the tie-break); what matters
    * is that the key is reproducible and epoch-decorrelated. */
  def epochKey(id: Column, epoch: Column): Column =
    pmod(pmod(id + lit(131071L) * epoch, lit(1000003L)) * lit(2654435761L),
      lit(4294967296L))

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
