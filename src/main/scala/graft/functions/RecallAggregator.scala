package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (Aggregator[IN, BUF, OUT]) computing mean recall over
  * (retrieved, truth) id-set pairs — the engine's quality metric for
  * ANN backends (SURVEY §2.2 "UDF/UDAF surface"). Partial-aggregation
  * friendly: the buffer is two longs, merged associatively, so Spark
  * plans it with map-side combine like any built-in aggregate.
  */
object RecallAggregator extends Aggregator[(Seq[Long], Seq[Long]), (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Seq[Long], Seq[Long])): (Long, Long) = {
    val (retrieved, truth) = in
    val hit = truth.count(retrieved.toSet)
    (b._1 + hit, b._2 + truth.size)
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) 0.0 else r._1.toDouble / r._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
