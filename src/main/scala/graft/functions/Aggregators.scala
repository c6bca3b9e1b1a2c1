package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 Q44): custom aggregates as
  * `Aggregator[IN, BUF, OUT]`, registered per-query with
  * `functions.udaf`. Partial aggregation (map-side combine) comes free
  * from the reduce/merge split — the property that matters at scale.
  */
object Aggregators {

  final case class WPoint(x: Double, w: Double)

  /** Weighted mean Σxw/Σw. reduce folds rows into a per-partition
    * partial; merge combines partials (commutative + associative).
    */
  object WeightedAvg extends Aggregator[WPoint, (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: WPoint): (Double, Double) =
      (b._1 + a.x * a.w, b._2 + a.w)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(b: (Double, Double)): Double = b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
