package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable partial state of the geometric mean: Σ log(x) and n. */
case class GeoMeanBuf(var sumLog: Double, var n: Long)

/** Typed `Aggregator` UDAF (SURVEY.md §2B UDF-surface row): geometric mean
  * via exp(Σ log x / n). Spark runs it as a proper partial+final hash
  * aggregate — `reduce` map-side per partition, `merge` after one shuffle
  * of (sumLog, n) pairs — so the 100 TB cost is identical to a built-in
  * avg. The DuckDB oracle mirrors it as exp(avg(ln(x))); both sides round
  * to 4 decimals because summation order across partitions is not fixed.
  */
object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.sumLog += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
