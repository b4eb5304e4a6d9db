package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Qdrant FORMULA-QUERY DECAY KERNELS (`lin_decay` / `exp_decay` /
  * `gauss_decay` — the documented score-boosting functions of the
  * /points/query `formula` object, used to rerank by freshness or
  * proximity): each maps a numeric column to [0, 1] with
  * `decay(target) = 1` and `decay(target ± scale) = midpoint`,
  * differing in shape — linear clamps to 0 past its zero crossing,
  * exponential decays by |x − target|, gaussian by (x − target)².
  * Datetime callers pass the column as epoch seconds/micros (Qdrant's
  * datetime decays are the same kernels over the time axis).
  *
  * All three compile to plain codegen'd arithmetic with the λ constant
  * folded DRIVER-side; the linear kernel is pure multiply-subtract-max
  * (engine-exact IEEE, the oracle-row discipline), the exp/gauss
  * kernels go through libm `exp` (round transcendental outputs before
  * cross-engine comparison — the cosine-row discipline).
  */
object Formulas {

  private def requireParams(scale: Double, midpoint: Double): Unit = {
    require(scale > 0, s"decay scale must be > 0 (got $scale)")
    require(midpoint > 0 && midpoint < 1,
      s"decay midpoint must be in (0, 1) (got $midpoint)")
  }

  /** `lin_decay`: max(0, 1 − |x − target| · (1 − midpoint) / scale). */
  def linDecay(x: Column, target: Double, scale: Double,
               midpoint: Double = 0.5): Column = {
    requireParams(scale, midpoint)
    greatest(lit(0.0),
      lit(1.0) - abs(x - lit(target)) * lit((1.0 - midpoint) / scale))
  }

  /** `exp_decay`: exp(ln(midpoint) / scale · |x − target|). */
  def expDecay(x: Column, target: Double, scale: Double,
               midpoint: Double = 0.5): Column = {
    requireParams(scale, midpoint)
    exp(lit(math.log(midpoint) / scale) * abs(x - lit(target)))
  }

  /** Qdrant formula `geo_distance`: great-circle meters from a fixed
    * reference point — the distance axis the decay kernels compose
    * with (boost-by-proximity). Delegates to the haversine the geo
    * payload kind serves, so formula scores and geo_radius filters
    * agree on the same meters.
    */
  def geoDistance(latC: Column, lonC: Column,
                  lat: Double, lon: Double): Column = {
    require(lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180,
      s"geo_distance reference out of range: ($lat, $lon)")
    graft.api.PayloadIndex.haversineMeters(latC, lonC, lat, lon)
  }

  /** `gauss_decay`: exp(ln(midpoint) / scale² · (x − target)²). */
  def gaussDecay(x: Column, target: Double, scale: Double,
                 midpoint: Double = 0.5): Column = {
    requireParams(scale, midpoint)
    exp(lit(math.log(midpoint) / (scale * scale)) *
      (x - lit(target)) * (x - lit(target)))
  }
}
