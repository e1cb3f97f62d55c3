package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/**
 * Typed surfaces for the fixed core rows (SURVEY.md §1.4: `Dataset[T]` where
 * the schema is static and compile-time field checks help; `DataFrame`
 * everywhere the per-country schema is dynamic).
 */
object Model {

  /** TC_ENVELOPES_COMBINED row (snowflake_utils.py:414-425). */
  case class Envelope(ensemble_member: Int, wind_threshold: Int,
                      geometry: Array[Byte])

  /** TC_TRACKS row (snowflake_utils.py:317-331). */
  case class TrackPoint(ensemble_member: Int, valid_time: java.sql.Timestamp,
                        lead_time: Int, latitude: Double, longitude: Double,
                        wind_speed_knots: Double, pressure_hpa: Double,
                        geometry: Array[Byte])

  /** Per-(zone, threshold) probability row — the engine's central record. */
  case class ZoneProbability(zone_id: String, wind_threshold: Int,
                             n_members: Int, probability: Double)

  implicit val envelopeEncoder: Encoder[Envelope] = Encoders.product[Envelope]
  implicit val trackPointEncoder: Encoder[TrackPoint] = Encoders.product[TrackPoint]
  implicit val zoneProbabilityEncoder: Encoder[ZoneProbability] = Encoders.product[ZoneProbability]

  /** Typed view of a tile-view DataFrame's probability core. */
  def zoneProbabilities(tileView: org.apache.spark.sql.DataFrame): Dataset[ZoneProbability] =
    tileView.select("zone_id", "wind_threshold", "n_members", "probability")
      .as[ZoneProbability](zoneProbabilityEncoder)

  /** Typed transform example: max threshold with any hit, per zone —
    * compile-checked field access on the typed rows. */
  def maxThresholdPerZone(ds: Dataset[ZoneProbability]): Dataset[(String, Int)] = {
    implicit val e: Encoder[(String, Int)] = Encoders.tuple(Encoders.STRING, Encoders.scalaInt)
    ds.filter(_.probability > 0)
      .groupByKey(_.zone_id)(Encoders.STRING)
      .mapGroups((zone, rows) => (zone, rows.map(_.wind_threshold).max))
  }
}
