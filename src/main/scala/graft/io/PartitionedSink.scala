package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Push-style record sink (S17; reference GeoSight REST upload,
 * geosight/upload_admin_related_table.py:151-291): rows are flattened to a
 * wire signature, already-uploaded signatures are removed by anti-join
 * (J14), and the remainder is delivered per partition in bounded batches —
 * the `foreachPartition` HTTP-sink shape. The transport is pluggable; tests
 * use an in-memory/file transport (no network in this environment).
 */
object PartitionedSink {

  /** Row signature (geosight/admin_related_table.py:62-68):
    * storm|forecast_time|wind_threshold|geom_id. */
  def signature(cols: Seq[String]): org.apache.spark.sql.Column =
    concat_ws("|", cols.map(col): _*)

  /**
   * @param existingSignatures signatures already present remotely
   * @param send per-batch delivery callback (runs on executors)
   * @return number of rows sent
   */
  def upload(df: DataFrame, sigCols: Seq[String],
             existingSignatures: DataFrame,
             batchSize: Int,
             send: Seq[Row] => Unit): Long = {
    val withSig = df.withColumn("__sig", signature(sigCols))
    val fresh = withSig.join(
      existingSignatures.select(col(existingSignatures.columns.head).as("__sig")),
      Seq("__sig"), "left_anti").drop("__sig")
    val sent = fresh.sparkSession.sparkContext.longAccumulator("sink_rows_sent")
    fresh.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { batch =>
        send(batch)
        sent.add(batch.size)
      }
    }
    sent.value
  }
}
