package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * JSONL corpus interchange — the de-facto format for LLM training corpora
 * (one JSON document per line, typically `{"id": ..., "text": ..., meta}`).
 *
 * Reading enforces an explicit schema (NEVER schema inference at corpus
 * scale: inference is an extra full scan and web-crawl JSONL always has
 * heterogenous junk rows that widen every column to string) and keeps
 * malformed lines visible: PERMISSIVE mode lands them in
 * `_corrupt_record` so a pipeline can count/quarantine them instead of
 * silently shrinking the corpus. Both directions are plain line-splittable
 * text — a 100 TB corpus reads with one partition per HDFS/S3 block, no
 * record spans a boundary.
 */
object CorpusIo {

  final val CorruptCol = "_corrupt_record"

  /** Read a JSONL directory/file with schema enforcement. Malformed lines
    * survive as `_corrupt_record` rows (all data columns null); well-formed
    * rows have a null `_corrupt_record`. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else StructType(schema.fields :+ StructField(CorruptCol, StringType))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The clean rows (corrupt lines dropped), corrupt column removed. */
  def cleanRows(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The malformed raw lines, for quarantine/inspection. Spark refuses
    * queries that touch ONLY the corrupt column of a raw JSON scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the returned frame keeps the
    * full row; `cache()` the parsed frame first when splitting it into
    * clean + corrupt halves (one parse pass serves both). */
  def corruptRows(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)

  /** Write a frame as JSONL (one JSON object per line, Spark's native
    * multi-part layout — parallel writers, no single-file bottleneck). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
