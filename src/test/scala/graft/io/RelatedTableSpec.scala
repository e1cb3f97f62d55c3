package graft.io

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

object RelatedTableSpec {
  // static: executor closures in local mode share the JVM
  val delivered = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** S17 flatten + incremental upload (geosight/admin_related_table.py,
  * upload_admin_related_table.py) over a synthetic admin_impact_views dir. */
class RelatedTableSpec extends SparkSpec {

  import spark.implicits._

  private val root = java.nio.file.Files.createTempDirectory("graft-rt").toString
  private val store = new DataStore(root)

  private def writeImpactCsv(name: String, rows: Seq[(String, Double, Double)],
                             extraMetric: Boolean = false): Unit = {
    val df = rows.toDF("tile_id", "E_population", "probability")
    val withExtra = if (extraMetric)
      df.withColumn("E_num_schools", col("E_population") / 100)
        .withColumn("not_allowed_col", lit("x")) // must not reach the wire
    else df
    store.writeSingleCsv(withExtra, s"admin_impact_views/$name")
  }

  private def seed(): Unit = if (store.list("admin_impact_views").isEmpty) {
    writeImpactCsv("SYN_ALPHA_20260801000000_34_admin1.csv",
      Seq(("r1", 100.0, 0.5), ("r2", 200.0, 0.25)))
    writeImpactCsv("SYN_ALPHA_20260801000000_64_admin1.csv",
      Seq(("r1", 50.0, 0.125)), extraMetric = true)
    writeImpactCsv("SYN_ALPHA_20260801060000_34_admin2.csv",
      Seq(("rr1", 10.0, 0.5), ("rr2", 20.0, 0.5)))
    store.writeText("admin_impact_views/SYN_ALPHA_20260801000000_admin1_cci.csv", "ignored")
    store.writeText("admin_impact_views/notes.txt", "ignored")
  }

  test("discover parses the filename contract and skips non-matching files") {
    seed()
    val all = RelatedTable.discover(store)
    assert(all.map(_.file) == Seq(
      "SYN_ALPHA_20260801000000_34_admin1.csv",
      "SYN_ALPHA_20260801000000_64_admin1.csv",
      "SYN_ALPHA_20260801060000_34_admin2.csv"))
    assert(all.head == RelatedTable.AdminImpactFile(
      "SYN_ALPHA_20260801000000_34_admin1.csv", "SYN", "ALPHA", "20260801000000", 34, 1))
    assert(RelatedTable.discover(store, adminLevel = Some(2)).map(_.level) == Seq(2))
  }

  test("rows flattens files with differing metric sets; fields typed + labeled") {
    seed()
    val flat = RelatedTable.rows(spark, store, RelatedTable.discover(store))
    assert(flat.count() == 5)
    assert(!flat.columns.contains("not_allowed_col"))
    // base properties from the filename
    val r = flat.filter(col("geom_id") === "rr1").head()
    assert(r.getAs[String]("country_code") == "SYN")
    assert(r.getAs[Int]("admin_level") == 2)
    assert(r.getAs[Int]("wind_threshold") == 34)
    assert(r.getAs[String]("forecast_time") == "2026-08-01T06:00:00")
    // metric present only in one file -> null elsewhere
    assert(flat.filter(col("E_num_schools").isNotNull).count() == 1)

    val fields = RelatedTable.fields(flat)
    assert(fields.take(6) == RelatedTable.BaseFields)
    val byName = fields.map(f => f.name -> f).toMap
    assert(byName("E_population").fieldType == "number")
    assert(byName("E_population").label == "Expected Affected Population")
    assert(byName("probability").fieldType == "number")

    val merged = RelatedTable.mergeMissingFields(
      RelatedTable.BaseFields, fields)
    assert(merged.size == fields.size) // no duplicates re-appended
  }

  test("incremental upload: forecast cutoff, signature dedup, batched send") {
    seed()
    import org.apache.spark.sql.types._
    val emptyExisting = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("storm", StringType), StructField("forecast_time", StringType),
        StructField("wind_threshold", IntegerType), StructField("geom_id", StringType))))

    RelatedTableSpec.delivered.clear()
    val (sent1, skipped1) = RelatedTable.upload(spark, store, emptyExisting,
      (batch: Seq[Row]) => batch.foreach(r => RelatedTableSpec.delivered.add(
        r.getAs[String]("storm") + "|" + r.getAs[String]("forecast_time") + "|" +
          r.getAs[Int]("wind_threshold") + "|" + r.getAs[String]("geom_id"))))
    assert(sent1 == 5 && skipped1 == 0)
    assert(RelatedTableSpec.delivered.size() == 5)

    // remote now holds everything; a re-run skips every file by forecast cutoff
    val remote = RelatedTableSpec.delivered.toArray.map(_.toString).toSeq
      .map { s => val p = s.split('|'); (p(0), p(1), p(2).toInt, p(3)) }
      .toDF("storm", "forecast_time", "wind_threshold", "geom_id")
    RelatedTableSpec.delivered.clear()
    val (sent2, skipped2) = RelatedTable.upload(spark, store, remote,
      (batch: Seq[Row]) => batch.foreach(_ => RelatedTableSpec.delivered.add("unexpected")))
    assert(sent2 == 0 && skipped2 == 3)
    assert(RelatedTableSpec.delivered.isEmpty, "nothing should be sent on re-run")

    // backfill mode re-flattens everything but the signature anti-join drops
    // every already-present row
    val (sent3, _) = RelatedTable.upload(spark, store, remote,
      (batch: Seq[Row]) => batch.foreach(_ => RelatedTableSpec.delivered.add("unexpected")),
      backfill = true)
    assert(sent3 == 0)
    assert(RelatedTableSpec.delivered.isEmpty, "dedup should drop all rows")

    // a new forecast file passes the cutoff and only its rows are sent
    writeImpactCsv("SYN_ALPHA_20260801120000_34_admin1.csv", Seq(("r9", 1.0, 0.5)))
    RelatedTableSpec.delivered.clear()
    val (sent4, skipped4) = RelatedTable.upload(spark, store, remote,
      (batch: Seq[Row]) => batch.foreach(r =>
        RelatedTableSpec.delivered.add(r.getAs[String]("geom_id"))))
    assert(sent4 == 1 && skipped4 == 3)
    assert(RelatedTableSpec.delivered.toArray.toSeq == Seq("r9"))
  }
}
