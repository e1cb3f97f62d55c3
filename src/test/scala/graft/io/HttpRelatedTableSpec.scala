package graft.io

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

object HttpRelatedTableSpec {
  // static: executor closures in local mode share the JVM with the stub
  val postedBodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val postAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
  val failFirst = new java.util.concurrent.atomic.AtomicInteger(0)
  val getPages = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** S17 HTTP transport against a local stub server: batched POST with
  * retry/backoff on 429/5xx, fail-loud on 4xx, and `results`/`next`
  * pagination on reads (reference geosight/client.py:44-199). */
class HttpRelatedTableSpec extends SparkSpec {

  import HttpRelatedTableSpec._
  import spark.implicits._

  // 35 remote rows: pagination needs >1 page at page_size 10
  private val remoteProps = (1 to 35).map { i =>
    s"""{"properties":{"storm":"ALPHA","forecast_time":"2026-08-01T00:00:00","wind_threshold":34,"geom_id":"r$i"}}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val os = ex.getResponseBody; os.write(bytes); os.close() }
    ex.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/related-tables/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = ex.getRequestMethod match {
        case "POST" =>
          assert(ex.getRequestHeaders.getFirst("Authorization") == "test-key")
          assert(ex.getRequestHeaders.getFirst("GeoSight-User-Key") == "who@example.org")
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          postAttempts.incrementAndGet()
          if (failFirst.getAndDecrement() > 0) respond(ex, 503, """{"detail":"busy"}""")
          else if (body.contains("POISON")) respond(ex, 400, """{"detail":"bad row"}""")
          else { postedBodies.add(body); respond(ex, 200, "[]") }
        case "GET" =>
          getPages.incrementAndGet()
          val q = Option(ex.getRequestURI.getQuery).getOrElse("")
          val params = q.split("&").filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v }.toMap
          val page = params.getOrElse("page", "1").toInt
          val size = params.getOrElse("page_size", "100").toInt
          val slice = remoteProps.slice((page - 1) * size, page * size)
          val next = if (page * size < remoteProps.length) s""""page=${page + 1}"""" else "null"
          respond(ex, 200,
            s"""{"count":${remoteProps.length},"next":$next,"results":[${slice.mkString(",")}]}""")
        case other => respond(ex, 405, s"""{"detail":"$other not allowed"}""")
      }
    })
    s.start()
    s
  }

  private def client(retries: Int = 3) = new HttpRelatedTableClient(
    s"http://127.0.0.1:${server.getAddress.getPort}", "test-key",
    Some("who@example.org"), maxRetries = retries, initialBackoffMs = 5)

  test("paginated read follows results/next across pages") {
    getPages.set(0)
    val rows = client().fetchAllRows("42", pageSize = 10)
    assert(rows.length == 35)
    assert(getPages.get() == 4) // 10+10+10+5
    assert(rows.head("geom_id") == "r1" && rows.last("geom_id") == "r35")
    val df = client().existingRows(spark, "42", pageSize = 10)
    assert(df.count() == 35)
    assert(df.schema.fieldNames.toSeq ==
      Seq("storm", "forecast_time", "wind_threshold", "geom_id"))
  }

  test("batched POST retries 5xx with backoff then delivers exactly once") {
    postedBodies.clear(); postAttempts.set(0); failFirst.set(2)
    val df = Seq(("ALPHA", "2026-08-02T00:00:00", 34, "g1", 123.0),
                 ("ALPHA", "2026-08-02T00:00:00", 64, "g2", 45.5))
      .toDF("storm", "forecast_time", "wind_threshold", "geom_id", "E_population")
    val sent = PartitionedSink.upload(df.coalesce(1),
      RelatedTable.SignatureCols,
      spark.emptyDataset[String].toDF("sig"),
      batchSize = 10, client().sender("42"))
    assert(sent == 2)
    assert(postAttempts.get() == 3)   // 503, 503, 200
    assert(postedBodies.size() == 1)  // one batch, delivered once
    val body = postedBodies.peek()
    assert(body.contains(""""properties""""))
    assert(body.contains(""""E_population":123.0""") && body.contains(""""geom_id":"g2""""))
  }

  test("retry budget exhausts loudly on persistent 5xx") {
    postAttempts.set(0); failFirst.set(100)
    val e = intercept[org.apache.spark.SparkException] {
      PartitionedSink.upload(
        Seq(("A", "t", 34, "g", 1.0))
          .toDF("storm", "forecast_time", "wind_threshold", "geom_id", "E_population")
          .coalesce(1),
        RelatedTable.SignatureCols, spark.emptyDataset[String].toDF("sig"),
        10, client(retries = 2).sender("42"))
    }
    assert(e.getMessage.contains("503") || e.getCause.getMessage.contains("503"))
    assert(postAttempts.get() == 3) // initial + 2 retries, then fail
    failFirst.set(0)
  }

  test("4xx is not retried") {
    postAttempts.set(0); failFirst.set(0)
    intercept[org.apache.spark.SparkException] {
      PartitionedSink.upload(
        Seq(("POISON", "t", 34, "g", 1.0))
          .toDF("storm", "forecast_time", "wind_threshold", "geom_id", "E_population")
          .coalesce(1),
        RelatedTable.SignatureCols, spark.emptyDataset[String].toDF("sig"),
        10, client().sender("42"))
    }
    assert(postAttempts.get() == 1)
  }

  test("end-to-end: remote pagination feeds the anti-join, only fresh rows POST") {
    postedBodies.clear(); postAttempts.set(0); failFirst.set(0)
    val root = java.nio.file.Files.createTempDirectory("graft-http-rt").toString
    val store = new DataStore(root)
    // r1 collides with a remote signature (ALPHA|2026-08-01T00:00:00|34|r1
    // after the filename's compact→ISO formatting); fresh1 is new
    store.writeSingleCsv(
      Seq(("r1", 100.0), ("fresh1", 200.0)).toDF("tile_id", "E_population"),
      "admin_impact_views/SYN_ALPHA_20260801000000_34_admin1.csv")
    val cl = client()
    val existing = cl.existingRows(spark, "42")
    // backfill=true bypasses the latest-forecast cutoff (the remote already
    // has 2026-08-01) but the signature anti-join still applies: r1 is
    // skipped, only fresh1 goes over the wire
    val (sentCount, _) = RelatedTable.upload(spark, store, existing,
      cl.sender("42"), backfill = true)
    assert(sentCount == 1)
    val body = postedBodies.peek()
    assert(body.contains("fresh1") && !body.contains(""""geom_id":"r1""""))
  }
}
