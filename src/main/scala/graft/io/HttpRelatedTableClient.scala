package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Real HTTP transport for the S17 related-table sink (reference
 * geosight/client.py:18-199, upload_admin_related_table.py:151-291): a
 * minimal JSON-over-HTTP client speaking the GeoSight wire protocol —
 * `Authorization` + `GeoSight-User-Key` headers, paginated
 * `GET /related-tables/{id}/data/?page=N&page_size=M` reads following the
 * `results`/`next` envelope, and `POST /related-tables/{id}/data/` with a
 * `[{"properties": {...}}, ...]` payload.
 *
 * Two deliberate departures from the reference, both scale-driven:
 *
 *   - The reference POSTs one row at a time from the driver
 *     (upload_admin_related_table.py:165-171); [[sender]] posts a whole
 *     [[PartitionedSink.upload]] batch per request and runs inside
 *     `foreachPartition`, so delivery parallelism follows the data.
 *   - The reference has no retry (client.py raises on the first failure);
 *     here transient failures (HTTP 429/5xx, connect/read errors) retry
 *     with exponential backoff before failing loudly. 4xx responses other
 *     than 429 never retry — a malformed payload won't become well-formed
 *     by waiting.
 *
 * The class is `Serializable` (a handful of strings and ints) so the
 * closure returned by [[sender]] can ship to executors; connections are
 * opened per request, never held across rows.
 */
class HttpRelatedTableClient(baseUrl: String,
                             authorization: String,
                             userEmail: Option[String] = None,
                             timeoutMs: Int = 30000,
                             maxRetries: Int = 3,
                             initialBackoffMs: Long = 200) extends Serializable {

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One HTTP exchange with retry/backoff. Returns the response body. */
  def request(method: String, path: String,
              query: Seq[(String, String)] = Nil,
              body: Option[String] = None): String = {
    val qs = if (query.isEmpty) ""
      else query.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("?", "&", "")
    val url = new java.net.URI(baseUrl.stripSuffix("/") + path + qs).toURL
    var attempt = 0
    while (true) {
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod(method)
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestProperty("Accept", "application/json")
        conn.setRequestProperty("Authorization", authorization)
        userEmail.foreach(conn.setRequestProperty("GeoSight-User-Key", _))
        body.foreach { b =>
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setDoOutput(true)
          val out = conn.getOutputStream
          try out.write(b.getBytes("UTF-8")) finally out.close()
        }
        val code = conn.getResponseCode
        if (code >= 200 && code < 300) {
          val in = conn.getInputStream
          try return new String(in.readAllBytes(), "UTF-8") finally in.close()
        }
        val err = Option(conn.getErrorStream)
          .map(s => try new String(s.readAllBytes(), "UTF-8") finally s.close())
          .getOrElse("")
        val retryable = code == 429 || code >= 500
        if (!retryable || attempt >= maxRetries)
          throw new RuntimeException(
            s"related-table API $method $url failed with $code after ${attempt + 1} attempt(s): $err")
      } catch {
        case e: java.io.IOException =>
          if (attempt >= maxRetries)
            throw new RuntimeException(
              s"related-table API $method $url failed after ${attempt + 1} attempt(s): ${e.getMessage}", e)
      } finally conn.disconnect()
      Thread.sleep(initialBackoffMs << attempt) // 200, 400, 800, ...
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** JSON-safe rendering of a Spark value for a properties object. */
  private def jsonValue(v: Any): Object = v match {
    case null => null
    case n: java.lang.Number => n
    case b: java.lang.Boolean => b
    case other => other.toString
  }

  /** POST one batch as `[{"properties": {...}}, ...]`
    * (create_related_table_row, client.py:171-179 — batched). */
  def postBatch(tableId: String, batch: Seq[Row]): Unit = {
    if (batch.isEmpty) return
    val m = mapper
    val arr = m.createArrayNode()
    batch.foreach { row =>
      val props = m.createObjectNode()
      row.schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
        props.set[com.fasterxml.jackson.databind.JsonNode](
          name, m.valueToTree[com.fasterxml.jackson.databind.JsonNode](jsonValue(row.get(i))))
      }
      val entry = m.createObjectNode()
      entry.set[com.fasterxml.jackson.databind.JsonNode]("properties", props)
      arr.add(entry)
    }
    request("POST", s"/related-tables/$tableId/data/", body = Some(m.writeValueAsString(arr)))
  }

  /** The `send` function [[RelatedTable.upload]] expects: executor-side
    * batched POST with the retry policy above. */
  def sender(tableId: String): Seq[Row] => Unit =
    batch => postBatch(tableId, batch)

  /** All existing rows' properties, following `results`/`next` pagination
    * (iter_related_table_rows, client.py:153-169). Driver-side: the remote
    * table is admin-regions × storms — thousands, not billions. */
  def fetchAllRows(tableId: String, pageSize: Int = 500): Seq[Map[String, Any]] = {
    val out = Seq.newBuilder[Map[String, Any]]
    var page = 1
    var done = false
    while (!done) {
      val raw = request("GET", s"/related-tables/$tableId/data/",
        query = Seq("page" -> page.toString, "page_size" -> pageSize.toString))
      val parsed = graft.pipeline.Reports.fromJson(raw)
      val results = parsed.get("results") match {
        case Some(rs: Seq[_]) => rs.collect { case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]] }
        case _ => Nil
      }
      results.foreach { r =>
        r.get("properties") match {
          case Some(p: Map[_, _]) => out += p.asInstanceOf[Map[String, Any]]
          case _ => out += r
        }
      }
      done = results.isEmpty || parsed.get("next").forall(_ == null)
      page += 1
    }
    out.result()
  }

  /** The remote rows as a DataFrame of the signature columns, ready to be
    * the `existingRows` side of [[RelatedTable.upload]]'s anti-join. */
  def existingRows(spark: SparkSession, tableId: String,
                   pageSize: Int = 500): DataFrame = {
    import spark.implicits._
    fetchAllRows(tableId, pageSize).map { p =>
      def s(k: String) = p.get(k).map(_.toString).orNull
      (s("storm"), s("forecast_time"), s("wind_threshold"), s("geom_id"))
    }.toDF("storm", "forecast_time", "wind_threshold", "geom_id")
  }
}
