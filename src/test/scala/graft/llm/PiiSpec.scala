package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "write bob.smith+1@sub.example.co.uk or 192.168.0.1 and 8.8.8.8 call +44 20 7946 0958 end"),
    (2L, "no pii in this row at all"),
    (3L, "a@b.com next to 1.2.3.4")
  ).toDF("doc_id", "text")

  test("piiStats counts emails, IPv4s, and phones per row") {
    val stats = Pii.piiStats(docs)
      .select("doc_id", "n_emails", "n_ipv4", "n_phones")
      .orderBy("doc_id").as[(Long, Int, Int, Int)].collect().toSeq
    assert(stats == Seq((1L, 1, 2, 1), (2L, 0, 0, 0), (3L, 1, 1, 0)))
  }

  test("redact masks in the fixed email -> IP -> phone order") {
    val out = Pii.redact(docs, outCol = "red")
      .orderBy("doc_id").select("red").as[String].collect().toSeq
    assert(out == Seq(
      "write <EMAIL> or <IP> and <IP> call <PHONE> end",
      "no pii in this row at all",
      "<EMAIL> next to <IP>"))
  }

  test("redact in place overwrites the text column") {
    val out = Pii.redact(docs).filter($"doc_id" === 3)
      .select("text").as[String].head()
    assert(out == "<EMAIL> next to <IP>")
  }
}
