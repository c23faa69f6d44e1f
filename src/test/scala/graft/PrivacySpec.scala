package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("piiScrub counts and redacts emails, phones, IPs") {
    val docs = Seq(
      (1L, "reach me at jo.doe+x@sub.example.org or 555-123-4567 from 192.168.0.1"),
      (2L, "no pii here just words"),
      (3L, "two mails a@b.co c@d.io one ip 10.0.0.255"),
      (4L, "")).toDF("doc_id", "text")
    val out = Privacy.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 1 && out(1L).getInt(3) == 1)
    assert(out(1L).getString(4) == "reach me at <EMAIL> or <PHONE> from <IP>")
    assert(out(2L).getInt(1) == 0 && out(2L).getString(4) == "no pii here just words")
    assert(out(3L).getInt(1) == 2 && out(3L).getInt(3) == 1)
    assert(out(3L).getString(4) == "two mails <EMAIL> <EMAIL> one ip <IP>")
    assert(out(4L).getString(4) == "")
  }

  test("redaction order: emails never half-eaten by narrower passes") {
    // digits inside an email local part must redact as ONE email,
    // not leave a phone-shaped remnant
    val docs = Seq((1L, "x 555-123-4567@mail.com y")).toDF("doc_id", "text")
    val r = Privacy.piiScrub(docs, "doc_id", "text").head()
    assert(r.getString(4) == "x <EMAIL> y")
    assert(r.getInt(1) == 1)
  }

  test("piiScrub stays a single codegen'd projection (no shuffle, no UDF)") {
    val docs = Seq((1L, "a@b.co")).toDF("doc_id", "text")
    val plan = Privacy.piiScrub(docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
