package graft.text

import graft.SparkSuite
import graft.gen.PiiGen
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSuite {
  import spark.implicits._

  test("redact replaces each PII family with its placeholder") {
    val df = Seq((0L,
      "reach me at jane.doe+x@sub.example.co.uk or 555-123-4567 " +
        "from host 192.168.0.17 thanks")).toDF("doc_id", "text")
    val out = Pii.redact(df, $"doc_id", $"text")
      .as[(Long, String, Long, Long, Long)].head()
    assert(out._2 ===
      "reach me at <EMAIL> or <PHONE> from host <IP> thanks")
    assert((out._3, out._4, out._5) === ((1L, 1L, 1L)))
  }

  test("clean text passes through untouched with zero counts") {
    val df = Seq((1L, "no personal data in this sentence at all"))
      .toDF("doc_id", "text")
    val out = Pii.redact(df, $"doc_id", $"text")
      .as[(Long, String, Long, Long, Long)].head()
    assert(out._2 === "no personal data in this sentence at all")
    assert((out._3, out._4, out._5) === ((0L, 0L, 0L)))
  }

  test("families do not cross-match: email digits/dots are not IPs/phones") {
    val df = Seq(
      (0L, "v 1.2.3.4.5 is a version not an ip"),        // 5 octets: first 4 match
      (1L, "mail a1.2@ex.io ok"),                        // digits+dots inside email
      (2L, "date 2024-11-05 2 is not a phone")).toDF("doc_id", "text")
    val out = Pii.redact(df, $"doc_id", $"text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 1.2.3.4 (greedy 4-octet prefix) redacts; trailing .5 survives
    assert(out(0L)._2 === "v <IP>.5 is a version not an ip")
    assert(out(1L)._3 === 1L && out(1L)._4 === 0L && out(1L)._5 === 0L)
    // 2024-11-05: 4-3-2 digit groups, not 3-3-4 -> no phone match
    assert(out(2L)._4 === 0L)
  }

  test("embedded spans attribute to the family that redacts them") {
    // a phone and an IP shape INSIDE email local parts/domains: the email
    // placeholder swallows them, so n_phone/n_ip must be 0 — the audit
    // invariant is n_<type> == placeholders of that type in clean_text
    val df = Seq(
      (0L, "wire 555-123-4567@example.com today"),
      (1L, "ping x@10.1.2.3.net now")).toDF("doc_id", "text")
    val out = Pii.redact(df, $"doc_id", $"text")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._2 === "wire <EMAIL> today")
    assert((out(0L)._3, out(0L)._4, out(0L)._5) === ((1L, 0L, 0L)))
    assert(out(1L)._2 === "ping <EMAIL> now")
    assert((out(1L)._3, out(1L)._4, out(1L)._5) === ((1L, 0L, 0L)))
  }

  test("PiiGen: injected corpus counts match the closed-form plan") {
    val docs = (0L until 1000L).map(i => (i, s"base text $i")).toDF("doc_id", "text")
    val injected = PiiGen.inject(docs, $"doc_id", $"text")
    val agg = Pii.redact(injected, $"doc_id", $"text")
      .agg(sum($"n_email"), sum($"n_phone"), sum($"n_ip"))
      .as[(Long, Long, Long)].head()
    val ids = 0L until 1000L
    val expEmail = ids.count(_ % 13 == 5) + 2 * ids.count(_ % 13 == 7)
    val expPhone = ids.count(_ % 11 == 3)
    val expIp = ids.count(_ % 17 == 2)
    assert(agg === ((expEmail.toLong, expPhone.toLong, expIp.toLong)))
    // and redaction returns the corpus to a PII-free state
    val residue = Pii.redact(
        Pii.redact(injected, $"doc_id", $"text")
          .select($"doc_id", $"clean_text".as("text")),
        $"doc_id", $"text")
      .agg(sum($"n_email" + $"n_phone" + $"n_ip")).as[Long].head()
    assert(residue === 0L)
  }

  test("plan: redaction is a narrow projection - no exchange") {
    val df = Seq((0L, "x")).toDF("doc_id", "text")
    val plan = Pii.redact(df, $"doc_id", $"text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
