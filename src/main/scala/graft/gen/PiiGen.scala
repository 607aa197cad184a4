package graft.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic PII-injection fixture: takes a clean corpus and appends
 * synthetic emails / phone numbers / IPv4 addresses to a hash-selected
 * slice of documents, leaving the rest untouched. Pure column
 * expressions (codegen'd, parallelism-independent); every injected
 * value is derived from doc_id, so expected counts are computable in
 * closed form by both engines and by specs.
 *
 * Injection plan per doc (independent hash draws, ~23% get something):
 *   doc_id % 13 == 5  → one email;  % 13 == 7 → two emails
 *   doc_id % 11 == 3  → one phone
 *   doc_id % 17 == 2  → one IPv4
 */
object PiiGen {

  private def lp(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")

  def inject(docs: DataFrame, docId: Column, text: Column): DataFrame = {
    val id = docId
    val email1 = concat(lit(" contact user"), id, lit("@example"),
      pmod(id, lit(7)), lit(".com"))
    val email2 = concat(lit(" cc admin"), id, lit("@mail.example.net"))
    val phone = concat(lit(" call 555-"), lp(pmod(id * 31, lit(1000)), 3),
      lit("-"), lp(pmod(id * 57, lit(10000)), 4))
    val ip = concat(lit(" from 10."), pmod(id, lit(256)), lit("."),
      pmod(id * 7, lit(256)), lit("."), pmod(id * 13, lit(256)))
    val withEmail = when(pmod(id, lit(13)) === 5, concat(text, email1))
      .when(pmod(id, lit(13)) === 7, concat(text, email1, email2))
      .otherwise(text)
    val withPhone = when(pmod(id, lit(11)) === 3, concat(withEmail, phone))
      .otherwise(withEmail)
    val withIp = when(pmod(id, lit(17)) === 2, concat(withPhone, ip))
      .otherwise(withPhone)
    docs.withColumn("text", withIp)
  }
}
