package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII detect/redact — [[graft.operators.Pii]]. The oracle (t14) pins
  * engine agreement on the whole corpus; this spec pins the local
  * semantics: typed counts, placeholder substitution, ordering (an
  * email's digits must not half-match as a phone after redaction),
  * and the no-PII identity.
  */
class PiiSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, String) = {
    val r = Pii.audit(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .select("n_emails", "n_phones", "n_ipv4", "redacted")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts each type, leaves clean text untouched") {
    assert(one("plain words only") == (0L, 0L, 0L, "plain words only"))
    assert(one("mail a.b+c%d@sub.example.org now") ==
      (1L, 0L, 0L, "mail <EMAIL> now"))
    assert(one("call +49 555 0123 4567 now") ==
      (0L, 1L, 0L, "call <PHONE> now"))
    assert(one("host 192.168.0.1 up") == (0L, 0L, 1L, "host <IP> up"))
  }

  test("mixed text: counts are per-type and redaction is complete") {
    val (e, p, i, red) = one(
      "u1@x.io and u2@y.dev via +12 345 678 9012 at 10.0.0.7")
    assert((e, p, i) == (2L, 1L, 1L))
    assert(red == "<EMAIL> and <EMAIL> via <PHONE> at <IP>")
    assert(!red.exists(_.isDigit), s"digits survived redaction: $red")
  }

  test("boundary cases: bare domain is not an email; version-ish " +
       "dotted numbers DO match IPv4 (documented over-approximation)") {
    assert(one("see example.com docs")._4 == "see example.com docs")
    // the scrub-side trade: 1.2.3.4-shaped version strings redact too
    // (false positives cost a token, missed PII costs a leak)
    assert(one("v 1.2.3.4 release")._3 == 1L)
  }
}
