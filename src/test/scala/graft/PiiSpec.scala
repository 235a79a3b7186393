package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pii

/** PII detect/redact — [[graft.operators.Pii]]. The oracle (t14) pins
  * engine agreement on the whole corpus; this spec pins the local
  * semantics: typed counts, placeholder substitution, ordering (an
  * email's digits must not half-match as a phone after redaction),
  * the no-PII identity, and the NEGATIVE-case table (version strings,
  * invalid octets, long IDs) that must survive redaction verbatim.
  */
class PiiSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, Long, Long, String) = {
    val r = Pii.audit(Seq((1L, text)).toDF("id", "t"), "id", "t")
      .select("n_emails", "n_phones", "n_us_phones", "n_cc", "n_ipv4",
        "redacted")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getString(5))
  }

  test("detects and redacts each type, leaves clean text untouched") {
    assert(one("plain words only") ==
      (0L, 0L, 0L, 0L, 0L, "plain words only"))
    assert(one("mail a.b+c%d@sub.example.org now") ==
      (1L, 0L, 0L, 0L, 0L, "mail <EMAIL> now"))
    assert(one("call +49 555 0123 4567 now") ==
      (0L, 1L, 0L, 0L, 0L, "call <PHONE> now"))
    assert(one("host 192.168.0.1 up") ==
      (0L, 0L, 0L, 0L, 1L, "host <IP> up"))
  }

  test("US phone formats: paren, dash, dot") {
    assert(one("tel (415) 555-0142 x9") ==
      (0L, 0L, 1L, 0L, 0L, "tel <PHONE> x9"))
    assert(one("tel 415-555-0142.") ==
      (0L, 0L, 1L, 0L, 0L, "tel <PHONE>."))
    assert(one("tel 415.555.0142 ok") ==
      (0L, 0L, 1L, 0L, 0L, "tel <PHONE> ok"))
  }

  test("credit-card candidates: separated quads and contiguous runs") {
    assert(one("card 4242-4242-4242-4242 on file") ==
      (0L, 0L, 0L, 1L, 0L, "card <CC> on file"))
    assert(one("card 4242 4242 4242 42") ==
      (0L, 0L, 0L, 1L, 0L, "card <CC>"))
    assert(one("pan 378282246310005 amex") ==                // 15 digits
      (0L, 0L, 0L, 1L, 0L, "pan <CC> amex"))
  }

  test("mixed text: counts are per-type and redaction is complete") {
    val (e, p, up, cc, i, red) = one(
      "u1@x.io and u2@y.dev via +12 345 678 9012 or (206) 555-0100 " +
        "card 4111111111111111 at 10.0.0.7")
    assert((e, p, up, cc, i) == (2L, 1L, 1L, 1L, 1L))
    assert(red == "<EMAIL> and <EMAIL> via <PHONE> or <PHONE> " +
      "card <CC> at <IP>")
    assert(!red.exists(_.isDigit), s"digits survived redaction: $red")
  }

  test("NEGATIVE cases: version strings, invalid octets, truncated " +
       "dotted numbers, and long IDs survive verbatim") {
    val negatives = Seq(
      "release v1.2.3.4 shipped",        // no boundary before the 1
      "rev 999.1.2.3 built",             // 999 is not an octet
      "semver 10.1.2 only",              // three components, not four
      "order 12345678901234567 ref",     // 17 digits: too long for a CC
      "pin 123456789012 ok",             // 12 digits: too short for a CC
      "dial 55-555-0142 x",              // 2-3-4: not a US phone shape
      "see example.com docs")            // bare domain is not an email
    negatives.foreach { t =>
      val r = one(t)
      assert(r == (0L, 0L, 0L, 0L, 0L, t),
        s"negative case must survive verbatim: '$t' -> $r")
    }
    // the scrub-side trade stays: a bare 1.2.3.4 in prose redacts
    // (textually indistinguishable from a real address; false
    // positives cost a token, missed PII costs a leak)
    assert(one("v 1.2.3.4 release")._5 == 1L)
  }
}
