package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text corpus — the scrub pass
  * every training-data pipeline runs before a corpus ships (emails,
  * phone numbers in international and US formats, credit-card
  * candidates, IPv4 addresses → typed placeholder tokens), kept
  * deliberately REGEX-SIMPLE so the semantics are engine-portable:
  * the patterns avoid lookaround and backreferences, so Java's regex
  * (Spark) and RE2 (DuckDB, the oracle) agree character-for-character
  * and the redacted text hashes bit-identically across engines.
  *
  * Negative-case discipline (PiiSpec pins each): octet-exact IPv4
  * matching keeps `999.1.2.3` and truncated `10.1.2` untouched, and
  * the word-boundary anchors keep `v1.2.3.4`-style version strings
  * untouched; a bare `1.2.3.4` in prose still redacts — it is
  * textually indistinguishable from a real address, and over-redaction
  * is the safe direction for a shipping corpus.
  *
  * Scale shape: pure map-side projection — `regexp_count` /
  * `regexp_replace` are codegen'd Spark builtins, no UDF, no shuffle;
  * at 100 TB this runs at scan bandwidth like the other t-family
  * scoring ops ([[graft.queries.Pipeline]]).
  */
object Pii {

  /** user@host.tld — char-class form, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone: +CC GGG GGGG GGGG (space or dash). */
  val PhoneRe = "\\+\\d{2}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{4}"

  /** US phone formats: `(415) 555-0142`, `415-555-0142`,
    * `415.555.0142` — paren form needs no boundary (the paren is one);
    * the bare form anchors on word boundaries so digit runs inside
    * longer numbers never half-match.
    */
  val UsPhoneRe =
    "\\(\\d{3}\\) ?\\d{3}[-.]\\d{4}|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Credit-card CANDIDATES (shape, not checksum): separated quads
    * `dddd-dddd-dddd-dd..dddd` (dash or space) or a contiguous
    * 13-16 digit run at word boundaries. Candidate semantics are
    * deliberate — a scrub pass quarantines the shape and lets review
    * decide; a Luhn check is not expressible portably in regex.
    */
  val CcRe =
    "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{2,4}\\b|\\b\\d{13,16}\\b"

  /** One valid IPv4 octet (0-255), leading-zero-free. */
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

  /** Dotted-quad IPv4 at word boundaries, OCTET-EXACT: `999.1.2.3`
    * (invalid octet) and `v1.2.3.4` (no leading boundary) stay
    * untouched.
    */
  val Ipv4Re = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"

  /** Redact in a fixed order: emails first (their local parts may
    * contain digits a later pattern would half-match), then the
    * longest digit shapes (cards), then phones, then addresses.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, EmailRe, "<EMAIL>"),
            CcRe, "<CC>"),
          PhoneRe, "<PHONE>"),
        UsPhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document PII audit: typed match counts + the redacted text —
    * the row a pipeline keeps (redacted) next to the row it quarantines
    * for review (counts > 0). Counts are measured on the SAME text the
    * redaction order sees (cards counted before phone patterns could
    * consume their digits).
    */
  def audit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(UsPhoneRe)).cast("long")
        .as("n_us_phones"),
      regexp_count(col(textCol), lit(CcRe)).cast("long").as("n_cc"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ipv4"),
      redact(col(textCol)).as("redacted"))
}
