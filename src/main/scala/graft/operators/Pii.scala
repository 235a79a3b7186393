package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text corpus — the scrub pass
  * every training-data pipeline runs before a corpus ships (emails,
  * phone numbers, IPv4 addresses → typed placeholder tokens), kept
  * deliberately REGEX-SIMPLE so the semantics are engine-portable:
  * the patterns avoid lookaround and backreferences, so Java's regex
  * (Spark) and RE2 (DuckDB, the oracle) agree character-for-character
  * and the redacted text hashes bit-identically across engines.
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

  /** Dotted-quad IPv4 at word boundaries. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact in a fixed order (emails first — their local parts may
    * contain digits a later pattern would half-match).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-document PII audit: typed match counts + the redacted text —
    * the row a pipeline keeps (redacted) next to the row it quarantines
    * for review (counts > 0).
    */
  def audit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ipv4"),
      redact(col(textCol)).as("redacted"))
}
