package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis primitives for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is a composition of codegen'd built-ins (no UDFs) and uses
  * only exact integer arithmetic or single-rooted IEEE double ops, so the
  * DuckDB oracle reproduces results bit-for-bit.
  */
object TextAnalysis {

  /** Stopword marker sets per language — the classic cheap language-ID
    * heuristic: count language-specific function words. (The synthetic
    * fixture vocabulary is English-ish, so everything scores `en`; the
    * classifier itself is the real thing.)
    */
  val StopEn = Seq("the", "a", "of", "and", "is", "in", "to")
  val StopEs = Seq("el", "la", "de", "que", "y", "en")
  val StopFr = Seq("le", "la", "de", "et", "les", "des")
  val StopDe = Seq("der", "die", "und", "das", "ist")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** (en,es,fr,de) marker-hit counts for a token array. */
  def langHits(toks: Column): Seq[(String, Column)] = Seq(
    "en" -> hits(toks, StopEn), "es" -> hits(toks, StopEs),
    "fr" -> hits(toks, StopFr), "de" -> hits(toks, StopDe))

  /** argmax language with deterministic tie-break en>es>fr>de; `und` when
    * no marker hits at all.
    */
  def langPred(en: Column, es: Column, fr: Column, de: Column): Column =
    when(en + es + fr + de === 0, lit("und"))
      .when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))

  /** Exact integer sum over an int-array (left fold, init 0). */
  def intSum(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x.cast("long"))

  /** Total characters across tokens (exact int). */
  def sumTokenLen(toks: Column): Column = intSum(transform(toks, t => length(t)))

  /** Non [a-z0-9 space] character count (exact int). */
  def symbolCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** Regex token count: letter runs, digit runs, single symbols — a
    * BPE-ish pre-tokenizer shape.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Approximate BPE token count: ceil(len/4) per word (the ~4 chars per
    * BPE token rule of thumb), exact integer arithmetic.
    */
  def approxBpeCount(toks: Column): Column =
    intSum(transform(toks, t => floor((length(t) + lit(3)) / lit(4.0)).cast("long")))

  /** Rolling polynomial fingerprint over the token stream:
    * fold (acc*31 + hash60(tok) mod 1000003) mod 1e9+7, init 0.
    * Order-sensitive (unlike a bag-of-words hash) and exact-integer.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => pmod(hash60(t), lit(1000003L))),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)
}
