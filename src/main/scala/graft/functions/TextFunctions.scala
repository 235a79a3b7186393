package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. Everything here is a composition of codegen'd built-ins —
  * no UDFs — so the hot paths stay inside WholeStageCodegen, and every
  * function has an exact DuckDB-SQL equivalent for the oracle.
  */
object TextFunctions {

  /** Whitespace tokenization (fixture text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 60-bit hash shared with the DuckDB oracle:
    * first 15 hex chars of md5, parsed base-16. Fits in a signed long
    * (2^60), always non-negative. Used as the MinHash/SimHash base hash —
    * md5 is bit-identical across engines, unlike murmur3 variants.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** Seeded hash family: h_i(s) = hash60(i || ":" || s). Avoids modular
    * arithmetic (and its 64-bit overflow pitfalls) entirely — each family
    * member is an independent md5.
    */
  def seededHash(i: Int, s: Column): Column =
    hash60(concat(lit(i.toString), lit(":"), s))

  /** Distinct word n-gram shingles of a token array; empty for docs with
    * fewer than n tokens. 1-based `slice`; `sequence` guarded so it never
    * descends.
    */
  /** Sorted distinct [[hash60]] values of the n-gram shingles of a token
    * array — the codegen'd fused form of
    * `sort_array(array_distinct(transform(shingles(toks, n), hash60)))`
    * ([[graft.functions.expressions.ShingleHashes]]); bit-identical
    * semantics, one primitive loop, no per-window string allocation.
    * The workhorse of the dedup family's shingling pass.
    */
  def shingleHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.ShingleHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(toks), n))

  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    .otherwise(array().cast("array<string>"))
}
