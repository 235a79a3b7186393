package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis._
import graft.functions.TextFunctions._

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("shingles: n-grams of tokens, distinct, empty below n tokens") {
    val got = Seq("a b c d", "a b", "x x x x")
      .toDF("t")
      .select(shingles(tokens(col("t")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x x x"))
  }

  test("language ID: marker hits + deterministic argmax") {
    val df = Seq(
      (1L, "the cat is in the hat"),     // en markers
      (2L, "el que de la y en"),         // es markers
      (3L, "zzz qqq www"),               // none → und
    ).toDF("doc_id", "text")
    val t = tokens(col("text"))
    val Seq(en, es, fr, de) = langHits(t).map(_._2)
    val got = df.select(col("doc_id"), langPred(en, es, fr, de).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("token counting: whitespace, regex, approx-BPE") {
    val df = Seq("hello world abc").toDF("text")
    val got = df.select(
      wsTokenCount(col("text")).as("ws"),
      regexTokenCount(col("text")).as("re"),
      approxBpeCount(tokens(col("text"))).as("bpe")).head()
    assert(got.getInt(0) == 3)
    assert(got.getInt(1) == 3)
    // ceil(5/4)+ceil(5/4)+ceil(3/4) = 2+2+1
    assert(got.getLong(2) == 5L)
  }

  test("rolling fingerprint is order-sensitive; identical text agrees") {
    val got = Seq("a b c", "c b a", "a b c")
      .toDF("text")
      .select(rollingFingerprint(tokens(col("text"))).as("fp"))
      .as[Long].collect()
    assert(got(0) == got(2))
    assert(got(0) != got(1))
  }

  test("hash60 is non-negative and stable") {
    val h = Seq("hello").toDF("s").select(hash60(col("s"))).as[Long].head()
    assert(h == 419982666956583591L) // = conv(substr(md5('hello'),1,15),16,10)
  }
}
