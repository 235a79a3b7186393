package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextIngest

class TextIngestSpec extends AnyFunSuite with SparkSpec {

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  test("jsonl: malformed lines are quarantined, not errors") {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.writeString(dir.resolve("a.jsonl"),
      """{"id": 1, "text": "hello world"}
        |this is not json at all
        |{"id": 2, "text": "second doc"}
        |{"id": "not-a-number", "text": "bad type"}
        |""".stripMargin)
    val (clean, bad) = TextIngest.quarantine(
      TextIngest.jsonl(spark, schema, dir.toString))
    assert(clean.count() == 2)
    assert(clean.columns.toSeq == Seq("id", "text"))
    assert(bad.count() == 2)
    assert(bad.collect().exists(_.getString(0).contains("not json")))
  }

  test("csv: corrupt rows quarantined, clean rows typed") {
    val dir = Files.createTempDirectory("graft-ingest2")
    Files.writeString(dir.resolve("a.csv"),
      "1,alpha\nnot-a-long,beta\n3,gamma\n")
    val (clean, bad) = TextIngest.quarantine(
      TextIngest.csv(spark, schema, header = false, dir.toString))
    assert(clean.count() == 2)
    assert(bad.count() == 1)
  }

  test("documents: one row per file with full content") {
    val dir = Files.createTempDirectory("graft-ingest3")
    Files.writeString(dir.resolve("d1.txt"), "line one\nline two")
    Files.writeString(dir.resolve("d2.txt"), "another doc")
    val docs = TextIngest.documents(spark, dir.toString)
    assert(docs.count() == 2)
    assert(docs.collect().exists(_.getString(1).contains("line one\nline two")))
  }
}
