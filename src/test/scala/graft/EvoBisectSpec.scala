package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TieredCatalog
import graft.storage.TieredTable

class EvoBisectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  test("sql mixed vintage read") {
    val dir = Files.createTempDirectory("graft-evobisect2").toString
    val path = s"$dir/t"
    val t = TieredTable(spark, path)
    t.commitAppend(Seq((1L, "eu", 10L), (2L, "us", 20L)).toDF("id", "region", "amt"))
    // persist declared schema the way the procedure does
    graft.storage.TableFs.forPath(path).writeString(s"$path/meta/SCHEMA",
      t.readUnion().schema.toDDL)
    val t2 = TieredTable(spark, path, partitionBy = Seq("region"))
    t2.commitAppend(Seq((3L, "eu", 30L), (4L, "ap", 40L)).toDF("id", "region", "amt"))
    TieredCatalog.register("evob", "t", path, partitionBy = Seq("region"))
    val df = spark.table("graft.evob.t")
    df.explain("formatted")
    val got = df.select("id", "region", "amt").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "eu", 10L), (2L, "us", 20L), (3L, "eu", 30L), (4L, "ap", 40L)), got.toString)
  }
}
