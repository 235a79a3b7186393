package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** Write-side clustering (`RequiresDistributionAndOrdering` on the
  * catalog write): a partitioned sink requests rows clustered by its
  * partition columns, so Spark shuffles once before the write and each
  * `col=value` dir is written by the tasks that own its key — ONE file
  * per dir instead of one per (task × dir). The 100 TB ingest
  * small-files defense, same as Iceberg's hash distribution-mode.
  */
class WriteClusteringSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def filesPerDir(seg: String): Map[String, Int] = {
    val fs = graft.storage.TableFs.forPath(seg)
    fs.listNames(seg).filter(_.startsWith("day=")).map { d =>
      d -> fs.listNames(s"$seg/$d").count(_.endsWith(".parquet"))
    }.toMap
  }

  private def mkSink(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-wc-$name").toString
    val t = TieredTable(spark, s"$dir/$name", partitionBy = Seq("day"))
    graft.storage.TableFs.forPath(s"$dir/$name")
      .writeString(s"$dir/$name/meta/SCHEMA", "id BIGINT, day STRING")
    TieredCatalog.register("wc", name, s"$dir/$name",
      partitionBy = Seq("day"))
    (t, s"graft.wc.$name")
  }

  test("INSERT INTO a partitioned sink clusters by partition column: " +
       "one file per col=value dir regardless of source parallelism") {
    val (t, name) = mkSink("clustered")
    spark.range(200)
      .select($"id", concat(lit("d"), $"id" % 2).as("day"))
      .repartition(4) // without clustering: every task hits every dir
      .createOrReplaceTempView("wc_src")
    spark.sql(s"INSERT INTO $name SELECT id, day FROM wc_src")
    assert(spark.table(name).count() == 200)
    val seg = t.segmentDirPath(t.logSegments.head)
    val files = filesPerDir(seg)
    assert(files.keySet == Set("day=d0", "day=d1"), files.toString)
    assert(files.values.forall(_ == 1),
      s"clustered write must produce one file per partition dir: $files")
  }

  test("distributionMode=none opts out: the unclustered write fans " +
       "out to one file per (task, dir)") {
    val (t, name) = mkSink("fanout")
    spark.range(200)
      .select($"id", concat(lit("d"), $"id" % 2).as("day"))
      .repartition(4)
      .createOrReplaceTempView("wc_src_none")
    spark.conf.set("spark.graft.write.distributionMode", "none")
    try spark.sql(s"INSERT INTO $name SELECT id, day FROM wc_src_none")
    finally spark.conf.unset("spark.graft.write.distributionMode")
    assert(spark.table(name).count() == 200)
    val files = filesPerDir(t.segmentDirPath(t.logSegments.head))
    assert(files.values.sum > 2,
      s"the opt-out should show the fan-out the clustering removes: $files")
  }

  test("PK sinks skip the pre-shuffle (upsert reshuffles anyway) and " +
       "stay correct") {
    val dir = Files.createTempDirectory("graft-wc-pk").toString
    val t = TieredTable(spark, s"$dir/pk", pk = Seq("id"))
    graft.storage.TableFs.forPath(s"$dir/pk")
      .writeString(s"$dir/pk/meta/SCHEMA", "id BIGINT, v STRING")
    TieredCatalog.register("wc", "pk", s"$dir/pk", pk = Seq("id"))
    spark.sql("INSERT INTO graft.wc.pk VALUES (1, 'a'), (2, 'b'), (1, 'c')")
    val rows = spark.table("graft.wc.pk").as[(Long, String)]
      .collect().toMap
    assert(rows(2L) == "b" && Set("a", "c").contains(rows(1L)))
  }
}
