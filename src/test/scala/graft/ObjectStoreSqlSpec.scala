package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog

/** The SQL surface against a BUCKET warehouse: `TieredCatalog.warehouse`
  * set to a `graftos://` URL makes every DDL/DML verb object-store-
  * resident — CREATE TABLE writes its schema and durable-catalog
  * descriptor as bucket objects, INSERT/SELECT run the remote commit
  * protocol, recovery reads the bucket, DROP purges managed bucket
  * keys. The reference shape: the warehouse IS MinIO
  * (docker-compose.yml:139-155), with no local filesystem anywhere.
  */
class ObjectStoreSqlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("CREATE/INSERT/SELECT/ALTER/DROP run fully in the bucket") {
    val fsUrl = ObjectStoreStub.freshBucketFsUrl()
    val bucket = fsUrl.split("/").last
    val prev = TieredCatalog.warehouse
    TieredCatalog.warehouse = fsUrl
    try {
      spark.sql("""CREATE TABLE graft.os.t (
        |  `id` BIGINT NOT NULL, `v` STRING,
        |  PRIMARY KEY (`id`) NOT ENFORCED
        |)""".stripMargin)
      // the declared schema AND the durable-catalog descriptor are
      // bucket objects
      assert(ObjectStoreStub.keysUnder(s"$bucket/os/t")
        .exists(_.endsWith("meta/SCHEMA")))
      assert(ObjectStoreStub.keysUnder(s"$bucket/_catalog").nonEmpty)

      spark.sql("INSERT INTO graft.os.t SELECT * FROM VALUES " +
        "(1L, 'a'), (2L, 'b') AS t(id, v)")
      spark.sql("INSERT INTO graft.os.t SELECT * FROM VALUES " +
        "(2L, 'b2') AS t(id, v)")
      assert(spark.sql("SELECT id, v FROM graft.os.t ORDER BY id")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b2")), "PK upsert semantics in the bucket")

      // "restart": registry wiped; recovery reads the BUCKET catalog
      TieredCatalog.unregister("os", "t")
      assert(spark.sql("SELECT COUNT(*) FROM graft.os.t")
        .head().getLong(0) == 2L)
      assert(TieredCatalog.lookup("os", "t").get.pk == Seq("id"))

      // schema evolution writes back to the bucket
      spark.sql("ALTER TABLE graft.os.t ADD COLUMN extra BIGINT")
      assert(spark.table("graft.os.t").schema.fieldNames
        .contains("extra"))

      // managed DROP purges the bucket keys and the descriptor
      spark.sql("DROP TABLE graft.os.t")
      assert(ObjectStoreStub.keysUnder(s"$bucket/os/t").isEmpty,
        "managed table purged from the bucket")
      assert(TieredCatalog.lookup("os", "t").isEmpty)
    } finally {
      TieredCatalog.unregister("os", "t")
      TieredCatalog.warehouse = prev
    }
  }
}
