package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TieredCatalog
import graft.storage.TieredTable

/** SQL `UPDATE` / `MERGE INTO` over graft tables ([[graft.plans.RowLevelSql]])
  * — the analyzer-rule lowering onto the storage layer's copy-on-write
  * verbs, plus its loud refusals for shapes the key-join merge cannot
  * express.
  */
class RowLevelSqlSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(name: String): (TieredTable, String) = {
    val dir = Files.createTempDirectory(s"graft-rl-$name").toString
    TieredCatalog.register("rl", name, s"$dir/t")
    (TieredTable(spark, s"$dir/t"), s"graft.rl.$name")
  }

  test("SQL UPDATE rewrites matching rows and commits an update snapshot") {
    import spark.implicits._
    val (t, sql) = freshTable("u1")
    t.appendLog(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "price"))
    t.tier()
    spark.sql(s"UPDATE $sql SET price = price * 2 WHERE id <= 2")
    val rows = spark.sql(s"SELECT id, price FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 20.0), (2L, 40.0), (3L, 30.0)))
    val ops = spark.sql(
      s"SELECT operation FROM ${sql}__snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("tier", "update"))
    // no-match UPDATE commits nothing (the verb's cheap matched probe)
    spark.sql(s"UPDATE $sql SET price = 0 WHERE id = 99")
    assert(spark.sql(s"SELECT COUNT(*) FROM ${sql}__snapshots")
      .head().getLong(0) == 2)
  }

  test("SQL UPDATE three-valued logic: NULL predicate keeps the row") {
    import spark.implicits._
    val (t, sql) = freshTable("u2")
    t.appendLog(Seq((Some(1L), 1.0), (None, 2.0)).toDF("id", "v"))
    t.tier()
    // id = 1 is NULL on the null-id row — it must pass through untouched
    spark.sql(s"UPDATE $sql SET v = -1 WHERE id = 1")
    val vs = spark.sql(s"SELECT v FROM $sql ORDER BY v")
      .collect().map(_.getDouble(0)).toSeq
    assert(vs == Seq(-1.0, 2.0))
  }

  test("SQL UPDATE assignments see the ORIGINAL row (simultaneous semantics)") {
    import spark.implicits._
    val (t, sql) = freshTable("u3")
    t.appendLog(Seq((1L, 2.0, 3.0)).toDF("id", "a", "b")); t.tier()
    // a := b, b := a must SWAP, not chain
    spark.sql(s"UPDATE $sql SET a = b, b = a WHERE id = 1")
    val r = spark.sql(s"SELECT a, b FROM $sql").head()
    assert((r.getDouble(0), r.getDouble(1)) == (3.0, 2.0))
  }

  test("SQL MERGE: update + delete + insert in one statement") {
    import spark.implicits._
    val (t, sql) = freshTable("m1")
    t.appendLog(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "price"))
    t.tier()
    spark.sql(
      s"""MERGE INTO $sql AS tgt
         |USING (SELECT * FROM VALUES
         |         (1L, 11.0, 'upd'), (2L, 0.0, 'del'), (9L, 90.0, 'new')
         |       AS v(id, price, op)) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED AND src.op = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET price = src.price
         |WHEN NOT MATCHED THEN INSERT (id, price) VALUES (src.id, src.price)
         |""".stripMargin)
    val rows = spark.sql(s"SELECT id, price FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 11.0), (3L, 30.0), (9L, 90.0)))
    val ops = spark.sql(
      s"SELECT operation FROM ${sql}__snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("tier", "merge"))
  }

  test("SQL MERGE INSERT * and WHEN MATCHED UPDATE SET * shapes resolve") {
    import spark.implicits._
    val (t, sql) = freshTable("m2")
    t.appendLog(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")); t.tier()
    spark.sql(
      s"""MERGE INTO $sql t
         |USING (SELECT * FROM VALUES (2L, 22.0), (5L, 55.0) AS v(id, v)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val rows = spark.sql(s"SELECT id, v FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 1.0), (2L, 22.0), (5L, 55.0)))
  }

  test("SQL MERGE clause order: conditional UPDATE first shields DELETE") {
    import spark.implicits._
    val (t, sql) = freshTable("m3")
    t.appendLog(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "v"))
    t.tier()
    // UPDATE clause (v < 2) wins for id=1; DELETE takes the rest of the
    // matched set (ids 2,3); id 4 in source but not matched → no insert
    // clause → dropped.
    spark.sql(
      s"""MERGE INTO $sql t
         |USING (SELECT * FROM VALUES (1L), (2L), (3L), (4L) AS v(id)) s
         |ON t.id = s.id
         |WHEN MATCHED AND t.v < 2 THEN UPDATE SET v = t.v + 100
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)
    val rows = spark.sql(s"SELECT id, v FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 101.0)))
  }

  test("SQL MERGE conditional WHEN NOT MATCHED: the condition gates " +
       "which unmatched rows insert; target refs refuse") {
    import spark.implicits._
    val (t, sql) = freshTable("m6")
    t.appendLog(Seq((1L, 10.0)).toDF("id", "price"))
    t.tier()
    spark.sql(
      s"""MERGE INTO $sql AS tgt
         |USING (SELECT * FROM VALUES
         |         (1L, 11.0, true), (8L, 80.0, true), (9L, 90.0, false),
         |         (10L, 100.0, CAST(NULL AS BOOLEAN))
         |       AS v(id, price, ok)) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET price = src.price
         |WHEN NOT MATCHED AND src.ok THEN INSERT (id, price)
         |  VALUES (src.id, src.price)
         |""".stripMargin)
    val rows = spark.sql(s"SELECT id, price FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1L, 11.0), (8L, 80.0)),
      "false AND NULL conditions must both suppress the insert")

    // target-side refs in the NOT MATCHED condition: Spark's analyzer
    // already scopes resolution to the source (our lowering keeps a
    // defense-in-depth check behind it)
    val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      s"""MERGE INTO $sql t USING (SELECT 2L AS id, 5.0 AS price) s
         |ON t.id = s.id
         |WHEN NOT MATCHED AND t.price > 0 THEN INSERT (id, price)
         |  VALUES (s.id, s.price)""".stripMargin))
    assert(e.getMessage.contains("cannot be resolved"), e.getMessage)
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE: the dim-sync shape — " +
       "stale target rows update or delete, clause order honored") {
    import spark.implicits._
    val (t, sql) = freshTable("m7")
    t.appendLog(Seq((1L, 10.0, "live"), (2L, 20.0, "live"),
      (3L, 30.0, "live"), (4L, 40.0, "live")).toDF("id", "price", "st"))
    t.tier()
    // source carries 1 (update) — 2,3,4 are not matched by source:
    // 2 deletes (price < 25), 3 and 4 mark stale
    spark.sql(
      s"""MERGE INTO $sql AS tgt
         |USING (SELECT 1L AS id, 11.0 AS price) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET price = src.price
         |WHEN NOT MATCHED BY SOURCE AND tgt.price < 25 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET st = 'stale'
         |""".stripMargin)
    val rows = spark.sql(s"SELECT id, price, st FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, 11.0, "live"), (3L, 30.0, "stale"),
      (4L, 40.0, "stale")),
      s"delete-first-then-update ordering must hold: ${rows.toSeq}")

    // a first UPDATE whose condition hits shields the trailing DELETE
    // (first-match-wins; the parser itself requires non-last BY SOURCE
    // clauses to carry conditions)
    spark.sql(
      s"""MERGE INTO $sql AS tgt
         |USING (SELECT 99L AS id, 0.0 AS price) AS src
         |ON tgt.id = src.id
         |WHEN NOT MATCHED BY SOURCE AND tgt.price >= 0 THEN
         |  UPDATE SET st = 'kept'
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $sql").head().getLong(0) == 3,
      "rows the UPDATE claimed must not fall through to DELETE")
    assert(spark.sql(s"SELECT DISTINCT st FROM $sql").collect()
      .map(_.getString(0)).toSet == Set("kept"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns join the " +
       "target as nullable; without the keyword they are ignored") {
    import spark.implicits._
    val (t, sql) = freshTable("m8")
    t.appendLog(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"))
    t.tier()
    // WITHOUT the keyword: the extra source column is silently ignored
    // (Spark narrows star-assignments to the target schema)
    spark.sql(
      s"""MERGE INTO $sql AS tgt
         |USING (SELECT 1L AS id, 11.0 AS price, 'tag1' AS label) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table(sql).columns.toSeq == Seq("id", "price"))

    // WITH the keyword: `label` evolves in — matched rows take the
    // source value, untouched rows surface NULL, inserts carry it
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $sql AS tgt
         |USING (SELECT * FROM VALUES (1L, 12.0, 'tag1'), (9L, 90.0, 'tag9')
         |       AS v(id, price, label)) AS src
         |ON tgt.id = src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql(s"SELECT id, price, label FROM $sql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, 12.0, Some("tag1")),
      (2L, 20.0, None), (9L, 90.0, Some("tag9"))),
      s"evolved column: matched=source, untouched=NULL, inserted=source; got $rows")
    // the widened shape persists for ordinary reads and writes
    assert(spark.table(sql).columns.toSeq == Seq("id", "price", "label"))
  }

  test("SCHEMA EVOLUTION guards: explicit SET lists never evolve, and " +
       "a refused merge leaves the declared schema untouched") {
    import spark.implicits._
    // non-star SET list: the unreferenced source column must NOT join
    spark.sql("DROP TABLE IF EXISTS graft.rl.evg")
    spark.sql("CREATE TABLE graft.rl.evg (id BIGINT, price DOUBLE)")
    spark.sql("INSERT INTO graft.rl.evg VALUES (1, 10.0)")
    val t = graft.storage.TieredTable(spark,
      graft.plans.TieredCatalog.lookup("rl", "evg").get.path)
    t.tier()
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.rl.evg AS tgt
        |USING (SELECT 1L AS id, 11.0 AS price, 'x' AS sneak) AS src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET price = src.price""".stripMargin)
    assert(spark.table("graft.rl.evg").columns.toSeq == Seq("id", "price"),
      "an explicit SET list must not evolve columns it never mentioned")

    // a REFUSED star-form merge (hot tail) must not advance the schema
    spark.sql("INSERT INTO graft.rl.evg VALUES (2, 20.0)") // lands hot
    intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.rl.evg AS tgt
        |USING (SELECT 3L AS id, 30.0 AS price, 'y' AS extra) AS src
        |ON tgt.id = src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(spark.table("graft.rl.evg").columns.toSeq == Seq("id", "price"),
      "a refused merge must not leave a phantom declared column")
    spark.sql("DROP TABLE graft.rl.evg")
  }

  test("SQL MERGE multi-match source raises the SQL ambiguity error") {
    import spark.implicits._
    val (t, sql) = freshTable("m4")
    t.appendLog(Seq((1L, 1.0)).toDF("id", "v")); t.tier()
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $sql t
           |USING (SELECT * FROM VALUES (1L, 10.0), (1L, 11.0) AS v(id, v)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("ambiguous"))
  }

  test("row-level SQL refusals are loud and analysis-time") {
    import spark.implicits._
    val (t, sql) = freshTable("m5")
    t.appendLog(Seq((1L, 1.0)).toDF("id", "v")); t.tier()
    def refuses(stmt: String, needle: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(stmt)
      }
      assert(e.getMessage.contains(needle), s"message: ${e.getMessage}")
    }
    // non-equi ON
    refuses(
      s"""MERGE INTO $sql t USING (SELECT 1L AS id, 2.0 AS v) s
         |ON t.id < s.id WHEN MATCHED THEN DELETE""".stripMargin,
      "conjunction of column equalities")
    // differently-named key columns
    refuses(
      s"""MERGE INTO $sql t USING (SELECT 1L AS sid, 2.0 AS v) s
         |ON t.id = s.sid WHEN MATCHED THEN DELETE""".stripMargin,
      "shared column names")
    // reshaping INSERT (value is not the same-named source column)
    refuses(
      s"""MERGE INTO $sql t USING (SELECT 1L AS id, 2.0 AS v) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v * 2)
         |""".stripMargin,
      "same-named source column")
    // subquery in UPDATE predicate
    refuses(
      s"UPDATE $sql SET v = 0 WHERE id IN (SELECT 1L)",
      "subqueries")
  }

  test("SQL DELETE accepts arbitrary predicates beyond pushable filters") {
    import spark.implicits._
    val (t, sql) = freshTable("d1")
    t.appendLog(Seq((1L, 10.0), (2L, 2.0), (3L, 30.0)).toDF("id", "v"))
    t.tier()
    // `id * v >= 20` has no data-source Filter translation — the DSv2
    // SupportsDelete path would refuse it; the rule lowering serves it
    spark.sql(s"DELETE FROM $sql WHERE id * v >= 20")
    val ids = spark.sql(s"SELECT id FROM $sql ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L))
    val ops = spark.sql(
      s"SELECT operation FROM ${sql}__snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("tier", "delete"))
    // no-match DELETE commits nothing; hot-only still names tier()
    spark.sql(s"DELETE FROM $sql WHERE id * v > 1e9")
    assert(spark.sql(s"SELECT COUNT(*) FROM ${sql}__snapshots")
      .head().getLong(0) == 2)
  }

  test("SQL UPDATE on a PK upsert table rewrites through the same verb") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rl-pk").toString
    TieredCatalog.register("rl", "pk1", s"$dir/t", pk = Seq("id"))
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"))
    t.commitUpsert(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    spark.sql("UPDATE graft.rl.pk1 SET name = 'z' WHERE id = 2")
    val rows = spark.sql("SELECT id, name FROM graft.rl.pk1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "z")))
  }

  test("key columns are row identity: UPDATE of a PK column and MERGE " +
       "onto a join key both refuse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rl-pkguard").toString
    TieredCatalog.register("rl", "pkg", s"$dir/t", pk = Seq("id"))
    val t = TieredTable(spark, s"$dir/t", pk = Seq("id"))
    t.commitUpsert(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    // two rows updated onto one key would coin a duplicate PK silently
    val e1 = intercept[Exception] {
      spark.sql("UPDATE graft.rl.pkg SET id = 9 WHERE id >= 1")
    }
    assert(e1.getMessage.contains("primary-key column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.rl.pkg t
          |USING (SELECT 1L AS id, 'x' AS name) s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET id = 7""".stripMargin)
    }
    assert(e2.getMessage.contains("key column"), e2.getMessage)
    // the table is untouched by both refusals
    assert(spark.sql("SELECT COUNT(*) FROM graft.rl.pkg__snapshots")
      .head().getLong(0) == 1L)
  }
}
