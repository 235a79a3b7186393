package graft

import org.scalatest.funsuite.AnyFunSuite

/** The README walkthrough parity, machine-checked: Demo.run returns its
  * report lines and this spec asserts the walkthrough's OBSERVABLE
  * claims — the hot∪cold ≥ cold signature, the temporal join, the
  * Iceberg round trip, the exactly-once streaming MV, and the rename
  * evolution — so demo rot is a test failure, not an eyeball miss
  * (VERDICT r5 item 10).
  */
class DemoSpec extends AnyFunSuite with SparkSpec {

  test("demo walkthrough claims hold end-to-end") {
    val lines = Demo.run(spark, runSecs = 8)
    def has(p: String): Boolean = lines.exists(_.contains(p))

    assert(has("dims loaded"), lines.mkString("\n"))
    assert(has("invariant hot∪cold ≥ cold: true"))
    assert(has("FOR SYSTEM_TIME AS OF join"))
    assert(has("VERSION AS OF"))
    assert(has("SHOW CREATE TABLE"))
    assert(has("MV (orders per nation) cursor="))

    // Iceberg interop: the independent reader's count must equal the
    // TieredTable cold read it mirrors
    val ice = lines.find(_.contains("Iceberg-exported")).getOrElse(
      fail("no Iceberg export line in demo output"))
    val nums = "\\d+".r.findAllIn(ice).map(_.toLong).toSeq
    assert(nums.size >= 2 && nums.head == nums(1),
      s"Iceberg read disagrees with cold read: $ice")

    // streaming MV over the change feed applied both commits exactly once
    assert(has("ASIA sum=17"), lines.mkString("\n"))

    // rename evolution: the pre-rename snapshot reads through the new name
    assert(has("snapshot 1 reads as: region,amount_usd"))

    // merge-on-read interop: the equality-delete read resolves
    // last-write-wins (2 -> 250 supersedes 200) with all keys present
    assert(has("equality deletes: 1->100, 2->250, 3->300"),
      lines.mkString("\n"))

    // merge-on-read through PLAIN SQL (r9): the UPDATE lowered onto
    // the resolved view (3 -> 305), the SELECT resolves winners, and
    // VERSION AS OF 1 resolves the first delta alone (2 keys... the
    // first commitUpsert holds accts 1 and 2)
    assert(has("merge-on-read through SQL: [1->100, 2->250, 3->305]"),
      lines.mkString("\n"))
    assert(has("VERSION AS OF 1 resolves 2 row(s)"), lines.mkString("\n"))

    // $history: after rollback(→1)+cherry-pick(3), the rolled-past
    // commits 2 (BAD) and 3 (its content re-applied as snapshot 5)
    // are off the current-state lineage — Iceberg's answer too
    assert(has("$history: non-ancestors after rollback = [2,3]"),
      lines.mkString("\n"))

    // bucketed merge-on-read: resolved answer (4950 + 99*594) with the
    // window satisfied by the key-grouped scan — zero hash exchanges
    assert(has("bucketed merge-on-read: resolved SUM=63756 with 0 " +
      "exchanges"), lines.mkString("\n"))

    // sequence packing: exact chunk spans (4+2+5 tokens into windows
    // of 5) and the FFD fill (5 | 4+2 under capacity 6)
    assert(has("sequence packing: chunks c0:d1[0,+4) c0:d2[0,+1) " +
      "c1:d2[1,+1) c1:d3[0,+4) c2:d3[4,+1); FFD bins b0=1docs b1=2docs"),
      lines.mkString("\n"))

    // incremental re-export: the prior manifests were reused, not
    // rewritten (byte-identity across the second export)
    assert(has("prefix manifest reused byte-for-byte=true"),
      lines.mkString("\n"))

    // partitioned merge-on-read: scoped deletes resolve per partition
    // (eu/1 -> 11 supersedes 10; both us keys present)
    assert(has("partition-scoped deletes: eu/1->11, us/1->20, us/2->30"),
      lines.mkString("\n"))

    // the SQL materialized view maintained both ASIA rows exactly once
    assert(has("ASIA=17"), lines.mkString("\n"))

    // SQL maintenance: compact then vacuum leaves only the rewrite
    assert(has("retained ops = compact"), lines.mkString("\n"))

    // the object-store table answered both reads from the bucket
    assert(has("cold=2 union=3"), lines.mkString("\n"))

    // SQL DML triangle: UPDATE bumped acct 1, MERGE updated 2 /
    // deleted 3 / inserted 4, DELETE removed 4 again
    assert(has("SQL UPDATE + MERGE INTO + DELETE: 1->101, 2->999"),
      lines.mkString("\n"))

    // the reference script ran VERBATIM: all 10000 generated orders
    // enriched, and the Trino role answered from exported Iceberg
    assert(has("reference script verbatim: enriched COUNT(1)=10000"),
      lines.mkString("\n"))

    // the REST catalog served the same tier by URL + name
    assert(has("REST-catalog read (url+name only):") &&
      has("tables=enriched_orders"), lines.mkString("\n"))

    // bucket-warehouse SQL DDL + durable catalog: the upsert applied
    // and the table survived the registry wipe
    assert(has("durable catalog across a registry wipe: 1->y, 2->z"),
      lines.mkString("\n"))

    // r9: one name, both runtime modes (log-tail stream + batch union)
    assert(has("runtime-mode switch on ONE name: readStream.table " +
      "streamed 2 rows"), lines.mkString("\n"))
    assert(has("batch-reads 2"), lines.mkString("\n"))

    // r9: stats-driven planning + runtime file pruning on the fact scan
    assert(has("runtime file pruning: dim-filtered join read 100 rows, " +
      "DPP subquery planned=true"), lines.mkString("\n"))

    // r9: the DSv2 streaming sink closes the loop — both ends by name
    assert(has("writeStream.toTable: 2 rows committed exactly-once"),
      lines.mkString("\n"))

    // r9: SPJ — the co-partitioned join must be exchange-free
    assert(has("storage-partitioned join: 120 rows, 0 exchanges"),
      lines.mkString("\n"))

    // r9: the catalog function surface resolves with no registration
    assert(has("catalog functions: hash60=") &&
      has("dot_product=11.0"), lines.mkString("\n"))

    // r9: tags pin state through ingest + retention
    assert(has("snapshot tag: VERSION AS OF 'run-1' → epoch0 after " +
      "vacuum; refs=(run-1,1)"), lines.mkString("\n"))

    // r9: write-audit-publish gates the corpus
    assert(has("write-audit-publish: main=1 while staged, audit view=2, " +
      "published → main=2"), lines.mkString("\n"))

    // r9: declared sort order + per-partition accounting
    assert(has("sorted write + $partitions: p=0:50 p=1:50"),
      lines.mkString("\n"))

    // r9: branch = multi-batch WAP, one published snapshot
    assert(has("branch day1: audit view=3, fast_forward → main=3 in " +
      "2 snapshots"), lines.mkString("\n"))

    // r9: selective recovery + by-source dim sync
    assert(has("rollback+cherry-pick kept [good,good2]; by-source " +
      "MERGE → 1 row"), lines.mkString("\n"))

    // r9: widening + star-form MERGE evolution
    assert(has("evolution: widened n holds max=4000000000; " +
      "evolved shape=[n,v,quality]"), lines.mkString("\n"))
  }
}
