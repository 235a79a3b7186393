package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{HttpMetaStore, InMemoryMetaStore, LocalFsMetaStore, MetaStore, TieredTable}

/** The commit protocol's portability contract: every store in
  * [[stores]] must give putIfAbsent exactly-one-winner semantics, and a
  * TieredTable whose metadata lives in a rename-free object store (the
  * S3/MinIO role — reference fluss-iceberg/docker-compose.yml:139-155)
  * must behave identically to the local-FS default.
  */
class MetaStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def stores: Seq[(String, () => MetaStore)] = Seq(
    "local-fs" -> (() =>
      new LocalFsMetaStore(Files.createTempDirectory("graft-ms"))),
    "in-memory-object" -> (() => new InMemoryMetaStore()),
    // wire-level: conditional PUT over real sockets against the stub's
    // server-side arbitration — 16 threads race genuine HTTP requests
    "http-object" -> (() => new HttpMetaStore(ObjectStoreStub.freshBucketUrl())))

  for ((name, mk) <- stores) {
    test(s"$name: putIfAbsent has exactly one winner under contention") {
      val store = mk()
      val n = 16
      val pool = Executors.newFixedThreadPool(n)
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val fs = (1 to n).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            if (store.putIfAbsent("snap-000001.props", s"body-$i"))
              wins.incrementAndGet()
          }
        })
      }
      start.countDown()
      fs.foreach(_.get(30, TimeUnit.SECONDS))
      pool.shutdown()
      assert(wins.get() == 1, "exactly one conditional PUT may win a key")
      val body = store.get("snap-000001.props").get
      assert(body.startsWith("body-"), "winner's body is what readers see")
      // the key is now immutable under putIfAbsent; put still overwrites
      assert(!store.putIfAbsent("snap-000001.props", "late"))
      assert(store.get("snap-000001.props").get == body)
      store.put("LATEST", "1")
      store.put("LATEST", "2")
      assert(store.get("LATEST").contains("2"))
      store.delete("LATEST")
      assert(store.get("LATEST").isEmpty)
    }
  }

  for ((name, mk) <- stores) {
    test(s"$name: listKeys returns exactly the prefix family, sorted") {
      val store = mk()
      store.put("ref-tag-beta", "2")
      store.put("ref-tag-alpha", "1")
      store.put("snap-000001.props", "x") // different family: excluded
      store.put("LATEST", "1")
      assert(store.listKeys("ref-tag-") ==
        Seq("ref-tag-alpha", "ref-tag-beta"))
      assert(store.listKeys("nope-") == Seq.empty)
      store.delete("ref-tag-alpha")
      assert(store.listKeys("ref-tag-") == Seq("ref-tag-beta"))
    }
  }

  test("tiered table commits end-to-end through a rename-free object store") {
    val store = new InMemoryMetaStore("s3-sim")
    val dir = Files.createTempDirectory("graft-objtable").toString
    val t = TieredTable(spark, s"$dir/t", metaStore = store)
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()
    t.appendLog(Seq(3L).toDF("id"));     t.tier()
    t.appendLog(Seq(4L).toDF("id")) // hot tail
    assert(t.readUnion().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(t.readCold().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // time travel + snapshot metadata resolve through the store
    assert(t.readColdAsOf(1).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val snaps = t.snapshots().orderBy("snapshot_id").collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(snaps.forall(_.getAs[String]("manifest_list").startsWith("s3-sim://")))
    // the protocol used ONLY the object-store primitive set: nothing —
    // no manifest, no LATEST pointer — landed on the filesystem
    assert(Option(Paths.get(s"$dir/t/meta").toFile.list()).get.isEmpty,
      "metadata must live in the object store, not in meta/ files")
    // a second handle on the same store sees the committed state
    val t2 = TieredTable(spark, s"$dir/t", metaStore = store)
    assert(t2.latestSnapshotId == 2L)
    assert(t2.readUnion().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("tiered table commits end-to-end over HTTP conditional PUT") {
    val store = new HttpMetaStore(ObjectStoreStub.freshBucketUrl())
    val dir = Files.createTempDirectory("graft-httptable").toString
    val t = TieredTable(spark, s"$dir/t", metaStore = store)
    t.appendLog(Seq(1L, 2L).toDF("id")); t.tier()
    t.appendLog(Seq(3L).toDF("id"));     t.tier()
    assert(t.readCold().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(t.readColdAsOf(1).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // manifests live behind HTTP URLs, nothing on the local meta/ dir
    val snaps = t.snapshots().orderBy("snapshot_id").collect()
    assert(snaps.forall(_.getAs[String]("manifest_list").startsWith("http://")))
    assert(Option(Paths.get(s"$dir/t/meta").toFile.list()).get.isEmpty,
      "metadata must live in the object store, not in meta/ files")
    // a second driver handle resolves committed state over the wire
    val t2 = TieredTable(spark, s"$dir/t", metaStore =
      new HttpMetaStore(store.location("").stripSuffix("/")))
    assert(t2.latestSnapshotId == 2L)
  }

  test("two drivers on one object store: conditional PUT arbitrates, loser retries") {
    val store = new InMemoryMetaStore("s3-sim")
    val dir = Files.createTempDirectory("graft-objrace").toString
    val a = TieredTable(spark, s"$dir/t", metaStore = store)
    val b = TieredTable(spark, s"$dir/t", metaStore = store)
    a.commitAppend(Seq(1L).toDF("id")) // snapshot 1, via driver A
    // driver B claims snapshot 2 first (its conditional PUT lands)...
    b.commitAppend(Seq(2L).toDF("id"))
    // ...so a stale-state commit from A on the same id must conflict:
    // simulate A's race window by pre-claiming A's next target id
    assert(store.putIfAbsent("snap-000003.props", "id=3\nforeign-claim"))
    val e = intercept[TieredTable.CommitConflictException] {
      a.commitAppend(Seq(3L).toDF("id"))
    }
    assert(e.getMessage.contains("concurrent committer"))
    assert(a.latestSnapshotId == 2L, "loser never moves LATEST")
    // the foreign claim resolves (publishes), then retry wins id 4
    store.put("LATEST", "3")
    store.put("snap-000003.props",
      store.get("snap-000002.props").get.replaceFirst("(?m)^id=2$", "id=3"))
    val s = TieredTable.retryOnConflict() {
      a.commitAppend(Seq(4L).toDF("id"))
    }
    assert(s.id == 4L && b.latestSnapshotId == 4L)
    // snapshot 3 (the foreign publish) referenced snapshot 2's files, so
    // the data lineage is 1, 2, then A's retried 4
    assert(b.readCold().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
  }
}
