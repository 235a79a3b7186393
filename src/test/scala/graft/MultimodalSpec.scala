package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def media = Multimodal.synthesize(
    Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("id"), "id")

  test("synthesize: binary payload + typed metadata, deterministic") {
    val m = media
    assert(m.schema("payload").dataType == BinaryType)
    val rows = m.orderBy("media_id").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length == 128))
    val again = media.orderBy("media_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("decodeFeatures: partition-wise, brightness in [0,255], stable phash") {
    val f = Multimodal.decodeFeatures(media).collect()
    assert(f.length == 8)
    assert(f.forall(x => x.brightness >= 0 && x.brightness <= 255))
    assert(f.forall(_.n_bytes == 128))
    val again = Multimodal.decodeFeatures(media).collect()
    assert(f.sortBy(_.media_id).map(_.phash).toSeq ==
      again.sortBy(_.media_id).map(_.phash).toSeq)
  }

  test("resizeMeta bounds the long side at maxSide, preserves small media") {
    val r = Multimodal.resizeMeta(media, 512).collect()
    assert(r.forall { row =>
      val (ow, oh) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      ow <= 512 && oh <= 512 && ow >= 1 && oh >= 1
    })
    assert(r.forall { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      (w > 512 || h > 512) || (row.getAs[Int]("out_width") == w)
    })
  }

  test("frameSample explodes only videos, stride honored, payload pruned") {
    val fs = Multimodal.frameSample(media, step = 30)
    val rows = fs.collect()
    val videos = media.filter(col("media_type") === "video")
      .select("media_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.map(_.getLong(0)).toSet == videos.keySet)
    rows.groupBy(_.getLong(0)).foreach { case (id, g) =>
      assert(g.length == (videos(id) + 29) / 30)
    }
    // column pruning: the physical scan must not read the payload column
    val scan = fs.queryExecution.executedPlan.toString()
    assert(!scan.contains("payload"), "frame sampling must never read payload bytes")
  }
}
