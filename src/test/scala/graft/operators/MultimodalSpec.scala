package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val media = Multimodal.mediaFromDocuments(docs).cache()

  test("media table carries binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val m = media.select($"meta.width", $"meta.height", $"meta.n_frames")
      .as[(Int, Int, Int)].collect()
    assert(m.forall { case (w, h, f) => w >= 8 && h >= 8 && f >= 1 })
    assert(media.count() == docs.count())
  }

  test("stub feature extraction is deterministic and partition-stable") {
    val a = Multimodal.stubDecodeFeatures(media.repartition(2), dim = 16)
      .select($"media_id", $"features").as[(Long, Seq[Float])].collect().toMap
    val b = Multimodal.stubDecodeFeatures(media.repartition(7), dim = 16)
      .select($"media_id", $"features").as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
    assert(a.values.forall(_.size == 16))
    // payload determines features exactly
    val direct = Multimodal.decodeOne("hello".getBytes("UTF-8"), 16)
    val viaSpark = Multimodal.stubDecodeFeatures(
      Seq((1L, "image", "hello".getBytes("UTF-8"))).toDF("media_id", "kind", "payload"))
      .select($"features").as[Seq[Float]].head()
    assert(viaSpark == direct.toSeq)
  }

  test("frame sampling explodes every k-th frame with sliced bytes") {
    val frames = Multimodal.sampleFrames(media, everyK = 2)
    val byId = frames.groupBy($"media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = media.select($"media_id", $"meta.n_frames")
      .as[(Long, Int)].collect().toMap
    byId.foreach { case (id, n) =>
      assert(n == (expected(id) + 1) / 2, s"media $id")
    }
    val fb = frames.filter($"frame" === 0).select(length($"frame_bytes"))
      .as[Int].collect()
    assert(fb.forall(_ <= 8))
  }

  test("resizeMeta clamps the longest side and keeps other fields") {
    val resized = Multimodal.resizeMeta(media, maxSide = 16)
    val dims = resized.select($"meta.width", $"meta.height", $"meta.sample_rate")
      .as[(Int, Int, Int)].collect()
    assert(dims.forall { case (w, h, sr) => w <= 16 && h <= 16 && sr == 16000 })
  }

  test("featureKnn returns k neighbors per probe with descending cosine") {
    val feats = Multimodal.stubDecodeFeatures(media)
    val knn = Multimodal.featureKnn(feats, probeIds = Seq(0L, 1L), k = 5)
      .select($"probe_id", $"rk", $"cos").as[(Long, Int, Double)].collect()
    val byProbe = knn.groupBy(_._1)
    assert(byProbe.keySet == Set(0L, 1L))
    byProbe.values.foreach { rows =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }
}
