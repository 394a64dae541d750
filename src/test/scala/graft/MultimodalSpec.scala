package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryColumns
import graft.operators.Knn

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary payload pipeline: schema, determinism, unit-norm features") {
    val feats = BinaryColumns.extractFeatures(BinaryColumns.mediaFromDocuments(spark, sfDir))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.embedding.length == BinaryColumns.FeatureDim))
    // unit norm (stub normalizes)
    rows.take(10).foreach { r =>
      val n = math.sqrt(r.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // deterministic re-run
    val rows2 = BinaryColumns.extractFeatures(BinaryColumns.mediaFromDocuments(spark, sfDir))
      .collect()
    assert(rows.map(_.embedding.toSeq).toSeq == rows2.map(_.embedding.toSeq).toSeq)
    // all three modalities present
    assert(rows.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("identical payloads embed identically; different payloads differ") {
    val p1 = "same bytes".getBytes("UTF-8")
    val e1 = BinaryColumns.decodeStub(p1)
    val e2 = BinaryColumns.decodeStub("same bytes".getBytes("UTF-8"))
    val e3 = BinaryColumns.decodeStub("other bytes".getBytes("UTF-8"))
    assert(e1.toSeq == e2.toSeq)
    assert(e1.toSeq != e3.toSeq)
  }

  test("media features flow into the kNN operator (cross-modal search)") {
    val feats = BinaryColumns.mediaFeatures(spark, sfDir)
    val queries = feats.filter($"vec_id" < 3)
    val res = Knn.topK(feats.filter($"modality" === "image"), queries, 5)
    val byQ = res.select($"qid", $"vec_id").as[(Long, Long)].collect().groupBy(_._1)
    assert(byQ.size == 3)
    byQ.values.foreach(v => assert(v.length == 5))
  }

  test("frame sampling stub emits n frames; resize stub is deterministic") {
    val frames = BinaryColumns.sampleFramesStub("vid".getBytes, 4)
    assert(frames.length == 4 && frames.map(_.toSeq).distinct.length == 4)
    assert(BinaryColumns.resizeStub("img".getBytes, 224, 224).toSeq ==
      BinaryColumns.resizeStub("img".getBytes, 224, 224).toSeq)
  }

  test("batched columnar decode == row-at-a-time path, for every batch size and partitioning") {
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir)
    def key(rows: Array[BinaryColumns.MediaFeature]) =
      rows.sortBy(_.media_id).map(r => (r.media_id, r.modality, r.embedding.toSeq)).toSeq
    val want = key(BinaryColumns.extractFeatures(media).collect())
    // batch boundaries must be invisible: degenerate (1), mid-partition
    // splits (7), and bigger-than-partition (10_000) all agree
    Seq(1, 7, 10000).foreach { bs =>
      val got = key(BinaryColumns.extractFeaturesBatched(media, batchSize = bs).collect())
      assert(got == want, s"batchSize=$bs changed results")
    }
    // and so must partitioning (batches never span partitions)
    Seq(1, 3, 17).foreach { np =>
      val got = key(BinaryColumns.extractFeaturesBatched(
        media.repartition(np), batchSize = 7).collect())
      assert(got == want, s"numPartitions=$np changed results")
    }
  }

  test("decoder is pluggable: decode calls arrive as dense same-modality batches") {
    // a probe decoder records every (modality, batch size) it sees and
    // tags rows so dispatch is observable end-to-end
    val media = BinaryColumns.mediaFromDocuments(spark, sfDir).limit(30).repartition(1)
    val probe = new BinaryColumns.MediaDecoder {
      override def name = "probe"
      override def decodeBatch(modality: String,
                               payloads: Array[Array[Byte]]): Array[Array[Float]] = {
        assert(payloads.nonEmpty)
        val tag = modality match {
          case "image" => 1f; case "audio" => 2f; case _ => 3f
        }
        payloads.map(_ => Array.fill(BinaryColumns.FeatureDim)(tag))
      }
    }
    val rows = BinaryColumns.extractFeaturesBatched(media, probe, batchSize = 8).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val tag = r.modality match { case "image" => 1f; case "audio" => 2f; case _ => 3f }
      if (r.modality == "video")
        // frames pooled then re-normalized: constant vector of 1/√dim
        r.embedding.foreach(x => assert(math.abs(x - 1.0 / math.sqrt(BinaryColumns.FeatureDim)) < 1e-6))
      else
        assert(r.embedding.forall(_ == tag), s"row ${r.media_id} not decoded by $tag batch")
    }
  }
}
