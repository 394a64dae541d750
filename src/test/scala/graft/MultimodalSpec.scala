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
}
