package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Knn, LshAnn, ProductQuant, VectorSearch}

/** Recall/quality specs for the approximate operators vs exact kNN. */
class AnnSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")
  lazy val queries = emb.filter(col("vec_id") < 10)
  lazy val exact: Map[Long, Set[Long]] =
    Knn.topK(emb, queries, 10, Knn.Cosine)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  test("IVF(nlist=16, nprobe=4) recall@10 vs exact is usable and deterministic") {
    val (res, centroids) = IvfIndex.search(emb, queries, 10, nlist = 16, nprobe = 4)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val r = recallOf(approx)
    assert(r >= 0.5, s"IVF recall $r too low")
    // determinism: retrain → identical centroids
    val (_, centroids2) = IvfIndex.search(emb, queries, 10, nlist = 16, nprobe = 4)
    assert(centroids.map(_.toSeq).toSeq == centroids2.map(_.toSeq).toSeq)
  }

  test("IVF with nprobe=nlist degenerates to exact search") {
    val (res, _) = IvfIndex.search(emb, queries, 10, nlist = 8, nprobe = 8)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recallOf(approx) == 1.0)
  }

  test("MLlib-trained IVF recall@10 vs exact is usable") {
    val res = IvfIndex.ivfSearchMLlib(spark, sfDir)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // only first 10 queries overlap with `exact` built on vec_id < 10
    val r = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(r >= 0.4, s"MLlib IVF recall $r")
  }

  test("LSH multiprobe recall@10 is usable; self is always found") {
    val res = LshAnn.lshSearch(emb, queries, 10)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query lands in its own bucket → finds itself
    approx.foreach { case (q, ids) => assert(ids.contains(q)) }
    assert(recallOf(approx) >= 0.2, s"LSH recall ${recallOf(approx)}")
  }

  test("PQ-ADC search: good recall vs exact, self always found") {
    val res = ProductQuant.pqAdcSearch(spark, sfDir)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    approx.foreach { case (q, ids) => assert(ids.contains(q), s"query $q lost itself") }
    assert(recallOf(approx) >= 0.5, s"ADC recall ${recallOf(approx)}")
  }

  test("IVF-PQ: residual coding beats raw-vector PQ recall; usable vs exact") {
    val res = graft.operators.IvfPq.ivfpqSearch(spark, sfDir)
    val approx = res.select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val r = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(r >= 0.4, s"IVF-PQ recall $r")
    // residuals concentrate near zero → the shared codebook reconstructs
    // them better than raw vectors (the reason IVF-PQ exists)
    val sample = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val mdl = graft.operators.IvfPq.trainModel(sample)
    val rawCb = ProductQuant.train(sample, m = 8, k = 16)
    def recon(v: Array[Double]): Double = {
      val b = IvfIndex.nearest(mdl.centroids, v)
      val ctr = mdl.centroids(b)
      val resid = Array.tabulate(v.length)(i => v(i) - ctr(i))
      val dec = ProductQuant.decode(mdl.cb, ProductQuant.encode(mdl.cb, resid))
      math.sqrt(resid.indices.map(i => math.pow(resid(i) - dec(i), 2)).sum)
    }
    def reconRaw(v: Array[Double]): Double = {
      val dec = ProductQuant.decode(rawCb, ProductQuant.encode(rawCb, v))
      math.sqrt(v.indices.map(i => math.pow(v(i) - dec(i), 2)).sum)
    }
    val (errRes, errRaw) = (sample.map(recon).sum, sample.map(reconRaw).sum)
    assert(errRes < errRaw, s"residual coding $errRes !< raw $errRaw")
  }

  test("PQ encode/decode: codes in range, reconstruction beats zero baseline") {
    val sample = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cb = ProductQuant.train(sample, m = 8, k = 16)
    val v = sample(7)
    val codes = ProductQuant.encode(cb, v)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    val rec = ProductQuant.decode(cb, codes)
    assert(rec.length == v.length)
    def l2(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val zero = new Array[Double](v.length)
    assert(l2(v, rec) < l2(v, zero), "PQ reconstruction should beat the zero vector")
    // encode is stable on the reconstruction
    assert(ProductQuant.encode(cb, rec).toSeq == codes.toSeq)
  }
}
