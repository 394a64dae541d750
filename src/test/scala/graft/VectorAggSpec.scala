package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAggOps
import graft.operators.IvfIndex

class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("vector_avg per label equals the collected per-label mean") {
    val got = emb.groupBy("label")
      .agg(VectorAggOps.vectorAvg($"embedding").as("mean"))
      .select($"label", $"mean").as[(Int, Seq[Double])].collect()
      .map { case (l, m) => l -> m.toArray }.toMap

    val rows = emb.select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val expect = rows.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._2.length
      val sums = new Array[Double](dim)
      vs.foreach { case (_, v) =>
        var i = 0; while (i < dim) { sums(i) += v(i).toDouble; i += 1 }
      }
      sums.map(_ / vs.length)
    }.toMap

    got.keySet.foreach { l =>
      got(l).zip(expect(l)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"label $l: $a vs $b") // double association may differ across partitions
      }
    }
  }

  test("distributed Lloyd step via vector_avg tracks the driver-side step") {
    val sample = emb.select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val c0 = sample.take(8).map(_.clone) // same init as trainCentroids
    // driver step
    val driverNext = IvfIndex.trainCentroids(sample, 8, iters = 1)
    // distributed step: assign to c0, group, mean
    val assigned = IvfIndex.assign(emb, c0)
    val distNext = assigned.groupBy("centroid")
      .agg(VectorAggOps.vectorAvg($"embedding").as("mean"))
      .select($"centroid", $"mean").as[(Int, Seq[Double])].collect()
      .map { case (c, m) => c -> m.toArray }.toMap
    distNext.foreach { case (c, m) =>
      m.zip(driverNext(c)).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9, s"centroid $c: $a vs $b")
      }
    }
  }

  test("vector_avg over empty group set returns no rows; null vectors skipped") {
    val none = emb.filter($"vec_id" < 0)
      .groupBy("label").agg(VectorAggOps.vectorAvg($"embedding"))
    assert(none.count() == 0)
  }
}
