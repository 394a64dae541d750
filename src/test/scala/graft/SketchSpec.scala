package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvOps
import graft.operators.Sketches

/** KMV distinct sketch: merge losslessness (the shard-folding
  * property), partition invariance, distinct semantics, and estimator
  * accuracy on the gate corpus. */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private val K = Sketches.K

  test("bottom-k of a union == fold of shard bottom-ks (lossless merge)") {
    // two disjoint "shards" with overlapping hash ranges
    val a = (0L until 500L).map(i => ("g", i * 7 + 3))
    val b = (0L until 500L).map(i => ("g", i * 11 + 1))
    val whole = (a ++ b).toDF("g", "h")
      .groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk"))
      .collect()(0).getSeq[Long](1)
    // fold shard sketches by re-aggregating the exploded shard outputs
    val shardA = a.toDF("g", "h").groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk"))
    val shardB = b.toDF("g", "h").groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk"))
    val folded = shardA.union(shardB)
      .select(col("g"), explode(col("bk")).as("h"))
      .groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk"))
      .collect()(0).getSeq[Long](1)
    assert(whole == folded, "shard-folded sketch diverged from whole-corpus sketch")
    assert(whole.size == K && whole == whole.sorted && whole.distinct == whole)
  }

  test("distinct semantics: duplicated values never double-enter the sketch") {
    val dup = (0L until 40L).flatMap(i => Seq(("g", i), ("g", i), ("g", i)))
    val bk = dup.toDF("g", "h")
      .groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk"))
      .collect()(0).getSeq[Long](1)
    assert(bk == (0L until 40L).toSeq, s"expected the 40 distinct values, got $bk")
  }

  test("sketch is partition-invariant (1 vs 32 input partitions, bit-equal)") {
    val rows = (0L until 2000L).map(i => (s"t${i % 3}", graft.functions.TextHash
      .mix64(i)))
    val one = rows.toDF("g", "h").repartition(1)
      .groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk")).orderBy("g").collect()
    val many = rows.toDF("g", "h").repartition(32)
      .groupBy("g").agg(KmvOps.kmvBottomK(col("h"), K).as("bk")).orderBy("g").collect()
    assert(one.map(_.getSeq[Long](1)).toSeq == many.map(_.getSeq[Long](1)).toSeq)
  }

  test("stream_kmv == batch sketch columns, bit-equal across triggers") {
    val batch = Sketches.sketchDistinctKmv(spark, sfDir)
      .select("event_type", "n_sketch", "kth_hash", "estimate").collect().toSeq
    val stream = graft.streaming.StreamingQueries.streamKmv(spark, sfDir)
      .collect().toSeq
    assert(stream == batch, "streamed sketch diverged from batch")
  }

  test("graded table: estimate within 40% of exact on the gate corpus; small groups exact") {
    val rows = Sketches.sketchDistinctKmv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val nSketch = r.getLong(2); val est = r.getLong(4)
      if (nSketch < K) {
        // undersampled regime: the sketch IS the distinct set (up to
        // hash collisions, absent here) — estimate must equal exact
        assert(est == exact, s"${r.getString(0)}: undersized sketch not exact: $est vs $exact")
      } else {
        assert(math.abs(est - exact).toDouble / exact < 0.40,
          s"${r.getString(0)}: KMV estimate $est too far from exact $exact")
      }
    }
  }
}
