package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Round 18 (build round 14): the composed maintenance loop
  * (`ivf_rebalance_loop`) — refresh decisions DRIVE the applies, and
  * the post-apply refresh is the verification that balance improved.
  *
  * The planted corpus makes every decision branch fire: 16
  * well-separated clusters where cluster 0 carries 20% of the corpus
  * (hot: n·nlist > 2·total), clusters 14/15 are starved (n·nlist·4 <
  * total), the rest sit in the keep band. Seeds are pinned by giving
  * the 16 md5-hash-smallest vec_ids one representative per cluster —
  * trainSample orders by (md5(vec_id), vec_id), so Lloyd starts with
  * exactly one seed per planted cluster and converges to the planted
  * partition. Cluster 0 is two repeated points (64+64), so the 2-way
  * sub-split is exact and deterministic. */
class Round18Spec extends SparkTestBase {

  private val Dim = 16
  private val N = 640L

  /** cluster -> representative vector(s). Cluster 0 has two distinct
    * sub-points A/B (the planted split geometry); 1..15 are single
    * repeated points. */
  private def center(c: Int): Seq[Double] =
    Seq.tabulate(Dim)(i => if (i == c) 10.0 else 0.0)
  private val PointA = center(0).updated(1, 0.5)
  private val PointB = center(0).updated(1, -0.5)

  private def plantedCorpus(): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    val hashOrder = (0L until N).toDF("vec_id")
      .withColumn("h",
        graft.functions.TextHashOps.md5Lower64(col("vec_id").cast("string")))
      .orderBy("h", "vec_id").select("vec_id").as[Long].collect()
    val seedIds = hashOrder.take(16)
    // seed r carries cluster r's representative (cluster 0 -> PointA)
    val seedRows = seedIds.zipWithIndex.map { case (id, c) =>
      id -> (if (c == 0) PointA else center(c))
    }
    // remaining ids fill the quotas in ascending-id order:
    // cluster 0: 63 more A + 64 B (128 = 20%), 1..6: +38 (39 total),
    // 7..13: +37 (38), 14/15: +5 (6 — starved)
    val rest = (0L until N).filterNot(seedIds.toSet).sorted
    val fills: Seq[Seq[Double]] =
      Seq.fill(63)(PointA) ++ Seq.fill(64)(PointB) ++
        (1 to 6).flatMap(c => Seq.fill(38)(center(c))) ++
        (7 to 13).flatMap(c => Seq.fill(37)(center(c))) ++
        Seq.fill(5)(center(14)) ++ Seq.fill(5)(center(15))
    assert(fills.length == rest.length, s"${fills.length} != ${rest.length}")
    (seedRows ++ rest.zip(fills)).toSeq.sortBy(_._1)
  }

  test("ivf_rebalance_loop: refresh decisions drive the applies; post-apply refresh flags strictly fewer hot cells") {
    import spark.implicits._
    graft.Mat.withScratchDirs("r18_skew") { case Seq(dir) =>
      plantedCorpus().toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val out = IvfIndex.ivfRebalanceLoop(spark, dir).collect()
      val before = out.filter(_.getString(0) == "before")
      val after = out.filter(_.getString(0) == "after")

      // the planted decision profile: 1 hot, 2 starved, 13 keep
      def byAction(rows: Array[org.apache.spark.sql.Row], a: String) =
        rows.filter(_.getString(4) == a)
      assert(before.length == 16)
      assert(byAction(before, "split").map(r => (r.getInt(1), r.getLong(2))).toSeq
        == Seq((0, 128L)), "cluster 0 (20% share) must be the one hot cell")
      assert(byAction(before, "merge").map(r => (r.getInt(1), r.getLong(2))).toSeq
        == Seq((14, 6L), (15, 6L)), "clusters 14/15 must be the starved cells")

      // strictly fewer hot cells after the apply (here: zero), and the
      // merged survivor has left the starved band too
      assert(byAction(after, "split").isEmpty,
        s"hot cells survived the apply: ${byAction(after, "split").mkString(", ")}")
      assert(byAction(after, "merge").isEmpty,
        s"starved cells survived the apply: ${byAction(after, "merge").mkString(", ")}")

      // the applies were EXACTLY the flagged cells: split cell 0 is
      // gone (replaced by sub-cells 16/17 at 64 members each), cell 15
      // folded into 14, nothing else moved
      val afterIds = after.map(_.getInt(1)).toSet
      assert(!afterIds.contains(0) && !afterIds.contains(15),
        s"split/absorbed cells still present: $afterIds")
      val subCounts = after.filter(r => r.getInt(1) >= 16)
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(subCounts == Map(16 -> 64L, 17 -> 64L), s"sub-cells: $subCounts")
      assert(after.find(_.getInt(1) == 14).map(_.getLong(2)).contains(12L),
        "merge survivor must hold both starved cells' members")

      // conservation: both phases see the whole corpus
      assert(before.map(_.getLong(2)).sum == N)
      assert(after.map(_.getLong(2)).sum == N)
    }
  }

  test("ivf_rebalance_loop: a balanced corpus degenerates to before == after (the loop is a no-op when nothing flags)") {
    val out = IvfIndex.ivfRebalanceLoop(spark, sfDir).collect()
    val before = out.filter(_.getString(0) == "before")
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val after = out.filter(_.getString(0) == "after")
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    if (before.forall(_._4 == "keep")) {
      assert(after.toSeq == before.toSeq,
        "no flagged cells, yet the apply changed the layout's refresh table")
    } else {
      // if the testdata drop ever skews, the loop must still reduce flags
      assert(after.count(_._4 != "keep") < before.count(_._4 != "keep"))
    }
  }
}
