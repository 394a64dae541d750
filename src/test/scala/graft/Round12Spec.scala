package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphRank, Relational, Sketches}

/** Round 12: the relational family gains the bucket-blocked interval
  * (banded range) join and integer-exact outlier flagging, the sketch
  * family gains HyperLogLog registers beside KMV, the graph family
  * gains HITS hubs/authorities, and streaming gains the watermarked
  * stream-stream interval join. Each test pins the property that makes
  * the operator safe at scale, not just its graded answer. */
class Round12Spec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------ interval join

  test("bucket-blocked interval join == naive theta join (losslessness)") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val blocked = Relational.intervalPairs(ev, Relational.IntervalUs)
      .select("click_id", "purchase_id", "gap_us")
      .as[(Long, Long, Long)].collect().toSet
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts_us").as("cus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts_us").as("pus"))
    val naive = c.join(p, col("cu") === col("pu") &&
        col("pus") >= col("cus") &&
        col("pus") - col("cus") <= Relational.IntervalUs)
      .select(col("cid"), col("pid"), (col("pus") - col("cus")).as("gap"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == naive, "bucket blocking lost or invented pairs")
    assert(blocked.nonEmpty, "no pairs at all — the test is vacuous")
  }

  test("interval join band edges are inclusive, and band+1us is out") {
    // user 1: purchase exactly band after the click (in); user 2: one
    // microsecond past (out); user 3: simultaneous (in, gap 0)
    val band = Relational.IntervalUs
    val ev = Seq(
      (1L, 1L, "click", 1000000L), (2L, 1L, "purchase", 1000000L + band),
      (3L, 2L, "click", 1000000L), (4L, 2L, "purchase", 1000000L + band + 1L),
      (5L, 3L, "click", 5000000L), (6L, 3L, "purchase", 5000000L)
    ).toDF("event_id", "user_id", "event_type", "ts_us")
    val got = Relational.intervalPairs(ev, band)
      .select("click_id", "purchase_id", "gap_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, band), (5L, 6L, 0L)),
      s"band-edge semantics wrong: $got")
  }

  test("interval join plans as an equi-join — no nested-loop/cartesian") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val plan = Relational.intervalPairs(ev, Relational.IntervalUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a non-equi physical join:\n$plan")
  }

  test("stream-stream interval join == batch bucket-blocked operator") {
    val streamed = streaming.StreamingQueries.streamIntervalJoin(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = Relational.eventsIntervalJoin(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch, "streamed interval join diverged from batch")
    assert(batch.nonEmpty)
  }

  // ------------------------------------------------------ outliers

  test("outlier flagging catches exactly the planted extreme, tagged high") {
    // 100 tight values around 100 cents + one extreme; σ of the tight
    // mass is tiny, so only the plant crosses 3σ — exact integers only
    val base = (1L to 100L).map(i => (i, "t", 100L + (i % 3) - 1L))
    val e = (base :+ ((999L, "t", 5000L))).toDF("event_id", "event_type", "vc")
    val got = Relational.outliersCore(e)
      .select("event_id", "is_high").as[(Long, Int)].collect().toSeq
    assert(got == Seq((999L, 1)), s"expected only the planted high outlier: $got")
  }

  test("outlier flagging is symmetric: a planted low extreme flags with is_high=0") {
    val base = (1L to 100L).map(i => (i, "t", 5000L + (i % 3) - 1L))
    val e = (base :+ ((999L, "t", 10L))).toDF("event_id", "event_type", "vc")
    val got = Relational.outliersCore(e)
      .select("event_id", "is_high").as[(Long, Int)].collect().toSeq
    assert(got == Seq((999L, 0)), s"expected only the planted low outlier: $got")
  }

  test("gap filling: every type carries the full hour span, zeros included, counts conserved") {
    val rows = Relational.eventsGapfill(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val types = rows.map(_._1).distinct
    val spanSizes = types.map(t => rows.count(_._1 == t)).distinct
    assert(spanSizes.size == 1, s"types cover different spans: $spanSizes")
    assert(rows.exists(_._3 == 0L), "no zero-filled hour — the fill is vacuous here")
    val total = rows.map(_._3).sum
    val nEvents = Tables.load(spark, sfDir, "events").count()
    assert(total == nEvents, s"gap fill changed the total count: $total vs $nEvents")
  }

  test("MAD flags the contaminated block that 3-sigma masking hides") {
    // 100 tight values + 20 moderate extremes: the extremes inflate σ
    // enough to hide themselves (classic masking), but median/MAD are
    // untouched by a 1/6 minority
    val base = (1L to 100L).map(i => (i, "t", 100L + (i % 3) - 1L))
    val planted = (101L to 120L).map(i => (i, "t", 30000L))
    val e = (base ++ planted).toDF("event_id", "event_type", "vc")
    val sigma = Relational.outliersCore(e).as[(Long, String, Long, Int)].collect()
    assert(sigma.isEmpty, s"3-sigma unexpectedly caught the masked block: ${sigma.toSeq}")
    val mad = Relational.madCore(e)
      .select("event_id").as[Long].collect().toSet
    assert(mad == (101L to 120L).toSet, s"MAD flags wrong: $mad")
  }

  // ----------------------------------------------------------- hll

  test("HLL registers fold across shards by cellwise max (mergeability)") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    def grid(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
      Sketches.hllGrid(df).as[(String, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    val whole = grid(ev)
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == whole, "sharded HLL registers did not fold to the whole grid")
  }

  test("HLL raw estimate: mean over 8 disjoint 10k-cardinality groups within 15%") {
    // m=64 gives a single-sketch σ≈13% (one group CAN land 2-3σ out —
    // the g0 draw here sits at 33%); averaging 8 disjoint id ranges
    // pulls the standard error to ~4.6%, and the whole thing is
    // deterministic (fixed md5 basis) — a fixed datapoint, not a flaky
    // band
    val e = spark.range(80000).select(
      concat(lit("g"), (col("id") / 10000).cast("long")).as("event_type"),
      col("id").as("user_id"))
    val ests = Sketches.hllTable(spark, e).select("est_hll").as[Long].collect()
    assert(ests.length == 8)
    val meanRatio = ests.map(_.toDouble / 10000.0).sum / ests.length
    assert(math.abs(meanRatio - 1.0) < 0.15,
      s"mean HLL ratio $meanRatio off by more than 15% (ests: ${ests.mkString(",")})")
  }

  test("HLL state is bounded: exactly m registers per group, v_zero consistent") {
    val t = Sketches.sketchDistinctHll(spark, sfDir)
      .select("event_type", "v_zero", "sum_rho").as[(String, Long, Long)].collect()
    assert(t.nonEmpty)
    t.foreach { case (g, vz, sr) =>
      assert(vz >= 0 && vz <= Sketches.HllM, s"$g: v_zero $vz out of range")
      assert(sr > 0, s"$g: no register ever set")
    }
  }

  test("stream_hll == batch HLL sketch columns (bounded register state)") {
    val streamed = streaming.StreamingQueries.streamHll(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val batch = Sketches.sketchDistinctHll(spark, sfDir)
      .select("event_type", "v_zero", "sum_rho", "wsum_rho", "est_hll")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch, "streamed HLL diverged from batch")
    assert(batch.nonEmpty)
  }

  // ----------------------------------------------------- triangles

  test("triangle counting: planted K4 gives 3 per member, a star gives none") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val star = (10L to 15L).map(l => (9L, l))
    val r = GraphRank.trianglesOverEdges((k4 ++ star).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    (0L to 3L).foreach(n => assert(r(n) == 3L, s"K4 node $n: ${r(n)} triangles"))
    assert(r(9L) == 0L, "star center invented triangles")
  }

  test("triangle counting is orientation-input-invariant: directed duplicates collapse") {
    // same K3 fed as one-directional vs both-directional edge lists
    val oneWay = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val bothWays = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 0L), (0L, 2L))
      .toDF("src", "dst")
    val a = GraphRank.trianglesOverEdges(oneWay).as[(Long, Long)].collect().toMap
    val b = GraphRank.trianglesOverEdges(bothWays).as[(Long, Long)].collect().toMap
    assert(a == b && a.values.forall(_ == 1L), s"K3 counts: $a vs $b")
  }

  // -------------------------------------------------- collocations

  test("collocation scores compute the exact support-filtered PMI rational") {
    val docs = Seq(
      ("p q " * 10).trim,      // (p,q) ×10, (q,p) ×9 — both above support
      "a b c d e f"            // five singleton bigrams — below support
    ).toDF("text")
    val got = operators.DataMix.collocationsOn(docs)
      .as[(String, String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // N = 19 + 5 = 24 bigrams; score = (c12·N·1e6) div (c1·c2)
    assert(got == Map(
      ("p", "q") -> (10L, 10L * 24L * 1000000L / (10L * 10L)),
      ("q", "p") -> (9L, 9L * 24L * 1000000L / (9L * 9L))),
      s"collocation table wrong: $got")
  }

  // --------------------------------------------------- recall sweep

  test("IVF recall sweep: recall is monotone in nprobe and self-match is always found") {
    val rows = operators.IvfIndex.ivfRecallSweep(spark, sfDir)
      .select("nprobe", "qid", "n_overlap").as[(Int, Long, Long)].collect()
    val byQid = rows.groupBy(_._2)
    byQid.foreach { case (qid, rs) =>
      val m = rs.map(r => r._1 -> r._3).toMap
      assert(m(1) <= m(2) && m(2) <= m(4),
        s"qid $qid: overlap not monotone in nprobe: $m")
      assert(m(1) >= 1, s"qid $qid: self-match missing at nprobe=1")
    }
    assert(byQid.nonEmpty)
  }

  // ---------------------------------------------------------- hits

  test("HITS on a planted star: the hub center tops hubs, the leaves top authorities") {
    // node 0 points at every leaf 1..8 (a pure hub); leaves point at 9
    // (so they have out-edges but node 0 gets no in-links). After any
    // iteration count: hub(0) = Scale (max), auth(0) = 0.
    val edges = ((1L to 8L).map(l => (0L, l)) ++ (1L to 8L).map(l => (l, 9L)))
      .toDF("src", "dst")
    val r = GraphRank.hitsOverEdges(edges)
      .select("id", "hub_scaled", "auth_scaled")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(0L)._1 == GraphRank.Scale, s"star center should be the max hub: ${r(0L)}")
    assert(r(0L)._2 == 0L, s"nothing links to the center — auth must be 0: ${r(0L)}")
    val leafAuth = (1L to 8L).map(r(_)._2)
    assert(leafAuth.forall(_ > 0), "leaves receive the center's hub mass")
  }

  test("HITS scores stay in [0, Scale] and both maxima hit Scale exactly (fixed-point renorm)") {
    val r = GraphRank.hits(spark, sfDir)
      .select("hub_scaled", "auth_scaled").as[(Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (h, a) => h >= 0 && h <= GraphRank.Scale &&
      a >= 0 && a <= GraphRank.Scale }, "scores escaped the fixed-point range")
    assert(r.map(_._1).max == GraphRank.Scale, "max hub must renormalize to Scale")
    assert(r.map(_._2).max == GraphRank.Scale, "max auth must renormalize to Scale")
  }
}
