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

  test("stream_outliers == batch flagging off the same profiled snapshot") {
    val streamed = streaming.StreamingQueries.streamOutliers(spark, sfDir)
      .as[(Long, String, Long, Int)].collect().toSeq
    val batch = Relational.eventsOutliers(spark, sfDir)
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(streamed == batch, "streamed quarantine diverged from batch")
    assert(batch.nonEmpty)
  }

  test("HLL set ops: the folded union estimate IS the merged group's estimate") {
    // overlapping id ranges: union of g1 ∪ g2 built two ways must agree
    // exactly, because max-folded registers ARE the union's registers
    val twoGroups = ((0L until 1000L).map(u => ("g1", u)) ++
      (500L until 1500L).map(u => ("g2", u))).toDF("event_type", "user_id")
    val merged = (0L until 1500L).map(u => ("gu", u)).toDF("event_type", "user_id")
    val estUnion = Sketches.hllSetOpsTable(spark, twoGroups)
      .select("est_union").as[Long].head()
    val estMerged = Sketches.hllTable(spark, merged)
      .select("est_hll").as[Long].head()
    assert(estUnion == estMerged,
      s"union-by-fold $estUnion != union-by-merge $estMerged")
  }

  test("label modularity: two planted labeled cliques score positive everywhere") {
    // two 5-cliques, each wholly one label, no cross edges: every class
    // holds far more than its degree share — both contributions > 0
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(0L to 4L) ++ clique(10L to 14L)).toDF("src", "dst")
    val labels = ((0L to 4L).map(v => (v, 1L)) ++ (10L to 14L).map(v => (v, 2L)))
      .toDF("vec_id", "label")
    val r = GraphRank.modularityOverEdges(edges, labels)
      .select("label", "l_within", "contrib_ppm").as[(Long, Long, Long)].collect()
    assert(r.length == 2)
    r.foreach { case (l, w, ppm) =>
      assert(w == 10L, s"label $l: clique has 10 internal edges, got $w")
      assert(ppm > 0, s"label $l: clean clique scored non-positive: $ppm")
    }
  }

  test("random graphs: modularity table == BigInt driver replay (incl. negatives)") {
    val rng = new scala.util.Random(321)
    for (trial <- 1 to 3) {
      val nv = 20 + rng.nextInt(20)
      val edges = (0 until nv * 3)
        .map(_ => (rng.nextInt(nv).toLong, rng.nextInt(nv).toLong))
        .filter(e => e._1 != e._2).distinct
      val labels = (0L until nv.toLong).map(v => (v, (v % 3)))
      val got = GraphRank.modularityOverEdges(
          edges.toDF("src", "dst"), labels.toDF("vec_id", "label"))
        .select("label", "contrib_num", "contrib_ppm")
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val lab = labels.toMap
      val m = und.size
      val classes = und.toSeq.flatMap(e => Seq(lab(e._1), lab(e._2))).distinct
      classes.foreach { c =>
        val lw = und.count(e => lab(e._1) == c && lab(e._2) == c)
        val ds = und.toSeq.map(e =>
          (if (lab(e._1) == c) 1 else 0) + (if (lab(e._2) == c) 1 else 0)).sum
        val cn = BigInt(4) * m * lw - BigInt(ds) * ds
        val ppm = cn * 1000000 / (BigInt(4) * m * m) // BigInt / truncates toward zero
        val (gn, gp) = got(c)
        assert(gn == cn.toLong && gp == ppm.toLong,
          s"trial $trial class $c: got ($gn, $gp) want ($cn, $ppm)")
      }
    }
  }

  test("edge cases: empty sides and degenerate partitions behave, not throw") {
    // clicks with no purchases → empty result, no error
    val onlyClicks = Seq((1L, 1L, "click", 100L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    assert(Relational.intervalPairs(onlyClicks, 100L).count() == 0)
    // single-label modularity: a perfectly self-contained partition has
    // contribution numerator exactly 0 (4m·m − (2m)² = 0)
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val oneLabel = (0L to 2L).map(v => (v, 9L)).toDF("vec_id", "label")
    assert(GraphRank.modularityOverEdges(tri, oneLabel)
      .select("contrib_num").as[Long].collect().toSeq == Seq(0L))
    // an edgeless graph yields an empty triangle table
    assert(GraphRank.trianglesOverEdges(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() == 0)
  }

  test("data profile: key column detected unique, categorical min/max null, counts consistent") {
    val rows = Sketches.dataProfile(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    val (_, n, nn, nd, est, mn, mx) = rows("event_id")
    assert(nd == n && nn == 0L, "event_id must profile as a unique non-null key")
    assert(mn.contains(0L) && mx.contains(n - 1), "event_id min/max wrong")
    assert(est > 0)
    val et = rows("event_type")
    assert(et._6.isEmpty && et._7.isEmpty, "categorical column must carry NULL min/max")
    assert(rows.values.map(_._2).toSet.size == 1, "n_rows must be identical across columns")
  }

  // -------------------------------------- random-input property armor

  test("random events: blocked interval join == driver brute force") {
    val rng = new scala.util.Random(77)
    for (trial <- 1 to 5) {
      val n = 200 + rng.nextInt(200)
      val rows = (0 until n).map { i =>
        (i.toLong, rng.nextInt(20).toLong,
          if (rng.nextBoolean()) "click" else "purchase",
          math.abs(rng.nextLong()) % 100000000L)
      }
      val band = 1000000L + rng.nextInt(5000000).toLong
      val got = Relational.intervalPairs(
          rows.toDF("event_id", "user_id", "event_type", "ts_us"), band)
        .select("click_id", "purchase_id", "gap_us")
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ci, cu, ct, cts) <- rows if ct == "click"
        (pi, pu, pt, pts) <- rows
        if pt == "purchase" && pu == cu && pts >= cts && pts - cts <= band
      } yield (ci, pi, pts - cts)).toSet
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size} pairs")
    }
  }

  test("random graphs: triangle counts == driver brute force") {
    val rng = new scala.util.Random(88)
    for (trial <- 1 to 5) {
      val nv = 20 + rng.nextInt(30)
      val edges = (0 until nv * 3)
        .map(_ => (rng.nextInt(nv).toLong, rng.nextInt(nv).toLong))
        .filter(e => e._1 != e._2).distinct
      val got = GraphRank.trianglesOverEdges(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val vs = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val cnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        i <- vs; j <- vs if i < j; k <- vs if j < k
        if und((i, j)) && und((j, k)) && und((i, k))
      } { cnt(i) += 1; cnt(j) += 1; cnt(k) += 1 }
      val want = edges.map(_._1).distinct.map(v => v -> cnt(v)).toMap
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("random graphs: Spark HITS == driver integer fixed-point replay") {
    val rng = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val nv = 15 + rng.nextInt(20)
      val edges = (0 until nv * 3)
        .map(_ => (rng.nextInt(nv).toLong, rng.nextInt(nv).toLong))
        .filter(e => e._1 != e._2).distinct
      val got = GraphRank.hitsOverEdges(edges.toDF("src", "dst"))
        .select("id", "hub_scaled", "auth_scaled")
        .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
      // driver replay: same node set (distinct src), same integer ops
      val nodes = edges.map(_._1).distinct
      var hub = nodes.map(_ -> GraphRank.Scale).toMap
      var auth = Map.empty[Long, Long]
      def halfStep(score: Map[Long, Long], gatherByDst: Boolean): Map[Long, Long] = {
        val raw = nodes.map { v =>
          v -> edges.collect {
            case (s, d) if gatherByDst && d == v && score.contains(s) => score(s)
            case (s, d) if !gatherByDst && s == v && score.contains(d) => score(d)
          }.sum
        }.toMap
        val mx = raw.values.max
        raw.map { case (v, r) =>
          v -> (BigInt(r) * GraphRank.Scale / mx).toLong }
      }
      for (_ <- 1 to GraphRank.HitsT) {
        auth = halfStep(hub, gatherByDst = true)
        hub = halfStep(auth, gatherByDst = false)
      }
      val want = nodes.map(v => v -> (hub(v), auth(v))).toMap
      assert(got == want, s"trial $trial: HITS diverged from the integer replay")
    }
  }

  test("random values: sigma and MAD flaggers == driver brute force") {
    val rng = new scala.util.Random(111)
    for (trial <- 1 to 5) {
      val n = 50 + rng.nextInt(100)
      val rows = (1 to n).map(i =>
        (i.toLong, "g" + rng.nextInt(3), rng.nextInt(10000).toLong))
      val df = rows.toDF("event_id", "event_type", "vc")
      val gotS = Relational.outliersCore(df)
        .select("event_id").as[Long].collect().toSet
      val gotM = Relational.madCore(df)
        .select("event_id").as[Long].collect().toSet
      val byG = rows.groupBy(_._2)
      val wantS = byG.values.flatMap { g =>
        val nn = BigInt(g.size); val s = BigInt(g.map(_._3).sum)
        val q = BigInt(g.map(v => v._3 * v._3).sum)
        g.collect { case (id, _, vc) if {
          val d = nn * vc - s
          d * d > 9 * (nn * q - s * s)
        } => id }
      }.toSet
      val wantM = byG.values.flatMap { g =>
        val sorted = g.sortBy(r => (r._3, r._1))
        val med = sorted((g.size + 1) / 2 - 1)._3
        val devs = g.map(r => (r._1, math.abs(r._3 - med))).sortBy(r => (r._2, r._1))
        val mad = devs((g.size + 1) / 2 - 1)._2
        g.collect { case (id, _, vc) if math.abs(vc - med) > 3 * mad => id }
      }.toSet
      assert(gotS == wantS, s"trial $trial sigma: got $gotS want $wantS")
      assert(gotM == wantM, s"trial $trial mad: got $gotM want $wantM")
    }
  }

  test("random ids: HLL registers and estimate == driver md5 replay") {
    val rng = new scala.util.Random(123)
    for (trial <- 1 to 3) {
      val ids = (0 until 500 + rng.nextInt(500)).map(_ => math.abs(rng.nextLong()) % 100000L)
      val df = ids.map(u => ("g", u)).toDF("event_type", "user_id")
      val got = Sketches.hllTable(spark, df)
        .select("n_exact", "v_zero", "sum_rho", "wsum_rho", "est_hll")
        .as[(Long, Long, Long, Long, Long)].head()
      // driver replay off the same md5 basis
      val regs = Array.fill[Long](Sketches.HllM)(0L)
      ids.distinct.foreach { u =>
        val h = graft.functions.TextHash.md5Lower64(s"hll:$u".getBytes("UTF-8")) >>> 1
        val j = (h % Sketches.HllM).toInt
        val w = h >> 6
        val rho = if (w == 0) 58L else 58L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      val vZero = regs.count(_ == 0L).toLong
      val sumRho = regs.sum
      val wsumRho = regs.zipWithIndex.map { case (m, j) => (j + 1) * m }.sum
      val sden = regs.map(m => BigInt(1) << (58 - m.toInt)).sum
      val est = (BigInt(Sketches.HllAlphaPpm * Sketches.HllM * Sketches.HllM) *
        (BigInt(1) << 58) / sden / 1000000).toLong
      assert(got == ((ids.distinct.size.toLong, vZero, sumRho, wsumRho, est)),
        s"trial $trial: got $got want (${ids.distinct.size}, $vZero, $sumRho, $wsumRho, $est)")
    }
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
