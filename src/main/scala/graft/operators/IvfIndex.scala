package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbor — the Spark-native
  * ANN-at-rest that plays the role of the reference's HNSW index
  * (vector_index.py index_type='hnsw'): graph ANN is a pointer-chasing
  * single-node structure; on a cluster the idiomatic equivalent is
  * k-means partitioning + partition-pruned probes.
  *
  * Scale design: centroids are trained on a bounded driver-side sample
  * (deterministic Lloyd, fixed seed) — at 100 TB you sample ~1e6 rows,
  * never the corpus. Assignment is a broadcast map over the corpus; a
  * persisted index is parquet partitioned by centroid id, so an
  * nprobe/nlist fraction of data is scanned per query batch via
  * partition pruning.
  */
/** vec (array<double>) → index of the nearest centroid (squared L2).
  * Centroids ride inside the expression (small: nlist·dim doubles) and
  * reach executors with the serialized plan. */
case class NearestCentroidExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
                               centroids: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    IvfIndex.nearestData(centroids, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val ivf = IvfIndex.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ivf.nearestData($ref, $a);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

/** vec (array<double>) → the nprobe nearest centroid indices, ordered
  * by (squared L2, index) — the per-query probe-routing expression for
  * stream-static IVF serving (explode to (qid, centroid) pairs, then
  * an equi-join against the partitioned layout). Codegen'd like the
  * top-1 variant. */
case class NearestCentroidsExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
                                centroids: Array[Array[Double]], nprobe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    IvfIndex.nearestNData(centroids, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val ivf = IvfIndex.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ivf.nearestNData($ref, $a, $nprobe);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}

object IvfIndex {
  /** Deterministic Lloyd k-means (kmeans++-free: seeds are the first k
    * distinct sample points in id order — reproducible across runs).
    * The assignment pass is parallelized over sample chunks; per-chunk
    * partial (sums, counts) merge associatively, and the merged result
    * is order-independent because centroid means divide chunk-summed
    * doubles in a FIXED merge order (chunk index), so training stays
    * deterministic. */
  def trainCentroids(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty k-means sample")
    val dim = sample(0).length
    // first k DISTINCT sample points in order: duplicate seeds would
    // pin two centroids to the same point (degenerate empty clusters)
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    val seeds = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var si = 0
    while (si < sample.length && seeds.length < k) {
      if (seen.add(sample(si).toSeq)) seeds += sample(si)
      si += 1
    }
    var centroids = seeds.toArray.map(_.clone)
    // a duplicate-heavy or tiny sample can hold FEWER than k distinct
    // points; the codebook then honestly shrinks to that count (k
    // clusters cannot partition fewer distinct points) — all loop
    // arrays size to the effective codebook, never the requested k,
    // or the update step would index past the seeds array
    val kk = centroids.length
    val nThreads = math.max(1, Runtime.getRuntime.availableProcessors())
    // fixed chunk size: merge order/boundaries must not depend on the
    // machine's core count, or centroids drift across environments
    val chunkSize = 8192
    val chunks = sample.indices.grouped(chunkSize).toArray
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    try {
      var it = 0
      while (it < iters) {
        val cs = centroids
        val futures = chunks.map { idxs =>
          pool.submit(new java.util.concurrent.Callable[(Array[Array[Double]], Array[Long])] {
            override def call(): (Array[Array[Double]], Array[Long]) = {
              val sums = Array.fill(kk)(new Array[Double](dim))
              val counts = new Array[Long](kk)
              idxs.foreach { vi =>
                val v = sample(vi)
                val c = nearest(cs, v)
                counts(c) += 1
                val s = sums(c)
                var i = 0
                while (i < dim) { s(i) += v(i); i += 1 }
              }
              (sums, counts)
            }
          })
        }
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Long](kk)
        futures.foreach { f => // fixed chunk order → deterministic double sums
          val (ps, pc) = f.get()
          var c = 0
          while (c < kk) {
            counts(c) += pc(c)
            val s = sums(c); val p = ps(c)
            var i = 0
            while (i < dim) { s(i) += p(i); i += 1 }
            c += 1
          }
        }
        centroids = Array.tabulate(kk) { c =>
          if (counts(c) == 0L) centroids(c) // keep empty centroid in place
          else {
            val s = sums(c)
            Array.tabulate(dim)(i => s(i) / counts(c))
          }
        }
        it += 1
      }
      centroids
    } finally pool.shutdown()
  }


  /** Driver-side probe ROUTING shared by every at-rest probe path: the
    * request batch's query rows collect ONCE (the "request carries its
    * data" contract), each query routes to its probed cells, and the
    * routed (qid, centroid) pairs become the single-partition
    * broadcast-ready probe frame. ONE definition — the probe rule must
    * stay in lockstep with the oracle replay at every call site. */
  private[graft] def collectQueryRows(queries: DataFrame)
      : Array[org.apache.spark.sql.Row] =
    queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()

  private[graft] def probesFor(qRows: Array[org.apache.spark.sql.Row])(
      route: Array[Double] => Seq[Int]): Seq[(Long, Int)] =
    qRows.toSeq.flatMap { r =>
      route(r.getSeq[Double](1).toArray).map(c => (r.getLong(0), c))
    }

  private[graft] def probeDfOf(s: SparkSession,
      probes: Seq[(Long, Int)]): DataFrame =
    s.createDataFrame(
      s.sparkContext.parallelize(probes, 1)).toDF("qid", "centroid")

  /** The standard route: nprobe nearest cells of a centroid codebook. */
  private[graft] def routeProbes(s: SparkSession, queries: DataFrame,
      centroids: Array[Array[Double]], nprobe: Int)
      : (Seq[(Long, Int)], DataFrame) = {
    val probes = probesFor(collectQueryRows(queries))(v =>
      nearestN(centroids, v, nprobe).toSeq)
    (probes, probeDfOf(s, probes))
  }

  def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestN(centroids: Array[Array[Double]], v: Array[Double], n: Int): Array[Int] =
    centroids.indices.map { c =>
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      (d, c)
    }.sortBy(t => (t._1, t._2)).take(n).map(_._2).toArray

  /** ArrayData-direct nearest-centroid (no per-row Seq boxing). */
  def nearestData(centroids: Array[Array[Double]],
                  a: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val dim = math.min(a.numElements(), centroids(0).length)
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0.0; var i = 0
      while (i < dim) { val df = a.getDouble(i) - ctr(i); d += df * df; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** ArrayData-direct nprobe-nearest centroids, (dist, index)-ordered —
    * same tie rule as nearestN (driver twin used by the batch probes). */
  def nearestNData(centroids: Array[Array[Double]],
                   a: org.apache.spark.sql.catalyst.util.ArrayData,
                   n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = math.min(a.numElements(), centroids(0).length)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = a.getDouble(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(nearestN(centroids, v, n))
  }

  /** Deterministic, content-independent training sample: the cap
    * smallest rows by (md5(vec_id), vec_id). Hash order is a uniform
    * pseudo-random draw, reproducible across runs and partition
    * layouts.
    *
    * Scale shape (round 15 — found by the 10M ScaleProbe, which blew
    * spark.driver.maxResultSize here): a bare `orderBy(h).limit(cap)`
    * plans as TakeOrdered, and TakeOrdered ships min(cap, partition
    * rows) PER TASK to the driver — P·cap rows (3.4 GB at 10M×64
    * partitions; unbounded at 1000 executors). Instead, exploit the
    * hash's uniformity: the cap-th smallest of n uniform 64-bit hashes
    * sits at ≈ cap/n of the range, so a `h <= bound` filter at a 2×
    * overshoot keeps ~2·cap candidate rows (Chernoff makes a miss
    * astronomically rare — and a count guard escalates the bound and
    * retries, so the result is EXACT, never approximate), and the
    * final top-cap runs over that candidate set: the driver receives
    * O(cap) rows regardless of corpus size or partition count. The
    * selected sample is bit-identical to the plain orderBy+limit
    * (Round19Spec pins it). */
  def trainSample(corpus: DataFrame, cap: Int = 100000,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val base = corpus.select(col(idCol).cast("long").as("_sid"),
        col(vecCol).cast(ArrayType(DoubleType)).as("_sv"))
      .withColumn("_sh", graft.functions.TextHashOps.md5Lower64(col("_sid").cast("string")))
    def takeCap(df: DataFrame): Array[Array[Double]] =
      df.orderBy(col("_sh"), col("_sid")).limit(cap)
        .select(col("_sv")).collect().map(_.getSeq[Double](0).toArray)
    // pass accounting: the n-count prunes to ZERO data columns (Catalyst
    // drops both _sv and the md5 projection for count()), so the common
    // small-corpus path still pays exactly one data pass (takeCap).
    val n = base.count()
    if (n <= 4L * cap) takeCap(base) // small corpus: the direct form is already driver-safe
    else {
      val span = BigDecimal(2).pow(64)
      var overshoot = 2.0
      var out: Array[Array[Double]] = null
      while (out == null) {
        val frac = math.min(1.0, overshoot * cap / n.toDouble)
        val bound =
          if (frac >= 1.0) Long.MaxValue
          else (BigDecimal(Long.MinValue) + span * frac)
            .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
        // persist the O(cap)-bounded candidate set across the guard
        // count and the final top-cap scan: without it takeCap re-runs
        // the corpus-wide hash filter (a second full pass over the
        // embedding column) that the count just paid for
        val cand = base.filter(col("_sh") <= bound)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (cand.count() >= cap || frac >= 1.0) out = takeCap(cand)
          else overshoot *= 4 // uniform-hash miss: escalate, never under-sample
        } finally cand.unpersist(blocking = false)
      }
      out
    }
  }

  /** Build: assign every corpus row to its nearest centroid. Persisting
    * `assigned.write.partitionBy("centroid")` gives the pruned layout.
    * Assignment runs as a Catalyst expression over the raw array
    * (codegen'd, no Dataset deserialization). */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as(vecCol))
      .withColumn("centroid", org.apache.spark.sql.graftshim.Shims.column(
        NearestCentroidExpr(org.apache.spark.sql.graftshim.Shims.expression(col(vecCol)),
          centroids)))

  /** Probe-limited search: per query, scan only the nprobe nearest
    * centroid buckets (expressed as a pushable `centroid IN (...)`
    * filter per query — on a partitioned index this prunes files). */
  def search(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int, nprobe: Int, iters: Int = 10,
             sampleCap: Int = 100000): (DataFrame, Array[Array[Double]]) = {
    val spark = corpus.sparkSession
    val sample = trainSample(corpus, sampleCap)
    val centroids = trainCentroids(sample, nlist, iters)
    val assigned = assign(corpus, centroids)

    val qRows = queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()
    val probes = qRows.map { r =>
      (r.getLong(0), nearestN(centroids, r.getSeq[Double](1).toArray, nprobe))
    }
    val probeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(probes.flatMap { case (qid, cs) => cs.map(c => (qid, c)) }.toSeq, 1))
      .toDF("qid", "centroid")

    // Restrict corpus to probed buckets per query, then exact re-rank.
    val cand = assigned.join(probeDf, "centroid")
    val scored = cand.join(
      queries.select(col("vec_id").as("qid"), col("embedding").cast(ArrayType(DoubleType)).as("qv")),
      "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    val res = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
    (res, centroids)
  }

  /** Distributed trainer: MLlib KMeans (the cluster-scale path — no
    * driver-side sample bound; seed fixed for reproducibility within
    * an environment). Returns centroids in the same shape as
    * trainCentroids. */
  def trainCentroidsMLlib(corpus: DataFrame, k: Int, iters: Int = 10,
                          vecCol: String = "embedding"): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(
      array_to_vector(col(vecCol).cast(ArrayType(DoubleType))).as("features"))
    val model = new KMeans()
      .setK(k).setMaxIter(iters).setSeed(42L).setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.map(_.toArray)
  }

  /** IVF search with MLlib-trained centroids (rows-only query; recall
    * spec'd vs exact in AnnSpec). */
  def ivfSearchMLlib(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroidsMLlib(emb, 16)
    lastMllibCentroids = centroids
    val assigned = assign(emb, centroids)
    val (_, probeDf) = routeProbes(s, queries, centroids, 4)
    val cand = assigned.join(probeDf, "centroid")
    val scored = cand.join(
      queries.select(col("vec_id").as("qid"),
        col("embedding").cast(ArrayType(DoubleType)).as("qv")), "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= VectorSearch.K)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  def ivfSearch(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val (res, ctrs) = search(emb, queries, VectorSearch.K, nlist = 16, nprobe = 4)
    lastIvfCentroids = ctrs
    res
  }

  /** Compact an at-rest index layout: one file per centroid partition.
    * Incremental (streamed) ingest writes a file per trigger × task ×
    * bucket; small files accumulate until probes are file-open-bound.
    * Repartitioning by the partition key lands each bucket in exactly
    * one task → one file, rows preserved bit-exactly (CompactionSpec;
    * the graded index_save_load probes a compacted layout). At 100 TB
    * compact bucket directories independently — they share no rows, so
    * the pass parallelizes and can run incrementally behind ingest. */
  def compactIndex(s: SparkSession, srcDir: String, dstDir: String,
                   partCol: String = "centroid"): Unit =
    s.read.parquet(srcDir)
      .repartition(col(partCol))
      .write.partitionBy(partCol).mode("overwrite").parquet(dstDir)

  /** Salt-aware bucketed write for skewed corpora: a hot k-means cell
    * (duplicate-heavy corpus, degenerate region of embedding space)
    * otherwise lands in ONE partition directory written by ONE task —
    * the straggler that dominates the write and the oversized file
    * that dominates every probe that touches it. Each bucket gets
    * ceil(size/targetRows) salt values (derived from vec_id — stable,
    * content-independent), the write repartitions on (centroid, salt),
    * and every file holds ≤ ~targetRows rows. Probes still prune on
    * `centroid` alone (salt is a sub-directory); SkewSpec asserts the
    * bound and result equality. */
  def writeSalted(assigned: DataFrame, dir: String, targetRows: Long): Unit = {
    val sizes = assigned.groupBy("centroid").count() // nlist rows — broadcastable
    assigned.join(broadcast(sizes), "centroid")
      .withColumn("salt",
        pmod(col("vec_id"), greatest(lit(1L), ceil(col("count") / targetRows.toDouble))).cast("int"))
      .drop("count")
      .repartition(col("centroid"), col("salt"))
      .write.partitionBy("centroid", "salt").mode("overwrite").parquet(dir)
  }

  /** STATS-DERIVED salt target (closes SURVEY §7's "adaptive salt
    * targets from layout stats" candidate): a fixed row constant is
    * wrong at both ends of the scale — 500k rows of 64-d floats is a
    * ~130 MB parquet file, but 500k rows of 1024-d floats is ~2 GB
    * (a straggler write task and an oversized file), and 500k 16-byte
    * rows is a 8 MB small-file. Derive the target from what is about
    * to be written: aim for `targetFileBytes` per file given the
    * SCHEMA-derived row width (`DataType.defaultSize` — deterministic,
    * no sampling pass; array widths resolve via the element count of
    * one probed row), clamped to a sane band. The salt-bound property
    * (SkewSpec) holds for whatever target results — this only moves
    * the knob from a guess to the layout's own geometry. */
  val TargetFileBytes = 128L << 20
  def adaptiveSaltTarget(assigned: DataFrame,
      targetFileBytes: Long = TargetFileBytes): Long = {
    // head(1), not head(): an EMPTY input (a shard compaction whose
    // filter matched nothing) must write an empty layout like the
    // non-adaptive path does, not crash probing a row that isn't there
    val probeOpt = assigned.head(1).headOption
    val width = assigned.schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          val n = probeOpt match {
            case Some(p) if !p.isNullAt(i) => p.getSeq[Any](i).size
            case _                         => 0
          }
          et.defaultSize.toLong * n + 8L
        case org.apache.spark.sql.types.StringType =>
          probeOpt match {
            case Some(p) if !p.isNullAt(i) => p.getString(i).length.toLong + 8L
            case _                         => 20L
          }
        case dt => dt.defaultSize.toLong
      }
    }.sum.max(1L)
    math.min(4000000L, math.max(10000L, targetFileBytes / width))
  }

  /** writeSalted with the stats-derived target. */
  def writeSaltedAdaptive(assigned: DataFrame, dir: String): Unit =
    writeSalted(assigned, dir, adaptiveSaltTarget(assigned))

  /** Probe an at-rest centroid-partitioned layout. The probed bucket
    * set is known at the driver (it came from the centroid routing),
    * so the scan carries an EXPLICIT partition predicate — `centroid
    * IN (probed set)` shows up as PartitionFilters and prunes files
    * before any IO, rather than relying on runtime DPP firing for the
    * probeDf join (unasserted, and a missed DPP at 100 TB is a
    * full-layout scan). The per-query (qid, centroid) restriction and
    * the exact cosine re-rank follow. Round7Spec pins PartitionFilters
    * on this path over salted and merged layouts. */
  def probeLayout(loaded: DataFrame, probeDf: DataFrame, probedCentroids: Seq[Int],
                  queries: DataFrame, k: Int): DataFrame = {
    val pruned = loaded.filter(col("centroid").isin(probedCentroids: _*))
    val scored = pruned.join(probeDf, "centroid")
      .join(queries.select(col("vec_id").as("qid"),
        col("embedding").cast(ArrayType(DoubleType)).as("qv")), "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  /** Per-file row bound for merged layouts (~500k 64-d float rows ≈
    * 130 MB parquet): merges route their compaction write through
    * writeSalted so a hot bucket is split across write tasks rather
    * than serialized through one straggler. */
  val MergeTargetRows = 500000L

  /** Save/load the reference's index persistence (vector_index.py:
    * 224-277) as an at-rest layout: the assigned corpus is WRITTEN
    * partitioned by centroid (each bucket its own directory — the
    * partition-prunable index file set), COMPACTED into the one-file-
    * per-bucket form, RELOADED, and probed. Output equals ivf_search
    * (same centroids, same probes) — which is the point: persistence
    * AND compaction round-trip the index bit-exactly, and the probe
    * scan on the reloaded layout prunes to nprobe directories
    * (asserted in FingerprintStorageSpec). */
  def indexSaveLoad(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val sample = trainSample(emb)
    val centroids = trainCentroids(sample, 16, 10)
    lastSaveLoadCentroids = centroids

    graft.Mat.withScratchDirs("index_saveload", "index_saveload_compacted") {
      case Seq(out, compacted) =>
        assign(emb, centroids).write.partitionBy("centroid").mode("overwrite").parquet(out)
        compactIndex(s, out, compacted)
        val loaded = s.read.parquet(compacted)

        val (probes, probeDf) = routeProbes(s, queries, centroids, 4)
        graft.Mat.detach(probeLayout(loaded, probeDf,
          probes.map(_._2).distinct.sorted, queries, VectorSearch.K))
    }
  }

  /** Merge independently-built index shards (reference storage.py
    * persistence, extended to the multi-writer reality at scale: two
    * ingestion jobs — or two backfills — each built a shard of the
    * SAME logical index from disjoint row sets, sharing the frozen
    * centroid codebook). Because assignment is a pure function of
    * (vector, centroids), a merge is a pure layout operation: union
    * the shard directories and compact to one file per bucket — no
    * re-assignment, no re-training, each bucket merges independently
    * (100 TB: a per-bucket-directory file move/rewrite, embarrassingly
    * parallel). The graded probe over the MERGED layout must equal
    * ivf_search over the whole corpus with the same centroids — which
    * is exactly what the oracle recomputes from the centroid literals. */
  def indexMerge(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastMergeCentroids = centroids

    graft.Mat.withScratchDirs("shard_a", "shard_b", "merged") {
      case Seq(shardA, shardB, merged) =>
        // Two writers, disjoint row sets, one frozen codebook — and two
        // INDEPENDENT writes, landed concurrently (guide §2.6: they are
        // the two ingestion jobs the merge models; serially each
        // write's job+commit latency idled the other's tail)
        graft.Mat.concurrently(
          () => assign(emb.filter(col("vec_id") % 2 === 0), centroids)
            .write.partitionBy("centroid").mode("overwrite").parquet(shardA),
          () => assign(emb.filter(col("vec_id") % 2 === 1), centroids)
            .write.partitionBy("centroid").mode("overwrite").parquet(shardB))
        // Merge = union of shard layouts compacted bucket-by-bucket,
        // via the salted write: a hot bucket is split across
        // ceil(size/MergeTargetRows) write tasks instead of becoming
        // one straggler (SkewSpec pins the bound on this path; at the
        // graded SF every bucket fits one salt, so the layout is the
        // familiar one-file-per-bucket shape).
        writeSalted(s.read.parquet(shardA).unionByName(s.read.parquet(shardB)),
          merged, MergeTargetRows)
        val loaded = s.read.parquet(merged)

        val (probes, probeDf) = routeProbes(s, queries, centroids, 4)
        graft.Mat.detach(probeLayout(loaded, probeDf,
          probes.map(_._2).distinct.sorted, queries, VectorSearch.K))
    }
  }

  @volatile private var lastMergeCentroids: Array[Array[Double]] = _

  /** Graded salted-write layout: the writeSalted index (hot buckets
    * split into vec_id-derived salt sub-partitions so no single write
    * task/file owns a straggler bucket) must be INVISIBLE to probes —
    * the salt is a physical sub-directory under `centroid=`, results
    * identical to the unsalted index. The oracle is the same
    * whole-corpus IVF twin as index_save_load: if salting leaked into
    * results (lost rows, changed pruning semantics), the hash breaks.
    * SkewSpec separately pins the per-file row bound. */
  def ivfSalted(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastSaltedCentroids = centroids

    graft.Mat.withScratchDirs("index_salted") { case Seq(out) =>
      writeSalted(assign(emb, centroids), out, targetRows = 500L)
      // probes prune on `centroid` alone; salt dirs are transparent
      val loaded = s.read.parquet(out)
      val (probes, probeDf) = routeProbes(s, queries, centroids, 4)
      graft.Mat.detach(probeLayout(loaded, probeDf,
        probes.map(_._2).distinct.sorted, queries, VectorSearch.K))
    }
  }

  @volatile private var lastSaltedCentroids: Array[Array[Double]] = _

  /** Last-writer-wins resolution core for tombstone-aware shard
    * merges: every shard row carries (vec_id, embedding, centroid,
    * op = upsert|delete, shard_seq); for each vec_id only the row of
    * the HIGHEST shard_seq survives (row_number over (vec_id,
    * shard_seq desc)), and if that surviving row is a tombstone the id
    * is dropped. So: same id upserted in two shards → the later
    * shard's payload wins (no duplicate rows); delete-then-reinsert
    * across shards → the reinsert survives; reinsert-then-delete →
    * the id is gone. Round6Spec exercises all three with OVERLAPPING
    * shards. Scale shape: one shuffle keyed by vec_id (the resolution
    * key), then the bucket compaction — both scale-free of nlist. */
  def mergeShardsLww(shards: Seq[DataFrame]): DataFrame = {
    val all = shards.reduce(_ unionByName _)
    // Secondary keys make an equal-shard_seq tie deterministic (the
    // general API can't assume unique seqs): delete beats upsert
    // ("delete" < "upsert" asc — the conservative resolution), then
    // centroid. Graded shards have unique (vec_id, shard_seq), so the
    // graded surface is unchanged.
    val w = Window.partitionBy("vec_id")
      .orderBy(col("shard_seq").desc, col("op").asc, col("centroid").asc)
    all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op") =!= "delete")
      .drop("op", "shard_seq", "rn")
  }

  /** Tombstone-aware shard merge (reference remove_vectors,
    * vector_index.py:212-222, composed with the storage persistence
    * path): shards carry DELETE markers alongside vectors — the merge
    * resolves every id last-writer-wins by shard sequence
    * (mergeShardsLww) while compacting, so the merged layout never
    * resurrects a deleted vector and never duplicates a re-upserted
    * one. The graded shards OVERLAP (shard B re-upserts every
    * vec_id % 10 == 0 row already in shard A), so the dedup path is on
    * the graded surface: without LWW the re-upserts would survive
    * twice and break the hash. Tombstones are content-independent
    * (vec_id % $TombstoneMod == $TombstoneRes, consistent across
    * shards), so the DuckDB twin reproduces the same delete set with a
    * WHERE clause: the probe over the merged+pruned layout must equal
    * the IVF oracle over `vec_id NOT deleted`. */
  val TombstoneMod = 11L
  val TombstoneRes = 5L
  def indexMergeDelete(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastMergeDeleteCentroids = centroids

    graft.Mat.withScratchDirs("del_shard_a", "del_shard_b", "del_merged") {
      case Seq(shardA, shardB, merged) =>
        // Two writers, one frozen codebook; each shard carries its own
        // tombstone column (op = upsert|delete) and write sequence.
        def shardDf(rows: DataFrame, seqNo: Int) =
          assign(rows, centroids).withColumn("op",
            when(pmod(col("vec_id"), lit(TombstoneMod)) === TombstoneRes, lit("delete"))
              .otherwise(lit("upsert")))
            .withColumn("shard_seq", lit(seqNo))
        // shard B: the odd rows PLUS re-upserts of every 10th even row
        // — overlapping ids whose LWW copy (identical payload, later
        // seq) must survive exactly once in the merged layout. The two
        // writers are independent jobs — landed concurrently (§2.6).
        graft.Mat.concurrently(
          () => shardDf(emb.filter(col("vec_id") % 2 === 0), 0)
            .write.partitionBy("centroid").mode("overwrite").parquet(shardA),
          () => shardDf(emb.filter(col("vec_id") % 2 === 1)
              .unionByName(emb.filter(col("vec_id") % 10 === 0)), 1)
            .write.partitionBy("centroid").mode("overwrite").parquet(shardB))
        // LWW-resolved rows land through the same salted bounded write
        // as indexMerge — no straggler task on a hot bucket.
        writeSalted(mergeShardsLww(Seq(s.read.parquet(shardA), s.read.parquet(shardB))),
          merged, MergeTargetRows)
        val loaded = s.read.parquet(merged)

        val (probes, probeDf) = routeProbes(s, queries, centroids, 4)
        graft.Mat.detach(probeLayout(loaded, probeDf,
          probes.map(_._2).distinct.sorted, queries, VectorSearch.K))
    }
  }

  @volatile private var lastMergeDeleteCentroids: Array[Array[Double]] = _

  /** Adaptive nprobe: probe buckets in (distance, id) order until the
    * cumulative candidate count reaches `minCand` — fixed-nprobe recall
    * collapses when a query's nearest buckets happen to be small
    * (skewed k-means cells); extending by CANDIDATE BUDGET instead of
    * bucket count stabilizes it. Include-while rule: a bucket is probed
    * iff the cumulative size BEFORE it is < minCand (so the budget is
    * always reached, and at least one bucket is always probed). */
  val MinCand = 64
  def ivfAdaptive(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val sample = trainSample(emb)
    val centroids = trainCentroids(sample, 16, 10)
    lastAdaptiveCentroids = centroids
    val assigned = assign(emb, centroids)

    // bucket sizes: nlist rows — driver-side is the right scale
    val sizes: Map[Int, Long] = assigned.groupBy("centroid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val probes = probesFor(collectQueryRows(queries)) { v =>
      val ordered = nearestN(centroids, v, centroids.length)
      var cum = 0L
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      ordered.foreach { c =>
        if (cum < MinCand) { sel += c; cum += sizes.getOrElse(c, 0L) }
      }
      sel.toSeq
    }
    val probeDf = probeDfOf(s, probes)
    val cand = assigned.join(probeDf, "centroid")
    val scored = cand.join(
      queries.select(col("vec_id").as("qid"),
        col("embedding").cast(ArrayType(DoubleType)).as("qv")), "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= VectorSearch.K)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  @volatile private var lastAdaptiveCentroids: Array[Array[Double]] = _

  /** Adaptive-probe twin: bucket sizes from a groupBy, probe order by
    * (dist, c) per query, include while the EXCLUSIVE running size is
    * under the budget, then the standard cosine re-rank. */
  private def ivfAdaptiveSql(centroids: Array[Array[Double]], minCand: Int): String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries; val k = VectorSearch.K
    val nlist = centroids.length
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d),
       |bs AS (SELECT centroid, count(*) AS sz FROM a GROUP BY 1),
       |pe AS (SELECT vec_id AS qid, unnest(dl) AS dist, unnest(range(0, $nlist)) AS c
       |       FROM d WHERE vec_id < $nq),
       |pc AS (SELECT qid, c,
       |        coalesce(sum(coalesce(bs.sz, 0)) OVER (
       |          PARTITION BY qid ORDER BY dist ASC, c ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |       FROM pe LEFT JOIN bs ON bs.centroid = pe.c),
       |pr AS (SELECT qid, c FROM pc WHERE cum_before < $minCand),
       |nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |        FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id WHERE e.vec_id < $nq),
       |s AS (SELECT p.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM pr p JOIN a e ON e.centroid = p.c
       |      JOIN q ON q.qid = p.qid
       |      JOIN nrm n ON n.vec_id = e.vec_id)
       |SELECT qid, vec_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |  FROM s)
       |WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Per-bucket index bookkeeping (reference storage.py get_size /
    * vector_index.py get_stats shape): vectors per centroid bucket and
    * the logical at-rest footprint (id8 + float4·dim per row — the
    * uncompressed layout; IVF-PQ stores m bytes/vector instead). The
    * numbers a compaction/rebalancing policy consumes. */
  def indexSize(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastSizeCentroids = centroids
    assign(emb, centroids)
      .groupBy("centroid")
      .agg(count(lit(1)).as("n_vectors"),
        max(size(col("embedding"))).as("dim"))
      .select(col("centroid"),  col("n_vectors"),
        (col("n_vectors") * (lit(8) + lit(4) * col("dim"))).as("logical_bytes"))
      .orderBy("centroid")
  }

  @volatile private var lastSizeCentroids: Array[Array[Double]] = _

  /** Cell-BALANCE diagnostics — the salting-policy input (the table
    * adaptiveSaltTarget / writeSalted decisions read): per k-means
    * cell its row count, its exact share of the corpus in ppm, and a
    * HOT flag for cells above 2× fair share (n·nlist > 2·total — the
    * integer cross-multiplied form, no division) — on a near-dup-heavy
    * corpus these are the cells that straggle an unsalted write.
    * One assignment pass + one |nlist|-row aggregate; the scalar total
    * broadcasts. All integer — oracle replays assignment from this
    * run's stashed centroid literals. */
  def ivfCellStats(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastCellStatsCentroids = centroids
    val cells = assign(emb, centroids)
      .groupBy("centroid").agg(count(lit(1)).as("n_vectors"))
    val tot = cells.agg(sum("n_vectors").as("total"))
    cells.crossJoin(broadcast(tot))
      .select(col("centroid"), col("n_vectors"),
        expr("(n_vectors * 1000000) div total").as("share_ppm"),
        (col("n_vectors") * centroids.length > col("total") * 2).as("hot"))
      .orderBy("centroid")
  }

  @volatile private var lastCellStatsCentroids: Array[Array[Double]] = _

  /** Centroid REFRESH over the at-rest layout — the maintenance pass
    * that closes the index lifecycle loop (stats → salt → compact →
    * merge → REFRESH): read the PERSISTED centroid buckets, recompute
    * each cell's exact member mean, measure how far the serving
    * codebook has drifted from the data it now routes (old-centroid ↔
    * new-mean cosine, floor-ppm), and emit the rebalance decision
    * (split cells over 2× fair share — ivf_cell_stats' hot rule —
    * merge cells under ¼ fair share; integer cross-multiplied, no
    * division).
    *
    * Bit-exactness: the mean reuses vector_avg's discipline — each
    * cell folds ascending vec_id inside one partition (double addition
    * is order-sensitive) and the twin replays the identical left-assoc
    * fold with a recursive CTE over list(embedding ORDER BY vec_id);
    * the drift cosine is CosineSimD's association against this run's
    * stashed centroid literals; the emitted drift is the floor-ppm of
    * one IEEE product (long, never decimal).
    *
    * Scale shape: per-bucket parquet read (embarrassingly parallel,
    * partition-pruned layout), ONE shuffle by centroid for the
    * deterministic fold (at 100 TB the plain sum+count partial-agg
    * replaces the order pin — the pin exists for bit-replay grading),
    * a |nlist|-row broadcast join against the codebook, one scalar
    * total broadcast. Empty cells have no members at rest and emit no
    * row — their rebalance is the codebook owner's trivial drop. */
  def ivfCentroidRefresh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastRefreshCentroids = centroids
    graft.Mat.withScratchDirs("centroid_refresh") { case Seq(out) =>
      assign(emb, centroids).write.partitionBy("centroid").mode("overwrite").parquet(out)
      graft.Mat.detach(refreshFromLayout(s.read.parquet(out), centroids))
    }
  }

  /** The refresh read-side over an already-persisted layout — the
    * seam PlanAudit explains (the graded entry detaches its result,
    * hiding the plan). Positional codebook form. */
  private[graft] def refreshFromLayout(loaded: DataFrame,
      centroids: Array[Array[Double]]): DataFrame =
    refreshFromLayoutIds(loaded,
      centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v) })

  /** Refresh over an ID-KEYED codebook — the post-apply form, where
    * the active entries are sparse (surviving originals + split
    * sub-cells under ids ≥ nlist). The rebalance decision rule
    * cross-multiplies against the ACTIVE codebook size. */
  private[graft] def refreshFromLayoutIds(loaded: DataFrame,
      entries: Seq[(Int, Array[Double])]): DataFrame = {
    val s = loaded.sparkSession
    val nlist = entries.size
    val means = loaded
      .repartition(col("centroid"))
      .sortWithinPartitions("centroid", "vec_id")
      .groupBy("centroid")
      .agg(graft.functions.VectorAggOps.vectorAvg(col("embedding")).as("new_mean"),
        count(lit(1)).as("n_vectors"))
    val oldDf = s.createDataFrame(
        entries.map { case (i, v) => (i, v.toSeq) })
      .toDF("centroid", "old_vec")
    val tot = means.agg(sum("n_vectors").as("total"))
    means.join(broadcast(oldDf), "centroid")
      .crossJoin(broadcast(tot))
      .select(col("centroid").cast("int").as("centroid"), col("n_vectors"),
        floor(graft.functions.VectorOps.cosineSim(col("new_mean"), col("old_vec"))
          * lit(1000000.0)).cast("long").as("cos_ppm"),
        when(col("n_vectors") * nlist > col("total") * 2, "split")
          .when(col("n_vectors") * nlist * 4 < col("total"), "merge")
          .otherwise("keep").as("action"))
      .orderBy("centroid")
  }

  @volatile private var lastRefreshCentroids: Array[Array[Double]] = _

  // ---------------------------------------------------------------
  // SPLIT APPLY — the terminal step of the maintenance loop
  // (stats → refresh decisions → APPLY): take the S largest cells
  // (capacity policy: a rebalancer bounds its biggest bucket; the
  // 2×-fair-share HOT rule is the skew special case of the same
  // ordering), train 2 sub-centroids on each from its own members,
  // rewrite ONLY those cells' directories (true incremental apply:
  // the non-split buckets' files are never touched — at 100 TB this
  // is an append of 2S sub-directories plus S directory deletes, not
  // a layout rewrite), and serve with the EXTENDED codebook: probe
  // selection ranks (dist, id) over surviving originals + subs, so a
  // query probing a region that used to be one oversized bucket now
  // reads only its nearer half.
  //
  // Exactness: sub-assignment is the same strict-< first-wins scan as
  // assignment everywhere (NearestCentroidExpr over the 2 subs); the
  // twin replays the two-stage assignment (original argmin, then the
  // per-split-cell sub argmin) and the extended-codebook probe ranking
  // from this run's stashed literals, then the standard cosine rerank.
  // ---------------------------------------------------------------
  val SplitTopCells = 4
  val SplitNprobe = 4

  // ---------------------------------------------------------------
  // Layout file ops go through the Hadoop FileSystem API — the handle
  // comes from the path + the session's hadoopConfiguration, so the
  // SAME code is a local-FS move in the sandbox and an HDFS/object-
  // store metadata call at 100 TB (java.io.File would silently be
  // local-only). On Hadoop's checksummed local FS, listStatus hides
  // .crc sidecars and rename moves a file's sidecar with it, so a
  // moved bucket file stays checksum-verified — strictly better than
  // the raw-File move this replaced (which orphaned the sidecar).
  // ---------------------------------------------------------------
  private def layoutFs(s: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Drop a bucket directory (split apply retires the split cell). */
  private[graft] def deleteBucketDir(s: SparkSession, dir: String): Unit = {
    val (fs, p) = layoutFs(s, dir)
    require(fs.delete(p, true), s"bucket dir delete failed: $dir")
  }

  /** Merge move: rename one bucket's data files into another under a
    * bucket-tagged name — one write job emits the SAME part-file name
    * into every partition directory it touches, so a bare rename
    * would silently replace the survivor's file of that name (the bug
    * the round-13 gate caught). Pure metadata, zero bytes rewritten
    * on any FS; the emptied source dir is dropped afterwards. */
  private[graft] def moveBucketFiles(s: SparkSession, srcDir: String,
      dstDir: String, tag: String): Unit = {
    val (fs, src) = layoutFs(s, srcDir)
    val dst = new org.apache.hadoop.fs.Path(dstDir)
    fs.listStatus(src).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
      val to = new org.apache.hadoop.fs.Path(dst, s"merged-$tag-${st.getPath.getName}")
      require(fs.rename(st.getPath, to), s"merge move failed: ${st.getPath} -> $to")
    }
    require(fs.delete(src, true), s"merge source dir cleanup failed: $srcDir")
  }

  /** Per split cell: 2 sub-centroids from ITS members (deterministic
    * md5-ordered sample; a cell without 2 distinct members is
    * unsplittable and stays as-is). */
  private def trainSubCentroids(assigned: DataFrame,
      cells: Seq[Int]): Seq[(Int, Array[Array[Double]])] =
    cells.flatMap { h =>
      val sample = trainSample(assigned.filter(col("centroid") === h), vecCol = "embedding")
      if (sample.map(_.toSeq).distinct.size < 2) None
      else Some(h -> trainCentroids(sample, 2, 10))
    }

  /** Incremental split apply over a persisted layout: append the 2
    * sub-buckets per split cell (ids nlist+2j, nlist+2j+1), then drop
    * the split cell's directory — nothing else rewrites. */
  private def applySplits(s: SparkSession, assigned: DataFrame, out: String,
      subs: Seq[(Int, Array[Array[Double]])], nlist: Int): Unit =
    subs.zipWithIndex.foreach { case ((h, sc), j) =>
      val base = nlist + 2 * j
      assigned.filter(col("centroid") === h)
        .withColumn("centroid",
          (org.apache.spark.sql.graftshim.Shims.column(NearestCentroidExpr(
            org.apache.spark.sql.graftshim.Shims.expression(col("embedding")), sc))
            + lit(base)).cast("int"))
        .write.partitionBy("centroid").mode("append").parquet(out)
      deleteBucketDir(s, s"$out/centroid=$h")
    }

  /** Post-apply ACTIVE codebook: surviving originals (not split, not
    * absorbed) + split sub-cells, id-keyed. */
  private def activeCodebook(centroids: Array[Array[Double]],
      subs: Seq[(Int, Array[Array[Double]])],
      absorbed: Seq[Int]): Seq[(Int, Array[Double])] = {
    val nlist = centroids.length
    centroids.zipWithIndex.toSeq.collect {
      case (v, i) if !subs.exists(_._1 == i) && !absorbed.contains(i) => (i, v)
    } ++ subs.zipWithIndex.flatMap { case ((_, sc), j) =>
      sc.zipWithIndex.map { case (v, si) => (nlist + 2 * j + si, v) }
    }
  }

  def ivfSplitApply(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    val nlist = centroids.length
    val assigned = assign(emb, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // capacity policy: the S largest cells by (count desc, id asc) —
    // deterministic on any balance profile
    val counts = assigned.groupBy("centroid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val splitIds = counts.sortBy { case (c, n) => (-n, c) }
      .take(SplitTopCells).map(_._1).sorted
    val subs = trainSubCentroids(assigned, splitIds.toSeq)
    lastSplitState = (centroids, subs)
    try graft.Mat.withScratchDirs("split_apply") { case Seq(out) =>
      // the given at-rest state
      assigned.write.partitionBy("centroid").mode("overwrite").parquet(out)
      applySplits(s, assigned, out, subs, nlist)
      val loaded = s.read.parquet(out)
      val active = activeCodebook(centroids, subs, Seq.empty).toArray
      val probes = probesFor(collectQueryRows(queries))(v =>
        nearestNIds(active, v, SplitNprobe).toSeq)
      val probeDf = probeDfOf(s, probes)
      graft.Mat.detach(probeLayout(loaded, probeDf,
        probes.map(_._2).distinct.sorted.toSeq, queries, VectorSearch.K))
    } finally assigned.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------
  // MERGE APPLY — the starved-cell counterpart of the split: fold the
  // two smallest cells into one bucket. Because partitionBy encodes
  // the cell in the DIRECTORY NAME and not in the rows, the merge is
  // a pure file MOVE (rename the absorbed cell's part files into the
  // survivor's directory — zero bytes rewritten, the cheapest possible
  // layout operation at any scale), and serving shrinks the codebook:
  // the absorbed id leaves the probe ranking, its members are reached
  // through the survivor's entry (the survivor keeps its centroid
  // vector; a follow-up ivf_centroid_refresh recomputes it — that IS
  // the loop). Twin replays the relabel and the reduced-codebook
  // (dist, id) probe ranking from stashed literals.
  // ---------------------------------------------------------------
  def ivfMergeApply(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    val assigned = assign(emb, centroids)
    // starved policy: the two smallest cells by (count asc, id asc);
    // survivor = lower id
    val counts = assigned.groupBy("centroid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val pair = counts.sortBy { case (c, n) => (n, c) }.take(2).map(_._1).sorted
    val (keep, absorb) = (pair(0), pair(1))
    lastMergeApplyState = (centroids, keep, absorb)
    graft.Mat.withScratchDirs("merge_apply") { case Seq(out) =>
      assigned.write.partitionBy("centroid").mode("overwrite").parquet(out)
      // the merge itself: move the absorbed bucket's files into the
      // survivor's directory through the FS API — no rewrite.
      moveBucketFiles(s, s"$out/centroid=$absorb", s"$out/centroid=$keep",
        absorb.toString)
      val loaded = s.read.parquet(out)
      val active: Array[(Int, Array[Double])] =
        centroids.zipWithIndex.collect {
          case (v, i) if i != absorb => (i, v) }
      val probes = probesFor(collectQueryRows(queries))(v =>
        nearestNIds(active, v, 4).toSeq)
      val probeDf = probeDfOf(s, probes)
      graft.Mat.detach(probeLayout(loaded, probeDf,
        probes.map(_._2).distinct.sorted.toSeq, queries, VectorSearch.K))
    }
  }

  @volatile private[graft] var lastMergeApplyState:
    (Array[Array[Double]], Int, Int) = _

  // ---------------------------------------------------------------
  // REBALANCE LOOP — the maintenance cycle as ONE dataflow, not three
  // stories: run ivf_centroid_refresh over the at-rest layout, apply
  // EXACTLY the cells its `action` column flags (every `split` cell
  // splits — capacity policy plays no part here; every `merge` cell
  // folds into the lowest-id flagged cell as pure file moves), then
  // run the refresh AGAIN with the post-apply active codebook and
  // emit both balance tables side by side. This is the pass a 100 TB
  // deployment schedules: decisions come from the layout's own stats,
  // applies touch only the flagged buckets (O(affected) IO), and the
  // second refresh IS the verification that balance improved — the
  // post-apply table should flag fewer (ideally zero) hot cells.
  //
  // Exactness: both phases are the graded refresh (deterministic
  // ascending-vec_id mean fold, floor-ppm cosine drift, integer
  // cross-multiplied decisions — the after-phase rule uses the ACTIVE
  // codebook size); the twin replays assignment, the split sub-argmin,
  // the merge relabel, and BOTH mean folds from stashed literals in
  // one statement. A corpus where refresh flags nothing degenerates to
  // before == after — still graded, still exact.
  // ---------------------------------------------------------------
  def ivfRebalanceLoop(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    val nlist = centroids.length
    val assigned = assign(emb, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try graft.Mat.withScratchDirs("rebalance_loop") { case Seq(out) =>
      assigned.write.partitionBy("centroid").mode("overwrite").parquet(out)
      // phase 1: the graded refresh over the at-rest layout —
      // MATERIALIZED before the applies mutate the directory it reads
      val before = graft.Mat.detach(refreshFromLayout(s.read.parquet(out), centroids))
      // |nlist| decision rows — the bounded stash/probe idiom
      val decisions = before.select("centroid", "action").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      val splitFlagged = decisions.collect { case (c, "split") => c }.sorted.toSeq
      val mergeFlagged = decisions.collect { case (c, "merge") => c }.sorted.toSeq
      // apply EXACTLY the flagged splits (unsplittable cells stay)
      val subs = trainSubCentroids(assigned, splitFlagged)
      applySplits(s, assigned, out, subs, nlist)
      // apply EXACTLY the flagged merges: starved cells fold into the
      // lowest-id flagged cell (a lone starved cell has no partner)
      val (survivor, absorbed) =
        if (mergeFlagged.length >= 2) (mergeFlagged.head, mergeFlagged.tail)
        else (-1, Seq.empty[Int])
      absorbed.foreach(a => moveBucketFiles(s,
        s"$out/centroid=$a", s"$out/centroid=$survivor", a.toString))
      lastRebalanceState = (centroids, subs, survivor, absorbed)
      // phase 2: refresh again against the post-apply codebook
      val after = graft.Mat.detach(
        refreshFromLayoutIds(s.read.parquet(out), activeCodebook(centroids, subs, absorbed)))
      graft.Mat.detach(
        before.withColumn("phase", lit("before"))
          .unionAll(after.withColumn("phase", lit("after")))
          .select("phase", "centroid", "n_vectors", "cos_ppm", "action")
          .orderBy("phase", "centroid"))
    } finally assigned.unpersist(blocking = false)
  }

  @volatile private var lastRebalanceState:
    (Array[Array[Double]], Seq[(Int, Array[Array[Double]])], Int, Seq[Int]) = _

  /** One phase of the rebalance-loop twin: the deterministic mean fold
    * (recursive CTE ascending vec_id — the vector_avg replay), drift
    * cosine, and the decision rule against codebook `entries`, over
    * assignment CTE `asgCte`. Emits CTEs suffixed `sfx`; the result
    * CTE is `r$sfx`. */
  private def refreshFoldSql(sfx: String, asgCte: String,
      entries: Seq[(Int, Array[Double])]): String = {
    import graft.OracleSql
    val nlist = entries.size
    val ocRows = entries.map { case (i, v) =>
      s"($i, [${v.map(OracleSql.dlit).mkString(", ")}])" }.mkString(",\n    ")
    s"""g$sfx AS MATERIALIZED (SELECT centroid, list(embedding ORDER BY vec_id) AS vs,
       |      CAST(count(*) AS BIGINT) AS n FROM $asgCte GROUP BY 1),
       |it$sfx(centroid, i, acc) AS (
       |  SELECT centroid, 1, list_transform(vs[1], x -> CAST(x AS DOUBLE)) FROM g$sfx
       |  UNION ALL
       |  SELECT it$sfx.centroid, it$sfx.i + 1,
       |    list_transform(range(1, ${OracleSql.Dim + 1}),
       |      j -> it$sfx.acc[j] + CAST(g$sfx.vs[it$sfx.i + 1][j] AS DOUBLE))
       |  FROM it$sfx JOIN g$sfx ON g$sfx.centroid = it$sfx.centroid
       |  WHERE it$sfx.i < g$sfx.n),
       |mn$sfx AS (SELECT it$sfx.centroid, list_transform(it$sfx.acc, x -> x / g$sfx.n) AS m,
       |       g$sfx.n AS n
       |       FROM it$sfx JOIN g$sfx ON g$sfx.centroid = it$sfx.centroid
       |       WHERE it$sfx.i = g$sfx.n),
       |oc$sfx(centroid, v) AS (VALUES
       |    $ocRows),
       |t$sfx AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM mn$sfx),
       |r$sfx AS (SELECT mn$sfx.centroid, mn$sfx.n AS n_vectors,
       |  CAST(floor(${OracleSql.cosine(s"mn$sfx.m", s"oc$sfx.v")} * 1000000e0) AS BIGINT) AS cos_ppm,
       |  CASE WHEN mn$sfx.n * $nlist > t$sfx.total * 2 THEN 'split'
       |       WHEN mn$sfx.n * $nlist * 4 < t$sfx.total THEN 'merge'
       |       ELSE 'keep' END AS action
       |  FROM mn$sfx JOIN oc$sfx ON oc$sfx.centroid = mn$sfx.centroid CROSS JOIN t$sfx)"""
      .stripMargin
  }

  /** Rebalance-loop twin: one statement — argmin assignment, the
    * before-phase fold, the split sub-argmin + merge relabel, the
    * after-phase fold against the active codebook, both from this
    * run's stashed literals. */
  private def rebalanceLoopSql(centroids: Array[Array[Double]],
      subs: Seq[(Int, Array[Array[Double]])],
      survivor: Int, absorbed: Seq[Int]): String = {
    import graft.OracleSql
    val nlist = centroids.length
    val subCase = subs.zipWithIndex.map { case ((h, sc), j) =>
      val base = nlist + 2 * j
      s"""WHEN c0 = $h THEN (CASE WHEN ${OracleSql.l2sqLit("embedding", sc(1))}
         |    < ${OracleSql.l2sqLit("embedding", sc(0))}
         |    THEN ${base + 1} ELSE $base END)""".stripMargin
    }.mkString("\n      ")
    val splitExpr =
      if (subs.isEmpty) "c0" else s"CASE $subCase\n      ELSE c0 END"
    val afterExpr =
      if (absorbed.isEmpty) "c1"
      else s"CASE WHEN c1 IN (${absorbed.mkString(", ")}) THEN $survivor ELSE c1 END"
    s"""WITH RECURSIVE d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a0 AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS c0 FROM d),
       |ab AS (SELECT vec_id, embedding, c0 AS centroid FROM a0),
       |a1 AS (SELECT vec_id, embedding, $splitExpr AS c1 FROM a0),
       |aa AS (SELECT vec_id, embedding, $afterExpr AS centroid FROM a1),
       |${refreshFoldSql("b", "ab", centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v) })},
       |${refreshFoldSql("a", "aa", activeCodebook(centroids, subs, absorbed))}
       |SELECT * FROM (
       |  SELECT 'before' AS phase, * FROM rb
       |  UNION ALL SELECT 'after' AS phase, * FROM ra)
       |ORDER BY phase, centroid""".stripMargin
  }

  /** Merge twin: flat argmin, relabel absorbed → survivor, probe over
    * the reduced codebook, standard rerank — from stashed literals. */
  private def mergeApplySql(centroids: Array[Array[Double]],
      keep: Int, absorb: Int): String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries; val k = VectorSearch.K
    val active = centroids.zipWithIndex.collect {
      case (v, i) if i != absorb => (i, v) }
    val actDists = active.map { case (_, v) =>
      OracleSql.l2sqLit("embedding", v) }.mkString("[", ", ", "]")
    val actIds = active.map(_._1).mkString("[", ", ", "]")
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a AS (SELECT vec_id, embedding,
       |      CASE WHEN CAST(list_position(dl, list_min(dl)) - 1 AS INT) = $absorb
       |           THEN $keep
       |           ELSE CAST(list_position(dl, list_min(dl)) - 1 AS INT)
       |      END AS centroid FROM d),
       |pe AS (SELECT vec_id AS qid,
       |        unnest($actDists) AS dist,
       |        unnest($actIds) AS c
       |       FROM embeddings WHERE vec_id < $nq),
       |pr AS (SELECT qid, c FROM (
       |   SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, c ASC) AS rn
       |   FROM pe) WHERE rn <= 4),
       |nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |        FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id WHERE e.vec_id < $nq),
       |s AS (SELECT p.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM pr p JOIN a e ON e.centroid = p.c
       |      JOIN q ON q.qid = p.qid
       |      JOIN nrm n ON n.vec_id = e.vec_id)
       |SELECT qid, vec_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |  FROM s)
       |WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** (dist, id)-ordered top-n over an id-keyed codebook — nearestN's
    * tie rule on explicit ids (the extended-codebook probe). */
  private[graft] def nearestNIds(entries: Array[(Int, Array[Double])],
      v: Array[Double], n: Int): Array[Int] =
    entries.map { case (id, ctr) =>
      var d = 0.0; var i = 0
      while (i < v.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
      (d, id)
    }.sortBy(t => (t._1, t._2)).take(n).map(_._2)

  @volatile private var lastSplitState:
    (Array[Array[Double]], Seq[(Int, Array[Array[Double]])]) = _

  /** Split twin: two-stage assignment (original argmin; sub argmin
    * inside each split cell, strict-< first-wins = `d1 < d0` keeps
    * sub 0 on ties), extended-codebook (dist, id) probe ranking, and
    * the standard cosine rerank — all from stashed literals. */
  private def splitApplySql(centroids: Array[Array[Double]],
      subs: Seq[(Int, Array[Array[Double]])]): String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries; val k = VectorSearch.K
    val nlist = centroids.length
    val subCase = subs.zipWithIndex.map { case ((h, sc), j) =>
      val base = nlist + 2 * j
      s"""WHEN c0 = $h THEN (CASE WHEN ${OracleSql.l2sqLit("embedding", sc(1))}
         |    < ${OracleSql.l2sqLit("embedding", sc(0))}
         |    THEN ${base + 1} ELSE $base END)""".stripMargin
    }.mkString("\n      ")
    // every sampled top cell unsplittable (<2 distinct members) → no
    // split happened; a bare `CASE ELSE c0 END` is a parse error
    val centroidExpr =
      if (subs.isEmpty) "c0" else s"CASE $subCase\n      ELSE c0 END"
    // the SAME id-assignment rule as the engine path, by construction:
    // a twin that re-encodes it inline could silently drift
    val active: Seq[(Int, Array[Double])] =
      activeCodebook(centroids, subs, Seq.empty)
    val actDists = active.map { case (_, v) =>
      OracleSql.l2sqLit("embedding", v) }.mkString("[", ", ", "]")
    val actIds = active.map(_._1).mkString("[", ", ", "]")
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a0 AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS c0 FROM d),
       |a AS (SELECT vec_id, embedding,
       |      $centroidExpr AS centroid FROM a0),
       |pe AS (SELECT vec_id AS qid,
       |        unnest($actDists) AS dist,
       |        unnest($actIds) AS c
       |       FROM embeddings WHERE vec_id < $nq),
       |pr AS (SELECT qid, c FROM (
       |   SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, c ASC) AS rn
       |   FROM pe) WHERE rn <= $SplitNprobe),
       |nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |        FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id WHERE e.vec_id < $nq),
       |s AS (SELECT p.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM pr p JOIN a e ON e.centroid = p.c
       |      JOIN q ON q.qid = p.qid
       |      JOIN nrm n ON n.vec_id = e.vec_id)
       |SELECT qid, vec_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |  FROM s)
       |WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Refresh twin: replay assignment from the stashed centroid
    * literals, then the ONE deterministic mean-fold/decision body —
    * refreshFoldSql, the same CTE chain the rebalance-loop twin
    * replays twice — over assignment CTE `a` with the positional
    * codebook. The graded fold exists once; this twin just selects
    * its result CTE. */
  private def centroidRefreshSql(centroids: Array[Array[Double]]): String = {
    import graft.OracleSql
    s"""WITH RECURSIVE d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d),
       |${refreshFoldSql("", "a", centroids.zipWithIndex.toSeq.map { case (v, i) => (i, v) })}
       |SELECT centroid, n_vectors, cos_ppm, action FROM r
       |ORDER BY centroid""".stripMargin
  }

  private[graft] def ivfCellStatsSql(centroids: Array[Array[Double]]): String =
    s"""WITH d AS (SELECT vec_id,
       |  ${graft.OracleSql.distList("embedding", centroids)} AS dl FROM embeddings),
       |a AS (SELECT vec_id,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d),
       |c AS (SELECT centroid, CAST(count(*) AS BIGINT) AS n_vectors FROM a GROUP BY 1),
       |t AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS total FROM c)
       |SELECT centroid, n_vectors,
       |  (n_vectors * 1000000) // total AS share_ppm,
       |  n_vectors * ${centroids.length} > total * 2 AS hot
       |FROM c CROSS JOIN t ORDER BY centroid""".stripMargin

  private def indexSizeSql(centroids: Array[Array[Double]]): String =
    s"""WITH d AS (SELECT vec_id, len(embedding) AS dim,
       |  ${graft.OracleSql.distList("embedding", centroids)} AS dl FROM embeddings),
       |a AS (SELECT vec_id, dim,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d)
       |SELECT centroid, CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(count(*) * (8 + 4 * max(dim)) AS BIGINT) AS logical_bytes
       |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  /** Index config bookkeeping (reference storage.py:26-57
    * save_config/load_config/exists/clear): the index's metadata —
    * dim, metric, nlist, row count, format version — persisted as a
    * JSON document NEXT TO the layout and read back with an explicit
    * schema (never inferred: a corrupt config must fail loudly, not
    * re-type silently). Graded on the round-trip: the reloaded config
    * must equal what the corpus itself says. exists()/clear()
    * semantics spec'd in Round7Spec. */
  val ConfigSchema = "dim INT, metric STRING, n_vectors BIGINT, nlist INT, version INT"
  def writeConfig(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(dir)
  def readConfig(s: SparkSession, dir: String): DataFrame =
    s.read.schema(ConfigSchema).json(dir)
  def configExists(s: SparkSession, dir: String): Boolean = {
    val (fs, p) = layoutFs(s, dir)
    fs.exists(p) && fs.getFileStatus(p).isDirectory &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".json"))
  }
  def indexConfig(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    graft.Mat.withScratchDirs("index_config") { case Seq(out) =>
      val cfg = emb.agg(
          max(size(col("embedding"))).as("dim"),
          count(lit(1)).as("n_vectors"))
        .select(col("dim"), lit("cosine").as("metric"), col("n_vectors"),
          lit(16).as("nlist"), lit(1).as("version"))
      writeConfig(cfg, out)
      graft.Mat.detach(
        readConfig(s, out).select("dim", "metric", "n_vectors", "nlist", "version"))
    }
  }

  private val indexConfigSql: String =
    """SELECT CAST(max(len(embedding)) AS INT) AS dim, 'cosine' AS metric,
      |  count(*) AS n_vectors, CAST(16 AS INT) AS nlist, CAST(1 AS INT) AS version
      |FROM embeddings""".stripMargin

  /** RECALL-vs-NPROBE sweep — the tuning table every IVF deployment
    * reads before fixing its probe budget: for nprobe ∈ {1, 2, 4},
    * route the query set, exact-rerank the probed candidates, and
    * count the overlap with the TRUE exact top-k per query. Output is
    * all integers (per-query overlap count + a ppm recall off one
    * integral division), so the accuracy table grades bit-exactly even
    * though the underlying ranking is IEEE cosine — the same
    * rank-replay discipline every graded IVF query already uses; the
    * exact reference runs through the engine's own serving plan
    * (plans.VectorTopK). One assignment pass shared across all sweep
    * points; each point adds only its probe join. */
  val SweepProbes: Seq[Int] = Seq(1, 2, 4)
  @volatile private var lastSweepCentroids: Array[Array[Double]] = _

  def ivfRecallSweep(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < VectorSearch.NQueries)
    val k = VectorSearch.K
    val centroids = trainCentroids(trainSample(emb), 16, 10)
    lastSweepCentroids = centroids
    val assigned = assign(emb, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val exact = graft.plans.VectorTopK.topK(emb, queries, k)
      .select(col("qid"), col("vec_id"))
    val qRows = collectQueryRows(queries)
    val perNp = SweepProbes.map { np =>
      val probes = probesFor(qRows)(v => nearestN(centroids, v, np).toSeq)
      val probeDf = probeDfOf(s, probes)
      val cand = assigned.join(probeDf, "centroid")
      val scored = cand.join(queries.select(col("vec_id").as("qid"),
          col("embedding").cast(ArrayType(DoubleType)).as("qv")), "qid")
        .withColumn("score",
          graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
      val top = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).select("qid", "vec_id")
      val counts = top.groupBy("qid").agg(count(lit(1)).as("n_ivf"))
      val overlap = top.join(exact, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("n_overlap"))
      counts.join(overlap, Seq("qid"), "left")
        .select(lit(np).as("nprobe"), col("qid"), col("n_ivf"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
    }
    // detach before releasing the cache: the returned frame must not
    // recompute the corpus assignment after the unpersist
    graft.Mat.detach(perNp.reduce(_ unionAll _)
      .withColumn("recall_ppm", expr(s"n_overlap * 1000000 div $k"))
      .orderBy("nprobe", "qid"))
    } finally assigned.unpersist(blocking = false)
  }

  private def sweepSql(centroids: Array[Array[Double]]): String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries; val k = VectorSearch.K
    val nlist = centroids.length
    val per = SweepProbes.map { np =>
      s"""pr$np AS (SELECT qid, c FROM (
         |   SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, c ASC) AS rn
         |   FROM pe) WHERE rn <= $np),
         |s$np AS (SELECT p.qid, e.vec_id,
         |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
         |      FROM pr$np p JOIN a e ON e.centroid = p.c
         |      JOIN q ON q.qid = p.qid
         |      JOIN nrm n ON n.vec_id = e.vec_id),
         |t$np AS (SELECT qid, vec_id FROM (
         |   SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
         |   FROM s$np) WHERE rnk <= $k),
         |c$np AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_ivf FROM t$np GROUP BY 1),
         |o$np AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_overlap
         |         FROM t$np t JOIN ex ON ex.qid = t.qid AND ex.vec_id = t.vec_id
         |         GROUP BY 1),
         |r$np AS (SELECT CAST($np AS INT) AS nprobe, c$np.qid, n_ivf,
         |           COALESCE(o$np.n_overlap, 0) AS n_overlap
         |         FROM c$np LEFT JOIN o$np ON o$np.qid = c$np.qid)""".stripMargin
    }.mkString(",\n")
    val unions = SweepProbes.map(np => s"SELECT * FROM r$np").mkString(" UNION ALL ")
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d),
       |pe AS (SELECT vec_id AS qid, unnest(dl) AS dist, unnest(range(0, $nlist)) AS c
       |       FROM d WHERE vec_id < $nq),
       |nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |        FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id WHERE e.vec_id < $nq),
       |sx AS (SELECT q.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM q CROSS JOIN embeddings e JOIN nrm n ON n.vec_id = e.vec_id),
       |ex AS (SELECT qid, vec_id FROM (
       |   SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |   FROM sx) WHERE rnk <= $k),
       |$per
       |SELECT nprobe, qid, n_ivf, n_overlap,
       |  (n_overlap * 1000000) // $k AS recall_ppm
       |FROM ($unions) ORDER BY nprobe, qid""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("ivf_search" -> (ivfSearch _),
      "ivf_recall_sweep" -> (ivfRecallSweep _),
      "index_config" -> (indexConfig _),
      "ivf_search_mllib" -> (ivfSearchMLlib _),
      "ivf_adaptive" -> (ivfAdaptive _),
      "index_size" -> (indexSize _),
      "ivf_cell_stats" -> (ivfCellStats _),
      "ivf_centroid_refresh" -> (ivfCentroidRefresh _),
      "ivf_split_apply" -> (ivfSplitApply _),
      "ivf_merge_apply" -> (ivfMergeApply _),
      "ivf_rebalance_loop" -> (ivfRebalanceLoop _),
      "index_save_load" -> (indexSaveLoad _),
      "index_merge" -> (indexMerge _),
      "ivf_salted" -> (ivfSalted _),
      "index_merge_delete" -> (indexMergeDelete _))

  // ------------------------------------------------------------ oracles
  // k-means TRAINING is not SQL-expressible, but it is deterministic and
  // the driver dumps oracle SQL AFTER the queries run — so the trained
  // centroids of this run are embedded as literals and the oracle
  // independently recomputes assignment (first-wins argmin over
  // unrolled squared distances), probe selection ((dist, idx)-ordered
  // top-nprobe), candidate generation, and the exact cosine re-rank.
  // Training itself is covered by AnnSpec recall bounds + the
  // determinism audit.
  @volatile private var lastIvfCentroids: Array[Array[Double]] = _
  @volatile private[operators] var lastMllibCentroids: Array[Array[Double]] = _
  @volatile private var lastSaveLoadCentroids: Array[Array[Double]] = _

  /** corpusWhere filters the INDEXED rows only (tombstones, shard
    * subsets) — probe selection and the query set stay whole-corpus.
    * private[graft]: the streaming serve (stream_ivf) grades against
    * the same twin — streaming must equal the batch IVF search. */
  private[graft] def ivfSql(centroids: Array[Array[Double]], nprobe: Int,
                            corpusWhere: String = "TRUE"): String = {
    import graft.OracleSql
    val nq = VectorSearch.NQueries; val k = VectorSearch.K
    val nlist = centroids.length
    s"""WITH d AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${OracleSql.distList("embedding", centroids)} AS dl
       |  FROM embeddings),
       |a AS (SELECT vec_id, embedding,
       |      CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS centroid FROM d
       |      WHERE $corpusWhere),
       |pe AS (SELECT vec_id AS qid, unnest(dl) AS dist, unnest(range(0, $nlist)) AS c
       |       FROM d WHERE vec_id < $nq),
       |pr AS (SELECT qid, c FROM (
       |   SELECT qid, c, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, c ASC) AS rn
       |   FROM pe) WHERE rn <= $nprobe),
       |nrm AS (SELECT vec_id, sqrt(${OracleSql.dot("embedding", "embedding")}) AS nm
       |        FROM embeddings),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, n.nm AS qn
       |      FROM embeddings e JOIN nrm n ON e.vec_id = n.vec_id WHERE e.vec_id < $nq),
       |s AS (SELECT p.qid, e.vec_id,
       |        ${OracleSql.dot("q.qv", "e.embedding")} / (n.nm * q.qn) AS score
       |      FROM pr p JOIN a e ON e.centroid = p.c
       |      JOIN q ON q.qid = p.qid
       |      JOIN nrm n ON n.vec_id = e.vec_id)
       |SELECT qid, vec_id, score, CAST(rnk AS INT) AS "rank" FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
       |  FROM s)
       |WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  def oracles: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    m += "index_config" -> indexConfigSql
    if (lastIvfCentroids != null) m += "ivf_search" -> ivfSql(lastIvfCentroids, 4)
    if (lastSweepCentroids != null) m += "ivf_recall_sweep" -> sweepSql(lastSweepCentroids)
    if (lastMllibCentroids != null) m += "ivf_search_mllib" -> ivfSql(lastMllibCentroids, 4)
    if (lastSaveLoadCentroids != null)
      m += "index_save_load" -> ivfSql(lastSaveLoadCentroids, 4)
    if (lastAdaptiveCentroids != null)
      m += "ivf_adaptive" -> ivfAdaptiveSql(lastAdaptiveCentroids, MinCand)
    if (lastSizeCentroids != null)
      m += "index_size" -> indexSizeSql(lastSizeCentroids)
    if (lastCellStatsCentroids != null)
      m += "ivf_cell_stats" -> ivfCellStatsSql(lastCellStatsCentroids)
    if (lastRefreshCentroids != null)
      m += "ivf_centroid_refresh" -> centroidRefreshSql(lastRefreshCentroids)
    if (lastSplitState != null)
      m += "ivf_split_apply" -> splitApplySql(lastSplitState._1, lastSplitState._2)
    if (lastMergeApplyState != null)
      m += "ivf_merge_apply" -> mergeApplySql(
        lastMergeApplyState._1, lastMergeApplyState._2, lastMergeApplyState._3)
    if (lastRebalanceState != null)
      m += "ivf_rebalance_loop" -> rebalanceLoopSql(lastRebalanceState._1,
        lastRebalanceState._2, lastRebalanceState._3, lastRebalanceState._4)
    // index_merge's twin IS the whole-corpus IVF search: shard union +
    // compaction must be invisible to the probe.
    if (lastMergeCentroids != null)
      m += "index_merge" -> ivfSql(lastMergeCentroids, 4)
    // salted layout's twin IS the plain IVF search: the salt must be
    // invisible to results.
    if (lastSaltedCentroids != null)
      m += "ivf_salted" -> ivfSql(lastSaltedCentroids, 4)
    // tombstone merge: the indexed corpus excludes deleted ids, the
    // query set does not.
    if (lastMergeDeleteCentroids != null)
      m += "index_merge_delete" -> ivfSql(lastMergeDeleteCentroids, 4,
        s"vec_id % $TombstoneMod <> $TombstoneRes")
    m.result()
  }
}
