package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.Tables

/** Graph-partitioned HNSW emulation — the Spark re-expression of the
  * reference's actual index structure (vector_index.py index_type=
  * 'hnsw', hnswlib). A single global navigable-small-world graph does
  * not distribute; the cluster-scale shape is:
  *
  *   IVF routing  →  per-bucket NSW graphs  →  beam search  →  merge
  *
  * The corpus is routed to nlist centroid buckets (same deterministic
  * k-means as IvfIndex); each bucket independently builds a
  * navigable-small-world graph (insertion in vec_id order, each node
  * linked to its M nearest among already-inserted nodes, with
  * back-links pruned to M — the classic NSW construction, the level-0
  * layer of HNSW). A query fans out only to its nprobe nearest
  * buckets, beam-searches each local graph (ef candidates), and the
  * per-bucket partials merge into a global top-k.
  *
  * Scale posture (100 TB): buckets are data-partition-sized — each
  * graph build is executor-local over one group (flatMapGroups), no
  * global structure, no driver state. Queries are broadcast; only
  * nprobe/nlist of the corpus is touched per query, and the merged
  * shuffle is bounded by buckets·q·k rows, never the corpus. Bucket
  * membership comes from the semantic key (centroid id), NOT from
  * physical partitioning — results are independent of
  * spark.sql.shuffle.partitions / core count (determinism audit holds).
  *
  * Determinism: insertion order is vec_id order within a bucket,
  * neighbor sets break distance ties by id, and the beam search uses
  * (dist, id)-lexicographic heaps — two runs (any parallelism) produce
  * identical results. Spec'd in HnswSpec: recall vs exact kNN,
  * self-match, determinism, and bucket-routing agreement with IVF.
  */
object HnswAnn {
  val M = 8
  val EfSearch = 48
  val NList = 16
  val NProbe = 4

  /** One NSW graph over the vectors of a single bucket. */
  final class NswGraph(val ids: Array[Long], val vecs: Array[Array[Double]]) {
    val n: Int = ids.length
    private val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])

    private def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val df = a(i) - b(i); s += df * df; i += 1 }
      s
    }

    /** Greedy beam search over the CURRENT graph from entry 0.
      * Returns up to ef (dist, node) pairs, (dist, id)-ordered. */
    def beam(q: Array[Double], ef: Int, upTo: Int): Array[(Double, Int)] = {
      if (upTo == 0) return Array.empty
      val visited = new java.util.BitSet(upTo)
      // candidates: min-heap by (dist, id); results: max-heap by (dist, id)
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
      val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
      val d0 = d2(q, vecs(0))
      cand.enqueue((d0, 0)); res.enqueue((d0, 0)); visited.set(0)
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= ef && dc > res.head._1) { cand.clear() }
        else {
          val nbrs = adj(c)
          var i = 0
          while (i < nbrs.length) {
            val nb = nbrs(i)
            if (nb < upTo && !visited.get(nb)) {
              visited.set(nb)
              val dn = d2(q, vecs(nb))
              if (res.size < ef || dn < res.head._1 ||
                  (dn == res.head._1 && nb < res.head._2)) {
                cand.enqueue((dn, nb))
                res.enqueue((dn, nb))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      res.dequeueAll.toArray.sortBy(t => (t._1, ids(t._2)))
    }

    /** NSW build: insert nodes in index (= vec_id) order; node i links
      * to its M nearest among 0..i-1 found by beam search, with
      * reciprocal back-links pruned to the M nearest by distance. */
    def build(): this.type = {
      var i = 1
      while (i < n) {
        val found = beam(vecs(i), math.max(EfSearch, M), i).take(M)
        found.foreach { case (_, j) =>
          adj(i) += j
          adj(j) += i
          if (adj(j).length > M) {
            // prune j's links to the M nearest (ties by id) — keeps
            // degree bounded, the NSW invariant
            val pruned = adj(j).toArray
              .map(x => (d2(vecs(j), vecs(x)), ids(x), x))
              .sortBy(t => (t._1, t._2)).take(M).map(_._3)
            adj(j).clear(); adj(j) ++= pruned
          }
        }
        i += 1
      }
      this
    }

    def search(q: Array[Double], k: Int): Array[(Long, Double)] =
      beam(q, EfSearch, n).take(k).map { case (d, node) => (ids(node), d) }
  }

  /** Full operator: IVF-route buckets, build per-bucket NSW graphs,
    * beam-search the broadcast queries, merge to global top-k by
    * cosine score (same output shape as the knn operators). */
  def hnswSearch(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = NList, nprobe: Int = NProbe): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col("embedding").cast(ArrayType(DoubleType)))
      .limit(100000).collect().map(_.getSeq[Double](0).toArray)
    val centroids = IvfIndex.trainCentroids(sample, nlist, 10)
    val assigned = IvfIndex.assign(corpus, centroids)

    val qRows = queries.select(col("vec_id").cast("long"),
      col("embedding").cast(ArrayType(DoubleType))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bq = spark.sparkContext.broadcast(qRows)
    val probes: Map[Long, Array[Int]] = qRows.map { case (qid, v) =>
      qid -> IvfIndex.nearestN(centroids, v, nprobe)
    }.toMap
    val bp = spark.sparkContext.broadcast(probes)

    val partials = assigned
      .select(col("centroid"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        // unit-normalize for the graph metric: L2 on unit vectors is
        // monotone in cosine (hnswlib's cosine space does the same)
        def unit(v: Array[Double]): Array[Double] = {
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i) * v(i); i += 1 }
          val nm = math.sqrt(s)
          if (nm == 0.0) v else v.map(_ / nm)
        }
        val rows = it.toArray.sortBy(_._2) // vec_id order: deterministic build
        val g = new NswGraph(rows.map(_._2), rows.map(t => unit(t._3.toArray))).build()
        bq.value.iterator
          .filter { case (qid, _) => bp.value(qid).contains(bucket) }
          .flatMap { case (qid, qv) =>
            g.search(unit(qv), EfSearch).map { case (id, _) => (qid, id) }
          }
      }
      .toDF("qid", "vec_id")

    // exact cosine on the surviving candidates, global top-k
    val scored = partials.distinct()
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        col("embedding").as("qv"))), "qid")
      .withColumn("score", graft.functions.VectorOps.cosineSim(col("embedding"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank")
  }

  def hnswPartitioned(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    hnswSearch(emb, emb.filter(col("vec_id") < VectorSearch.NQueries), VectorSearch.K)
  }
}
