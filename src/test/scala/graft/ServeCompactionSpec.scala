package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.streaming.StreamingQueries

/** Round 8: the IVF-routed streaming serve (stream_ivf's read path)
  * under CONCURRENT compaction of the same layout — the serving-side
  * sibling of CompactionSpec's compact-while-ingesting. The serve's
  * static side pins the file snapshot it resolved at plan time; the
  * compactor only writes a NEW layout directory and swaps afterwards
  * (the only rewrite protocol that is safe with live readers — an
  * in-place rewrite would delete files under a running scan). Snapshot
  * isolation makes the race benign for readers: triggers served during
  * compaction and a fresh serve from the swapped-in compacted layout
  * must all be bit-equal to an undisturbed serve. */
class ServeCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private var sinkCtr = 0
  private def nextSink(): String = { sinkCtr += 1; s"r8_serve_$sinkCtr" }

  test("PQ coded layout: probes racing compactIndex stay bit-equal; the compacted layout serves identically") {
    import graft.operators.IvfPq
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = IvfPq.trainModel(IvfIndex.trainSample(emb))
    val q = emb.filter($"vec_id" < 10)
    def probe(dir: String): Seq[(Long, Long, Double, Int)] =
      IvfPq.ivfpqCodedProbe(spark.read.parquet(dir), q, model, 10)
        .as[(Long, Long, Double, Int)].collect().toSeq
    Mat.withScratchDirs("pq_live", "pq_compacted") { case Seq(live, compacted) =>
      // ingest-shaped layout: three append generations per bucket
      (0 until 3).foreach { r =>
        IvfPq.encodePq(emb.filter($"vec_id" % 3 === r), model)
          .write.partitionBy("centroid").mode("append").parquet(live)
      }
      val undisturbed = probe(live)
      assert(undisturbed.nonEmpty)
      // the race: compaction rewrites into a NEW directory (the only
      // protocol safe with live readers) while probes keep serving the
      // live layout — actual concurrent jobs on the same session
      val compaction = Future(IvfIndex.compactIndex(spark, live, compacted))
      val during = probe(live)
      Await.result(compaction, Duration.Inf)
      val afterSwap = probe(compacted)
      assert(during == undisturbed, "probe racing compaction diverged")
      assert(afterSwap == undisturbed, "compacted layout serves differently")
      // compaction actually collapsed the generations: one file per bucket
      val filesPerBucket = new java.io.File(compacted).listFiles()
        .filter(_.getName.startsWith("centroid="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      assert(filesPerBucket.nonEmpty && filesPerBucket.forall(_ == 1),
        s"buckets still fragmented: ${filesPerBucket.toSeq}")
    }
  }

  test("serve triggers racing compactIndex: results bit-equal throughout and after the swap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 16, 10)
    val qs = emb.filter($"vec_id" < 12)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val chunks = qs.grouped(math.max(1, qs.length / 3)).map(_.toSeq).toSeq
    val k = 5

    /** Run the IVF-routed serve over `layout`, feeding the query chunks
      * one trigger at a time; `beforeTrigger(i)` runs before chunk i is
      * fed (the race hook). Each query's candidates arrive in its own
      * trigger, so every update-mode emission is final. */
    def runServe(layout: DataFrame, beforeTrigger: Int => Unit = _ => ())
        : Seq[(Long, Long, Double, Int)] = {
      val input = MemoryStream[(Long, Seq[Double])]
      val name = nextSink()
      val q = StreamingQueries.ivfServe(layout, centroids, 4, k)(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try chunks.zipWithIndex.foreach { case (c, i) =>
        beforeTrigger(i); input.addData(c: _*); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[(Long, Long, Double, Int)]
        .collect().sortBy(t => (t._1, t._4)).toSeq
    }

    Mat.withScratchDirs("r8_live", "r8_compacted") { case Seq(live, compacted) =>
      // serving layout with several file generations per bucket (three
      // appends — the shape incremental ingest leaves behind)
      val assigned = IvfIndex.assign(emb, centroids)
      (0 until 3).foreach { i =>
        assigned.filter(pmod($"vec_id", lit(3)) === i)
          .write.partitionBy("centroid").mode("append").parquet(live)
      }
      def load(dir: String) = spark.read.parquet(dir)
        .select($"vec_id", $"embedding", $"centroid".cast("int").as("centroid"))

      // 1. undisturbed serve: the trusted reference (Round7Spec proves
      //    this path == batch ivf_search)
      val quiet = runServe(load(live))
      assert(quiet.nonEmpty && quiet.map(_._1).distinct.length == qs.length)

      // 2. serve again with compactIndex racing triggers 2..3 on the
      //    SAME live layout
      @volatile var compactJob: Future[Unit] = null
      val racing = runServe(load(live), beforeTrigger = { i =>
        if (i == 1) {
          compactJob = Future { IvfIndex.compactIndex(spark, live, compacted) }
          // the job was just launched — triggers 2..3 overlap it
          assert(!compactJob.isCompleted, "compaction finished before any trigger raced it")
        }
      })
      Await.result(compactJob, Duration(180, "s"))
      assert(racing == quiet, "serve results drifted while compaction raced the layout")

      // 3. post-swap: a fresh serve from the compacted layout is
      //    bit-equal (compaction changed file layout, not content)
      val swapped = runServe(load(compacted))
      assert(swapped == quiet, "serve from the compacted layout differs")

      // and the compacted layout is actually compacted + still prunes
      def parquetFiles(root: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(root))
      }
      assert(parquetFiles(compacted) < parquetFiles(live))
      val plan = load(compacted).filter($"centroid" === 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan.take(800))
    }
  }

  test("coded-layout serve racing compactIndex: candidate emissions bit-equal throughout and after the swap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.BinaryQuant
    val emb = Tables.load(spark, sfDir, "embeddings")
    val centroids = IvfIndex.trainCentroids(IvfIndex.trainSample(emb), 16, 10)
    val qs = emb.filter($"vec_id" < 12)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val chunks = qs.grouped(math.max(1, qs.length / 3)).map(_.toSeq).toSeq
    val r = BinaryQuant.RerankR

    def runServe(codes: DataFrame, beforeTrigger: Int => Unit = _ => ())
        : Seq[(Long, Long, Double, Int)] = {
      val input = MemoryStream[(Long, Seq[Double])]
      val name = nextSink()
      val q = StreamingQueries.codedServe(codes, centroids, 4, r)(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try chunks.zipWithIndex.foreach { case (c, i) =>
        beforeTrigger(i); input.addData(c: _*); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[(Long, Long, Double, Int)]
        .collect().sortBy(t => (t._1, t._4)).toSeq
    }

    Mat.withScratchDirs("r9_coded_live", "r9_coded_compacted") { case Seq(live, compacted) =>
      // coded serving layout with several file generations per bucket
      // (incremental-ingest shape): (vec_id, embedding, code, centroid)
      val coded = IvfIndex.assign(emb, centroids)
        .withColumn("code", graft.functions.VectorOps.signCode($"embedding"))
      (0 until 3).foreach { i =>
        coded.filter(pmod($"vec_id", lit(3)) === i)
          .write.partitionBy("centroid").mode("append").parquet(live)
      }
      def codesOf(dir: String) = spark.read.parquet(dir)
        .select($"vec_id", $"code", $"centroid".cast("int").as("centroid"))

      val quiet = runServe(codesOf(live))
      assert(quiet.nonEmpty && quiet.map(_._1).distinct.length == qs.length)

      @volatile var compactJob: Future[Unit] = null
      val racing = runServe(codesOf(live), beforeTrigger = { i =>
        if (i == 1) {
          compactJob = Future { IvfIndex.compactIndex(spark, live, compacted) }
          assert(!compactJob.isCompleted, "compaction finished before any trigger raced it")
        }
      })
      Await.result(compactJob, Duration(180, "s"))
      assert(racing == quiet, "coded serve drifted while compaction raced the layout")

      // post-swap serve from the compacted coded layout: bit-equal, and
      // the persisted code column survived the rewrite
      val swapped = runServe(codesOf(compacted))
      assert(swapped == quiet, "serve from the compacted coded layout differs")

      def parquetFiles(root: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(root))
      }
      assert(parquetFiles(compacted) < parquetFiles(live))
      // candidate path still reads only (vec_id, code) of pruned partitions
      val plan = codesOf(compacted).filter($"centroid" === 3)
        .select($"vec_id", $"code")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan.take(800))
      assert(!plan.contains("embedding"), "candidate scan read the float column")
    }
  }
}
