package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphRank}

/** Round-17 optimization session: scale-adaptive shuffle partitioning
  * for the batch iterative loops (Mat.withLoopPartitions — the
  * streamStatePartitions template applied to the GraphRank / Dedup CC
  * superstep harnesses). */
class Round21Spec extends SparkTestBase {

  test("loopPartitions: ceil(rows/rowsPerPartition) capped at session parallelism") {
    assert(Mat.loopPartitions(spark, 0L) == 1)
    assert(Mat.loopPartitions(spark, 1L) == 1)
    assert(Mat.loopPartitions(spark, 8192L) == 1)
    assert(Mat.loopPartitions(spark, 8193L) == 2)
    // cap: the test session runs 4 shuffle partitions
    assert(Mat.loopPartitions(spark, 10L * 1000 * 1000) == 4)
    // knob override
    spark.conf.set("spark.graft.loop.rowsPerPartition", "10")
    try assert(Mat.loopPartitions(spark, 25L) == 3)
    finally spark.conf.unset("spark.graft.loop.rowsPerPartition")
  }

  test("withLoopPartitions: applies inside, restores after, nested calls pass through") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    Mat.withLoopPartitions(spark, 5L) {
      assert(spark.conf.get(key) == "1")
      // nested scope must NOT re-override (outer working set rules) and
      // must NOT clobber the outer stash on exit
      Mat.withLoopPartitions(spark, 100L * 1000 * 1000) {
        assert(spark.conf.get(key) == "1")
      }
      assert(spark.conf.get(key) == "1")
      assert(spark.conf.getOption("spark.graft.loop.outerPartitions").contains(before))
    }
    assert(spark.conf.get(key) == before)
    assert(spark.conf.getOption("spark.graft.loop.outerPartitions").isEmpty)
    // restore also on failure
    intercept[RuntimeException] {
      Mat.withLoopPartitions(spark, 5L) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == before)
    assert(spark.conf.getOption("spark.graft.loop.outerPartitions").isEmpty)
  }

  test("Mat.fanout inside a loop scope fans to the pre-override parallelism") {
    import spark.implicits._
    Mat.withLoopPartitions(spark, 5L) {
      val df = Mat.fanout(Seq(1, 2, 3).toDF("x"))
      // the session conf says 1 inside the scope; fanout must still use
      // the stashed outer width (4)
      assert(df.rdd.getNumPartitions == 4)
    }
  }

  test("loop-partitioned supersteps: hits/kcore/lpa/bfs/largestar values unchanged on a planted graph") {
    import spark.implicits._
    // K4 plus a pendant chain — small enough to hand-check, shaped
    // enough to exercise every loop (peel cascade, label ties, bfs
    // frontier, star alternation)
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b)
    val chain = Seq((3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L))
    val edges = (k4 ++ chain).toDF("src", "dst").localCheckpoint(true)
    // values must be identical whether the loop runs at the session's
    // 4 shuffle partitions or the adaptive count (1 here): run each
    // loop both ways (knob forced wide vs default) and diff
    def runAll(): Seq[Seq[org.apache.spark.sql.Row]] = Seq(
      GraphRank.hitsOverEdges(edges).orderBy("id").collect().toSeq,
      GraphRank.lpaOverEdges(edges).orderBy("vec_id").collect().toSeq,
      GraphRank.bfsOverEdges(edges, 1L).orderBy("vec_id").collect().toSeq,
      Dedup.ccLargeStar(edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
        .collect().toSeq)
    val adaptive = runAll()
    spark.conf.set("spark.graft.loop.rowsPerPartition", "1") // force cap-width loops
    val wide = try runAll()
    finally spark.conf.unset("spark.graft.loop.rowsPerPartition")
    assert(adaptive == wide,
      "loop results depend on the loop partition count — they must not")
    // largestar: one component {0..5} rooted at 0
    val cc = adaptive(3).map(r => (r.getLong(0), r.getLong(1)))
    assert(cc == (0L to 5L).map(i => (i, 0L)),
      s"largestar components wrong: $cc")
  }
}
