package graft

import graft.operators.{Bm25, Mmr, ServeE2e}
import graft.streaming.StreamingQueries

/** Round-16 session additions: the streaming serve composition. */
class Round20Spec extends SparkTestBase {

  test("stream_serve_e2e == batch serve_e2e row-for-row (same layouts, same centroids, same fusion and MMR arithmetic)") {
    val batch = ServeE2e.serveE2e(spark, sfDir).collect().toSeq
    val stream = StreamingQueries.queries("stream_serve_e2e")(spark, sfDir)
      .collect().toSeq
    assert(stream.length == Bm25.NQueriesB * Mmr.SelectK,
      s"streamed serve emitted ${stream.length} rows")
    assert(stream == batch,
      s"streaming serve diverged from batch:\n  batch ${batch.take(3)}\n  stream ${stream.take(3)}")
  }
}
