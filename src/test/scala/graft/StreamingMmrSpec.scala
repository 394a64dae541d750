package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Knn, Mmr}
import graft.streaming.StreamingMmr

/** Streaming MMR converges to the batch selection once all candidates
  * have arrived, regardless of arrival chunking. */
class StreamingMmrSpec extends SparkTestBase {
  import spark.implicits._

  test("keyed-state MMR over chunked arrivals == batch MMR on the full pool") {
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
    val cands = Knn.topK(emb, queries, Mmr.CandidateK, Knn.Cosine)
      .join(emb.select($"vec_id", $"embedding".cast("array<double>").as("emb")), "vec_id")
      .select($"qid", $"vec_id", $"score", $"emb")
      .as[(Long, Long, Double, Seq[Double])].collect()
      .map { case (q, id, rel, v) => StreamingMmr.Cand(q, id, rel, v) }

    // batch reference selection per query
    val expected = cands.groupBy(_.qid).map { case (qid, cs) =>
      val arr = cs.sortBy(c => (-c.rel, c.vecId)).map(c => (c.vecId, c.rel, c.vec.toArray))
      qid -> Mmr.select(arr, Mmr.SelectK, Mmr.Lambda).toSeq
    }

    val input = MemoryStream[StreamingMmr.Cand]
    val out = StreamingMmr.select(input.toDS())
    val q = out.writeStream.format("memory").queryName("stream_mmr")
      .outputMode("update").start()
    // adversarial chunking: split mid-pool, second chunk reshuffles ranks
    val (chunk1, chunk2) = cands.sortBy(c => (c.vecId % 3, c.qid)).splitAt(cands.length / 2)
    input.addData(chunk1.toSeq: _*)
    q.processAllAvailable()
    input.addData(chunk2.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    // last update per qid = final selection
    val updates = spark.table("stream_mmr")
      .as[StreamingMmr.Sel].collect()
    // for each qid take the LAST k rows (update mode appends each trigger's emission)
    val finalSel = updates.groupBy(_.qid).map { case (qid, rows) =>
      qid -> rows.takeRight(Mmr.SelectK).map(r => (r.vec_id, r.mmr_score)).toSeq
    }
    expected.foreach { case (qid, exp) =>
      assert(finalSel(qid) == exp, s"qid=$qid\n got=${finalSel(qid)}\n exp=$exp")
    }
  }
}
