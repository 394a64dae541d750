package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Mmr

/** Streaming MMR reranking with keyed state (SURVEY §7 round-2
  * candidate): candidates for each query arrive incrementally (the
  * online-serving shape — an ANN stage emits scored candidates as
  * shards respond); per-query state accumulates the candidate pool and
  * every trigger re-emits the CURRENT diversity selection. Once all
  * candidates have arrived, the emitted selection is exactly the batch
  * `Mmr.select` over the full pool (spec'd in StreamingMmrSpec).
  *
  * Scale: state per key is the bounded candidate pool (top-N from the
  * ANN stage, N small), keyed by query — the state store shards across
  * executors like any keyed stream. */
object StreamingMmr {
  case class Cand(qid: Long, vecId: Long, rel: Double, vec: Seq[Double])
  /** `pool_n` = accumulated candidate-pool size at emission time: once
    * it reaches the ANN stage's candidate count the emission is the
    * final, batch-equal selection (how stream_mmr grades itself). */
  case class Sel(qid: Long, vec_id: Long, mmr_rank: Int, mmr_score: Double, pool_n: Int)

  def select(ds: Dataset[Cand], k: Int = Mmr.SelectK,
             lambda: Double = Mmr.Lambda): Dataset[Sel] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.qid)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (qid: Long, it: Iterator[Cand], state: GroupState[List[Cand]]) =>
          // merge new arrivals into the pool; candidate order is the
          // batch order (rel desc, id asc) so selection ties match
          val pool = (state.getOption.getOrElse(Nil) ++ it.toList)
            .distinctBy(_.vecId)
            .sortBy(c => (-c.rel, c.vecId))
          state.update(pool)
          val arr = pool.map(c => (c.vecId, c.rel, c.vec.toArray)).toArray
          Mmr.select(arr, k, lambda).zipWithIndex.iterator.map {
            case ((id, s), i) => Sel(qid, id, i + 1, s, arr.length)
          }
      }
  }
}
