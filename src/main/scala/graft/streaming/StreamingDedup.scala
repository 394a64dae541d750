package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup
import graft.functions.TextHashOps

/** Incremental near-duplicate detection (SURVEY §7 round-3 candidate):
  * documents ARRIVE as a stream; each new document's MinHash band keys
  * probe stateful LSH buckets, candidate pairs are emitted against the
  * members already in the bucket, and the new member is added — the
  * streaming form of dedup_minhash_lsh's bucket join. Signatures are
  * computed by the SAME codegen expressions as the batch path
  * (row-local, stream-safe); only (band, hash) keys and doc ids live
  * in state, never text.
  *
  * Scale: state per key is one bucket's member-id list, sharded by the
  * state store across executors exactly like the batch shuffle's
  * bucket partitioning. A bucket-size cap bounds state growth (the
  * batch path drops capped buckets wholesale; incrementally we stop
  * ADDING members past the cap — equal semantics while every bucket is
  * under the cap, which the spec asserts for the corpus it replays).
  *
  * StreamingDedupSpec: replaying the corpus in adversarial chunks
  * emits exactly the batch candidate set, and the verified (exact
  * Jaccard) pairs equal batch dedup_minhash_lsh output.
  */
object StreamingDedup {
  case class BandHit(bucket: Long, doc_id: Long)
  case class Pair(doc_a: Long, doc_b: Long)

  /** band keys per doc with the SAME construction as the batch path:
    * key = xxhash64(band_idx, sig slice), combined with the band index
    * into one 64-bit bucket id. */
  def bandHits(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fan the (single-task) doc scan out before the 64-lane signature
    // map — same guide §2.5 treatment as the batch minhash path
    val sig = graft.Mat.fanout(docs).select(col(idCol).cast("long").as("doc_id"),
      TextHashOps.minhashSigLong(Dedup.shingleHashes3(col(textCol)), Dedup.NumHashes).as("sig"))
    sig.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(Dedup.Bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * Dedup.RowsPerBand + 1, lit(Dedup.RowsPerBand))))))
      .select(xxhash64(col("pos"), col("col")).as("bucket"), col("doc_id"))
  }

  /** Stateful bucket membership: new arrivals pair against existing
    * members (and each other), then join the bucket. */
  def candidatePairs(hits: Dataset[BandHit], maxBucket: Int = Dedup.MaxBucketSize): Dataset[Pair] = {
    import hits.sparkSession.implicits._
    hits.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[BandHit], state: GroupState[List[Long]]) =>
          val members = state.getOption.getOrElse(Nil)
          val arrivals = it.map(_.doc_id).toList.distinct.filterNot(members.contains).sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
          var cur = members
          arrivals.foreach { d =>
            if (cur.length < maxBucket) {
              cur.foreach { m =>
                out += (if (m < d) Pair(m, d) else Pair(d, m))
              }
              cur = d :: cur
            }
          }
          state.update(cur)
          out.iterator
      }
  }
}
