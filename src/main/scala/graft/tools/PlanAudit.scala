package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps PLANS.md: physical-plan evidence for the scale-design claims
  * (predicate pushdown, column pruning, broadcast joins, whole-stage
  * codegen spans) straight from `.explain("formatted")` of the graded
  * queries. Run: `sbt "runMain graft.tools.PlanAudit"`. */
object PlanAudit {
  val Audited: Seq[(String, String)] = Seq(
    "q6_forecast" -> "every predicate reaches the parquet scan; 4-column read schema",
    "knn_filtered" -> "metadata filter pushed BENEATH the custom VectorTopK operator into the scan",
    "q1_pricing" -> "date filter pushed; partial aggregation before the exchange",
    "q3_revenue_topn" -> "dimension broadcast; fact-fact join on the natural key",
    "q5_nation_revenue" -> "supplier/nation/region broadcast chain",
    "dedup_minhash_lsh" -> "candidate pairs broadcast into the verify join (hash arrays never shuffle)",
    "events_value_quantiles" -> "single window pass over the sorted type partitions",
    "text_tfidf" -> "vocabulary-sized document-frequency table broadcast",
    "events_layout" -> "day predicate prunes partition directories of the at-rest layout (PartitionFilters)",
    "vectorgen_source" -> "DSv2 source: vec_id range pushed into the generator, columns pruned at the connector",
    "multiscale_search" -> "ONE corpus pass scores all truncation scales: the custom InternalRow-direct MultiscaleTopK physical operator sits directly over the pruned parquet scan",
    "sql_pipeline" -> "SQL-text kNN rewritten by VectorTopKRewrite onto the VectorTopKJoin partial-top-k exec — the q×n cross join never materializes; query-side filter still pushed to the scan",
    "semdedup" -> "cluster-blocked near-dup scoring: the quadratic verify joins on centroid only; no cross-cluster pair ever scored",
    "bpe_encode" -> "learned merges applied as literal replace calls inside the scan projection (codegen, no UDF); the per-doc aggregation is the only shuffle",
    "text_normalize" -> "NFC canonicalization is one codegen projection over the scan",
    "data_decontaminate" -> "held-out eval shingles broadcast; the training corpus streams through the join without shuffling text",
    "global_shuffle" -> "keyed permutation realized as a RANGE exchange (sampled bounds) — no single-reducer global sort",
    "bm25_search" -> "serves the at-rest postings layout: NO documents scan anywhere in the plan (tokenize happened once at index build); df / query-term / corpus-total sides all broadcast",
    "hybrid_rrf" -> "both top-N-bounded rank lists broadcastable; dense side served by the VectorTopK custom plan, sparse side by the postings layout",
    "multivector_maxsim" -> "query tokens ride the corpus scan as LITERAL cosine columns — no join, no pair explosion; both MaxSim reductions (per-slot max + written-order sum) in a single doc-keyed partial-agg exchange",
    "graph_pagerank" -> "iterative edge-rank joins over the cached pre-partitioned edge table; per-superstep plans stay one-join-one-aggregate deep",
    "multivector_maxsim_ivf" -> "routed candidates: probed-cell doc set from a broadcast centroid equi-join — the corpus-wide cross join never forms; exact scoring tail over candidates only",
    "bm25_delete" -> "merge-on-read: tombstones broadcast into an ANTI join inside the postings scan; df/dl/totals adjust by deletion-sized aggregates — no documents scan, no layout rewrite",
    "dedup_jaccard_prefix" -> "prefix-filtered exact all-pairs: wordcount-shaped postings/df/rank shuffles, candidate-bounded verify join — the quadratic pair scan and the lossy df cap both gone",
    "sketch_distinct_kmv" -> "bounded bottom-k aggregate partial-aggregates map-side (ObjectHashAggregate); only k longs per group cross the exchange",
    "events_interval_join" -> "banded range join planned as an EQUI-join on (user, bucket) — no BroadcastNestedLoop/Cartesian anywhere; 2× click replication replaces the per-user pair scan",
    "text_collocations" -> "global top-20 executes as TakeOrderedAndProject (per-partition partial top-k, never a single-partition sort); marginals derive from the one bigram-count aggregate",
    "q_cube" -> "all four grouping sets via ONE Expand + one partially-aggregated exchange — never four scans",
    "events_outliers" -> "3-long-per-group stats broadcast back; flagging is a codegen filter inside the scan stage",
    "graph_triangles" -> "degree-oriented wedge and closure stages are plain equi-joins — no nested loop, no cross product",
    "sketch_distinct_hll" -> "register grid partial-aggregates map-side; 64 (register, max-ρ) longs per group cross the exchange",
    "q19_disjunctive" -> "disjunctive-predicate join: ONE broadcast equi-join on the part key, the three OR'd branches a codegen post-join filter — no nested loop",
    "q21_waiting" -> "double-correlated subqueries as left-semi + left-anti self-joins on the fact's natural key; supplier dim broadcast",
    "q22_global" -> "scalar positive-balance aggregate broadcast as one row; urgent-order anti join; the average compared by integer cross-multiply inside the scan filter",
    "cluster_topics" -> "ONE tokenize pass; (centroid, term) count is the only corpus-sized exchange; per-cluster token totals and the corpus scalar broadcast",
    "text_rake" -> "phrase assembly = one gaps-and-islands window keyed by doc_id; word-score table broadcast into the distinct-phrase join; top-20 as TakeOrderedAndProject",
    "q_basket_pairs" -> "basket-bounded self equi-join on the order key (never a corpus cross); brand marginals broadcast",
    "events_drift" -> "2-long ts-span aggregate broadcast back (map-only window split); per-type totals broadcast into the bucket join",
    "events_ntile" -> "one window pass per type partition; output dimension-bounded at |types|·10",
    "graph_link_predict" -> "middle-node wedge join and edge anti-join are plain equi-joins (hub middles above LinkMiddleCap leave by a broadcast anti-join before wedge generation); top-20 as TakeOrderedAndProject",
    "dedup_lsh_tradeoff" -> "truth side = prefix-filtered postings self-join (each doc indexes only its rarest half): a stop-shingle's df-squared pair melt never enters candidate generation; verify is a candidate-bounded join with a single merge-pass intersection per pair; band bucket keys are 63-bit md5 longs of the lane-ordered signature slice (round 12 — one long per (doc, band) crosses the bucket exchange instead of an r-lane decimal string)")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by graft.tools.PlanAudit)\n\n")
    sb.append("Excerpts from `.explain(\"formatted\")` at sf0.001 backing the SURVEY §4 ")
    sb.append("scale claims: filters/pruning reach the scans, dimension sides broadcast, ")
    sb.append("hot paths stay inside WholeStageCodegen.\n")
    Audited.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val keep = plan.linesIterator.filter { l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("BroadcastHashJoin") || l.contains("BroadcastExchange") ||
        l.contains("WholeStageCodegen") || l.contains("SortMergeJoin") ||
        l.contains("BroadcastNestedLoopJoin") ||
        l.contains("PartitionFilters") || l.contains("VectorGenScan") ||
        l.contains("MultiscaleTopK") || l.contains("VectorTopK") ||
        l.contains("VectorTopKJoin") || l.contains("ObjectHashAggregate")
      }.map(_.trim).toSeq.distinct
      sb.append(s"\n## $name — $why\n\n```\n")
      keep.foreach(l => sb.append(l).append('\n'))
      sb.append("```\n")
    }
    // ivfpq_coded's graded entry returns a DETACHED result (scratch
    // layout deleted), so audit the at-rest candidate stage directly:
    // write the coded layout, explain the ADC scan over it.
    locally {
      import org.apache.spark.sql.functions.col
      val emb = graft.Tables.load(spark, sf, "embeddings")
      val model = graft.operators.IvfPq.trainModel(
        graft.operators.IvfIndex.trainSample(emb))
      graft.Mat.withScratchDirs("plans_pq_coded") { case Seq(dir) =>
        graft.operators.IvfPq.writeCodedPqLayout(emb, model, dir)
        import spark.implicits._
        val probeDf = Seq((0L, 0, Seq.fill(model.cb.m)(Seq.fill(16)(0.0))))
          .toDF("qid", "centroid", "lut")
        val plan = graft.operators.IvfPq
          .pqCodedCandidates(spark.read.parquet(dir), probeDf, Seq(0, 1))
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        val keep = plan.linesIterator.filter { l =>
          l.contains("PartitionFilters") || l.contains("ReadSchema") ||
          l.contains("BroadcastHashJoin") || l.contains("WholeStageCodegen")
        }.map(_.trim.replaceAll(java.util.regex.Pattern.quote(dir), "<layout>"))
          .toSeq.distinct
        sb.append("\n## ivfpq_coded (candidate stage) — ADC scan reads (vec_id, code) only inside probed partitions; the float column never decodes\n\n```\n")
        keep.foreach(l => sb.append(l).append('\n'))
        sb.append("```\n")
      }
    }
    // ivf_centroid_refresh's graded entry also detaches (scratch layout
    // deleted) — audit the read-side seam over a persisted layout: the
    // deterministic per-cell fold is the only exchange; codebook and
    // scalar total broadcast.
    locally {
      import org.apache.spark.sql.functions.col
      val emb = graft.Tables.load(spark, sf, "embeddings")
      val cents = graft.operators.IvfIndex.trainCentroids(
        graft.operators.IvfIndex.trainSample(emb), 16, 10)
      graft.Mat.withScratchDirs("plans_refresh") { case Seq(dir) =>
        graft.operators.IvfIndex.assign(emb, cents)
          .write.partitionBy("centroid").mode("overwrite").parquet(dir)
        val plan = graft.operators.IvfIndex
          .refreshFromLayout(spark.read.parquet(dir), cents)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        val keep = plan.linesIterator.filter { l =>
          l.contains("PartitionFilters") || l.contains("ReadSchema") ||
          l.contains("BroadcastHashJoin") || l.contains("BroadcastExchange") ||
          l.contains("ObjectHashAggregate") || l.contains("WholeStageCodegen") ||
          l.contains("BroadcastNestedLoopJoin")
        }.map(_.trim.replaceAll(java.util.regex.Pattern.quote(dir), "<layout>"))
          .toSeq.distinct
        sb.append("\n## ivf_centroid_refresh (read-side) — per-cell mean folds in ObjectHashAggregate after ONE centroid exchange; codebook and scalar total broadcast (the only nested-loop is the 1-row total cross)\n\n```\n")
        keep.foreach(l => sb.append(l).append('\n'))
        sb.append("```\n")
      }
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${Audited.size + 2} queries)")
    spark.stop()
  }
}
