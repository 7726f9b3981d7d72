package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension (SURVEY §2 option (c): custom
  * `LogicalPlan` + `Strategy` + `SparkPlan`): a SORT-MERGE AS-OF JOIN.
  *
  * Why the composed form isn't enough at 100 TB: `AsOfJoin.asOf` builds
  * `join(key, time <= t)` then keeps rank 1 — the intermediate join
  * materializes EVERY (left row × its full right history) pair before the
  * window prunes, so a left row over a key with h historical right rows
  * costs O(h) join output. This operator never materializes that blowup:
  * both sides arrive hash-clustered on the key and sorted by (key, time)
  * — declared via `requiredChildDistribution` / `requiredChildOrdering`,
  * so Catalyst's EnsureRequirements inserts exactly the exchanges and
  * sorts a sort-merge equi-join would get — and a single forward merge
  * emits at most ONE row per left row while holding ONE buffered
  * candidate row of state. Cost: O(n + m) per partition after sort,
  * zero extra memory, no window, no rank.
  *
  * Semantics: for each left row, the LAST right row (by the sort order
  * (time, tieBreak...) ascending) of the same key with rightTime <=
  * leftTime — i.e. the latest-at-or-before match, ties broken by the
  * GREATEST tieBreak (identical to the rank-1-descending convention of
  * the composed operator; equivalence is law-tested in AsOfJoinSpec on
  * random data). Inner semantics: left rows with no match drop. Null
  * keys/times never match (join-key convention).
  */
case class AsOfMergeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    tieBreak: Seq[Attribute],
    outer: Boolean)
  extends BinaryNode {
  // Left-outer mode null-extends the right side, so its attributes are
  // nullable in the output schema (the standard outer-join adjustment).
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical candidate, no alternatives. */
object AsOfMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfMergeJoinNode(l, r, lk, rk, lt, rt, tb, outer) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tieBreak: Seq[Expression],
    outer: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Hash-cluster both sides on the key — the same contract a sort-merge
  // equi-join declares, so AQE/EnsureRequirements handle the exchanges.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // Sorted merge order; the right side's (time, tieBreak) ascending makes
  // "last candidate <= t" the rank-1-descending pick.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      tieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey  = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey  = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd  = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outputAttrs = output

    val isOuter     = outer
    val rightSchema = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner  = new JoinedRow
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      val rBuf    = rIter.buffered
      val nullRight =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightSchema.length)

      // One row of merge state: the best (= last-seen in sort order)
      // right candidate for the key currently being merged.
      var candidate: UnsafeRow = null
      var candidateKey: Any    = null

      lIter.flatMap { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) {
          // Null join attributes never match; outer keeps the left row.
          if (isOuter) Iterator.single(project(joiner(lRow, nullRight)))
          else Iterator.empty
        } else {
          // A new left key invalidates the previous key's candidate.
          if (candidateKey != null && keyOrd.compare(candidateKey, k) != 0) {
            candidate = null; candidateKey = null
          }
          // Advance the right side: consume rows with a smaller key
          // outright; rows of THIS key with time <= t become the (ever
          // improving, because sorted ascending) candidate; stop at the
          // first row beyond (k, t).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val rk   = rKey.eval(rRow)
            val rt   = rTime.eval(rRow)
            if (rk == null || rt == null) { rBuf.next() } // never matches
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0) { rBuf.next() }
              else if (c == 0 && timeOrd.compare(rt, t) <= 0) {
                candidate = rRow.asInstanceOf[UnsafeRow].copy()
                candidateKey = rk
                rBuf.next()
              } else advancing = false
            }
          }
          if (candidate != null && keyOrd.compare(candidateKey, k) == 0)
            Iterator.single(project(joiner(lRow, candidate)))
          else if (isOuter) Iterator.single(project(joiner(lRow, nullRight)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfMergeJoin {

  /** Idempotently append the planner strategy to the session. */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfMergeJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfMergeJoinStrategy
  }

  /** The public operator: latest right row at-or-before each left row's
    * time, per key — `merge_asof` semantics as a first-class plan node.
    * Columns are referenced by NAME against each side's analyzed output
    * (the node is born resolved; the analyzer passes it through). */
  def asOfMerge(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil,
      // pandas merge_asof's default: keep unmatched left rows with a
      // null-extended right side. false = inner (drop them).
      outer: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$n': ${p.output.map(_.name)}"))
    val lk = attr(lp, leftKey, "left")
    val rk = attr(rp, rightKey, "right")
    val lt = attr(lp, leftTime, "left")
    val rt = attr(rp, rightTime, "right")
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType} vs ${rk.dataType} — cast before joining")
    require(lt.dataType == rt.dataType,
      s"time types differ: ${lt.dataType} vs ${rt.dataType} — cast before joining")
    GraftBridge.ofRows(spark,
      AsOfMergeJoinNode(lp, rp, lk, rk, lt, rt, tieBreak.map(attr(rp, _, "right")), outer))
  }
}
