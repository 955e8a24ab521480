package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator as-of join as a first-class plan node — the rung of the
  * extension ladder beyond expressions (`CosineSim`) and rewrite rules
  * (`RewriteHofCosine`): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered through `GraftExtensions`.
  *
  * Semantics are EXACTLY `Temporal.asofJoin` (TemporalSpec pins parity,
  * including NULL keys/timestamps and the tie rule): for each left row,
  * the payload of the right row with the greatest (rightTs, tieBreak)
  * at-or-before (`inclusive`) / strictly-before the left timestamp, within
  * the same key; left-outer; NULL keys group together (window semantics,
  * not SQL-join semantics); NULL timestamps sort first (= before every
  * non-null time).
  *
  * Why a physical operator when the tag-union-window composition already
  * plans shuffle-once? The composition's one partition-sort runs over
  * left+right UNION'd rows and its window buffers/carries through the
  * whole frame machinery; the native exec asks for the two children
  * hash-clustered and sorted independently (two smaller sorts of the same
  * total volume, each with narrower rows — right rows carry only
  * key/ts/tie/payload) and then streams a single forward merge pass per
  * partition: O(1) state (the carried payload), no union row widening, no
  * window buffer, no post-filter over tags. Same exchange count, strictly
  * less sort width and no window machinery — and downstream operators see
  * `outputOrdering = (key, ts)` for free.
  *
  * Scale shape: identical to the composition — one hash exchange per side,
  * per-key rows bounded by the task external-sort budget (hot keys →
  * `Temporal.asofJoinBucketed`).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], leftTs: Attribute,
    rightKeys: Seq[Attribute], rightTs: Attribute,
    payload: Seq[Attribute], tieBreak: Attribute,
    payloadOut: Seq[Attribute], inclusive: Boolean)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "AsOfJoinNode: key lists must be non-empty and same-length")

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]. Injected by
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.leftTs, n.rightKeys, n.rightTs,
        n.payload, n.tieBreak, n.payloadOut, n.inclusive,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Merge-scan as-of join. Children are required hash-clustered on the key
  * and sorted (key, ts [, tieBreak]) — EnsureRequirements inserts the
  * exchanges/sorts, AQE coalesces both sides consistently — then each
  * co-partition pair is merged in ONE forward pass: advance the right
  * pointer while its (key, ts) is at-or-before the current left row,
  * remembering only the latest payload per key. No buffering beyond the
  * carried values; rights of skipped keys stream past.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], leftTs: Attribute,
    rightKeys: Seq[Attribute], rightTs: Attribute,
    payload: Seq[Attribute], tieBreak: Attribute,
    payloadOut: Seq[Attribute], inclusive: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** The right ordering is TOTAL over what the merge carries: after
    * (keys, ts), the full (tieBreak, payload…) struct — exactly the
    * composition's `__p` ascending. Sorting by tieBreak alone would
    * leave duplicate (key, ts, tieBreak) rows in shuffle order and the
    * carried payload nondeterministic; with the struct, the last row
    * advanced past is the greatest full payload, bit-for-bit the
    * window form's pick.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending),
        SortOrder(org.apache.spark.sql.catalyst.expressions.CreateStruct(
          (tieBreak +: payload).toList), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Deep-copy a value extracted from a (reused) UnsafeRow. */
  private def copyVal(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case b: Array[Byte] => b.clone()
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case r: InternalRow => r.copy()
    case x => x
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyOrds = leftKeys.map(k => lOut.indexWhere(_.exprId == k.exprId)).toArray
    val lTsOrd = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrds = rightKeys.map(k => rOut.indexWhere(_.exprId == k.exprId)).toArray
    val rTsOrd = rOut.indexWhere(_.exprId == rightTs.exprId)
    val pOrds = payload.map(p => rOut.indexWhere(_.exprId == p.exprId))
    require((lTsOrd :: rTsOrd :: (lKeyOrds ++ rKeyOrds ++ pOrds).toList)
      .forall(_ >= 0),
      "AsOfJoinExec: key/ts/payload attribute missing from child output")
    val keyTypes = leftKeys.map(_.dataType).toArray
    val nKeys = keyTypes.length
    val tsType = leftTs.dataType
    val pTypes = payload.map(_.dataType)
    val nPay = payload.size
    val outAttrs = output
    val inAttrs = lOut ++ payloadOut

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrderings = keyTypes.map(TypeUtils.getInterpretedOrdering)
      val tsOrdering = TypeUtils.getInterpretedOrdering(tsType)
      // nulls-first total order, matching SortOrder(asc) and the window
      // composition's ordering: null < any non-null, null == null.
      def cmp1(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
      // lexicographic over the key columns
      def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < nKeys) {
          val c = cmp1(keyOrderings(i), a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
      def readKeys(row: InternalRow, ords: Array[Int],
                   copied: Boolean): Array[Any] = {
        val arr = new Array[Any](nKeys)
        var i = 0
        while (i < nKeys) {
          arr(i) = if (row.isNullAt(ords(i))) null
            else {
              val v = row.get(ords(i), keyTypes(i))
              if (copied) copyVal(v) else v
            }
          i += 1
        }
        arr
      }

      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(nPay)

      // Current right head, eagerly extracted + copied (rows are reused).
      var rKey: Array[Any] = null
      var rTs: Any = null
      var rPay: Array[Any] = null
      var rLive = false
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rKey = readKeys(r, rKeyOrds, copied = true)
          rTs = if (r.isNullAt(rTsOrd)) null else copyVal(r.get(rTsOrd, tsType))
          val arr = new Array[Any](nPay)
          var i = 0
          while (i < nPay) {
            arr(i) = if (r.isNullAt(pOrds(i))) null
              else copyVal(r.get(pOrds(i), pTypes(i)))
            i += 1
          }
          rPay = arr
          rLive = true
        } else rLive = false
      advanceRight()

      new Iterator[InternalRow] {
        private var curKey: Array[Any] = null
        private var carried: InternalRow = nullPayload

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = readKeys(l, lKeyOrds, copied = false)
          if (curKey == null || cmpKeys(lk, curKey) != 0) {
            // new key group: drop the carry, stream rights of smaller keys past
            carried = nullPayload
            while (rLive && cmpKeys(rKey, lk) < 0) advanceRight()
            curKey = lk.map(copyVal)
          }
          val lt = if (l.isNullAt(lTsOrd)) null else l.get(lTsOrd, tsType)
          while (rLive && cmpKeys(rKey, lk) == 0 && {
              val c = cmp1(tsOrdering, rTs, lt)
              c < 0 || (inclusive && c == 0)
            }) {
            // rights arrive (ts, tieBreak)-ascending: the last one advanced
            // past is the greatest at-or-before — the as-of pick; `carried`
            // persists across left rows of the same key (the forward fill)
            carried = new GenericInternalRow(rPay)
            advanceRight()
          }
          numOutputRows += 1
          proj(joined(l, carried))
        }
      }
    }
  }
}

/** Builder: resolves column names against the analyzed children and hands
  * the custom node to the analyzer. Self-join inputs (both sides derived
  * from the same source) are disambiguated by re-aliasing the right side —
  * the analyzer's DeduplicateRelations does this for built-in joins; a
  * custom node does it for itself.
  */
object AsOfJoinPlan {
  def dataFrame(
      left: DataFrame, leftKeys: Seq[String], leftTs: String,
      right: DataFrame, rightKeys: Seq[String], rightTs: String,
      payload: Seq[String], tieBreak: String,
      inclusive: Boolean, outPrefix: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val lp = left.queryExecution.analyzed
    val rightDeduped =
      if (right.queryExecution.analyzed.outputSet.intersect(lp.outputSet).nonEmpty)
        right.select(right.columns.map(c => col(c).as(c)): _*)
      else right
    val rp = rightDeduped.queryExecution.analyzed

    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoinNative: no column '$n' on the $side side " +
          s"(has: ${p.output.map(_.name).mkString(", ")})"))

    val lKeys = leftKeys.map(attr(lp, _, "left"))
    val rKeys = rightKeys.map(attr(rp, _, "right"))
    val lT = attr(lp, leftTs, "left")
    val rT = attr(rp, rightTs, "right")
    // the exec builds orderings and hash-partitions from LEFT-side types;
    // a type mismatch would mis-co-partition (Int 5 and Long 5 hash
    // differently) or ClassCastException in the merge — fail analysis-time
    lKeys.zip(rKeys).zipWithIndex.foreach { case ((l, r), i) =>
      require(l.dataType == r.dataType,
        s"asofJoinNative: key $i type mismatch - left ${l.name}: " +
          s"${l.dataType.simpleString} vs right ${r.name}: " +
          s"${r.dataType.simpleString}; cast the inputs to a common type")
    }
    require(lT.dataType == rT.dataType,
      s"asofJoinNative: timestamp type mismatch - ${lT.name}: " +
        s"${lT.dataType.simpleString} vs ${rT.name}: " +
        s"${rT.dataType.simpleString}; cast the inputs to a common type")
    val pAttrs = payload.map(attr(rp, _, "right"))
    val collisions = payload.map(outPrefix + _).toSet
      .intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"asofJoinNative: output payload name(s) ${collisions.mkString(", ")} " +
        "collide with left columns - pass outPrefix (same contract as asofJoin)")
    val payloadOut = pAttrs.map(p =>
      AttributeReference(outPrefix + p.name, p.dataType, nullable = true)())
    val node = AsOfJoinNode(lp, rp, lKeys, lT, rKeys, rT,
      pAttrs, attr(rp, tieBreak, "right"), payloadOut, inclusive)
    GraftSqlShim.ofRows(left.sparkSession, node)
  }
}
