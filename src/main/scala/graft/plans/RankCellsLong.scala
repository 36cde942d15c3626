package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** The IVF cell-ranking inner loop as ONE native expression — the
  * `Similarity.rankCells` computation: for a quantized query vector
  * (qv, nrm) against the broadcast packed centroid row
  * (array<struct<cid, cv, cnrm>>), every cell's exact quantized cosine
  * (dot/(nrm·cnrm), the [[DotProductLong]] integer dot; −∞ when either
  * norm is zero — the NULLS LAST stand-in) sorted by (ccos desc, cid asc)
  * as array<struct<ccos, cid>>.
  *
  * Why native (round 19): the Column form was
  * `array_sort(transform(cells, struct(pairCosine(...), cid)), cmp)` —
  * BOTH higher-order functions evaluate interpreted (per-cell boxed
  * struct, per-comparison lambda dispatch), and this expression runs per
  * CORPUS ROW on every cell-assignment pass (writeIvfPq, ivfTopK member
  * side) and per query on every probe — the profiler put the serve paths'
  * dominant frames inside the transform's `ArrayDataIndexedSeq` walk.
  * Here the whole rank is a primitive loop + one index sort inside
  * whole-stage codegen.
  *
  * Exactness: the dot is [[DotProductLong]]'s loop verbatim (length
  * mismatch throws identically); cosine is the same single double
  * division (denominator exactly 0.0 → −∞, matching
  * `coalesce(dot/nullif(nrm·cnrm, 0), -Inf)`); the sort comparator is
  * (ccos desc, cid asc) with no NaN/−0.0 exposure (dots are long-exact,
  * denominators nonnegative).
  */
case class RankCellsLong(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField("cid", LongType, _, _),
              StructField("cv", ArrayType(LongType, _), _, _),
              StructField("cnrm", DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, double, " +
          s"array<struct<cid:bigint, cv:array<bigint>, cnrm:double>>), got $other")
    }

  override def dataType: DataType = RankCellsLong.OutType
  override def nullable: Boolean = true
  override def prettyName: String = RankCellsLong.Name

  override def nullSafeEval(qv: Any, nrm: Any, cells: Any): Any =
    RankCellsLong.compute(qv.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], cells.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RankCellsLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (q, n, c) =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($q, $n, $c)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RankCellsLong {
  val Name = "graft_rank_cells"

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("ccos", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))),
    containsNull = false)

  /** The per-row kernel; public because generated code calls it. */
  def compute(qv: ArrayData, nrm: Double, cells: ArrayData): GenericArrayData = {
    val n = cells.numElements()
    val ccos = new Array[Double](n)
    val cids = new Array[Long](n)
    val dim = qv.numElements()
    var i = 0
    while (i < n) {
      val cell = cells.getStruct(i, 3)
      val cv = cell.getArray(1)
      if (cv.numElements() != dim)
        throw new IllegalArgumentException(
          s"graft_dot_long: array length mismatch ($dim vs ${cv.numElements()})")
      var acc = 0L
      var j = 0
      while (j < dim) { acc += qv.getLong(j) * cv.getLong(j); j += 1 }
      val denom = nrm * cell.getDouble(2)
      ccos(i) = if (denom == 0.0) Double.NegativeInfinity else acc.toDouble / denom
      cids(i) = cell.getLong(0)
      i += 1
    }
    val order = Array.tabulate(n)(Integer.valueOf)
    java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(ccos(b), ccos(a)) // desc
      if (c != 0) c else java.lang.Long.compare(cids(a), cids(b)) // cid asc
    })
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val k = order(i)
      out(i) = new GenericInternalRow(
        Array[Any](ccos(k), cids(k))): InternalRow
      i += 1
    }
    new GenericArrayData(out)
  }

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(query_vec, query_norm, packed_cells)", 3, children)
    RankCellsLong(children(0), children(1), children(2))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[RankCellsLong].getName, Name),
        fromChildren)
    }
  }

  /** Sorted (ccos, cid) cell ranking of a quantized vector. */
  def rankCells(qv: Column, nrm: Column, cells: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, qv, nrm, cells)
  }
}
