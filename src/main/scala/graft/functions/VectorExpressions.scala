package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (cosine / LSH over
  * `ArrayType(FloatType|DoubleType)` embeddings).
  *
  * Why custom: the equivalent higher-order-function chain
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) allocates an intermediate array
  * per row and evaluates the lambda interpreted, per element. These
  * expressions keep the whole dot product inside whole-stage codegen as one
  * fused loop — the Tungsten-native analogue of the reference's
  * normalized-key trick of operating on primitive data without
  * deserialization.
  *
  * Semantics are IDENTICAL to the HOF form (and to DuckDB's list
  * arithmetic): each element is widened to double, products are
  * accumulated sequentially left-to-right — so swapping a HOF pipeline for
  * these expressions cannot change an oracle-checked result by even one
  * bit. Null elements are skipped (the HOF form would return NULL; the
  * test tables carry no null elements).
  */
private[graft] object VectorKernels {
  def getter(t: DataType): String = t.asInstanceOf[ArrayType].elementType match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  def read(a: ArrayData, t: DataType, i: Int): Double =
    t.asInstanceOf[ArrayType].elementType match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
}

/** dot(a, b) = Σ (double)a_i · (double)b_i, sequential. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two float/double arrays, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += VectorKernels.read(x, left.dataType, i) *
          VectorKernels.read(y, right.dataType, i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lg, rg) = (VectorKernels.getter(left.dataType), VectorKernels.getter(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.$lg($i)) * ((double) $b.$rg($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** norm_sq(a) = Σ ((double)a_i)², sequential. */
case class NormSq(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_norm_sq expects a float/double array, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm_sq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = VectorKernels.read(x, child.dataType, i)
        acc += v * v
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = VectorKernels.getter(child.dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = (double) $a.$g($i);
         |    $acc += $v * $v;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_norm_sq"),
      new ExpressionInfo(classOf[NormSq].getName, "graft_norm_sq"),
      (es: Seq[Expression]) => NormSq(es.head)),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSketchAgg].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSketchAgg(es.head).toAggregateExpression()),
    (FunctionIdentifier("graft_topk_freq"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_topk_freq"),
      (es: Seq[Expression]) => MisraGriesAgg(es.head).toAggregateExpression()),
    (FunctionIdentifier("graft_approx_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "graft_approx_distinct"),
      (es: Seq[Expression]) => KmvDistinctAgg(es.head).toAggregateExpression()),
    (FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "graft_count_min"),
      (es: Seq[Expression]) => CountMinAgg(es.head).toAggregateExpression()),
  )

  /** Session-local registration (idempotent) — lets any query use the
    * expressions through `expr("graft_dot(...)")` without requiring the
    * session to have been built with GraftExtensions. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, _, builder) =>
      reg.createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
  }
}
