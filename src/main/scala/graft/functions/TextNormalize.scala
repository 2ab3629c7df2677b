package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind `graft_nfc` — kept as a plain static call so the
  * generated code is a single JVM invoke (same shape Spark's own
  * StaticInvoke-backed string functions compile to). NFC short-circuits
  * on already-normalized input (`isNormalized` is a cheap quick-check
  * scan that never allocates for ASCII), so the common 100 TB case —
  * ASCII or already-NFC text — costs one pass and zero copies. */
object TextNorm {
  import java.text.Normalizer
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC canonicalization as a codegen'd Catalyst expression —
  * composed decode of combining sequences (é as e+◌́ → é), the
  * normalization every dedup canonical key needs before hashing, since
  * NFC-distinct-but-equal strings would otherwise never collide. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects a string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any =
    TextNorm.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextNorm.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
