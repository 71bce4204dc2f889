package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Text corpora mix precomposed codepoints (é = U+00E9) with
  * combining-mark sequences (e + U+0301) that render identically but
  * compare unequal — so exact dedup (d1/d2), shingling (d6), and every
  * string group-by silently treat equal-looking documents as distinct.
  * Canonical composition (NFC) is the standard first step of an LLM text
  * pipeline; Spark has no built-in for it, which is exactly the custom-
  * `Expression` case (SURVEY.md §7.3 preference order): a UnaryExpression
  * over a static `java.text.Normalizer` call stays inside whole-stage
  * codegen — no UDF boxing, no Python boundary.
  *
  * The JDK normalizer implements the Unicode standard's canonical
  * composition, which is engine-portable: DuckDB's `nfc_normalize`
  * produces byte-identical output (the oracle for d17 proves it).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by the interpreted and generated paths.
    * Fast path: `isNormalized` scans without allocating — already-NFC
    * text (the overwhelming majority of real corpora) costs one pass
    * and returns the input UTF8String unchanged. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
