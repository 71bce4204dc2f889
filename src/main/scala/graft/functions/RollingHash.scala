package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Rabin–Karp family):
  * `h = fold(codepoints)(h, c => (h * B + c) mod M)` with B=31,
  * M=1e9+7 — the narrow (8-byte) content fingerprint for dedup keys and
  * shard routing. Codegen'd via a static helper call; iterating Unicode
  * codepoints (not UTF-16 units or bytes) makes the definition
  * engine-portable — any system that can enumerate codepoints reproduces
  * it exactly (the DuckDB oracle does, via `unicode(substr(...))` +
  * `list_reduce`).
  *
  * vs md5 (d2_fingerprint): not cryptographic, but streamable and
  * windowable — the same recurrence extends to rolling n-gram
  * fingerprints where a fixed-size window slides in O(1) per step.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 31L
  final val Mod = 1000000007L

  /** Static entry point shared by the interpreted and generated paths. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
