package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string expressions for text canonicalization —
  * the same §2.11 promotion path as the vector fold expressions:
  * Spark has no built-in Unicode-normalization function, and the
  * alternative (a Scala UDF calling `java.text.Normalizer`) would
  * break whole-stage codegen for the entire cleaning projection.
  * This expression stays inside codegen: the generated code is one
  * static JDK call per row, no closure, no serialization.
  *
  * Oracle contract: `java.text.Normalizer` (Form.NFC) and DuckDB's
  * `nfc_normalize` both implement Unicode Standard Annex #15
  * canonical composition — bit-identical output for any input both
  * Unicode versions cover (the engine's fixtures stay on stable
  * codepoints, composed since Unicode 1.1). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
