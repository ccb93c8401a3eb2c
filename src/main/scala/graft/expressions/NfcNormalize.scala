package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step a text-curation pipeline runs before hashing:
  * decomposed "e" + U+0301 and precomposed U+00E9 are the same text to a
  * reader but different bytes to md5, so without NFC the exact-dedup
  * hash (graft-native extension; cf. the reference's text handling in
  * /root/reference/src/core/news_utils.py:40-79, which compares
  * lowercased raw strings) silently splits duplicate groups on an
  * invisible encoding artifact. Spark has no builtin; a Scala UDF would
  * break whole-stage codegen, so this is the native-Expression form
  * (SURVEY.md §7.3 upgrade path). java.text.Normalizer and DuckDB's
  * nfc_normalize both implement UAX #15 — the oracle checks them
  * against each other.
  *
  * Fast path: a pure-ASCII string (UTF-8 bytes == chars) is already
  * NFC and returns as-is with zero allocation; non-ASCII strings that
  * are already composed pay only the isNormalized scan. At 100 TB the
  * common (ASCII/pre-composed) case is one branch per row inside
  * whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalizeKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeKernel {
  /** Static forwarder target for generated code. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // all 1-byte chars => ASCII => NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  /** Column-API entry point — resolves through the function registry, so
    * the session must be built with [[graft.GraftExtensions]].
    */
  def apply(c: Column): Column = call_function("nfc_normalize", c)
}
