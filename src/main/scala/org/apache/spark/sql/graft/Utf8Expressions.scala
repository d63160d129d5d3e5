package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, IntegerType}

/** The one strict-UTF-8 validity table (RFC 3629), shared by the
  * interpreted and codegen paths of [[Utf8InvalidCountExpr]] so they
  * cannot drift. Kept as a plain static-forwarded object method: the
  * generated Java calls it directly, which stays inside whole-stage
  * codegen and lets the JIT inline the scan. */
object Utf8Data {

  /** Count of bytes that are NOT part of any valid UTF-8 sequence, under
    * the strict table: C0/C1/F5-FF leads, overlong encodings, surrogate
    * code points (ED A0-BF ..), values above U+10FFFF (F4 90-..), a
    * truncated multibyte at EOF, and orphan continuation bytes are all
    * invalid — each such byte counts once (the scanner resynchronizes on
    * the NEXT byte, so a run of k stray lead bytes counts k). A clean
    * UTF-8 buffer counts 0. */
  def invalidBytes(b: Array[Byte]): Int = {
    var i = 0
    var bad = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        var len = 0
        var lo = 0x80
        var hi = 0xbf
        if (c >= 0xc2 && c <= 0xdf) len = 2
        else if (c == 0xe0) { len = 3; lo = 0xa0 }
        else if (c >= 0xe1 && c <= 0xec) len = 3
        else if (c == 0xed) { len = 3; hi = 0x9f }
        else if (c == 0xee || c == 0xef) len = 3
        else if (c == 0xf0) { len = 4; lo = 0x90 }
        else if (c >= 0xf1 && c <= 0xf3) len = 4
        else if (c == 0xf4) { len = 4; hi = 0x8f }
        if (len == 0) { bad += 1; i += 1 } // C0/C1/F5-FF or orphan 80-BF
        else if (i + len > n) { bad += 1; i += 1 } // truncated at EOF
        else {
          var ok = true
          var j = 1
          while (ok && j < len) {
            val cc = b(i + j) & 0xff
            val l = if (j == 1) lo else 0x80
            val h = if (j == 1) hi else 0xbf
            if (cc < l || cc > h) ok = false
            j += 1
          }
          if (ok) i += len
          else { bad += 1; i += 1 }
        }
      }
    }
    bad
  }
}

/** Native codegen'd count of invalid UTF-8 bytes in a binary column — the
  * crawl-ingest validity probe (a WARC payload that fails this is
  * damaged/mislabeled and must be repaired or dropped BEFORE it becomes a
  * Spark string, where the malformed bytes are already replacement
  * chars). Same namespace technique as [[DotProductExpr]]
  * (`AbstractDataType` is `private[sql]`). */
case class Utf8InvalidCountExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_utf8_invalid"

  override def nullSafeEval(a: Any): Any =
    Utf8Data.invalidBytes(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Utf8Data.invalidBytes($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Utf8InvalidCountExpr =
    copy(child = newChild)
}

object Utf8Functions {
  /** Codegen'd strict invalid-UTF-8 byte count of a binary column. */
  def utf8InvalidBytesF(bin: Column): Column =
    ColumnBridge.column(Utf8InvalidCountExpr(ColumnBridge.expression(bin)))
}
