package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}

import org.apache.spark.unsafe.types.UTF8String

/** 31-base polynomial rolling hash over the whitespace tokens of a string,
  * mod 1e9+7, fused into one byte pass: acc starts at 7 and each token
  * contributes `len(tok) * 131 + ascii(first char of tok)`.
  *
  * Value-identical to the composable form it replaces
  * (`aggregate(split(norm, ' '), 7L, (acc, w) ->
  *   (acc * 31 + length(w) * 131 + ascii(substring(w, 1, 1))) % 1000000007L)`):
  *  - byte-splitting on 0x20 with kept empty segments matches Spark's
  *    `split` (see [[TextMetrics]]);
  *  - token length is the code-point count, like `length()`;
  *  - the first-character value reproduces Spark's `ascii` exactly: the
  *    full code point of the first character (probed: ascii('😀') =
  *    128512 in Spark 4, i.e. codePointAt, not the UTF-16 charAt
  *    surrogate), 0 for an empty token;
  *  - `acc` stays in [0, 1e9+7) and each step peaks below 2³⁵, so the
  *    Java `%` here and Spark's long `%` agree (no negative operands).
  *
  * Why native: the interpreted per-token `aggregate` lambda made the
  * fingerprint projection ~7 s at sf0.1; this loop runs at scan speed.
  */
case class TokenRollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_rolling_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }

  private val Mod = 1000000007L

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    val nBytes = bytes.length
    var acc = 7L
    var start = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        // first code point without the substring+String round-trip
        // (round 15): an ASCII first byte IS the code point — the
        // overwhelmingly common case on this hot scan-speed loop; only
        // a multi-byte lead falls back to the allocating decode
        val first =
          if (i - start == 0) 0
          else {
            val b0 = bytes(start) & 0xff
            if (b0 < 0x80) b0
            else tok.substring(0, 1).toString.codePointAt(0)
          }
        acc = (acc * 31 + tok.numChars().toLong * 131 + first) % Mod
        start = i + 1
      }
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRollingHash =
    copy(child = newChild)
}
