package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE pass over the raw bytes:
  * char count, token count, distinct-token count, BPE-ish subword estimate
  * (ceil(chars/4) per token), stopword hits, and punctuation-char count.
  *
  * Value-identical to the composable form it replaces
  * (`split(text, ' ')` + `size` + `size(array_distinct(ws))` +
  * `aggregate(ws, 0L, (acc, w) -> acc + CAST(ceil(length(w)/4.0) AS BIGINT))` +
  * `size(filter(ws, w -> w IN (stopwords)))` +
  * `length(regexp_replace(text, '[^.,;:!?]', ''))`):
  *  - tokenisation splits on every single 0x20 byte keeping empty segments
  *    (Java `Pattern.split(limit = -1)` semantics, which is what Spark's
  *    `split` produces for the literal-space pattern; 0x20 never occurs
  *    inside a multi-byte UTF-8 sequence, so byte-splitting is exact);
  *  - per-token "length" is the code-point count, like `length()`;
  *  - `(len + 3) / 4` in integers equals `CAST(ceil(len / 4.0) AS BIGINT)`
  *    for every non-negative int;
  *  - the punctuation classes are all ASCII, so counting matching bytes
  *    equals counting matching characters.
  *
  * Why native (same rationale as [[WordNGramHashes]]): the HOF chain pays
  * an interpreted lambda per (token, metric) plus an array_distinct
  * allocation per row — ~6.5 s for the stats projection at sf0.1 vs scan
  * speed fused. CodegenFallback: one interpreted call per row into a tight
  * byte loop costs far less than the chain it replaces.
  *
  * The struct is produced by one Project and consumed by field extraction
  * in a separate Project; Catalyst's CollapseProject keeps non-cheap
  * multi-referenced producers un-inlined, so the pass runs once per row.
  */
case class TextMetrics(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_text_metrics"

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("n_subword_tokens", LongType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.catalogString}")
    }

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private def isPunct(b: Byte): Boolean = b match {
    case '.' | ',' | ';' | ':' | '!' | '?' => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nBytes = bytes.length

    var nPunct = 0
    var i = 0
    while (i < nBytes) {
      if (isPunct(bytes(i))) nPunct += 1
      i += 1
    }

    val uniq = new java.util.HashSet[UTF8String]()
    var nTokens = 0
    var nStop = 0
    var nSubword = 0L
    var start = 0
    i = 0
    // one extra iteration at i == nBytes flushes the final token
    while (i <= nBytes) {
      if (i == nBytes || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        nTokens += 1
        nSubword += (tok.numChars() + 3) / 4
        if (stopSet.contains(tok)) nStop += 1
        uniq.add(tok)
        start = i + 1
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](
      s.numChars(), nTokens, uniq.size(), nSubword, nStop, nPunct))
  }

  override protected def withNewChildInternal(newChild: Expression): TextMetrics =
    copy(child = newChild)
}

object TextMetrics {
  /** The canonical corpus-filter stopword list — the one place both the
    * operators ([[graft.operators.TextAnalysis]]) and the SQL registration
    * read it from, so the `graft_text_metrics` SQL function and the
    * DataFrame API can't disagree. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "in", "to", "and", "is")
}
