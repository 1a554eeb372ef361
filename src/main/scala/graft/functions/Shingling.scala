package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling kernels for the dedup operators.
  *
  * The expression-level formulation (transform over sequence + slice +
  * concat_ws / substring) evaluates as an interpreted higher-order
  * lambda: per shingle it allocates a slice array and re-concatenates —
  * profiled as the single largest cost in dedup_minhash (shingle
  * derivation alone ≈ 2.8 s of the 4.5 s at sf0.1). These kernels do
  * one O(n) pass per document with a reused StringBuilder and emit the
  * IDENTICAL distinct first-occurrence shingle sets, so signatures and
  * oracles are unchanged. CodegenFallback is acceptable for the same
  * reason as Winnow: the per-row call overhead is negligible against
  * the O(n) scan inside, and the surrounding projection (normalization,
  * explode) stays codegen'd.
  */
object Shingling {

  /** Distinct word w-shingles of a whitespace-collapsed string, first-
    * occurrence order; texts with fewer than w words yield the whole
    * text as one shingle (same contract as the former HOF formulation).
    */
  def wordShingles(s: String, w: Int): Array[UTF8String] = {
    val words = s.split(" ", -1) // keep trailing empties like Spark split
    val out = new java.util.LinkedHashSet[String]()
    if (words.length >= w) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + w <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    } else {
      out.add(String.join(" ", words: _*))
    }
    toUtf8Array(out)
  }

  /** Distinct character n-grams (codepoint-counted, matching SQL
    * substring semantics), first-occurrence order; texts shorter than n
    * yield the whole text as one gram.
    */
  def charNgrams(s: String, n: Int): Array[UTF8String] = {
    val cps = s.codePoints().toArray
    val out = new java.util.LinkedHashSet[String]()
    if (cps.length >= n) {
      var i = 0
      while (i + n <= cps.length) {
        out.add(new String(cps, i, n))
        i += 1
      }
    } else {
      out.add(s)
    }
    toUtf8Array(out)
  }

  private def toUtf8Array(set: java.util.LinkedHashSet[String]): Array[UTF8String] = {
    val res = new Array[UTF8String](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { res(i) = UTF8String.fromString(it.next()); i += 1 }
    res
  }

  /** Column API over normalized text. */
  def wordShingles(normText: Column, w: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(normText), w))

  def charNgrams(normText: Column, n: Int): Column =
    GraftSqlBridge.column(CharNgrams(GraftSqlBridge.expression(normText), n))
}

case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"word_shingles expects a string, got ${child.dataType.catalogString}")

  // null in → null out (standard expression semantics): a null-text doc
  // contributes NO shingles, exactly as the SQL-oracle formulation
  // (string_split(NULL) unnests to zero rows) and the former
  // explode-based pipeline drop it — EdgeCaseSpec pins the contract
  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(Shingling.wordShingles(input.asInstanceOf[UTF8String].toString, w))

  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_ngrams expects a string, got ${child.dataType.catalogString}")

  // null in → null out — see WordShingles
  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(Shingling.charNgrams(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(newChild: Expression): CharNgrams = copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}
