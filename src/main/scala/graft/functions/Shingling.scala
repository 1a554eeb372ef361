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

  def repetitionStats(normText: Column): Column =
    GraftSqlBridge.column(RepetitionStats(GraftSqlBridge.expression(normText)))

  def charEntropyStats(normText: Column): Column =
    GraftSqlBridge.column(CharEntropyStats(GraftSqlBridge.expression(normText)))
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

/** One-pass within-document repetition statistics over normalized
  * text: word and word-bigram occurrence/distinct counts plus the
  * modal bigram count, in a single scan with a reused counting map —
  * the kernel behind TextAnalysis.repetitionSignals. Per-document
  * statistics need NO shuffle: the explode→(doc, gram)-groupBy
  * formulation this replaces shuffled one row per gram occurrence and
  * ran an interpreted lambda per word (profiled 7.3 s at sf0.1; the
  * kernel runs at scan speed). Counts are exact integers, so the
  * SQL-oracle formulation (UNNEST + two-level GROUP BY) reproduces
  * every output bit-for-bit.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = RepetitionStats.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects a string, got ${child.dataType.catalogString}"
      )

  // null in → null out — see WordShingles
  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val wc = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < words.length) {
      wc.merge(words(i), 1, (a, b) => a + b)
      i += 1
    }
    var maxBigram = 0L
    var distinctBigrams = 0L
    val nBigrams: Long = math.max(words.length - 1, 0).toLong
    if (words.length >= 2) {
      val bc = new java.util.HashMap[String, Int]()
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j + 1 < words.length) {
        sb.setLength(0)
        sb.append(words(j)).append(' ').append(words(j + 1))
        val c = bc.merge(sb.toString, 1, (a, b) => a + b)
        if (c > maxBigram) maxBigram = c.toLong
        j += 1
      }
      distinctBigrams = bc.size.toLong
    }
    org.apache.spark.sql.catalyst.InternalRow(
      words.length.toLong,
      wc.size.toLong,
      nBigrams,
      distinctBigrams,
      maxBigram
    )
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(
    Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_distinct_words", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("n_distinct_bigrams", LongType, nullable = false),
      StructField("max_bigram", LongType, nullable = false)
    )
  )
}

/** One-pass char-entropy moments: codepoint histogram → (distinct
  * count, Σ m·round(ln m, 9) as EXACT 1e-9-scaled nanos). Replaces the
  * interpreted decimal fold over a sorted per-codepoint array
  * (transform+substring materialization, BigDecimal lambda per char —
  * profiled at ~4.7 s calibration-adjusted for text_entropy at sf0.1,
  * the 3rd-costliest query for a map-side signal).
  *
  * Exactness contract (what keeps the DuckDB oracle unchanged): the
  * fold's per-group term CAST(m * ROUND(LN(m), 9) AS DECIMAL(27,10))
  * equals the exact rational m·r (r the 9-decimal rounding of ln m):
  * the double product sits within m·2⁻⁵² ≪ 5·10⁻¹¹ of the 1e-9-grid
  * point m·r, so the cast's HALF_UP at 10 decimals recovers m·r
  * exactly. The kernel keeps m·r as a scaled long (max Σ ≈ n·ln n·10⁹
  * ≈ 3.5·10¹² for the longest document — far under 2⁵³), and
  * long→double→/1e9 downstream re-rounds the same rational the
  * decimal cast did. ROUND(,9) is reproduced bit-for-bit via the same
  * toString-based BigDecimal HALF_UP both engines apply.
  */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = CharEntropyStats.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"char_entropy_stats expects a string, got ${child.dataType.catalogString}"
      )

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Int]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    // round(ln m, 9) as exact nanos; counts repeat heavily, so memoize
    val lnNanos = new java.util.HashMap[Integer, java.lang.Long]()
    var u = 0L
    var sNanos = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val m = it.next()
      u += 1L
      val nanos = lnNanos.computeIfAbsent(
        m,
        mm =>
          java.lang.Long.valueOf(
            java.math.BigDecimal
              .valueOf(Math.log(mm.doubleValue()))
              .setScale(9, java.math.RoundingMode.HALF_UP)
              .movePointRight(9)
              .longValueExact()
          )
      )
      sNanos += m.toLong * nanos.longValue()
    }
    org.apache.spark.sql.catalyst.InternalRow(u, sNanos)
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)

  override def prettyName: String = "char_entropy_stats"
}

object CharEntropyStats {
  val Schema: StructType = StructType(
    Seq(
      StructField("n_uniq_chars", LongType, nullable = false),
      StructField("s_nanos", LongType, nullable = false)
    )
  )
}
