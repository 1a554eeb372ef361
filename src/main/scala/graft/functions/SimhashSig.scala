package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Map-side SimHash: a document's 64-bit signature is a pure function
  * of its own word multiset, so it needs no explode-and-revote shuffle —
  * one pass over the words array accumulates the 64 ±1 bit votes and
  * folds the sign bits into one long.
  *
  * Bit derivation is IDENTICAL to the expression formulation the
  * DuckDB oracle mirrors: the word's md5 hex digest split into two
  * 32-bit limbs (chars 1-8 → high, 9-16 → low; bits 0-31 from the low
  * limb, 32-63 from the high), votes +1 for a set bit, −1 otherwise,
  * signature bit j set iff the vote sum is positive. JVM
  * MessageDigest MD5 over UTF-8 bytes produces the same digest as
  * Spark's and DuckDB's md5().
  */
object SimhashSig {

  /** Null words are skipped; a signature over zero words is undefined
    * and the expression returns NULL for it.
    */
  def signature(words: Array[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      if (words(i) != null) {
        md.reset()
        val d = md.digest(words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // hex chars 1-8 = bytes 0-3 (high limb), chars 9-16 = bytes 4-7
        val hTop = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val hLo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < 64) {
          val bit =
            if (j < 32) (hLo >>> j) & 1L
            else (hTop >>> (j - 32)) & 1L
          votes(j) += (if (bit == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column API over the words array. */
  def signature(words: Column): Column =
    GraftSqlBridge.column(SimhashSignature(GraftSqlBridge.expression(words)))
}

case class SimhashSignature(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"simhash_signature expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val strs = new Array[String](arr.numElements())
    var i = 0
    var nonNull = 0
    while (i < strs.length) {
      if (!arr.isNullAt(i)) { strs(i) = arr.getUTF8String(i).toString; nonNull += 1 }
      i += 1
    }
    if (nonNull == 0) null
    else SimhashSig.signature(strs)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)

  override def prettyName: String = "simhash_signature"
}
