package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The MinHash hash family, engine-portable: a polynomial base hash of
  * the shingle mod 2⁶¹−1 (same Mersenne arithmetic as Winnow) followed
  * by 64 affine derivations h_s = (A_s·h1 + B_s) mod P — the classic
  * universal-family construction. The A_s/B_s constants are driver-side
  * literals, so an ANSI SQL engine with 128-bit integers reproduces
  * every signature value exactly (list_reduce fold for h1, HUGEINT
  * multiply-mod for the seeds) — what makes dedup_minhash
  * oracle-checkable end to end.
  *
  * One interpreted call per DOCUMENT computes the whole 64-value
  * signature (one polynomial scan + 64 mulmods per shingle); the
  * surrounding projection (normalization, shingling, element
  * extraction) stays codegen'd.
  */
object MinhashHash {
  val Seeds = 64

  /** Affine constants from one splitmix64 stream, reduced below P;
    * multipliers forced nonzero (a zero multiplier would collapse a
    * seed to a constant).
    */
  val (multipliers: Array[Long], offsets: Array[Long]) = {
    var state = 0x51ab2e4c9d274f1bL
    def next(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val mult = Array.fill(Seeds)(math.max((next() >>> 3) % Winnow.P, 1L))
    val off = Array.fill(Seeds)((next() >>> 3) % Winnow.P)
    (mult, off)
  }

  /** Polynomial hash of the codepoints mod P (empty string → 0). */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = Winnow.addmod(Winnow.mulmod(h, Winnow.Base), cp)
      i += Character.charCount(cp)
    }
    h
  }

  /** Whole-signature kernel: the 64 per-seed MINIMA over a document's
    * shingle set, in one pass over the array — the signature of a doc
    * is a pure function of its own row, so signatures need NO
    * explode-and-reaggregate shuffle at all (map-side projection).
    * Null elements are skipped; a signature over zero shingles is
    * undefined and the expression returns NULL for it (a sentinel
    * value would make every empty input collide in every LSH band).
    */
  def signature(shingles: Array[String]): Array[Long] = {
    val mins = Array.fill(Seeds)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      if (shingles(i) != null) {
        val h1 = polyHash(shingles(i))
        var s = 0
        while (s < Seeds) {
          val h = Winnow.addmod(Winnow.mulmod(multipliers(s), h1), offsets(s))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Column API. */
  def signature(shingles: Column): Column =
    GraftSqlBridge.column(MinhashSignature(GraftSqlBridge.expression(shingles)))
}

case class MinhashSignature(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<string>, got ${other.catalogString}")
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
    else ArrayData.toArrayData(MinhashHash.signature(strs))
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

