package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MinHash hash family, engine-portable: a polynomial base hash of
  * the shingle mod 2⁶¹−1 (same Mersenne arithmetic as Winnow) followed
  * by 64 affine derivations h_s = (A_s·h1 + B_s) mod P — the classic
  * universal-family construction. The A_s/B_s constants are driver-side
  * literals, so an ANSI SQL engine with 128-bit integers reproduces
  * every signature value exactly (list_reduce fold for h1, HUGEINT
  * multiply-mod for the seeds) — what makes dedup_minhash
  * oracle-checkable end to end.
  *
  * One interpreted call per shingle row computes the whole 64-value
  * array (~70 mulmods over longs — trivial next to the string scan);
  * the surrounding projection and the 64 min-aggregates stay codegen'd.
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

  def seedHashes(s: String): Array[Long] = {
    val h1 = polyHash(s)
    Array.tabulate(Seeds)(i => Winnow.addmod(Winnow.mulmod(multipliers(i), h1), offsets(i)))
  }

  /** Column API. */
  def seedHashes(shingle: Column): Column =
    GraftSqlBridge.column(MinhashSeedHashes(GraftSqlBridge.expression(shingle)))
}

case class MinhashSeedHashes(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_seed_hashes expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(MinhashHash.seedHashes(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): MinhashSeedHashes =
    copy(child = newChild)

  override def prettyName: String = "minhash_seed_hashes"
}
