package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints as a native Catalyst expression.
  *
  * The expression-level formulation (transform over substrings +
  * window minima) evaluates interpreted and rehashes every k-gram from
  * scratch — O(n·k) with per-element lambda overhead, the top cost in
  * the round-1 bench. This kernel is the real algorithm: a Rabin-Karp
  * polynomial rolling hash (O(1) per position after the first gram,
  * arithmetic mod 2^64 via natural Long overflow) and a monotonic-deque
  * sliding-window minimum — O(n) total per document. CodegenFallback is
  * acceptable here: the per-row call overhead is negligible against the
  * O(n) scan inside, and the surrounding projection stays codegen'd.
  *
  * Winnowing guarantee: any substring match of length >= k + win - 1
  * between two documents yields at least one shared fingerprint.
  */
case class Winnow(child: Expression, k: Int, win: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"winnow expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(Winnow.fingerprints(input.asInstanceOf[UTF8String].toString, k, win))

  override protected def withNewChildInternal(newChild: Expression): Winnow = copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {
  /** Rabin-Karp polynomial base (any value < P with spread bits). */
  private[graft] val Base = 0x100000001b3L

  /** Modulus 2^61-1 (Mersenne prime). Hash arithmetic is mod P rather
    * than the usual wrap-around mod 2^64 so the fingerprints are
    * EXACTLY reproducible in ANSI SQL engines with 128-bit integers
    * (DuckDB HUGEINT) — what makes text_fingerprint oracle-checkable
    * end to end. The Mersenne form keeps the JVM side branch-light:
    * a 128-bit product folds with two shifts and an add.
    */
  private[graft] val P = (1L << 61) - 1

  /** (a * b) mod P via Math.multiplyHigh: x = hi·2^64 + lo and
    * 2^61 ≡ 1 (mod P), so x ≡ (lo & P) + (lo >>> 61 | hi << 3).
    * Requires a, b < P (hi < 2^58, so the shifted chunks are disjoint).
    */
  private[graft] def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var s = (lo & P) + ((lo >>> 61) | (hi << 3))
    while (s >= P) s -= P
    s
  }

  private[graft] def addmod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= P) s - P else s
  }

  /** Distinct winnowing fingerprints of s: min rolling-hash of every
    * window of `win` consecutive k-gram hashes, first-occurrence order.
    * Grams are codepoint-counted (SQL substring semantics).
    */
  def fingerprints(s: String, k: Int, win: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val grams = math.max(n - k + 1, 1)
    val hashes = new Array[Long](grams)
    if (n < k) {
      // short doc: hash the whole text as one gram
      var h = 0L
      var i = 0
      while (i < n) { h = addmod(mulmod(h, Base), cps(i)); i += 1 }
      hashes(0) = h
    } else {
      // pow = Base^(k-1) for the rolling update
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow = mulmod(pow, Base); i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = addmod(mulmod(h, Base), cps(i)); i += 1 }
      hashes(0) = h
      i = k
      while (i < n) {
        h = addmod(mulmod(addmod(h, P - mulmod(cps(i - k), pow)), Base), cps(i))
        hashes(i - k + 1) = h
        i += 1
      }
    }
    // monotonic-deque sliding minimum over `win`-length windows
    val w = math.min(win, grams)
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < grams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) out.add(hashes(deque(head)))
      j += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { res(m) = it.next(); m += 1 }
    res
  }

  // (no final bit mix: mod-P values feed hash-partitioned joins, and
  // Spark's shuffle hasher re-mixes them; a mix here would break oracle
  // reproducibility for nothing)

  /** Column API. */
  def winnow(text: Column, k: Int, win: Int): Column =
    GraftSqlBridge.column(Winnow(GraftSqlBridge.expression(text), k, win))
}
