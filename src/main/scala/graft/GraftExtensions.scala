package graft

import graft.functions.{CharEntropyStats, CharNgrams, MinhashBandKeys, MinhashSignature, PolyHashes, RepetitionStats, SimhashSignature, VecDot, Winnow, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: makes the engine's native
  * Catalyst expressions and optimizer rules available to ANY session
  * (including pure-SQL users) via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  *   SELECT vec_dot(a, b)              -- codegen'd float/double dot product
  *   SELECT winnow(text, 8, 4)         -- Rabin-Karp winnowing fingerprints
  *   SELECT word_shingles(norm, 3)     -- distinct word w-shingles, one pass
  *   SELECT char_ngrams(norm, 3)       -- distinct char n-grams, one pass
  *   SELECT minhash_signature(shs)     -- 64 per-seed minima of a shingle set
  *   SELECT simhash_signature(words)   -- 64-bit SimHash of a word array
  *   SELECT poly_hashes(features)      -- element-wise mod-2⁶¹−1 string hash
  *
  * plus graft.plans.DeriveBucketFilter, which turns plain `t` range
  * predicates over the partitioned ts layout into partition-pruning
  * p_bucket predicates automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
          VecDot(exprs.head, exprs(1))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("winnow"),
        new ExpressionInfo(classOf[Winnow].getName, "winnow"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 3, "winnow(text, k, win) takes exactly 3 arguments")
          Winnow(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "win"))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, "word_shingles(norm_text, w) takes exactly 2 arguments")
          WordShingles(exprs.head, intLit(exprs(1), "w"))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("char_ngrams"),
        new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, "char_ngrams(norm_text, n) takes exactly 2 arguments")
          CharNgrams(exprs.head, intLit(exprs(1), "n"))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, "minhash_signature(shingles) takes exactly 1 argument")
          MinhashSignature(exprs.head)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("simhash_signature"),
        new ExpressionInfo(classOf[SimhashSignature].getName, "simhash_signature"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, "simhash_signature(words) takes exactly 1 argument")
          SimhashSignature(exprs.head)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("repetition_stats"),
        new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, "repetition_stats(norm_text) takes exactly 1 argument")
          RepetitionStats(exprs.head)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("char_entropy_stats"),
        new ExpressionInfo(classOf[CharEntropyStats].getName, "char_entropy_stats"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, "char_entropy_stats(norm_text) takes exactly 1 argument")
          CharEntropyStats(exprs.head)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("band_pack"),
        new ExpressionInfo(classOf[MinhashBandKeys].getName, "band_pack"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, "band_pack(signature, bands) takes exactly 2 arguments")
          MinhashBandKeys(exprs.head, intLit(exprs(1), "bands"))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("poly_hashes"),
        new ExpressionInfo(classOf[PolyHashes].getName, "poly_hashes"),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, "poly_hashes(strings) takes exactly 1 argument")
          PolyHashes(exprs.head)
        }
      )
    )
    ext.injectOptimizerRule(_ => graft.plans.DeriveBucketFilter())
  }
}
