package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native shingling kernel: text → distinct 64-bit hashes of its word
 * n-grams, in one pass with no intermediate strings. The composed
 * equivalent (split → transform/sequence → concat_ws → array_distinct →
 * xxhash64) allocates a token array plus one string per shingle per row and
 * dominated every dedup query's runtime; this emits the hash of each
 * n-gram window directly from word hashes.
 */
/** Tokenizes on EXACTLY Java regex `\s` ([ \t\n\x0B\f\r]) — bit-identical
  * token boundaries to the composed `split(text, "\s+")` path on ANY
  * input, including Unicode whitespace (U+3000/U+2028/U+2000-200A stay
  * INSIDE tokens on both paths; Character.isWhitespace would split them
  * and silently shift every window position against the Spark-side
  * tokens). Leading/trailing whitespace yields no empty tokens, matching
  * the filtered-split `Dedup.wsToks`. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.eval(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.eval($c.toString(), $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Positional variant: ALL window hashes in token order (no dedup), so
  * `posexplode` yields (pos, hash) aligned with the document's 0-based
  * whitespace-token positions — the kernel for exact-substring operators
  * (signal + removal), whose hashed at-scale mode otherwise still built
  * one window STRING per position before hashing it. */
case class ShingleHashesAllExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size n must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.evalAll(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.evalAll($c.toString(), $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  private final val P = 0x100000001b3L // FNV prime

  /** splitmix64 finalizer — decorrelates the word-combination hash. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def eval(s: String, n: Int): ArrayData = {
    // hash each whitespace-separated word (FNV-1a), streaming
    val wordHashes = wordHashesOf(s)
    val w = wordHashes.size()
    if (w < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long](w * 2)
    val out = new java.util.ArrayList[java.lang.Long](w)
    var j = 0
    while (j + n <= w) {
      var g = 0L
      var k = 0
      while (k < n) { g = g * 0x9E3779B1L + wordHashes.get(j + k); k += 1 }
      val m = mix(g)
      if (seen.add(m)) out.add(m)
      j += 1
    }
    val arr = new Array[Long](out.size())
    var t = 0
    while (t < arr.length) { arr(t) = out.get(t); t += 1 }
    new GenericArrayData(arr)
  }

  /** Java-regex-`\s` whitespace: space, \t, \n, \x0B, \f, \r — the exact
    * set `split(text, "\s+")` breaks on, so kernel positions align with
    * the composed path's tokens on any input. */
  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** Word FNV-1a hashes of the whitespace tokens, streaming one pass. */
  private def wordHashesOf(s: String): java.util.ArrayList[java.lang.Long] = {
    val wordHashes = new java.util.ArrayList[java.lang.Long](64)
    var h = 0xcbf29ce484222325L
    var inWord = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isAsciiSpace(c)) {
        if (inWord) { wordHashes.add(h); h = 0xcbf29ce484222325L; inWord = false }
      } else {
        h = (h ^ c) * P
        inWord = true
      }
      i += 1
    }
    if (inWord) wordHashes.add(h)
    wordHashes
  }

  /** ALL window hashes, one per start position, in order (no dedup). */
  def evalAll(s: String, n: Int): ArrayData = {
    val wordHashes = wordHashesOf(s)
    val w = wordHashes.size()
    if (w < n) return new GenericArrayData(Array.empty[Long])
    val arr = new Array[Long](w - n + 1)
    var j = 0
    while (j + n <= w) {
      var g = 0L
      var k = 0
      while (k < n) { g = g * 0x9E3779B1L + wordHashes.get(j + k); k += 1 }
      arr(j) = mix(g)
      j += 1
    }
    new GenericArrayData(arr)
  }

  /** Column API: distinct hashed word n-gram shingles. */
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(c), n))

  /** Column API: per-position window hashes (posexplode-ready). */
  def all(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashesAllExpr(ColumnBridge.expression(c), n))
}
