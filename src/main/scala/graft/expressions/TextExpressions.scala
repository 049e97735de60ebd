package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text paths (SURVEY §7.3:
  * "custom Expression beats UDF beats anything else").
  *
  * The pure-Column formulation of word shingling
  * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, i, n)))`)
  * is an interpreted higher-order-function chain that Catalyst inlines
  * into every consumer — measured ~8 ms/doc at 460 tokens (39 s for
  * 5 000 docs). This single-pass expression does the same work in one
  * JVM loop (~µs/doc). Semantics are identical to
  * `array_distinct(shingles(tokens(text), n))`:
  * lowercase → split on `\s+` → drop empties → space-joined n-grams →
  * distinct in first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val arr = new Array[Any](seen.size)
      val it = seen.iterator
      var k = 0
      while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Single-pass tokenizer: lowercase → split `\s+` → drop empties.
  * Same output as `filter(split(lower(trim(text)), "\s+"), length > 0)`
  * but one JVM loop instead of an interpreted HOF chain (which Catalyst
  * additionally inlines into every consumer — the dominant cost in the
  * text queries before this existed). */
case class Tokenize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
      .split("\\s+")
    var n = 0
    var i = 0
    while (i < toks.length) { if (toks(i).nonEmpty) n += 1; i += 1 }
    val arr = new Array[Any](n)
    var k = 0
    i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) { arr(k) = UTF8String.fromString(toks(i)); k += 1 }
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Tokenize =
    copy(child = c)
}

/** One-pass portable MinHash signature over a shingle array: element s
  * of the result is the lexicographic MIN over shingles of
  * `md5(s || '|' || shingle)` — exactly the Column formulation
  * `transform(seq, s -> array_min(transform(sh, x -> md5(...))))` but
  * one digest loop instead of numHashes interpreted HOF passes.
  * Engine-portable (md5 hex + byte-order compare), no Murmur. */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = HEX((b(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](numHashes)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i).toString
      var s = 0
      while (s < numHashes) {
        md.reset()
        val h = hex(md.digest(
          (s.toString + "|" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
}

/** SimHash-64 over a token array, emitted as a 64-char '0'/'1' string
  * (engine-portable — no signed-long edge cases, bands are plain
  * substrings). Bit j votes +1 when bit j of md5(token)'s first 8
  * bytes (MSB-first) is set, -1 otherwise; votes are weighted by token
  * multiplicity; the fingerprint bit is 1 on a positive total.
  * Identical in SQL via hex-nibble extraction of md5(token). */
case class SimHashBits(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        val byte = d(j >> 3) & 0xff
        val bit = (byte >> (7 - (j & 7))) & 1
        votes(j) += (if (bit == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    val out = new Array[Char](64)
    var j = 0
    while (j < 64) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits =
    copy(child = c)
}

/** Hamming distance between two equal-length strings (bit strings in
  * the SimHash pipeline). Counts positions with differing chars; null
  * if lengths differ. */
case class HammingDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    if (a.length != b.length) null
    else {
      var d = 0
      var i = 0
      while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
      java.lang.Integer.valueOf(d)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  /** Distinct word n-gram shingles of a text column (native). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Whitespace tokens of a text column (native). */
  def tokenize(text: Column): Column =
    ColumnBridge.column(Tokenize(ColumnBridge.expression(text)))

  /** Portable MinHash signature of a shingle-array column (native). */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(shingles), numHashes))

  /** Hamming distance between two bit-string columns (native). */
  def hammingDist(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SimHash-64 bit string of a token-array column (native). */
  def simhashBits(tokens: Column): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(tokens)))
}
