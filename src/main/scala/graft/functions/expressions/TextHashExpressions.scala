package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signature hot paths.
  *
  * The composable higher-order-function formulation (TextFunctions
  * .minhashSignature / .simhash64) re-hashes every token string once
  * per permutation/bit inside interpreted lambdas — measured 450 s for
  * MinHash over the sf0.1 corpus. These expressions hash each token
  * ONCE in a tight JVM loop and derive all permutations arithmetically:
  * same pipeline, ~100× less work per row, and `doGenCode` emits a
  * single static call so the surrounding projection stays inside
  * whole-stage codegen. This is preference (b) of the custom-operator
  * ladder: a scalar Expression, not a new operator.
  *
  * Determinism: hashes are self-contained (FNV-1a + splitmix64
  * finalizer over UTF-8 bytes) — no dependence on Spark hash inlining.
  */
object TextHashUtil {

  @inline private def mix64(x0: Long): Long = {
    // splitmix64 finalizer — full-avalanche 64-bit mixer
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^= (x >>> 31)
    x
  }

  /** FNV-1a over a byte range, finalized with splitmix64. */
  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Hashes of whitespace-delimited tokens (one hash per token). */
  private def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) out += hashRange(bytes, start, i)
    }
    out.toArray
  }

  /** Distinct hashes of word n-gram shingles, combined from the token
    * hashes (no shingle strings are materialized).
    */
  private def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val th = tokenHashes(s)
    if (th.length < n) return Array.empty
    val set = new java.util.HashSet[java.lang.Long](th.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](th.length)
    var i = 0
    while (i + n <= th.length) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { h = mix64(h ^ th(i + j)); j += 1 }
      if (set.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** Distinct shingle hashes as ArrayData (for exact-Jaccard joins on
    * 8-byte elements instead of shingle strings).
    */
  def shingleHashArray(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashes(s, n))

  /** Per-token hashes WITH multiplicity, in document order — the
    * feature extractor for bag-of-hashed-ngrams models (DSIR), where
    * a token counts once per occurrence, unlike the DISTINCT shingle
    * sets the dedup operators key on.
    */
  def tokenHashArray(s: UTF8String): ArrayData =
    new GenericArrayData(tokenHashes(s))

  /** MinHash signature: permutation i is the bijection
    * h -> a_i*h + b_i (mod 2^64, a_i odd); signature element i is the
    * minimum over the document's distinct shingle hashes.
    */
  def minhashSig(s: UTF8String, shingleN: Int, numHashes: Int): ArrayData = {
    val sh = shingleHashes(s, shingleN)
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = mix64(0x517cc1b727220a95L + i) | 1L
      val b = mix64(0x2545f4914f6cdd1dL + i)
      var best = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val v = a * sh(j) + b
        if (v < best) best = v
        j += 1
      }
      sig(i) = if (sh.isEmpty) 0L else best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Winnowing fingerprint: hash every k-char gram (rolling single
    * pass over the bytes), take the min of each w-wide window with a
    * monotone deque (O(n), not O(n·w)), return the distinct mins.
    * Same guarantee as the HOF formulation: any shared substring of
    * length >= w+k-1 yields a shared fingerprint element.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) { grams(i) = hashRange(bytes, i, i + k); i += 1 }
    if (m <= w) {
      var best = grams(0); i = 1
      while (i < m) { if (grams(i) < best) best = grams(i); i += 1 }
      return new GenericArrayData(Array(best))
    }
    // sliding-window minimum via monotone index deque
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(grams(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** One-pass language scoring: per-language stopword hit ratios (the
    * language lists are fixed at construction into hash sets) plus a
    * CJK character-ratio signal. Returns [en, es, de, fr, zh] scores.
    * Replaces five interpreted array-filter passes per document.
    */
  def langScores(s: UTF8String, stopSets: Array[java.util.HashSet[String]]): ArrayData = {
    val text = s.toString
    val nLangs = stopSets.length
    val hits = new Array[Int](nLangs)
    var nTokens = 0
    var cjk = 0
    val len = text.length
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(text.charAt(i))) {
        val c = text.charAt(i)
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
        i += 1
      }
      if (i > start) {
        nTokens += 1
        val tok = text.substring(start, i).toLowerCase
        var l = 0
        while (l < nLangs) {
          if (stopSets(l).contains(tok)) hits(l) += 1
          l += 1
        }
      }
    }
    val scores = new Array[Double](nLangs + 1)
    var l = 0
    while (l < nLangs) {
      scores(l) = if (nTokens == 0) 0.0 else hits(l).toDouble / nTokens
      l += 1
    }
    scores(nLangs) = if (len == 0) 0.0 else cjk.toDouble / len * 10
    new GenericArrayData(scores)
  }

  /** 64-bit SimHash over the token multiset (hash each token once,
    * tally all 64 bit-votes in one pass).
    */
  def simhash(s: UTF8String): Long = {
    val th = tokenHashes(s)
    val tally = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      val h = th(i)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) tally(bit) += 1 else tally(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (tally(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** `minhash_sig(text, n, k)` — array<bigint> MinHash signature. */
case class MinHashSig(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSig(input.asInstanceOf[UTF8String], shingleN, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextHashUtil.minhashSig($c, $shingleN, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** `shingle_hashes(text, n)` — distinct word-n-gram shingle hashes. */
case class ShingleHashes(child: Expression, shingleN: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashArray(input.asInstanceOf[UTF8String], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextHashUtil.shingleHashArray($c, $shingleN)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** `token_hashes(text)` — per-token hashes with multiplicity. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.tokenHashArray(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextHashUtil.tokenHashArray($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
  override def prettyName: String = "token_hashes"
}

/** `winnow_fingerprint(text, k, w)` — distinct window-min gram hashes. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextHashUtil.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprint"
}

/** `lang_scores(text)` — [stopword-ratio per language..., cjk] scores
  * in one tokenization pass; the stopword sets ride along as a codegen
  * reference object.
  */
case class LangScores(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression {
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langs.map { words =>
      val h = new java.util.HashSet[String]()
      words.foreach(h.add)
      h
    }.toArray
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.langScores(input.asInstanceOf[UTF8String], sets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.TextHashUtil.langScores($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
  override def prettyName: String = "lang_scores"
}

/** `simhash64(text)` — 64-bit SimHash fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextHashUtil.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Column-API wrappers. */
object TextHashFunctions {
  def minhash_sig(text: Column, shingleN: Int = 3, numHashes: Int = 64): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(text), shingleN, numHashes))

  def simhash64_fast(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def shingle_hashes(text: Column, shingleN: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), shingleN))

  def token_hashes(text: Column): Column =
    ColumnBridge.column(TokenHashes(ColumnBridge.expression(text)))

  def winnow_fingerprint(text: Column, k: Int = 8, w: Int = 16): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, w))

  def lang_scores(text: Column, langs: Seq[Seq[String]]): Column =
    ColumnBridge.column(LangScores(ColumnBridge.expression(text), langs))
}
