package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the text-dedup hot path. The declarative form —
  * nested `transform`/`array_distinct`/`md5` higher-order functions —
  * is evaluated interpreted by Catalyst at ~0.7 ms per shingle
  * (boxing + per-element expression dispatch); these plain-Java loops
  * do the same work ~50× faster and are called from generated code.
  *
  * CONTRACT: results must stay bit-identical to the SQL forms in
  * `Dedup` (`shinglesSql` / `shingleHashesSql`), which the DuckDB
  * oracle runs: normalize = lower(trim(collapse-whitespace)), shingle
  * = distinct 3-word windows joined by single spaces, hash material =
  * md5(s) || md5("x:" || s) in lowercase hex.
  */
object TextHashKernels {

  /** lower(trim(regexp_replace(text, "\\s+", " "))) — delegates to the
    * regex-free single-pass implementation (bit-identical). */
  def normalize(text: UTF8String): String =
    TextStatKernels.normalize(text)

  def shingleSet(text: UTF8String): ArrayData = {
    val norm = normalize(text)
    val toks = norm.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length >= 3) {
      var i = 0
      while (i + 2 < toks.length) {
        out.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
    } else out.add(norm)
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct character 5-gram set of the normal form (n-gram Jaccard
    * dedup); whole-norm fallback for short docs. */
  def charShingles(text: UTF8String): ArrayData = {
    val norm = normalize(text)
    val out = new java.util.LinkedHashSet[String]()
    if (norm.length >= 5) {
      var i = 0
      while (i + 5 <= norm.length) { out.add(norm.substring(i, i + 5)); i += 1 }
    } else out.add(norm)
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }

  /** Polynomial (Rabin-Karp style) rolling hash of the normal form:
    * fold (acc*31 + charCode) mod (2^31-1) over characters — matches
    * the SQL fold `aggregate(chars, 0, (acc,c) -> (acc*31+ascii(c)) %
    * 2147483647)` exactly (ASCII text; codes are the char values). */
  def rollingHash(text: UTF8String): Long = {
    val norm = normalize(text)
    var acc = 0L
    var i = 0
    while (i < norm.length) {
      acc = (acc * 31 + norm.charAt(i)) % 2147483647L
      i += 1
    }
    acc
  }

  /** min over elements of md5(salt || element) — a 1-row minhash used
    * as a dedup blocking key / cheap similarity sketch; matches
    * `list_min(list_transform(a, x -> md5(salt || x)))`. */
  def minMd5(arr: ArrayData, salt: UTF8String): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    val s = salt.toString
    var best: String = null
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = md5hex(md, s + arr.getUTF8String(i).toString)
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    if (best == null) null else UTF8String.fromString(best)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5hex(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexDigits((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** md5 hex of each k-token window joined by single spaces (the
    * decontamination shingle); one whole-array window for inputs
    * shorter than k (md5 of "" for an empty array). Bit-identical to
    * the SQL fold `list_transform(range(1, greatest(1, len(t)-k+1)+1),
    * i -> md5(array_to_string(t[i:i+k-1], ' ')))`. */
  def tokenShingleMd5(tokens: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    val count = math.max(1, n - k + 1)
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(n, i + k)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens.getUTF8String(j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(md5hex(md, sb.toString))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-digest Jaccard sketch over the char-5-gram stream of the
    * normal form: element 0 is the min full md5 hex (the blocking
    * key), element k (1-based) is the min over grams of the k-th
    * disjoint 6-hex-char window of that same digest — an independent
    * 24-bit minhash per window, at ONE digest per gram instead of
    * (1 + nWindows). Duplicate grams can't change a min, so no
    * distinct-set is materialized. Whole-norm fallback for short
    * docs, matching [[charShingles]]. */
  def charShingleSketch(text: UTF8String, windows: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val norm = normalize(text)
    val mins = new Array[String](windows + 1)
    def update(g: String): Unit = {
      val h = md5hex(md, g)
      if (mins(0) == null || h.compareTo(mins(0)) < 0) mins(0) = h
      var k = 1
      while (k <= windows) {
        val w = h.substring((k - 1) * 6, (k - 1) * 6 + 6)
        if (mins(k) == null || w.compareTo(mins(k)) < 0) mins(k) = w
        k += 1
      }
    }
    if (norm.length >= 5) {
      var i = 0
      while (i + 5 <= norm.length) { update(norm.substring(i, i + 5)); i += 1 }
    } else update(norm)
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** All `count` minhash signature components in ONE pass: component k
    * is the min over elements of the k-th `width`-hex window — the
    * kernel form of `count` × `array_min(transform(h, substring(...)))`
    * interpreted HOF passes. */
  def minHexWindows(hashes: ArrayData, width: Int, count: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[String](count)
    var i = 0
    while (i < n) {
      val h = hashes.getUTF8String(i).toString
      var k = 0
      while (k < count) {
        val w = h.substring(k * width, k * width + width)
        if (mins(k) == null || w.compareTo(mins(k)) < 0) mins(k) = w
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** For each shingle: md5(s) || md5("x:" || s), 64 hex chars. */
  def shingleHashes(shingles: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val n = shingles.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i).toString
      out(i) = UTF8String.fromString(md5hex(md, s) + md5hex(md, "x:" + s))
      i += 1
    }
    new GenericArrayData(out)
  }

  // token → 16-bit md5-parity pattern memo: the pattern is a pure
  // function of the token, and corpus vocabularies are tiny next to
  // token counts, so memoizing turns the dominant cost (one md5 per
  // token OCCURRENCE) into one md5 per DISTINCT token per executor.
  // Bounded so an adversarial unbounded vocabulary can't leak memory;
  // on overflow new tokens just hash unmemoized (same result).
  private val simhashMemoMax = 1 << 20
  private val simhashMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer](1 << 16)

  /** One md5 per distinct token (memoized parity pattern); bit j from
    * hex digit j parity; majority vote over occurrences. */
  def simhash16(tokens: ArrayData): Long = {
    var md: MessageDigest = null
    val votes = new Array[Int](16)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i).toString
      var pat = simhashMemo.get(t)
      if (pat == null) {
        if (md == null) md = MessageDigest.getInstance("MD5")
        val h = md5hex(md, t)
        var p = 0
        var j = 0
        while (j < 16) {
          // odd hex digit ⇔ low bit of the nibble set
          if ((Character.digit(h.charAt(j), 16) & 1) == 1) p |= (1 << j)
          j += 1
        }
        pat = Integer.valueOf(p)
        if (simhashMemo.size < simhashMemoMax) simhashMemo.put(t, pat)
      }
      val p = pat.intValue()
      var j = 0
      while (j < 16) {
        if (((p >> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  // sign matrix cache for lshBucket: signs(j)(i) = +1/-1 from the
  // parity of the first hex digit of md5("p<j>:<i>") — row-independent
  @volatile private var signCache: Array[Array[Int]] = Array.empty
  private def signs(planes: Int, dims: Int): Array[Array[Int]] = {
    val cached = signCache
    if (cached.length >= planes && (planes == 0 || cached(0).length >= dims))
      return cached
    synchronized {
      val md = MessageDigest.getInstance("MD5")
      val fresh = Array.tabulate(planes, dims) { (j, i) =>
        val h = md5hex(md, "p" + j + ":" + i)
        if ((Character.digit(h.charAt(0), 16) & 1) == 1) 1 else -1
      }
      signCache = fresh
      fresh
    }
  }

  def lshBucket(v: ArrayData, planes: Int): Long = lshBucket(v, planes, 0)

  /** `offset` selects global plane indices [offset, offset+planes):
    * one Long holds ≤ 63 plane bits, and band width must GROW with
    * corpus size (random candidate pairs ≈ bands·n²/2^bits — an Int
    * cap of 31 planes was the hidden ceiling behind one quadratic
    * candidate stage at 10× scale, and 60 planes became the next
    * ceiling at 100×), so wider signatures span several Longs. */
  def lshBucket(v: ArrayData, planes: Int, offset: Int): Long = {
    val n = v.numElements()
    val s = signs(offset + planes, n)
    var bucket = 0L
    var j = 0
    while (j < planes) {
      val row = s(offset + j)
      var acc = 0L
      var i = 0
      while (i < n) { acc += row(i) * v.getLong(i); i += 1 }
      if (acc > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}

abstract class Utf8ArrayKernelExpression extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  /** Fully-qualified static method the generated code calls. */
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

/** text → distinct 3-word shingle set (codegen'd kernel call). */
case class ShingleSet(child: Expression) extends Utf8ArrayKernelExpression {
  override def prettyName: String = "shingle_set"
  protected val kernel =
    "graft.functions.TextHashKernels.shingleSet"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.shingleSet(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle set → per-shingle 64-hex md5 material. */
case class ShingleHashes(child: Expression) extends Utf8ArrayKernelExpression {
  override def prettyName: String = "shingle_hashes"
  protected val kernel =
    "graft.functions.TextHashKernels.shingleHashes"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.shingleHashes(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** text → distinct character 5-gram set. */
case class CharShingles(child: Expression) extends Utf8ArrayKernelExpression {
  override def prettyName: String = "char_shingles"
  protected val kernel =
    "graft.functions.TextHashKernels.charShingles"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.charShingles(t.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** text → polynomial rolling-hash fingerprint (codegen'd kernel). */
case class RollingHash(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.rollingHash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<string> → min md5 hex over salted elements. */
case class MinMd5(child: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.StringType
  override def left: Expression = child
  override def dataType: DataType = StringType
  override def prettyName: String = "min_md5"
  override def nullSafeEval(a: Any, s: Any): Any =
    TextHashKernels.minMd5(a.asInstanceOf[ArrayData],
      s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (c, s) => s"${ev.value} = graft.functions.TextHashKernels.minMd5($c, $s);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(child = l, right = r)
}

object TextFunctions {
  def shingleSet(c: Column): Column =
    Bridge.column(ShingleSet(Bridge.expression(c)))
  def charShingles(c: Column): Column =
    Bridge.column(CharShingles(Bridge.expression(c)))
  def shingleHashes(c: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c)))
  def simhash16(c: Column): Column =
    Bridge.column(Simhash16(Bridge.expression(c)))
  def lshBucket(c: Column, planes: Int, offset: Int = 0): Column =
    Bridge.column(LshBucket(Bridge.expression(c), planes, offset))
  def tokenShingleMd5(c: Column, k: Int): Column =
    Bridge.column(TokenShingleMd5(Bridge.expression(c), k))
  def rollingHash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))
  def minMd5(c: Column, salt: String = ""): Column =
    Bridge.column(MinMd5(Bridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(salt)))
  def charShingleSketch(c: Column, windows: Int): Column =
    Bridge.column(CharShingleSketch(Bridge.expression(c), windows))
  def minHexWindows(c: Column, width: Int, count: Int): Column =
    Bridge.column(MinHexWindows(Bridge.expression(c), width, count))
}

/** 64-hex hash array → [min window_0, ..., min window_{count-1}]. */
case class MinHexWindows(child: Expression, width: Int, count: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "min_hex_windows"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.minHexWindows(a.asInstanceOf[ArrayData], width, count)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashKernels.minHexWindows($c, $width, $count)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** text → [min md5(gram), min hex-window_1..windows] one-digest
  * Jaccard sketch (blocking key + banded minhash components). */
case class CharShingleSketch(child: Expression, windows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingle_sketch"
  override def nullSafeEval(t: Any): Any =
    TextHashKernels.charShingleSketch(t.asInstanceOf[UTF8String], windows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashKernels.charShingleSketch($c, $windows)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Tokens → 16-bit SimHash. Replaces 16 interpreted `aggregate(...)`
  * passes (one per bit) with one md5 per token; bit j of a token is
  * the parity class of hex digit j of its md5, identical to the SQL
  * form in `Dedup.dedupSimhashOracle`. */
case class Simhash16(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.simhash16(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.simhash16($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Token array → md5 of each k-token window (decontamination
  * shingles). Replaces an interpreted `transform(sequence(...), i ->
  * md5(concat_ws(' ', slice(...))))` — one lambda dispatch chain per
  * shingle — with a single tight loop per row; identical to the SQL
  * form in `Pipeline.q50DecontamOracle`. */
case class TokenShingleMd5(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingle_md5"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.tokenShingleMd5(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.tokenShingleMd5($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Milli-vector → up-to-63-bit random-hyperplane LSH signature over
  * global plane indices [offset, offset+planes). The ±1 plane
  * components come from md5 digit parities ("p<j>:<i>"), which are
  * row-independent — the kernel precomputes the sign matrix once per
  * JVM instead of `planes` interpreted zip_with folds per row.
  * Identical to the SQL form in `Similarity.annLshOracle`; signatures
  * wider than 63 bits (band width grows with corpus size) span
  * several of these with increasing offsets. */
case class LshBucket(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.lshBucket(a.asInstanceOf[ArrayData], planes, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.lshBucket($c, $planes, $offset)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
