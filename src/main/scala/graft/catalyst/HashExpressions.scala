package graft.catalyst

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-signature hot loops.
  *
  * The pure-built-in formulations (higher-order `transform`/`aggregate`
  * lambdas) are semantically identical but interpreted per element — the
  * dominant cost of the dedup family at scale. These expressions do the
  * same arithmetic in one tight JVM loop per row, and implement
  * `doGenCode` as a static call so the surrounding projection stays one
  * WholeStageCodegen span (no CodegenFallback row materialization).
  *
  * BIT-FOR-BIT parity with the SQL/DuckDB formulations is part of the
  * contract — the oracle queries in ExtEntry are unchanged and ExtSpec
  * asserts equality against the HOF versions.
  */
object HashExpressions {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Row kernel for [[SimHash64]] — also called from generated code. */
  def simhashEval(arr: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      md.reset()
      val d = md.digest(t.getBytes)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> (63 - b)) & 1L) == 1L) counts(b) += 1
        else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= 1L << (63 - b)
      b += 1
    }
    UTF8String.fromString(f"$res%016x")
  }

  /** Row kernel for [[MinHashChunks]]. Input must be non-empty (callers
    * build shingles via [[WordShingles]], which emits >= 1 element); an
    * empty input yields 8 empty-string minima rather than nulls.
    */
  def minhashEval(arr: ArrayData): ArrayData = {
    val mins = new Array[String](8)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val raw = s.getBytes
      val hex1 = md5hex(raw)
      val salted = new Array[Byte](raw.length + 2)
      salted(0) = 'x'
      salted(1) = ':'
      System.arraycopy(raw, 0, salted, 2, raw.length)
      val hex2 = md5hex(salted)
      var j = 0
      while (j < 4) {
        val c1 = hex1.substring(8 * j, 8 * j + 8)
        if (mins(j) == null || c1 < mins(j)) mins(j) = c1
        val c2 = hex2.substring(8 * j, 8 * j + 8)
        if (mins(j + 4) == null || c2 < mins(j + 4)) mins(j + 4) = c2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(
      if (m == null) "" else m)))
  }

  /** Row kernel for [[WordShingles]]. */
  def shinglesEval(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val m = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String](m * 2)
    var i = 0
    while (i < m) {
      val end = math.min(i + n, len)
      val sb = new java.lang.StringBuilder()
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(arr.getUTF8String(k).toString)
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Row kernel for [[DotDouble]]: left-to-right double dot product of
    * two float/double arrays — bit-identical to the HOF formulation
    * `aggregate(zip_with(a, b, x*y), 0.0, acc+v)` (each element up-cast
    * to double, products accumulated in input order) and to the DuckDB
    * oracle's `list_sum(list_transform(...))`. Lengths must match: the
    * HOF twin null-pads and returns NULL on mismatch, which silently
    * hides shape bugs — here a mismatch fails fast instead (all engine
    * callers use fixed-dim embeddings).
    */
  def dotEval(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"graft_dot: length mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Pack an integer-valued float/double array into one signed byte per
    * element — the 64 B/row on-disk layout of the int8 compression rung
    * ([[graft.ext.Rung]]'s standing table). Values must already be the
    * quantized integers the rung computes (floor(x·127/scale + 0.5) ∈
    * [-127, 127]); a non-integral or out-of-range value fails fast
    * rather than silently truncating — the byte payload must decode to
    * EXACTLY the doubles the on-the-fly form scores with, or the
    * indexed/on-the-fly identity the spec pins would break.
    */
  def packInt8Eval(a: ArrayData, aFloat: Boolean): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // a null element would read as the zeroed storage slot (0.0) and
      // silently pack as byte 0 while the HOF twin returns NULL and the
      // oracle's list_sum skips it — fail fast instead (review r14)
      require(!a.isNullAt(i),
        s"graft_pack_int8: null element at index $i — pack only " +
          "complete quantized vectors")
      val v = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val b = v.toByte
      require(b.toDouble == v,
        s"graft_pack_int8: value $v at index $i is not a signed-byte " +
          "integer — pack only the quantized int8 rung values")
      out(i) = b
      i += 1
    }
    out
  }

  /** Dot product of two packed-int8 byte payloads, accumulated in
    * double. Every partial product is ≤ 127² and every partial sum of a
    * 64-dim row is < 2²⁰ — exact integers in double, so the result is
    * bit-identical to [[dotEval]] over the unpacked quantized arrays
    * regardless of accumulation order (the indexed/on-the-fly identity
    * contract).
    */
  def dotInt8Eval(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length,
      s"graft_dot_int8: length mismatch (${a.length} vs ${b.length})")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      s += (a(i).toInt * b(i).toInt).toDouble
      i += 1
    }
    s
  }

  /** Hashed-bigram bucket of gram `i` of a word array: the first md5
    * byte of `concat_ws(" ", slice(tokens, i+1, 2))` — i.e.
    * `conv(substring(md5(g), 1, 2), 16, 10)` in the HOF formulation
    * ([[graft.ext.Curation.dsirWeights]]) and the DuckDB oracle's
    * strpos arithmetic. concat_ws semantics on the 0/1/2-element slice:
    * nulls dropped, no dangling separator, empty slice hashes "".
    */
  private def gramDigest(md: MessageDigest, tokens: ArrayData,
                         i: Int, len: Int): Array[Byte] = {
    md.reset()
    val t0 = if (i < len) tokens.getUTF8String(i) else null
    val t1 = if (i + 1 < len) tokens.getUTF8String(i + 1) else null
    if (t0 != null) md.update(t0.getBytes)
    if (t0 != null && t1 != null) md.update(' '.toByte)
    if (t1 != null) md.update(t1.getBytes)
    md.digest()
  }

  /** First-2-hex bucket (0..255) of the bigram at `i` — DSIR's space. */
  private def gramBucket(md: MessageDigest, tokens: ArrayData,
                         i: Int, len: Int): Int =
    gramDigest(md, tokens, i, len)(0) & 0xff

  /** First-3-hex bucket (0..4095) of the bigram at `i` — the classifier
    * feature space (`conv(substring(md5(g), 1, 3), 16, 10)`): 16× fewer
    * collisions than DSIR's 256 for a still-broadcastable model.
    */
  private def gramBucket12(md: MessageDigest, tokens: ArrayData,
                           i: Int, len: Int): Int = {
    val d = gramDigest(md, tokens, i, len)
    ((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)
  }

  /** Row kernel for [[DsirBuckets]]: the `max(len-1, 1)` hashed-bigram
    * bucket ids (0..255) of a word array, in gram order — the tight-loop
    * twin of `transform(gramsOf(w), g => bucketOf(g))`.
    */
  def dsirBucketsEval(tokens: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val len = tokens.numElements()
    val m = math.max(len - 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = gramBucket(md, tokens, i, len).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Row kernel for [[DsirScore]]: fold the document's hashed-bigram
    * buckets against the broadcast target/source count arrays in ONE
    * pass — `(n_grams, Σ(t[b]+1), Σ(s[b]+1))` as exact longs, replacing
    * two interpreted `aggregate` HOF folds plus an interpreted gram
    * `transform`. Bit-for-bit with the HOF form: same gram order, same
    * bucket math, same add-one smoothing inside the sum.
    */
  def dsirScoreEval(tokens: ArrayData, tArr: ArrayData,
                    sArr: ArrayData): InternalRow = {
    // buckets index 0..255: a short count array from a sloppy SQL call
    // would otherwise read out of bounds, and a null slot reads as
    // garbage (UnsafeArrayData.getLong checks neither) — fail loudly
    // instead of silently mis-scoring. Nullability can't be rejected at
    // analysis: Literal inference marks even Array[Long] literals as
    // containsNull=true.
    require(tArr.numElements() >= 256 && sArr.numElements() >= 256,
      s"graft_dsir_score: count arrays must have >= 256 slots, got " +
        s"${tArr.numElements()} and ${sArr.numElements()}")
    var j = 0
    while (j < 256) {
      if (tArr.isNullAt(j) || sArr.isNullAt(j))
        throw new IllegalArgumentException(
          s"graft_dsir_score: count arrays must not contain nulls (slot $j)")
      j += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val len = tokens.numElements()
    val m = math.max(len - 1, 1)
    var num = 0L
    var den = 0L
    var i = 0
    while (i < m) {
      val b = gramBucket(md, tokens, i, len)
      num += tArr.getLong(b) + 1L
      den += sArr.getLong(b) + 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, num, den))
  }

  /** Row kernel for [[ClfBuckets]]: the `max(len-1, 1)` hashed-bigram
    * 12-bit bucket ids (0..4095) of a word array, in gram order — the
    * classifier-feature twin of [[dsirBucketsEval]].
    */
  def clfBucketsEval(tokens: ArrayData): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val len = tokens.numElements()
    val m = math.max(len - 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      out(i) = gramBucket12(md, tokens, i, len).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Row kernel for [[ClfScore]]: fold the document's 12-bit hashed-
    * bigram buckets against the broadcast per-class count arrays in ONE
    * pass — `(n_grams, Σ(pos[b]+1), Σ(neg[b]+1))` as exact longs; the
    * 4096-slot twin of [[dsirScoreEval]] with the same loud bounds and
    * null checks.
    */
  def clfScoreEval(tokens: ArrayData, posArr: ArrayData,
                   negArr: ArrayData): InternalRow = {
    require(posArr.numElements() >= 4096 && negArr.numElements() >= 4096,
      s"graft_clf_score: count arrays must have >= 4096 slots, got " +
        s"${posArr.numElements()} and ${negArr.numElements()}")
    val md = MessageDigest.getInstance("MD5")
    val len = tokens.numElements()
    val m = math.max(len - 1, 1)
    var num = 0L
    var den = 0L
    var i = 0
    while (i < m) {
      val b = gramBucket12(md, tokens, i, len)
      // null slots fail loudly, checked only for the buckets actually
      // read — a full 4096-slot pre-scan would cost ~80x the fold
      // itself on typical documents
      if (posArr.isNullAt(b) || negArr.isNullAt(b))
        throw new IllegalArgumentException(
          s"graft_clf_score: count arrays must not contain nulls (slot $b)")
      num += posArr.getLong(b) + 1L
      den += negArr.getLong(b) + 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, num, den))
  }

  /** Row kernel for [[BpeMergePair]]: one BPE merge step over a symbol
    * array — replace adjacent (l, r) occurrences with the concatenated
    * symbol, greedy left-to-right, non-overlapping, candidates read
    * from the ORIGINAL sequence (a newly formed symbol cannot re-match
    * within the same step) — exactly Sennrich et al. 2016's per-word
    * `re.sub` merge semantics, and exactly the positional
    * runs-and-parity SQL formulation the DuckDB oracle uses.
    */
  def bpeMergeEval(arr: ArrayData, l: UTF8String,
                   r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i + 1 < n && s == l && arr.getUTF8String(i + 1) == r) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(s)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Row kernel for [[RepetitionStats]] — the Gopher repetition family
    * (Rae et al. 2021 Table A1), span-based because this corpus has no
    * line structure (the [[graft.ext.Curation]] boilerplate precedent):
    * ONE pass per view over the token array, hash-counted —
    *
    *   - non-overlapping `spanLen`-token spans (the duplicate-line
    *     analog): how many span INSTANCES belong to a span text seen
    *     ≥ 2 times;
    *   - overlapping `topN`-grams: the most frequent gram, ties broken
    *     to the LEXICOGRAPHICALLY SMALLEST gram (the deterministic
    *     order the oracle's `ORDER BY c DESC, g` replays);
    *   - overlapping `dupN`-grams: characters covered by grams
    *     occurring ≥ 2 times, occurrences counted naively (overlaps
    *     included) — the documented approximation every public Gopher
    *     reimplementation makes.
    *
    * Gram char counts are Unicode code points (DuckDB's `len()`).
    * Returns struct(n_spans, n_dup_spans, top_gram, top_cnt,
    * top_chars, dup_chars) as exact longs.
    */
  def repetitionEval(arr: ArrayData, spanLen: Int, topN: Int,
                     dupN: Int): InternalRow = {
    val len = arr.numElements()
    def gram(from: Int, n: Int): String = {
      val end = math.min(from + n, len)
      val sb = new java.lang.StringBuilder()
      var k = from
      while (k < end) {
        if (k > from) sb.append(' ')
        sb.append(arr.getUTF8String(k).toString)
        k += 1
      }
      sb.toString
    }
    def countInto(m: java.util.HashMap[String, Int], count: Int,
                  stride: Int, n: Int): Unit = {
      var i = 0
      while (i < count) {
        val g = gram(i * stride, n)
        m.put(g, m.getOrDefault(g, 0) + 1)
        i += 1
      }
    }
    def chars(s: String): Long = s.codePointCount(0, s.length).toLong

    val nSpans = math.max((len + spanLen - 1) / spanLen, 1)
    val spanCnt = new java.util.HashMap[String, Int](nSpans * 2)
    countInto(spanCnt, nSpans, spanLen, spanLen)
    var nDup = 0L
    val sIt = spanCnt.values().iterator()
    while (sIt.hasNext) { val c = sIt.next(); if (c >= 2) nDup += c }

    val mTop = math.max(len - topN + 1, 1)
    val topCnt = new java.util.HashMap[String, Int](mTop * 2)
    countInto(topCnt, mTop, 1, topN)
    var topG: String = null
    var topC = 0
    val tIt = topCnt.entrySet().iterator()
    while (tIt.hasNext) {
      val e = tIt.next()
      if (e.getValue > topC ||
        (e.getValue == topC && (topG == null || e.getKey < topG))) {
        topG = e.getKey
        topC = e.getValue
      }
    }

    val mDup = math.max(len - dupN + 1, 1)
    val dupCnt = new java.util.HashMap[String, Int](mDup * 2)
    countInto(dupCnt, mDup, 1, dupN)
    var dupChars = 0L
    val dIt = dupCnt.entrySet().iterator()
    while (dIt.hasNext) {
      val e = dIt.next()
      if (e.getValue >= 2) dupChars += e.getValue.toLong * chars(e.getKey)
    }

    new GenericInternalRow(Array[Any](nSpans.toLong, nDup,
      UTF8String.fromString(topG), topC.toLong, chars(topG), dupChars))
  }

  private val kernelClass = "graft.catalyst.HashExpressions"

  /** Analysis-time input check shared by the token/shingle expressions:
    * array<string> required. Fails analysis cleanly (AnalysisException)
    * instead of a ClassCastException at execution.
    */
  private def requireStringArray(fn: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects array<string>, got ${other.sql}")
    }

  /** Hamming distance between two equal-length lowercase-hex strings:
    * Σ_i popcount(nibble(aᵢ) XOR nibble(bᵢ)) — the simhash verify loop
    * ([[graft.ext.TextDedup.simhashPairsFromHashes]]), exactly the HOF
    * `aggregate(sequence(1, 16), ...)` instr/bit_count math.
    */
  def hammingHexEval(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    require(ab.length == bb.length,
      s"graft_hamming_hex: length mismatch (${ab.length} vs ${bb.length})")
    def nib(c: Byte): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else throw new IllegalArgumentException(
        s"graft_hamming_hex: non-hex char '${c.toChar}'")
    var s = 0
    var i = 0
    while (i < ab.length) {
      s += Integer.bitCount(nib(ab(i)) ^ nib(bb(i)))
      i += 1
    }
    s
  }

  /** 64-bit SimHash over an array<string> token column, as 16 lowercase
    * hex chars. Bit b (MSB-first) is 1 iff Σ_tokens (±1 by bit b of the
    * first 8 md5 bytes) > 0 — exactly the ExtEntry.simhashCte math.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_simhash64"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.simhashEval($c);")

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Hamming distance between two equal-length hex strings — the
    * codegen'd verify kernel for the simhash pair filter.
    */
  case class HammingHex(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_hamming_hex"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

    override def nullSafeEval(a: Any, b: Any): Any =
      hammingHexEval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2) => s"${ev.value} = $kernelClass.hammingHexEval($c1, $c2);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): HammingHex = copy(left = l, right = r)
  }

  /** The 8 MinHash chunk-minima over an array<string> shingle column:
    * j in 0..3 → min over shingles of md5(s).substring(8j, 8j+8);
    * j in 4..7 → same over md5("x:" + s). Exactly ExtEntry.bandsCte's
    * `mh` math (lexicographic min on fixed-width lowercase hex).
    */
  case class MinHashChunks(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_minhash_chunks"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      minhashEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.minhashEval($c);")

    override protected def withNewChildInternal(c: Expression): MinHashChunks =
      copy(child = c)
  }

  /** Distinct word n-gram shingles of an array<string> token column —
    * the tight-loop twin of
    * `array_distinct(transform(sequence(...), i -> concat_ws(" ", slice(...))))`
    * with identical output (first-occurrence order; short inputs degrade
    * to one truncated shingle).
    */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_shingles"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      shinglesEval(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.shinglesEval($c, $n);")

    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  /** Codegen'd dot product of two float/double array columns — the
    * embedding hot loop (cosine verify, sign-LSH projections, brute-force
    * top-k run one per pair/plane). The HOF twin is
    * [[graft.ext.Similarity.dotViaHof]]; ExtSpec asserts equality.
    */
  case class DotDouble(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"graft_dot expects array<float|double>, got $other")
    }
    private lazy val (lf, rf) = (isFloat(left), isFloat(right))

    override def nullSafeEval(a: Any, b: Any): Any =
      dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2) => s"${ev.value} = $kernelClass.dotEval($c1, $c2, $lf, $rf);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotDouble = copy(left = l, right = r)
  }

  /** Double-typed floor — `Math.floor`, the SAME correctly-rounded IEEE
    * op DuckDB's `floor(DOUBLE)` runs (ADVICE r13 on
    * [[graft.ops.Exact]]): Spark's built-in `floor` returns LongType,
    * so NaN silently became 0 and ±Inf / |x| ≳ 9.2e18 saturated at
    * Long.Min/MaxValue while the oracle's double floor propagates them
    * — the exact cross-engine divergence class the round6 helper exists
    * to retire, reintroduced at the domain edges. Staying in double
    * makes the helper total: NaN→NaN, ±Inf→±Inf, and above 2^53 floor
    * is the identity in BOTH engines, bit-for-bit. On every value the
    * registry previously produced (|x·1e6+0.5| < 2^53) the result is
    * unchanged.
    */
  case class FloorDouble(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_floor_double"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects double, got ${other.sql}")
    }

    override def nullSafeEval(input: Any): Any =
      Math.floor(input.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = Math.floor($c);")

    override protected def withNewChildInternal(c: Expression): FloorDouble =
      copy(child = c)
  }

  /** Codegen'd int8 pack of a quantized float/double array column into
    * a `binary` payload — the write-side kernel of the int8 rung table.
    */
  case class PackInt8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_pack_int8"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${other.sql}")
    }

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(input: Any): Any =
      packInt8Eval(input.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.packInt8Eval($c, $isFloat);")

    override protected def withNewChildInternal(c: Expression): PackInt8 =
      copy(child = c)
  }

  /** Codegen'd dot product of two packed-int8 binary payloads — the
    * scan-side kernel of the int8 rung table: 64 byte-products per row
    * instead of 64 float loads, over a 64 B column instead of 256 B.
    */
  case class DotInt8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_int8"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == BinaryType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

    override def nullSafeEval(a: Any, b: Any): Any =
      dotInt8Eval(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2) => s"${ev.value} = $kernelClass.dotInt8Eval($c1, $c2);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotInt8 = copy(left = l, right = r)
  }

  /** Hashed-bigram bucket ids of an array<string> word column — the
    * model-pass half of the DSIR kernel (Xie et al. 2023). Exploding
    * these longs replaces exploding interpreted gram STRINGS: the gram
    * text never materializes, only its bucket.
    */
  case class DsirBuckets(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_dsir_buckets"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      dsirBucketsEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.dsirBucketsEval($c);")

    override protected def withNewChildInternal(c: Expression): DsirBuckets =
      copy(child = c)
  }

  /** The DSIR scoring fold: given a document's word array and the two
    * broadcast 256-slot count arrays (target, source), returns
    * `struct(n_grams, num, den)` where `num = Σ_g (t[bucket(g)]+1)` and
    * `den = Σ_g (s[bucket(g)]+1)` over the doc's hashed bigrams — one
    * tight codegen'd loop per row in place of an interpreted gram
    * transform plus two interpreted aggregate folds.
    */
  case class DsirScore(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_grams", LongType, nullable = false),
      StructField("num", LongType, nullable = false),
      StructField("den", LongType, nullable = false)))
    override def prettyName: String = "graft_dsir_score"

    override def checkInputDataTypes(): TypeCheckResult = {
      // null-free-ness is enforced at runtime in dsirScoreEval —
      // Literal inference marks even Array[Long] literals
      // containsNull=true, so an analysis-time rejection would refuse
      // legitimate callers
      def longArray(name: String, e: Expression): TypeCheckResult =
        e.dataType match {
          case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName $name argument expects array<bigint>, got ${other.sql}")
        }
      requireStringArray(prettyName, first) match {
        case TypeCheckResult.TypeCheckSuccess =>
          longArray("target-counts", second) match {
            case TypeCheckResult.TypeCheckSuccess =>
              longArray("source-counts", third)
            case f => f
          }
        case f => f
      }
    }

    override def nullSafeEval(toks: Any, t: Any, s: Any): Any =
      dsirScoreEval(toks.asInstanceOf[ArrayData],
        t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2, c3) => s"${ev.value} = $kernelClass.dsirScoreEval($c1, $c2, $c3);")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): DsirScore =
      copy(first = f, second = s, third = t)
  }

  /** 12-bit hashed-bigram bucket ids of an array<string> word column —
    * the model-pass half of the NB classifier kernel ([[ClfScore]]'s
    * feature space). Like [[DsirBuckets]], only the bucket id survives
    * the explode; the gram string never materializes.
    */
  case class ClfBuckets(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_clf_buckets"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      clfBucketsEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.clfBucketsEval($c);")

    override protected def withNewChildInternal(c: Expression): ClfBuckets =
      copy(child = c)
  }

  /** The classifier scoring fold: word array + broadcast 4096-slot
    * per-class gram-count arrays → `struct(n_grams, num, den)` with
    * `num = Σ_g (pos[bucket(g)]+1)`, `den = Σ_g (neg[bucket(g)]+1)` —
    * one tight codegen'd loop per row ([[clfScoreEval]]).
    */
  case class ClfScore(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_grams", LongType, nullable = false),
      StructField("num", LongType, nullable = false),
      StructField("den", LongType, nullable = false)))
    override def prettyName: String = "graft_clf_score"

    override def checkInputDataTypes(): TypeCheckResult = {
      def longArray(name: String, e: Expression): TypeCheckResult =
        e.dataType match {
          case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName $name argument expects array<bigint>, got ${other.sql}")
        }
      requireStringArray(prettyName, first) match {
        case TypeCheckResult.TypeCheckSuccess =>
          longArray("pos-counts", second) match {
            case TypeCheckResult.TypeCheckSuccess =>
              longArray("neg-counts", third)
            case f => f
          }
        case f => f
      }
    }

    override def nullSafeEval(toks: Any, p: Any, n: Any): Any =
      clfScoreEval(toks.asInstanceOf[ArrayData],
        p.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2, c3) => s"${ev.value} = $kernelClass.clfScoreEval($c1, $c2, $c3);")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): ClfScore =
      copy(first = f, second = s, third = t)
  }

  /** One BPE merge step over an array<string> symbol column: adjacent
    * (l, r) pairs collapse to the concatenated symbol, greedy
    * left-to-right, non-overlapping ([[bpeMergeEval]]). l and r are
    * per-iteration constants (the argmax merge), so the trainer binds
    * them as string children — typically literals.
    */
  case class BpeMergePair(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {
    // element nullability follows the input: the kernel passes null
    // symbols through unmerged (a null never equals l), so claiming
    // containsNull=false for a nullable input would lie to downstream
    // writers that skip null tracking
    override def dataType: DataType = first.dataType match {
      case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
      case _ => ArrayType(StringType, containsNull = true)
    }
    override def prettyName: String = "graft_bpe_merge_pair"

    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, first) match {
        case TypeCheckResult.TypeCheckSuccess =>
          if (second.dataType == StringType && third.dataType == StringType)
            TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects (array<string>, string, string), got " +
              s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
        case f => f
      }

    override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
      bpeMergeEval(syms.asInstanceOf[ArrayData],
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (c1, c2, c3) => s"${ev.value} = $kernelClass.bpeMergeEval($c1, $c2, $c3);")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): BpeMergePair =
      copy(first = f, second = s, third = t)
  }

  /** The Gopher repetition statistics of an array<string> token column
    * in one codegen'd pass ([[repetitionEval]]): span duplication,
    * most-frequent `topN`-gram, duplicated-`dupN`-gram char mass.
    */
  case class RepetitionStats(child: Expression, spanLen: Int, topN: Int,
                             dupN: Int) extends UnaryExpression {
    require(spanLen >= 1 && topN >= 1 && dupN >= 1,
      s"graft_repetition: window sizes must be >= 1, got " +
        s"($spanLen, $topN, $dupN)")
    override def dataType: DataType = StructType(Seq(
      StructField("n_spans", LongType, nullable = false),
      StructField("n_dup_spans", LongType, nullable = false),
      StructField("top_gram", StringType, nullable = false),
      StructField("top_cnt", LongType, nullable = false),
      StructField("top_chars", LongType, nullable = false),
      StructField("dup_chars", LongType, nullable = false)))
    override def prettyName: String = "graft_repetition"
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(prettyName, child)

    override def nullSafeEval(input: Any): Any =
      repetitionEval(input.asInstanceOf[ArrayData], spanLen, topN, dupN)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = $kernelClass.repetitionEval($c, $spanLen, $topN, $dupN);")

    override protected def withNewChildInternal(c: Expression): RepetitionStats =
      copy(child = c)
  }

  def repetitionStats(tokens: Column, spanLen: Int, topN: Int,
                      dupN: Int): Column =
    Bridge.column(RepetitionStats(Bridge.expression(tokens), spanLen, topN,
      dupN))

  def bpeMergePair(syms: Column, l: Column, r: Column): Column =
    Bridge.column(BpeMergePair(Bridge.expression(syms),
      Bridge.expression(l), Bridge.expression(r)))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def hammingHex(a: Column, b: Column): Column =
    Bridge.column(HammingHex(Bridge.expression(a), Bridge.expression(b)))

  def minhashChunks(shingles: Column): Column =
    Bridge.column(MinHashChunks(Bridge.expression(shingles)))

  def wordShingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))

  def dotDouble(a: Column, b: Column): Column =
    Bridge.column(DotDouble(Bridge.expression(a), Bridge.expression(b)))

  def floorDouble(a: Column): Column =
    Bridge.column(FloorDouble(Bridge.expression(a)))

  def packInt8(a: Column): Column =
    Bridge.column(PackInt8(Bridge.expression(a)))

  def dotInt8(a: Column, b: Column): Column =
    Bridge.column(DotInt8(Bridge.expression(a), Bridge.expression(b)))

  def dsirBuckets(tokens: Column): Column =
    Bridge.column(DsirBuckets(Bridge.expression(tokens)))

  def dsirScore(tokens: Column, tArr: Column, sArr: Column): Column =
    Bridge.column(DsirScore(Bridge.expression(tokens),
      Bridge.expression(tArr), Bridge.expression(sArr)))

  def clfBuckets(tokens: Column): Column =
    Bridge.column(ClfBuckets(Bridge.expression(tokens)))

  def clfScore(tokens: Column, posArr: Column, negArr: Column): Column =
    Bridge.column(ClfScore(Bridge.expression(tokens),
      Bridge.expression(posArr), Bridge.expression(negArr)))
}
