package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst Expressions with `doGenCode` — the (b) route of the
  * custom-operator preference order (SURVEY §7): these stay inside
  * whole-stage codegen, unlike Scala UDFs which box every row.
  */

/** popcount(a XOR b) over two longs — Hamming distance between SimHash
  * signatures; the inner loop of signature-based near-dup joins.
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hamming64 expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) over two array<float> columns in one fused generated loop —
  * dot product and both norms in a single pass, double accumulation. The
  * higher-order-function composition (zip_with + aggregate ×3) walks the
  * arrays four times with closure dispatch; this walks once.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"cosine_sim expects (array<float|double>, array<float|double>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = elemType(left.dataType).contains(DoubleType)
    val yd = elemType(right.dataType).contains(DoubleType)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, t: DataType, i: String): String =
        if (elemType(t).contains(DoubleType)) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${get(a, left.dataType, i)};
         |  double $yi = ${get(b, right.dataType, i)};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance between two numeric arrays in one fused generated
  * loop, sequential double accumulation (index order — the property the
  * DuckDB oracle's ordered list_sum mirrors exactly). The k-means assign
  * step's inner loop: k of these per row per iteration.
  */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"l2sq expects (array<float|double>, array<float|double>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = isDouble(left.dataType)
    val yd = isDouble(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = (if (xd) x.getDouble(i) else x.getFloat(i).toDouble) -
        (if (yd) y.getDouble(i) else y.getFloat(i).toDouble)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, t: DataType, i: String): String =
        if (isDouble(t)) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, left.dataType, i)} - ${get(b, right.dataType, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct character n-grams of a string as array<string>, in first-
  * occurrence order — one byte-level pass per document (codepoint-aware,
  * matching SQL substr semantics). The higher-order-function composition
  * (transform(sequence(...), i => substr(text, i, n)) + array_distinct)
  * interprets the lambda per element AND re-scans the string per substr —
  * ~30× slower per row; this is the hot inner loop of n-gram similarity
  * join blocking, so it earns a native Expression.
  */
case class CharNgrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_ngrams expects (string) with n >= 1, got ${child.dataType}, n=$n")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  def distinctNgrams(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (byte positions), one pass
    val starts = new java.util.ArrayList[Int](bytes.length + 1)
    var i = 0
    while (i < bytes.length) {
      starts.add(i)
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts.add(bytes.length)
    val nChars = starts.size - 1
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var j = 0
    while (j + n <= nChars) {
      val from = starts.get(j)
      val until = starts.get(j + n)
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, from, until - from))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    distinctNgrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgramsExpr", this, classOf[CharNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.distinctNgrams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All K MinHash signature values in ONE pass over the token-id array:
  * out[k] = min over tids of (tid·aₖ + bₖ) mod m. The higher-order-function
  * composition (K × (transform + array_min)) walks the array K times and
  * allocates K intermediate arrays per row; this walks once with a K-long
  * register file — the signature-computation inner loop of MinHash+LSH
  * dedup. Semantics identical to the HOF chain (differential-tested).
  */
case class MinHashSigs(child: Expression, as: Array[Long], bs: Array[Long], mod: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "need at least one (a, b) permutation")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  def sigs(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(as.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val t = arr.getLong(i)
      var k = 0
      while (k < as.length) {
        val v = (t * as(k) + bs(k)) % mod
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    sigs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigsExpr", this, classOf[MinHashSigs].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.sigs($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bits`-bit SimHash from the per-token hash array in ONE pass:
  * bit j of the result is set iff Σ over tokens of (2·bitⱼ(h) − 1) > 0.
  * Replaces `bits` × aggregate() array walks (plus `bits` CASE columns)
  * with a single loop carrying a `bits`-long counter file. Semantics
  * identical to the HOF chain (differential-tested).
  */
case class SimHash64(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<bigint>, got $t")
  }
  override def dataType: DataType = LongType

  def simhash(arr: ArrayData): Long = {
    val sums = new Array[Long](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        sums(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64Expr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct md5-derived 32-bit ids of the k-token shingles of a token
  * array, in ONE pass: shingle bytes are streamed straight into a
  * thread-local MD5 digest (no shingle-string materialization), the first
  * 4 digest bytes big-endian become the id (identical to
  * `conv(substring(md5(s), 1, 8), 16, 10)`), and ids dedupe in insertion
  * order. Replaces the zip_with-concat / md5 / conv / array_distinct
  * chain that allocates several full string arrays per document — the
  * input-building stage of MinHash+LSH dedup. Shingles containing null
  * tokens are skipped (the HOF chain nulls them out and min/intersect
  * ignore nulls). n < k tokens → empty array.
  *
  * `idBytes` widens the id: 4 (default) matches the MinHash recipe's
  * 32-bit universe (permutations are mod a 32-bit prime); 8 takes the
  * first 8 digest bytes big-endian for uses where ids must distinguish
  * millions of distinct spans per corpus (birthday collisions at 32 bits
  * start near 2^16 distinct values; at 64 bits, near 2^32).
  */
case class ShingleTids(child: Expression, k: Int, idBytes: Int = 4)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  require(idBytes == 4 || idBytes == 8, s"idBytes must be 4 or 8, got $idBytes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_tids expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def tids(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = ShingleTids.Digest.get()
    var j = 0
    while (j + k <= n) {
      var ok = true
      var i = 0
      while (ok && i < k) {
        if (arr.isNullAt(j + i)) ok = false
        i += 1
      }
      if (ok) {
        md.reset()
        i = 0
        while (i < k) {
          if (i > 0) md.update(' '.toByte)
          md.update(arr.getUTF8String(j + i).getBytes)
          i += 1
        }
        val d = md.digest()
        var id = 0L
        var b = 0
        while (b < idBytes) { id = (id << 8) | (d(b) & 0xffL); b += 1 }
        seen.add(id)
      }
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    tids(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleTidsExpr", this, classOf[ShingleTids].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tids($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleTids {
  private val Digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })
}

/** Consecutive-duplicate-token scrub over an array<string>: keep token i
  * iff i == 0 or it differs from token i−1 — semantics identical to the
  * `filter(toks, (t, i) => i === 0 || t =!= get(toks, i - 1))`
  * higher-order-function chain it replaces (differential-tested). The HOF's
  * per-element interpreted lambda made the scrub the dominant cost of the
  * curation pipeline's text stage (~10 µs/token inside a window plan); this
  * is one UTF8String-compare pass.
  */
case class TokenRunScrub(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"scrub_runs expects array<string>, got $t")
  }
  override def dataType: DataType = child.dataType

  def scrub(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new java.util.ArrayList[Any](n)
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      // null elements, exactly as the HOF: `null =!= x` and `x =!= null`
      // are both unknown, so any comparison involving a null drops the
      // element — only position 0 survives unconditionally (i === 0 is
      // true regardless); a null still acts as the previous element for
      // its successor's comparison
      val t = if (a.isNullAt(i)) null
        else a.getUTF8String(i)
      val keep =
        if (i == 0) true
        else if (t == null || prev == null) false
        else !t.equals(prev)
      if (keep) out.add(t)
      prev = t
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    scrub(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenRunScrubExpr", this, classOf[TokenRunScrub].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scrub($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Luhn-validated card-number masking — the PII scrub stage regex alone
  * cannot do: a 16-digit run is only a card number if its Luhn checksum
  * holds, and masking checksum-failing runs (order ids, phone-ish runs)
  * destroys legitimate text. One pass over the string: each MAXIMAL digit
  * run of 13–19 digits whose Luhn mod-10 check passes is replaced by
  * `[CC]`; all other text (including too-short, too-long, and
  * checksum-failing runs) is byte-preserved. Maximal runs make the scan
  * unambiguous — no overlap or greediness semantics to align across
  * engines, so an external oracle can replay the rule with plain
  * substring arithmetic.
  */
case class LuhnScrub(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"luhn_scrub expects string, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType

  private def luhnOk(s: String, from: Int, until: Int): Boolean = {
    var sum = 0
    var dbl = false // doubling starts at the SECOND digit from the right
    var i = until - 1
    while (i >= from) {
      var d = s.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  def scrub(in: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val s = in.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val runLen = j - i
        if (runLen >= 13 && runLen <= 19 && luhnOk(s, i, j)) sb.append("[CC]")
        else sb.append(s, i, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    scrub(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luhnScrubExpr", this, classOf[LuhnScrub].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scrub($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total occurrence count of ANY of a fixed pattern list in one string —
  * Aho-Corasick over UTF-8 bytes, one pass per row regardless of pattern
  * count. The banned-term / blocklist scan of a crawl pipeline: a regex
  * alternation re-scans per alternative and a `contains` chain re-scans
  * per term, both linear in |patterns|; the automaton is built once per
  * expression instance (driver side, shipped serialized) and matching is
  * O(bytes) with pattern count irrelevant. Byte-level matching is
  * codepoint-safe: UTF-8 lead/continuation ranges are disjoint, so an
  * encoded pattern can only match at codepoint boundaries. Counts every
  * match occurrence (self-overlapping included: "aa" hits "aaa" twice);
  * total = Σ per-pattern occurrence counts.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_count needs at least one non-empty pattern")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"multi_pattern_count expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "multi_pattern_count"

  // goto/fail/output automaton over bytes; built lazily on first use per
  // JVM (the case class ships only the pattern strings)
  @transient private lazy val automaton: (Array[java.util.HashMap[Byte, Integer]], Array[Int], Array[Int]) = {
    val goto = scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Byte, Integer]())
    val out = scala.collection.mutable.ArrayBuffer(0)
    patterns.foreach { p =>
      var s = 0
      p.getBytes("UTF-8").foreach { b =>
        val nxt = goto(s).get(b)
        s = if (nxt != null) nxt.intValue()
        else {
          goto += new java.util.HashMap[Byte, Integer]()
          out += 0
          goto(s).put(b, goto.size - 1)
          goto.size - 1
        }
      }
      out(s) += 1
    }
    val fail = Array.fill(goto.size)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto(0).forEach((_, v) => queue.enqueue(v.intValue()))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).forEach { (b, v) =>
        val u = v.intValue()
        queue.enqueue(u)
        var f = fail(r)
        while (f != 0 && goto(f).get(b) == null) f = fail(f)
        val g = goto(f).get(b)
        fail(u) = if (g != null && g.intValue() != u) g.intValue() else 0
        out(u) += out(fail(u))
      }
    }
    (goto.toArray, fail, out.toArray)
  }

  def countMatches(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val (goto, fail, out) = automaton
    val bytes = s.getBytes
    var (st, total, i) = (0, 0L, 0)
    while (i < bytes.length) {
      val b = bytes(i)
      var g = goto(st).get(b)
      while (g == null && st != 0) { st = fail(st); g = goto(st).get(b) }
      st = if (g != null) g.intValue() else 0
      total += out(st)
      i += 1
    }
    total
  }

  override protected def nullSafeEval(input: Any): Any =
    countMatches(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acExpr", this, classOf[MultiPatternCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countMatches($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer — canonical
  * composition: decomposed "e" + U+0301 becomes "é") as a codegen'd
  * expression. Multilingual crawls mix composed and decomposed encodings
  * of the same text, which breaks every byte-keyed stage upstream of it —
  * exact dedup, fingerprints, token ids — so pipelines normalize FIRST.
  * Zero shuffle (a per-row fact); the fast path skips the (allocating)
  * normalizer entirely for pure-ASCII rows, which at web-corpus skew is
  * most of them.
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc expects string, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc"

  def normalize(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    // ASCII bytes are NFC by construction — return the input buffer as-is
    if (s.isFullAscii) s
    else {
      val j = s.toString
      if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcExpr", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Highest multiplicity among the token n-grams of one document (n-grams
  * joined by single spaces, matching the zip_with+concat chain): the
  * per-row core of intra-document repetition stats. Replaces an
  * explode → groupBy(doc, gram) → groupBy(doc) max TWO-SHUFFLE plan with a
  * zero-shuffle projection — a repeated-n-gram count is a fact about one
  * row, and at corpus scale it should never cost the corpus a shuffle.
  * Returns 0 when the document has fewer than n tokens.
  */
case class NgramMaxCount(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_max_count expects array<string>, got $t")
  }
  override def dataType: DataType = LongType

  def maxCount(a: ArrayData): Long = {
    val len = a.numElements()
    if (len < n) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var best = 0L
    var nullGrams = 0L // concat null-propagates: every null-containing
    var i = 0          // window is the SAME null gram in the HOF twin
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder()
      var hasNull = false
      var j = 0
      while (j < n && !hasNull) {
        if (a.isNullAt(i + j)) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(a.getUTF8String(i + j).toString)
        }
        j += 1
      }
      if (hasNull) {
        nullGrams += 1L
        if (nullGrams > best) best = nullGrams
      } else {
        val key = sb.toString
        val c = counts.getOrDefault(key, 0L) + 1L
        counts.put(key, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def nullSafeEval(input: Any): Any =
    maxCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramMaxCountExpr", this, classOf[NgramMaxCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.maxCount($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher repetition signals (Rae et al. 2021 A1.1) for one `n` in a single
  * pass over the token array: `[top_chars, dup_chars, total_chars]` where
  * `top_chars` = max over n-grams g of count(g)·charlen(g) (the numerator of
  * the "fraction of characters in the most frequent n-gram" rule — the
  * count·chars product form is tie-robust where "the most frequent
  * n-gram"'s char fraction depends on which of the tied grams an engine
  * picks), `dup_chars` = characters of tokens COVERED by at least one
  * n-gram occurring ≥ 2 times in the document (coverage semantics — no
  * double counting of overlapping duplicate windows), and `total_chars` =
  * Σ token chars. charlen(g) counts gram token chars without separators.
  * Null tokens count as empty strings.
  *
  * One HashMap build over the W windows plus one coverage walk — O(W·n)
  * per row, bounded by document length, no shuffle anywhere. The HOF
  * formulation of the same thing is O(W²) per row (count via
  * filter-per-window), which a 10k-token document turns into 10^8 ops.
  */
case class NgramRepChars(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 2, "n must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_rep_chars expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def repChars(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val toks = new Array[String](len)
    var total = 0L
    var i = 0
    while (i < len) {
      toks(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      total += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    if (len < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0L, 0L, total))
    val counts = new java.util.HashMap[String, Long]()
    val keys = new Array[String](len - n + 1)
    i = 0
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      keys(i) = sb.toString
      counts.merge(keys(i), 1L, java.lang.Long.sum(_, _))
      i += 1
    }
    var top = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      val chars = k.codePointCount(0, k.length) - (n - 1)
      val prod = e.getValue * chars
      if (prod > top) top = prod
    }
    val covered = new Array[Boolean](len)
    i = 0
    while (i + n <= len) {
      if (counts.get(keys(i)) >= 2L) {
        var j = 0
        while (j < n) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var dup = 0L
    i = 0
    while (i < len) {
      if (covered(i)) dup += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(top, dup, total))
  }

  override protected def nullSafeEval(input: Any): Any =
    repChars(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramRepCharsExpr", this, classOf[NgramRepChars].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.repChars($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `m` product-quantization sub-space assignments in ONE pass over the
  * vector: out[j] = the 0-based index of the codeword minimizing
  * round(l2sq(v[j·sub .. j·sub+sub), books(j)(c)), dp), ties toward the
  * lowest index — bit-identical to the
  * `array(round(l2sqNative(slice(v, …), lit(codeword)), dp), …)` +
  * `array_position(_, array_min(_))` chain it replaces (same
  * scala-BigDecimal HALF_UP rounding as Spark's `round`, same
  * truncate-to-shorter l2sq semantics, NaN ordered last like Spark's
  * array_min), but ONE expression tree instead of m×cb fused loops: janino
  * compile cost stops scaling with the codebook (the m=8, cb=16 PQ encode
  * was ~130 generated loops — recompiled per Lloyd iteration during fit),
  * and per row the vector is walked once with zero slice/array allocation.
  *
  * `books` is flat: codeword p of (subspace j, cluster c) at
  * ((j·cb + c)·sub + p). With m=1, cb=k, sub=dim this is exactly the
  * k-means assign step ([[graft.operators.Clustering]]'s recipe).
  */
case class PqCodes(child: Expression, books: Array[Double], m: Int, cb: Int,
    sub: Int, dp: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(books.length == m * cb * sub, "books must be m*cb*sub doubles")

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_codes expects array<float|double>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Spark RoundBase's double path, verbatim (HALF_UP via scala BigDecimal,
    * NaN/Inf passed through) — the determinism contract of the oracles.
    */
  @inline private def rnd(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  def codes(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      // l2sq truncates to the shorter side: elements past the vector end
      // contribute nothing (slice() would have returned a short array)
      val n = math.min(sub, math.max(0, len - off))
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < cb) {
        val boff = (j * cb + c) * sub
        var s = 0.0
        var p = 0
        while (p < n) {
          val d = (if (isDouble) a.getDouble(off + p)
                   else a.getFloat(off + p).toDouble) - books(boff + p)
          s += d * d
          p += 1
        }
        val r = rnd(s)
        // Spark's array_min orders NaN after every number, and
        // array_position takes the FIRST min — so: strictly smaller wins,
        // NaN counts as +∞, equal keeps the earlier index
        if (c == 0 || (!r.isNaN && (bestD.isNaN || r < bestD))) {
          best = c; bestD = r
        }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesExpr", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.codes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query PQ asymmetric-distance table in one pass: out[j][c] =
  * UNROUNDED l2sq(v[j·sub ..), books(j)(c)) — the `m × cb` lookup table a
  * query carries to score candidates by `m` element_at lookups. Same flat
  * `books` layout and truncation semantics as [[PqCodes]].
  */
case class PqAdcTable(child: Expression, books: Array[Double], m: Int, cb: Int,
    sub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(books.length == m * cb * sub, "books must be m*cb*sub doubles")

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_adc_table expects array<float|double>, got $t")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  def table(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val n = math.min(sub, math.max(0, len - off))
      val row = new Array[Any](cb)
      var c = 0
      while (c < cb) {
        val boff = (j * cb + c) * sub
        var s = 0.0
        var p = 0
        while (p < n) {
          val d = (if (isDouble) a.getDouble(off + p)
                   else a.getFloat(off + p).toDouble) - books(boff + p)
          s += d * d
          p += 1
        }
        row(c) = s
        c += 1
      }
      rows(j) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTableExpr", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.table($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NativeExpressions {
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(HammingDistance64(
      org.apache.spark.sql.GraftSqlBridge.exprOf(a), org.apache.spark.sql.GraftSqlBridge.exprOf(b)))

  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(CosineSimilarity(
      org.apache.spark.sql.GraftSqlBridge.exprOf(a), org.apache.spark.sql.GraftSqlBridge.exprOf(b)))

  def charNgramsNative(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(CharNgrams(
      org.apache.spark.sql.GraftSqlBridge.exprOf(text), n))

  def l2sqNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(L2SquaredDistance(
      org.apache.spark.sql.GraftSqlBridge.exprOf(a), org.apache.spark.sql.GraftSqlBridge.exprOf(b)))

  def minhashSigsNative(tids: Column, perms: Seq[(Long, Long)], mod: Long): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(MinHashSigs(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tids),
      perms.map(_._1).toArray, perms.map(_._2).toArray, mod))

  def simhash64Native(hashes: Column, bits: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(SimHash64(
      org.apache.spark.sql.GraftSqlBridge.exprOf(hashes), bits))

  def shingleTidsNative(tokens: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(ShingleTids(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tokens), k))

  /** 64-bit-id variant for span-level dedup, where id collisions would
    * miscount shared windows (see [[ShingleTids]] scaladoc).
    */
  def shingleTids64Native(tokens: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(ShingleTids(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tokens), k, idBytes = 8))

  def multiPatternCountNative(text: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(MultiPatternCount(
      org.apache.spark.sql.GraftSqlBridge.exprOf(text), patterns))

  def nfcNormalizeNative(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(NfcNormalize(
      org.apache.spark.sql.GraftSqlBridge.exprOf(text)))

  def scrubRunsNative(tokens: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(TokenRunScrub(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tokens)))

  def ngramMaxCountNative(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(NgramMaxCount(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tokens), n))

  /** `[top_chars, dup_chars, total_chars]` repetition signals — see
    * [[NgramRepChars]].
    */
  def ngramRepCharsNative(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(NgramRepChars(
      org.apache.spark.sql.GraftSqlBridge.exprOf(tokens), n))

  /** Luhn-validated card masking — see [[LuhnScrub]]. */
  def luhnScrubNative(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.columnOf(LuhnScrub(
      org.apache.spark.sql.GraftSqlBridge.exprOf(text)))

  /** `books`: m subspaces × cb codewords × sub dims (m=1, cb=k, sub=dim for
    * plain k-means assignment).
    */
  def pqCodesNative(v: Column, books: Seq[Array[Array[Double]]], dp: Int): Column = {
    val m = books.size
    val cb = books.head.length
    val sub = books.head.head.length
    org.apache.spark.sql.GraftSqlBridge.columnOf(PqCodes(
      org.apache.spark.sql.GraftSqlBridge.exprOf(v),
      books.flatMap(_.flatMap(_.toSeq)).toArray, m, cb, sub, dp))
  }

  def pqAdcTableNative(v: Column, books: Seq[Array[Array[Double]]]): Column = {
    val m = books.size
    val cb = books.head.length
    val sub = books.head.head.length
    org.apache.spark.sql.GraftSqlBridge.columnOf(PqAdcTable(
      org.apache.spark.sql.GraftSqlBridge.exprOf(v),
      books.flatMap(_.flatMap(_.toSeq)).toArray, m, cb, sub))
  }

  /** SQL registration (reference FunctionRegistry surface). */
  def registerAll(spark: SparkSession): Unit = {
    def intLit(e: Expression, fn: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn expects an integer literal, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", exprs => HammingDistance64(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq", exprs => L2SquaredDistance(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams", exprs => CharNgrams(exprs(0), intLit(exprs(1), "char_ngrams")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "scrub_runs", exprs => TokenRunScrub(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", exprs => NfcNormalize(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_pattern_count", exprs => {
        def strLit(e: Expression): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"multi_pattern_count expects string-literal patterns, got $other")
        }
        MultiPatternCount(exprs.head, exprs.tail.map(strLit))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_max_count",
      exprs => NgramMaxCount(exprs(0), intLit(exprs(1), "ngram_max_count")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_rep_chars",
      exprs => NgramRepChars(exprs(0), intLit(exprs(1), "ngram_rep_chars")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "luhn_scrub", exprs => LuhnScrub(exprs(0)), "built-in")
  }
}
