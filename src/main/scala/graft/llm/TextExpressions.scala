package graft.llm

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * JVM kernels for the native text expressions: static-shaped methods the
 * generated Java calls directly (`TextKernels$.MODULE$...`), so the work
 * stays INSIDE whole-stage codegen — no UDF serialization boundary, no
 * InternalRow→Row conversion, no closure dispatch per row.
 */
object TextKernels {

  /** Java-regex `\s` (ASCII) — deliberately narrower than
    * Character.isWhitespace so byte-level counting matches `split("\\s+")`
    * semantics exactly. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /**
   * Count of whitespace-separated tokens, scanned over the raw UTF-8 BYTES
   * (ASCII whitespace never occurs inside a multi-byte UTF-8 sequence, so no
   * decode is needed). Matches `size(split(trim(lower(text)), "\\s+"))`
   * bit-for-bit: Spark's `trim` strips SPACES only, and `split` (limit −1)
   * keeps leading/trailing empty fields, so the field count is exactly
   * (number of maximal `\s+` runs in the space-trimmed string) + 1 — e.g.
   * "" → 1, "\t\n" → 2, "a b" → 2.
   */
  def wsTokenCount(s: UTF8String): Int = {
    var start = 0
    var end = s.numBytes
    while (start < end && s.getByte(start) == ' ') start += 1
    while (end > start && s.getByte(end - 1) == ' ') end -= 1
    var runs = 0
    var inWs = false
    var i = start
    while (i < end) {
      val ws = isWs(s.getByte(i))
      if (ws && !inWs) { runs += 1; inWs = true }
      else if (!ws) inWs = false
      i += 1
    }
    runs + 1
  }

  /**
   * Corpus text normalization — the canonical cleaning pipeline NFC →
   * strip accents → lowercase → collapse whitespace, byte-compatible with
   * DuckDB's `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))),
   * '\s+', ' ', 'g'))` on Latin-script text (the d51 oracle pins it):
   * accents strip as NFD + drop NON_SPACING_MARK + NFC recompose, case
   * folds via Locale.ROOT, and the whitespace class is spelled EXPLICITLY
   * as RE2's `\s` = `[\t\n\f\r ]` — Java's `\s` additionally matches
   * U+000B (vertical tab), which would make text containing `\x0B`
   * normalize differently on the two sides of the oracle; the final trim
   * strips SPACES only (DuckDB `trim` default), not Java trim's ≤U+0020
   * class, for the same reason. One String round-trip per row
   * (java.text.Normalizer needs a String); still inside codegen — no UDF
   * boundary.
   */
  def normalizeText(s: UTF8String): UTF8String = {
    import java.text.Normalizer
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    val stripped = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    val lower = stripped.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(
      lower.replaceAll("[ \\t\\n\\f\\r]+", " ").replaceAll("^ +| +$", ""))
  }

  /**
   * Jaro-Winkler similarity, compatible with DuckDB's
   * `jaro_winkler_similarity` ON ASCII TEXT (the d55 oracle pins it;
   * DuckDB walks UTF-8 BYTES while this kernel walks UTF-16 chars, so
   * multi-byte codepoints diverge — same caveat class as normalizeText's
   * Latin-script qualifier): bounded-window
   * Jaro matches (window = max(|a|,|b|)/2 − 1, floor), half-counted
   * transpositions, 0.0 when either string is empty or no chars match,
   * and the Winkler prefix boost (≤4 chars, scale 0.1) applied ONLY when
   * jaro > 0.7 — the classic boost threshold, which DuckDB also gates on
   * (probed: 'aXXXX'/'aYYYY' keeps its raw 0.4667). Char-level over the
   * decoded string; O(|a|·window) scan, no allocation beyond two flag
   * arrays.
   */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && s.charAt(i) == t.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // FLOOR of the half-count (integer division), not trans/2.0: DuckDB's
    // implementation (RapidFuzz lineage) floors, and an odd raw
    // transposition count diverges by 1/(6m) otherwise — found by the d55
    // gate on real corpus pairs
    val tHalf = trans / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - tHalf).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** 64-bit SimHash over lowercased whitespace tokens — per-bit sign-sum of
    * per-token avalanche hashes. SIGNATURE DEFINITION (v2, differs from the
    * pre-round-4 UDF — re-derive any persisted simhash values): tokens are
    * separated by Character.isWhitespace (Unicode), lowercasing is per-char,
    * and empty/whitespace-only text yields 0L (no tokens). */
  def simhash64(s: UTF8String): Long = {
    val text = s.toString.toLowerCase
    val counts = new Array[Int](64)
    val len = text.length
    var i = 0
    while (i < len) {
      // skip whitespace, then hash the token run directly (no split array)
      while (i < len && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < len) {
        var h = graft.util.Hashing.FnvOffset
        while (i < len && !Character.isWhitespace(text.charAt(i))) {
          h ^= text.charAt(i); h *= graft.util.Hashing.FnvPrime; i += 1
        }
        val mixed = graft.util.Hashing.mix64(h)
        var b = 0
        while (b < 64) {
          if (((mixed >>> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
   * SIGMOD'03 — the MOSS algorithm): over an already-NORMALIZED string
   * (caller strips to `[a-z0-9]` — the kernel assumes single-byte code
   * points), hash every `k`-gram with the engine-portable polynomial fold
   * `a ← (a·31 + codepoint) mod (2³¹−1)`, seed 42, then from every window
   * of `w` consecutive gram hashes keep the minimum — ties broken toward
   * the RIGHTMOST position, the classic winnowing rule, which here falls
   * out of the key encoding `h·2²¹ + (2²⁰ − pos)` for free (larger pos →
   * smaller key). Guarantee: any shared substring of length ≥ w+k−1 yields
   * at least one shared fingerprint; density ≈ 2/(w+1).
   *
   * Returns the DISTINCT selected keys, ascending; decode with
   * `h = key >> 21`, `pos = 2²⁰ − (key & (2²¹−1))` (1-based). Every
   * intermediate stays < 2⁵² — no overflow under ANSI mode, and DuckDB
   * recomputes the identical keys from `ord`/`list_reduce` primitives.
   */
  def winnowKeys(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val g = n - k + 1
    if (g < w) return new GenericArrayData(Array.empty[Long])
    val M = 2147483647L
    val keys = new Array[Long](g)
    var i = 0
    while (i < g) {
      var a = 42L
      var j = 0
      while (j < k) { a = (a * 31L + str.charAt(i + j)) % M; j += 1 }
      keys(i) = a * 2097152L + (1048576L - (i + 1))
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var e = w - 1
    while (e < g) {
      var m = keys(e - w + 1)
      var j = e - w + 2
      while (j <= e) { if (keys(j) < m) m = keys(j); j += 1 }
      sel.add(m)
      e += 1
    }
    val out = new Array[Long](sel.size)
    var idx = 0
    val it = sel.iterator()
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }
}

/**
 * Native Catalyst text expressions WITH `doGenCode` (§2.9): unlike the geo
 * family (CodegenFallback is right there — the work is inside JTS either
 * way), these are leaf-level scans over the string payload where staying in
 * generated code eliminates the per-row UDF boundary entirely. Registered as
 * `ws_token_count` / `simhash64` next to the ST_ family.
 */
object TextExpressions {

  private val kernel = "graft.llm.TextKernels$.MODULE$"

  case class WsTokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(s: Any): Any =
      TextKernels.wsTokenCount(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernel.wsTokenCount($c)")
    override protected def withNewChildInternal(c: Expression): WsTokenCount = copy(c)
    override def prettyName: String = "ws_token_count"
  }

  case class JaroWinkler(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$kernel.jaroWinkler($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
      copy(left = l, right = r)
    override def prettyName: String = "jaro_winkler"
  }

  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override protected def nullSafeEval(s: Any): Any =
      TextKernels.normalizeText(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernel.normalizeText($c)")
    override protected def withNewChildInternal(c: Expression): NormalizeText = copy(c)
    override def prettyName: String = "normalize_text"
  }

  case class Simhash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(s: Any): Any =
      TextKernels.simhash64(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernel.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): Simhash64 = copy(c)
    override def prettyName: String = "simhash64"
  }

  /** Winnowing fingerprint keys (see [[TextKernels.winnowKeys]]); `k` and
    * `w` must be foldable int literals — they are baked into the generated
    * code. */
  case class WinnowKeys(child: Expression, k: Int, w: Int) extends UnaryExpression {
    require(k >= 1 && w >= 1, s"winnow_keys: k=$k w=$w must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(s: Any): Any =
      TextKernels.winnowKeys(s.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$kernel.winnowKeys($c, $k, $w)")
    override protected def withNewChildInternal(c: Expression): WinnowKeys = copy(child = c)
    override def prettyName: String = "winnow_keys"
  }

  /** First-priority blocklist hit via a shared [[AhoCorasick]] automaton —
    * index into `patterns` (list order = priority) or -1 for clean. The
    * automaton is built ONCE per plan and embedded in the generated code as
    * a reference object, so every row costs one byte walk regardless of
    * pattern count — K separate `contains()` scans read the text K times. */
  case class AhoFirstMatch(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    @transient private lazy val ac = new AhoCorasick(patterns)
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(s: Any): Any =
      ac.firstMatch(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ahoAutomaton", ac, "graft.llm.AhoCorasick")
      defineCodeGen(ctx, ev, c => s"$ref.firstMatch($c)")
    }
    override protected def withNewChildInternal(c: Expression): AhoFirstMatch =
      copy(child = c)
    override def prettyName: String = "aho_first"
  }

  /** Count of DISTINCT blocklist patterns present (Σ contains(text, p)) in
    * one automaton pass — see [[AhoFirstMatch]]. */
  case class AhoMatchCount(child: Expression, patterns: Seq[String])
      extends UnaryExpression {
    @transient private lazy val ac = new AhoCorasick(patterns)
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(s: Any): Any =
      ac.matchedCount(s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ahoAutomaton", ac, "graft.llm.AhoCorasick")
      defineCodeGen(ctx, ev, c => s"$ref.matchedCount($c)")
    }
    override protected def withNewChildInternal(c: Expression): AhoMatchCount =
      copy(child = c)
    override def prettyName: String = "aho_count"
  }

  private def foldableStringArray(e: Expression, name: String): Seq[String] = {
    require(e.foldable, s"$name must be a literal array of strings")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map(i =>
          a.getUTF8String(i) match {
            case null => null
            case u    => u.toString
          })
      case other =>
        throw new IllegalArgumentException(s"$name: expected array<string>, got $other")
    }
  }

  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"$name: expected int, got $other")
    }
  }

  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ws_token_count" -> (es => WsTokenCount(es.head)),
    "normalize_text" -> (es => NormalizeText(es.head)),
    "jaro_winkler" -> (es => JaroWinkler(es.head, es(1))),
    "simhash64" -> (es => Simhash64(es.head)),
    "winnow_keys" -> (es => WinnowKeys(es.head,
      foldableInt(es(1), "winnow_keys k"), foldableInt(es(2), "winnow_keys w"))),
    "aho_first" -> (es => AhoFirstMatch(es.head,
      foldableStringArray(es(1), "aho_first patterns"))),
    "aho_count" -> (es => AhoMatchCount(es.head,
      foldableStringArray(es(1), "aho_count patterns"))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Best-effort self-registration so the Column helpers work without the
    * caller invoking ensureRegistered: temp-function registrations do NOT
    * propagate to `newSession()` clones, so every DataFrame-taking operator
    * registers on ITS OWN session and the Column-only helpers register on
    * the active one. */
  private[llm] def ensureOn(df: org.apache.spark.sql.DataFrame): Unit =
    register(df.sparkSession)

  private[llm] def ensureActive(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
}
