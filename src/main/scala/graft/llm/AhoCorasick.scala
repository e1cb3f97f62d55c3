package graft.llm

import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho-Corasick multi-pattern substring automaton over UTF-8 BYTES — the
 * blocklist/safety-filter kernel (cf. impact filtering in the reference's
 * curation stages; the published construction is Aho & Corasick, CACM 1975).
 *
 * Why a native automaton and not K `contains()` calls: a curation blocklist
 * is hundreds-to-thousands of phrases, and K separate contains scans read
 * every document K times. The automaton reads each document ONCE regardless
 * of pattern count — the only blocklist shape that survives 100 TB. Built
 * once per query plan and shipped to executors inside the generated code's
 * reference array (`ctx.addReferenceObj`), so the per-row cost is just the
 * byte walk.
 *
 * Memory: dense 256-way goto table, nodes ≤ total pattern bytes + 1 —
 * ~1 MB per 1k short phrases; fine for the blocklists this models (switch
 * to hash transitions before shipping 100k+ patterns).
 *
 * Matching is on raw bytes: callers lowercase/normalize the text column
 * (and the patterns) first if they want case-insensitive semantics.
 */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick: empty pattern list")
  patterns.foreach(p => require(p != null && p.nonEmpty,
    "AhoCorasick: null/empty pattern"))

  private val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray
  val numPatterns: Int = patBytes.length

  // Trie with dense byte transitions; out(node) = MIN pattern index whose
  // match ends at this node (via suffix links), or -1. hits(node) = all
  // pattern indices ending here (own + suffix-inherited), for distinct
  // counting.
  private val (goto_, out, hits) = {
    val maxNodes = patBytes.map(_.length).sum + 1
    val g = Array.fill(maxNodes)(null: Array[Int])
    var nNodes = 0
    def node(): Int = { g(nNodes) = Array.fill(256)(-1); nNodes += 1; nNodes - 1 }
    node() // root = 0
    val endsAt = Array.fill(maxNodes)(-1) // pattern index ending exactly here
    patBytes.zipWithIndex.foreach { case (p, pi) =>
      var cur = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xFF
        if (g(cur)(b) == -1) g(cur)(b) = node()
        cur = g(cur)(b)
        i += 1
      }
      // duplicate patterns: keep the SMALLEST index (first-match-by-order)
      if (endsAt(cur) == -1 || pi < endsAt(cur)) endsAt(cur) = pi
    }
    // BFS: failure links folded directly into the goto table (the classic
    // "next" automaton), plus per-node match sets
    val fail = Array.fill(nNodes)(0)
    val outMin = Array.fill(nNodes)(-1)
    val hitList = Array.fill(nNodes)(List.empty[Int])
    val queue = scala.collection.mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      val nxt = g(0)(b)
      if (nxt == -1) g(0)(b) = 0
      else { fail(nxt) = 0; queue += nxt }
      b += 1
    }
    def ownHits(n: Int): List[Int] =
      if (endsAt(n) >= 0) List(endsAt(n)) else Nil
    // root's own matches
    outMin(0) = endsAt(0)
    hitList(0) = ownHits(0)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      val inherited = hitList(fail(u))
      hitList(u) = ownHits(u) ::: inherited
      outMin(u) = hitList(u).foldLeft(-1)((m, x) =>
        if (m == -1 || x < m) x else m)
      var c = 0
      while (c < 256) {
        val v = g(u)(c)
        if (v == -1) g(u)(c) = g(fail(u))(c)
        else { fail(v) = g(fail(u))(c); queue += v }
        c += 1
      }
    }
    (g.take(nNodes), outMin, hitList.map(_.toArray))
  }

  /** Index (pattern order) of the FIRST-priority pattern occurring anywhere
    * in `s`, or -1 if none — "first" is list position, not text position,
    * matching the `CASE WHEN contains(p1) ... WHEN contains(pK)` contract.
    * One pass; early exit once pattern 0 is seen. */
  def firstMatch(s: UTF8String): Int = {
    val n = s.numBytes()
    var st = 0
    var best = -1
    var i = 0
    while (i < n) {
      st = goto_(st)(s.getByte(i) & 0xFF)
      val o = out(st)
      if (o >= 0 && (best == -1 || o < best)) {
        if (o == 0) return 0
        best = o
      }
      i += 1
    }
    best
  }

  /** Number of DISTINCT patterns occurring in `s` (Σ over patterns of
    * `contains(s, p)` — duplicates of one pattern count once). One pass. */
  def matchedCount(s: UTF8String): Int = {
    val n = s.numBytes()
    val seen = new Array[Boolean](numPatterns)
    var found = 0
    var st = 0
    var i = 0
    while (i < n && found < numPatterns) {
      st = goto_(st)(s.getByte(i) & 0xFF)
      val hs = hits(st)
      var j = 0
      while (j < hs.length) {
        val p = hs(j)
        if (!seen(p)) { seen(p) = true; found += 1 }
        j += 1
      }
      i += 1
    }
    found
  }
}
