package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick blocklist matcher — the scale path for
  * [[graft.text.TextAnalysis.blocklistHits]]: ONE pass over each document
  * regardless of list size, where the compiled-alternation form degrades
  * with the alternation's NFA at real blocklist sizes (the C4 badwords
  * list order, 10k–100k phrases). Semantics are EXACTLY the regex form's
  * `(?i)\b(w1|w2|…)\b` over the `words.distinct.sorted` alternation —
  * leftmost start, first-listed boundary-valid alternative at that start,
  * continue past the match — so the two forms are interchangeable and a
  * regex oracle replays this kernel verbatim (pinned by
  * BlocklistAhoSpec's property against `java.util.regex`).
  *
  * Build shape: the automaton (goto trie + BFS-resolved fail links,
  * flattened to a DFA over the 38-symbol folded alphabet a–z 0–9 '-' ' ')
  * is built ONCE per executor per distinct list and interned by spec
  * string — the [[BpeKernel]] pattern — so a 100k-phrase list costs one
  * build per JVM and O(1) per scanned char thereafter. Any char outside
  * the alphabet resets to the root state directly (no entry contains it).
  */
object BlocklistAhoKernel {

  /** Alphabet size: a–z, 0–9, '-', ' '. */
  private val A = 38

  @inline private def sym(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A' // ASCII case fold, same as Java (?i)
    else if (c >= '0' && c <= '9') 26 + (c - '0')
    else if (c == '-') 36
    else if (c == ' ') 37
    else -1

  /** ASCII `\w` — RE2's `\b` word class (the DuckDB oracle's). Java's
    * `\b` is the one divergent spot: it is Unicode-aware even without
    * flags (a CJK letter is a word char to Java), so the regex form
    * through `java.util.regex` and this kernel differ EXACTLY when an
    * entry abuts a non-ASCII letter — there this kernel (like RE2)
    * counts the hit and Java does not. On ASCII-adjacent text the three
    * engines agree (BlocklistAhoSpec pins both the RE2 equivalence and
    * the practical Java parity on corpus text).
    */
  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  final class Automaton(wordsSorted: Array[String]) {
    private val wordLens: Array[Int] = wordsSorted.map(_.length)

    // --- trie over the FOLDED entries (two case variants share a path,
    // both alternation indices land in that node's output) ---
    private val (next, outputs) = {
      val gotoRows = scala.collection.mutable.ArrayBuffer(new Array[Int](A))
      java.util.Arrays.fill(gotoRows(0), -1)
      val outRows = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      var w = 0
      while (w < wordsSorted.length) {
        var s = 0
        val word = wordsSorted(w)
        var i = 0
        while (i < word.length) {
          val c = sym(word.charAt(i))
          if (gotoRows(s)(c) == -1) {
            gotoRows += { val r = new Array[Int](A); java.util.Arrays.fill(r, -1); r }
            outRows += List.empty[Int]
            gotoRows(s)(c) = gotoRows.length - 1
          }
          s = gotoRows(s)(c)
          i += 1
        }
        outRows(s) = w :: outRows(s)
        w += 1
      }
      // --- BFS: fail links; resolve goto to a total DFA; merge each
      // node's output with its fail chain's (so one state lookup yields
      // every entry ending here, via any suffix) ---
      val n = gotoRows.length
      val fail = new Array[Int](n)
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < A) {
        val t = gotoRows(0)(c)
        if (t == -1) gotoRows(0)(c) = 0
        else { fail(t) = 0; queue.add(t) }
        c += 1
      }
      val mergedOut = new Array[Array[Long]](n)
      // packed output: (len << 32) | altIdx — altIdx order preserved by a
      // sort at pack time, so the scan's same-start tie-break is a linear
      // walk of an already-alternation-ordered list
      mergedOut(0) = outRows(0).sorted.map(i => (wordLens(i).toLong << 32) | i.toLong).toArray
      while (!queue.isEmpty) {
        val s = queue.poll()
        val own = outRows(s).map(i => (wordLens(i).toLong << 32) | i.toLong)
        val inherited = mergedOut(fail(s))
        mergedOut(s) = (own ++ inherited).sortBy(_.toInt).toArray
        var c2 = 0
        while (c2 < A) {
          val t = gotoRows(s)(c2)
          if (t == -1) gotoRows(s)(c2) = gotoRows(fail(s))(c2)
          else { fail(t) = gotoRows(fail(s))(c2); queue.add(t) }
          c2 += 1
        }
      }
      (gotoRows.toArray, mergedOut)
    }

    /** Hit count with the regex form's exact semantics: collect every
      * boundary-valid occurrence, then sweep leftmost-first taking the
      * smallest-alternation-index entry at each admissible start and
      * jumping past it. Same-start boundary-valid entries form a prefix
      * chain, so the hit list stays linear in real text; the sweep sort
      * touches hits only (documents rarely hit a blocklist at all).
      */
    def count(text: String): Long = {
      val n = text.length
      var hits: Array[Long] = null
      var nHits = 0
      var state = 0
      var i = 0
      while (i < n) {
        val c = sym(text.charAt(i))
        state = if (c < 0) 0 else next(state)(c)
        val os = outputs(state)
        var j = 0
        while (j < os.length) {
          val len = (os(j) >>> 32).toInt
          val start = i + 1 - len
          if ((start == 0 || !isWord(text.charAt(start - 1))) &&
              (i + 1 == n || !isWord(text.charAt(i + 1)))) {
            if (hits == null) hits = new Array[Long](8)
            else if (nHits == hits.length) hits = java.util.Arrays.copyOf(hits, nHits * 2)
            hits(nHits) = (start.toLong << 32) | (os(j) & 0xffffffffL)
            nHits += 1
          }
          j += 1
        }
        i += 1
      }
      if (nHits == 0) return 0L
      java.util.Arrays.sort(hits, 0, nHits)
      var pos = 0
      var cnt = 0L
      var k = 0
      while (k < nHits) {
        val start = (hits(k) >>> 32).toInt
        if (start >= pos) {
          cnt += 1
          pos = start + wordLens(hits(k).toInt)
        }
        k += 1
      }
      cnt
    }
  }

  // ------------------------- per-JVM interning (the BpeKernel pattern)
  private val automatons =
    new java.util.concurrent.ConcurrentHashMap[String, Automaton]()
  // Per-THREAD memo, not a shared slot: each task deserializes its own
  // String instance of the spec, so a shared slot thrashes between
  // concurrent tasks and every miss pays a full spec-length `equals`
  // inside the map probe — at a 100k-entry (≈1 MB) spec that memcmp
  // dominated the scan itself. One task per thread makes a ThreadLocal
  // hit by reference equality on every row after the task's first.
  private val lastResolved =
    new ThreadLocal[(String, Automaton)]()

  /** Spec = the sorted distinct entries, newline-joined (entries cannot
    * contain '\n' by validation).
    */
  def encode(words: Seq[String]): String =
    graft.text.TextAnalysis.blocklistValidated(words).mkString("\n")

  private def automaton(spec: String): Automaton = {
    val l = lastResolved.get()
    if (l != null && (l._1 eq spec)) l._2
    else {
      val a = automatons.computeIfAbsent(spec,
        s => new Automaton(s.split("\n", -1)))
      lastResolved.set((spec, a))
      a
    }
  }

  def count(text: UTF8String, spec: String): Long =
    automaton(spec).count(text.toString)
}

/** text → blocklist hit count (`long`) via the interned Aho–Corasick
  * automaton — drop-in for the regex form of
  * [[graft.text.TextAnalysis.blocklistHits]] with identical counts; use
  * this one when the list is big (the automaton costs O(total entry
  * chars) once per executor; the scan is O(text) independent of list
  * size).
  */
object BlocklistHitsAho {
  def apply(child: Expression, words: Seq[String]): BlocklistHitsAho =
    new BlocklistHitsAho(child, BlocklistAhoKernel.encode(words))
}

/** The case-class field is the encoded SPEC, not the entry Seq: Catalyst
  * hashes and compares expression trees repeatedly during optimization,
  * and a String's hashCode is computed once and cached — a 100k-element
  * Seq[String] field would be re-hashed on every plan transform.
  * Construct via the companion `apply(child, words)`.
  */
case class BlocklistHitsAho(child: Expression, spec: String)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blocklist_hits_aho"

  override def nullSafeEval(a: Any): Any =
    BlocklistAhoKernel.count(a.asInstanceOf[UTF8String], spec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("blocklistSpec", spec, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BlocklistAhoKernel.count($a, $specRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
