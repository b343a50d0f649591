package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Production BPE replay encoder (round-15 verdict #1): encode ONE
  * word under a trained ranked merge list as a single row-local
  * expression, where [[graft.batch.TextOps.bpeApplyChained]] builds
  * `nMerges` chained Catalyst `aggregate()` folds — correct and
  * spec-pinned at fixture counts, but a 32k-merge model would be a
  * 32k-node expression chain the analyzer and codegen cannot survive.
  *
  * Semantics are EXACTLY the chained form's (BpeSpec pins the
  * equivalence word-for-word): replay the merges in RANK ORDER, one
  * canonical left-to-right non-overlapping pass per merge — the
  * trainer's own evolution, so every trained word reproduces its
  * final-vocabulary encoding and unseen words get the deterministic
  * encoding the same trainer state implies. The cost trick every
  * tokenizer runtime uses: a pass at rank r only runs when pair r is
  * actually PRESENT in the word, so per-word cost is bounded by the
  * word's own merge activity (O(len·applications) worst case), never
  * by the model's merge count. Candidate ranks ride a small int-heap
  * seeded from the word's adjacent pairs; a pass that applies enqueues
  * the pairs it creates; ranks at or below the already-replayed floor
  * are DISCARDED at pop — sequential replay never revisits a rank
  * (the one place naive min-rank greedy can diverge from the trainer:
  * a later merge re-creating an earlier merge's pair must NOT fire
  * it).
  *
  * The ranked list is plan state (serialized with the expression,
  * shipped once per task like a broadcast literal); codegen embeds the
  * expression itself via `addReferenceObj`, so the encoder stays
  * inside whole-stage codegen.
  */
case class BpeEncodeExpr(child: Expression,
    merges: Seq[(Int, String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string word, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  /** End-of-word marker — the trainer's ([[graft.batch.TextOps]]). */
  private val EndOfWord = "</w>"

  // pair-key separator: NUL cannot appear in a symbol
  @transient private lazy val Sep: String = String.valueOf(0.toChar)

  // rank-ordered (lhs, rhs, lhs+rhs); ranks need not be contiguous —
  // replay order is the sorted step order, same as the chained form's
  @transient private lazy val ranked: Array[(String, String, String)] =
    merges.sortBy(_._1).map { case (_, l, r) => (l, r, l + r) }.toArray

  // (lhs NUL rhs) -> index into `ranked`; NUL cannot appear in a
  // symbol (symbols are concatenations of word characters + "</w>")
  @transient private lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](ranked.length * 2)
    var i = 0
    while (i < ranked.length) {
      // first (lowest-rank) producer wins a duplicate (l, r) pair — a
      // trained list never holds one (a merged pair count drops to 0),
      // but the replay must stay deterministic under any input
      m.putIfAbsent(ranked(i)._1 + Sep + ranked(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** The row-local replay. Public so generated code can call it via
    * the expression reference object. */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    // split by code point — the chained form's substring(w, i, 1)
    // counts characters the same way
    var syms = new Array[String](s.codePointCount(0, s.length) + 1)
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      ci += Character.charCount(cp)
    }
    syms(n) = EndOfWord
    n += 1
    if (ranked.length > 0 && n >= 2) {
      // min-heap of candidate rank indices (plain ints — no boxing)
      var heap = new Array[Int](math.max(16, n))
      var hn = 0
      def push(v: Int): Unit = {
        if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
        var i = hn; heap(i) = v; hn += 1
        while (i > 0 && heap((i - 1) / 2) > heap(i)) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t; i = p
        }
      }
      def pop(): Int = {
        val top = heap(0); hn -= 1; heap(0) = heap(hn)
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var m = i
          if (l < hn && heap(l) < heap(m)) m = l
          if (r < hn && heap(r) < heap(m)) m = r
          if (m == i) done = true
          else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
        }
        top
      }
      var floor = -1
      // pair (syms(i), syms(i+1)) → queue, iff it has a still-firable
      // rank; ranks at or below the replay floor can never fire — not
      // queueing them (rather than only discarding at pop) bounds heap
      // growth on pathological single tokens (base64 blobs etc.)
      def maybePush(i: Int): Unit = {
        val rk = rankOf.get(syms(i) + Sep + syms(i + 1))
        if ((rk ne null) && rk.intValue() > floor) push(rk.intValue())
      }
      var i0 = 0
      while (i0 + 1 < n) { maybePush(i0); i0 += 1 } // seed: every pair once
      var touched = new Array[Int](16)
      while (hn > 0) {
        val rk = pop()
        if (rk > floor) { // sequential replay: a rank already passed
          floor = rk      // (or re-created by a later merge) never fires
          val (l, r, lr) = ranked(rk)
          // one left-to-right non-overlapping pass, in place, recording
          // the write positions where a merge landed
          var i = 0
          var w = 0
          var tn = 0
          while (i < n) {
            if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
              syms(w) = lr
              if (tn == touched.length) touched = java.util.Arrays.copyOf(touched, tn * 2)
              touched(tn) = w; tn += 1
              i += 2
            } else { syms(w) = syms(i); i += 1 }
            w += 1
          }
          n = w
          // re-seed ONLY pairs adjacent to merge sites: a new adjacency
          // always involves the new `lr` symbol (a merge replaces two
          // symbols with one — its neighbors become adjacent to IT,
          // never to each other), and every other surviving pair was
          // already queued when it appeared. A full-word rescan here
          // made heap work O(applications × pairs) (round-16 review).
          var t = 0
          while (t < tn) {
            val pos = touched(t)
            if (pos > 0) maybePush(pos - 1)
            if (pos + 1 < n) maybePush(pos)
            t += 1
          }
        }
      }
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
