package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE trainer's semantics INDEPENDENTLY of its oracle: the
  * unrolled-SQL oracle is the same algorithm restated, so a shared logic
  * bug keeps the hash gate green (review finding, r11: the greedy
  * island/parity apply silently dropped the third symbol of an
  * overlapping run from round 2 onward, because surviving positions were
  * never renumbered — both engines agreed on the wrong answer). Hand-built
  * corpora with known merge tables catch that class.
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("greedy apply keeps the third symbol of an overlapping run (round-2 renumber regression)") {
    import spark.implicits._
    // "hahaha": round 1 merges (h,a) → [ha,ha,ha]; round 2 must produce
    // [haha, ha] — greedy left-to-right non-overlapping — NOT [haha].
    // Without position renumbering the two overlapping (ha,ha) candidates
    // land in separate islands, both "merge", and the third symbol is
    // consumed twice: the trainer then finds no round-3 pair and the
    // corpus loses 20 characters.
    val wf = Seq(("hahaha", 10L)).toDF("w", "f")
    val (merges, syms0, symsF, n) = graft.ops.TextQueries2.bpeTrainFromWf(wf)
    val ms = merges.map(_.collect().head)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(ms === Vector(("h", "a", 30L), ("ha", "ha", 20L),
      ("haha", "ha", 10L)), s"merge table: $ms")
    assert(n === 3L)
    // character conservation: Σ f·len(sym) is invariant under merging
    val chars0 = syms0.agg(sum(length(col("sym")) * col("f")))
      .first().getLong(0)
    val charsF = symsF.agg(sum(length(col("sym")) * col("f")))
      .first().getLong(0)
    assert(chars0 === 60L && charsF === 60L,
      s"chars not conserved: $chars0 -> $charsF")
    assert(symsF.count() === 1L) // fully merged into one token
  }

  test("trainer stops when the top frequency decays below a quarter of the first merge's") {
    import spark.implicits._
    // f1 = 100 from (a,b); the only remaining pair (c,d) has freq 10 and
    // 10·4 < 100, so it must NOT merge and must NOT appear in the table
    val wf = Seq(("ab", 100L), ("cd", 10L)).toDF("w", "f")
    val (merges, _, symsF, n) = graft.ops.TextQueries2.bpeTrainFromWf(wf)
    assert(n === 1L, s"expected exactly one merge, got $n")
    val m = merges.head.collect().head
    assert((m.getString(0), m.getString(1), m.getLong(2)) === ("a", "b", 100L))
    // cd stayed unmerged: its two symbols survive
    assert(symsF.filter(col("w") === "cd").count() === 2L)
  }

  test("alphabet-exhausted corpus yields an empty merge table, not a crash") {
    import spark.implicits._
    // length-1 words (the only pairless kind) are pre-filtered by the
    // word-frequency block, so an empty wf models the degenerate
    // all-digits/punctuation corpus
    val wf = Seq.empty[(String, Long)].toDF("w", "f")
    val (merges, _, _, n) = graft.ops.TextQueries2.bpeTrainFromWf(wf)
    assert(merges.isEmpty && n === 0L)
  }
}
