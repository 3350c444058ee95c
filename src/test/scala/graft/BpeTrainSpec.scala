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

  test("segmentation: overlapping-run corpus collapses to one token") {
    import spark.implicits._
    // the r11 regression corpus: a broken renumber would leave "hahaha"
    // segmented as haha|ha-with-a-lost-symbol (20 chars vanish); the
    // correct trainer fully merges it in 3 rounds
    val wf = Seq(("hahaha", 10L)).toDF("w", "f")
    val (_, _, symsF, _) = graft.ops.TextQueries2.bpeTrainFromWf(wf)
    val seg = graft.ops.TextQueries2.bpeSegments(symsF).collect()
    assert(seg.length === 1)
    val r = seg.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)) ===
      ("hahaha", 10L, 1L, "hahaha"))
  }

  test("segmentation: early-stopped trainer leaves rare words multi-token") {
    import spark.implicits._
    // f1 = 200 from (a,b); (ab,ab) at 100 clears 100*4 >= 200 and merges;
    // (c,d) at 10 fails 10*4 < 200 — so "cd" must stay TWO tokens while
    // "abab" collapses to one: the seg output must reflect the STOP, not
    // the guard depth
    val wf = Seq(("abab", 100L), ("cd", 10L)).toDF("w", "f")
    val (merges, _, symsF, n) = graft.ops.TextQueries2.bpeTrainFromWf(wf)
    assert(n === 2L, s"expected 2 merges, got $n: " +
      merges.map(_.collect().head).mkString(","))
    val seg = graft.ops.TextQueries2.bpeSegments(symsF).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(seg("abab") === ((1L, "abab")))
    assert(seg("cd") === ((2L, "c|d")))
  }

  test("memo eviction frees the trainer's localCheckpoint blocks") {
    import spark.implicits._
    val sc = spark.sparkContext
    // private fixture dir: suites share the session-wide memo in parallel,
    // so this test must only ever evict its OWN entry
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-evict")
    try {
      Seq("hahaha hahaha", "haha banana").toDF("text").coalesce(1)
        .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
      val (merges, syms0, symsF, n) =
        graft.ops.TextQueries2.bpeTrainState(spark, dir.toString)
      assert(n > 0L)
      val ids = (merges :+ syms0 :+ symsF)
        .flatMap(org.apache.spark.sql.GraftSqlBridge.localCheckpointRddId(_))
      assert(ids.nonEmpty, "no checkpointed frames behind the memo entry?")
      assert(ids.forall(sc.getPersistentRDDs.contains),
        "memoized frames should be block-manager persisted")
      graft.ops.TextQueries2.bpeMemoEvict(dir.toString)
      val leaked = ids.filter(sc.getPersistentRDDs.contains)
      assert(leaked.isEmpty,
        s"eviction left checkpoint blocks pinned: rdd ids $leaked")
    } finally graft.Tables.deleteTree(dir.toString)
  }

  test("memo key carries the fixture mtime: in-JVM regeneration retrains") {
    import spark.implicits._
    // fake fixture dir: the memo used to key on (session, dir) alone, so
    // regenerating a fixture in place served the STALE trainer state
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-stale")
    try {
      val docs = dir.resolve("documents.parquet").toString
      Seq("hahaha hahaha").toDF("text")
        .coalesce(1).write.mode("overwrite").parquet(docs)
      val (m1, _, _, _) = graft.ops.TextQueries2.bpeTrainState(spark, dir.toString)
      val first1 = m1.head.collect().head
      assert((first1.getString(0), first1.getString(1)) === ("h", "a"))
      // regenerate IN PLACE with different text and a strictly newer mtime
      Seq("xyxyxy xyxyxy").toDF("text")
        .coalesce(1).write.mode("overwrite").parquet(docs)
      val bump = System.currentTimeMillis() + 5000L
      new java.io.File(docs).listFiles().foreach(_.setLastModified(bump))
      val (m2, _, _, _) = graft.ops.TextQueries2.bpeTrainState(spark, dir.toString)
      val first2 = m2.head.collect().head
      assert((first2.getString(0), first2.getString(1)) === ("x", "y"),
        s"stale memo served: got (${first2.getString(0)},${first2.getString(1)})")
    } finally {
      graft.ops.TextQueries2.bpeMemoEvict(dir.toString)
      graft.Tables.deleteTree(dir.toString)
    }
  }
}
