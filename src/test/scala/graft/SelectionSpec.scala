package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the r16 selection operators that the registry-wide smoke
  * test and the oracle hash-compare cannot express directly:
  *
  *  - `pipeline_split_leakfree`: NO near-dup edge straddles a split — for
  *    every verified Jaccard pair (a, b) in the graph the query derives its
  *    clusters from, split(a) == split(b). The oracle pins the aggregate
  *    counts; this pins the contract the operator exists for, recomputed
  *    from the pair graph independently of the CC labels.
  *  - `sample_token_budget`: the admitted set never exceeds any language's
  *    budget AND is prefix-maximal — recomputed with a single driver-side
  *    fold over the (h, doc_id)-sorted corpus (the semantics the two-phase
  *    bucket plan must be value-identical to).
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pipeline_split_leakfree: no near-dup edge straddles a split") {
    val labels = ops.TextQueries2.componentLabels(spark, sfDir)
    // the same assignment rule as the query: hash the cluster root
    def bucket(id: Long): Long = java.lang.Math.floorMod(
      id * 2654435761L, 4294967296L) % 10
    def splitOf(root: Long): String =
      if (bucket(root) < 8) "train" else if (bucket(root) == 8) "val" else "test"
    val rootOf = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge of the pair graph the labels were built from
    val pairs = ops.TextQueries.dedupJaccardTokens.fn(spark, sfDir)
      .select(col("a_id"), col("b_id")).collect()
    assert(pairs.nonEmpty, "fixture lost its near-dup pairs")
    for (p <- pairs) {
      val (a, b) = (p.getLong(0), p.getLong(1))
      val (sa, sb) = (splitOf(rootOf(a)), splitOf(rootOf(b)))
      assert(sa === sb, s"near-dup pair ($a, $b) straddles splits $sa/$sb")
    }
    // and the naive doc-id split DOES straddle at least one edge on this
    // fixture — otherwise the operator guards nothing here
    val naiveStraddles = pairs.exists { p =>
      splitOf(p.getLong(0)) != splitOf(p.getLong(1))
    }
    assert(naiveStraddles,
      "fixture has no naive-split contamination; n_moved would be vacuous")
  }

  test("sample_token_budget: budgets hold and the admitted set is prefix-maximal") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def h(id: Long): Long = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    // 12000 * w_bp div 10000 for w_bp = 4000/2000/1500/1500/else 1000
    val budgetOf: Map[String, Long] = Map("en" -> 4800L, "zh" -> 2400L,
      "es" -> 1800L, "de" -> 1800L).withDefaultValue(1200L)
    // reference fold: per lang, admit in (h, doc_id) order while the
    // running token total fits
    val want = docs.groupBy(_._2).map { case (lang, ds) =>
      val ordered = ds.sortBy(d => (h(d._1), d._1))
      var cum = 0L
      var admitted = 0L
      var tok = 0L
      for ((_, _, n) <- ordered) {
        cum += n
        if (cum <= budgetOf(lang)) { admitted += 1; tok += n }
      }
      assert(tok <= budgetOf(lang), s"$lang reference fold exceeds budget")
      lang -> ((admitted, tok))
    }
    val got = ops.PipelineQueries.sampleTokenBudget.fn(spark, sfDir)
      .select(col("lang"), col("n_admitted"), col("tok_admitted"),
        col("budget_tok"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for ((lang, (nWant, tokWant)) <- want) {
      val (nGot, tokGot, budget) = got(lang)
      assert(tokGot <= budget, s"$lang admitted $tokGot > budget $budget")
      assert((nGot, tokGot) === ((nWant, tokWant)),
        s"$lang two-phase plan diverged from the single-fold reference")
    }
    // prefix-maximality: the first rejected doc in priority order would
    // not have fit — i.e. admitted tokens + its n_tok exceeds the budget
    for ((lang, ds) <- docs.groupBy(_._2)) {
      val ordered = ds.sortBy(d => (h(d._1), d._1))
      var cum = 0L
      val firstRejected = ordered.find { case (_, _, n) =>
        cum += n; cum > budgetOf(lang)
      }
      firstRejected.foreach { case (_, _, n) =>
        val (_, tokGot, budget) = got(lang)
        assert(tokGot + n > budget,
          s"$lang: first rejected doc ($n tok) would still fit — not maximal")
      }
    }
  }
}
