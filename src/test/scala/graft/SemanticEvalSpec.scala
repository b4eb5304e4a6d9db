package graft

import graft.operators.SemanticEval

class SemanticEvalSpec extends SparkSpecBase {

  private lazy val report =
    SemanticEval.semanticRecallEval(spark, sf, k = 10, nQueries = 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

  test("report covers both encoders x both transforms with full query sets") {
    assert(report.keySet === Set(
      ("feature_hash", "dropout"), ("feature_hash", "associate"),
      ("word2vec", "dropout"), ("word2vec", "associate")))
    report.foreach { case (k, (n, recall, mrr)) =>
      info(s"$k -> n=$n recall@10=$recall mrr@10=$mrr")
      assert(n === 50L, s"$k lost queries")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(mrr >= 0.0 && mrr <= recall + 1e-9, // rr ≤ 1 per hit
        s"$k mrr $mrr inconsistent with recall $recall")
    }
  }

  test("dropout floor: a count-faithful encoder re-finds the source well above chance") {
    val (_, recall, _) = report(("feature_hash", "dropout"))
    // chance = k/N = 10/500; a 64-dim count sketch holding half the
    // tokens must do far better on a 31-word-vocab corpus
    assert(recall >= 0.5, s"feature_hash dropout recall@10 = $recall")
  }

  test("harder transform is not easier: associate recall <= dropout recall per encoder") {
    Seq("feature_hash", "word2vec").foreach { e =>
      val d = report((e, "dropout"))._2
      val a = report((e, "associate"))._2
      assert(a <= d + 0.1, s"$e: associate $a unexpectedly above dropout $d")
    }
  }
}
