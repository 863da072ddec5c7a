package graft

import org.apache.spark.sql.DataFrame

import graft.dedup.DedupOps
import graft.similarity.SimilarityOps

/** Regression guards for the round-3 physical-plan fixes: the pair-join
  * heads must stay parallelized (a one-row-group input otherwise runs
  * quadratic work single-core) and the Jaccard verify joins must stay
  * shuffle-hash (SMJ sorts candidate streams with both set payloads
  * attached). These assert the FINAL adaptive plan after execution.
  */
class PlanShapeSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    // collect(), NOT count(): count() builds a NEW QueryExecution around
    // groupBy().count(), leaving df's own plan unexecuted (and its
    // AdaptiveSparkPlan stuck at isFinalPlan=false)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("cosinePairs streams the BNLJ side from a repartitioned input") {
    val df = SimilarityOps.cosinePairs(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding", 0.45)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"exact baseline must stay the documented BNLJ:\n$plan")
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"quadratic streamed side lost its repartitioned head:\n$plan")
  }

  test("ngram verify joins are shuffle-hash, head repartitioned, no text shuffled") {
    val df = DedupOps.ngramJaccardPairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", 12, 0.7)
    val plan = finalPlan(df)
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"hashedSets lost its repartitioned head:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"verify joins regressed off shuffle-hash:\n$plan")
    spark.catalog.clearCache()
  }

  test("bm25TopK: isin filter below the token aggregate, bounded top-k") {
    val df = graft.text.TextOps.bm25TopK(
      Tables.load(spark, sfDir, "documents"), Seq("spark", "vector"), k = 5)
    val plan = finalPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k regressed to a global sort:\n$plan")
    // the query-term filter must sit under the (doc,term) aggregate so
    // the only token-volume shuffle carries matching terms only
    val genIdx = plan.indexOf("Generate explode")
    val filtIdx = plan.indexOf("spark", genIdx)
    assert(genIdx >= 0 && filtIdx >= 0,
      s"expected explode + term-literal filter in plan:\n$plan")
    spark.catalog.clearCache()
  }

  test("centroidOutliers: centroid broadcast, no embedding exchange, top-k") {
    val df = SimilarityOps.centroidOutliers(
      Tables.load(spark, sfDir, "embeddings"), "vec_id", "embedding",
      "label", k = 5)
    val plan = finalPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k regressed to a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid table must broadcast back:\n$plan")
  }

  test("ivfAssignTo plans zero exchanges over the embedding table") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = SimilarityOps.seedCentroids(emb, "vec_id", "embedding", 4)
    val df = SimilarityOps.ivfAssignTo(emb, "vec_id", "embedding", cents)
    val plan = finalPlan(df)
    // the embedding-side subtree must be scan → project with only the
    // codebook broadcast feeding it: no hashpartitioning exchange at all
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment shuffled the embedding table:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"codebook is not broadcast:\n$plan")
  }

  test("semanticDecontaminate: benchmark broadcast, zero corpus exchange") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val df = SimilarityOps.semanticDecontaminate(
      emb.filter(org.apache.spark.sql.functions.col("label") =!= 0),
      emb.filter(org.apache.spark.sql.functions.col("label") === 0),
      "vec_id", "embedding", tau = 0.4)
    val plan = finalPlan(df)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decontamination screen shuffled the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"benchmark fold is not broadcast:\n$plan")
  }

  test("tpch top-k queries stay TakeOrderedAndProject, never global sort") {
    Seq("q_tpch_q2", "q_tpch_q21").foreach { q =>
      val plan = finalPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q top-k regressed to a global sort:\n$plan")
    }
  }

  test("bm25 probe with tombstones: every stats/df fold is a broadcast " +
       "join, never SMJ") {
    import spark.implicits._
    val root = s"${graft.io.Sinks.scratchRoot}/spec_planshape_bm25"
    graft.io.Sinks.dropTable(spark, root)
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark broadcasts small tables"),
      (3L, "vector search over embeddings"),
      (4L, "plain text about nothing in particular")
    ).toDF("doc_id", "text")
    graft.text.Bm25Index.build(docs, root, buckets = 4)
    graft.text.Bm25Index.forget(docs.filter($"doc_id" === 4)
      .select("doc_id"), root)
    val plan = finalPlan(
      graft.text.Bm25Index.probe(spark, root, Seq("spark"), k = 3))
    // the 1-row tombstone aggregate and the per-term df/stats folds must
    // all ride broadcasts — an SMJ here would sort the pruned postings
    // stream against a single-row side
    assert(!plan.contains("SortMergeJoin"),
      s"bm25 probe planned a sort-merge join against a tiny side:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"expected broadcast stats/df folds in probe plan:\n$plan")
  }
}
