package graft

class EntrySpec extends SparkSpec {

  test("entry smoke: rows > 0 (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and is non-degenerate") {
    // pair-finding queries may legitimately be empty at the tiny sf
    val mayBeEmpty = Set("q_ngram_jaccard", "q_minhash_lsh",
                         "q_simhash_pairs", "q_cosine_pairs",
                         "q_lsh_cosine_pairs",
                         // 4x-fair-share concentration is unreachable with
                         // sf0.001's ~10 suppliers/part (verified 4 rows at
                         // sf0.01, 5 at sf0.1)
                         "q_tpch_q20")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0 || mayBeEmpty(name), s"$name returned no rows")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("oracleSql keys all exist in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle for unknown queries: $missing")
  }

  test("oracle coverage: SQL-expressible ops all have oracles") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // intentionally rows-only — ONLY hash/sketch/k-means/iterative-GD/
    // iterative-argmax/LAPACK internals remain (q_multimodal_features
    // gained its oracle in r3; r6 adds the two ANN-ops reports and the
    // two PCA reports — k-means/eigendecomposition internals; note
    // q_reindex and q_leakage_audit are NOT here: both are oracle-exact)
    val expected = Set("q_simhash_pairs", "q_fingerprints", "q_ann_topk",
                       "q_ivf_topk", "q_ivf_trained", "q_approx_users",
                       "q_lsh_cosine_pairs", "q_pq_topk", "q_ivfpq_topk",
                       "q_bpe_vocab", "q_quality_classifier",
                       "q_ann_eval", "q_index_drift",
                       "q_pq_eval", "q_pca_embed", "q_pca_scree",
                       "q_user_sketch", "q_sketch_append",
                       // iterative farthest-point greedy (k-means class)
                       "q_kcenter_select",
                       // MinHash geometries aren't oracle-expressible
                       "q_lsh_eval",
                       // file-census bytes are encoding-dependent
                       "q_layout_stats",
                       // iterative greedy (kCenterSelect class)
                       "q_mmr_rerank",
                       // LSH bucket internals aren't oracle-expressible
                       "q_ann_multiprobe")
    assert(noOracle === expected)
  }
}
