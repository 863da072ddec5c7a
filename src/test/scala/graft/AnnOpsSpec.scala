package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps

/** The ANN quality/ops harness: annEval (recall@k vs nprobe grid) and
  * indexDrift (the appendIndex "retrain now" signal).
  */
class AnnOpsSpec extends SparkSpec {
  import spark.implicits._

  private val probeIds = Seq(0L, 7L, 23L)

  test("annEval: recall hits 1.0 at nprobe = nlist, is monotone in " +
       "nprobe, and each grid point matches a hand-built ivfTopK sweep") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val nlist = 8
    val cents = SimilarityOps.seedCentroids(emb, "vec_id", "embedding",
                                            nlist)
    val assigned = SimilarityOps
      .ivfAssignTo(emb, "vec_id", "embedding", cents)
      .persist()
    val grid = Seq(1, 3, 8)
    val evalDf = SimilarityOps.annEval(assigned, cents, "vec_id",
                                       "embedding", probeIds, k = 10,
                                       nprobes = grid)
      .orderBy($"nprobe")
    val got = evalDf
      .select($"nprobe", $"k", $"n_probes", $"recall")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got.map(_._1) === grid)
    assert(got.forall(_._2 === 10))
    assert(got.forall(_._3 === probeIds.size.toLong))
    // monotone non-decreasing, exact at the full-probe endpoint (the
    // "nprobe=all ≡ brute force" theorem the IVF specs pin per-probe)
    assert(got.map(_._4) === got.map(_._4).sorted)
    assert(got.last._4 === 1.0)
    // the shared eval-contract tail: candidates grow with nprobe,
    // verified never exceeds candidates, precision = verified/candidates
    val acct = evalDf
      .select($"n_candidates", $"n_verified", $"precision")
      .as[(Long, Long, Double)].collect().toSeq
    assert(acct.map(_._1) === acct.map(_._1).sorted,
           s"candidate volume must be monotone in nprobe: $acct")
    assert(acct.forall(r => r._2 <= r._1))
    assert(acct.forall(r =>
      math.abs(r._3 - r._2.toDouble / r._1) < 1e-6))

    // every grid point equals the recall computed the slow way: one
    // ivfTopK per (probe, nprobe) vs one exact topKNeighbors per probe
    val exact = probeIds.map { p =>
      p -> SimilarityOps.topKNeighbors(emb, "vec_id", "embedding", p, 10)
        .select($"vec_id").as[Long].collect().toSet
    }.toMap
    for ((n, _, _, recall) <- got) {
      val mean = probeIds.map { p =>
        val approx = SimilarityOps.ivfTopK(assigned, cents, "vec_id",
            "embedding", probeId = p, k = 10, nprobe = n)
          .select($"vec_id").as[Long].collect().toSet
        approx.intersect(exact(p)).size.toDouble / exact(p).size
      }.sum / probeIds.size
      assert(math.abs(recall - mean) < 1e-6,
             s"nprobe=$n: annEval $recall vs hand-built $mean")
    }
    assigned.unpersist()
    spark.catalog.clearCache()
  }

  test("pqEval: saturated codebook scores recall 1.0; a coarse codebook " +
       "scores no higher; each config matches a hand-built pqTopK sweep") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val fine = SimilarityOps.pqTrain(emb, "vec_id", "embedding",
                                     nsub = 8, codes = 16, iters = 1)
    val coarse = SimilarityOps.pqTrain(emb, "vec_id", "embedding",
                                       nsub = 8, codes = 2, iters = 1)
    val evalDf = SimilarityOps.pqEval(emb, "vec_id", "embedding",
        Seq("8x16" -> fine, "8x2" -> coarse), probeIds, k = 10)
    val got = evalDf
      .select($"config", $"k", $"n_probes", $"recall")
      .as[(String, Int, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("8x16", "8x2"))
    assert(got.values.forall(r => r._2 === 10 &&
                                  r._3 === probeIds.size.toLong))
    assert(got.values.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // the shared eval-contract tail: ADC scores every (probe, corpus)
    // pair in this full-scan eval, so candidates = probes·(corpus−1)
    val corpusN = emb.count()
    val acct = evalDf
      .select($"n_candidates", $"n_verified", $"precision")
      .as[(Long, Long, Double)].collect().toSeq
    assert(acct.forall(_._1 === probeIds.size * (corpusN - 1)))
    assert(acct.forall(r => r._2 <= r._1 &&
      math.abs(r._3 - r._2.toDouble / r._1) < 1e-6))
    assert(got("8x2")._4 <= got("8x16")._4 + 1e-9,
           s"2-code recall ${got("8x2")._4} vs 16-code ${got("8x16")._4}")

    // every config's recall equals the slow per-probe pqTopK sweep
    import graft.functions.VectorExpressions.dotProduct
    for ((label, cb) <- Seq("8x16" -> fine, "8x2" -> coarse)) {
      val mean = probeIds.map { p =>
        val exact = emb.as("a")
          .filter($"a.vec_id" =!= p)
          .crossJoin(emb.filter($"vec_id" === p).select(
            transform($"embedding", x => x.cast("double")).as("pv")))
          .select($"a.vec_id".as("nid"),
                  round(dotProduct(transform($"a.embedding",
                                             x => x.cast("double")),
                                   transform($"a.embedding",
                                             x => x.cast("double")))
                    - lit(2.0) * dotProduct(transform($"a.embedding",
                                                      x => x.cast("double")),
                                            $"pv")
                    + dotProduct($"pv", $"pv"), 6).as("d2"))
          .orderBy($"d2".asc, $"nid".asc).limit(10)
          .select($"nid").as[Long].collect().toSet
        val approx = SimilarityOps.pqTopK(emb, "vec_id", "embedding", cb,
                                          probeId = p, k = 10)
          .select($"vec_id").as[Long].collect().toSet
        approx.intersect(exact).size.toDouble / exact.size
      }.sum / probeIds.size
      assert(math.abs(got(label)._4 - mean) < 1e-6,
             s"$label: pqEval ${got(label)._4} vs hand-built $mean")
    }
    spark.catalog.clearCache()
  }

  test("pqEval: a truly saturated codebook on a tiny vocabulary corpus " +
       "hits exactly 1.0") {
    // 2 distinct subvectors per subspace, codes = 2 → zero distortion →
    // ADC ranking ≡ exact L2 ranking (the PqSpec saturation theorem),
    // so recall@k must be exactly 1.0
    val a = Array(1.0f, 2.0f); val b = Array(-1.0f, 0.5f)
    val c = Array(3.0f, 0.0f); val e = Array(0.0f, 4.0f)
    def cat(x: Array[Float], y: Array[Float]) = x ++ y
    val rows = Seq(
      (0L, cat(a, c)), (1L, cat(b, e)), (2L, cat(b, c)),
      (3L, cat(a, e)), (4L, cat(a, c))
    ).toDF("vec_id", "embedding")
    val cb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                   nsub = 2, codes = 2, iters = 2)
    val got = SimilarityOps.pqEval(rows, "vec_id", "embedding",
        Seq("sat" -> cb), probeIds = Seq(0L, 1L), k = 3)
      .select($"config", $"k", $"n_probes", $"recall")
      .as[(String, Int, Long, Double)].head()
    assert(got === (("sat", 3, 2L, 1.0)))
    spark.catalog.clearCache()
  }

  test("annEval: a degenerate (zero-norm) corpus vector counts as a " +
       "scanned candidate but never ranks — and never crashes the " +
       "typed top-k pass") {
    // ivfAssignTo parks null-cosine rows on list 0 (nearestListExpr's
    // seed accumulator), so the zero vector is scanned whenever list 0
    // is probed; its sim is null from cosineSim and the typed
    // aggregation must treat it as -Inf (counted, unrankable) rather
    // than crash the non-nullable Double decode — the regression this
    // spec pins
    def v(axis: Int): Seq[Double] = {
      val a = Array.fill(4)(0.0); a(axis) = 1.0; a.toSeq
    }
    val emb = (Seq((0L, v(0)), (1L, v(1)), (2L, v(0)), (3L, v(0)),
                   (4L, v(0)), (5L, v(1)), (6L, v(1)), (7L, v(1)),
                   (99L, Seq(0.0, 0.0, 0.0, 0.0))))
      .toDF("vec_id", "embedding")
    val cents = SimilarityOps.seedCentroids(emb, "vec_id", "embedding",
                                            nlist = 2)
    val assigned = SimilarityOps.ivfAssignTo(emb, "vec_id", "embedding",
                                             cents)
    val got = SimilarityOps.annEval(assigned, cents, "vec_id",
        "embedding", probeIds = Seq(0L), k = 3, nprobes = Seq(1, 2))
      .orderBy($"nprobe")
      .select($"nprobe", $"n_candidates", $"recall")
      .as[(Int, Long, Double)].collect().toSeq
    // list 0 = {0,2,3,4,99}: probing it scans 4 candidates (probe
    // excluded) INCLUDING the zero vector; both lists scan all 8
    assert(got.map(_._2) === Seq(4L, 8L),
           s"candidate accounting must include the degenerate row: $got")
    // the axis-0 trio out-ranks the zero vector at every grid point
    assert(got.forall(_._3 === 1.0), s"recall: $got")
    spark.catalog.clearCache()
  }

  test("indexDrift: in-distribution batch drifts ~0; a planted " +
       "off-distribution batch shows positive drift on its landing list") {
    // two tight clusters on orthogonal axes; the index is trained on
    // them, so assignment cosines are ~1 for in-distribution vectors
    def vec(axis: Int, wobble: Double): Seq[Double] = {
      val v = Array.fill(8)(0.0)
      v(axis) = 1.0
      v((axis + 1) % 8) = wobble
      v.toSeq
    }
    val old = ((0L until 40L).map(i => (i, vec(0, 0.01 * (i % 5)))) ++
               (40L until 80L).map(i => (i, vec(4, 0.01 * (i % 5)))))
      .toDF("vec_id", "embedding")
    val path = graft.io.Sinks.scratchRoot + "/ann_drift_spec"
    val cents = SimilarityOps.ivfTrain(old, "vec_id", "embedding",
                                       nlist = 2, iters = 2)
    SimilarityOps.saveIndex(
      SimilarityOps.ivfAssignTo(old, "vec_id", "embedding", cents),
      cents, path)

    // in-distribution: fresh vectors from the same two clusters
    val inDist = ((100L until 110L).map(i => (i, vec(0, 0.02))) ++
                  (110L until 120L).map(i => (i, vec(4, 0.02))))
      .toDF("vec_id", "embedding")
    val calm = SimilarityOps.indexDrift(inDist, "vec_id", "embedding", path)
      .as[(Int, Long, Option[Double], Long, Option[Double], Option[Double])]
      .collect()
    assert(calm.map(_._2).sum === 80L, "standing census covers the index")
    assert(calm.map(_._4).sum === 20L, "batch census covers the batch")
    assert(calm.forall(r => math.abs(r._6.get) < 0.01),
           s"in-distribution drift should be ~0, got ${calm.toSeq}")

    // off-distribution: a third direction the codebook never saw —
    // lands on SOME frozen list with a much worse assignment cosine
    val shifted = (200L until 220L).map(i => (i, vec(2, 0.02)))
      .toDF("vec_id", "embedding")
    val drifted = SimilarityOps
      .indexDrift(shifted, "vec_id", "embedding", path)
      .as[(Int, Long, Option[Double], Long, Option[Double], Option[Double])]
      .collect()
    val landing = drifted.filter(_._4 > 0)
    assert(landing.nonEmpty)
    assert(landing.forall(_._6.get > 0.5),
           s"off-distribution batch must show strong positive drift: " +
             s"${drifted.toSeq}")
    // a list the batch missed reports null batch stats, not garbage
    assert(drifted.filter(_._4 === 0L).forall(r =>
      r._5.isEmpty && r._6.isEmpty))
    spark.catalog.clearCache()
  }

  test("forgetFromIndex: only affected list dirs rewritten, emptied " +
       "lists dropped, untouched lists byte-identical, idempotent") {
    def vec(axis: Int): Seq[Double] = {
      val v = Array.fill(4)(0.0); v(axis) = 1.0; v.toSeq
    }
    // 3 tight lists of 4 vectors each on orthogonal axes
    val emb = (0L until 12L).map(i => (i, vec((i % 3).toInt)))
      .toDF("vec_id", "embedding")
    val path = graft.io.Sinks.scratchRoot + "/ann_forget_spec"
    graft.io.Sinks.dropTable(spark, path)
    // seed centroids = vectors 0,1,2 = the three axes: assignment is
    // exact and deterministic, no training required
    val cents = SimilarityOps.seedCentroids(emb, "vec_id", "embedding",
                                            nlist = 3)
    SimilarityOps.saveIndex(
      SimilarityOps.ivfAssignTo(emb, "vec_id", "embedding", cents),
      cents, path)
    val listDirs = new java.io.File(s"$path/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(listDirs.length === 3)
    def filesOf(d: String) = new java.io.File(s"$path/lists/$d")
      .listFiles().filter(_.getName.startsWith("part-"))
      .map(f => (f.getName, f.lastModified, f.length)).toSeq.sorted
    // axis-2 members {2,5,8,11} share one list; forget ALL of them plus
    // one member (0) of another list
    val before = listDirs.map(d => d -> filesOf(d)).toMap
    val ids = Seq(2L, 5L, 8L, 11L, 0L).toDF("vec_id")
    SimilarityOps.forgetFromIndex(ids, "vec_id", path)
    val survivors = spark.read.parquet(s"$path/lists")
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === Set(1L, 3L, 4L, 6L, 7L, 9L, 10L))
    // the fully-forgotten list's dir is gone
    val after = new java.io.File(s"$path/lists").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(after.length === 2)
    // the untouched list (no forgotten member) kept its files untouched
    val untouched = listDirs.filter { d =>
      filesOf0(path, d).nonEmpty && after.contains(d) &&
        before(d) == filesOf(d)
    }
    assert(untouched.nonEmpty,
      s"expected at least one byte-identical untouched list dir")
    // idempotent re-run: same census, no errors
    SimilarityOps.forgetFromIndex(ids, "vec_id", path)
    assert(spark.read.parquet(s"$path/lists")
      .select("vec_id").as[Long].collect().toSet === survivors)
  }

  private def filesOf0(path: String, d: String) = {
    val f = new java.io.File(s"$path/lists/$d")
    if (f.exists()) f.listFiles().toSeq else Seq.empty
  }
}
