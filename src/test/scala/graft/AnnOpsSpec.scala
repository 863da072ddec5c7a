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
    val got = SimilarityOps.annEval(assigned, cents, "vec_id", "embedding",
                                    probeIds, k = 10, nprobes = grid)
      .orderBy($"nprobe")
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(got.map(_._1) === grid)
    assert(got.forall(_._2 === 10))
    assert(got.forall(_._3 === probeIds.size.toLong))
    // monotone non-decreasing, exact at the full-probe endpoint (the
    // "nprobe=all ≡ brute force" theorem the IVF specs pin per-probe)
    assert(got.map(_._4) === got.map(_._4).sorted)
    assert(got.last._4 === 1.0)

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
}
