package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps

/** Composed IVF×PQ index: build, pruned ADC serving, persistence. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  /** 8 well-separated planted clusters, ±0.1 deterministic jitter —
    * the PqSpec generator: intra-cluster d² ≲ 0.64 vs inter ≳ 16.
    */
  private def planted(n: Long) = (0L until n).map { i =>
    val k = (i % 8).toInt
    val v = Array.tabulate(16) { j =>
      (((k * 5 + j * 3) % 8) * 4 +
        ((i * 13 + j * 5) % 3 - 1) * 0.1).toFloat
    }
    (i, v)
  }.toDF("vec_id", "embedding")

  test("nprobe=all + saturated codebook == brute force exactly") {
    // every subspace has exactly 2 distinct subvectors carried by the
    // first 2 ids (the seed rule) → PQ reconstructs every vector
    // EXACTLY; with every list probed, IVF pruning removes nothing, so
    // the composed serve must equal the true L2 ranking bit-for-bit
    val a = Array(1.0f, 2.0f); val b = Array(-1.0f, 0.5f)
    val c = Array(3.0f, 0.0f); val e = Array(0.0f, 4.0f)
    def cat(x: Array[Float], y: Array[Float]) = x ++ y
    val rows = Seq(
      (0L, cat(a, c)), (1L, cat(b, e)), (2L, cat(b, c)),
      (3L, cat(a, e)), (4L, cat(a, c))
    ).toDF("vec_id", "embedding")
    val pqCb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                     nsub = 2, codes = 2, iters = 2)
    val cents = SimilarityOps.seedCentroids(rows, "vec_id", "embedding", 2)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb)
    val got = SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                      "vec_id", "embedding",
                                      probeId = 0L, k = 4, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    def d2(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) =>
        (p.toDouble - q.toDouble) * (p.toDouble - q.toDouble) }.sum
    val vecs = Map(0L -> cat(a, c), 1L -> cat(b, e), 2L -> cat(b, c),
                   3L -> cat(a, e), 4L -> cat(a, c))
    val expect = vecs.removed(0L).toSeq
      .map { case (id, v) => id -> d2(vecs(0L), v) }
      .sortBy { case (id, d) => (d, id) }
    assert(got.toSeq === expect)
    spark.catalog.clearCache()
  }

  test("pruned serve keeps plain-PQ recall on planted clusters") {
    val rows = planted(200L)
    val pqCb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                     nsub = 4, codes = 8, iters = 3)
    val plainPq = SimilarityOps.pqTopK(rows, "vec_id", "embedding", pqCb,
                                       probeId = 0L, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    val cents = SimilarityOps.ivfTrain(rows, "vec_id", "embedding",
                                       nlist = 8, iters = 2)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb)
    // nprobe=2 of 8: the probe's own (well-separated) cluster is the
    // nearest list, so pruning must not cost recall vs unpruned PQ
    val pruned = SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                         "vec_id", "embedding",
                                         probeId = 0L, k = 10, nprobe = 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(plainPq.forall(_ % 8 === 0L) && pruned.forall(_ % 8 === 0L),
           s"leaked out of the planted cluster: pq=$plainPq ivfpq=$pruned")
    assert((pruned & plainPq).size >= plainPq.size,
           s"pruning lost recall: pq=$plainPq ivfpq=$pruned")
    spark.catalog.clearCache()
  }

  test("index round-trip serves identical rows and prunes partitions") {
    val rows = planted(120L)
    val pqCb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                     nsub = 4, codes = 8, iters = 2)
    val cents = SimilarityOps.ivfTrain(rows, "vec_id", "embedding",
                                       nlist = 4, iters = 1)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb)
    val before = SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                         "vec_id", "embedding",
                                         probeId = 3L, k = 8, nprobe = 2)
      .collect().toSeq
    val path = "target/scratch/ivfpq_index"
    SimilarityOps.saveIndexPq(index, cents, pqCb, path)
    val (lists2, cents2, pqCb2) = SimilarityOps.loadIndexPq(spark, path)
    val served = SimilarityOps.ivfPqTopK(lists2, cents2, pqCb2, rows,
                                         "vec_id", "embedding",
                                         probeId = 3L, k = 8, nprobe = 2)
    assert(served.collect().toSeq === before)
    // the list_id ∈ probes predicate must prune at planning time — the
    // point of the partitioned on-disk layout
    assert(served.queryExecution.executedPlan.toString
             .contains("PartitionFilters"),
           "loaded-index serve lost partition pruning")
    spark.catalog.clearCache()
  }

  test("residual mode: saturated residual vocab + one list == brute force") {
    // single list ⇒ residual = x − c (a constant shift): the residual
    // subvector vocabulary stays 2-valued per subspace, the codebook
    // saturates, and ‖r_p − r_x‖ = ‖p − x‖ — the composed residual
    // serve must reproduce the true L2 ranking exactly
    val a = Array(1.0f, 2.0f); val b = Array(-1.0f, 0.5f)
    val c = Array(3.0f, 0.0f); val e = Array(0.0f, 4.0f)
    def cat(x: Array[Float], y: Array[Float]) = x ++ y
    val rows = Seq(
      (0L, cat(a, c)), (1L, cat(b, e)), (2L, cat(b, c)),
      (3L, cat(a, e)), (4L, cat(a, c))
    ).toDF("vec_id", "embedding")
    val cents = SimilarityOps.seedCentroids(rows, "vec_id", "embedding", 1)
    val res = SimilarityOps.ivfResiduals(rows, "vec_id", "embedding", cents)
    val pqCb = SimilarityOps.pqTrain(res, "vec_id", "rvec",
                                     nsub = 2, codes = 2, iters = 2)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb, residual = true)
    val got = SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                      "vec_id", "embedding",
                                      probeId = 0L, k = 4, nprobe = 1,
                                      residual = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    def d2(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) =>
        (p.toDouble - q.toDouble) * (p.toDouble - q.toDouble) }.sum
    val vecs = Map(0L -> cat(a, c), 1L -> cat(b, e), 2L -> cat(b, c),
                   3L -> cat(a, e), 4L -> cat(a, c))
    val expect = vecs.removed(0L).toSeq
      .map { case (id, v) => id -> d2(vecs(0L), v) }
      .sortBy { case (id, d) => (d, id) }
    assert(got.toSeq === expect)
    spark.catalog.clearCache()
  }

  test("residual codes beat raw codes on clustered data (distortion + recall)") {
    val rows = planted(200L)
    val cents = SimilarityOps.ivfTrain(rows, "vec_id", "embedding",
                                       nlist = 8, iters = 2)
    // distortion: once the coarse quantizer soaks up between-cluster
    // variance, the SAME pq budget encodes the (near-zero) residuals
    // strictly better than the raw vectors
    val rawCb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                      nsub = 4, codes = 8, iters = 3)
    val rawD = SimilarityOps.pqDistortion(rows, "vec_id", "embedding", rawCb)
    val res = SimilarityOps.ivfResiduals(rows, "vec_id", "embedding", cents)
    val resCb = SimilarityOps.pqTrain(res, "vec_id", "rvec",
                                      nsub = 4, codes = 8, iters = 3)
    val resD = SimilarityOps.pqDistortion(res, "vec_id", "rvec", resCb)
    assert(resD <= rawD + 1e-9,
           s"residual distortion did not improve: raw=$rawD res=$resD")
    // end-to-end pruned residual serve stays within the planted cluster
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, resCb, residual = true)
    val got = SimilarityOps.ivfPqTopK(index, cents, resCb, rows,
                                      "vec_id", "embedding",
                                      probeId = 0L, k = 10, nprobe = 2,
                                      residual = true)
      .select($"vec_id").as[Long].collect()
    assert(got.length === 10 && got.forall(_ % 8 === 0L),
           s"residual serve leaked out of the cluster: ${got.mkString(",")}")
    spark.catalog.clearCache()
  }

  test("residual index round-trips with its persisted encoding mode") {
    val rows = planted(120L)
    val cents = SimilarityOps.ivfTrain(rows, "vec_id", "embedding",
                                       nlist = 4, iters = 1)
    val res = SimilarityOps.ivfResiduals(rows, "vec_id", "embedding", cents)
    val pqCb = SimilarityOps.pqTrain(res, "vec_id", "rvec",
                                     nsub = 4, codes = 8, iters = 2)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb, residual = true)
    val before = SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                         "vec_id", "embedding",
                                         probeId = 3L, k = 8, nprobe = 2,
                                         residual = true).collect().toSeq
    val path = "target/scratch/ivfpq_residual_index"
    SimilarityOps.saveIndexPq(index, cents, pqCb, path, residual = true)
    // the mode travels WITH the index — a later session reads it back
    // instead of having to remember how the codes were built
    assert(SimilarityOps.indexIsResidual(spark, path))
    val (l2, c2, p2) = SimilarityOps.loadIndexPq(spark, path)
    val served = SimilarityOps.ivfPqTopK(l2, c2, p2, rows,
                                         "vec_id", "embedding",
                                         probeId = 3L, k = 8, nprobe = 2,
                                         residual =
                                           SimilarityOps.indexIsResidual(spark, path))
      .collect().toSeq
    assert(served === before)
    // a pre-marker index directory reads as raw
    assert(!SimilarityOps.indexIsResidual(spark,
             "target/scratch/ivfpq_index"))
    spark.catalog.clearCache()
  }

  test("absent probe id returns empty through the composed path") {
    val rows = planted(40L)
    val pqCb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                     nsub = 4, codes = 4, iters = 1)
    val cents = SimilarityOps.seedCentroids(rows, "vec_id", "embedding", 4)
    val index = SimilarityOps.ivfPqBuild(rows, "vec_id", "embedding",
                                         cents, pqCb)
    assert(SimilarityOps.ivfPqTopK(index, cents, pqCb, rows,
                                   "vec_id", "embedding",
                                   probeId = 999L, k = 5, nprobe = 4)
             .isEmpty)
    spark.catalog.clearCache()
  }
}
