package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps

/** Product quantization: training, encoding, ADC serving. */
class PqSpec extends SparkSpec {

  test("PQ is exact when the codebook saturates the subvector vocabulary") {
    import spark.implicits._
    // every subspace has exactly 2 distinct subvectors, and the first 2
    // vectors (by id — the seed rule) jointly carry all of them → the
    // trained codebook reconstructs every vector EXACTLY, so ADC top-k
    // must equal the true L2 ranking (here: id 3 shares id 0's prefix
    // subvector, id 4 is id 0's exact twin)
    val a = Array(1.0f, 2.0f); val b = Array(-1.0f, 0.5f)
    val c = Array(3.0f, 0.0f); val e = Array(0.0f, 4.0f)
    def cat(x: Array[Float], y: Array[Float]) = x ++ y
    val rows = Seq(
      (0L, cat(a, c)), (1L, cat(b, e)), (2L, cat(b, c)),
      (3L, cat(a, e)), (4L, cat(a, c))
    ).toDF("vec_id", "embedding")
    val cb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                   nsub = 2, codes = 2, iters = 2)
    assert(SimilarityOps.pqDistortion(rows, "vec_id", "embedding", cb)
             < 1e-12)
    val got = SimilarityOps.pqTopK(rows, "vec_id", "embedding", cb,
                                   probeId = 0L, k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // exact twin first at distance 0; ranking matches true L2 distances
    assert(got.head === (4L -> 0.0))
    val trueD2 = Map(
      1L -> (dist2(a, b) + dist2(c, e)), 2L -> dist2(a, b),
      3L -> dist2(c, e), 4L -> 0.0)
    val expectOrder = trueD2.toSeq.sortBy { case (id, d) => (d, id) }
      .map(_._1)
    assert(got.map(_._1).toSeq === expectOrder)
    spark.catalog.clearCache()
  }

  private def dist2(x: Array[Float], y: Array[Float]): Double =
    x.zip(y).map { case (p, q) =>
      (p.toDouble - q.toDouble) * (p.toDouble - q.toDouble) }.sum

  test("Lloyd iterations never increase PQ distortion; codebook stays full") {
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings")
      .filter($"embedding".isNotNull && size($"embedding") === 64)
    def train(iters: Int) = SimilarityOps.pqTrain(
      emb, "vec_id", "embedding", nsub = 8, codes = 16, iters = iters)
    val d0 = SimilarityOps.pqDistortion(emb, "vec_id", "embedding", train(0))
    val cb2 = train(2)
    val d2 = SimilarityOps.pqDistortion(emb, "vec_id", "embedding", cb2)
    assert(d2 <= d0 + 1e-9, s"distortion rose: $d0 -> $d2")
    // 8 subspaces × 16 codes, none lost to empty clusters
    assert(cb2.count() === 128L)
    spark.catalog.clearCache()
  }

  test("ADC retrieves the probe's planted cluster on structured data") {
    // Set-overlap recall on RANDOM vectors measures the data (64-dim
    // near-equidistant points), not the engine — so plant structure: 8
    // well-separated cluster centers (coordinate gap 4.0) with ±0.1
    // deterministic jitter. Intra-cluster d² ≲ 0.64 vs inter ≳ 16, and
    // quantization error is bounded by the jitter spread, so every ADC
    // top-10 hit must come from the probe's own cluster.
    import spark.implicits._
    val rows = (0L until 200L).map { i =>
      val k = (i % 8).toInt
      // (k·5 + 3j) mod 8 with 5 coprime to 8: any two clusters differ
      // in EVERY coordinate (k1≠k2 ⇒ (k1−k2)·5 ≢ 0 mod 8), so no two
      // centers coincide anywhere
      val v = Array.tabulate(16) { j =>
        (((k * 5 + j * 3) % 8) * 4 +
          ((i * 13 + j * 5) % 3 - 1) * 0.1).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
    val cb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                   nsub = 4, codes = 8, iters = 3)
    val got = SimilarityOps.pqTopK(rows, "vec_id", "embedding", cb,
                                   probeId = 0L, k = 10)
      .select($"vec_id").as[Long].collect()
    assert(got.length === 10)
    assert(got.forall(_ % 8 === 0L),
      s"ADC leaked out of the probe's cluster: ${got.mkString(",")}")
    spark.catalog.clearCache()
  }

  test("pq seed pass keeps the WindowGroupLimit pushdown (plan shape)") {
    import spark.implicits._
    // iters=0 returns exactly the seed frame: the rank<=k filter must
    // plan as WindowGroupLimit (partial limit below the exchange), not
    // a full per-partition sort — the difference between a bounded seed
    // pass and a straggler on an unsampled corpus
    val rows = (0L until 64L)
      .map(i => (i, Array.tabulate(8)(j => (i + j).toFloat)))
    // the DISTRIBUTED regime's seed plan (pqTrain itself would route
    // this gate-sized fixture to the driver trainer)
    val cb = SimilarityOps.pqTrainDistributed(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nsub = 4, codes = 4, iters = 0, d = 8, dsub = 2)
    val plan = cb.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"seed plan lost the " +
      s"group-limit pushdown:\n$plan")
    spark.catalog.clearCache()
  }

  test("driver-regime pqTrain ≡ distributed pqTrain (same seeds, argmins, means)") {
    import spark.implicits._
    // mixed-sign, irregular values; 3 Lloyd rounds; some vectors with
    // the wrong dimension (must be excluded from training identically)
    val rows = ((0L until 40L).map { i =>
      (i, Array.tabulate(8)(j =>
        (math.sin(i * 3 + j) * (1 + (i % 5))).toFloat))
    } ++ Seq((100L, Array(1.0f, 2.0f)))).toDF("vec_id", "embedding")
    val drv = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                    nsub = 4, codes = 4, iters = 3)
    val dst = SimilarityOps.pqTrainDistributed(
      rows, "vec_id", "embedding", nsub = 4, codes = 4, iters = 3,
      d = 8, dsub = 2)
    def slurp(df: org.apache.spark.sql.DataFrame) = df
      .select($"sub_id".cast("int"), $"code".cast("int"), $"cvec")
      .as[(Int, Int, Seq[Double])].collect()
      .sortBy(t => (t._1, t._2))
    val (a, b) = (slurp(drv), slurp(dst))
    assert(a.map(t => (t._1, t._2)).toSeq === b.map(t => (t._1, t._2)).toSeq)
    a.zip(b).foreach { case ((s, c, va), (_, _, vb)) =>
      va.zip(vb).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-12,
          s"sub=$s code=$c: driver $x vs distributed $y") }
    }
    spark.catalog.clearCache()
  }

  test("pqTrainGrid ≡ per-config pqTrain, byte-identical codebooks") {
    import spark.implicits._
    // the r12 q_pq_eval shape: one corpus, a codes grid — the grid's
    // shared dims probe + shared collect must not change a single bit
    // of any config's codebook
    val rows = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j =>
        (math.cos(i * 7 + j) * (1 + (i % 3))).toFloat))
    }.toDF("vec_id", "embedding")
    val grid = SimilarityOps.pqTrainGrid(rows, "vec_id", "embedding",
                                         nsub = 4, codesGrid = Seq(8, 2),
                                         iters = 2)
    val solo = Seq(8, 2).map(c =>
      SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                            nsub = 4, codes = c, iters = 2))
    def slurp(df: org.apache.spark.sql.DataFrame) = df
      .select($"sub_id".cast("int"), $"code".cast("int"), $"cvec")
      .as[(Int, Int, Seq[Double])].collect()
      .sortBy(t => (t._1, t._2))
    grid.zip(solo).foreach { case (g, s) =>
      assert(slurp(g).toSeq === slurp(s).toSeq) }
    spark.catalog.clearCache()
  }

  test("pqTrain dimension is the corpus MODE: a stray higher-dim row " +
       "cannot hijack d and exclude the real corpus") {
    import spark.implicits._
    // 30 dim-8 vectors + one dim-16 stray (16 IS divisible by nsub, so
    // the old max(size) probe picked d = 16, trained the codebook on
    // the single stray and silently excluded every real vector from
    // training and encoding)
    val rows = ((0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => (i + j).toFloat))
    } :+ ((100L, Array.tabulate(16)(_.toFloat))))
      .toDF("vec_id", "embedding")
    val cb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                   nsub = 4, codes = 2, iters = 1)
    // trained at d = 8: dsub = 2 per subspace
    val lens = cb.select($"cvec").as[Seq[Double]].collect().map(_.size)
    assert(lens.nonEmpty && lens.forall(_ === 2), s"dsub: ${lens.toSeq}")
    // and the REAL corpus serves: a probe's top-1 is a real neighbor
    val top = SimilarityOps.pqTopK(rows, "vec_id", "embedding", cb,
                                   probeId = 0L, k = 1)
      .select($"vec_id").as[Long].collect()
    assert(top.length === 1 && top(0) < 30L, s"served: ${top.toSeq}")
  }

  test("driver-regime pqTrain survives a NaN vector identically to the " +
       "distributed regime (phantom code contributes to no mean)") {
    import spark.implicits._
    val rows = ((0L until 12L).map { i =>
      (i, Array.tabulate(4)(j => (math.cos(i * 2 + j) * 3).toFloat))
    } :+ ((50L, Array(Float.NaN, 1.0f, 2.0f, 3.0f))))
      .toDF("vec_id", "embedding")
    // below the gate → driver regime (used to throw AIOOBE on the -1
    // phantom code); the distributed twin must agree coefficient-wise
    val drv = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                    nsub = 2, codes = 3, iters = 2)
    val dst = SimilarityOps.pqTrainDistributed(
      rows, "vec_id", "embedding", nsub = 2, codes = 3, iters = 2,
      d = 4, dsub = 2)
    def slurp(df: org.apache.spark.sql.DataFrame) = df
      .select($"sub_id".cast("int"), $"code".cast("int"), $"cvec")
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    val (a, b) = (slurp(drv), slurp(dst))
    assert(a.map(t => (t._1, t._2)).toSeq === b.map(t => (t._1, t._2)).toSeq)
    a.zip(b).foreach { case ((s, c, va), (_, _, vb)) =>
      va.zip(vb).foreach { case (x, y) =>
        assert((x.isNaN && y.isNaN) || math.abs(x - y) < 1e-12,
          s"sub=$s code=$c: driver $x vs distributed $y") } }
    spark.catalog.clearCache()
  }

  test("pqTopK with an absent probe id returns no rows, not null-ranked ones") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array(4.0f, 3.0f, 2.0f, 1.0f)),
      (2L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val cb = SimilarityOps.pqTrain(rows, "vec_id", "embedding",
                                   nsub = 2, codes = 2, iters = 1)
    // no vector has id 99 → the ADC table is empty; every corpus row's
    // dist2 would be null, and nulls sort FIRST ascending — the guard
    // must yield an empty result instead of k arbitrary rows
    val got = SimilarityOps.pqTopK(rows, "vec_id", "embedding", cb,
                                   probeId = 99L, k = 2)
    assert(got.isEmpty)
    spark.catalog.clearCache()
  }
}
