package graft

import org.apache.spark.sql.functions._

import graft.similarity.EmbeddingPca

/** PCA/whitening over the embedding column: planted-axis recovery,
  * orthonormality, exact full-rank reconstruction, unit-variance
  * whitening, and the degenerate-input contracts.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic anisotropic 3-D cloud: dominant axis u = (.6, .8, 0),
  // secondary w = (0, 0, 1) at 1/10 the spread, plus a constant offset
  // so the mean is nonzero (centering must matter)
  private val u = Array(0.6, 0.8, 0.0)
  private lazy val cloud = (-10 to 10).flatMap { t =>
    Seq(0.3f, -0.3f).map { z =>
      Array((t * u(0) + 1.0).toFloat, (t * u(1) - 2.0).toFloat, z + 0.5f)
    }
  }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("vec_id", "embedding")

  test("fit recovers the planted dominant axis, basis orthonormal, " +
       "eigenvalues descending, sign convention pinned") {
    val m = EmbeddingPca.fit(cloud, "embedding", 3)
    assert(m.d === 3 && m.k === 3)
    // dominant eigenvector is ±u — and the sign rule (largest-|entry|
    // coordinate positive) forces the + orientation since u(1) = .8 > 0
    val v0 = m.basis(0)
    assert(math.abs(v0(0) - u(0)) < 1e-6 &&
             math.abs(v0(1) - u(1)) < 1e-6 &&
             math.abs(v0(2)) < 1e-6,
           s"dominant axis ${v0.toSeq} should be ${u.toSeq}")
    // orthonormal: VᵀV = I
    for (i <- 0 until 3; j <- i until 3) {
      val dot = m.basis(i).lazyZip(m.basis(j)).map(_ * _).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"basis($i)·basis($j) = $dot")
    }
    // spectrum sorted descending; the z-spread (0.09) is the second axis
    assert(m.eigenvalues(0) >= m.eigenvalues(1) &&
             m.eigenvalues(1) >= m.eigenvalues(2))
    assert(math.abs(m.eigenvalues(1) - 0.09) < 1e-6)
    assert(m.eigenvalues(2) < 1e-9) // the cloud is rank-2
  }

  test("full-rank projection reconstructs exactly; whitened components " +
       "have unit variance; short vectors project to null") {
    val m = EmbeddingPca.fit(cloud, "embedding", 3)
    val projected = EmbeddingPca.project(cloud, "vec_id", "embedding", m)
      .as[(Long, Array[Double])].collect().toMap
    val orig = cloud.as[(Long, Array[Float])].collect().toMap
    orig.foreach { case (id, x) =>
      val p = projected(id)
      (0 until 3).foreach { r =>
        val rec = m.mean(r) +
          (0 until 3).map(i => p(i) * m.basis(i)(r)).sum
        assert(math.abs(rec - x(r)) < 1e-6,
               s"row $id dim $r: $rec vs ${x(r)}")
      }
    }
    // whitening: population variance of each kept component is 1 (the
    // rank-deficient third axis is BELOW the 1e-12 floor → left unscaled)
    val mw = EmbeddingPca.fit(cloud, "embedding", 2, whiten = true)
    val pw = EmbeddingPca.project(cloud, "vec_id", "embedding", mw)
      .as[(Long, Array[Double])].collect().map(_._2)
    (0 until 2).foreach { i =>
      val v = pw.map(p => p(i) * p(i)).sum / pw.length
      assert(math.abs(v - 1.0) < 1e-9, s"component $i variance $v")
    }
    // a non-conforming (short) vector projects to null, others unharmed
    val mixed = cloud.unionByName(
      Seq((999L, Array(1.0f))).toDF("vec_id", "embedding"))
    val got = EmbeddingPca.project(mixed, "vec_id", "embedding", m)
    assert(got.filter($"vec_id" === 999L).filter($"proj".isNull)
             .count() === 1L)
    assert(got.filter($"proj".isNotNull).count() === cloud.count())
  }

  test("varianceExplained: cumulative fraction reaches 1 at full rank " +
       "and matches the eigenvalue ratios; k caps at d") {
    val rep = EmbeddingPca.varianceExplained(cloud, "embedding", 99)
      .orderBy($"component")
      .as[(Int, Double, Double)].collect().toSeq
    assert(rep.length === 3) // k capped at d
    assert(math.abs(rep.last._3 - 1.0) < 1e-6)
    val m = EmbeddingPca.fit(cloud, "embedding", 3)
    val total = m.eigenvalues.sum
    rep.foreach { case (i, ev, cum) =>
      assert(math.abs(ev - math.rint(m.eigenvalues(i) * 1e6) / 1e6)
               <= 1e-6)
      assert(math.abs(cum -
               m.eigenvalues.take(i + 1).sum / total) < 1e-5)
    }
    // monotone non-decreasing cumulative curve
    assert(rep.map(_._3).sliding(2).forall(s =>
      s.length < 2 || s(0) <= s(1) + 1e-12))
  }
}
