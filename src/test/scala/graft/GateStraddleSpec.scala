package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps
import graft.text.{Bpe, QualityClassifier, TextOps}

/** Gate-straddle pins for the two-regime operators: run each operator at
  * gate−1 / gate / gate+1 RELATIVE TO ITS FIXTURE so the driver-collect
  * regime serves one side of the seam and the distributed regime the
  * other, and assert the results are bit-identical. PqSpec's NaN-seam
  * test caught an AIOOBE exactly at the driver-regime boundary; these
  * close the same hole for ivfTrain, QualityClassifier.train and
  * Bpe.bpeTrain/bpeEncode. The gate parameter defaults to the production
  * constant — injecting it here moves the SEAM to the fixture instead of
  * building a 2^20-row fixture around the production seam; the regime
  *-selection logic under test is identical either way.
  */
class GateStraddleSpec extends SparkSpec {
  import spark.implicits._

  // ---- ivfTrain ------------------------------------------------------

  private def ivfFixture: DataFrame =
    (0L until 12L).map { i =>
      (i, Array.tabulate(4)(j => (math.sin(i * 3 + j) * 5).toFloat))
    }.toDF("vec_id", "embedding")

  private def slurpCents(df: DataFrame): Seq[(Long, Option[Seq[Double]])] =
    df.select($"list_id".cast("long"), $"cvec")
      .as[(Long, Option[Seq[Double]])].collect().sortBy(_._1).toSeq

  private def assertCentsEqual(a: Seq[(Long, Option[Seq[Double]])],
                               b: Seq[(Long, Option[Seq[Double]])],
                               tag: String): Unit = {
    assert(a.map(_._1) === b.map(_._1), tag)
    a.zip(b).foreach { case ((l, va), (_, vb)) =>
      assert(va.isDefined === vb.isDefined, s"$tag list=$l presence")
      va.zip(vb).foreach { case (x, y) =>
        x.zip(y).foreach { case (p, q) =>
          assert((p.isNaN && q.isNaN) || p == q,
            s"$tag list=$l: $p vs $q") } } }
  }

  test("ivfTrain elems-gate straddle: gate-1 / gate / gate+1 bit-identical") {
    val emb = ivfFixture // 12 rows x dim 4 = 48 elements
    val elems = 48L
    val results = Seq(elems - 1, elems, elems + 1).map { g =>
      slurpCents(SimilarityOps.ivfTrain(emb, "vec_id", "embedding",
                                        nlist = 3, iters = 2, gate = g))
    }
    // gate = 47 -> distributed (48 > 47); gate = 48, 49 -> driver.
    // The seam crosses between results(0) and results(1).
    assertCentsEqual(results(0), results(1), "gate-1 vs gate")
    assertCentsEqual(results(1), results(2), "gate vs gate+1")
    // and both regimes called explicitly agree with the gated dispatch
    val dst = slurpCents(SimilarityOps.ivfTrainDistributed(
      emb, "vec_id", "embedding", nlist = 3, iters = 2))
    assertCentsEqual(results(1), dst, "driver vs explicit distributed")
    spark.catalog.clearCache()
  }

  test("ivfTrain rows-gate straddle: degenerate rows push a small-elems " +
       "corpus over the seam identically") {
    // 5 real vectors (20 elements) + 30 empty vectors -> rows = 35.
    // An element-only gate would collect all 35 rows on the driver; the
    // rows clause must flip to distributed at gate < 35 and both regimes
    // must produce the same codebook.
    val emb = ((0L until 5L).map { i =>
      (i, Array.tabulate(4)(j => (math.cos(i * 2 + j) * 3).toFloat))
    } ++ (100L until 130L).map(i => (i, Array.empty[Float])))
      .toDF("vec_id", "embedding")
    val results = Seq(34L, 35L, 36L).map { g =>
      slurpCents(SimilarityOps.ivfTrain(emb, "vec_id", "embedding",
                                        nlist = 2, iters = 2, gate = g))
    }
    assertCentsEqual(results(0), results(1), "rows gate-1 vs gate")
    assertCentsEqual(results(1), results(2), "rows gate vs gate+1")
    spark.catalog.clearCache()
  }

  test("pqTrain modal-elems gate straddle is bit-identical") {
    val emb = ivfFixture // 12 rows x dim 4: modal-count*d = 48
    val elems = 48L
    val tables = Seq(elems - 1, elems, elems + 1).map { g =>
      SimilarityOps.pqTrain(emb, "vec_id", "embedding",
                            nsub = 2, codes = 3, iters = 2, gate = g)
        .select($"sub_id".cast("int"), $"code".cast("int"), $"cvec")
        .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
        .toSeq
    }
    assert(tables(0).map(t => (t._1, t._2)) ===
           tables(1).map(t => (t._1, t._2)), "codebook keys")
    tables(0).zip(tables(1)).foreach { case ((s1, c1, va), (_, _, vb)) =>
      va.zip(vb).foreach { case (x, y) =>
        assert((x.isNaN && y.isNaN) || x == y,
          s"sub=$s1 code=$c1: $x vs $y") } }
    assert(tables(1) === tables(2), "gate vs gate+1")
    spark.catalog.clearCache()
  }

  // ---- QualityClassifier.train --------------------------------------

  test("QualityClassifier.train triples-gate straddle is bit-identical") {
    val docs = Seq(
      (0L, "good clean prose with useful words"),
      (1L, "spam spam spam buy now click here"),
      (2L, "informative sentence about the world"),
      (3L, "click click buy buy spam now"),
      (4L, "a thoughtful essay on engineering"),
      (5L, "free money click spam buy")).toDF("doc_id", "text")
    val labels = Seq((0L, 1.0), (1L, 0.0), (2L, 1.0), (3L, 0.0),
                     (4L, 1.0), (5L, 0.0)).toDF("doc_id", "y")
    // the triples count is a fixture property (distinct hashed features
    // + one bias row per doc, joined to labels); measure it the same way
    // train() does rather than hard-coding a derivation
    val dim = 16
    val feats = QualityClassifier.hashedFeatures(docs, "doc_id", "text", dim)
    val nTriples = feats.count() + docs.count() // + bias rows
    val ws = Seq(nTriples - 1, nTriples, nTriples + 1).map { g =>
      QualityClassifier.train(docs, labels, dim = dim, iters = 4,
                              gate = g).toSeq
    }
    // gate = n-1 -> distributed; gate = n, n+1 -> driver
    assert(ws(0) === ws(1), "gate-1 (distributed) vs gate (driver)")
    assert(ws(1) === ws(2), "gate vs gate+1")
    // sanity: the model actually separates the fixture
    assert(ws(1).exists(_ != 0.0), "trained weights are non-trivial")
    spark.catalog.clearCache()
  }

  // ---- Bpe.bpeTrain / bpeEncode -------------------------------------

  test("bpeTrain vocab-gate straddle is bit-identical") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val vocabSize = 4L // low lower newest widest
    val tables = Seq(vocabSize - 1, vocabSize, vocabSize + 1).map { g =>
      Bpe.bpeTrain(docs, "text", numMerges = 5, gate = g)
        .as[(Int, String, String, Long)].collect().toSeq
    }
    // gate = 3 -> distributed (4 > 3); gate = 4, 5 -> driver
    assert(tables(0) === tables(1), "gate-1 (distributed) vs gate (driver)")
    assert(tables(1) === tables(2), "gate vs gate+1")
    assert(tables(1) === Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L),
      (3, "lo", "w", 7L), (4, "e", "w", 6L)), "hand-computed merge table")
    spark.catalog.clearCache()
  }

  test("bpeEncode vocab-gate straddle is bit-identical (map-literal vs " +
       "broadcast-join regimes)") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(
      (1L, "low lower widest"),
      (2L, "newest low"),
      (3L, corpus)).toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, "text", numMerges = 5)
    val vocabSize = 4L
    val encs = Seq(vocabSize - 1, vocabSize, vocabSize + 1).map { g =>
      Bpe.bpeEncode(docs, "doc_id", "text", merges, gate = g)
        .select($"doc_id", $"bpe")
        .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    }
    assert(encs(0) === encs(1), "gate-1 (broadcast-join) vs gate (map)")
    assert(encs(1) === encs(2), "gate vs gate+1")
    // encode-decode identity on the straddle fixture
    val toks = docs.select(
      concat_ws("", TextOps.tokens($"text")).as("flat"),
      $"doc_id").as[(String, Long)].collect().toMap
    encs(1).foreach { case (id, bpe) =>
      assert(bpe.mkString("") === toks.find(_._2 == id).get._1.mkString(""),
        s"doc $id round-trip") }
    spark.catalog.clearCache()
  }
}
