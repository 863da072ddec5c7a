package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityOps
import graft.text.TextOps

/** Adaptive (per-group-median) quality gating and embedding
  * centroid-outlier detection.
  */
class QualityGateSpec extends SparkSpec {

  test("adaptiveQualityGate keeps strictly-above-median rows per group") {
    import spark.implicits._
    // group a: clearly ordered scores (longer text with stopwords scores
    // higher); group b: identical texts → median = every score → all cut
    val docs = Seq(
      ("a", 1L, "the of and to in is " * 30), // high: token-rich + stopwords
      ("a", 2L, "word " * 10),                // mid
      ("a", 3L, "!!!???;;;...."),             // low: pure punctuation
      ("b", 4L, "same text"),
      ("b", 5L, "same text")
    ).toDF("source", "doc_id", "text")
    val out = TextOps.adaptiveQualityGate(docs, "source")
      .select(col("source"), col("doc_id"), col("quality_score"), col("med"))
      .collect()
    // group b: both scores equal the median → strict > keeps none
    assert(!out.exists(_.getString(0) == "b"))
    // group a: exactly the rows above the (odd-count) median survive, and
    // every survivor is strictly above its group threshold
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(1)).toSet === Set(1L))
    assert(a.forall(r => r.getDouble(2) > r.getDouble(3)))
  }

  test("approx variant: bounded-buffer sketch, same plan shape, same gate") {
    import spark.implicits._
    // the at-scale swap must be a drop-in: percentile_approx is EXACT on
    // groups with <= accuracy rows, so on the bench corpus the survivor
    // set must be identical to the exact median's
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = TextOps.adaptiveQualityGate(docs, "source")
      .select($"doc_id").as[Long].collect().toSet
    val approx = TextOps.adaptiveQualityGate(docs, "source", exact = false)
      .select($"doc_id").as[Long].collect().toSet
    assert(approx === exact)
    // identical plan shape: one partial+final aggregate broadcast back —
    // only the aggregate function differs, never the dataflow
    def shape(e: Boolean): String = {
      val plan = TextOps.adaptiveQualityGate(docs, "source", exact = e)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
               plan.contains("BroadcastExchange"), plan)
      plan.linesIterator
        .map(_.replaceAll("#\\d+", "").replaceAll("plan_id=\\d+", "")
          .replaceAll("(?i)percentile_approx\\([^)]*\\)|median\\([^)]*\\)",
                      "AGG"))
        .filter(l => l.contains("Exchange") || l.contains("Join"))
        .mkString("\n")
    }
    assert(shape(true) === shape(false))
    spark.catalog.clearCache()
  }

  test("centroidOutliers ranks the planted outlier first, drops null vecs") {
    import spark.implicits._
    // label 0: three near-identical vectors + one opposed outlier;
    // a null-embedding row must simply vanish (no definable similarity)
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.99f, 0.05f, 0.0f)),
      (3L, 0, Array(0.98f, -0.05f, 0.0f)),
      (9L, 0, Array(-1.0f, 0.0f, 0.0f)), // the outlier
      (7L, 1, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "label", "embedding")
    val got = SimilarityOps.centroidOutliers(rows, "vec_id", "embedding",
                                             "label", k = 10)
      .collect()
    assert(got.head.getLong(0) === 9L) // lowest cosine to the centroid
    assert(!got.exists(_.getLong(0) === 7L))
    // sims are sorted ascending and rounded
    val sims = got.map(_.getDouble(2))
    assert(sims.sorted.sameElements(sims))
  }

  test("expectations: one pass, prove-it null semantics, SQL UNIQUE " +
       "surplus, empty-frame all-pass") {
    import spark.implicits._
    import graft.quality.Quality
    import graft.quality.Quality.Expectation._
    val df = Seq(
      (Some(1L), Some("click"), Some(10.0)),
      (Some(1L), Some("view"), Some(500.0)),  // dup key + out of range
      (None,     Some("Ad-Hoc"), None),       // null key; regex+set fail
      (Some(3L), None, Some(-1.0))            // null type; range fail
    ).toDF("event_id", "event_type", "value")
    val checks = Seq(
      NotNull("event_id"),
      Unique(Seq("event_id")),
      InRange("value", 0.0, 400.0),
      Matches("event_type", "^[a-z]+$"),
      InSet("event_type", Seq("click", "view")))
    val got = Quality.expectations(df, checks)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.size === 5)
    assert(got(("not_null", "event_id")) === ((4L, 1L, false)))
    // 3 non-null keys, 2 distinct -> surplus 1; the NULL key never
    // collides (SQL UNIQUE)
    assert(got(("unique", "event_id")) === ((4L, 1L, false)))
    // NULL value asserts nothing for range; 500 and -1 violate
    assert(got(("in_range", "value")) === ((4L, 2L, false)))
    assert(got(("matches", "event_type")) === ((4L, 1L, false)))
    assert(got(("in_set", "event_type")) === ((4L, 1L, false)))
    // empty frame: every check passes with zero violations
    val empty = Quality.expectations(df.filter(lit(false)), checks)
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(empty.length === 5)
    assert(empty.forall(r => r._3 === 0L && r._4 === 0L && r._5))
  }

  test("psiDrift: identical snapshots score ~0, planted shift signs") {
    import spark.implicits._
    import graft.quality.Quality
    val base = (1 to 100).map(i => Tuple1(i.toDouble % 50)).toDF("value")
    // identical distributions: every contribution is exactly 0
    val same = Quality.psiDrift(base, base, "value", binWidth = 10.0,
                                numBins = 4)
      .collect()
    assert(same.length === 5) // bins 0..4 always materialize
    assert(same.forall(_.getDouble(5) === 0.0))
    // planted shift: mass moves from bin 0 to bin 3 -> psi_contrib
    // positive at 3 (gained), positive at 0 too (PSI contributions are
    // nonneg iff (p-q) and ln(p/q) share sign — they always do)
    val cur = (1 to 100).map(i => Tuple1(30.0 + (i % 20))).toDF("value")
    val drift = Quality.psiDrift(base, cur, "value", binWidth = 10.0,
                                 numBins = 4)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    // every contribution is >= 0 by construction
    assert(drift.values.forall(_._3 >= 0.0))
    // bins that lost all mass still get a finite (smoothed) score
    assert(drift(0)._2 === 0L && drift(0)._3 > 0.0)
    // the clamped top bin catches base 40..49 (20 rows) and the
    // cur plant's 40..49 half (50 rows) -> mass on both sides, psi > 0
    assert(drift(4)._1 === 20L && drift(4)._2 === 50L &&
           drift(4)._3 > 0.0)
    // total PSI crosses the classic 'shifted' threshold on this plant
    assert(drift.values.map(_._3).sum > 0.25)
  }
}
