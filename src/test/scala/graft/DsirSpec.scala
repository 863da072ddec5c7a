package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** DSIR importance weighting and selection (hashed-n-gram likelihood
  * ratio vs a target corpus).
  */
class DsirSpec extends SparkSpec {

  test("identical raw and target corpora weight every doc at exactly 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a quick brown fox"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    val w = TextOps.dsirWeights(docs, docs, dim = 64).collect()
    assert(w.length === 3)
    // cp == cq and tp == tq bucket-for-bucket, so every log-ratio is
    // ln(x) - ln(x): exactly 0.0 before and after grid rounding
    w.foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("n_grams counts unigrams + bigrams (2n - 1 per n-token doc)") {
    import spark.implicits._
    val raw = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val tgt = Seq((9L, "a b")).toDF("doc_id", "text")
    val n = TextOps.dsirWeights(raw, tgt, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) === 7L) // 4 unigrams + 3 bigrams
    assert(n(2L) === 1L) // 1 unigram, no bigram
  }

  test("raw docs resembling the target outweigh noise docs") {
    import spark.implicits._
    val target = (1L to 30L).map(i => (i, "climate model physics data"))
      .toDF("doc_id", "text")
    val raw = (Seq((101L, "climate model physics data"),
                   (102L, "zq xv qj wk vz")) ++
      (103L to 120L).map(i => (i, s"filler noise row $i")))
      .toDF("doc_id", "text")
    val w = TextOps.dsirWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(101L) > w(102L))
    // normalized comparison too: the on-target doc must beat the noise
    // doc per-gram, not just by length
    assert(w(101L) > 0.0 && w(101L) === w.values.max)
  }

  test("weights are deterministic and null/empty text drops out") {
    import spark.implicits._
    val raw = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]),
                  (3L, "")).toDF("doc_id", "text")
    val tgt = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val a = TextOps.dsirWeights(raw, tgt, dim = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = TextOps.dsirWeights(raw, tgt, dim = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
    assert(a.map(_._1) === Set(1L))
  }

  test("dsirSelect returns the top-k of dsirWeights, id tie-broken") {
    import spark.implicits._
    val target = (1L to 10L).map(i => (i, "good clean reference text"))
      .toDF("doc_id", "text")
    val raw = ((101L to 105L).map(i => (i, "good clean reference text")) ++
      (106L to 120L).map(i => (i, s"junk $i junk"))).toDF("doc_id", "text")
    val k = 5
    val sel = TextOps.dsirSelect(raw, target, k)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(sel.length === k)
    val all = TextOps.dsirWeights(raw, target)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, w) => (-w, id) }.take(k)
    assert(sel.sortBy { case (id, w) => (-w, id) }.toSeq === all.toSeq)
    // the 5 on-target clones are exactly the winners
    assert(sel.map(_._1).toSet === (101L to 105L).toSet)
  }

  test("selection plans as TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val raw = (1L to 40L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
    val tgt = Seq((9L, "doc text")).toDF("doc_id", "text")
    val plan = TextOps.dsirSelect(raw, tgt, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
