package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Bigram-LM corpus scoring and temperature-weighted mixture
  * resampling.
  */
class LmMixSpec extends SparkSpec {

  test("lmTrain counts bigrams and prunes below minCount") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b x")
    ).toDF("doc_id", "text")
    val m = TextOps.lmTrain(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // "a b" appears in doc1 twice? doc1 bigrams: (a,b),(b,a),(a,b),(b,c);
    // doc2: (a,b),(b,x) → c(a,b)=3
    assert(m(("a", "b")) === 3L)
    assert(m(("b", "a")) === 1L)
    assert(m(("b", "c")) === 1L)
    assert(m(("b", "x")) === 1L)
    val pruned = TextOps.lmTrain(docs, minCount = 2L).collect()
    assert(pruned.length === 1 &&
      pruned.head.getString(0) === "a" && pruned.head.getString(1) === "b")
  }

  test("lmScore: hand-computed add-α probabilities") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val model = TextOps.lmTrain(docs) // (a,b)=1, (b,c)=1; c1: a=1, b=1; V=2
    val out = TextOps.lmScore(docs, model, alpha = 0.5).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 2L) // 2 bigrams
    // p(b|a) = (1+.5)/(1+.5*2) = 0.75; p(c|b) likewise. nll = total.
    val lp = BigDecimal(math.log(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(-(lp + lp))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) === want)
  }

  test("lmScore: unseen context scores at the uniform 1/V") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val model = TextOps.lmTrain(train) // (a,b)=2,(b,a)=1; V=2
    val probe = Seq((9L, "z q")).toDF("doc_id", "text")
    val out = TextOps.lmScore(probe, model, alpha = 0.5).collect()
    // c12=0, c1=0 → p = α/(α·V) = 1/2 regardless of α
    val lp = BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(-lp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(2) === want)
  }

  test("lmScore drops docs with < 2 tokens; self-scored corpus ranks " +
       "templated text above noise") {
    import spark.implicits._
    val noise = "zq xv qj wk vz jx kq"
    val docs = (1L to 20L).map(i => (i, "the cat sat on the mat")) ++
      Seq((99L, noise), (100L, "one"), (101L, ""))
    val df = docs.toDF("doc_id", "text")
    val scored = TextOps.lmScore(df, TextOps.lmTrain(df))
      .collect().map(r => r.getLong(0) -> r.getDouble(2) / r.getLong(1))
      .toMap
    assert(!scored.contains(100L) && !scored.contains(101L))
    // the repeated template is predictable (low mean nll); the noise
    // doc's transitions are all singletons with rare contexts — its
    // per-bigram (nll / n_bigrams) mean must score strictly worse
    assert(scored(99L) > scored(1L))
  }

  test("temperatureMix: α=1 keeps every group whole; α→0 flattens") {
    import spark.implicits._
    val docs = (1L to 90L).map(i => (i, "en", s"text $i")) ++
      (91L to 100L).map(i => (i, "fr", s"text $i"))
    val df = docs.toDF("doc_id", "lang", "text")
    val whole = TextOps.temperatureMix(df, "lang", alpha = 1.0)
    assert(whole.count() === 100L)
    assert(whole.select(max(col("rate"))).head().getDouble(0) === 1.0)
    // α=0.5: w_en = 90^.5/(90^.5+10^.5), rate_en = min(1, 100·w/90) < 1,
    // rate_fr caps at 1 (upsampling impossible without replacement)
    val mixed = TextOps.temperatureMix(df, "lang", alpha = 0.5)
      .groupBy(col("lang")).agg(max(col("rate")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val z = math.sqrt(90.0) + math.sqrt(10.0)
    val want = BigDecimal(math.sqrt(90.0) / z * 100.0 / 90.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mixed("en") === want)
    assert(mixed("fr") === 1.0)
  }

  test("temperatureMix: null text and null group drop; deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "keep me"), (2L, "en", null),
      (3L, null, "no group"), (4L, "fr", "aussi")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.temperatureMix(df, "lang", alpha = 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!out.contains(2L) && !out.contains(3L))
    val again = TextOps.temperatureMix(df, "lang", alpha = 0.5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(out === again)
  }
}
