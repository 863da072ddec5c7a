package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Repetition gates + PII scrub on crafted positives (the synthetic
  * corpus is mostly clean, so the oracle run alone never exercises a
  * match — these pin the operators' actual semantics).
  */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("topTokenRatio: repeated token dominates; distinct text is 1/n") {
    val df = Seq(
      (1L, "spam spam spam spam ham"),   // 4/5
      (2L, "all tokens fully distinct"), // 1/4
      (3L, "one")                        // 1/1
    ).toDF("doc_id", "text")
      .select($"doc_id", TextOps.topTokenRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df(1L) === 0.8)
    assert(df(2L) === 0.25)
    assert(df(3L) === 1.0)
  }

  test("dupLineFraction: duplicated lines counted, empties ignored") {
    val text = "a\nb\na\n\n\na"   // lines a,b,a,a → distinct 2 of 4 → 0.5
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextOps.dupLineFraction($"text")).head().getDouble(0)
    assert(r === 0.5)
    val none = Seq((1L, "\n\n")).toDF("doc_id", "text")
      .select(TextOps.dupLineFraction($"text")).head().getDouble(0)
    assert(none === 0.0)
  }

  test("PII scrub: emails and phones redacted and counted") {
    val text = "mail bob.smith+x@corp.example.com or call 555-123-4567 now"
    val row = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextOps.piiCount($"text").as("n"),
              TextOps.redactPii($"text").as("red"))
      .head()
    assert(row.getLong(0) === 2L)
    assert(row.getString(1) === "mail <email> or call <phone> now")
    // digits inside a longer run do NOT match (word boundary)
    val noPhone = Seq((1L, "id 9555-123-45678 x")).toDF("doc_id", "text")
      .select(TextOps.piiCount($"text")).head().getLong(0)
    assert(noPhone === 0L)
  }

  test("a phone-shaped local part belongs to the email match, once") {
    val text = "reach 555-123-4567@relay.example.org ok"
    val row = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextOps.piiCount($"text").as("n"),
              TextOps.redactPii($"text").as("red"))
      .head()
    assert(row.getString(1) === "reach <email> ok")
    assert(row.getLong(0) === 2L) // count sees both patterns pre-redaction
  }

  test("dataCard: per-source volume, dup mass, lang mix, medians") {
    val docs = Seq(
      ("A", "en", "a b"), ("A", "en", "a b"), ("A", "es", "c d e"),
      ("B", "fr", "x"), ("B", "de", "y y")
    ).zipWithIndex.map { case ((s, l, t), i) => (i.toLong, s, l, t) }
      .toDF("doc_id", "source", "lang", "text")
    val got = TextOps.dataCard(docs)
      .orderBy($"source")
      .as[(String, Long, Long, Long, Long, Double, Double, String)]
      .collect().toSeq
    // A: 3 docs, 7 tokens, 1 exact dup, 2 langs, avg chars 11/3,
    //    median tokens 2, dominant lang en (2 of 3)
    assert(got(0) === (("A", 3L, 7L, 1L, 2L, 3.666667, 2.0, "en")))
    // B: tie on lang counts (1 fr, 1 de) -> alphabetical first: de;
    //    even count -> interpolated median (1+2)/2
    assert(got(1) === (("B", 2L, 3L, 0L, 2L, 2.0, 1.5, "de")))
  }
}
