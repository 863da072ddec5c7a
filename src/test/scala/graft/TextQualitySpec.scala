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

  test("stripMarkup: tags to space, entities decoded once, ws collapsed") {
    val docs = Seq(
      (1L, "<p>Hello <b>world</b></p><p>bye</p>"),
      // &amp;lt; must decode to the LITERAL &lt;, not < (amp last)
      (2L, "a &amp;lt; b &lt; c &gt; d &quot;q&quot; &#39;s&#39; &amp; e"),
      (3L, "  leading\t\tand\n\ntrailing   "),
      (4L, "<a href=\"http://x\">link</a> text"),
      (5L, null.asInstanceOf[String]),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.stripMarkup(docs).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) === "Hello world bye")
    assert(got(2L) === "a &lt; b < c > d \"q\" 's' & e")
    assert(got(3L) === "leading and trailing")
    assert(got(4L) === "link text")
    assert(got(5L) === null)
    assert(got(6L) === "")
    // chars_removed is the length delta, never negative on this rule set
    val removed = TextOps.stripMarkup(docs).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(removed(1L) === ("<p>Hello <b>world</b></p><p>bye</p>".length
      - "Hello world bye".length).toLong)
    assert(removed(5L) === -1L) // null text -> null delta
    assert(removed(6L) === 0L)
  }

  test("encodingGate: FFFD / control / mojibake census and the gate") {
    val docs = Seq(
      (1L, "perfectly clean ascii"),
      (2L, "bad \uFFFD byte \uFFFD\uFFFD here"),          // 3 FFFD
      (3L, "ctrl\u0000chars\u0007and\u001Fdel\u007F"),     // 4 control
      (4L, "caf\u00C3\u00A9 and \u00E2\u20AC\u0153quote"), // 2 markers
      (5L, "tabs\tand\nnewlines\rare fine"),               // exempt ws
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.encodingGate(docs).collect().map { r =>
      r.getLong(0) -> (
        if (r.isNullAt(1)) null
        else (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    }.toMap
    assert(got(1L) === ((0L, 0L, 0L, true)))
    assert(got(2L) === ((3L, 0L, 0L, false)))
    assert(got(3L) === ((0L, 4L, 0L, false)))
    assert(got(4L) === ((0L, 0L, 2L, false)))
    assert(got(5L) === ((0L, 0L, 0L, true)))
    assert(got(6L) === null) // null text -> null counts, null gate
  }

  test("scriptCensus: per-script counts, dominant script, tie order") {
    val docs = Seq(
      (1L, "Hello world 123"),                    // latin 10, digit 3
      (2L, "Привет мир"),
      (3L, "日本語テスト"), // 6 cjk chars
      (4L, "a Прив"),         // cyrl 4 > latin 1
      (5L, "ab Пр"),                    // 2-2 tie -> latin
      (6L, "123 !!!"),                            // no scripts -> none
      (7L, "café"),                          // accented latin counts
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.scriptCensus(docs).collect().map { r =>
      r.getLong(0) -> (
        if (r.isNullAt(1)) null
        else (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5), r.getLong(6), r.getString(7)))
    }.toMap
    assert(got(1L) === ((10L, 0L, 0L, 3L, 2L, 0L, "latin")))
    assert(got(2L) === ((0L, 9L, 0L, 0L, 1L, 0L, "cyrl")))
    assert(got(3L) === ((0L, 0L, 6L, 0L, 0L, 0L, "cjk")))
    assert(got(4L) === ((1L, 4L, 0L, 0L, 1L, 0L, "cyrl")))
    assert(got(5L) === ((2L, 2L, 0L, 0L, 1L, 0L, "latin"))) // tie order
    assert(got(6L) === ((0L, 0L, 0L, 3L, 1L, 3L, "none")))
    assert(got(7L) === ((4L, 0L, 0L, 0L, 0L, 0L, "latin")))
    assert(got(8L) === null)
  }

  test("extractionPipeline: each gate drops its planted violator") {
    val many = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"<p>$many</p>"),                      // survives (markup ok)
      (2L, s"$many \uFFFD"),                      // encoding gate drops
      (3L, many.replace("word", "\u0441\u043B")), // cyrillic: script gate
      (4L, "too short"),                          // token floor drops
      (5L, null.asInstanceOf[String])             // null: dropped, no row
    ).toDF("doc_id", "text")
    val got = TextOps.extractionPipeline(docs, minTokens = 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L))
    assert(got(1L) === 60L)
    // zero exchanges: the whole chain is scan -> project -> filter
    val plan = TextOps.extractionPipeline(docs, minTokens = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pipeline must not shuffle:\n$plan")
  }

  test("the extraction gates are stateless: stream output equals batch") {
    // stripMarkup / encodingGate / scriptCensus are single narrow
    // projections (no state, no watermark), so they run unchanged on a
    // readStream — extraction + encoding triage ON INGEST, the
    // blocklistGate/contaminationStream shape
    val dir = graft.io.Sinks.scratchRoot + "/extract_stream"
    val docs = Seq(
      (1L, "<p>Hello <b>world</b></p> &amp; more"),
      (2L, "bad \uFFFD byte and caf\u00C3\u00A9 artifact"),
      (3L, "\u041F\u0440\u0438\u0432\u0435\u0442 latin x 12")
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val ops: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "strip" -> (df => TextOps.stripMarkup(df)),
      "enc" -> (df => TextOps.encodingGate(df)),
      "script" -> (df => TextOps.scriptCensus(df)))
    ops.foreach { case (name, op) =>
      val q = op(stream).writeStream.outputMode("append")
        .format("memory").queryName(s"extract_stream_$name").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table(s"extract_stream_$name")
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      val batch = op(docs)
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(streamed === batch, s"stream/batch divergence in $name")
      assert(streamed.size === 3)
    }
  }
}
