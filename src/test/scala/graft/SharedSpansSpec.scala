package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupOps

/** Cross-document exact-substring dedup (sharedSpans): planted-quote
  * retrieval, maximality, and a lockstep-walk brute-force equivalence
  * property on random low-alphabet strings.
  */
class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], n: Int, minLen: Int,
                    maxDf: Long = 0L): Set[(Long, Long, Int, Int, Long)] =
    DedupOps.sharedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
                         n, minLen, maxDf)
      .as[(Long, Long, Int, Int, Long)].collect().toSet

  test("planted 60-token quote across two documents is found exactly") {
    // the Lee et al. motivating case: a long verbatim quotation inside
    // two otherwise-unrelated documents
    // flanks are DISTINCT chars ('<'/'>' vs '{'/'}'): a shared space on
    // either side would itself be part of the maximal span
    val quote = (1 to 60).map(i => s"w$i").mkString(" ")
    val docA = "alpha preamble before the quotation<" + quote + ">tail of A"
    val docB = "a different opening{" + quote + "}and B continues its way"
    val got = spans(Seq((10L, docA), (20L, docB)), n = 25, minLen = 50)
    val sa = docA.indexOf(quote) + 1 // 1-based
    val sb = docB.indexOf(quote) + 1
    // exactly the quote: maximal (the flanking chars differ), char-exact
    assert(got === Set((10L, 20L, sa, sb, quote.length.toLong)))
  }

  test("identical documents share one full-length span; short overlap none") {
    // all-distinct chars: any repeated alphabet block would self-match
    // on off-zero diagonals (26-char period) and legitimately add spans
    val text = ('a' to 'z').mkString + "0123456789"
    val got = spans(Seq((1L, text), (2L, text)), n = 10, minLen = 20)
    assert(got === Set((1L, 2L, 1, 1, text.length.toLong)))
    // overlap below minLen never appears
    val shared = "commonpiece" // 11 chars < minLen=20
    val none = spans(Seq((1L, "AAAA " + shared), (2L, "BBBBBB " + shared)),
                     n = 5, minLen = 20)
    assert(none.isEmpty)
  }

  test("a quote repeated twice in one doc yields two spans (two diagonals)") {
    val q = "0123456789abcdefghij" // 20 chars
    val docA = "leftpad<" + q + ">rightpad"
    val docB = "start{" + q + "}middlefiller[" + q + "]end"
    val got = spans(Seq((1L, docA), (2L, docB)), n = 10, minLen = 20)
    val sa = docA.indexOf(q) + 1
    val sb1 = docB.indexOf(q) + 1
    val sb2 = docB.indexOf(q, sb1) + 1
    assert(got === Set((1L, 2L, sa, sb1, 20L), (1L, 2L, sa, sb2, 20L)))
  }

  test("matches a lockstep-walk brute force on random 2-letter strings") {
    // every maximal equality run >= minLen over every doc pair and every
    // alignment offset — the definition, computed directly
    def brute(docs: Seq[(Long, String)], n: Int,
              minLen: Int): Set[(Long, Long, Int, Int, Long)] = {
      val out = Set.newBuilder[(Long, Long, Int, Int, Long)]
      for {
        (ia, a) <- docs; (ib, b) <- docs if ia < ib
        d <- -(b.length - 1) to (a.length - 1)
      } {
        var i = math.max(0, d)
        val end = math.min(a.length, b.length + d)
        while (i < end) {
          if (a(i) == b(i - d)) {
            var j = i
            while (j < end && a(j) == b(j - d)) j += 1
            if (j - i >= minLen)
              out += ((ia, ib, i + 1, i - d + 1, (j - i).toLong))
            i = j
          } else i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 3) {
      val docs = (0L until 8L).map(id =>
        (id, Seq.fill(30 + rnd.nextInt(30))(
           if (rnd.nextBoolean()) 'a' else 'b').mkString))
      val n = 5; val minLen = 8
      assert(spans(docs, n, minLen) === brute(docs, n, minLen),
             s"round $round, docs=$docs")
    }
  }

  test("removeSharedSpans cuts the span from the higher-id doc only") {
    import spark.implicits._
    val quote = (1 to 60).map(i => s"w$i").mkString(" ")
    val docA = "alpha preamble before the quotation<" + quote + ">tail of A"
    val docB = "a different opening{" + quote + "}and B continues its way"
    val docs = Seq((10L, docA), (20L, docB)).toDF("doc_id", "text")
    val spans = DedupOps.sharedSpans(docs, "doc_id", "text",
                                     n = 25, minLen = 50)
    val got = DedupOps.removeSharedSpans(docs, spans, "doc_id", "text")
      .as[(Long, Long, String)].collect().toSet
    // only doc 20 (the higher id) is affected; the quote vanishes whole
    assert(got === Set(
      (20L, quote.length.toLong, "a different opening{}and B continues its way")))
    // the deduped pair shares nothing >= minLen anymore
    val after = Seq((10L, docA),
                    (20L, "a different opening{}and B continues its way"))
      .toDF("doc_id", "text")
    assert(DedupOps.sharedSpans(after, "doc_id", "text",
                                n = 25, minLen = 50).isEmpty)
  }

  test("overlapping and adjacent cut intervals merge before splicing") {
    import spark.implicits._
    // doc 5 shares [3,20) with doc 1 and [15,32) with doc 2 (overlap),
    // plus [32, 40) with doc 3 (adjacent) — the cuts must merge into
    // ONE [3,40) interval, never double-remove the overlap
    val base = "XY0123456789abcdefghijklmnopqrstuvwxyzZW"
    val seg1 = base.substring(2, 19)   // chars 3..19 (1-based)
    val seg2 = base.substring(14, 31)  // chars 15..31
    val seg3 = base.substring(31, 39)  // chars 32..39
    val docs = Seq(
      (1L, "A<" + seg1 + ">a"), (2L, "B[" + seg2 + "]b"),
      (3L, "C(" + seg3 + seg3 + ")c"), // long enough to pair at n=8
      (5L, base)
    ).toDF("doc_id", "text")
    val spans = DedupOps.sharedSpans(docs, "doc_id", "text",
                                     n = 8, minLen = 8)
    val got = DedupOps.removeSharedSpans(docs, spans, "doc_id", "text")
      .filter($"doc_id" === 5L)
      .as[(Long, Long, String)].collect()
    assert(got.length === 1)
    val (_, removed, clean) = got(0)
    // every removed range lay inside the merged cut; the survivors are
    // a prefix and a suffix of the original
    assert(clean.startsWith("XY") && base.endsWith(clean.drop(2)))
    assert(removed === (base.length - clean.length).toLong)
    assert(!clean.contains(seg1.take(8)) && !clean.contains(seg2.take(8)))
  }

  test("sharedSpansBetween finds benchmark quotes and composes with removal") {
    import spark.implicits._
    // a corpus doc quoting a benchmark item verbatim: the span is found
    // with the corpus doc on the id_b (removal) side, and the composed
    // cut leaves the rest of the document intact
    val item = "What is the capital of France? Paris is the capital."
    val bench = Seq((100L, "intro<" + item + ">outro")).toDF("doc_id", "text")
    val corpusDoc = "Lots of organic text here{" + item + "}and more after"
    val corpus = Seq((7L, corpusDoc), (8L, "unrelated content entirely"))
      .toDF("doc_id", "text")
    val spans = DedupOps.sharedSpansBetween(corpus, bench, "doc_id", "text",
                                            n = 20, minLen = 40)
    val got = spans.as[(Long, Long, Int, Int, Long)].collect().toSet
    assert(got === Set((100L, 7L, bench.head().getString(1).indexOf(item) + 1,
                        corpusDoc.indexOf(item) + 1, item.length.toLong)))
    val cleaned = DedupOps.removeSharedSpans(corpus, spans, "doc_id", "text")
      .as[(Long, Long, String)].collect().toSet
    assert(cleaned === Set(
      (7L, item.length.toLong,
       "Lots of organic text here{}and more after")))
  }

  test("sharedSpansBetween matches the lockstep brute force across two sets") {
    import spark.implicits._
    def brute(bench: Seq[(Long, String)], corpus: Seq[(Long, String)],
              minLen: Int): Set[(Long, Long, Int, Int, Long)] = {
      val out = Set.newBuilder[(Long, Long, Int, Int, Long)]
      for {
        (ia, a) <- bench; (ib, b) <- corpus
        d <- -(b.length - 1) to (a.length - 1)
      } {
        var i = math.max(0, d)
        val end = math.min(a.length, b.length + d)
        while (i < end) {
          if (a(i) == b(i - d)) {
            var j = i
            while (j < end && a(j) == b(j - d)) j += 1
            if (j - i >= minLen)
              out += ((ia, ib, i + 1, i - d + 1, (j - i).toLong))
            i = j
          } else i += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(11)
    def mk(n: Int, id0: Long) = (id0 until id0 + n).map(id =>
      (id, Seq.fill(25 + rnd.nextInt(25))(
         if (rnd.nextBoolean()) 'a' else 'b').mkString))
    for (round <- 0 until 2) {
      val bench = mk(3, 100L); val corpus = mk(6, 0L)
      val got = DedupOps.sharedSpansBetween(
          corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "doc_id", "text", n = 5, minLen = 8)
        .as[(Long, Long, Int, Int, Long)].collect().toSet
      assert(got === brute(bench, corpus, 8), s"round $round")
    }
  }

  test("maxDf prunes hot grams but keeps spans anchored on rare ones") {
    // 40-char boilerplate in 5 docs (hot at maxDf=2); a rarer 30-char
    // quote shared by exactly 2 docs must survive the pruning
    val boiler = "SHARED BOILERPLATE FOOTER TEXT REPEATS X"
    val quote = "a genuinely rare shared quote!"
    val docs = (0L until 5L).map(i => (i, s"doc $i body " + boiler)) ++
      Seq((10L, "first rare host " + quote), (11L, "second host " + quote))
    val pruned = spans(docs, n = 10, minLen = 25, maxDf = 2)
    assert(pruned.exists { case (a, b, _, _, len) =>
      a == 10L && b == 11L && len >= quote.length
    }, s"rare quote lost: $pruned")
    assert(!pruned.exists { case (a, b, _, _, _) => a < 5L && b < 5L },
           s"hot boilerplate pair survived maxDf: $pruned")
    // exact mode keeps everything
    val exact = spans(docs, n = 10, minLen = 25)
    assert(exact.count { case (a, b, _, _, _) => a < 5L && b < 5L } === 10)
  }
}
