package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, TextOps}

/** BPE merge training + encoding: hand-computed classic example,
  * determinism, encode∘decode identity, monotone compression.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic low/lower/newest/widest merges, hand-computed") {
    // Sennrich et al.'s running example (char-level, no end-marker).
    // Hand-derived: pair counts 'es'=9 'st'=9 tie -> (e,s) wins lexically;
    // then (es,t)=9; then 'lo'=7 'ow'=7 tie -> (l,o); then (lo,w)=7;
    // then 6-way tie (e,w)/(n,e)/(w,est) -> (e,w) lexically first.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val merges = Bpe.bpeTrain(Seq((1L, corpus)).toDF("doc_id", "text"),
                              "text", numMerges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges === Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L),
      (3, "lo", "w", 7L), (4, "e", "w", 6L)))
    spark.catalog.clearCache()
  }

  test("training is deterministic: identical merge table across runs") {
    val docs = Tables.load(spark, sfDir, "documents")
    def run() = Bpe.bpeTrain(docs, "text", numMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(run() === run())
    spark.catalog.clearCache()
  }

  test("encode then decode restores every document's tokens") {
    import spark.implicits._
    // the appended emoji doc pins code-point splitting through the
    // driver encode map (a surrogate shear would break the round-trip)
    val docs = Tables.load(spark, sfDir, "documents").limit(100)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((100000L, "go😀al go😀od plain"))
        .toDF("doc_id", "text"))
    val merges = Bpe.bpeTrain(docs, "text", numMerges = 10)
    val bad = Bpe.bpeEncode(docs, "doc_id", "text", merges)
      .join(docs, "doc_id")
      .filter(concat_ws("", col("bpe")) =!=
                concat_ws("", TextOps.tokens(col("text"))))
      .count()
    assert(bad === 0L)
    spark.catalog.clearCache()
  }

  test("compression is monotone in the number of merges") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    def totalSymbols(numMerges: Int): Long = {
      val m = Bpe.bpeTrain(docs, "text", numMerges)
      Bpe.bpeEncode(docs, "doc_id", "text", m)
        .agg(sum(size(col("bpe")))).head().getLong(0)
    }
    val chars = docs
      .agg(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .head().getLong(0)
    val s4 = totalSymbols(4); val s12 = totalSymbols(12)
    assert(s4 <= chars, s"4 merges must not exceed char count: $s4 > $chars")
    assert(s12 <= s4, s"more merges must not inflate: $s12 > $s4")
    assert(s12 < chars, "12 merges compressed nothing")
    spark.catalog.clearCache()
  }

  test("driver-regime bpeTrain ≡ distributed bpeTrain (ranks, pairs, freqs)") {
    import spark.implicits._
    // irregular multi-word docs with repeated substructure and ties —
    // the emoji words pin the code-point split contract: Spark's
    // split(col, "") advances by code point, and the driver regime
    // must NOT shear the supplementary-plane char into surrogates
    // (Java String.split("")'s behavior) or the regimes count
    // different pairs
    val docs = Seq(
      "low lower lowest low low", "new newer newest wide widest",
      "wide wider lowest newest", "low wide new new newer",
      "go😀al go😀al go😀od"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def slurp(df: org.apache.spark.sql.DataFrame) =
      df.select($"rank".cast("int"), $"left", $"right",
                $"freq".cast("long"))
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val drv = slurp(graft.text.Bpe.bpeTrain(docs, "text", numMerges = 12))
    val dst = slurp(graft.text.Bpe.bpeTrainDistributed(docs, "text",
                                                       numMerges = 12))
    assert(drv === dst)
  }

  test("early-stop: a fully fusable corpus stops before numMerges") {
    // one word repeated: after len-1 merges everything is one symbol
    val merges = Bpe.bpeTrain(
      Seq((1L, "abc abc abc")).toDF("doc_id", "text"), "text",
      numMerges = 50)
    assert(merges.count() === 2L) // (a,b) then (ab,c)
    spark.catalog.clearCache()
  }
}
