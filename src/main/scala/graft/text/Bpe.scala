package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training + encoding (Sennrich et al.,
  * ACL 2016) — the learned-merges tokenizer a training-data pipeline
  * runs where `buildVocab`/`encodeDocs` stop at whole words.
  *
  * Scale shape (the reason this is corpus-scale-safe): training never
  * iterates over the corpus. ONE aggregation collapses 100 TB of text
  * into the word-frequency frame — its size is the DISTINCT vocabulary
  * (millions of rows at web scale, not billions of documents) — and
  * every merge round then runs on that tiny frame alone: explode
  * adjacent symbol pairs, one weighted count, one 1-row argmax action
  * (the CC-loop convergence-probe shape), one mapped merge pass. Each
  * round's frame is persisted eagerly and its predecessor released
  * (the pqTrain/ivfTrain lineage discipline), so round i+1's plan does
  * not replay rounds 1..i.
  *
  * RNG-free and fully deterministic: ties in pair frequency break
  * lexicographically on (left, right) — re-running training on the
  * same corpus yields the identical merge table (spec-pinned).
  *
  * Reference anchor: the reference has no tokenizer at all (its text
  * processing is row-level SQL, dags/nyc_taxi_pipeline_dag.py) — this
  * is north-star LLM-extension scope.
  */
object Bpe {

  /** (word, cnt) over whitespace tokens — the one corpus-wide pass. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** One left-to-right greedy merge pass of pair (x, y) → xy over a
    * symbol array: the classic BPE application step (an element just
    * produced by a merge does not re-merge with the next element —
    * "aaa" under (a,a) becomes [aa, a], not [aa, aa]).
    */
  private def mergePair(sym: Column, x: Column, y: Column): Column =
    aggregate(sym,
      array().cast("array<string>"),
      (out, s) =>
        when(size(out) > 0 && element_at(out, -1) === x && s === y,
             concat(slice(out, lit(1), size(out) - 1),
                    array(concat(x, y))))
          .otherwise(concat(out, array(s))))

  /** Adjacent symbol pairs of each word, weighted by word count. */
  private def pairCounts(wf: DataFrame): DataFrame = {
    val n1 = greatest(size(col("sym")) - 1, lit(0))
    wf.select(col("cnt"),
        explode(zip_with(slice(col("sym"), lit(1), n1),
                         slice(col("sym"), lit(2), n1),
                         (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("freq"))
  }

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * table (rank, left, right, freq) in training order — rank r was the
    * highest-frequency adjacent pair after merges 0..r-1, ties broken
    * (freq desc, left asc, right asc). Stops early when no adjacent
    * pair remains (every word fused to one symbol).
    */
  /** Vocabulary-row gate for the driver training/encode regime: BPE's
    * working set IS the distinct vocabulary (bounded at any corpus
    * scale — the model-artifact discipline), so at or below the gate
    * the vocab collects once and the merge rounds run as a scalar loop
    * (the classic single-node BPE trainer) — zero cluster round-trips
    * per round. Above it, the distributed loop runs unchanged.
    */
  val DriverVocabGate: Long = 1L << 17

  /** Split a word into per-CODE-POINT symbols — the driver twin of
    * Spark's `split(col, "")`, which advances by code point. Java's
    * `String.split("")` advances by UTF-16 code unit, shearing any
    * supplementary-plane character (emoji, rare CJK) into two lone
    * surrogates — the regimes would then count different pairs and
    * train different merge tables for the same corpus.
    */
  private def codePointSplit(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Spark's string ordering is unsigned UTF-8 byte order — the driver
    * regime's tie-breaks must match it exactly (Java String compareTo
    * is UTF-16 and differs beyond the BMP).
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver twin of `mergePair` — the same left-to-right greedy
    * non-remerge pass (a symbol just produced never re-merges as the
    * LEFT side within its pass), on plain arrays.
    */
  private def mergePassDriver(sym: Array[String], l: String,
                              r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toArray
  }

  /** Driver regime of `bpeTrain`: one collect of the (word, cnt)
    * vocabulary, then the identical rounds — integer pair counts (no
    * FP), argmax on (freq desc, left asc, right asc) in Spark's
    * unsigned-UTF-8 string order, `mergePair`'s exact pass semantics,
    * the same early stop. Spec-pinned ≡ the distributed twin.
    */
  private def bpeTrainDriver(wf: Array[(String, Long)], numMerges: Int,
                             spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    var syms: Array[(Array[String], Long)] =
      wf.map { case (w, c) => (codePointSplit(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val freq = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          freq(k) = freq.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (freq.isEmpty) done = true
      else {
        val ((l, rr), f) = freq.minBy { case ((a, b), c) =>
          (c, a, b)
        }(Ordering.Tuple3(Ordering.Long.reverse,
          Ordering.fromLessThan[String](utf8Lt),
          Ordering.fromLessThan[String](utf8Lt)))
        merges += ((r, l, rr, f))
        syms = syms.map { case (s, c) => (mergePassDriver(s, l, rr), c) }
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  def bpeTrain(docs: DataFrame, textCol: String,
               numMerges: Int,
               gate: Long = DriverVocabGate): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1 (got $numMerges)")
    val spark0 = docs.sparkSession
    // ONE corpus pass serves the gate probe AND whichever regime runs:
    // the eager checkpoint freezes the (word, cnt) vocabulary, so an
    // above-gate corpus is not scanned a second time by the
    // distributed rounds (the probe's limit-collect alone used to
    // leave the distributed regime re-deriving wordFreq from docs)
    val wfCp = wordFreq(docs, textCol).localCheckpoint()
    val wf = wfCp.limit(gateLimit(gate)).collect()
    if (wf.length <= gate)
      return bpeTrainDriver(
        wf.map(r => (r.getString(0), r.getLong(1))), numMerges, spark0)
    bpeTrainFromWf(wfCp, numMerges)
  }

  /** The above-gate regime of `bpeTrain` — the distributed rounds;
    * `private[graft]` so BpeSpec can pin driver ≡ distributed.
    */
  private[graft] def bpeTrainDistributed(docs: DataFrame, textCol: String,
                                         numMerges: Int): DataFrame =
    bpeTrainFromWf(wordFreq(docs, textCol), numMerges)

  private def bpeTrainFromWf(wf0: DataFrame, numMerges: Int): DataFrame = {
    val spark = wf0.sparkSession
    // localCheckpoint per round, NOT the persist+unpersist chain the
    // other training loops use: every round rewrites the whole frame,
    // so a cache chain makes round r+1's LOGICAL plan embed all rounds
    // 1..r (caches shorten execution, not analysis — Catalyst re-derived
    // the growing merge-lambda tree every action, ~1.5 s/round by round
    // 16 at sf0.1), and unpersisting mid-loop cascades into re-caching
    // dependents from the original corpus lineage. The checkpoint cuts
    // the plan to a constant-size LogicalRDD: rounds never re-touch the
    // corpus and round cost stays flat. Blocks are vocabulary-sized;
    // dropped references are swept by the ContextCleaner.
    var wf = wf0
      .select(split(col("word"), "").as("sym"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val best = pairCounts(wf)
        .orderBy(col("freq").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true // fully fused: nothing left to merge
      else {
        val b = best(0)
        val (l, rr, f) = (b.getString(0), b.getString(1), b.getLong(2))
        merges += ((r, l, rr, f))
        wf = wf.select(mergePair(col("sym"), lit(l), lit(rr)).as("sym"),
                       col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Encode documents with a trained merge table: split each token to
    * characters, then replay the merges in rank order — the greedy
    * deterministic BPE encode. The merge table is a model artifact
    * (numMerges rows), folded into the projection as literals — the
    * broadcast-codebook discipline.
    *
    * Encoding is a pure function of the WORD, so the merge fold (the
    * expensive part) runs over the DISTINCT vocabulary once, never per
    * token instance (the per-instance form re-paid the fold per token —
    * 580 000× more fold work than the vocabulary needs on the bench
    * corpus, and at 100 TB the vocabulary is bounded while token
    * instances are not). At or below `DriverVocabGate` the word →
    * symbols table folds on the driver and embeds as a MAP LITERAL in
    * one projection — a per-token hash lookup, zero joins, zero
    * shuffles over the corpus; above the gate the encodings are built
    * in-plan over the distinct vocab and broadcast-joined back, with
    * per-doc order reassembled from token positions (array_sort over
    * (pos, syms) structs — bounded per doc).
    *
    * Returns (idCol…, bpe: array<string>) where `bpe` is the
    * concatenation of each token's merged symbols in token order —
    * `concat_ws("", bpe)` per token restores the original text's
    * tokens exactly (encode∘decode = id; spec-pinned). Null text
    * encodes to null; tokenless text to an empty array.
    */
  /** Clamp a (possibly huge) gate to a usable `limit(n+1)` probe size. */
  private def gateLimit(gate: Long): Int =
    math.min(gate, (Int.MaxValue - 1).toLong).toInt + 1

  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: DataFrame,
                gate: Long = DriverVocabGate): DataFrame = {
    val table = merges.orderBy(col("rank").asc)
      .select(col("left"), col("right"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val toks = docs.select(col(idCol),
                           TextOps.tokens(col(textCol)).as("__toks"))
    // the corpus vocabulary (size-gated: the same bounded artifact the
    // trainer collects) — checkpointed so the above-gate branch folds
    // over THIS frame instead of re-running the distinct corpus pass
    // the probe already paid
    val vocabDf = toks.select(explode(col("__toks")).as("__w")).distinct()
      .localCheckpoint()
    val vocab = vocabDf
      .limit(gateLimit(gate)).collect().map(_.getString(0))
    if (vocab.length <= gate) {
      // word → symbols as a MAP LITERAL inside one projection: a
      // per-token hash lookup, zero joins, zero shuffles — the corpus
      // is touched by exactly one narrow codegen'd pass (the merge
      // fold runs |vocab| times on the driver, never per instance)
      val encMap: Map[String, Seq[String]] = vocab.map { w =>
        w -> table.foldLeft(codePointSplit(w)) {
          case (s, (l, r)) => mergePassDriver(s, l, r)
        }.toSeq
      }.toMap
      toks.select(col(idCol),
        flatten(transform(col("__toks"),
                          t => element_at(typedLit(encMap), t)))
          .as("bpe"))
    } else {
      // unbounded-vocab fallback: fold over the distinct vocab in-plan
      // and broadcast-join the encodings back onto the token stream
      // (fold cost still scales with |vocab|, not corpus tokens)
      def encodeTok(t: Column): Column =
        table.foldLeft(split(t, ""): Column) {
          case (sym, (l, rr)) => mergePair(sym, lit(l), lit(rr))
        }
      val vocabEnc = broadcast(
        vocabDf.select(col("__w"), encodeTok(col("__w")).as("__syms")))
      val enc = toks
        .select(col(idCol),
                posexplode(col("__toks")).as(Seq("__p", "__w")))
        .join(vocabEnc, "__w")
        .groupBy(col(idCol))
        .agg(flatten(transform(
               array_sort(collect_list(struct(col("__p"),
                                              col("__syms")))),
               e => e.getField("__syms"))).as("__bpe"))
      toks.join(enc, Seq(idCol), "left_outer")
        .select(col(idCol),
                when(col("__toks").isNull, lit(null))
                  .otherwise(coalesce(col("__bpe"),
                                      array().cast("array<string>")))
                  .as("bpe"))
    }
  }
}
