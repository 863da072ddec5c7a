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
  def bpeTrain(docs: DataFrame, textCol: String,
               numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1 (got $numMerges)")
    val spark = docs.sparkSession
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
    var wf = wordFreq(docs, textCol)
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
    * broadcast-codebook discipline, no join, no corpus shuffle; one
    * narrow pass over the documents.
    *
    * Returns (idCol…, bpe: array<string>) where `bpe` is the
    * concatenation of each token's merged symbols in token order —
    * `concat_ws("", bpe)` per token restores the original text's
    * tokens exactly (encode∘decode = id; spec-pinned).
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: DataFrame): DataFrame = {
    val table = merges.orderBy(col("rank").asc)
      .select(col("left"), col("right"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def encodeTok(t: Column): Column =
      table.foldLeft(split(t, ""): Column) {
        case (sym, (l, rr)) => mergePair(sym, lit(l), lit(rr))
      }
    docs.select(col(idCol),
      flatten(transform(TextOps.tokens(col(textCol)), encodeTok(_)))
        .as("bpe"))
  }
}
