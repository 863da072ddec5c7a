package graft

import java.sql.Timestamp

import graft.dedup.DedupOps
import graft.pipeline.CorpusPipeline
import graft.streaming.StreamingOps

/** Degenerate-input behavior: empty frames, single rows, and documents
  * too short to shingle must flow through every composite operator
  * without errors and with the semantically-right (empty) output.
  * These are the inputs a 100 TB pipeline hits constantly at partition
  * granularity (empty partitions, one-doc groups, short documents).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  private val emptyDocs = docs()

  test("corpus curate: empty input → empty output, correct schema") {
    val out = CorpusPipeline.curate(emptyDocs)
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("doc_id", "lang", "n_tokens", "quality_score", "fingerprint"))
  }

  test("near-dup joins: empty and single-doc inputs produce no pairs") {
    assert(DedupOps.ngramJaccardPairs(emptyDocs, "doc_id", "text",
                                      n = 12, tau = 0.7).count() === 0)
    val single = docs((1L, "a reasonable english sentence here", "en"))
    assert(DedupOps.ngramJaccardPairs(single, "doc_id", "text",
                                      n = 12, tau = 0.7).count() === 0)
    assert(DedupOps.minhashLshPairs(single, "doc_id", "text",
                                    n = 12, k = 32, bands = 8,
                                    tau = 0.7).count() === 0)
  }

  test("docs shorter than n (empty shingle sets) never pair — even with " +
       "many of them") {
    // r1 ADVICE: empty-set docs all minhash to identical MaxValue
    // signatures and used to collide in every LSH band; the sz>0 filter
    // must keep them out of banding entirely
    val shorts = docs((1L, "tiny", "en"), (2L, "wee", "en"),
                      (3L, "small", "en"), (4L, "x", "en"))
    assert(DedupOps.ngramJaccardPairs(shorts, "doc_id", "text",
                                      n = 12, tau = 0.7).count() === 0)
    assert(DedupOps.minhashLshPairs(shorts, "doc_id", "text",
                                    n = 12, k = 32, bands = 8,
                                    tau = 0.7).count() === 0)
    // identical short docs dedup exactly (exact path is unaffected)
    val dupShorts = docs((1L, "tiny", "en"), (2L, "tiny", "en"))
    assert(CorpusPipeline.curate(dupShorts, minTokens = 0).count() === 1)
  }

  test("interval join and sessionize: empty and single-event inputs") {
    val empty = Seq.empty[(Long, Timestamp)].toDF("event_id", "ts")
    assert(StreamingOps.intervalJoin(empty, "event_id", "ts",
                                     60000L).count() === 0)
    val one = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "ts")
    assert(StreamingOps.intervalJoin(one, "event_id", "ts",
                                     60000L).count() === 0)
    val emptyUsers = Seq.empty[(Long, Timestamp)].toDF("user_id", "ts")
    assert(graft.streaming.Sessionize.batch(emptyUsers, 30).count() === 0)
  }
}
