package graft

import graft.text.TextOps

/** Pins the null-text chunking contract: no text → no chunks. Without
  * the guard in chunkDocs, a null propagates asymmetrically through the
  * array builders (size→null, greatest→0, least→chunkTokens) and emits a
  * phantom ("", chunkTokens) row — whose chunk also renders "" in Spark
  * but NULL in SQL engines, an engine-visible divergence that would
  * poison every downstream packing sum.
  */
class NullChunkCheckSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: null text yields no chunks; empty text one 0-chunk") {
    val docs = Seq((1L, Option("a b c d e f")),
                   (2L, Option.empty[String]),
                   (3L, Option(""))).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, "text", chunkTokens = 50,
                                overlap = 10)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(out === Set((1L, 0L, "a b c d e f", 6L),
                       (3L, 0L, "", 0L)))
  }
}
