package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away into the deep dark woods tonight while everyone is asleep inside", "en"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away into the deep dark woods tonight while everyone is asleep inside", "en"),
    (3L, "a completely different english document about databases and distributed systems covering partitioning shuffles joins and aggregation in detail", "en"),
    (4L, "yet another unrelated english text that discusses compilers optimizers register allocation and instruction scheduling at some length here", "en")
  ).toDF("doc_id", "text", "lang")

  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("capture releases exactly the operator's caches — curate twice " +
       "in one session leaves no stale RDDs") {
    spark.catalog.clearCache()
    for (_ <- 1 to 2) {
      val before = pinnedIds
      val (out, release) = CacheScope.capture {
        CorpusPipeline.curate(docsDf, "en", tau = 0.6, minTokens = 10)
      }
      assert(out.select($"doc_id").as[Long].collect().toSet
               === Set(1L, 3L, 4L))
      assert(pinnedIds.size > before.size,
             "curate should have pinned internal frames")
      release()
      assert(pinnedIds === before,
             "release() must drop every frame the capture registered")
    }
  }

  test("capture does not touch caches pinned OUTSIDE the scope") {
    spark.catalog.clearCache()
    val unrelated = Seq(1, 2, 3).toDF("x").cache()
    unrelated.count()
    val kept = pinnedIds
    assert(kept.nonEmpty)
    val (pairs, release) = CacheScope.capture {
      dedup.DedupOps.minhashLshPairs(docsDf, "doc_id", "text",
                                     n = 5, k = 32, bands = 8, tau = 0.8)
    }
    pairs.count()
    release()
    assert(pinnedIds === kept,
           "the session's own cached table must survive release()")
    unrelated.unpersist(true)
  }

  test("withScope releases on failure; no-scope register is a no-op " +
       "passthrough") {
    spark.catalog.clearCache()
    val before = pinnedIds
    intercept[RuntimeException] {
      CacheScope.withScope {
        val sets = dedup.DedupOps.hashedSets(docsDf, "doc_id", "text", 5)
        sets.count() // materialize the pin inside the scope
        sets
      } { _ => throw new RuntimeException("boom") }
    }
    assert(pinnedIds === before, "withScope must release on failure")
    // outside any scope the operators still pin (and clearCache releases)
    val sets = dedup.DedupOps.hashedSets(docsDf, "doc_id", "text", 5)
    sets.count()
    assert(pinnedIds.size > before.size)
    spark.catalog.clearCache()
  }
}
