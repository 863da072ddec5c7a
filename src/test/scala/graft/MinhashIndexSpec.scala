package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{DedupOps, MinhashIndex}
import graft.io.Sinks

/** Persisted MinHash signature index: the probe-against-store path must
  * find exactly what the one-shot LSH self-join finds (restricted to
  * cross-side pairs), appends must be retry-safe, probes side-effect
  * free, and intra-batch pairs are out of probe's contract (they belong
  * to the within-batch curate step).
  */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // even ids = corpus, odd = batch; 2/3/5 share the long sentence
  // (3 and 5 are an INTRA-batch exact dup), 1/4 are distinct
  private val base = "the quick brown fox jumps over the lazy dog again"
  private def docs: DataFrame = Seq(
    (1L, "completely unrelated text about spark aggregation plans"),
    (2L, base + " and once more for good measure"),
    (3L, base + " and once more for good measures"),
    (4L, "another distinct even document with its own content here"),
    (5L, base + " and once more for good measures")
  ).toDF("doc_id", "text")

  private val (n, k, bands, tau) = (4, 16, 8, 0.5)

  private def normalized(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => if (a % 2 == 0) (a, b, j) else (b, a, j) }
      .toSet

  test("build + ingest finds exactly the one-shot cross-side pairs; " +
       "intra-batch pairs are out of contract") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex"
    Sinks.dropTable(spark, root)
    MinhashIndex.build(docs.filter($"doc_id" % 2 === 0),
                       "doc_id", "text", root, n, k, bands)
    val got = normalized(
      MinhashIndex.ingest(docs.filter($"doc_id" % 2 === 1),
                          "doc_id", "text", root, tau))
    val oneShot = normalized(
      DedupOps.minhashLshPairsFromSets(
        DedupOps.hashedSets(docs, "doc_id", "text", n), k, bands, tau)
        .filter(col("id_a") % 2 =!= col("id_b") % 2))
    assert(got === oneShot)
    assert(got.map(t => (t._1, t._2)) === Set((2L, 3L), (2L, 5L)))
    // the intra-batch exact dup (3,5) is NOT probe output
    assert(!got.exists(t => Set(t._1, t._2) === Set(3L, 5L)))
  }

  test("replay after a crash BETWEEN the two appends restores the " +
       "missing band postings (each append anti-joins its own store)") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex_crash"
    Sinks.dropTable(spark, root)
    MinhashIndex.build(docs.filter($"doc_id" % 2 === 0),
                       "doc_id", "text", root, n, k, bands)
    val batch = docs.filter($"doc_id" % 2 === 1)
    // simulate the crash window: the sets append committed, the
    // buckets append did not (the ingest epoch died in between)
    val crashed = DedupOps.hashedSets(batch, "doc_id", "text", n)
    crashed.write.mode("append").parquet(s"$root/sets")
    crashed.unpersist()
    Sinks.invalidate(spark, root)
    assert(!spark.read.parquet(s"$root/buckets")
      .select("id").as[Long].collect().toSet.contains(3L))
    // replay the epoch: sets must no-op (no double insert), buckets
    // must FILL IN — sets-presence as the proxy for both blocked this
    // forever and left the docs invisible to every future probe
    MinhashIndex.append(batch, "doc_id", "text", root)
    val bucketIds = spark.read.parquet(s"$root/buckets")
      .select("id").as[Long].collect().toSet
    assert(Set(1L, 3L, 5L).subsetOf(bucketIds), s"$bucketIds")
    assert(spark.read.parquet(s"$root/sets")
      .filter($"id" === 3L).count() === 1L)
    // and the healed docs are probe-visible: a fresh near-dup of the
    // shared sentence now matches the odd-id members too
    val pairs = MinhashIndex.probe(
      Seq((9L, base + " and once more for good measur"))
        .toDF("doc_id", "text"),
      "doc_id", "text", root, tau)
      .select($"id_a").as[Long].collect().toSet
    assert(pairs.contains(3L), s"probe should reach the healed doc: $pairs")
    spark.catalog.clearCache()
  }

  test("probe maxBucket: a hot stored bucket drops its fan-out, " +
       "narrow matches survive, cap 0 is exact") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex_cap"
    Sinks.dropTable(spark, root)
    // standing corpus: a 20-doc boilerplate cluster (identical text →
    // one width-20 stored bucket per band) + one distinct doc
    val boiler = "breaking news site navigation copyright footer text"
    val corpus = ((0L until 40L by 2L).map(i => (i, boiler)) :+
      ((100L, "the quick brown fox jumps over the lazy dog today")))
      .toDF("doc_id", "text")
    MinhashIndex.build(corpus, "doc_id", "text", root, n, k, bands)
    // batch: one boilerplate variant + one fox variant (odd ids)
    val batch = Seq(
      (201L, boiler),
      (203L, "the quick brown fox jumps over the lazy dog y'day"))
      .toDF("doc_id", "text")
    def run(cap: Long) =
      MinhashIndex.probe(batch, "doc_id", "text", root, tau,
                         maxBucket = cap)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val exact = run(0L)
    // uncapped: the boiler batch doc matches all 20 cluster members,
    // the fox doc matches its standing twin
    assert(exact.size === 21 && exact.contains((100L, 203L)), s"$exact")
    // capped at 10: the width-20 stored buckets drop in every band, so
    // the boilerplate fan-out vanishes; the width-1 fox bucket survives
    assert(run(10L) === Set((100L, 203L)))
    // a cap nothing exceeds changes nothing
    assert(run(50L) === exact)
  }

  test("append is retry-safe and probe is side-effect free") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex_retry"
    Sinks.dropTable(spark, root)
    MinhashIndex.build(docs.filter($"doc_id" % 2 === 0),
                       "doc_id", "text", root, n, k, bands)
    MinhashIndex.append(docs.filter($"doc_id" % 2 === 1),
                        "doc_id", "text", root)
    val sets1 = spark.read.parquet(s"$root/sets").count()
    val buckets1 = spark.read.parquet(s"$root/buckets").count()
    assert(sets1 === 5L)
    // re-delivered batch: no double insert
    MinhashIndex.append(docs.filter($"doc_id" % 2 === 1),
                        "doc_id", "text", root)
    assert(spark.read.parquet(s"$root/sets").count() === sets1)
    assert(spark.read.parquet(s"$root/buckets").count() === buckets1)
    // probing mutates nothing; an id already in the index never
    // self-matches
    val probed = MinhashIndex.probe(docs.filter($"doc_id" === 3),
                                    "doc_id", "text", root, tau)
    assert(probed.filter(col("id_a") === col("id_b")).isEmpty)
    // 3 is near-dup of index members 2 and 5 (5 was appended)
    assert(normalized(probed).map(t => (t._1, t._2)) ===
      Set((2L, 3L), (5L, 3L)).map { case (a, b) =>
        if (a % 2 == 0) (a, b) else (b, a) })
    assert(spark.read.parquet(s"$root/sets").count() === sets1)
  }

  test("forget masks probes immediately, compactIndex erases " +
       "physically, re-append only possible after compaction") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex_forget"
    Sinks.dropTable(spark, root)
    MinhashIndex.build(docs.filter($"doc_id" % 2 === 0),
                       "doc_id", "text", root, n, k, bands)
    val batch3 = docs.filter($"doc_id" === 3)
    assert(normalized(MinhashIndex.probe(batch3, "doc_id", "text",
                                         root, tau))
      .map(t => (t._1, t._2)) === Set((2L, 3L)))
    // logical forget: probe stops matching NOW, bytes remain
    MinhashIndex.forget(docs.filter($"doc_id" === 2).select("doc_id"),
                        "doc_id", root)
    assert(MinhashIndex.probe(batch3, "doc_id", "text", root, tau)
      .isEmpty)
    assert(spark.read.parquet(s"$root/sets").count() === 2L)
    // a tombstoned id is still physically present: append must skip it
    MinhashIndex.append(
      docs.filter($"doc_id" === 2).withColumn("text", lit("new life")),
      "doc_id", "text", root)
    assert(spark.read.parquet(s"$root/sets").count() === 2L)
    // physical erasure: only doc 4 survives, tombstones cleared
    MinhashIndex.compactIndex(spark, root)
    assert(spark.read.parquet(s"$root/sets").select("id")
      .as[Long].collect().toSeq === Seq(4L))
    assert(spark.read.parquet(s"$root/buckets").select("id")
      .as[Long].collect().toSet === Set(4L))
    assert(!new java.io.File(s"$root/tombstones").exists())
    assert(MinhashIndex.probe(batch3, "doc_id", "text", root, tau)
      .isEmpty)
    // now the id is free again
    MinhashIndex.append(docs.filter($"doc_id" === 2),
                        "doc_id", "text", root)
    assert(spark.read.parquet(s"$root/sets").count() === 2L)
    assert(normalized(MinhashIndex.probe(batch3, "doc_id", "text",
                                         root, tau))
      .map(t => (t._1, t._2)) === Set((2L, 3L)))
  }

  test("ingestStream: epochs equal sequential batch ingests; a replayed " +
       "epoch reproduces its pairs bit-for-bit") {
    val root = s"${Sinks.scratchRoot}/spec_mhindex_stream"
    Sinks.dropTable(spark, root)
    val idx = s"$root/idx"; val twin = s"$root/twin"
    val inDir = s"$root/in"; val pairsOut = s"$root/pairs"
    val ckpt = s"$root/ckpt"
    val even = docs.filter($"doc_id" % 2 === 0)
    MinhashIndex.build(even, "doc_id", "text", idx, n, k, bands)
    MinhashIndex.build(even, "doc_id", "text", twin, n, k, bands)
    val b1 = docs.filter($"doc_id" === 1 || $"doc_id" === 3)
    val b2 = docs.filter($"doc_id" === 5)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(inDir)
      val q = MinhashIndex.ingestStream(stream, "doc_id", "text", idx,
                                        tau, pairsOut, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().toSet
    b1.coalesce(1).write.mode("append").parquet(inDir); runOnce()
    b2.coalesce(1).write.mode("append").parquet(inDir); runOnce()
    val e0 = pairsOf(spark.read.parquet(s"$pairsOut/batch_id=0"))
    val e1 = pairsOf(spark.read.parquet(s"$pairsOut/batch_id=1"))
    assert(e0 === pairsOf(
      MinhashIndex.ingest(b1, "doc_id", "text", twin, tau)))
    assert(e1 === pairsOf(
      MinhashIndex.ingest(b2, "doc_id", "text", twin, tau)))
    // epoch 1 sees doc 3 (appended by epoch 0) as an index member
    assert(e1.map(t => (t._1, t._2)) === Set((2L, 5L), (3L, 5L)))
    // replay the at-least-once window: batch 2's ids are already in the
    // index, yet the probe reproduces epoch 1 exactly (probe = batch vs
    // index MINUS batch) and the index does not grow
    val setsN = spark.read.parquet(s"$idx/sets").count()
    assert(pairsOf(
      MinhashIndex.ingest(b2, "doc_id", "text", idx, tau)) === e1)
    assert(spark.read.parquet(s"$idx/sets").count() === setsN)
  }

  test("probeWith releases the probe's pinned frames after the action " +
       "(the long-lived-session shape); bare probe leaves them to the " +
       "caller") {
    val root = s"${Sinks.scratchRoot}/spec_mh_probewith"
    Sinks.dropTable(spark, root)
    MinhashIndex.build(docs.filter($"doc_id" % 2 === 0),
                       "doc_id", "text", root, n, k, bands)
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val found = MinhashIndex.probeWith(
      docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text", root, tau) {
      pairs => pairs.count()
    }
    assert(found >= 1L, "probe found the planted near-dups")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty,
      s"probeWith leaked pinned frames: ${after.diff(before)}")
    spark.catalog.clearCache()
  }
}
