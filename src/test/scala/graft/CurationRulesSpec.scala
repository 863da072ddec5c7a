package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Gopher rule report, CCNet perplexity buckets, token-budget sampling. */
class CurationRulesSpec extends SparkSpec {

  private val goodText =
    ("the data and model have converged with " * 8).trim // 64 words, all rules pass

  test("gopherRules: each rule trips on its planted violator") {
    import spark.implicits._
    val docs = Seq(
      1L -> goodText,
      2L -> "too short to pass",                       // word count
      3L -> (("a b c d e f g h " * 8).trim),           // mean word len < 3
      4L -> ((goodText + " ") + ("# " * 20).trim),     // symbol ratio
      5L -> (1 to 60).map(i => s"- bullet $i").mkString("\n"), // bullets
      6L -> (1 to 60).map(i => s"line $i trails...").mkString("\n"), // ellipsis
      7L -> (("42 13 " * 30).trim + " the be"),        // alpha-word ratio
      8L -> (("data model compute scale " * 15).trim), // no 2 stopwords
      9L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8), "good doc must pass overall")
    assert(!r(2L).getBoolean(1) && !r(2L).getBoolean(8))
    assert(!r(3L).getBoolean(2))
    assert(!r(4L).getBoolean(3))
    assert(!r(5L).getBoolean(4))
    assert(!r(6L).getBoolean(5))
    assert(!r(7L).getBoolean(6))
    assert(!r(8L).getBoolean(7))
    // null text: every rule false
    assert((1 to 8).forall(i => !r(9L).getBoolean(i)))
  }

  test("blocklistGate: planted violators flagged with exact term audit; " +
       "clean/null/empty docs pass; normalization on both sides") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a perfectly clean document about data"),
      (2L, "contains one BADWORD in the middle"),       // case-folded hit
      (3L, "slur1 appears and slur2 appears slur1 again"), // 2 distinct hits
      (4L, "badword-ish is NOT a token match badwording"), // substrings don't hit
      (5L, ""),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val bl = Seq("BadWord", " slur1 ", "slur2", "absent").toDF("term")
    val got = TextOps.blocklistGate(docs, bl).orderBy($"doc_id")
      .as[(Long, Long, String, Boolean)].collect().toSeq
    assert(got(0) === ((1L, 0L, "", false)))
    assert(got(1) === ((2L, 1L, "badword", true)))
    assert(got(2) === ((3L, 2L, "slur1,slur2", true)))
    assert(got(3) === ((4L, 0L, "", false)))
    assert(got(4) === ((5L, 0L, "", false)))
    assert(got(5) === ((6L, 0L, "", false)))
  }

  test("blocklistScreened ≡ blocklistGate bit-for-bit on the bench corpus " +
       "(screen has no false negatives; verify kills fp)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val bl = Seq("dup", "vector", " Leak ").toDF("term")
    val exact = TextOps.blocklistGate(docs, bl)
      .as[(Long, Long, String, Boolean)].collect().toSet
    // tiny filter (high fpp) stresses the verify phase specifically
    val screened = TextOps.blocklistScreened(docs, bl,
        bitsPerTerm = 10, k = 2)
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(screened === exact)
    // sharded bitset (the capacity-ceiling knob): same contract
    val sharded = TextOps.blocklistScreened(docs, bl, shards = 3)
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(sharded === exact)
    // at sf0.001: 393 docs contain "dup" and/or "vector", 17 contain
    // both; " Leak " normalizes to a vocabulary miss (DuckDB-verified)
    assert(exact.count(_._4) === 393)
    assert(exact.count(_._2 == 2L) === 17)
  }

  test("splitByFractions: 14:1:1 reproduces trainSplit bit-for-bit; " +
       "fractions respected; null text unassigned; production mode valid") {
    import spark.implicits._
    import graft.text.Hashing
    val docs = Tables.load(spark, sfDir, "documents")
    // the special-case theorem: first-hex-digit < 'e' IS coin < 57344
    val disagree = docs.select(
        TextOps.trainSplit($"text").as("a"),
        TextOps.splitByFractions($"text",
          Seq("train" -> 14.0, "val" -> 1.0, "test" -> 1.0)).as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(disagree === 0L)
    // 90/5/5 lands near its design point on 500 docs
    val census = docs.groupBy(TextOps.splitByFractions($"text",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(census.keySet === Set("train", "val", "test"))
    assert(census("train") > 400 && census("train") < 480)
    // null text has no coin, in both modes
    for (m <- Seq(Hashing.OraclePortable, Hashing.Production)) {
      val row = Seq(Option.empty[String]).toDF("text")
        .select(TextOps.splitByFractions($"text",
          Seq("a" -> 0.5, "b" -> 0.5), m)).collect()(0)
      assert(row.isNullAt(0), s"mode $m")
    }
    // production mode: total, deterministic, and a different assignment
    val prod = docs.select($"doc_id", TextOps.splitByFractions($"text",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
        Hashing.Production).as("s"))
      .as[(Long, String)].collect().toMap
    assert(prod.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(prod.size === 500)
    val md5Side = docs.select($"doc_id", TextOps.splitByFractions($"text",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).as("s"))
      .as[(Long, String)].collect().toMap
    assert(prod !== md5Side)
  }

  test("blocklistGate is stateless and gates a real stream on ingest") {
    import spark.implicits._
    // the gate is a static-fold broadcast + one narrow projection, so it
    // applies to a readStream unchanged — content safety ON INGEST, no
    // state, no watermark (the contaminationStream shape)
    val dir = graft.io.Sinks.scratchRoot + "/blocklist_stream"
    val docs = Seq(
      (1L, "a clean document about nothing in particular"),
      (2L, "this one mentions the banned thing badword here")
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(dir)
    val bl = Seq("badword").toDF("term")
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = TextOps.blocklistGate(stream, bl)
      .writeStream.outputMode("append")
      .format("memory").queryName("blocklist_stream_test").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("blocklist_stream_test")
      .as[(Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 0L, "", false)))
    assert(got(2L) === ((2L, 1L, "badword", true)))
  }

  test("perplexityBuckets: per-lang terciles, head = lowest mean nll") {
    import spark.implicits._
    val docs = ((1L to 12L).map(i => (i, "en", "the cat sat on the mat")) ++
      (13L to 18L).map(i => (i, "en", s"rare gram soup $i variant mix")) ++
      (19L to 30L).map(i => (i, "fr", "le chat dort bien ici"))
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.perplexityBuckets(
      docs, TextOps.lmTrain(docs, minCount = 2L))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
                 r.getString(3)))
    // every scored doc lands in exactly one bucket
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall(r => Set("head", "middle", "tail")(r._4)))
    // within each lang, every head ppl <= every middle ppl <= every tail
    rows.groupBy(_._2).foreach { case (_, g) =>
      val byB: Map[String, Seq[Double]] =
        g.groupBy(_._4).map { case (k, v) => k -> v.map(_._3).toSeq }
      val head = byB.getOrElse("head", Seq.empty)
      val mid = byB.getOrElse("middle", Seq.empty)
      val tail = byB.getOrElse("tail", Seq.empty)
      for (h <- head; m <- mid) assert(h <= m)
      for (m <- mid; t <- tail) assert(m <= t)
    }
    // the repeated-template docs are predictable: all of them head/middle,
    // and the rare-gram docs occupy the tail
    val en = rows.filter(_._2 == "en")
    assert(en.filter(_._4 == "tail").forall(_._1 >= 13L))
  }

  test("perplexityBuckets approx swap: identical buckets on integral-" +
       "rank groups, identical plan shape (the quality-gate precedent)") {
    import spark.implicits._
    // group sizes ≡ 1 (mod 3) make both tercile ranks integral, where
    // exact interpolation and the sketch's data-point pick PROVABLY
    // coincide (and percentile_approx is exact under `accuracy` rows) —
    // the same sub-accuracy-equality contract QualityGateSpec pins
    val docs = ((1L to 13L).map(i =>
        (i, "en", s"the cat sat ${"the cat sat " * (i % 4).toInt}on mat")) ++
      (14L to 23L).map(i => (i, "fr", s"le chat ${i % 3} dort bien ici"))
    ).toDF("doc_id", "lang", "text")
    val model = TextOps.lmTrain(docs, minCount = 2L)
    def buckets(exact: Boolean) =
      TextOps.perplexityBuckets(docs, model, exact = exact)
        .select($"doc_id", $"bucket").as[(Long, String)].collect().toSet
    assert(buckets(exact = false) === buckets(exact = true))
    // same dataflow, only the aggregate differs: exchange/join skeleton
    // identical after masking the aggregate call
    def shape(e: Boolean): String =
      TextOps.perplexityBuckets(docs, model, exact = e)
        .queryExecution.executedPlan.toString
        .linesIterator
        .map(_.replaceAll("#\\d+", "").replaceAll("plan_id=\\d+", "")
          .replaceAll("(?i)percentile_approx\\([^)]*\\)|percentile\\([^)]*\\)",
                      "AGG"))
        .filter(l => l.contains("Exchange") || l.contains("Join"))
        .mkString("\n")
    assert(shape(true) === shape(false))
  }

  test("tokenBudget: cumulative sums match the naive global window") {
    import spark.implicits._
    val docs = (1L to 100L)
      .map(i => (i, ("w " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    val got = TextOps.tokenBudget(docs, budget = 150L, seed = "s",
                                  partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3))).sortBy(_._2)
    val naive = docs
      .select(col("doc_id"),
              md5(concat_ws("|", lit("s"), col("doc_id").cast("string")))
                .as("k"),
              TextOps.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long") - 1L)
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") <= 150L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(2),
                           r.getLong(4))).sortBy(_._2)
    assert(got.toSeq === naive.toSeq)
    // the kept prefix is contiguous from pos 0 and within budget
    assert(got.head._2 === 0L)
    assert(got.map(_._2).toSeq === (0L until got.length.toLong))
    assert(got.last._4 <= 150L)
  }

  test("recipeMix: grouped budgets match naive per-group windows") {
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      (i, s"s${(i % 3).toInt}", ("t " * (i % 5 + 1).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val recipe = Map("s0" -> 0.5, "s1" -> 0.5)
    val got = TextOps.recipeMix(docs, recipe, budget = 40L, seed = "x",
                                partitions = 8)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .sortBy(x => (x._2, x._3))
    // s2 is not in the recipe: dropped entirely
    assert(got.forall(_._2 != "s2"))
    val naive = docs.filter(col("source").isin("s0", "s1"))
      .select(col("doc_id"), col("source"),
              md5(concat_ws("|", lit("x"), col("doc_id").cast("string")))
                .as("k"),
              TextOps.tokenCount(col("text")).cast("long").as("n"))
      .withColumn("pos_g", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("k"), col("doc_id")))
          .cast("long") - 1L)
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("source")).orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") <= 20L) // round(40 * 0.5 / 1.0) per group
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(5)))
      .sortBy(x => (x._2, x._3))
    assert(got.toSeq === naive.toSeq)
    // each group walks its own order from pos 0 and stays within budget
    got.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).toSeq === (0L until g.length.toLong))
      assert(g.map(_._4).max <= 20L)
    }
  }

  test("shardAssign: an all-tokenless batch lands whole in shard 0 " +
       "instead of ANSI DIVIDE_BY_ZERO") {
    import spark.implicits._
    // every doc empty/whitespace → __total = 0; the shard expression
    // must BRANCH around the integral div (under Spark 4's default
    // ANSI mode `div 0` throws before any coalesce sees a null)
    val docs = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.shardAssign(docs, nShards = 4, seed = "s")
      .select(col("doc_id"), col("shard")).as[(Long, Long)]
      .collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("shardAssign: contiguous runs, token-balanced within one doc") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, ("w " * (i % 9 + 1).toInt).trim)).toDF("doc_id", "text")
    val n = 8
    val out = TextOps.shardAssign(docs, n, seed = "s", partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 200)
    assert(out.map(_._2).toSet === (0L until n.toLong).toSet)
    // shards are contiguous runs of the shuffle order
    val keyOf = docs
      .select(col("doc_id"),
              md5(concat_ws("|", lit("s"), col("doc_id").cast("string")))
                .as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordered = out.sortBy(x => (keyOf(x._1), x._1))
    assert(ordered.map(_._2).toSeq === ordered.map(_._2).sorted.toSeq)
    // token balance: every shard within one max-doc-tokens of total/n
    val total = out.map(_._3).sum
    val maxDoc = out.map(_._3).max
    val byShard = out.groupBy(_._2).map { case (_, g) => g.map(_._3).sum }
    byShard.foreach { s =>
      assert(math.abs(s - total.toDouble / n) <= maxDoc + 1)
    }
    // shard boundary formula matches the naive exclusive-cumsum rule
    var cum = 0L
    ordered.foreach { case (_, shard, nt) =>
      assert(shard === math.min(cum * n / total, n - 1L))
      cum += nt
    }
  }

  test("tokenBudget: zero-token docs hold positions without spending") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, null.asInstanceOf[String]),
                   (4L, "d e")).toDF("doc_id", "text")
    val all = TextOps.tokenBudget(docs, budget = 100L, partitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(all.length === 4)
    assert(all.filter(r => r._1 == 2L || r._1 == 3L).forall(_._2 === 0L))
    assert(all.map(_._3).max === 5L)
  }

  test("suppressSmallGroups: sub-k cells roll into __other__, big cells " +
       "untouched, the census total is preserved exactly") {
    import spark.implicits._
    val census = Seq(("s1", "en", 50L), ("s1", "zh", 3L),
                     ("s2", "en", 12L), ("s2", "fr", 2L),
                     ("s3", "de", 1L))
      .toDF("source", "lang", "n")
    val got = TextOps.suppressSmallGroups(census, k = 10,
                                          groupCols = Seq("source", "lang"))
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("s1", "en", 50L), ("s2", "en", 12L),
                       ("__other__", "__other__", 6L)))
    assert(got.toSeq.map(_._3).sum === 68L, "total must be preserved")
  }

  test("calibrateScores: ties share a percentile, a singleton source " +
       "calibrates to 0, and one global threshold cuts each source at " +
       "the same quantile") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", 0.1), (2L, "s1", 0.2), (3L, "s1", 0.2), (4L, "s1", 0.9),
      (5L, "s2", 0.5), // singleton source
      (6L, "s3", 0.95), (7L, "s3", 0.96), (8L, "s3", 0.97),
      (9L, "s3", 0.98)) // uniformly high scores
      .toDF("doc_id", "source", "sc")
    val got = TextOps.calibrateScores(docs, col("sc"))
      .as[(Long, String, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got(2L) === got(3L), "equal scores must share a percentile")
    assert(got(1L) === 0.0 && got(4L) === 1.0)
    assert(got(5L) === 0.0, "percent_rank of a singleton is 0")
    // a global pct >= 0.5 cut keeps the top half of EVERY source —
    // including s3, which a raw-score threshold at 0.5 would keep whole
    val kept = got.filter(_._2 >= 0.5).keySet
    assert(kept.intersect(Set(6L, 7L, 8L, 9L)) === Set(8L, 9L))
  }

  test("curationReport: every gate trips on its planted violator with " +
       "the right sorted reason string; clean doc keeps") {
    import spark.implicits._
    val good = (1 to 12).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, Option(good), "en"),                       // keeps
      (2L, Option(good + " extra"), "zh"),            // lang
      (3L, Option(good.replace("word3", "BADTERM")), "en"), // blocklist
      (4L, Option("too short"), "en"),                // short
      (5L, Option(good), "en"),                       // duplicate of 1
      (6L, Option.empty[String], "en"),               // null_text (+short)
      (7L, Option("tiny BADTERM"), "zh"))             // three reasons
      .toDF("doc_id", "text", "lang")
    val got = graft.pipeline.CorpusPipeline.curationReport(
        docs, Seq("badterm").toDF("term"), langs = Seq("en"),
        minTokens = 10)
      .select($"doc_id", $"keep", $"reasons")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((true, "")))
    assert(got(2L) === ((false, "lang")))
    assert(got(3L) === ((false, "blocklist")))
    assert(got(4L) === ((false, "short")))
    assert(got(5L) === ((false, "duplicate")))
    assert(got(6L) === ((false, "null_text,short")))
    assert(got(7L) === ((false, "blocklist,lang,short")))
  }
}
