package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupOps
import graft.text.{Hashing, TextOps}

/** The production-hash flag: every coin-consuming operator accepts
  * `Hashing.Production` (xxhash64) as a drop-in for the md5 oracle
  * default. Two classes of guarantee, both pinned here:
  *  - where the hash is INTERNAL (a grouping key the output never
  *    exposes), production mode must produce the IDENTICAL result;
  *  - where the hash IS the output contract (permutations, splits,
  *    sampling), production mode must preserve the operator's contract
  *    (bijection, arm ratios, determinism, null handling) while
  *    producing a DIFFERENT — and equally re-derivable — assignment.
  */
class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint: both modes 32 lowercase hex chars, deterministic, " +
       "distinct across modes, null-in null-out") {
    val df = Seq("alpha", "beta", "alpha", null).toDF("t")
    for (mode <- Seq(Hashing.OraclePortable, Hashing.Production)) {
      val fp = df.select(TextOps.fingerprint($"t", mode)).as[String].collect()
      assert(fp(0) != null && fp(0).matches("[0-9a-f]{32}"))
      assert(fp(0) === fp(2), "same content, same fingerprint")
      assert(fp(0) !== fp(1))
      assert(fp(3) == null, "null text has no fingerprint")
      // re-derivable: a second evaluation is bit-identical
      val again = df.select(TextOps.fingerprint($"t", mode))
        .as[String].collect()
      assert(fp.toSeq === again.toSeq)
    }
    val a = df.select(TextOps.fingerprint($"t")).as[String].head()
    val b = df.select(TextOps.fingerprint($"t", Hashing.Production))
      .as[String].head()
    assert(a !== b, "modes are different hash functions")
  }

  test("shuffleOrder production: still a bijection [0,n), deterministic, " +
       "a different permutation than md5 mode") {
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def run(mode: Hashing.Mode) = {
      val out = TextOps.shuffleOrder(docs, mode = mode)
        .as[(Long, Long)].collect().toSeq
      spark.catalog.clearCache()
      out
    }
    val prod = run(Hashing.Production)
    assert(prod.map(_._2).sorted === (0L until 200L))
    assert(prod.toSet === run(Hashing.Production).toSet, "re-derivable")
    val oracle = run(Hashing.OraclePortable)
    assert(oracle.toMap !== prod.toMap, "independent permutations")
  }

  test("trainSplit production: only the three arms, ~14:1:1, null → null, " +
       "and a genuinely different assignment than md5 mode") {
    val docs = Tables.load(spark, sfDir, "documents")
    val arms = docs.select(TextOps.trainSplit($"text", Hashing.Production)
        .as("s"))
      .groupBy($"s").count().as[(String, Long)].collect().toMap
    assert(arms.keySet === Set("train", "val", "test"))
    val n = arms.values.sum.toDouble
    assert(arms("train") / n > 0.8 && arms("train") / n < 0.95)
    val nullArm = Seq(Option.empty[String]).toDF("text")
      .select(TextOps.trainSplit($"text", Hashing.Production))
      .collect()(0)
    assert(nullArm.isNullAt(0))
    val differ = docs.select(
        TextOps.trainSplit($"text").as("a"),
        TextOps.trainSplit($"text", Hashing.Production).as("b"))
      .filter($"a" =!= $"b").count()
    assert(differ > 0)
  }

  test("mixSample production: null text dropped at every rate; rate is " +
       "honored approximately; deterministic subset") {
    val docs = Tables.load(spark, sfDir, "documents")
      .unionByName(Seq((99999L, null.asInstanceOf[String], "en", "src0",
                        0L)).toDF("doc_id", "text", "lang", "source",
                                  "n_chars"))
    val kept = TextOps.mixSample(docs, "source",
        Map.empty, defaultRate = 1.0, mode = Hashing.Production)
    assert(kept.filter($"doc_id" === 99999L).isEmpty,
           "null text must have no coin in production mode too")
    val half = TextOps.mixSample(docs, "source", Map.empty,
        defaultRate = 0.5, mode = Hashing.Production)
    val nHalf = half.count()
    assert(nHalf > 180 && nHalf < 320, s"rate 0.5 kept $nHalf of 500")
    assert(half.as[(Long, String, String, String, Long)].collect().toSet ===
      TextOps.mixSample(docs, "source", Map.empty, defaultRate = 0.5,
          mode = Hashing.Production)
        .as[(Long, String, String, String, Long)].collect().toSet)
  }

  test("lineDedup: the hash is internal — production output is " +
       "bit-identical to md5 output") {
    val docs = Tables.load(spark, sfDir, "documents")
      .limit(120).select($"doc_id", $"text")
    def run(mode: Hashing.Mode) =
      DedupOps.lineDedup(docs, "doc_id", "text", hashMode = mode)
        .as[(Long, Long, Long, String)].collect().toSet
    assert(run(Hashing.Production) === run(Hashing.OraclePortable))
  }

  test("curate: exact-dedup survivors identical across modes (hash is a " +
       "grouping key); only the exposed fingerprint bytes differ") {
    val docs = Tables.load(spark, sfDir, "documents")
    def run(mode: Hashing.Mode) = {
      val out = graft.pipeline.CorpusPipeline
        .curate(docs, hashMode = mode)
        .select($"doc_id", $"lang", $"n_tokens", $"quality_score")
        .as[(Long, String, Long, Double)].collect().toSet
      spark.catalog.clearCache()
      out
    }
    assert(run(Hashing.Production) === run(Hashing.OraclePortable))
  }

  test("dsirSelect production: deterministic top-k of the right size") {
    val docs = Tables.load(spark, sfDir, "documents")
    val raw = docs.filter($"source" =!= "src0")
    val target = docs.filter($"source" === "src0")
    def run() = {
      val out = TextOps.dsirSelect(raw, target, k = 50,
          mode = Hashing.Production)
        .as[(Long, Long, Double)].collect().toSeq
      spark.catalog.clearCache()
      out
    }
    val a = run()
    assert(a.size === 50)
    assert(a === run(), "re-derivable selection")
  }
}
