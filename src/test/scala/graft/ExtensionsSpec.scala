package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL surface: graft functions usable from spark.sql") {
    GraftExtensions.registerAll(spark)
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs")
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("emb")

    val viaSql = spark.sql(
      """SELECT simhash64(split(text, '\\s+')) AS sh,
        |       rolling_hash(text) AS rh,
        |       size(shingle_hashes(text, 12)) AS nsh
        |FROM docs ORDER BY doc_id LIMIT 5""".stripMargin)
      .as[(Long, Long, Int)].collect().toSeq

    val viaApi = {
      import org.apache.spark.sql.functions._
      import graft.functions.{ShingleExpressions, TextExpressions}
      Tables.load(spark, sfDir, "documents")
        .orderBy($"doc_id").limit(5)
        .select(
          TextExpressions.simhash64(split($"text", "\\s+")),
          TextExpressions.rollingHash($"text"),
          size(ShingleExpressions.shingleHashes($"text", 12)))
        .as[(Long, Long, Int)].collect().toSeq
    }
    assert(viaSql === viaApi)

    val sims = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS sim,
        |       dot_product(a.embedding, a.embedding) AS selfdot
        |FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 3""".stripMargin)
      .as[(Double, Double)].collect()
    assert(sims.length === 3)
    assert(sims.forall { case (s, d) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 && d > 0 })
  }

  test("cosine_sim / dot_product: a null array SLOT yields null, " +
       "never a silently-zeroed similarity") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0d, cast(null as double)),
        |             array(1.0d, 1.0d)) AS c,
        |  dot_product(array(1.0d, cast(null as double)),
        |              array(1.0d, 1.0d)) AS d,
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS ok
        |""".stripMargin).head()
    // the unchecked read treated the null slot as 0.0 (or stale unsafe
    // bytes) — a plausible-looking wrong answer
    assert(got.isNullAt(0) && got.isNullAt(1))
    assert(math.abs(got.getDouble(2) - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("SQL functions reject bad arity with a clear error") {
    GraftExtensions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_hash('a', 'b')").collect()
    }
    assert(e.getMessage.contains("rolling_hash"))
  }

  test("lsh_bucket out-of-range bits fails at analysis, not planning") {
    GraftExtensions.registerAll(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lsh_bucket(array(1.0d, 2.0d), 99)").collect()
    }
    assert(e.getMessage.contains("lsh_bucket"))
    assert(e.getMessage.contains("[1,63]"))
  }
}
