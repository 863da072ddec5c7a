package graft

import org.apache.spark.sql.functions._

import graft.text.Hashing

/** Bit-equality pins for the allocation-light md5-prefix coins (r12):
  * Md5Prefix16 and every Hashing helper built on it must equal the
  * literal hex-string SQL forms the DuckDB oracle evaluates.
  */
class Md5ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // adversarial content: ascii, unicode (multi-byte UTF-8), empty,
  // whitespace, long, digits-only, null
  private def fixture = (Seq(
    "hello", "", " ", "a", "Ünïcôdé ✓ 测试 🚀", "0123456789abcdef",
    "x" * 5000, "line1\nline2\ttab", "ngram jaccard", "!@#$%^&*()"
  ).zipWithIndex.map { case (s, i) => (i.toLong, Option(s)) } :+
    (999L, None: Option[String])).toDF("id", "t")

  test("Md5Prefix16 ≡ conv(substring(md5, 1, 4), 16, 10)") {
    val got = fixture.select(col("id"),
      graft.functions.Md5Ops.md5Prefix16(col("t")).as("fast"),
      conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long").as("ref"))
    assert(got.filter(!(col("fast") <=> col("ref"))).count() === 0)
    // null in → null out, like the md5 chain
    assert(got.filter(col("id") === 999 && col("fast").isNotNull)
      .count() === 0)
  }

  test("Hashing.bucket ≡ the literal pmod(conv(substring(md5,1,4))) form") {
    for (dim <- Seq(7, 256, 10000)) {
      val got = fixture.select(
        Hashing.bucket(col("t"), dim, Hashing.OraclePortable).as("fast"),
        pmod(conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long"),
             lit(dim.toLong)).as("ref"))
      assert(got.filter(!(col("fast") <=> col("ref"))).count() === 0, s"dim=$dim")
    }
  }

  test("Hashing.hashByte ≡ the literal conv(substring(md5,1,2)) form") {
    val got = fixture.select(
      Hashing.hashByte(col("t")).as("fast"),
      conv(substring(md5(col("t")), 1, 2), 16, 10).cast("int").as("ref"))
    assert(got.filter(!(col("fast") <=> col("ref"))).count() === 0)
  }

  test("Hashing.splitArm ≡ the literal first-hex-digit form") {
    val h = substring(md5(col("t")), 1, 1)
    val ref = when(h < "e", "train").when(h === "e", "val")
      .when(h.isNotNull, "test")
    val got = fixture.select(
      Hashing.splitArm(col("t")).as("fast"), ref.as("ref"))
    assert(got.filter(!(col("fast") <=> col("ref"))).count() === 0)
  }

  test("random-content sweep: 2000 generated strings agree on all coins") {
    // deterministic pseudo-random strings spanning lengths/charsets
    val rng = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      val len = rng.nextInt(60)
      val s = (0 until len).map { _ =>
        val r = rng.nextInt(300)
        if (r < 256) r.toChar else ('à' + (r - 256)).toChar
      }.mkString
      (i.toLong, s)
    }.toDF("id", "t")
    val got = rows.select(
      graft.functions.Md5Ops.md5Prefix16(col("t")).as("fast"),
      conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long").as("ref"))
    assert(got.filter(!(col("fast") <=> col("ref"))).count() === 0)
  }
}
