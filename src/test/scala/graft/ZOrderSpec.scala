package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{ZOrder, ZOrderExpressions}
import graft.io.Sinks

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed Morton keys") {
    // 2 dims, 2 bits: (3, 0) -> bits 1 0 | 1 0 = 0b1010 = 10
    assert(ZOrder.interleave(Array(3, 0), 2) === 10L)
    // (0, 3) -> 0b0101 = 5 ; (3, 3) -> 0b1111 = 15
    assert(ZOrder.interleave(Array(0, 3), 2) === 5L)
    assert(ZOrder.interleave(Array(3, 3), 2) === 15L)
    // one dim degenerates to identity
    assert(ZOrder.interleave(Array(41), 16) === 41L)
    // three dims, 1 bit each: (1,0,1) -> 0b101 = 5
    assert(ZOrder.interleave(Array(1, 0, 1), 1) === 5L)
  }

  test("interleave expression: codegen path matches static logic, null-safe") {
    val df = Seq((3, 0), (0, 3), (3, 3)).toDF("a", "b")
      .select(ZOrderExpressions.interleaveBits(Seq(
        // feed raw small ints as their own bucket indexes
        col("a"), col("b"))).as("z"))
    // bitsPerDim(2) = 16, so (3,0) -> interleave at 16 bits
    val expected = Seq(Array(3, 0), Array(0, 3), Array(3, 3))
      .map(v => ZOrder.interleave(v, 16))
    assert(df.as[Long].collect().toSeq === expected)
    val withNull = Seq((Some(1), Some(2)), (None, Some(2)))
      .toDF("a", "b")
      .select(ZOrderExpressions.interleaveBits(Seq(col("a"), col("b"))))
      .collect()
    assert(!withNull(0).isNullAt(0))
    assert(withNull(1).isNullAt(0))
  }

  test("zorderWrite: round-trip is data-identical") {
    val path = Files.createTempDirectory("zorder").toString + "/t"
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    Sinks.zorderWrite(ev, Seq("user_id", "value"), path, 8)
    val back = spark.read.parquet(path)
    assert(back.count() === ev.count())
    assert(back.agg(sum("event_id")).head().getLong(0) ===
           ev.agg(sum("event_id")).head().getLong(0))
  }

  /** The pruning claim itself: under a z-order layout a selective range
    * predicate on EITHER clustered dimension finds its matches in a
    * small fraction of files (tight per-file envelopes in both dims),
    * while a layout sorted by only the first dimension scatters the
    * second dimension across every file.
    */
  test("zorderWrite: both dimensions cluster; single-sort only serves one") {
    val nFiles = 16
    val base = Files.createTempDirectory("zorder").toString
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val zPath = s"$base/z"
    Sinks.zorderWrite(ev, Seq("user_id", "value"), zPath, nFiles)
    val sPath = s"$base/s"
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.parquet(sPath)

    def filesTouched(path: String, pred: org.apache.spark.sql.Column)
        : Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    // ~1/8-of-ROWS slices (quantile, not domain — `value` is skewed,
    // and a domain slice of a skewed column is not a selective
    // predicate, it's most of the table)
    val uQ = ev.stat.approxQuantile("user_id", Array(0.0, 0.125), 0.001)
    val vQ = ev.stat.approxQuantile("value", Array(0.0, 0.125), 0.001)
    val uPred = col("user_id").between(uQ(0), uQ(1))
    val vPred = col("value").between(vQ(0), vQ(1))

    val zU = filesTouched(zPath, uPred)
    val zV = filesTouched(zPath, vPred)
    val sU = filesTouched(sPath, uPred)
    val sV = filesTouched(sPath, vPred)

    // first dimension: both layouts serve it
    assert(sU <= nFiles / 2, s"single-sort user_id touched $sU")
    assert(zU <= nFiles / 2, s"z-order user_id touched $zU")
    // second dimension: z-order clusters it, single-sort cannot
    assert(zV <= nFiles / 2, s"z-order value touched $zV of $nFiles")
    assert(sV > nFiles / 2,
      s"single-sort value unexpectedly clustered ($sV of $nFiles)")
    assert(zV < sV, s"z-order ($zV) not better than single-sort ($sV)")
  }

  test("zorderWrite: constant and all-null dimensions degrade gracefully") {
    val path = Files.createTempDirectory("zorder").toString + "/d"
    val df = spark.range(100)
      .select(col("id"), lit(7).as("c"),
              lit(null).cast("int").as("n"))
    Sinks.zorderWrite(df, Seq("id", "c", "n"), path, 2)
    assert(spark.read.parquet(path).count() === 100L)
  }

  test("interleave_bits rejects non-int and too many dims loudly") {
    intercept[Exception] {
      Seq(("a", 1)).toDF("s", "i")
        .select(ZOrderExpressions.interleaveBits(Seq(col("s"), col("i"))))
        .collect()
    }
    intercept[Exception] {
      ZOrderExpressions.interleaveBits(
        (0 to ZOrder.MaxDims).map(_ => lit(1)))
    }
  }
}
