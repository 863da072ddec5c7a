package graft

import org.apache.spark.sql.functions._

import graft.io.Sinks

/** Row-level merge (CDC upsert) + small-file compaction — the table
  * maintenance half of the sink surface.
  */
class SinkMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def listParts(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.startsWith("part-")).toSeq
  }

  test("mergeByKey: updates replace, unmatched survive, new keys " +
       "insert, re-merge is idempotent") {
    val path = s"${Sinks.scratchRoot}/spec_merge"
    val seed = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    Sinks.replaceLoad(seed, path)
    val updates = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    Sinks.mergeByKey(updates, Seq("k"), path)
    val expect = Set((1L, "a", 10.0), (2L, "b2", 99.0),
                     (3L, "c", 30.0), (4L, "d", 40.0))
    val got1 = spark.read.parquet(path)
      .as[(Long, String, Double)].collect().toSet
    assert(got1 === expect)
    Sinks.mergeByKey(updates, Seq("k"), path)
    val got2 = spark.read.parquet(path)
      .as[(Long, String, Double)].collect().toSet
    assert(got2 === expect)
  }

  test("mergeByKey onto a missing path bootstraps the table") {
    val path = s"${Sinks.scratchRoot}/spec_merge_boot"
    new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    val updates = Seq((1L, "x", 1.0)).toDF("k", "name", "bal")
    Sinks.mergeByKey(updates, Seq("k"), path)
    assert(spark.read.parquet(path).count() === 1L)
  }

  test("mergeByKey heals a crashed swap instead of silently replacing " +
       "the table with the update batch") {
    val path = s"${Sinks.scratchRoot}/spec_merge_crash"
    val seed = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.replaceLoad(seed, path)
    // simulate the crash state between the two swap renames: the live
    // table sits under __old, target is gone
    val dir = new java.io.File(path)
    val old = new java.io.File(path + "__old")
    assert(dir.renameTo(old))
    // stale stage leftovers from the dead attempt too
    new java.io.File(path + "__stage").mkdirs()
    val updates = Seq((2L, "b2")).toDF("k", "v")
    Sinks.mergeByKey(updates, Seq("k"), path)
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    // the seed row (1, "a") SURVIVED the crash-retry — without recovery
    // the bootstrap branch would have written only (2, "b2")
    assert(got === Set((1L, "a"), (2L, "b2")))
    assert(!old.exists() && !new java.io.File(path + "__stage").exists())
  }

  test("mergeByKey: a null-key update row REPLACES the target's " +
       "null-key row (null-safe keys, idempotent)") {
    val path = s"${Sinks.scratchRoot}/spec_merge_nullkey"
    val seed = Seq((Some(1L), "a"), (None, "legacy"))
      .toDF("k", "v")
    Sinks.replaceLoad(seed, path)
    val updates = Seq((Option.empty[Long], "fixed")).toDF("k", "v")
    Sinks.mergeByKey(updates, Seq("k"), path)
    Sinks.mergeByKey(updates, Seq("k"), path)
    val got = spark.read.parquet(path)
      .as[(Option[Long], String)].collect().toSet
    assert(got === Set((Some(1L), "a"), (None, "fixed")))
  }

  test("deleteWhere: matching rows go, null-predicate rows are RETAINED") {
    val path = s"${Sinks.scratchRoot}/spec_delete"
    val seed = Seq((Some(1L), "a"), (Some(14L), "b"), (None, "c"),
                   (Some(3L), "d"))
      .toDF("k", "v")
    Sinks.replaceLoad(seed, path)
    Sinks.deleteWhere(spark, path, $"k" % 7 === 0)
    val got = spark.read.parquet(path)
      .as[(Option[Long], String)].collect().toSet
    // 14 matches (deleted); null k cannot PROVE a match -> retained
    assert(got === Set((Some(1L), "a"), (None, "c"), (Some(3L), "d")))
  }

  test("compact: 64-file scatter becomes exactly numFiles files, " +
       "data-identical") {
    val path = s"${Sinks.scratchRoot}/spec_compact"
    val df = (1L to 1000L).map(i => (i, s"row $i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(path)
    assert(listParts(path).size === 64)
    Sinks.compact(spark, path, 4)
    assert(listParts(path).size === 4)
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got === (1L to 1000L).map(i => (i, s"row $i")).toSet)
    // no stage directory left behind
    assert(!new java.io.File(path + "__stage").exists())
  }

  test("layoutStats excludes files under HIDDEN directories (a " +
       "streaming sink's _spark_metadata batch files are not data)") {
    val path = s"${Sinks.scratchRoot}/spec_layout_hidden"
    Sinks.dropTable(spark, path)
    Seq((1L, "x")).toDF("id", "v").coalesce(1).write.parquet(path)
    val clean = Sinks.layoutStats(spark, path)
      .select($"n_files", $"total_bytes").as[(Long, Long)].head()
    // plant a _spark_metadata dir whose batch files have DATA-looking
    // leaf names ("0", "9.compact") — leaf-only hidden checks count
    // them and fake the compaction signal
    val meta = new java.io.File(s"$path/_spark_metadata")
    assert(meta.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$path/_spark_metadata/0"), "{}")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$path/_spark_metadata/9.compact"), "{}")
    val withMeta = Sinks.layoutStats(spark, path)
      .select($"n_files", $"total_bytes").as[(Long, Long)].head()
    assert(withMeta === clean,
      s"metadata files leaked into the census: $clean -> $withMeta")
  }

  test("layoutStats censuses a RELATIVE path under a dot-named ancestor " +
       "(the ancestor walk must stop at the qualified census root)") {
    // table under a hidden-looking ancestor, addressed RELATIVELY: the
    // unqualified stop-path comparison never matched the qualified
    // FileStatus ancestors, the walk ascended into ".cache", and every
    // file censused hidden -> 0 files
    val relRoot = ".cache-spec-layout"
    val rel = s"$relRoot/tbl"
    Sinks.dropTable(spark, relRoot)
    try {
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .coalesce(1).write.parquet(rel)
      val got = Sinks.layoutStats(spark, rel)
        .select($"n_files").as[Long].head()
      assert(got === 1L, s"census under dot-ancestor: $got files")
    } finally Sinks.dropTable(spark, relRoot)
  }

  test("zorderWrite refuses an input that already carries __z") {
    val bad = Seq((1L, 2L, 3L)).toDF("a", "b", "__z")
    val e = intercept[IllegalArgumentException] {
      Sinks.zorderWrite(bad, Seq("a", "b"),
                        s"${Sinks.scratchRoot}/spec_z_refuse", 1)
    }
    assert(e.getMessage.contains("__z"))
  }

  test("layoutStats census drives compactPartitions; layout survives, " +
       "markers excluded, small-file count tracks the threshold") {
    val path = s"${Sinks.scratchRoot}/spec_layout"
    Sinks.dropTable(spark, path)
    val df = (1L to 400L).map(i => (i, (i % 4).toInt)).toDF("id", "p")
    df.repartition(8).write.partitionBy("p").parquet(path)
    val before = Sinks.layoutStats(spark, path, smallBytes = 1L << 20)
      .select($"partition", $"n_files", $"n_small_files")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(before.keySet === Set("p=0", "p=1", "p=2", "p=3"))
    // 8 writer tasks each hold rows of every p value -> 8 files per dir,
    // all tiny, so every file counts as small
    assert(before.values.forall { case (n, s) => n === 8L && s === n })
    Sinks.compactPartitions(spark, path, "p")
    val after = Sinks.layoutStats(spark, path, smallBytes = 1L << 20)
      .select($"partition", $"n_files", $"total_bytes", $"avg_bytes")
      .as[(String, Long, Long, Long)].collect()
    assert(after.map(_._1).toSet === Set("p=0", "p=1", "p=2", "p=3"))
    assert(after.forall(_._2 === 1L), s"one file per partition: ${after.toSeq}")
    assert(after.forall(r => r._3 > 0 && r._4 === r._3))
    // data identical, partition pruning still works on the layout
    val got = spark.read.parquet(path).as[(Long, Int)].collect().toSet
    assert(got === (1L to 400L).map(i => (i, (i % 4).toInt)).toSet)
    assert(spark.read.parquet(path).filter($"p" === 2).count() === 100L)
    // raising the threshold flips the small-file verdict, not the census
    val big = Sinks.layoutStats(spark, path, smallBytes = 1L)
      .agg(sum($"n_small_files")).as[Long].head()
    assert(big === 0L)
    // unpartitioned table reports a single (root) row
    val flat = s"${Sinks.scratchRoot}/spec_layout_flat"
    df.coalesce(2).write.mode("overwrite").parquet(flat)
    val root = Sinks.layoutStats(spark, flat)
      .select($"partition", $"n_files").as[(String, Long)].collect()
    assert(root.toSeq === Seq(("(root)", 2L)))
  }

  test("versioned table: commit ordering, time travel, current resolve") {
    val root = s"${Sinks.scratchRoot}/spec_versions"
    Sinks.dropTable(spark, root)
    val v1 = Sinks.versionedWrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
                                  root)
    val v2 = Sinks.versionedWrite(Seq((1L, "a2")).toDF("k", "v"), root)
    assert((v1, v2) === ((1, 2)))
    assert(Sinks.listVersions(spark, root) === Seq(1, 2))
    // current = highest committed; pinned read of v1 is time travel
    assert(Sinks.versionedRead(spark, root).count() === 1L)
    assert(Sinks.versionedRead(spark, root, Some(1))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException] {
      Sinks.versionedRead(spark, root, Some(9))
    }
  }

  test("versioned table: uncommitted orphan is invisible, never reused, " +
       "vacuumed only below current") {
    val root = s"${Sinks.scratchRoot}/spec_versions_crash"
    Sinks.dropTable(spark, root)
    Sinks.versionedWrite(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a writer that died mid-write: data dir, no marker
    Seq((9L, "junk")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v=2")
    assert(Sinks.listVersions(spark, root) === Seq(1))
    assert(Sinks.versionedRead(spark, root).as[(Long, String)]
      .collect().toSet === Set((1L, "a")))
    // the next write must NOT reuse the orphan's number
    val v3 = Sinks.versionedWrite(Seq((2L, "b")).toDF("k", "v"), root)
    assert(v3 === 3)
    // orphan (now below current) reclaimed; committed v1 survives keep=2
    assert(Sinks.vacuum(spark, root, keep = 2) === Seq(2))
    assert(Sinks.listVersions(spark, root) === Seq(1, 3))
    // retention: keep=1 drops v1, current survives, v1 read now fails
    assert(Sinks.vacuum(spark, root, keep = 1) === Seq(1))
    assert(!new java.io.File(s"$root/v=1").exists())
    intercept[IllegalArgumentException] {
      Sinks.versionedRead(spark, root, Some(1))
    }
    assert(Sinks.versionedRead(spark, root).count() === 1L)
    // an uncommitted dir ABOVE current may be an in-flight writer:
    // vacuum must not touch it
    Seq((7L, "inflight")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$root/v=4")
    assert(Sinks.vacuum(spark, root, keep = 1) === Seq.empty)
    assert(new java.io.File(s"$root/v=4").exists())
  }
}
