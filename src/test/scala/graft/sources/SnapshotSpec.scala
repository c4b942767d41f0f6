package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lake snapshots: reproducible pinned reads over an append-only table,
  * incremental since-snapshot processing, and LOUD invalidation when a
  * rewrite breaks the contract. */
class SnapshotSpec extends SparkSpec {

  test("snapshot pins the file set: reads are stable across appends") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "part", "v")
      .write.partitionBy("part").parquet(path)
    val s1 = Lake.snapshot(spark, path)
    assert(s1 === 1L)

    // the corpus keeps ingesting — into existing AND new partitions
    Seq((4L, "a", 40), (5L, "c", 50)).toDF("id", "part", "v")
      .write.mode("append").partitionBy("part").parquet(path)
    val s2 = Lake.snapshot(spark, path)
    assert(s2 === 2L)
    assert(Lake.snapshots(spark, path) === Seq(1L, 2L))

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    // s1 still reads EXACTLY the original rows, partition columns intact
    val snap1 = Lake.readSnapshot(spark, path, s1)
    assert(ids(snap1) === Set(1L, 2L, 3L))
    assert(snap1.filter(col("part") === "a").count() === 2,
      "partition columns must survive the explicit-file-list read")
    assert(ids(Lake.readSnapshot(spark, path, s2)) === Set(1L, 2L, 3L, 4L, 5L))
    // the live read sees everything and ignores the snapshot metadata dir
    assert(ids(spark.read.parquet(path)) === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("readAppendedSince: incremental batch = current files minus snapshot") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("snap_inc").toString + "/t"
    Seq((1L, 10), (2L, 20)).toDF("id", "v").write.parquet(path)
    val s1 = Lake.snapshot(spark, path)
    // nothing appended yet → empty, schema preserved
    val none = Lake.readAppendedSince(spark, path, s1)
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "v"))
    Seq((3L, 30), (4L, 40)).toDF("id", "v")
      .write.mode("append").parquet(path)
    val inc = Lake.readAppendedSince(spark, path, s1)
    assert(inc.select("id").collect().map(_.getLong(0)).toSet === Set(3L, 4L),
      "incremental read must return exactly the appended rows")
    // the incremental-processing loop: snapshot after processing, read the
    // delta on the next run
    val s2 = Lake.snapshot(spark, path)
    Seq((5L, 50)).toDF("id", "v").write.mode("append").parquet(path)
    assert(Lake.readAppendedSince(spark, path, s2)
      .select("id").collect().map(_.getLong(0)).toSet === Set(5L))
  }

  test("a rewrite invalidates old snapshots LOUDLY, never silently") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("snap_rw").toString + "/t"
    Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "v")
      .repartition(3).write.parquet(path)
    val s1 = Lake.snapshot(spark, path)
    assert(Lake.readSnapshot(spark, path, s1).count() === 3)
    // compaction rewrites the files — same rows, different file set
    Lake.compact(spark, path, rowsPerFile = 100)
    assert(spark.read.parquet(path).count() === 3, "data survives compaction")
    val e = intercept[IllegalArgumentException] {
      Lake.readSnapshot(spark, path, s1).count()
    }
    assert(e.getMessage.contains("no longer readable"),
      s"stale snapshot must fail with the invalidation named: ${e.getMessage}")
    // the DELTA path must refuse too: with every old file name gone, the
    // whole rewritten table would otherwise come back as the "delta" and
    // an incremental consumer would silently double-process the corpus
    val eDelta = intercept[IllegalArgumentException] {
      Lake.readAppendedSince(spark, path, s1).count()
    }
    assert(eDelta.getMessage.contains("no longer a valid delta base"),
      s"stale delta base must fail loudly: ${eDelta.getMessage}")
    // a fresh snapshot of the compacted table works again
    val s2 = Lake.snapshot(spark, path)
    assert(Lake.readSnapshot(spark, path, s2).count() === 3)
    // and asking for a snapshot that never existed names the valid ids
    val e2 = intercept[IllegalArgumentException] {
      Lake.readSnapshot(spark, path, 99L)
    }
    assert(e2.getMessage.contains("no snapshot 99"))
  }

  test("dropped snapshot ids are never re-minted and fail loudly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("snap_drop")
      .toString + "/t"
    Seq((1L, 10)).toDF("id", "v").write.parquet(path)
    val s1 = Lake.snapshot(spark, path)
    val s2 = Lake.snapshot(spark, path)
    // drop the NEWEST id — without the tombstone the next snapshot would
    // re-mint s2 over a different file set, silently changing data for any
    // consumer that recorded it
    Lake.dropSnapshot(spark, path, s2)
    Lake.dropSnapshot(spark, path, s2) // idempotent
    assert(Lake.snapshots(spark, path) === Seq(s1), "live ids only")
    Seq((2L, 20)).toDF("id", "v").write.mode("append").parquet(path)
    val s3 = Lake.snapshot(spark, path)
    assert(s3 > s2, s"dropped id $s2 must never be reused, got $s3")
    val e = intercept[IllegalArgumentException] {
      Lake.readSnapshot(spark, path, s2)
    }
    assert(e.getMessage.contains("dropped"),
      s"a dropped id must be named as dropped: ${e.getMessage}")
    // the surviving pin still reads its original file set
    assert(Lake.readSnapshot(spark, path, s1).count() === 1)
  }

  test("tombstone compaction folds drops into one marker, ids stay unmintable") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("snap_tomb")
      .toString + "/t"
    Seq((1L, 10)).toDF("id", "v").write.parquet(path)
    val keep = Lake.snapshot(spark, path)
    val dropped = (1 to 3).map(_ => Lake.snapshot(spark, path))
    dropped.foreach(Lake.dropSnapshot(spark, path, _))
    assert(Lake.compactSnapshotTombstones(spark, path) === 3)
    assert(Lake.compactSnapshotTombstones(spark, path) === 0, "idempotent")
    assert(Lake.snapshots(spark, path) === Seq(keep))
    // the folded marker still blocks re-minting every covered id
    val next = Lake.snapshot(spark, path)
    assert(next > dropped.max, s"folded ids must stay unmintable, got $next")
    // and a read of a folded-away id fails (as absent, not silently served)
    val e = intercept[IllegalArgumentException] {
      Lake.readSnapshot(spark, path, dropped.head)
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("a snapshot of a STILL-empty table fails with a named message") {
    val path = java.nio.file.Files.createTempDirectory("snap_empty")
      .toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val s1 = Lake.snapshot(spark, path)
    val e = intercept[IllegalArgumentException] {
      Lake.readSnapshot(spark, path, s1)
    }
    assert(e.getMessage.contains("no data files yet"),
      s"empty-table snapshot read must be named, not a schema-inference " +
        s"crash: ${e.getMessage}")
    // once data lands, the pinned-empty snapshot reads as zero rows with
    // the CURRENT schema
    import spark.implicits._
    Seq((1L, 10)).toDF("id", "v").write.mode("append").parquet(path)
    val zero = Lake.readSnapshot(spark, path, s1)
    assert(zero.count() === 0 && zero.columns.toSeq === Seq("id", "v"))
  }
}
