package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-partition derivation (r15 VERDICT #3): the session sizes
  * `spark.sql.shuffle.partitions` from the input corpus's on-disk bytes —
  * ~8 MiB of compressed parquet per partition (≈ the standard 128 MB of
  * in-flight rows) — replacing the manual SPARK_GRAFT_SHUFFLE_PARTITIONS
  * env knob the r15 scale audit needed to keep d_dup_spans linear at 100×.
  * Pure function; no SparkSession needed.
  */
class GraftSessionSpec extends AnyFunSuite {
  import graft.GraftSession.{derivedShufflePartitions, BytesPerShufflePartition}

  private def tmpDirWith(sizes: Long*): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gss")
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val f = new java.io.RandomAccessFile(dir.resolve(s"f$i.parquet").toFile, "rw")
      try f.setLength(sz) finally f.close() // sparse: metadata-only size
    }
    dir
  }

  test("small corpora stay at the core-count floor (bench plans unchanged)") {
    // sf0.1 is ~17 MB -> 3 raw partitions -> floored at 32 like every round
    val d = tmpDirWith(17L << 20)
    assert(derivedShufflePartitions(32, d.toString) == 32)
    // and the real bench dir itself derives exactly the r15 value
    assert(derivedShufflePartitions(32, "/root/testdata/sf0.1") == 32)
  }

  test("large corpora derive ~bytes/8MiB partitions") {
    val d = tmpDirWith(800L << 20, 800L << 20) // 1.6 GB, the sf10 corpus size
    val got = derivedShufflePartitions(32, d.toString)
    assert(got == ((1600L << 20) + BytesPerShufflePartition - 1) / BytesPerShufflePartition)
    assert(got == 200) // the audit's manual fix used 256; same decade
  }

  test("cap bounds the count; a missing dir falls back to cores") {
    val d = tmpDirWith(100L << 30) // 100 GB sparse
    assert(derivedShufflePartitions(32, d.toString, cap = 512) == 512)
    assert(derivedShufflePartitions(32, "/nonexistent/graft/dir") == 32)
  }
}
