package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // GraftSession carries the conventions the queries depend on (UTC, nanos-as-long
    // events reads, AQE, shuffle partitions derived from the corpus bytes).
    val spark = GraftSession.builder(cpus, sfDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Schema preflight (round-7 postmortem): name any testdata column whose
    // physical type drifted outside the engine's contract UP FRONT, so a
    // regenerated table reads as one clear message here instead of dozens of
    // per-query AnalysisExceptions below. Warn-and-continue: queries not
    // touching the drifted column still deserve their green rows.
    val drift = graft.sources.SchemaCompat.problems(spark, sfDir)
    if (drift.nonEmpty) {
      System.err.println("[verify] SCHEMA DRIFT DETECTED — expect query failures:")
      drift.foreach(p => System.err.println(s"[verify]   $p"))
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
