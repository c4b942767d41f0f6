package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Targeted re-verification helper: dump ONE OR MORE registry queries (and
  * always the current oracle_sql.json) into an existing Verify output dir,
  * so `scripts/check.py <sfDir> <outDir> <query...>` can re-gate just the
  * queries a change touched without re-running all ~140.
  *
  *   sbt "runMain graft.tools.VerifyOne <sfDir> <outDir> [query ...]"
  *
  * With no query names, only oracle_sql.json is rewritten (use after an
  * oracle-text-only change — Spark-side dumps stay valid).
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.VerifyOne <sfDir> <outDir> [query ...]")
      sys.exit(2)
    }
    val spark = GraftSession.builder(16, args(0)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(args(1)).mkdirs()
    args.drop(2).foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      SparkEntry.queries(name)(spark, args(0)).coalesce(1)
        .write.mode("overwrite").parquet(s"${args(1)}/$name")
    }
    Files.writeString(Paths.get(s"${args(1)}/oracle_sql.json"),
      SparkEntry.oracleSql.map { case (k, v) =>
        s"${graft.JsonText.quote(k)}: ${graft.JsonText.quote(v)}"
      }.mkString("{", ",", "}"))
    spark.stop()
  }
}
