package graft.tools

import graft.{GraftSession, JsonText}
import graft.queries.{PlanFingerprints, Registry}

/** Which queries' POST-AQE physical plans differ between two data scales?
  * (r15 VERDICT #1: adaptive plans — broadcast→shuffle flips, SHUFFLE_HASH
  * elections, router regimes — execute in regimes the smaller tier never
  * reaches; this tool computes the exact set the sf10 correctness tier must
  * hash-gate, instead of guessing from a hand-maintained flip list.)
  *
  *   scripts/run_tool.sh graft.tools.PlanDiffScales <out.json> <dirA> <dirB>
  *     [query ...]          (default: the whole registry)
  *
  * Each query executes once per dir (foreachPartition — full plan, no
  * column-pruned shells) with the shuffle-partition count that dir derives,
  * exactly like a fresh session over it. Output: per-query fingerprints at
  * both scales + a `differs` list.
  */
object PlanDiffScales {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDiffScales <out.json> <dirA> <dirB> [query ...]")
    val outPath = args(0)
    val dirA = args(1)
    val dirB = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq else Registry.all.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    val spark = GraftSession.builder(cpus, dirB).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // bucketed staged twins re-stage per (process, dir) — do both up front
    for (d <- Seq(dirA, dirB)) {
      try graft.queries.JoinQueries.bucketedFacts(spark, d)
      catch { case e: Throwable => System.err.println(s"[plandiff] staging $d: $e") }
    }
    val byName = Registry.all.map(q => q.name -> q).toMap
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val differs = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      byName.get(name) match {
        case None => System.err.println(s"[plandiff] no registry query named $name")
        case Some(q) =>
          def fp(dir: String): String =
            try {
              GraftSession.tuneShuffleFor(spark, cpus, dir)
              PlanFingerprints.of(q.run(spark, dir)).brief
            } catch { case e: Throwable =>
              s"error:${e.getClass.getSimpleName}"
            }
          val a = fp(dirA)
          val b = fp(dirB)
          val d = a != b
          if (d) differs += name
          System.err.println(s"[plandiff] $name: $a -> $b${if (d) "  DIFFERS" else ""}")
          rows(name) =
            s"""{"a":${JsonText.quote(a)},"b":${JsonText.quote(b)},"differs":$d}"""
      }
    }
    val json = rows.map { case (k, v) => s"${JsonText.quote(k)}:$v" }
      .mkString("{\"dirA\":" + JsonText.quote(dirA) +
        ",\"dirB\":" + JsonText.quote(dirB) + ",\"differs\":[" +
        differs.map(JsonText.quote).mkString(",") + "],\"queries\":{", ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(s"[plandiff] ${differs.size} of ${rows.size} differ: " +
      differs.mkString(", "))
    spark.stop()
  }
}
