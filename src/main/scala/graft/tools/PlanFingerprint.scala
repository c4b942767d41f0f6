package graft.tools

import graft.GraftSession
import graft.queries.{PlanFingerprints, Registry}

/** Dev tool: print the post-AQE plan fingerprint (exchange / broadcast-join /
  * sort-merge / nested-loop counts) of every headline query, in the exact
  * literal form `PlanFingerprintSpec` pins — regenerate after an intentional
  * plan change, review the diff, paste.
  *
  *   sbt "runMain graft.tools.PlanFingerprint <sfDir>"
  */
object PlanFingerprint {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.headline.foreach { q =>
      val fp = PlanFingerprints.of(q.run(spark, dir))
      println(s"""    "${q.name}" -> Fp(${fp.exchanges}, ${fp.broadcastJoins}, ${fp.sortMergeJoins}, ${fp.nestedLoops}),""")
    }
    spark.stop()
  }
}
