package graft.bdb

import graft.SparkSpec
import graft.sources.Csv
import org.apache.spark.sql.functions._

/** End-to-end ingestion: reference-shaped CSV → declared schema → pipeline
  * (S1/S2 realism: the synthetic frame carries all 23 reference columns and
  * must round-trip through Schemas.groupInput).
  */
class IngestionSpec extends SparkSpec {

  test("synthetic tracking matches the declared groupInput schema exactly") {
    val t = Synth.tracking(spark, nGames = 1, playsPerGame = 3)
    assert(t.schema.fieldNames.toSeq === Schemas.groupInput.fieldNames.toSeq)
  }

  test("CSV round-trip through the declared schema feeds the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("ingest").toString
    val t = Synth.tracking(spark, nGames = 2, playsPerGame = 4)
    // write as weekly-style CSV shards (the reference's file layout)
    t.filter(col("game_id") === 1).coalesce(1).write
      .option("header", "true").mode("overwrite").csv(s"$dir/input_w01")
    t.filter(col("game_id") === 2).coalesce(1).write
      .option("header", "true").mode("overwrite").csv(s"$dir/input_w02")

    val back = Csv.read(spark, s"$dir/input_w*/*.csv", Schemas.groupInput)
    assert(back.count() === t.count())
    // CSV scans force nullable=true; names and types must match exactly
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Schemas.groupInput.map(f => (f.name, f.dataType)))

    // data-quality gate passes on the ingested frame
    import graft.quality.Checks
    assert(Checks.report(back, Checks.trackingRules).count() === 0)
    assert(Checks.oneTargetPerPlay(back).count() === 0)

    // and the full pipeline runs from the CSV-ingested frame
    val result = Pipeline.run(back, Synth.output(back), Synth.supplementary(back))
    assert(result.scorecard.count() > 0)
  }
}
