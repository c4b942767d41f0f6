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

    // and the full pipeline runs from the CSV-ingested frame, producing the
    // complete scorecard surface (reference TrueSpeed.csv column semantics)
    val result = Pipeline.run(back, Synth.output(back), Synth.supplementary(back))
    val sc = result.scorecard
    assert(sc.count() > 0)
    val expectedCols = Set("nfl_id", "player_name", "true_speed",
      "true_speed_raw", "route_execution", "plays_scored", "total_targets",
      "total_yards", "total_epa", "catch_rate", "explosive_plays",
      "success_rate", "yards_per_target", "epa_per_target", "rank",
      "archetype", "air_play_iq")
    val missing = expectedCols.diff(sc.columns.toSet)
    assert(missing.isEmpty, s"scorecard missing columns: $missing")
    // scaled metrics live on the reference's 0-100 scale
    val bounds = sc.agg(min("true_speed"), max("true_speed")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 100.0)
  }
}
