package graft.sources

import graft.SparkSpec
import graft.bdb.Schemas
import java.nio.file.Files

class CsvSpec extends SparkSpec {

  test("schema-declared CSV glob read unions weekly files (S1/S2)") {
    val dir = Files.createTempDirectory("csvtest").toString
    Files.writeString(java.nio.file.Path.of(dir, "input_w01.csv"),
      "game_id,play_id,nfl_id,frame_id,x,y\n1,1,10,1,50.0,20.0\n1,1,10,2,51.0,20.5\n")
    Files.writeString(java.nio.file.Path.of(dir, "input_w02.csv"),
      "game_id,play_id,nfl_id,frame_id,x,y\n2,1,11,1,30.0,10.0\n")
    val df = Csv.read(spark, s"$dir/input_w*.csv", Schemas.groupOutput)
    assert(df.count() === 3)
    assert(df.schema.fieldNames.toSeq ===
      Seq("game_id", "play_id", "nfl_id", "frame_id", "x", "y"))
    assert(df.filter("game_id = 2").count() === 1)
  }

  test("PERMISSIVE mode surfaces malformed rows as nulls, not crashes") {
    val dir = Files.createTempDirectory("csvbad").toString
    Files.writeString(java.nio.file.Path.of(dir, "bad.csv"),
      "game_id,play_id,nfl_id,frame_id,x,y\n" +
        "1,1,10,1,50.0,20.0\n" +
        "1,1,10,notanumber,oops,20.5\n" + // malformed numerics
        "2,1,11,1,30.0,10.0\n")
    val df = Csv.read(spark, s"$dir/bad.csv", graft.bdb.Schemas.groupOutput)
    assert(df.count() === 3)
    // the malformed row parses with nulls in the bad fields
    val bad = df.filter(org.apache.spark.sql.functions.col("frame_id").isNull)
    assert(bad.count() === 1)
    assert(bad.head().isNullAt(bad.head().fieldIndex("x")))
  }

  test("cachedParquet writes once and reuses (S3)") {
    import spark.implicits._
    val cache = Files.createTempDirectory("cachetest").toString + "/c"
    var builds = 0
    def source = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = Csv.cachedParquet(spark, source, cache)
    assert(first.count() === 2)
    // second call: mode("ignore") skips the write; data still served
    val second = Csv.cachedParquet(spark, Seq((9L, "x")).toDF("id", "v"), cache)
    assert(second.count() === 2) // original content retained, not overwritten
  }
}
