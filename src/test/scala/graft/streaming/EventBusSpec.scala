package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, LongType, StringType}

class EventBusSpec extends SparkSpec {

  private val valueSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("action", StringType)))

  test("FileBus batch read yields the Kafka wire schema and parses JSON values") {
    val dir = java.nio.file.Files.createTempDirectory("bus").toString
    val bus = FileBus(s"$dir/t", "events", nPartitions = 4)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    bus.append(spark,
      Seq("u1" -> """{"user_id":1,"action":"click"}""",
        "u2" -> """{"user_id":2,"action":"view"}"""),
      baseOffset = 0L, ts = t0)
    bus.append(spark,
      Seq("u1" -> """{"user_id":1,"action":"buy"}"""),
      baseOffset = 2L, ts = t0)

    val raw = bus.read(spark)
    assert(raw.columns.toSeq === EventBus.wireColumns)
    assert(raw.count() === 3)
    assert(raw.select("topic").distinct().head().getString(0) === "events")
    // partition assignment is key-hash-stable: same key → same partition
    assert(raw.filter(col("key") === lit("u1".getBytes("UTF-8")))
      .select("partition").distinct().count() === 1)

    val parsed = EventBus.parseJson(raw, valueSchema)
    assert(parsed.columns.toSeq ===
      Seq("topic", "partition", "offset", "timestamp", "user_id", "action"))
    assert(parsed.filter(col("user_id") === 1).count() === 2)
    assert(parsed.select(max("offset")).head().getLong(0) === 2L)
  }

  test("FileBus streaming read processes appended micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("bus2").toString
    val bus = FileBus(s"$dir/t", "events")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    bus.append(spark, Seq("a" -> """{"user_id":1,"action":"x"}"""), 0L, t0)

    val counts = EventBus.parseJson(bus.readStream(spark), valueSchema)
      .groupBy("action").count()
    val q = counts.writeStream.format("memory")
      .queryName("bus_counts").outputMode("complete").start()
    try {
      q.processAllAvailable()
      bus.append(spark, Seq("b" -> """{"user_id":2,"action":"x"}"""), 1L, t0)
      q.processAllAvailable()
      val n = spark.sql("SELECT count FROM bus_counts WHERE action = 'x'")
        .head().getLong(0)
      assert(n === 2L)
    } finally q.stop()
  }

  test("parseJson tolerates malformed payloads (null columns, row kept)") {
    val dir = java.nio.file.Files.createTempDirectory("bus3").toString
    val bus = FileBus(s"$dir/t", "events")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    bus.append(spark,
      Seq("k1" -> """{"user_id":1,"action":"ok"}""",
        "k2" -> """not json at all""",
        "k3" -> """{"user_id":"wrongtype"}"""),
      0L, t0)
    val parsed = EventBus.parseJson(bus.read(spark), valueSchema)
    assert(parsed.count() === 3) // wire metadata survives even when decode fails
    assert(parsed.filter(col("action") === "ok").count() === 1)
    assert(parsed.filter(col("user_id").isNull).count() === 2)
  }

  test("KafkaBus assembles the standard reader options") {
    val kb = KafkaBus("broker1:9092,broker2:9092", "docs", "earliest")
    assert(kb.options === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "docs",
      "startingOffsets" -> "earliest"))
  }
}
