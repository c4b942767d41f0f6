package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Message-bus source abstraction with the Kafka WIRE SCHEMA as the contract:
  * every implementation yields `(key binary, value binary, topic string,
  * partition int, offset long, timestamp timestamp)` — exactly what
  * `spark.readStream.format("kafka")` produces — so downstream pipelines are
  * written once against that shape and the physical bus is a deployment
  * detail.
  *
  * This container has no Kafka broker or connector jar, so the production
  * implementation ([[KafkaBus]]) only ASSEMBLES the standard reader options
  * (it fails at `load()` without the `spark-sql-kafka` package on the
  * classpath — documented, not hidden); [[FileBus]] and the MemoryStream
  * path in tests provide working dev/CI implementations of the same
  * contract. Swapping `FileBus` → `KafkaBus` changes ONE constructor, no
  * query code.
  */
trait EventBus {
  /** Unbounded read: the live stream. */
  def readStream(spark: SparkSession): DataFrame
  /** Bounded read of everything currently in the bus (backfill twin). */
  def read(spark: SparkSession): DataFrame
}

object EventBus {
  /** Kafka wire columns, in wire order. */
  val wireColumns: Seq[String] =
    Seq("key", "value", "topic", "partition", "offset", "timestamp")

  /** The wire metadata [[parseJson]] KEEPS beside the decoded payload —
    * the single source of truth for every guard that must reject payload
    * fields shadowing them ([[parseJson]] itself, `IngestFlow`'s reserved
    * list). Add a kept column here and both guards follow. */
  val keptWireCols: Seq[String] = Seq("topic", "partition", "offset")

  /** Standard consume step: decode the JSON value payload into typed columns.
    * Keeps the wire metadata (topic/partition/offset/timestamp) alongside —
    * offset is the idempotence key for exactly-once sinks. */
  def parseJson(bus: DataFrame, valueSchema: StructType): DataFrame =
    parseJson(bus, valueSchema, "timestamp")

  /** [[parseJson]] with the wire timestamp renamed to `wireTsName` — event
    * payloads very commonly carry their own `timestamp` field, and the
    * default name would then collide (ambiguous-reference failures in any
    * downstream watermark). Composed pipelines ([[IngestFlow]]) pass a
    * reserved name. */
  def parseJson(bus: DataFrame, valueSchema: StructType,
      wireTsName: String): DataFrame = {
    require(!valueSchema.fieldNames.contains(wireTsName),
      s"wire timestamp alias '$wireTsName' collides with a payload field")
    // the kept wire metadata shares the output namespace with the payload;
    // a clash would produce duplicate columns that fail only on first use
    val wireClash = valueSchema.fieldNames.toSeq.intersect(keptWireCols)
    require(wireClash.isEmpty,
      s"payload fields collide with kept wire metadata columns: " +
        s"${wireClash.mkString(", ")} (rename them in the payload schema)")
    bus.select(
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as(wireTsName),
      from_json(col("value").cast("string"), valueSchema).as("v"))
      .select(col("topic"), col("partition"), col("offset"),
        col(wireTsName), col("v.*"))
  }
}

/** Files-as-bus: a directory of parquet files carrying
  * `(key binary, value binary, timestamp)`; topic is the directory's logical
  * name, partition is derived by hashing the key (mirroring Kafka's default
  * partitioner), and offset is the producer-assigned `offset` column
  * (producers via [[FileBus.append]] stamp a monotonic offset per write).
  * File sources give Spark's usual exactly-once streaming semantics via the
  * file-listing log, so this is a legitimate small-scale bus, not just a
  * mock.
  */
final case class FileBus(path: String, topic: String, nPartitions: Int = 8)
    extends EventBus {

  private val fileSchema = "key BINARY, value BINARY, ts TIMESTAMP, offset LONG"

  private def shape(df: DataFrame): DataFrame =
    df.select(col("key"), col("value"), lit(topic).as("topic"),
      pmod(hash(col("key")), lit(nPartitions)).as("partition"),
      col("offset"), col("ts").as("timestamp"))

  override def readStream(spark: SparkSession): DataFrame =
    shape(spark.readStream.schema(fileSchema).parquet(path))

  override def read(spark: SparkSession): DataFrame =
    shape(spark.read.schema(fileSchema).parquet(path))

  /** Produce: append string key/values with a caller-supplied base offset
    * (monotonic per call; a real producer would fetch-and-increment). */
  def append(spark: SparkSession, records: Seq[(String, String)],
      baseOffset: Long, ts: java.sql.Timestamp): Unit = {
    import spark.implicits._
    records.zipWithIndex
      .map { case ((k, v), i) =>
        (k.getBytes("UTF-8"), v.getBytes("UTF-8"), ts, baseOffset + i)
      }
      .toDF("key", "value", "ts", "offset")
      .write.mode("append").parquet(path)
  }
}

/** Production bus: assembles the standard Kafka reader. Requires the
  * `spark-sql-kafka-0-10` package at runtime (NOT present in this
  * container — constructing the options is pure, `load()` is what needs the
  * connector).
  */
final case class KafkaBus(bootstrapServers: String, topic: String,
    startingOffsets: String = "latest") extends EventBus {

  /** The exact reader options the Kafka source takes; exposed for tests. */
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka").options(options).load()
      .select(EventBus.wireColumns.map(col): _*)

  override def read(spark: SparkSession): DataFrame =
    spark.read.format("kafka").options(options)
      .option("endingOffsets", "latest").load()
      .select(EventBus.wireColumns.map(col): _*)
}
