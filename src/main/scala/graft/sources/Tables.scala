package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness's synthetic parquet tables (see /root/repo/TESTDATA.md).
  *
  * Parquet carries its own schema (columnar, typed), so unlike the reference's
  * schema-on-read CSV ingestion (reference: bdb2026/data_io.py:122-124), no inference
  * pass is needed. At 100 TB these reads are partition-parallel scans with column
  * pruning + predicate pushdown handled by the vectorized parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
