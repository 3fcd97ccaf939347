package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet testdata (TESTDATA.md) plus the engine's
  * own partitioned sample store.
  *
  * Time convention: the `events` table stores TIMESTAMP(NANOS). Spark reads it
  * (with `spark.sql.legacy.parquet.nanosAsLong`) as epoch-nanos long; DuckDB
  * truncates to micros. Every query therefore works in **epoch micros**
  * (`ts_us = ts DIV 1000`), which both engines agree on exactly — floating
  * division would lose integer precision at 1e18.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.Engine.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with `ts_us` (epoch micros, bigint) derived once. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events").withColumn("ts_us", expr("ts DIV 1000L"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
