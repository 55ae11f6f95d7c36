package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4
    * rejects unless read as raw long; convert to a microsecond timestamp
    * (floor, matching DuckDB's ns→µs view of the same instants). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types.LongType
    if (raw.schema("ts").dataType == LongType)
      // (ts - pmod(ts, 1000)) div 1000 is FLOOR division (pmod >= 0), which
      // matches DuckDB's ns->µs conversion for pre-epoch instants too;
      // `ts div 1000` alone truncates toward zero
      raw.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
