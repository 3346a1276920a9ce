package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet tables (TESTDATA.md / FIXTURES.md §B).
  * Plain `spark.read.parquet` — Catalyst handles predicate pushdown and
  * column pruning at the scan, which is the point of keeping the
  * relational surface declarative.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts normalization: the driver has shipped this column as
    * parquet TIMESTAMP(NANOS) (reads as a long under
    * spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench sessions)
    * and as TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ under Spark's NTZ inference). Normalize BOTH to a
    * microsecond TimestampType: nanos divide exactly (the same truncation
    * DuckDB applies casting TIMESTAMP_NS->TIMESTAMP); NTZ casts to LTZ as
    * an epoch identity because every graft session pins
    * spark.sql.session.timeZone=UTC — matching DuckDB's naive TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** FAIL-LOUD FIXTURE GUARD for entries whose oracle pins literal
    * VALUES computed on /root/testdata/sf0.01 (ANN recall pins, BPE
    * merge pins): running them against any other directory would go
    * hash-red on CORRECT code with no hint why. The guard fingerprints
    * the table (order-insensitive bit_xor of full-row xxhash64 — one
    * cheap scan, cached per (dir, table) for the session) and throws a
    * clear message on mismatch instead.
    */
  /** bit_xor/xxhash64 fingerprints of the sf0.01 tables the pinned
    * oracle VALUES were measured on
    */
  private[graft] val Sf001DocumentsFp = -2554157057959591890L
  private[graft] val Sf001EmbeddingsFp = -6491620474420027571L

  private val fpCache = scala.collection.concurrent.TrieMap[(String, String), Long]()

  private[graft] def fingerprint(s: SparkSession, d: String, name: String): Long =
    fpCache.getOrElseUpdate((d, name), {
      val df = t(s, d, name)
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*)))
        .collect()(0).getLong(0)
    })

  /** throws unless `d`'s `name` table matches the fingerprint the
    * entry's pinned oracle VALUES were computed on
    */
  private[graft] def requirePinnedFixture(s: SparkSession, d: String,
      name: String, expected: Long, entry: String): Unit = {
    val got = fingerprint(s, d, name)
    if (got != expected) throw new IllegalStateException(
      s"$entry pins oracle VALUES computed on /root/testdata/sf0.01's '$name' " +
        s"table; $d holds a different '$name' (fingerprint $got, expected " +
        s"$expected) — the hash compare would go red on correct code. " +
        "Run against sf0.01 or re-pin the oracle VALUES.")
  }
}
