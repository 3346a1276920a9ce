package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite; small core count
  * keeps test startup cheap — scale behavior is exercised via partition
  * counts, not thread counts).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for sibling suites (getOrCreate shares it)
    super.afterAll()
  }
}
