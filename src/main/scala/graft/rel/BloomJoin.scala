package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.BloomMightContain

/** Bloom-filter RUNTIME semi-join: before shuffling a huge fact table
  * into an equi-join, pre-filter it with a Bloom filter of the (much
  * smaller, usually pre-filtered) build side's keys. Rows whose key
  * cannot be on the build side are dropped AT THE SCAN, before the
  * exchange — at 100 TB the shuffle is the join's cost, and a selective
  * build side cuts it by the selectivity (false positives only cost
  * their own shuffle slot; the join itself still eliminates them, so
  * results are EXACT for inner/semi joins regardless of fpp).
  *
  * This is the pattern Spark's own InjectRuntimeFilter applies when it
  * can prove benefit; exposing it as an operator lets a pipeline apply
  * it where the optimizer's conservative heuristics decline (e.g. the
  * build side only becomes small after a filter the stats don't see).
  *
  * Mechanics: the filter builds DISTRIBUTED (stat.bloomFilter is a
  * treeAggregate — map-side partials, one bounded object to the
  * driver), ships once per executor via torrent broadcast, and probes
  * through the codegen'd [[BloomMightContain]] — no UDF, no boxing in
  * the scan loop.
  */
object BloomJoin {

  /** `probe` pre-filtered by a Bloom filter of `build`'s `key` column:
    * keeps every row whose key IS on the build side plus an `fpp`
    * fraction of the rest. `expectedNdv` sizes the filter (distinct
    * build keys; overestimates only waste bits).
    */
  def bloomSemiFilter(s: SparkSession, probe: DataFrame, build: DataFrame,
      key: String, expectedNdv: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(key, expectedNdv, fpp)
    val pred: Column = ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(probe(key)),
        s.sparkContext.broadcast(bf)))
    probe.filter(pred)
  }

  /** Inner equi-join with the probe side Bloom-pre-filtered. Exact: the
    * join eliminates the Bloom's false positives.
    */
  def bloomEquiJoin(s: SparkSession, probe: DataFrame, build: DataFrame,
      key: String, expectedNdv: Long, fpp: Double = 0.01): DataFrame =
    bloomSemiFilter(s, probe, build, key, expectedNdv, fpp).join(build, key)
}
