package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table sink: the storage-level co-location strategy for the
  * joins a 100 TB deployment runs repeatedly. Writing both sides of a
  * recurring equi-join bucketed (and sorted) by the join key with the
  * same bucket count lets every subsequent sort-merge join satisfy its
  * distribution requirement straight off the scan — zero Exchange, zero
  * Sort, at any data size (BucketedJoinSpec pins the shuffle-free plan).
  * Bucket count is a storage-time decision: pick ~(total size / target
  * partition size); it must match on both sides to co-locate.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted managed parquet table.
    * The pre-write repartition on the bucket key (same hash family as the
    * bucket id) makes each bucket exactly ONE file — required for the
    * scan to expose the sort order (Spark ignores sortBy metadata for
    * multi-file buckets and re-sorts), and it avoids the tasks×buckets
    * small-file blowup at scale.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String, sortKeys: String*): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key, sortKeys: _*)
      .saveAsTable(table)
}
