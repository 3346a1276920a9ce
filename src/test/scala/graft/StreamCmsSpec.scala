package graft

import org.apache.spark.sql.functions._

/** q136's claim is that the STREAMED Count-Min sketch equals the batch
  * sketch bit-for-bit (counter sums are order- and batch-boundary-
  * independent). Pin it directly on the sf0.001 fixture: build the
  * sketch both ways and compare counter arrays.
  */
class StreamCmsSpec extends SparkSpec {

  test("streamed CMS counters equal the batch CMS counters bit-for-bit") {
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val depth = 4; val width = 512
    def idxCol(c: org.apache.spark.sql.Column, i: Int) =
      pmod(conv(substring(md5(concat(c, lit("#"), lit(i)).cast("binary")), 1, 7), 16, 10)
        .cast("long"), lit(width.toLong))
    val agg = new graft.functions.CmsAgg(depth, width)
    def idxDf(df: org.apache.spark.sql.DataFrame) =
      df.select(array((0 until depth).map(i =>
        idxCol(col("user_id").cast("string"), i)): _*).as("idx")).as[Seq[Long]]

    val batch = idxDf(s.read.parquet(s"$d/events.parquet"))
      .groupByKey(_ => 0).agg(agg.toColumn).collect().head._2

    val sch = s.read.parquet(s"$d/events.parquet").schema
    val sk = idxDf(s.readStream.schema(sch).parquet(s"$d/{events.parquet}").toDF())
      .groupByKey(_ => 0).agg(agg.toColumn).toDF("k", "cms")
    val q = sk.writeStream.format("memory").queryName("spec_stream_cms")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table("spec_stream_cms").select("cms.*")
      .as[graft.functions.CmsBuf].head()

    assert(java.util.Arrays.equals(batch.counters, streamed.counters))
    assert(batch.counters.sum == depth.toLong *
      s.read.parquet(s"$d/events.parquet").count())
  }
}
