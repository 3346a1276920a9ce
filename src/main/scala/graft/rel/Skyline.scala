package graft.rel

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** PARETO SKYLINE — the non-dominated frontier of a two-criteria
  * search ("cheapest part for its size class"): p survives iff no q is
  * at-most-as-expensive AND at-least-as-large with one strict
  * inequality.
  *
  * In 2-D the skyline is a SINGLE ORDERED SCAN: visit distinct
  * (price asc, size desc) points keeping a running max of size — a
  * point survives iff its size strictly exceeds every size seen at a
  * strictly-or-equally cheaper price position. Distributed, that scan
  * is the q152 shape: range-partition the DEDUPLICATED point set on
  * the scan key, take each partition's size-max (pass 1, #partitions
  * rows), seed each partition with the prefix max of its predecessors
  * (the carry), and filter in one sorted pass. No global window, no
  * all-pairs dominance join — the NOT EXISTS formulation the oracle
  * uses is O(n²) and exists precisely to check this plan's output.
  *
  * Identical (price, size) points dominate each other non-strictly,
  * so they survive TOGETHER: the scan runs on distinct points with a
  * part count and a min-key representative per point.
  */
object Skyline {

  val all: ListMap[String, Q] = ListMap(
    "q157_skyline" -> Q(
      (s, d) => {
        import s.implicits._
        val pts = Tables.part(s, d)
          .select(round(col("p_retailprice") * 100, 0).cast("long").as("price_cents"),
            col("p_size").cast("long").as("psize"), col("p_partkey"))
          .groupBy("price_cents", "psize")
          .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("rep_partkey"))
          .as[(Long, Long, Long, Long)]
        val np = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
        val parted = pts
          .repartitionByRange(np, col("price_cents"), col("psize").desc)
          .sortWithinPartitions(col("price_cents"), col("psize").desc)
          .persist()
        try {
          val maxes = parted.mapPartitions { it =>
            val pid = TaskContext.getPartitionId()
            var mx = Long.MinValue; var n = 0L
            it.foreach { r => if (r._2 > mx) mx = r._2; n += 1 }
            if (n == 0L) Iterator.empty else Iterator((pid, mx))
          }.collect().sortBy(_._1)
          var acc = Long.MinValue
          val carry = maxes.map { case (pid, mx) =>
            val c = acc; acc = math.max(acc, mx); pid -> c
          }.toMap
          val bc = s.sparkContext.broadcast(carry)
          val sky = parted.mapPartitions { it =>
            val pid = TaskContext.getPartitionId()
            var mx = bc.value.getOrElse(pid, Long.MinValue)
            it.flatMap { case r @ (_, sz, _, _) =>
              val keep = sz > mx
              if (sz > mx) mx = sz
              if (keep) Some(r) else None
            }
          }.collect()
          // bounded collect: sizes strictly increase along the frontier,
          // so |skyline| <= |distinct psize| (a ~50-value domain here) —
          // never data-sized
          sky.toSeq.toDF("price_cents", "psize", "n_parts", "rep_partkey")
            .orderBy("price_cents")
        } finally parted.unpersist()
      },
      Some("""WITH pts AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT)
             |      AS price_cents,
             |    CAST(p_size AS BIGINT) AS psize,
             |    count(*) AS n_parts, min(p_partkey) AS rep_partkey
             |  FROM part GROUP BY 1, 2)
             |SELECT price_cents, psize, n_parts, rep_partkey FROM pts p
             |WHERE NOT EXISTS (SELECT 1 FROM pts q
             |  WHERE q.price_cents <= p.price_cents AND q.psize >= p.psize
             |    AND (q.price_cents < p.price_cents OR q.psize > p.psize))
             |ORDER BY price_cents""".stripMargin)),
  )
}
