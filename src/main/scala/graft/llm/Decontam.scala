package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TRAINING-DATA DECONTAMINATION — the n-gram collision audit between
  * a training corpus and a held-out evaluation set (the procedure of
  * Brown et al. 2020, GPT-3 appendix C, and Chowdhery et al. 2022,
  * PaLM §8: a train document sharing any length-n word gram with an
  * eval document is flagged, because benchmark leakage inflates every
  * downstream score it touches).
  *
  * Grams are exact word n-grams over the house tokenization
  * (trim → lower → split on whitespace), kept as STRINGS — the flag
  * must be explainable (the colliding gram is part of the report), so
  * no hashing on this path. Documents shorter than n words carry no
  * grams (an explicit guard: Spark's `sequence` auto-selects step −1
  * when the upper bound dips below the lower — the q264 LangId lesson
  * — where the oracle's `range` is simply empty).
  *
  * Scale shape: eval sets are benchmark-sized (thousands of docs, a
  * few million grams) while the train side is the 100 TB corpus — so
  * the eval gram table is BROADCAST and the train side streams through
  * a map-side hash join with no shuffle of train grams at all; the one
  * wide operation is the per-doc aggregation of the (rare) hits.
  * The caller owns keeping `eval` broadcast-sized; a corpus-scale
  * right side belongs in [[Dedup.jaccardPairs]]' shuffle machinery
  * instead.
  */
object Decontam {

  /** Word n-grams of `text` as distinct strings — empty below n
    * tokens.
    */
  private def gramsOf(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val gram = (i: Column) => concat_ws(" ",
      (0 until n).map(j => element_at(toks, i + lit(j))): _*)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)), gram)))
      .otherwise(array().cast("array<string>"))
  }

  /** Contamination report: one row per train doc sharing ≥ 1 word
    * n-gram with any eval doc — (id, grams_hit, eval_docs_hit,
    * top_gram), ordered by id, where top_gram is the lexicographically
    * first colliding gram (the deterministic exhibit for the report).
    */
  def contaminationAudit(s: SparkSession, train: DataFrame, eval: DataFrame,
      n: Int, id: String = "id", text: String = "text"): DataFrame = {
    require(n >= 2 && n <= 32, s"contaminationAudit: 2 <= n <= 32: $n")
    val tg = train.select(col(id), explode(gramsOf(col(text), n)).as("g"))
    val eg = eval.select(col(id).as("eid"),
      explode(gramsOf(col(text), n)).as("g"))
    tg.join(broadcast(eg), "g")
      .groupBy(col(id))
      .agg(countDistinct(col("g")).as("grams_hit"),
        countDistinct(col("eid")).as("eval_docs_hit"),
        min(col("g")).as("top_gram"))
      .orderBy(col(id))
  }

  /** The STREAMING-LEGAL twin of [[contaminationAudit]]: identical
    * output by construction, but the per-doc aggregation uses
    * `size(collect_set(...))` because Spark refuses `countDistinct`
    * in a streaming aggregation — the set state is bounded by the
    * doc's gram count. Works on a streaming `train` side against a
    * static broadcast eval set (the ingest-time decontamination gate:
    * flag leaks as documents ARRIVE, before they reach a shard).
    */
  def contaminationAuditStream(train: DataFrame, eval: DataFrame,
      n: Int, id: String = "id", text: String = "text"): DataFrame = {
    require(n >= 2 && n <= 32, s"contaminationAuditStream: 2 <= n <= 32: $n")
    val tg = train.select(col(id), explode(gramsOf(col(text), n)).as("g"))
    val eg = eval.select(col(id).as("eid"),
      explode(gramsOf(col(text), n)).as("g"))
    tg.join(broadcast(eg), "g")
      .groupBy(col(id))
      .agg(size(collect_set(col("g"))).cast("long").as("grams_hit"),
        size(collect_set(col("eid"))).cast("long").as("eval_docs_hit"),
        min(col("g")).as("top_gram"))
  }

  /** The q322/q330 oracle — one SQL string shared by the batch entry
    * and its streaming twin, so their contracts cannot drift.
    */
  private val OracleSql =
    """WITH toks AS (SELECT doc_id,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(t) - 2),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
      |    AS sh
      |  FROM toks),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
      |tr AS (SELECT doc_id, g FROM e WHERE doc_id % 13 <> 0),
      |ev AS (SELECT doc_id AS eid, g FROM e WHERE doc_id % 13 = 0)
      |SELECT tr.doc_id AS doc_id,
      |  count(DISTINCT tr.g) AS grams_hit,
      |  count(DISTINCT ev.eid) AS eval_docs_hit,
      |  min(tr.g) AS top_gram
      |FROM tr JOIN ev ON tr.g = ev.g
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** SEMANTIC DECONTAMINATION — the embedding-space rung of the
    * decontamination ladder: n-gram overlap ([[contaminationAudit]],
    * q73) catches verbatim leakage, but a PARAPHRASED benchmark
    * question shares no 8-gram with its source; its embedding still
    * sits next to it. For every train vector, the max cosine against
    * the (small by definition) eval set; rows at or above `tauMilli`
    * are the semantic-leak review queue, each with its closest eval
    * item. Exactness: one vecCosine per (train, eval) pair
    * (codegen'd, bit-identical to the oracle's list_dot_product
    * chain), milli-rounded; the per-train argmax orders
    * (cos_milli desc, eval id asc).
    *
    * Scale shape: the eval set BROADCASTS (that is what makes
    * decontamination tractable — the q73 observation, in embedding
    * space); the corpus is one narrow pass; nothing n². Output:
    * (vec_id, eval_qid, cos_milli), vec_id asc.
    */
  def semanticDecontam(s: SparkSession, train: DataFrame, eval: DataFrame,
      tauMilli: Long, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = eval.select(col(id).as("qid"), col(vec).as("qv"))
    val scored = broadcast(ev).join(
        train.select(col(id), col(vec)), lit(true))
      .withColumn("cos_milli",
        round(graft.functions.VecFunctions.vecCosine(s, col("qv"), col(vec))
          * 1000, 0).cast("long"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("cos_milli").desc, col("qid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("cos_milli") >= tauMilli)
      .select(col(id), col("qid").as("eval_qid"), col("cos_milli"))
      .orderBy(id)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q427: SEMANTIC DECONTAMINATION — max eval-set cosine per
    //      train vector (eval = vec_id < 20, the q73 slice), review
    //      queue at ≥ 0.35. The oracle replays every cosine, the
    //      milli rounding, and the argmax tie order. ----
    "q427_semantic_decontam" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        semanticDecontam(s, e.filter(col("vec_id") >= 20),
          e.filter(col("vec_id") < 20), tauMilli = 350L)
      },
      Some("""WITH e AS (SELECT vec_id,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |ev AS (SELECT vec_id AS qid, v AS qv FROM e
             |  WHERE vec_id < 20),
             |tr AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
             |sc AS (SELECT tr.vec_id, ev.qid,
             |    CAST(round(list_dot_product(ev.qv, tr.v)
             |      / (sqrt(list_dot_product(ev.qv, ev.qv))
             |         * sqrt(list_dot_product(tr.v, tr.v))) * 1000)
             |      AS BIGINT) AS cos_milli
             |  FROM tr CROSS JOIN ev),
             |top AS (SELECT vec_id, qid AS eval_qid, cos_milli
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cos_milli DESC, qid) AS rn FROM sc)
             |  WHERE rn = 1)
             |SELECT vec_id, eval_qid, cos_milli FROM top
             |WHERE cos_milli >= 350 ORDER BY vec_id""".stripMargin)),

    // ---- q322: DECONTAMINATION AUDIT of the documents corpus — the
    //      held-out eval set is the deterministic doc_id % 13 == 0
    //      slice (the planted near-dup groups straddle it, so the
    //      audit has real positives); 4-word grams over the house
    //      tokenization; eval grams broadcast. ----
    "q322_decontamination" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("text"))
        contaminationAudit(s,
          docs.filter(col("id") % 13 =!= 0),
          docs.filter(col("id") % 13 === 0), n = 4)
          .withColumnRenamed("id", "doc_id")
      },
      Some(OracleSql)),

    // ---- q330: STREAMING decontamination — the identical audit as a
    //      stream-static join at INGEST: train docs arrive as a
    //      stream, the eval gram set is static and broadcast, leaks
    //      are flagged before a document reaches a shard. Same oracle
    //      string as q322: streaming-vs-batch parity enforced by the
    //      driver hash. ----
    "q330_stream_decontam" -> Q(
      (s, d) => {
        val sch = s.read.parquet(s"$d/documents.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{documents.parquet}")
        val train = raw.select(col("doc_id").as("id"), col("text"))
          .filter(col("id") % 13 =!= 0)
        val evalDocs = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("text"))
          .filter(col("id") % 13 === 0)
        val out = contaminationAuditStream(train, evalDocs, n = 4)
        val q = out.writeStream.format("memory")
          .queryName("stream_decontam").outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_decontam")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(OracleSql)),
  )
}
