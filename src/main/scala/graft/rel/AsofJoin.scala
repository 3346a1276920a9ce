package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively. Built by composing
  * built-ins (the top of the extension preference order: no custom plan
  * node needed because the semantics decompose exactly):
  *
  * union the two sides tagged 0/1, sort within each key partition by
  * (ts, side), and carry the right side's payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding window. Each left
  * row then holds the most recent right row with `right.ts <= left.ts`
  * (ties resolved right-before-left, matching ASOF `>=` semantics).
  *
  * Scale: ONE sort shuffle on the join key — no range cross-product, no
  * per-key collect. Skewed keys behave like any window function (AQE
  * handles partition sizing; extreme single-key skew would need salting
  * at the caller).
  */
object AsofJoin {

  /** @param left      probe side (each row gets a match)
    * @param right     reference side (carried forward in time)
    * @param key       equi-join column name present on both sides
    * @param ts        event-time column name present on both sides
    * @param rightCols right-side columns to carry (renamed as given)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Map[String, String]): DataFrame =
    asofImpl(left, right, key, ts, rightCols, None)

  /** As-of join with a TOLERANCE (pandas merge_asof's `tolerance`): a
    * left row only matches a right row at most `toleranceMicros` old —
    * staler carries resolve to null payload, exactly as if no right row
    * existed. The carried right timestamp rides inside the payload
    * struct, so the tolerance check is a narrow post-filter on the same
    * single-shuffle plan. `ts` may be TimestampType or long micros.
    */
  def asofTolerance(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Map[String, String],
      toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0, s"tolerance must be >= 0: $toleranceMicros")
    asofImpl(left, right, key, ts, rightCols, Some(toleranceMicros))
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Map[String, String],
      tol: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightCols.values.toSeq
    // the right row travels as ONE struct so the carry is atomic: per-column
    // last(ignoreNulls) would skip null payload columns and stitch together
    // values from different right rows. The struct itself is non-null
    // exactly on right-side rows.
    // with a tolerance, the right row's own timestamp travels in the
    // struct so staleness is checkable after the carry
    val payFields = rightCols.map { case (src, dst) =>
      org.apache.spark.sql.types.StructField(dst, right.schema(src).dataType)
    }.toSeq ++ tol.map(_ =>
      org.apache.spark.sql.types.StructField("__rts", right.schema(ts).dataType))
    val payExprs = rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq ++
      tol.map(_ => col(ts).as("__rts"))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(payFields)))
    val r = right.select(
        Seq(col(key), col(ts), struct(payExprs: _*).as("__rpay")): _*)
      .withColumn("__side", lit(0))
    // align schemas for the union
    val rAll = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null)))
      .select((leftCols :+ "__side" :+ "__rpay").map(col): _*)
    val unioned = l.select((leftCols :+ "__side" :+ "__rpay").map(col): _*)
      .unionByName(rAll)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rpay", last(col("__rpay"), ignoreNulls = true).over(w))
    def micros(c: org.apache.spark.sql.Column) =
      right.schema(ts).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val withinTol = tol.fold(lit(true))(t =>
      col("__rpay").isNotNull &&
        micros(col(ts)) - micros(col("__rpay.__rts")) <= t)
    carried.foldLeft(filled.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, when(withinTol, col(s"__rpay.$c")))
    }.drop("__side", "__rpay")
  }
}
