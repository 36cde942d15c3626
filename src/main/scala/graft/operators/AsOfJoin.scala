package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `rightTs <= leftTs` on the same key. The temporal-join primitive the
  * reference lacks entirely but every event/feature pipeline needs.
  *
  * Implementation is the union+window pattern, not a per-key subquery:
  * tag both sides, union, sort within each key by (ts, side), and carry the
  * last-seen right values forward with `last(..., ignoreNulls=true)`. Cost
  * is ONE shuffle of left+right by key and a per-key sort — the same
  * complexity as a sort-merge join, with no range-explosion, so it holds at
  * 100 TB (contrast a theta-join `l.ts >= r.ts`, which Spark plans as a
  * broadcast-nested-loop).
  *
  * The right side must be unique per (key, ts) — enforce upstream (e.g.
  * keep max-id per timestamp) or the "latest" row is undefined; this mirrors
  * DuckDB/pandas ASOF semantics which are likewise arbitrary under ties.
  * Right value columns should be non-null: the carry is per-column
  * (`last(_, ignoreNulls)`), so a null value in the latest right row would
  * surface the previous row's value for that column rather than null.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0)) // left sorts after right at equal ts
    val rightTagged = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTs).as("__t"),
        lit(1).as("__side")) ++
        rightValues.map(c => col(c).as(s"__r_$c"))): _*)

    val leftCols = left.columns
    val unioned = EtlOps.unionPages(Seq(
      leftTagged.select(
        (Seq(col("__k"), col("__t"), col("__side")) ++
          leftCols.map(col) ++
          rightValues.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*),
      rightTagged.select(
        (Seq(col("__k"), col("__t"), col("__side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightValues.map(c => col(s"__r_$c"))): _*)))

    // Right rows (side=1) sort BEFORE left rows at the same timestamp, so an
    // exactly-simultaneous right row is visible to the left row (<= bound).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValues.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        rightValues.map(c => col(s"__last_$c").as(c)): _*)
  }
}
