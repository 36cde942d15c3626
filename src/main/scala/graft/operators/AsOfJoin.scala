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
  * Right value columns MAY be null: the carry moves ONE struct of all right
  * values per right row (a struct with null fields is itself non-null), so
  * the latest right row's values surface verbatim — a per-column
  * `last(_, ignoreNulls)` carry would instead resurrect an OLDER row's value
  * wherever the latest row holds a null.
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
    val rvType = org.apache.spark.sql.types.StructType(rightValues.map(c =>
      right.schema(right.schema.fieldIndex(c)).copy(name = c)))
    val leftCols = left.columns
    val unioned = EtlOps.unionPages(Seq(
      left.select(
        (Seq(col(leftKey).as("__k"), col(leftTs).as("__t"),
          lit(0).as("__side"), // left sorts after right at equal ts
          lit(null).cast(rvType).as("__rv")) ++
          leftCols.map(col)): _*),
      right.select(
        (Seq(col(rightKey).as("__k"), col(rightTs).as("__t"),
          lit(1).as("__side"),
          struct(rightValues.map(col): _*).as("__rv")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)))

    // Right rows (side=1) sort BEFORE left rows at the same timestamp, so an
    // exactly-simultaneous right row is visible to the left row (<= bound).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        rightValues.map(c => col("__last")(c).as(c)): _*)
  }
}
