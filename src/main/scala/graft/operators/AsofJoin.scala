package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for each left row, attach the latest right row
  * with the same key whose time ≤ the left row's time. An operator the
  * reference lacks and Spark has no native node for (SURVEY §7 custom-op
  * guidance: compose built-ins first).
  *
  * Implementation: union-marker + running `last(ignoreNulls)` window — a
  * single shuffle on the key, one ordered pass per partition, no per-row
  * range probe and no N×M candidate join. This is the partition-friendly
  * formulation at 100 TB scale; a skewed key behaves like any skewed window
  * partition (salt upstream if one key dominates).
  *
  * Ties: a right row at exactly the left row's time DOES match (>= semantics,
  * same as DuckDB ASOF JOIN). If several right rows share (key, time), the
  * one sorting last by `rightOrder` wins — pass a unique column for
  * deterministic results.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {

    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = StructType(left.schema.fields)

    val l = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__isLeft"),
        leftStruct.as("__left")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__isLeft"),
        lit(null).cast(leftType).as("__left")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    // right rows sort BEFORE left rows at equal time => inclusive (>=) match;
    // among equal-time right rows the last by rightOrder wins.
    val tieBreak = rightOrder.map(c => coalesce(col(s"__v_$c"), lit(null))).toSeq
    val w = Window.partitionBy("__k")
      .orderBy((col("__t").asc +: col("__isLeft").asc +: tieBreak.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueCols.foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__isLeft") === 1)
      .select(col("__left.*") +: valueCols.map(c => col(s"__v_$c").as(s"asof_$c")): _*)
  }
}
