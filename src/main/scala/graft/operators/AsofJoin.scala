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
  *
  * `toleranceSeconds` (pandas merge_asof semantics): the matched right row
  * must additionally satisfy leftTime − rightTime ≤ tolerance, else the
  * match is dropped (nulls) — there is no fallback to an older row, since
  * the as-of match is already the latest one. Requires time columns
  * castable to double seconds (timestamp or numeric).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      valueCols: Seq[String],
      rightOrder: Option[String] = None,
      toleranceSeconds: Option[Long] = None): DataFrame = {

    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = StructType(left.schema.fields)

    val l = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__isLeft"),
        leftStruct.as("__left"),
        lit(null).cast(right.schema(rightTime).dataType).as("__vt")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__isLeft"),
        lit(null).cast(leftType).as("__left"),
        col(rightTime).as("__vt")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)

    // right rows sort BEFORE left rows at equal time => inclusive (>=) match;
    // among equal-time right rows the last by rightOrder wins.
    val tieBreak = rightOrder.map(c => coalesce(col(s"__v_$c"), lit(null))).toSeq
    val w = Window.partitionBy("__k")
      .orderBy((col("__t").asc +: col("__isLeft").asc +: tieBreak.map(_.asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = (("__vt" +: valueCols.map(c => s"__v_$c"))
      .foldLeft(l.unionByName(r)) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      })
      .filter(col("__isLeft") === 1)
    // tolerance post-filter is exact: the carried match is the LATEST right
    // row ≤ t, so if it is older than the tolerance every other one is too
    val gated = toleranceSeconds match {
      case None => filled
      case Some(tol) =>
        // timestamps compare in exact integer microseconds — a double-seconds
        // diff could flip the boundary case (diff == tolerance) via rounding
        val isTs = right.schema(rightTime).dataType
          .isInstanceOf[org.apache.spark.sql.types.TimestampType]
        val stale = if (isTs)
          col("__vt").isNull ||
            (unix_micros(col("__t")) - unix_micros(col("__vt"))) > tol * 1000000L
        else
          col("__vt").isNull ||
            (col("__t").cast("double") - col("__vt").cast("double")) > tol.toDouble
        valueCols.foldLeft(filled) { (d, c) =>
          d.withColumn(s"__v_$c",
            when(stale, lit(null).cast(right.schema(c).dataType))
              .otherwise(col(s"__v_$c")))
        }
    }
    gated.select(
      col("__left.*") +: valueCols.map(c => col(s"__v_$c").as(s"asof_$c")): _*)
  }
}
