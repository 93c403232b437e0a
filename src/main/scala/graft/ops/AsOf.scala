package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** AS-OF JOIN: attach to each left row the payload of the LATEST right
  * row with the same key and time <= the left row's time — "the state
  * that was current when the event happened" (point-in-time lookup:
  * latest click before an error, latest price before a trade, latest
  * profile before a pageview).
  *
  * SCALE SHAPE: the naive form is a range join (`r.time <= l.time`
  * per key) whose per-key cost is |L|·|R| — quadratic on hot keys. This
  * implementation is the single-shuffle union form: both sides union
  * into one stream keyed on the join key, one window sorted by
  * (time, side, tie) carries the last-seen right payload forward, left
  * rows filter back out. Cost is one shuffle + one per-key sort-merge —
  * linear in |L|+|R| per key, the plan that survives 100 TB.
  *
  * SEMANTICS: a right row at exactly the left row's time IS visible
  * (<=, right sorts before left on the tie column); among right rows
  * with equal (key, time), the greatest `rightTie` wins. Left rows with
  * no preceding right row get a null payload. Determinism requires
  * `rightTie` to be unique per (key, time) on the right side. NOTE:
  * null keys GROUP TOGETHER (window-partition semantics) — unlike an
  * equi-join, a null-key left row sees null-key right rows; filter
  * nulls first if join semantics are wanted.
  */
object AsOf {

  /** @param payload right-side columns to attach (null-filled when no
    *                right row precedes); names must not collide with
    *                left columns — rename on the way in.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      time: String, rightTie: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: $collisions")
    val pType = StructType(payload.map(n => right.schema(n)))
    val lType = StructType(left.schema.fields)
    val tieType = right.schema(rightTie).dataType
    val r2 = right.select(col(key).as("__k"), col(time).as("__t"),
      lit(0).as("__side"), col(rightTie).as("__tie"),
      struct(payload.map(col): _*).as("__p"),
      lit(null).cast(lType).as("__row"))
    val l2 = left.select(col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__side"), lit(null).cast(tieType).as("__tie"),
      lit(null).cast(pType).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))
    // right rows sort before left at equal time (side 0 < 1) => `<=`
    // visibility; __tie only orders right rows among themselves (left
    // rows all carry null there, and side already separates the sides).
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r2.unionByName(l2)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*") +: payload.map(n => col(s"__asof.$n").as(n)): _*)
  }
}
