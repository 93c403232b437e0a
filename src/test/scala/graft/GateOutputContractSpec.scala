package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Gate-output contract: the driver's correctness comparator sorts rows
  * with pandas and crashes on ARRAY/MAP/STRUCT cells (round-9 lesson:
  * three gates shipped raw arrays and erred on the driver while passing
  * the repo's more-lenient local replay). Every gated query must emit
  * scalar columns only — list-shaped results leave as `to_json` (or a
  * fixed-scale decimal-string CSV for doubles, whose JSON formatting is
  * engine-dependent). The same rule is enforced at replay time by
  * tools/crosscheck.py; this spec catches it at `sbt test` time, before
  * any dump exists.
  *
  * Construction runs at sf0.001; a handful of gates execute real jobs at
  * DataFrame-construction time (Word2Vec training, BPE merge learning,
  * iterative graph ops) — cheap at this scale and their schemas must be
  * checked like any other gate's, so nothing is skipped.
  */
class GateOutputContractSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session
  private val d = "/root/testdata/sf0.001"

  test("no gate emits a top-level ARRAY/MAP/STRUCT column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, d).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      "gates emitting driver-incomparable complex-typed columns " +
        s"(serialize with to_json at the query boundary):\n  " +
        offenders.mkString("\n  "))
  }
}
