package graft

import graft.gate.GateQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two gate-output conventions the round-11 driver run taught
  * us (both red gates were harness-level, not numeric):
  *
  *   1. Sign of zero — DuckDB ROUND preserves IEEE -0.0, Spark round
  *      (BigDecimal) has no signed zero, and the driver hashes at
  *      bit/string level, so a q ≈ -1e-9 cell hash-mismatches while
  *      being numerically equal (a12: 4/1502 rows). Convention: every
  *      ROUND in oracle SQL carries `+ 0` (IEEE -0.0 + 0 = 0.0; exact
  *      no-op otherwise, NULL-preserving).
  *   2. Scalar-only outputs — the driver's pandas row sorter crashes
  *      on ARRAY cells ("unhashable type: numpy.ndarray", e13), so no
  *      gate emits ARRAY/MAP/STRUCT columns; arrays go out unnested.
  */
class OracleConventionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("every oracle ROUND(...) is sign-of-zero normalized with + 0") {
    for ((name, sql) <- GateQueries.oracles) {
      var from = 0
      while ({ val s = sql.indexOf("ROUND(", from); from = s; s >= 0 }) {
        var depth = 0
        var i = from + 5 // the '('
        var end = -1
        while (end < 0 && i < sql.length) {
          sql(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        assert(end > 0, s"$name: unbalanced ROUND( at $from")
        val tail = sql.substring(end + 1)
        assert(tail.startsWith(" + 0"),
          s"$name: ROUND at offset $from not followed by ` + 0` " +
            s"(context: …${sql.substring(from, math.min(end + 8, sql.length))})")
        from = end
      }
    }
  }

  test("Spark round never emits -0.0 (the engine side of the convention)") {
    val bits = spark.range(1)
      .select(round(lit(-1e-9), 6).as("z"))
      .collect().head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(bits) === 0L,
      s"Spark round(-1e-9, 6) emitted signed zero: $bits")
  }

  test("gate outputs are scalar columns only (driver sorter contract)") {
    val offenders = GateQueries.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val nonScalar = q(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      nonScalar
    }
    assert(offenders.isEmpty, s"non-scalar gate output columns:\n${offenders.mkString("\n")}")
  }
}
