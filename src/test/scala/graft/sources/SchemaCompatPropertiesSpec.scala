package graft.sources

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties for the maintenance drift gate: for ANY schema,
  * drift is reported exactly when a real name/type mutation was applied —
  * never for nullability-only differences, always naming the mutated
  * column. Pure schema logic, no Spark session needed.
  */
class SchemaCompatPropertiesSpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(60)
  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val leafGen: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, DoubleType, StringType, BooleanType, DateType)
  private val typeGen: Gen[DataType] = Gen.frequency(
    6 -> leafGen,
    1 -> leafGen.flatMap(e => Gen.oneOf(true, false).map(ArrayType(e, _))),
    1 -> (for {
      e <- leafGen; n <- Gen.oneOf(true, false); m <- Gen.oneOf(true, false)
    } yield StructType(Seq(StructField("x", e, n), StructField("y", e, m)))))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 6)
    ts <- Gen.listOfN(n, typeGen)
  } yield StructType(ts.zipWithIndex.map { case (t, i) =>
    StructField(s"c$i", t)
  })

  /** Same value-shape, possibly different nullability flags at any level. */
  private def reNull(dt: DataType, flip: Boolean): DataType = dt match {
    case ArrayType(e, cn) => ArrayType(reNull(e, flip), cn ^ flip)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = reNull(f.dataType, flip), nullable = f.nullable ^ flip)))
    case other => other
  }

  test("property: identical schemas (modulo nullability) never report drift") {
    holds(Prop.forAll(schemaGen, Gen.oneOf(true, false)) { (s, flip) =>
      val twin = StructType(s.fields.map(f =>
        f.copy(dataType = reNull(f.dataType, flip), nullable = !f.nullable)))
      SchemaCompat.maintenanceDrift(s, twin, "p").isEmpty
    })
  }

  test("property: a retyped column is always reported, by name") {
    holds(Prop.forAll(schemaGen, Gen.choose(0, 100)) { (s, pick) =>
      val i = pick % s.fields.length
      val f = s.fields(i)
      val newType = if (f.dataType == LongType) StringType else LongType
      val mutated = StructType(s.fields.updated(i, f.copy(dataType = newType)))
      // mutate to a genuinely different value-type (the struct/array cases
      // flip the whole column type, also a real change)
      val drift = SchemaCompat.maintenanceDrift(s, mutated, "p")
      drift.nonEmpty && drift.exists(_.contains(f.name))
    })
  }

  test("property: a dropped column and an added column are both reported, by name") {
    holds(Prop.forAll(schemaGen) { s =>
      val dropped = StructType(s.fields.drop(1))
      val d1 = SchemaCompat.maintenanceDrift(s, dropped, "p")
      val added = StructType(s.fields :+ StructField("novel_col", LongType))
      val d2 = SchemaCompat.maintenanceDrift(s, added, "p")
      (d1.exists(m => m.contains(s.fields.head.name) && m.contains("MISSING"))
        || s.fields.length == 1 && d1.nonEmpty) &&
        d2.exists(_.contains("novel_col"))
    })
  }
}
