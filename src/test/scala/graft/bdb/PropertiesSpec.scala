package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.{check, Parameters}

/** Randomized property tests (SURVEY §5). ScalaCheck drives the generators;
  * each property materializes ONE small Spark job per case (10 cases each to
  * keep the suite fast).
  */
class PropertiesSpec extends SparkSpec {

  private val params = Parameters.default.withMinSuccessfulTests(10)

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("property: double flip is identity for any coordinates/angles") {
    import spark.implicits._
    val genRow = for {
      x <- Gen.choose(0.0, 120.0); y <- Gen.choose(0.0, 53.3)
      dir <- Gen.choose(0.0, 360.0); left <- Gen.oneOf("left", "right")
    } yield (x, y, dir, left)
    holds(Prop.forAll(Gen.listOfN(8, genRow)) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("x", "y", "dir", "play_direction")
          .withColumn("o", col("dir"))
        val once = Normalize.notebookStyle(df)
        val twice = Normalize.notebookStyle(
          once.select(col("x_norm").as("x"), col("y_norm").as("y"),
            col("dir_norm").as("dir"), col("o_norm").as("o"),
            col("play_direction")))
        val bad = once.select("x", "y", "dir").collect().map(_.toSeq).toSeq
          .zip(twice.select("x_norm", "y_norm", "dir_norm").collect().map(_.toSeq).toSeq)
          .count { case (a, b) =>
            a.zip(b).exists { case (u: Double, v: Double) => math.abs(u - v) > 1e-9 }
          }
        bad == 0
      }
    })
  }

  test("property: converge-rate telescopes to dist[first] - dist[last]") {
    import spark.implicits._
    val genTraj = Gen.listOfN(12, Gen.choose(0.0, 50.0))
    holds(Prop.forAll(genTraj) { dists =>
      dists.size > 1 ==> {
        val df = dists.zipWithIndex.map { case (d, i) =>
          (1L, 1L, 10L, (i + 1).toLong, d)
        }.toDF("game_id", "play_id", "nfl_id", "frame_id", "dist_to_ball")
        val total = Labels.addConvergeRate(df)
          .agg(sum("converge_rate")).head().getDouble(0)
        math.abs(total - (dists.head - dists.last)) < 1e-9
      }
    })
  }

  test("property: angleDiff is bounded, symmetric, and zero on equal angles") {
    import spark.implicits._
    val genPair = for {
      a <- Gen.choose(0.0, 360.0); b <- Gen.choose(0.0, 360.0)
    } yield (a, b)
    holds(Prop.forAll(Gen.listOfN(20, genPair)) { pairs =>
      pairs.nonEmpty ==> {
        val df = pairs.toDF("a", "b")
        val out = df.select(
          Kinematics.angleDiff(col("a"), col("b")).as("ab"),
          Kinematics.angleDiff(col("b"), col("a")).as("ba"),
          Kinematics.angleDiff(col("a"), col("a")).as("aa")).collect()
        out.forall { r =>
          val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
          ab >= 0.0 && ab <= 180.0 && math.abs(ab - ba) < 1e-9 && aa == 0.0
        }
      }
    })
  }

  test("property: scaleTo100 output is within [0,100] with min→0 and max→100") {
    import spark.implicits._
    holds(Prop.forAll(Gen.listOfN(15, Gen.choose(-1e6, 1e6))) { vs =>
      vs.nonEmpty ==> {
        val scaled = Normalize.scaleTo100(vs.toDF("v"), "v", "s")
          .select("s").collect().map(_.getDouble(0))
        scaled.forall(s => s >= 0.0 && s <= 100.0) &&
          (vs.distinct.size == 1 ||
            (scaled.min == 0.0 && scaled.max > 100.0 - 1e-9))
      }
    })
  }
}
