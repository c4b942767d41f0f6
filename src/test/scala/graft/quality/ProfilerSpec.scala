package graft.quality

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("nulls, distincts, and min/max per column from one frame") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (None, Some("b")), (Some(2L), Some("a")))
      .toDF("num", "str")
    val p = Profiler.profile(df).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("num").getAs[Long]("n_rows") === 4L)
    assert(p("num").getAs[Long]("n_nulls") === 1L)
    assert(p("num").getAs[Long]("n_distinct") === 2L) // nulls not counted
    assert(p("num").getAs[String]("min_s") === "1")
    assert(p("num").getAs[String]("max_s") === "2")
    assert(p("str").getAs[Long]("n_nulls") === 1L)
    assert(p("str").getAs[String]("min_s") === "a")
    assert(p("str").getAs[String]("max_s") === "b")
  }

  test("column names with quotes and backticks survive the pivot") {
    val df = Seq((1L, "x")).toDF("it's", "a`b")
    val names = Profiler.profile(df).collect()
      .map(_.getAs[String]("col_name")).toSet
    assert(names === Set("it's", "a`b"))
  }

  test("single-scan plan: one aggregate job, no per-column scans") {
    val df = spark.range(100).selectExpr("id", "id % 7 AS m", "CAST(id AS STRING) AS s")
    // assert on the COMPILED plan: post-execution AQE replaces leaves with
    // opaque query stages, hiding the scan nodes from collect
    val prof = Profiler.profile(df)
    val plan = prof.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.RangeExec => r
    }
    assert(scans.size === 1, s"profiler must scan the source once, saw ${scans.size}")
  }
}
