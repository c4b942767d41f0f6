package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("perGroup matches the window row_number form exactly") {
    import spark.implicits._
    val df = (1 to 500).map { i =>
      (s"g${i % 7}", i * 37 % 101 * 1.0, s"id$i")
    }.toDF("grp", "score", "id")

    val viaAgg = TopK.perGroup(df, Seq("grp"), "score", "id", 3)
      .select("grp", "rank", "score", "id")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("grp", "rank", "score", "id")

    assert(viaAgg.count() === viaWindow.count())
    assert(viaAgg.except(viaWindow).count() === 0)
    assert(viaWindow.except(viaAgg).count() === 0)
  }

  test("groups smaller than k return all their rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1.0, "x"), ("a", 2.0, "y")).toDF("grp", "score", "id")
    val top = TopK.perGroup(df, Seq("grp"), "score", "id", 5)
      .orderBy("rank").collect()
    assert(top.length === 2)
    assert(top(0).getAs[String]("id") === "y") // higher score first
    assert(top(0).getAs[Int]("rank") === 1)
  }
}
