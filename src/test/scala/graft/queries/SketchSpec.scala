package graft.queries

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a_hll_mergeable: merged daily sketches == one direct sketch, near exact") {
    val row = Registry.all.find(_.name == "a_hll_mergeable").get
      .run(spark, dir).head()
    val nDays = row.getAs[Long]("n_days")
    val merged = row.getAs[Long]("merged_users")
    val direct = row.getAs[Long]("direct_users")
    val exact = row.getAs[Long]("exact_users")
    assert(nDays > 1, "needs multiple partitions for the merge to mean anything")
    // register-wise max merge is order-independent: merging per-day sketches
    // must give the identical estimate to sketching the whole stream
    assert(merged === direct)
    // default lgConfigK=12 -> ~1.6% standard error; 5% is a safe gate
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact drifted past 5%")
  }
}
