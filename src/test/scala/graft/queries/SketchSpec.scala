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
    // register-wise max merge is order-independent, so merged-of-parts and
    // direct sketching see identical registers. The ESTIMATES can still
    // differ slightly at higher cardinalities (the union result estimates via
    // a different path than a stream-built sketch in dense HLL mode), so pin
    // near-agreement, not bit-equality.
    assert(math.abs(merged - direct).toDouble / math.max(direct, 1L) < 0.01,
      s"merged $merged vs direct $direct disagree beyond 1%")
    // default lgConfigK=12 -> ~1.6% standard error; 5% is a safe gate
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact drifted past 5%")
  }
}
