package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("mixture: deterministic, rate-monotone, and stable under repartition") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val rates = Map("src0" -> 1000, "src1" -> 500, "src2" -> 0)
    val kept = Sampling.mixture(docs, "id", "source", rates, defaultRate = 250)
    val counts = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("src0") === 500L) // rate 1000 keeps everything
    assert(!counts.contains("src2")) // rate 0 keeps nothing
    // ~50% / ~25% within generous bounds (hash is uniform-ish, not exact)
    assert(counts("src1") > 150 && counts("src1") < 350)
    assert(counts("src3") > 50 && counts("src3") < 200)

    // determinism: same input → identical kept set, regardless of layout
    val again = Sampling.mixture(docs.repartition(13), "id", "source", rates, 250)
    assert(again.select("id").except(kept.select("id")).count() === 0)
    assert(kept.select("id").except(again.select("id")).count() === 0)
  }

  test("mixture: keep/drop of a doc never changes when the corpus grows") {
    import spark.implicits._
    val small = (0L until 100L).map(i => (i, "s")).toDF("id", "source")
    val large = (0L until 1000L).map(i => (i, "s")).toDF("id", "source")
    val keptSmall = Sampling.mixture(small, "id", "source", Map("s" -> 400))
      .select("id").as[Long].collect().toSet
    val keptLarge = Sampling.mixture(large, "id", "source", Map("s" -> 400))
      .filter(col("id") < 100).select("id").as[Long].collect().toSet
    assert(keptSmall === keptLarge)
  }

  test("stratified: exactly k per stratum, deterministic, short strata kept whole") {
    import spark.implicits._
    val df = ((0L until 500L).map(i => (i, s"s${i % 4}")) ++
      Seq((9000L, "tiny"), (9001L, "tiny"))).toDF("id", "source")
    val sampled = Sampling.stratified(df, "source", "id", k = 25)
    val counts = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert((0 to 3).forall(i => counts(s"s$i") === 25L))
    assert(counts("tiny") === 2L) // stratum smaller than k survives whole
    // deterministic under physical layout changes
    val again = Sampling.stratified(df.repartition(17), "source", "id", 25)
    assert(again.select("id").except(sampled.select("id")).count() === 0)
    assert(sampled.select("id").except(again.select("id")).count() === 0)
  }

  test("perMille survives corpus-scale ids (no ANSI bigint overflow)") {
    import spark.implicits._
    // ids beyond 2^33: the naive id*2654435761 form overflows int64 here
    // and ANSI mode would throw ARITHMETIC_OVERFLOW
    val huge = Seq(5000000000L, 8000000000000L, Long.MaxValue / 3, 0L)
      .toDF("id")
    val pm = huge.select(Sampling.perMille(col("id")).as("pm"))
      .as[Long].collect()
    assert(pm.forall(v => v >= 0 && v < 1000))
    // modular-reduction form equals the naive form where the naive form
    // is computable without overflow
    val small = (0L until 3000L).toDF("id")
    val viaOp = small.select(Sampling.perMille(col("id"))).as[Long].collect()
    val naive = (0L until 3000L).map(i => ((i * 2654435761L) % 99991L) % 1000L)
    assert(viaOp.toSeq === naive)
  }

  test("mixture rejects out-of-range rates") {
    import spark.implicits._
    val docs = Seq((1L, "s")).toDF("id", "source")
    intercept[IllegalArgumentException] {
      Sampling.mixture(docs, "id", "source", Map("s" -> 1500))
    }
  }
}
