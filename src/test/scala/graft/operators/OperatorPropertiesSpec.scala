package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.{check, Parameters}

/** Randomized properties for the training-data operators: invariants that
  * must hold for ANY input, not just the crafted fixtures.
  */
class OperatorPropertiesSpec extends SparkSpec {

  private val params = Parameters.default.withMinSuccessfulTests(10)

  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("property: packing conserves tokens, bounds offsets, and never collides seq_ids") {
    import spark.implicits._
    val genDoc = for {
      id <- Gen.choose(0L, 100000L); tok <- Gen.choose(1L, 700L)
    } yield (id, tok)
    holds(Prop.forAll(Gen.listOfN(60, genDoc),
      Gen.choose(64, 512), Gen.choose(1, 8)) { (docs0, cap, shards) =>
      val docs = docs0.distinctBy(_._1)
      docs.nonEmpty ==> {
        val packed = Packing.pack(docs.toDF("doc_id", "n_tok"),
          "doc_id", "n_tok", cap, shards).cache()
        try {
          // conservation: token totals per shard survive packing
          val total = packed.agg(sum("n_tok")).head().getLong(0)
          // offsets always inside the capacity
          val badOffset = packed
            .filter(col("seq_offset") < 0 || col("seq_offset") >= cap).count()
          // a (shard, seq-local) pair never repeats across shards
          val collisions = packed.groupBy("seq_id")
            .agg(countDistinct("shard").as("ns"))
            .filter(col("ns") > 1).count()
          total == docs.map(_._2).sum && badOffset == 0 && collisions == 0
        } finally { packed.unpersist(); true }
      }
    })
  }

  test("property: connected components labels are closed under the edge set") {
    import spark.implicits._
    val genEdge = for {
      a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L) if a != b
    } yield (a, b)
    holds(Prop.forAll(Gen.listOfN(25, genEdge)) { edges =>
      edges.nonEmpty ==> {
        val labels = ConnectedComponents.run(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // every edge's endpoints share a component, and every component
        // label is the minimum of its members
        val closed = edges.forall { case (a, b) => labels(a) == labels(b) }
        val mins = labels.groupBy(_._2).forall { case (comp, members) =>
          members.keys.min == comp
        }
        closed && mins
      }
    })
  }
}
