package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // normalize: every node → min id of its component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }.toMap
  }

  test("components match union-find on a random graph") {
    import spark.implicits._
    val rnd = new Random(7)
    // 60 nodes, sparse random edges → mix of singleton pairs, chains, merges
    val edges = (1 to 55).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(edges)
    val got = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("chain graph converges to one component (worst-case diameter)") {
    import spark.implicits._
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val comps = ConnectedComponents.run(chain.toDF("src", "dst"))
    assert(comps.select("comp").distinct().count() === 1)
    assert(comps.count() === 30)
    assert(comps.agg(min("comp")).head().getLong(0) === 0L)
  }

  test("star contraction matches union-find on a random graph") {
    import spark.implicits._
    val rnd = new Random(11)
    val edges = (1 to 70).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(edges)
    val got = ConnectedComponents.runStarContraction(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("star contraction handles a 200-node chain (diameter >> round budget)") {
    import spark.implicits._
    // label propagation would need ~200 rounds; contraction is O(log² n)
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val comps = ConnectedComponents.runStarContraction(
      chain.toDF("src", "dst"), maxRounds = 20)
    assert(comps.count() === 200)
    assert(comps.select("comp").distinct().count() === 1)
    assert(comps.agg(max("comp")).head().getLong(0) === 0L)
  }

  test("star contraction: root-written star (advice regression)") {
    import spark.implicits._
    // Edges written FROM the root — no dst ever appears as a src, which the
    // old directed pre-loop check mistook for a converged star forest.
    val got = ConnectedComponents.runStarContraction(
      Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star contraction: single edge and two-root fan (advice regression)") {
    import spark.implicits._
    val single = ConnectedComponents.runStarContraction(
      Seq((1L, 2L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single === Map(1L -> 1L, 2L -> 1L))
    // (3,1),(3,2) canonicalizes to itself: no target is a source, but node 3
    // has TWO outgoing edges — must still merge into one component.
    val fan = ConnectedComponents.runStarContraction(
      Seq((3L, 1L), (3L, 2L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fan === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star contraction agrees with run() on LSH-oriented (d1<d2) pairs") {
    import spark.implicits._
    val rnd = new Random(23)
    val edges = (1 to 60)
      .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (a min b, a max b) } // LSH emits low→high
    val expected = unionFind(edges)
    val got = ConnectedComponents.runStarContraction(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  /** Driver-side greedy-by-id MIS ground truth: drop a node iff it has an
    * edge to a previously KEPT node (ascending id order). */
  private def greedyDrops(edges: Seq[(Long, Long)]): Set[Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val kept = scala.collection.mutable.Set[Long]()
    val dropped = scala.collection.mutable.Set[Long]()
    nodes.foreach { n =>
      if (adj(n).exists(kept.contains)) dropped += n else kept += n
    }
    dropped.toSet
  }

  test("greedy keep-first: chain A~B~C drops only B") {
    import spark.implicits._
    val drops = ConnectedComponents
      .greedyKeepFirstDrops(Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2"))
      .collect().map(_.getLong(0)).toSet
    assert(drops === Set(2L), "C is similar only to dropped B and must survive")
  }

  test("greedy keep-first matches driver-side greedy on a random graph") {
    import spark.implicits._
    val rnd = new Random(31)
    val edges = (1 to 80).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (a min b, a max b) }.distinct
    val expected = greedyDrops(edges)
    val got = ConnectedComponents.greedyKeepFirstDrops(edges.toDF("d1", "d2"))
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("greedy keep-first: empty pair set and clique") {
    import spark.implicits._
    assert(ConnectedComponents.greedyKeepFirstDrops(
      Seq.empty[(Long, Long)].toDF("d1", "d2")).count() === 0)
    // clique keeps exactly the min id
    val clique = for (i <- 5L to 8L; j <- i + 1 to 8L) yield (i, j)
    val drops = ConnectedComponents.greedyKeepFirstDrops(clique.toDF("d1", "d2"))
      .collect().map(_.getLong(0)).toSet
    assert(drops === Set(6L, 7L, 8L))
  }

  test("disjoint cliques stay separate") {
    import spark.implicits._
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    val comps = ConnectedComponents.run((cliqueA ++ cliqueB).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(comps(_) == 0L))
    assert((10L to 13L).forall(comps(_) == 10L))
  }
}
