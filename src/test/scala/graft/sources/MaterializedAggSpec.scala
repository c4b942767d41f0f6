package graft.sources

import graft.SparkSpec
import graft.operators.ThetaSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: staged refreshes must be
  * value-identical to a one-shot recompute (exact for the algebraic
  * aggregates, sketch-identical for the theta distinct), the commit protocol
  * must survive crashes and replays, and a base-table rewrite must fail the
  * refresh loudly instead of double-counting.
  */
class MaterializedAggSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** One-shot reference aggregate shaped like [[MaterializedAgg.read]]. */
  private def oneShot(table: DataFrame): DataFrame =
    table.groupBy("g").agg(
      count(lit(1)).as("cnt"),
      sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
      (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
        count(col("v"))).as("avg_v"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("create + two refreshes == one-shot recompute (exact)") {
    import spark.implicits._
    val root = tmp("mview")
    val table = s"$root/t"
    val view = s"$root/v"
    def batch(r: Int): DataFrame =
      (0 until 500).map(i => ((i * 7 + r) % 13, i * 0.37 + r, i % 29))
        .toDF("g", "v", "u")

    batch(0).write.parquet(table)
    val id0 = MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v"), minCols = Seq("v"),
        maxCols = Seq("v"), distinctCols = Seq("u")))
    assert(MaterializedAgg.committedId(spark, view).contains(id0))

    (1 to 2).foreach { r =>
      batch(r).write.mode("append").parquet(table)
      MaterializedAgg.refresh(spark, view)
    }

    val got = MaterializedAgg.read(spark, view)
    val want = oneShot(spark.read.parquet(table))
    assert(rows(got.drop("distinct_u")) === rows(want),
      "maintained algebraic aggregates must equal a full recompute exactly")

    // the theta merge is bit-identical to sketching the union directly, so
    // the maintained estimate must EQUAL the direct estimate (here below k,
    // so both are exact distinct counts)
    val direct = spark.read.parquet(table).groupBy("g")
      .agg(ThetaSketch.thetaAgg(ThetaSketch.hashCol(col("u"))).as("sk"))
      .select(col("g"), ThetaSketch.estimateOf(col("sk")).as("distinct_u"))
    assert(rows(got.select("g", "distinct_u")) === rows(direct),
      "maintained sketch estimate must equal the direct-sketch estimate")
  }

  test("refresh with nothing appended is a committed no-op") {
    import spark.implicits._
    val root = tmp("mview_noop")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0), (2, 2.0)).toDF("g", "v").write.parquet(table)
    val id0 = MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    assert(MaterializedAgg.refresh(spark, view) === id0,
      "no appended files -> the committed state id must not move")
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(Seq((1, 1.0), (2, 2.0)).toDF("g", "v"))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("crash replay: a lost commit marker re-derives the same state") {
    import spark.implicits._
    val root = tmp("mview_crash")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0), (1, 2.0), (2, 3.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))

    Seq((1, 4.0), (3, 5.0)).toDF("g", "v").write.mode("append").parquet(table)
    val id1 = MaterializedAgg.refresh(spark, view)

    // simulate a crash between the state write and the marker publish:
    // drop the marker — the previous state becomes authoritative again
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(view, s"commit_$id1"), false))
    assert(MaterializedAgg.committedId(spark, view).exists(_ < id1))

    // the redo pins a NEW snapshot and replays the same delta from the old
    // committed state — converging to the identical result
    val id2 = MaterializedAgg.refresh(spark, view)
    assert(id2 > id1)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("multi-column group keys maintain like any other view") {
    import spark.implicits._
    val root = tmp("mview_multi")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0))
      .toDF("g", "h", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g", "h"), sumCols = Seq("v")))
    Seq((1, "a", 4.0), (2, "b", 5.0))
      .toDF("g", "h", "v").write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    val want = spark.read.parquet(table).groupBy("g", "h").agg(
      count(lit(1)).as("cnt"),
      sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
      (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
        count(col("v"))).as("avg_v"))
    assert(rows(MaterializedAgg.read(spark, view)) === rows(want))
  }

  test("appended-file schema drift fails refresh with the column named") {
    import spark.implicits._
    val root = tmp("mview_drift")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    // a producer drops the value column entirely
    Seq(Tuple1(2)).toDF("g").write.mode("append").parquet(table)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, view)
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("drift"),
      s"missing column must be named up front: ${e.getMessage}")
    // a producer retypes the GROUP column (int -> string, not losslessly
    // adaptable): refused with the column and both types named
    val root2 = tmp("mview_drift2")
    val table2 = s"$root2/t"
    val view2 = s"$root2/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table2)
    MaterializedAgg.create(spark, table2, view2,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq(("x", 2.0)).toDF("g", "v").write.mode("append").parquet(table2)
    val e2 = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, view2)
    }
    assert(e2.getMessage.contains("column g") &&
      e2.getMessage.contains("recorded int") &&
      e2.getMessage.contains("appended string"),
      s"retyped column must be named with both types: ${e2.getMessage}")

    // a SUM column retyped to string would be ERASED by the aggregation
    // casts (sum(cast(v)) nulls the uncastable) — the recorded type must
    // refuse it up front instead of silently corrupting the state
    val root3 = tmp("mview_drift3")
    val table3 = s"$root3/t"
    val view3 = s"$root3/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table3)
    MaterializedAgg.create(spark, table3, view3,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((1, "oops")).toDF("g", "v").write.mode("append").parquet(table3)
    val e3 = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, view3)
    }
    assert(e3.getMessage.contains("column v") &&
      e3.getMessage.contains("recorded double"),
      s"retyped sum column must be refused, not null-corrupted: ${e3.getMessage}")
  }

  test("recorded types adapt benign drift: numeric widening and string groups") {
    import spark.implicits._
    // sum column recorded double, appended as int: canUpCast widens it
    val root = tmp("mview_widen")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.5), (2, 2.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((1, 10)).toDF("g", "v").write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    val bySum = MaterializedAgg.read(spark, view).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("sum_v")).toMap
    assert(bySum === Map(1 -> 11.5, 2 -> 2.0))

    // group column recorded string, appended file infers it as int (the
    // partition-value inference drift): adapted into the recorded type
    val root2 = tmp("mview_strgroup")
    val table2 = s"$root2/t"
    val view2 = s"$root2/v"
    Seq(("1", 1.0), ("x", 2.0)).toDF("g", "v").write.parquet(table2)
    MaterializedAgg.create(spark, table2, view2,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((1, 10.0)).toDF("g", "v").write.mode("append").parquet(table2)
    MaterializedAgg.refresh(spark, view2)
    val byG = MaterializedAgg.read(spark, view2).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("sum_v")).toMap
    assert(byG === Map("1" -> 11.0, "x" -> 2.0),
      "int-inferred group values must fold into the recorded string group")
  }

  test("complex-typed spec columns round-trip the meta (struct group key)") {
    import spark.implicits._
    // struct<a:int,b:int> renders with COMMAS — the meta's recorded-types
    // line must survive that (';' pair separator), or refresh would fail
    // parsing its own meta
    val root = tmp("mview_struct")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1, 1.0), (1, 2, 2.0), (1, 1, 3.0))
      .toDF("a", "b", "v")
      .select(struct(col("a"), col("b")).as("g"), col("v"))
      .write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((1, 1, 4.0)).toDF("a", "b", "v")
      .select(struct(col("a"), col("b")).as("g"), col("v"))
      .write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    val got = MaterializedAgg.read(spark, view)
      .select(col("g.a"), col("g.b"), col("cnt"), col("sum_v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map((1, 1) -> ((3L, 8.0)), (1, 2) -> ((1L, 2.0))))
  }

  test("a base-table rewrite fails the refresh loudly") {
    import spark.implicits._
    val root = tmp("mview_rewrite")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0), (2, 2.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    // compaction rewrites every file: the append-only contract is broken
    Lake.compact(spark, table, rowsPerFile = 10)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, view)
    }
    assert(e.getMessage.contains("not append-related") ||
      e.getMessage.contains("no longer"),
      s"refresh after a rewrite must name the broken contract: ${e.getMessage}")
  }

  test("avg derives from per-column non-null counts, not row counts") {
    import spark.implicits._
    val root = tmp("mview_nulls")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, Some(2.0)), (1, None), (1, Some(4.0)), (2, None))
      .toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((1, Some(6.0)), (2, None: Option[Double]))
      .toDF("g", "v").write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    val got = MaterializedAgg.read(spark, view)
      .select("g", "cnt", "avg_v").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toMap
    assert(got(1) === ((4L, 4.0)), "avg over {2,4,6} ignoring the null row")
    assert(got(2)._1 === 2L)
    assert(got(2)._2 === null, "all-null group -> avg NULL like SQL")
  }

  test("composes with a streaming parquet sink (append-only by construction)") {
    import spark.implicits._
    val root = tmp("mview_stream")
    val table = s"$root/t"
    val view = s"$root/v"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, Double)]
    val q = mem.toDF().toDF("g", "v").writeStream
      .format("parquet").option("path", table)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      mem.addData((1, 1.0), (2, 2.0))
      q.processAllAvailable()
      // the sink's _spark_metadata log is top-level underscore-prefixed, so
      // the snapshot manifest ignores it like any other lake metadata
      MaterializedAgg.create(spark, table, view,
        MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
      mem.addData((1, 3.0), (3, 4.0))
      q.processAllAvailable()
      MaterializedAgg.refresh(spark, view)
    } finally q.stop()
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")),
      "view maintained across micro-batch appends must equal a full read")
  }

  test("maintained t-digest quantiles track exact percentiles") {
    import spark.implicits._
    val root = tmp("mview_q")
    val table = s"$root/t"
    val view = s"$root/v"
    // values 1..10000 split across two appends in interleaved order, so
    // each refresh's digest sees the full value range, not a sorted run
    val all = (1 to 10000).map(i => ("g", i.toDouble))
    all.filter(_._2.toInt % 2 == 0).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), quantileCols = Seq("v"),
        quantiles = Seq(0.5, 0.99)))
    all.filter(_._2.toInt % 2 == 1).toDF("g", "v")
      .write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)

    val r = MaterializedAgg.read(spark, view)
    assert(r.columns.toSet === Set("g", "cnt", "p50_v", "p99_v"))
    val row = r.collect().head
    val p50 = row.getAs[Double]("p50_v")
    val p99 = row.getAs[Double]("p99_v")
    assert(math.abs(p50 - 5000.0) < 100.0,
      s"p50 of 1..10000 should be ~5000, got $p50")
    assert(math.abs(p99 - 9900.0) < 100.0,
      s"p99 of 1..10000 should be ~9900, got $p99")
  }

  test("readAt time-travels the view to any committed refresh") {
    import spark.implicits._
    val root = tmp("mview_at")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0), (2, 2.0)).toDF("g", "v").write.parquet(table)
    val id0 = MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    val before = rows(MaterializedAgg.read(spark, view))
    Seq((1, 10.0), (3, 3.0)).toDF("g", "v").write.mode("append").parquet(table)
    val id1 = MaterializedAgg.refresh(spark, view)
    assert(MaterializedAgg.committedIds(spark, view) === Seq(id0, id1))
    assert(rows(MaterializedAgg.readAt(spark, view, id0)) === before,
      "the pre-ingest state must read back exactly")
    assert(rows(MaterializedAgg.readAt(spark, view, id1)) ===
      rows(MaterializedAgg.read(spark, view)))
    // vacuumed states fail loudly, current still serves
    MaterializedAgg.vacuum(spark, view)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.readAt(spark, view, id0)
    }
    assert(e.getMessage.contains("vacuum"))
    assert(rows(MaterializedAgg.readAt(spark, view, id1)) ===
      rows(MaterializedAgg.read(spark, view)))
  }

  test("dropSuperseded retains exactly one view-owned table snapshot") {
    import spark.implicits._
    val root = tmp("mview_drop")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    (1 to 3).foreach { r =>
      Seq((r, r.toDouble)).toDF("g", "v").write.mode("append").parquet(table)
      MaterializedAgg.refresh(spark, view, dropSuperseded = true)
    }
    // a no-op probe pin is dropped too
    MaterializedAgg.refresh(spark, view, dropSuperseded = true)
    val ids = Lake.snapshots(spark, table)
    assert(ids.size === 1,
      s"superseded manifests must be dropped, table still has $ids")
    assert(MaterializedAgg.committedId(spark, view).contains(ids.head))
    // the surviving pin still drives the next real refresh
    Seq((9, 9.0)).toDF("g", "v").write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view, dropSuperseded = true)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("property: ANY append sequence folds to the one-shot aggregate") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // arbitrary batch count/sizes/keys, null values included — the staged
    // fold must equal the one-shot recompute for every history, not just
    // the crafted fixtures above
    val genBatch = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 6)
      v <- Gen.option(Gen.chooseNum(-1e6, 1e6))
    } yield (g, v))
    val gen = Gen.resize(60, Gen.nonEmptyListOf(genBatch))
      .map(_.take(4)) // bound refresh count: each trial runs real Spark jobs
    val r = check(Parameters.default.withMinSuccessfulTests(5),
      Prop.forAll(gen) { batches =>
        val root = tmp("mview_prop")
        val table = s"$root/t"
        val view = s"$root/v"
        batches.head.toDF("g", "v").write.parquet(table)
        MaterializedAgg.create(spark, table, view,
          MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v"),
            minCols = Seq("v"), maxCols = Seq("v")))
        batches.tail.foreach { b =>
          b.toDF("g", "v").write.mode("append").parquet(table)
          MaterializedAgg.refresh(spark, view, dropSuperseded = true)
        }
        val got = rows(MaterializedAgg.read(spark, view))
        val want = rows(oneShot(spark.read.parquet(table)))
        val ok = got == want
        if (!ok) println(s"MISMATCH for ${batches.map(_.size)}:\n$got\n$want")
        ok
      })
    assert(r.passed, r.status.toString)
  }

  test("vacuum keeps only the committed state and reads still serve") {
    import spark.implicits._
    val root = tmp("mview_vac")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    (1 to 2).foreach { r =>
      Seq((r, r.toDouble)).toDF("g", "v").write.mode("append").parquet(table)
      MaterializedAgg.refresh(spark, view)
    }
    val dropped = MaterializedAgg.vacuum(spark, view)
    assert(dropped === 2, s"two superseded states expected, dropped $dropped")
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val states = fs.listStatus(new org.apache.hadoop.fs.Path(view))
      .map(_.getPath.getName).filter(_.startsWith("state_"))
    assert(states.length === 1)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("joined view: per-delta broadcast enrich folds to the one-shot join+aggregate") {
    import spark.implicits._
    val root = tmp("mview_join")
    val table = s"$root/t"
    val dimT = s"$root/d"
    val view = s"$root/v"
    // dim: 40 keys -> 4 nations; fact batches reference keys 0..39
    (0 until 40).map(k => (k.toLong, s"n${k % 4}")).toDF("ck", "nation")
      .write.parquet(dimT)
    def batch(r: Int): DataFrame =
      (0 until 500).map(i => ((i * 7 + r) % 40L, i * 0.37 + r, i % 29))
        .toDF("fk", "v", "u")
    batch(0).write.parquet(table)
    val spec = MaterializedAgg.Spec(Seq("nation"), sumCols = Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"), distinctCols = Seq("u"),
      dim = Some(MaterializedAgg.DimSpec(dimT,
        Seq("fk"), Seq("ck"), Seq("nation"))))
    MaterializedAgg.create(spark, table, view, spec)
    (1 to 2).foreach { r =>
      batch(r).write.mode("append").parquet(table)
      MaterializedAgg.refresh(spark, view)
    }
    val oneShotJoin = spark.read.parquet(table)
      .join(spark.read.parquet(dimT),
        col("fk") === col("ck"), "inner")
      .groupBy("nation").agg(
        count(lit(1)).as("cnt"),
        sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
        (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
          count(col("v"))).as("avg_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val got = MaterializedAgg.read(spark, view)
    assert(rows(got.drop("distinct_u")) === rows(oneShotJoin),
      "maintained joined aggregates must equal a one-shot join+recompute")
  }

  test("joined view: a moved dimension refuses refresh loudly; rebase adopts it") {
    import spark.implicits._
    val root = tmp("mview_join_drift")
    val table = s"$root/t"
    val dimT = s"$root/d"
    val view = s"$root/v"
    (0 until 10).map(k => (k.toLong, s"n${k % 2}")).toDF("ck", "nation")
      .write.parquet(dimT)
    def batch(r: Int): DataFrame =
      (0 until 100).map(i => ((i + r) % 10L, i * 1.0 + r)).toDF("fk", "v")
    batch(0).write.parquet(table)
    val spec = MaterializedAgg.Spec(Seq("nation"), sumCols = Seq("v"),
      dim = Some(MaterializedAgg.DimSpec(dimT,
        Seq("fk"), Seq("ck"), Seq("nation"))))
    MaterializedAgg.create(spark, table, view, spec)
    batch(1).write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    // the dimension moves (an append is a change too: per-delta enrichment
    // against it would split history across two dim versions)
    Seq((10L, "n9")).toDF("ck", "nation").write.mode("append").parquet(dimT)
    batch(2).write.mode("append").parquet(table)
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, view)
    }
    assert(e.getMessage.contains("rebase") && e.getMessage.contains(dimT),
      s"dim drift must name the repair path: ${e.getMessage}")
    // rebase: one full recompute against the CURRENT dim, then incremental
    // maintenance resumes
    val beforeIds = MaterializedAgg.committedIds(spark, view)
    MaterializedAgg.rebase(spark, view)
    assert(MaterializedAgg.committedIds(spark, view).size === beforeIds.size + 1,
      "rebase must commit a NEW state id, keeping history")
    def oneShot(): Set[String] = rows(spark.read.parquet(table)
      .join(spark.read.parquet(dimT), col("fk") === col("ck"), "inner")
      .groupBy("nation").agg(
        count(lit(1)).as("cnt"),
        sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
        (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
          count(col("v"))).as("avg_v")))
    assert(rows(MaterializedAgg.read(spark, view)) === oneShot())
    // and refreshes keep working against the new pin
    batch(3).write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    assert(rows(MaterializedAgg.read(spark, view)) === oneShot())
    // history: the pre-rebase state still time-travels
    assert(MaterializedAgg.readAt(spark, view, beforeIds.last).count() > 0)
  }

  test("rebase repairs a rewritten (e.g. deletion-compacted) base table") {
    import spark.implicits._
    val root = tmp("mview_rebase_rw")
    val table = s"$root/t"
    val view = s"$root/v"
    (0 until 200).map(i => (i % 7, i * 0.5)).toDF("g", "v")
      .write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    // a delete rewrites the table: refresh correctly refuses (append-only
    // contract), rebase is the documented repair
    val survivors = spark.read.parquet(table).filter(col("g") =!= 3)
      .collect().toSeq
    val schema = spark.read.parquet(table).schema
    Lake.safeReplace(spark,
      table, spark.createDataFrame(
        java.util.Arrays.asList(survivors: _*), schema))
    intercept[Exception] { MaterializedAgg.refresh(spark, view) }
    MaterializedAgg.rebase(spark, view)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")),
      "rebased view must reflect the post-delete table exactly")
  }

  test("retention maintenance loop: two full cycles, inodes bounded, reads correct throughout") {
    import spark.implicits._
    val root = tmp("mview_loop")
    val table = s"$root/t"
    val dimT = s"$root/d"
    val vPlain = s"$root/v_plain"
    val vJoin = s"$root/v_join"
    (0 until 20).map(k => (k.toLong, s"n${k % 3}")).toDF("ck", "nation")
      .write.parquet(dimT)
    def batch(r: Int): DataFrame =
      (0 until 300).map(i => ((i + r) % 20L, i * 0.11 + r)).toDF("fk", "v")
    batch(0).write.parquet(table)
    MaterializedAgg.create(spark, table, vPlain,
      MaterializedAgg.Spec(Seq("fk"), sumCols = Seq("v")))
    MaterializedAgg.create(spark, table, vJoin,
      MaterializedAgg.Spec(Seq("nation"), sumCols = Seq("v"),
        dim = Some(MaterializedAgg.DimSpec(dimT,
          Seq("fk"), Seq("ck"), Seq("nation")))))

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def inodes(path: String): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      var n = 0
      while (it.hasNext) { it.next(); n += 1 }
      n
    }
    def checkReads(): Unit = {
      assert(rows(MaterializedAgg.read(spark, vPlain)) ===
        rows(spark.read.parquet(table).groupBy("fk").agg(
          count(lit(1)).as("cnt"),
          sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
          (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
            count(col("v"))).as("avg_v"))))
      assert(rows(MaterializedAgg.read(spark, vJoin)) ===
        rows(spark.read.parquet(table)
          .join(spark.read.parquet(dimT), col("fk") === col("ck"), "inner")
          .groupBy("nation").agg(
            count(lit(1)).as("cnt"),
            sum(col("v").cast(graft.queries.Exact.dt)).cast("double").as("sum_v"),
            (sum(col("v").cast(graft.queries.Exact.dt)).cast("double") /
              count(col("v"))).as("avg_v"))))
    }

    // the full loop, TWICE: common (refresh) cycles accumulating appends,
    // then a periodic compacting cycle with its rebase fence
    var steadyInodes = -1
    (1 to 2).foreach { loop =>
      (1 to 2).foreach { r =>
        batch(loop * 10 + r).write.mode("append").parquet(table)
        val rep = MaterializedAgg.maintenanceCycle(spark, table,
          Seq(vPlain, vJoin))
        assert(rep.compaction.isEmpty)
        checkReads()
      }
      val rep = MaterializedAgg.maintenanceCycle(spark, table,
        Seq(vPlain, vJoin), compactRowsPerFile = Some(10000L))
      assert(rep.compaction.isDefined)
      checkReads()
      // steady state: the inode count after each full loop must not grow
      val n = inodes(root)
      if (steadyInodes < 0) steadyInodes = n
      else assert(n <= steadyInodes,
        s"inode count grew across loops: $steadyInodes -> $n")
    }
    // the budget the scaladoc promises: one state dir + commit + meta per
    // view; one live table manifest PER VIEW (each view owns its pin) plus
    // one folded tombstone marker per table side
    Seq(vPlain, vJoin).foreach { v =>
      val states = fs.listStatus(new org.apache.hadoop.fs.Path(v))
        .map(_.getPath.getName).filter(_.startsWith("state_"))
      assert(states.length === 1, s"$v keeps ${states.length} states")
    }
    assert(Lake.snapshots(spark, table).size === 2,
      "each of the two views owns exactly one live table pin")
    assert(Lake.snapshots(spark, dimT).size === 1,
      "the joined view owns exactly one live dim pin")
  }

  test("retract: exact O(deleted+groups) delete repair for count/sum views") {
    import spark.implicits._
    val root = tmp("mview_retract")
    val table = s"$root/t"
    val view = s"$root/v"
    val docs = (0 until 300).map(i => (i % 7, i * 0.31, i.toLong))
      .toDF("g", "v", "id")
    docs.write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    // delete every row of group 3 plus half of group 5 — one group vanishes
    val gone = docs.filter(col("g") === 3 ||
      (col("g") === 5 && col("id") % 2 === 0))
    Lake.deleteByKey(spark, table, gone.select("id"), Seq("id"))
    MaterializedAgg.retract(spark, view, gone)
    val got = MaterializedAgg.read(spark, view)
    assert(got.filter(col("g") === 3).count() === 0,
      "a fully-retracted group must leave the view")
    assert(rows(got) === rows(oneShot(spark.read.parquet(table))
      .select("g", "cnt", "sum_v", "avg_v")),
      "retracted state must equal a one-shot recompute over survivors")
    // incremental maintenance RESUMES from the post-delete pin
    Seq((3, 9.0, 999L)).toDF("g", "v", "id")
      .write.mode("append").parquet(table)
    MaterializedAgg.refresh(spark, view)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("retract refuses what cannot retract, and fails loudly on a wrong deleted set") {
    import spark.implicits._
    val root = tmp("mview_retract_guard")
    val table = s"$root/t"
    // min/max state cannot retract -> refused by name
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    val vMin = s"$root/v_min"
    MaterializedAgg.create(spark, table, vMin,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v"), minCols = Seq("v")))
    val eMin = intercept[IllegalArgumentException] {
      MaterializedAgg.retract(spark, vMin, Seq((1, 1.0)).toDF("g", "v"))
    }
    assert(eMin.getMessage.contains("min(v)") &&
      eMin.getMessage.contains("rebase"))
    // a deleted set that was never in the view -> negative count, loud, no commit
    val table2 = s"$root/t2"
    val v2 = s"$root/v2"
    (0 until 50).map(i => (i % 3, i * 1.0)).toDF("g", "v")
      .write.parquet(table2)
    MaterializedAgg.create(spark, table2, v2,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    val id0 = MaterializedAgg.committedId(spark, v2).get
    val eNeg = intercept[IllegalArgumentException] {
      MaterializedAgg.retract(spark, v2,
        (0 until 100).map(i => (9, i * 1.0)).toDF("g", "v")) // group 9 never existed
    }
    assert(eNeg.getMessage.contains("NEGATIVE"), eNeg.getMessage)
    assert(MaterializedAgg.committedId(spark, v2).contains(id0),
      "a refused retract must commit nothing")
    // count audit: rows appended inside the delete->retract window -> loud
    val docs3 = (0 until 60).map(i => (i % 2, 1.0, i.toLong)).toDF("g", "v", "id")
    val table3 = s"$root/t3"
    val v3 = s"$root/v3"
    docs3.write.parquet(table3)
    MaterializedAgg.create(spark, table3, v3,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    val gone3 = docs3.filter(col("id") < 10)
    Lake.deleteByKey(spark, table3, gone3.select("id"), Seq("id"))
    // a write lands before the retract pins — the audit must catch it
    Seq((0, 1.0, 777L)).toDF("g", "v", "id")
      .write.mode("append").parquet(table3)
    val eAudit = intercept[IllegalArgumentException] {
      MaterializedAgg.retract(spark, v3, gone3)
    }
    assert(eAudit.getMessage.contains("does not match"), eAudit.getMessage)
    // rebase is the named recovery — and it works
    MaterializedAgg.rebase(spark, v3)
    assert(rows(MaterializedAgg.read(spark, v3)) ===
      rows(oneShot(spark.read.parquet(table3))
        .select("g", "cnt", "sum_v", "avg_v")))
  }

  test("single-writer lease: an interleaved second refresher fails by name, pins nothing") {
    import spark.implicits._
    val root = tmp("mview_lease")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((2, 2.0)).toDF("g", "v").write.mode("append").parquet(table)
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(view, "_graft_view_lock")
    // writer A is mid-refresh: its lease is on disk (the deterministic
    // interleave — the lease is taken before anything else a refresh does)
    fs.create(lock, false).close()
    val pinsBefore = Lake.snapshots(spark, table)
    val e = intercept[IllegalStateException] {
      MaterializedAgg.refresh(spark, view)
    }
    assert(e.getMessage.contains("lease") && e.getMessage.contains("refresh"),
      s"second writer must fail naming the lease: ${e.getMessage}")
    // the loser pinned NOTHING: lease acquisition precedes the snapshot pin
    assert(Lake.snapshots(spark, table) === pinsBefore,
      "a lease-refused refresh must not leak a snapshot manifest")
    // vacuum is a writer too
    intercept[IllegalStateException] { MaterializedAgg.vacuum(spark, view) }
    // writer A finishes (lease released) -> the next refresh proceeds
    fs.delete(lock, false)
    MaterializedAgg.refresh(spark, view)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
    assert(!fs.exists(lock), "a finished refresh must release its lease")
  }

  test("single-writer lease: heartbeat keeps a LIVE long operation's lease " +
      "fresh past the stale horizon") {
    // r12 ADVICE: without a heartbeat, any legitimate operation longer than
    // leaseStaleMs (plausible for a 100 TB rebase) would let a second
    // writer "take over" a LIVE writer's lease — the exact interleaving
    // the lease exists to prevent. The body below outlives the horizon 3×;
    // a second writer probing mid-body must still be refused.
    val root = tmp("mview_lease_heartbeat")
    val view = s"$root/v"
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staleMs = 600L
    MaterializedAgg.withLease(fs, view, "refresh", staleMs) {
      Thread.sleep(staleMs * 3)
      val e = intercept[IllegalStateException] {
        MaterializedAgg.withLease(fs, view, "refresh", staleMs)(())
      }
      assert(e.getMessage.contains("lease"),
        s"live-but-long holder must keep its lease: ${e.getMessage}")
    }
    // released on exit: the next writer proceeds
    MaterializedAgg.withLease(fs, view, "refresh", staleMs)(())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(view, "_graft_view_lock")))
  }

  test("single-writer lease: a crashed writer's stale lease is taken over") {
    import spark.implicits._
    val root = tmp("mview_lease_stale")
    val table = s"$root/t"
    val view = s"$root/v"
    Seq((1, 1.0)).toDF("g", "v").write.parquet(table)
    MaterializedAgg.create(spark, table, view,
      MaterializedAgg.Spec(Seq("g"), sumCols = Seq("v")))
    Seq((2, 2.0)).toDF("g", "v").write.mode("append").parquet(table)
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(view, "_graft_view_lock")
    fs.create(lock, false).close()
    // age the lease past the staleness horizon (a crashed writer's leftovers)
    val old = System.currentTimeMillis() - 60000L
    fs.setTimes(lock, old, old)
    MaterializedAgg.refresh(spark, view, leaseStaleMs = 30000L)
    assert(rows(MaterializedAgg.read(spark, view)) ===
      rows(oneShot(spark.read.parquet(table))
        .select("g", "cnt", "sum_v", "avg_v")))
    assert(!fs.exists(lock), "takeover must still release the lease at the end")
  }
}
