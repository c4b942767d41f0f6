package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / set operators (SURVEY §2.6). */
object SetOpQueries {

  val defs: Seq[QueryDef] = Seq(

    // O1 — multi-key output sort + limit (reference: leaderboard sort, viz.py:513)
    QueryDef(
      "o1_sort_multikey",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_ds"),
            col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_returnflag"), col("ship_ds"), col("l_orderkey"),
            col("l_linenumber"))
          .limit(100),
      Some("""SELECT l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS ship_ds,
             |       l_orderkey, l_linenumber
             |FROM lineitem
             |ORDER BY l_returnflag, ship_ds, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin)),

    // O2 — top-k by measure with unique tiebreak (reference: nlargest, viz.py:449)
    QueryDef(
      "o2_topk",
      (s, dir) =>
        Tables.orders(s, dir)
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // O3 — union / vertical concat (reference: weekly-file concat, data_io.py:38)
    QueryDef(
      "o3_union",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val a = li.filter(col("l_returnflag") === "R")
          .select(lit("returned").as("tag"), col("l_quantity"))
        val b = li.filter(col("l_returnflag") === "N")
          .select(lit("kept").as("tag"), col("l_quantity"))
        a.unionByName(b)
          .groupBy("tag")
          .agg(count(lit(1)).as("cnt"), Exact.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("tag")
      },
      Some(s"""SELECT tag, CAST(COUNT(*) AS BIGINT) AS cnt,
              |  ${Exact.sqlDsum("l_quantity")} AS sum_qty
              |FROM (
              |  SELECT 'returned' AS tag, l_quantity FROM lineitem WHERE l_returnflag = 'R'
              |  UNION ALL
              |  SELECT 'kept' AS tag, l_quantity FROM lineitem WHERE l_returnflag = 'N')
              |GROUP BY tag ORDER BY tag""".stripMargin)),

    // INTERSECT — common (returnflag, shipmode-less) pairs across two slices
    QueryDef(
      "o5_intersect",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_linestatus") === "F")
          .select("l_returnflag", "l_partkey")
          .intersect(li.filter(col("l_linestatus") === "O")
            .select("l_returnflag", "l_partkey"))
          .orderBy("l_returnflag", "l_partkey")
      },
      Some("""SELECT l_returnflag, l_partkey FROM lineitem WHERE l_linestatus = 'F'
             |INTERSECT
             |SELECT l_returnflag, l_partkey FROM lineitem WHERE l_linestatus = 'O'
             |ORDER BY l_returnflag, l_partkey""".stripMargin)),

    // EXCEPT — parts bulk-shipped only under 'F' status
    QueryDef(
      "o6_except",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_linestatus") === "F" && col("l_quantity") > 45)
          .select("l_partkey").distinct()
          .except(li.filter(col("l_linestatus") === "O" && col("l_quantity") > 45)
            .select("l_partkey").distinct())
          .orderBy("l_partkey")
      },
      Some("""SELECT DISTINCT l_partkey FROM lineitem
             |WHERE l_linestatus = 'F' AND l_quantity > 45
             |EXCEPT
             |SELECT DISTINCT l_partkey FROM lineitem
             |WHERE l_linestatus = 'O' AND l_quantity > 45
             |ORDER BY l_partkey""".stripMargin)),

    // UNPIVOT / melt — wide → long reshape (Dataset.unpivot; oracle as the
    // equivalent UNION ALL, which is its exact relational definition)
    QueryDef(
      "o7_unpivot",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice")),
            "metric", "val")
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             |         l_quantity AS val FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric,
             |         l_extendedprice AS val FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // O4 — distinct (reference: drop_duplicates(), routes.py:279)
    QueryDef(
      "o4_distinct",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
  )
}
