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
