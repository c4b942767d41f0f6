package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL catalog surface: registers every testdata table as a temp view so the
  * engine is fully drivable with `spark.sql(...)` (the sql_entry_revenue query
  * demonstrates parity with the DuckDB oracle on identical query text).
  */
object Catalog {
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { t =>
      try Tables.read(spark, dir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () } // tolerate absent optional tables
    }
}
