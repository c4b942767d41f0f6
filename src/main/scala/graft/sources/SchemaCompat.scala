package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Preflight gate: assert every testdata table arrives with the logical column
  * types the engine's queries assume — and fail LOUDLY, naming the offending
  * column and its physical arrival type, instead of letting a writer-side
  * encoding drift surface as dozens of per-query AnalysisExceptions.
  *
  * Motivation (round 7): the harness regenerated `events.ts` from
  * TIMESTAMP(NANOS) to `timestamp[us]` and 29 queries died one by one with
  * `DATATYPE_MISMATCH` deep inside their plans. A 100 TB lake has mixed
  * writers; the engine normalizes time encodings at the reader
  * ([[Tables.microsCol]]) and this gate pins exactly the set of encodings that
  * normalization handles, so the NEXT drift (a column going string, a key
  * widening) is one clear message, not a debugging session.
  */
object SchemaCompat {

  /** What a column is allowed to arrive as. */
  sealed trait Expect {
    def ok(dt: DataType): Boolean
    def show: String
  }
  /** Exactly this Spark logical type. */
  final case class Exactly(dt: DataType) extends Expect {
    def ok(d: DataType): Boolean = d == dt
    def show: String = dt.simpleString
  }
  /** Any encoding [[Tables.microsCol]] can normalize to epoch-µs. */
  case object TimeLike extends Expect {
    def ok(d: DataType): Boolean = d match {
      case TimestampType | TimestampNTZType | LongType => true
      case _ => false
    }
    def show: String = "timestamp | timestamp_ntz | bigint(nanos-as-long)"
  }
  /** Array of this element type (containsNull irrelevant to the queries). */
  final case class ArrayOf(elem: DataType) extends Expect {
    def ok(d: DataType): Boolean = d match {
      case ArrayType(e, _) => e == elem
      case _ => false
    }
    def show: String = s"array<${elem.simpleString}>"
  }

  /** The engine's contract with the lake, one row per (table, column). */
  val expected: Map[String, Seq[(String, Expect)]] = Map(
    "region" -> Seq("r_regionkey" -> Exactly(IntegerType), "r_name" -> Exactly(StringType)),
    "nation" -> Seq("n_nationkey" -> Exactly(IntegerType), "n_name" -> Exactly(StringType),
      "n_regionkey" -> Exactly(IntegerType)),
    "customer" -> Seq("c_custkey" -> Exactly(LongType), "c_name" -> Exactly(StringType),
      "c_nationkey" -> Exactly(IntegerType), "c_acctbal" -> Exactly(DoubleType),
      "c_mktsegment" -> Exactly(StringType)),
    "supplier" -> Seq("s_suppkey" -> Exactly(LongType), "s_name" -> Exactly(StringType),
      "s_nationkey" -> Exactly(IntegerType), "s_acctbal" -> Exactly(DoubleType)),
    "part" -> Seq("p_partkey" -> Exactly(LongType), "p_name" -> Exactly(StringType),
      "p_brand" -> Exactly(StringType), "p_type" -> Exactly(StringType),
      "p_size" -> Exactly(IntegerType), "p_retailprice" -> Exactly(DoubleType)),
    "orders" -> Seq("o_orderkey" -> Exactly(LongType), "o_custkey" -> Exactly(LongType),
      "o_orderstatus" -> Exactly(StringType), "o_totalprice" -> Exactly(DoubleType),
      "o_orderdate" -> Exactly(TimestampType), "o_orderpriority" -> Exactly(StringType)),
    "lineitem" -> Seq("l_orderkey" -> Exactly(LongType), "l_partkey" -> Exactly(LongType),
      "l_suppkey" -> Exactly(LongType), "l_linenumber" -> Exactly(IntegerType),
      "l_quantity" -> Exactly(DoubleType), "l_extendedprice" -> Exactly(DoubleType),
      "l_discount" -> Exactly(DoubleType), "l_tax" -> Exactly(DoubleType),
      "l_returnflag" -> Exactly(StringType), "l_linestatus" -> Exactly(StringType),
      "l_shipdate" -> Exactly(TimestampType)),
    "events" -> Seq("event_id" -> Exactly(LongType), "ts" -> TimeLike,
      "user_id" -> Exactly(LongType), "event_type" -> Exactly(StringType),
      "value" -> Exactly(DoubleType), "props" -> Exactly(StringType)),
    "documents" -> Seq("doc_id" -> Exactly(LongType), "text" -> Exactly(StringType),
      "lang" -> Exactly(StringType), "source" -> Exactly(StringType),
      "n_chars" -> Exactly(LongType)),
    "embeddings" -> Seq("vec_id" -> Exactly(LongType),
      "embedding" -> ArrayOf(FloatType), "label" -> Exactly(IntegerType)))

  /** All contract violations under `dir`, each naming table, column, the
    * arrival type, and the accepted set. Empty = compatible.
    */
  def problems(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema =
        try Right(Tables.read(spark, dir, table).schema)
        catch { case e: Throwable =>
          Left(s"$table: unreadable (${e.toString.takeWhile(_ != '\n').take(120)})")
        }
      schema match {
        case Left(err) => Seq(err)
        case Right(s) =>
          val byName = s.fields.map(f => f.name -> f.dataType).toMap
          cols.flatMap { case (name, want) =>
            byName.get(name) match {
              case None =>
                Some(s"$table.$name: MISSING (present: ${s.fieldNames.mkString(", ")})")
              case Some(got) if !want.ok(got) =>
                Some(s"$table.$name: arrived as ${got.simpleString}, engine accepts ${want.show}")
              case _ => None
            }
          }
      }
    }

  /** Throw with every violation listed, or return silently. */
  def preflight(spark: SparkSession, dir: String): Unit = {
    val ps = problems(spark, dir)
    if (ps.nonEmpty) throw new IllegalStateException(
      s"testdata at $dir is schema-incompatible with the engine:\n  " +
        ps.mkString("\n  "))
  }

  /** Column-by-column drift between a MAINTENANCE TARGET's on-disk schema
    * and the rows about to be merged into it (upsert/delete/SCD paths in
    * [[Lake]]). The same one-clear-message discipline as the testdata
    * preflight, extended to the tables the engine itself writes: without
    * it, a drifted updates frame surfaces as a declared-schema projection
    * silently dropping columns, or a unionByName analysis error naming no
    * root cause. Empty = compatible. */
  def maintenanceDrift(target: StructType, incoming: StructType,
      ctx: String): Seq[String] = {
    // nullability-insensitive comparison: parquet round-trips containsNull /
    // struct-field nullability faithfully, but the same VALUES arrive with
    // different nullability flags depending on how the updates frame was
    // built — that is not drift, and the old unionByName path merged it fine
    // Honor the session's column-resolution semantics: Spark resolves
    // column names case-insensitively unless spark.sql.caseSensitive is on,
    // so an updates frame differing only in case must match the same way
    // the old unionByName path resolved it (round-9 ADVICE — a
    // case-sensitive map here turned "ID" vs "id" into a false-positive
    // MISSING+extra pair). Messages keep the original spelling.
    val caseSensitive =
      org.apache.spark.sql.internal.SQLConf.get.caseSensitiveAnalysis
    def key(n: String): String = if (caseSensitive) n else n.toLowerCase
    val t = target.fields.map(f => key(f.name) -> ignoreNullability(f.dataType)).toMap
    val i = incoming.fields.map(f => key(f.name) -> ignoreNullability(f.dataType)).toMap
    val missing = target.fieldNames.toSeq.filterNot(n => i.contains(key(n))).map(n =>
      s"$ctx.$n: MISSING from incoming rows (target stores ${t(key(n)).simpleString})")
    val extra = incoming.fieldNames.toSeq.filterNot(n => t.contains(key(n))).map(n =>
      s"$ctx.$n: not a target column (incoming rows carry ${i(key(n)).simpleString})")
    val mismatch = target.fieldNames.toSeq
      .filter(n => i.get(key(n)).exists(_ != t(key(n)))).map(n =>
        s"$ctx.$n: target stores ${t(key(n)).simpleString}, " +
          s"incoming rows carry ${i(key(n)).simpleString}")
    missing ++ extra ++ mismatch
  }

  /** Nullability flags erased at every nesting level (Spark's own
    * `asNullable` is private[spark]). */
  private def ignoreNullability(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(ignoreNullability(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(ignoreNullability(k), ignoreNullability(v), valueContainsNull = true)
    case StructType(fields) => StructType(fields.map(f =>
      f.copy(dataType = ignoreNullability(f.dataType), nullable = true)))
    case other => other
  }

  /** [[maintenanceDrift]] that throws one message listing every drifted
    * column, or returns silently. */
  def preflightMaintenance(target: StructType, incoming: StructType,
      ctx: String): Unit = {
    val ps = maintenanceDrift(target, incoming, ctx)
    if (ps.nonEmpty) throw new IllegalStateException(
      s"$ctx: incoming rows are schema-incompatible with the target table:\n  " +
        ps.mkString("\n  "))
  }
}
