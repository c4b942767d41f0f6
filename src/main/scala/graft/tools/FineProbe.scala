package graft.tools
import graft.GraftSession
import org.apache.spark.sql.functions._
object FineProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val model = graft.ml.KerasLstm.load(graft.queries.ModelQueries.modelPath)
    val (_, seqs) = graft.queries.ModelQueries.inferInput(spark, dir, model.nFeatures)
    val keyCols = Seq("game_id", "play_id", "nfl_id")
    val bc = spark.sparkContext.broadcast(model)
    val calls = spark.sparkContext.longAccumulator("calls")
    val nanos = spark.sparkContext.longAccumulator("nanos")
    val forward = udf { (flat: Array[Double], n: Int) =>
      val t0 = System.nanoTime()
      val r = bc.value.forwardFlat(flat, n)
      nanos.add(System.nanoTime() - t0); calls.add(1); r
    }.asNondeterministic()
    val flatDf = seqs.select((keyCols.map(col) :+ col("seq_len") :+
      flatten(slice(col("seq"), lit(1), col("seq_len"))).as("flat")): _*)
      .repartition(spark.sparkContext.defaultParallelism)
    // warm
    flatDf.withColumn("p", forward(col("flat"), col("seq_len")))
      .select(col("game_id"), posexplode(col("p"))).count()
    calls.reset(); nanos.reset()
    val t0 = System.nanoTime()
    flatDf.withColumn("p", forward(col("flat"), col("seq_len")))
      .select(col("game_id"), posexplode(col("p"))).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[fine] wall=$wall%.3f s calls=${calls.value} udf-core-sec=${nanos.value/1e9}%.3f")
    spark.stop()
  }
}
