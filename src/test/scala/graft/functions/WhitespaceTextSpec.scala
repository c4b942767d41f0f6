package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WhitespaceTextSpec extends SparkSpec {

  private val tricky = Seq(
    "a b c",
    "  leading", "trailing  ", "   ",
    "", "one",
    "double  space   runs",
    "unicode éé 中文 mix",
    "tab\tis not a separator",
    "a b a b a" // repeated pairs
  )

  test("whitespace_tokens == filter(split(text,' '), x -> x != '') byte-for-byte") {
    import spark.implicits._
    val df = tricky.toDF("text")
    val got = df.select(expr("whitespace_tokens(text)").as("t")).collect()
    val want = df.select(
      expr("filter(split(text, ' '), x -> x != '')").as("t")).collect()
    got.zip(want).zip(tricky).foreach { case ((g, w), s) =>
      assert(g.getSeq[String](0) === w.getSeq[String](0), s"text=<$s>")
    }
    // null text -> null, same as the HOF chain
    val nul = Seq(Option.empty[String]).toDF("text")
      .select(expr("whitespace_tokens(text)")).head
    assert(nul.isNullAt(0))
  }

  test("token_bigrams == the transform/struct chain after explode") {
    import spark.implicits._
    val df = tricky.toDF("text")
    def rows(e: String) = df
      .select(col("text"), explode(expr(e)).as("bg"))
      .select(col("text"), col("bg.a"), col("bg.b"))
      .collect().toSeq
    val got = rows("token_bigrams(whitespace_tokens(text))")
    // the original interpreted chain guarded with size >= 2 before the
    // transform (sequence(1, 0) is DESCENDING); mirror that guard here
    val want = df
      .select(col("text"), expr("filter(split(text,' '), x -> x != '')").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("text"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS a, tk[i] AS b))"))
        .as("bg"))
      .select(col("text"), col("bg.a"), col("bg.b"))
      .collect().toSeq
    assert(got === want)
    // sub-pair docs produce no rows, not nulls
    val short = Seq("one", "", "   ").toDF("text")
      .select(explode(expr("token_bigrams(whitespace_tokens(text))")))
    assert(short.count() === 0)
  }

  test("gram-hash scoring key agrees between the pair table and the corpus " +
      "pass (the t_bigram_lm join contract)") {
    import spark.implicits._
    // the per-occurrence hash stream must equal the per-pair hash of the
    // same (a, b) — the exactness premise of the hash-keyed scoring join
    val df = Seq("x yy zzz yy x", "xy y zz").toDF("text")
    val occ = df.select(
      explode(expr("token_bigrams(whitespace_tokens(text))")).as("bg"))
      .select(col("bg.a"), col("bg.b"),
        expr("element_at(token_gram_hash(array(bg.a, bg.b), 2), 1)").as("hp"))
    val stream = df.select(
      posexplode(expr("token_bigrams(whitespace_tokens(text))"))
        .as(Seq("pos", "bg")),
      expr("token_gram_hash(whitespace_tokens(text), 2)").as("hs"))
      .select(col("bg.a"), col("bg.b"),
        expr("hs[pos]").as("hstream"))
    val joined = occ.join(stream, Seq("a", "b"))
    assert(joined.count() > 0)
    assert(joined.filter(col("hp") =!= col("hstream")).count() === 0)
  }
}
