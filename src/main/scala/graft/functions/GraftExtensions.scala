package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** SparkSessionExtensions entry point: registers graft's native functions so
  * they are callable from SQL (`SELECT rolling_hash(text) ...`) as well as the
  * DataFrame API ([[GraftFunctions]]).
  *
  * Wire up with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      RollingHash.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "rolling_hash takes exactly 1 argument")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      FloatDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "float_dot takes exactly 2 arguments")
        FloatDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("float_l2sq"),
      FloatL2Sq.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "float_l2sq takes exactly 2 arguments")
        FloatL2Sq(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("token_gram_hash"),
      TokenGramHash.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "token_gram_hash takes exactly 2 arguments")
        TokenGramHash(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      PqAdc.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "pq_adc takes exactly 2 arguments")
        PqAdc(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("whitespace_tokens"),
      WhitespaceText.tokensInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "whitespace_tokens takes exactly 1 argument")
        WhitespaceTokens(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("token_bigrams"),
      WhitespaceText.bigramsInfo,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "token_bigrams takes exactly 1 argument")
        TokenBigrams(children.head)
      }))
  }
}

/** DataFrame-API handles for the native functions (resolved through the
  * session's FunctionRegistry, so [[GraftExtensions]] must be installed). */
object GraftFunctions {
  def rolling_hash(c: Column): Column = call_function("rolling_hash", c)
  def float_dot(a: Column, b: Column): Column = call_function("float_dot", a, b)
  def float_l2sq(a: Column, b: Column): Column = call_function("float_l2sq", a, b)
  def token_gram_hash(c: Column, n: Column): Column =
    call_function("token_gram_hash", c, n)
  def pq_adc(tbl: Column, codes: Column): Column =
    call_function("pq_adc", tbl, codes)
  def whitespace_tokens(c: Column): Column = call_function("whitespace_tokens", c)
  def token_bigrams(c: Column): Column = call_function("token_bigrams", c)
}
