package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharsetDecode, GramBuckets, HtmlMainContent, HtmlText, IcebergBucket, RepetitionStats, ShingleHashes, SimHash64, VectorDot}

/** Session extensions registering the engine's native expressions for
  * SQL use (`spark.sql.extensions=graft.api.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Registered: `vector_dot(a, b)` (codegen'd embedding dot product),
  * `simhash64(text)` (whole 64-bit SimHash signature in one per-row
  * call), `shingle_hashes(text, k)` (distinct 64-bit k-shingle hashes
  * — k must be a literal), `repetition_stats(text, n)` (per-doc
  * repetition signals — n must be a literal), `iceberg_bucket(v, n)`
  * (the Iceberg spec's murmur3 bucket transform — n must be a
  * literal), `html_text(html)` (crawl HTML → whitespace-normalized
  * plain text) — so pure-SQL pipelines get the same hot paths as the
  * Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.HofDotRewrite)
    // SQL UPDATE / MERGE INTO over graft-iceberg tables: Spark's
    // built-in row-level rewrites only fire for SupportsRowLevelOperations
    // connectors, so this rule claims the resolved UpdateTable /
    // MergeIntoTable nodes and lowers them to merge-on-read delta
    // commits (the Delta-Lake extension pattern). Analyzer rules are
    // BUILD-TIME only — sessions wanting SQL DML must be built with
    // these extensions (spark.sql.extensions=graft.api.GraftExtensions).
    ext.injectResolutionRule(_ => graft.sources.v2.GraftRowLevelRewrite)
    // ALTER TABLE ... CREATE/DROP BRANCH|TAG / FAST FORWARD: a
    // delegating parser recognizing the ref-management DDL Spark's
    // grammar lacks (the Iceberg SQL-extensions pattern)
    ext.injectParser((_, delegate) =>
      new graft.sources.v2.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val vectorDotDescriptor: Descriptor = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "vector_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    })

  val simHashDescriptor: Descriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "simhash64 takes exactly 1 argument")
      SimHash64(children.head)
    })

  val shingleHashesDescriptor: Descriptor = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "shingle_hashes takes exactly 2 arguments")
      require(children(1).foldable, "shingle_hashes k must be a literal")
      ShingleHashes(children.head,
        children(1).eval().asInstanceOf[Number].intValue())
    })

  val repetitionStatsDescriptor: Descriptor = (
    FunctionIdentifier("repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "repetition_stats takes exactly 2 arguments")
      require(children(1).foldable, "repetition_stats n must be a literal")
      RepetitionStats(children.head,
        children(1).eval().asInstanceOf[Number].intValue())
    })

  val icebergBucketDescriptor: Descriptor = (
    FunctionIdentifier("iceberg_bucket"),
    new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "iceberg_bucket takes exactly 2 arguments")
      require(children(1).foldable, "iceberg_bucket n must be a literal")
      IcebergBucket(children.head,
        children(1).eval().asInstanceOf[Number].intValue())
    })

  val gramBucketsDescriptor: Descriptor = (
    FunctionIdentifier("gram_buckets"),
    new ExpressionInfo(classOf[GramBuckets].getName, "gram_buckets"),
    (children: Seq[Expression]) => {
      require(children.length == 3, "gram_buckets takes exactly 3 arguments")
      require(children(1).foldable && children(2).foldable,
        "gram_buckets numBuckets and salt must be literals")
      GramBuckets(children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().toString)
    })

  val htmlTextDescriptor: Descriptor = (
    FunctionIdentifier("html_text"),
    new ExpressionInfo(classOf[HtmlText].getName, "html_text"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "html_text takes exactly 1 argument")
      HtmlText(children.head)
    })

  val mainContentDescriptor: Descriptor = (
    FunctionIdentifier("main_content"),
    new ExpressionInfo(classOf[HtmlMainContent].getName, "main_content"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "main_content takes exactly 1 argument")
      HtmlMainContent(children.head)
    })

  val decodeTextDescriptor: Descriptor = (
    FunctionIdentifier("decode_text"),
    new ExpressionInfo(classOf[CharsetDecode].getName, "decode_text"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "decode_text takes exactly 2 arguments")
      // null content-type (non-HTTP records) means "absent" — the
      // sniff/default path — not a null result
      CharsetDecode(children.head,
        org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(children(1),
          org.apache.spark.sql.catalyst.expressions.Literal(""))))
    })

  val descriptors: Seq[Descriptor] =
    Seq(vectorDotDescriptor, simHashDescriptor, shingleHashesDescriptor,
      repetitionStatsDescriptor, icebergBucketDescriptor, gramBucketsDescriptor,
      htmlTextDescriptor, mainContentDescriptor, decodeTextDescriptor)

  /** Register on an already-built session (tests, REPL): the SQL
    * functions plus the HOF-dot optimizer rewrite (via
    * `experimental.extraOptimizations`, the live-session equivalent of
    * `injectOptimizerRule`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.HofDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.HofDotRewrite
  }
}
