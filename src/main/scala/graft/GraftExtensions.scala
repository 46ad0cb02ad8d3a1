package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Spark extension injection point: makes every custom Catalyst expression
  * available to ANY session created with
  * `spark.sql.extensions=graft.GraftExtensions` — including plain
  * `spark-sql` / `spark-submit` users who never touch the library's Scala
  * API (the standard extension-library pattern; complements
  * [[graft.functions.GraftFunctions.register]] for sessions built in code).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft.functions", name)
    // optimizer rewrite: naive bit_count(a^b) <= k theta-joins become banded
    // LSH equi-joins (graft.plans.LshJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.LshJoinRule())
    // whole-operator tier: plans PoliteScheduleNode (the politeness
    // virtual-clock walk with declared distribution/ordering requirements)
    ext.injectPlannerStrategy(_ => graft.plans.PoliteScheduleStrategy)
    ext.injectFunction(
      (FunctionIdentifier("simhash64"), info("simhash64"),
        (es: Seq[Expression]) => Simhash64(es.head)))
    ext.injectFunction(
      (FunctionIdentifier("shannon_entropy"), info("shannon_entropy"),
        (es: Seq[Expression]) => ShannonEntropy(es.head)))
    ext.injectFunction(
      (FunctionIdentifier("canonicalize_url"), info("canonicalize_url"),
        (es: Seq[Expression]) => CanonicalizeUrl(es.head)))
    ext.injectFunction(
      (FunctionIdentifier("le_u32"), info("le_u32"),
        (es: Seq[Expression]) => LeU32(es.head, es(1))))
    ext.injectFunction(
      (FunctionIdentifier("rolling_minhash"), info("rolling_minhash"),
        (es: Seq[Expression]) => RollingMinHash(es.head, es(1))))
    ext.injectFunction(
      (FunctionIdentifier("magic_format"), info("magic_format"),
        (es: Seq[Expression]) => MagicFormat(es.head)))
    // SQL form takes EXPECTED KEYS (same semantics as the Scala
    // BloomAgg.apply) and reuses its sizing formula — the two surfaces must
    // size a filter identically for the same argument.
    ext.injectFunction(
      (FunctionIdentifier("bloom_agg"), info("bloom_agg"),
        (es: Seq[Expression]) => {
          def fail(msg: String) = throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
          if (es.length != 2)
            fail(s"bloom_agg(hash, expectedKeys) takes 2 arguments, got ${es.length}")
          if (!es(1).foldable)
            fail("bloom_agg's second argument (expectedKeys) must be a foldable integer literal")
          val expectedKeys = es(1).eval().asInstanceOf[Number].longValue()
          graft.frontier.BloomAggregate(es.head,
            graft.frontier.BloomAgg.blocksFor(expectedKeys), numHashes = 5)
            .toAggregateExpression()
        }))
  }
}
