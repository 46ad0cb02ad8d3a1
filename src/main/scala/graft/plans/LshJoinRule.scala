package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rewrite: a naive Hamming-threshold similarity join
  *
  * {{{ a.join(b, bit_count(a.fp ^ b.fp) <= k) }}}
  *
  * plans as a nested-loop over ALL pairs — O(|a|·|b|) comparisons. This rule
  * rewrites it into the Manku et al. WWW'07 band plan the engine uses
  * explicitly elsewhere (simhashbucket:77-180, `Dedup.lshSelfJoin`): explode
  * both sides into (band, chunk) with bands = k+1 (pigeonhole: dist <= k ⟹
  * some band's bits are equal), equi-join on (band, chunk), keep the
  * original predicate as the verify filter. Users write the declarative
  * theta-join; the plan executes bucketed.
  *
  * Exactness, including duplicate-row semantics: a pair agreeing in several
  * bands would join once per band, so the rewritten join also requires
  * `band == first band whose chunks agree` — a pure function of the two
  * fingerprints — keeping exactly ONE surviving copy per qualifying row
  * pair with no Distinct (which would also collapse pre-existing duplicate
  * rows and change semantics).
  *
  * Fires only when the join has no equi-conjunct already (an equi-join is
  * already hash-partitioned; also makes the rule idempotent — its own
  * output contains equi-conjuncts, so the fixpoint pass skips it).
  * Registered via `GraftExtensions.injectOptimizerRule`.
  */
case class LshJoinRule() extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 31 // beyond this, bands would need < 2 bits

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) =>
          (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
            (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
        case _ => false
      }
      val hamming = conjuncts.collectFirst {
        case p @ LessThanOrEqual(BitwiseCount(BitwiseXor(a: AttributeReference, b: AttributeReference)), Literal(k: Number, IntegerType | LongType))
          if k.longValue() >= 0 && k.longValue() <= MaxK &&
            a.dataType == LongType && b.dataType == LongType &&
            ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
             (left.outputSet.contains(b) && right.outputSet.contains(a))) =>
          val (la, ra) = if (left.outputSet.contains(a)) (a, b) else (b, a)
          (p, la, ra, k.intValue())
      }
      (hasEqui, hamming) match {
        case (false, Some((_, leftFp, rightFp, k))) =>
          rewrite(j, left, right, cond, hint, leftFp, rightFp, k)
        case _ => j
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
                      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
                      leftFp: Attribute, rightFp: Attribute, k: Int): LogicalPlan = {
    val bitsPerBand = math.max(1, 64 / (k + 1)) // floor → bands >= k+1 always
    val bands = (64 + bitsPerBand - 1) / bitsPerBand
    val mask = if (bitsPerBand >= 64) -1L else (1L << bitsPerBand) - 1L

    def chunkOf(fp: Expression, band: Expression): Expression =
      BitwiseAnd(
        ShiftRightUnsigned(fp, Multiply(band, Literal(bitsPerBand))),
        Literal(mask))

    // explode each side with a band index + its chunk
    def banded(side: LogicalPlan, fp: Attribute, tag: String): (LogicalPlan, Attribute, Attribute) = {
      val bandAttr = AttributeReference(s"__lsh_band_$tag", IntegerType, nullable = false)()
      val gen = Generate(
        Explode(CreateArray((0 until bands).map(Literal(_)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bandAttr), child = side)
      val chunkAlias = Alias(chunkOf(fp, bandAttr), s"__lsh_chunk_$tag")()
      val proj = Project(gen.output :+ chunkAlias, gen)
      (proj, bandAttr, chunkAlias.toAttribute)
    }

    val (lPlan, lBand, lChunk) = banded(left, leftFp, "l")
    val (rPlan, rBand, rChunk) = banded(right, rightFp, "r")

    // band == first band whose chunks agree → one copy per qualifying pair
    val firstMatch = CaseWhen(
      (0 until bands).map { b =>
        (EqualTo(chunkOf(leftFp, Literal(b)), chunkOf(rightFp, Literal(b))),
          Literal(b)): (Expression, Expression)
      }, None)

    val newCond = Seq(
      EqualTo(lBand, rBand),
      EqualTo(lChunk, rChunk),
      EqualTo(lBand, firstMatch),
      cond).reduce(And)

    // project back to the original join output — helper columns vanish
    Project(j.output, Join(lPlan, rPlan, Inner, Some(newCond), hint))
  }
}
