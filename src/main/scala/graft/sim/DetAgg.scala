package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Order-fixed float aggregation for model TRAINING passes.
  *
  * Spark's `groupBy(...).agg(avg(...))` and `treeReduce` merge per-partition
  * float partials in shuffle/combine ARRIVAL order, which varies run to run.
  * The resulting ~1e-15 summation wobble is harmless for analytics but not
  * for training: a Lloyd/OPQ model trained twice on the same data must be
  * bit-identical, or downstream recall gates (q68, q76-q80, RotationSpec)
  * measure the wobble instead of the algorithm. Procrustes amplifies it —
  * the rotation's directions along near-zero singular values of the
  * cross-covariance turn on ~1e-12 perturbations, so a nondeterministic
  * reduce can visibly re-rotate the noise subspace between runs.
  *
  * The helper computes per-partition partials with `mapPartitionsWithIndex`
  * (row order inside a parquet/persisted partition is deterministic) and
  * combines them ON THE DRIVER sorted by partition id, fixing the summation
  * order end to end. Collect size is O(partitions × groups); training
  * inputs are bounded by design — at 10^10 rows one trains on a sample, and
  * group counts are O(k·dim) — so this stays a few MB. Serving paths are
  * untouched: they go through the normal shuffled aggregates.
  */
object DetAgg {

  /** Grouped mean of `valueCol` over integer key columns, summed in
    * (partition id, row order) — a deterministic replacement for
    * `groupBy(keyCols).agg(avg(valueCol))` in training loops. Nulls are not
    * expected (vector components); keys must be int-castable. */
  def groupedMeans(df: DataFrame, keyCols: Seq[String],
                   valueCol: String): Array[(Seq[Int], Double)] = {
    val n = keyCols.length
    val proj = df.select(
      (keyCols.map(c => col(c).cast("int")) :+ col(valueCol).cast("double")): _*)
    val partials = proj.rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc =
        scala.collection.mutable.LinkedHashMap.empty[Seq[Int], (Double, Long)]
      it.foreach { r =>
        val k: Seq[Int] = (0 until n).map(r.getInt)
        val (s, c) = acc.getOrElse(k, (0.0, 0L))
        acc(k) = (s + r.getDouble(n), c + 1L)
      }
      Iterator.single(pid -> acc.toVector)
    }.collect()
    val totals =
      scala.collection.mutable.LinkedHashMap.empty[Seq[Int], (Double, Long)]
    partials.sortBy(_._1).foreach { case (_, part) =>
      part.foreach { case (k, (s, c)) =>
        val (ts, tc) = totals.getOrElse(k, (0.0, 0L))
        totals(k) = (ts + s, tc + c)
      }
    }
    totals.iterator.map { case (k, (s, c)) => k -> s / c }.toArray
  }
}
