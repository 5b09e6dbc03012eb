package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: a GLOBAL Sort whose input provably occupies a single
  * scan partition is equivalent to a partition-local sort — rewrite
  * `Sort(global = true)` to `Sort(global = false)`, eliding the
  * RangePartitioning exchange AND its range-bounds sampling job.
  *
  * Why: Spark plans every global sort as sample → shuffle → sort (three
  * scheduler rounds) even when the child is one small parquet split, in
  * which case partition-local order IS total order. At test scale
  * (`ORDER BY` over a sub-megabyte dimension file) that is two wasted
  * jobs of pure scheduling floor per query; on a production table the
  * scan spans many partitions and the rule is a provable no-op, so
  * nothing changes at 100 TB.
  *
  * Firing conditions (all conservative):
  *  - the subtree between the Sort and its leaf is 1:1
  *    partition-preserving (Project / Filter / Generate only);
  *  - the leaf is a v1 file relation whose files all pack into ONE
  *    partition under Spark's own `FilePartition.maxSplitBytes` packing
  *    arithmetic (re-derived here: min(maxPartitionBytes,
  *    max(openCostInBytes, totalPaddedBytes / minPartitionNum)));
  *  - the Sort is not the child of a Limit (those fuse into
  *    TakeOrderedAndProjectExec, which is already exchange-free and
  *    would be broken up by the rewrite).
  */
case class LocalizeSingletonSort(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def packsIntoOnePartition(fs: HadoopFsRelation): Boolean = {
    val files = fs.location.listFiles(Nil, Nil).flatMap(_.files)
    if (files.isEmpty) return true
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum = conf.filesMinPartitionNum
      .getOrElse(session.sparkContext.defaultParallelism)
    val sizes = files.map(_.getLen)
    val totalPadded = sizes.map(_ + openCost).sum
    val bytesPerCore = totalPadded / math.max(1, minPartitionNum)
    val maxSplitBytes =
      math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))
    // Spark's bin-packer charges openCost to the accumulator AFTER each
    // file, so n files share one partition iff the lens plus the n-1
    // inter-file open costs fit a single split (which also implies no
    // file is individually split).
    sizes.sum + openCost * (sizes.length - 1) <= maxSplitBytes
  }

  private def singlePartitionSource(plan: LogicalPlan): Boolean = plan match {
    case Project(_, c)         => singlePartitionSource(c)
    case Filter(_, c)          => singlePartitionSource(c)
    case g: Generate           => singlePartitionSource(g.child)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation => packsIntoOnePartition(fs)
        case _                    => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Sorts that the planner fuses with a parent Limit into
    // TakeOrderedAndProject must keep global=true. Structural equality
    // on the Set is fine: a false-positive match merely skips the
    // optimization for an identical sort elsewhere in the tree.
    val underLimit: Set[LogicalPlan] = plan.collect {
      case GlobalLimit(_, LocalLimit(_, s: Sort))                   => s
      case GlobalLimit(_, LocalLimit(_, Project(_, s: Sort)))       => s
      case LocalLimit(_, s: Sort)                                   => s
      case LocalLimit(_, Project(_, s: Sort))                       => s
    }.toSet
    plan.transformUp {
      case s @ Sort(_, true, child, _)
          if !underLimit.contains(s) && singlePartitionSource(child) =>
        s.copy(global = false)
    }
  }
}
