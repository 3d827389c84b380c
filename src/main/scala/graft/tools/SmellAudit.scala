package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/**
 * Whole-gate-suite plan-smell sweep: flags, for every gate in
 * [[graft.Queries.all]], physical-plan shapes that cost real money at
 * 100 TB —
 *
 *  - interpreted Filter/Project (tree line without the `*` codegen
 *    marker): the exact regression class PlanAudit caught in round 10
 *    (HOF-lambda TAG filters outside whole-stage codegen, 2× slower);
 *  - `lambdafunction` inside a condition (interpreted HOF on the hot
 *    path);
 *  - CartesianProduct / BroadcastNestedLoopJoin (quadratic joins).
 *
 * Informational, not a gate: some interpreted nodes are benign
 * (LocalTableScan-backed replies, post-collect frames, checkpointed
 * ANN results). Run per-round and diff against the previous run.
 */
object SmellAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      // shape audit only: with AQE on, a pre-execution plan shows NO
      // codegen markers at all (decided per stage at runtime), so
      // every operator would read as interpreted
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq else graft.Queries.all.keys.toSeq.sorted
    var flagged = 0
    names.foreach { name =>
      try {
        val p = graft.Queries.all(name)(spark, dir)
          .queryExecution.explainString(FormattedMode)
        val tree = p.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
        def indent(l: String) = l.takeWhile(c => !c.isLetter && c != '*').length
        // a node sits in a CACHE-FILL subtree (paid once per resident
        // registration, not per query) when a preceding
        // InMemoryRelation line has strictly smaller indentation
        def inCacheFill(i: Int): Boolean = {
          val ind = indent(tree(i))
          (i - 1 to 0 by -1).exists { j =>
            tree(j).contains("InMemoryRelation") && indent(tree(j)) < ind
          }
        }
        val interp = tree.zipWithIndex.filter { case (l, _) =>
          val t = l.dropWhile(c => !c.isLetter && c != '*')
          t.startsWith("Filter (") && !l.contains("* ")
        }
        val (fill, hot) = interp.partition { case (_, i) => inCacheFill(i) }
        val smells = Seq(
          if (hot.nonEmpty)
            Some(s"interpreted-filter=${hot.map(_._1.trim).mkString(" | ")}")
          else None,
          if (fill.nonEmpty) Some(s"cachefill-filter=${fill.size}") else None,
          if (p.contains("CartesianProduct")) Some("CartesianProduct") else None,
          if (p.contains("BroadcastNestedLoopJoin"))
            Some("BroadcastNestedLoopJoin")
          else None).flatten
        if (smells.nonEmpty) {
          flagged += 1
          println(s"SMELL $name: ${smells.mkString("; ")}")
        }
      } catch {
        case e: Throwable =>
          println(s"SKIP $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    println(s"SMELL_AUDIT done: $flagged/${names.size} gates flagged")
    spark.stop()
  }
}
