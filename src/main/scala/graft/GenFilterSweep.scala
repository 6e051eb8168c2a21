package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, Size, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** Dev tool: sweep every SparkEntry query's OPTIMIZED logical plan for
  * the InferFiltersFromGenerate duplication class (the dedup_cdc_chunks
  * 108× bug, commit ba29383): a Filter whose condition carries an
  * inlined expensive generator-feed expression — detected as either a
  * higher-order-function lambda inside the filter condition, or a
  * size(<non-attribute>) guard (the exact shape the rule synthesizes
  * and predicate pushdown then substitutes the projection into).
  * `sbt "runMain graft.GenFilterSweep"` prints one line per hit. */
object GenFilterSweep {
  private def hasLambda(e: Expression): Boolean =
    e.exists(_.isInstanceOf[LambdaFunction])
  private def sizeOfComputed(e: Expression): Boolean =
    e.exists {
      case Size(c, _) => !c.isInstanceOf[AttributeReference]
      case _ => false
    }

  def offendingFilters(plan: LogicalPlan): Seq[(String, String)] =
    plan.collect {
      case f: Filter if hasLambda(f.condition) =>
        ("lambda-in-filter", f.condition.sql.take(160))
      case f: Filter if sizeOfComputed(f.condition) =>
        ("size-of-computed", f.condition.sql.take(160))
    }

  def main(args: Array[String]): Unit = {
    try org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = SparkEntry.queries.keys.toSeq.sorted
    var hits = 0
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val bad = offendingFilters(df.queryExecution.optimizedPlan)
        if (bad.nonEmpty) {
          hits += bad.size
          bad.foreach { case (kind, cond) => println(s"HIT\t$n\t$kind\t$cond") }
        }
      } catch { case e: Throwable => println(s"ERR\t$n\t${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
    }
    println(s"SWEEP DONE: $hits offending filters across ${names.size} queries")
    spark.stop()
  }
}
