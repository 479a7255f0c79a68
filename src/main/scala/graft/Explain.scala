package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for the named queries (or
  * a representative set) so partitioning/pushdown/codegen claims can be
  * audited. Usage: scripts/run.sh Explain [sfDir] [nameRegex]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val pattern = args.lift(1).getOrElse(
      "^(q01|q05|q09|q12|q20|d01|d04|q33)").r
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The materialize-then-release queries (d15/d16/d28/x15/...) truncate
    // their public plans at a localCheckpoint; print their lazy twins
    // instead — the same substitution PlanSpec's global audit makes — so
    // the explain output shows the real sub-plans, not an RDD scan.
    val lazyTwins = graft.queries.Dedup.lazyPlans ++
      graft.queries.Extended.lazyPlans ++
      graft.queries.Extras.lazyPlans
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => pattern.findFirstIn(name).isDefined }
      .foreach { case (name, fn0) =>
        val fn = lazyTwins.getOrElse(name, fn0)
        println(s"\n========== $name ==========" +
          (if (lazyTwins.contains(name)) " (lazy twin)" else ""))
        fn(spark, sfDir).explain("formatted")
        // twins .cache() their indexes at construction; drop the
        // registrations so a later twin sharing an index plan is not
        // compiled to an InMemoryTableScan that hides the sub-plan
        if (lazyTwins.contains(name)) spark.catalog.clearCache()
      }
    spark.stop()
  }
}
