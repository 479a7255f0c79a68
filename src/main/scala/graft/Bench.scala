package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/scheduler/codegen/parquet paths so the first measured
    // query isn't charged several seconds of one-time init (measured; skews
    // per-query comparisons otherwise). Touches a real scan + md5 codegen.
    spark.range(0, 1000000, 1, cpus.toInt).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("count(md5(text))").collect()
    catch { case _: Throwable => }
    // Local-iteration filter (the driver never sets this).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // Sorted name order: deterministic run-to-run comparison.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
