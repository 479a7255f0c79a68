package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement probe (guide §6): runs the persist-path queries
  * and prints the written stores' file counts and byte sizes before the
  * app-end cleanup fires. Not a declared query.
  */
object FileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("n25_index_persist", "n29_pq_persist", "n26_graph_serve",
                  "x16_sketch_persist")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val root = new java.io.File("target")
    walk(root).filter(f => f.getPath.contains("_store") ||
        f.getPath.contains("sketch_store"))
      .groupBy(f => f.getParentFile.getPath.replaceAll("/cid=[0-9]+", "/cid=*"))
      .toSeq.sortBy(_._1)
      .foreach { case (dir, fs) =>
        val dataFiles = fs.filter(_.getName.endsWith(".parquet"))
        println(f"$dir%-70s files=${fs.size}%5d parquet=${dataFiles.size}%5d " +
          f"bytes=${fs.map(_.length).sum}%10d")
      }
    spark.stop()
  }
}
