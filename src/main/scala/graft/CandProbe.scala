package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Throwaway measurement probe (guide §1): counts prefix-join candidate
  * occurrences under the symmetric full-prefix spelling vs the asymmetric
  * indexing-prefix spelling, per shingle k. Not a declared query.
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = 30
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- Seq(2, 3, 4)) {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      val tok = docs
        .select(col("doc_id"),
          explode(expr(s"array_distinct(${TextHash.sparkShinglesOf("tokens", k)})")).as("t"))
        .select(col("doc_id"), expr(TextHash.sparkHash56("t")).as("h"))
      val df = tok.groupBy("h").agg(count(lit(1)).as("df"))
      val idx = tok.join(df, "h")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("toks"))
        .withColumn("tarr", expr("transform(toks, x -> x.h)"))
        .withColumn("sz", size(col("toks")))
        .withColumn("plen", expr(s"sz - ((sz * $tau + 99) div 100) + 1"))
        .withColumn("ipl", expr(s"sz - ((sz * ${2 * tau} + ${100 + tau - 1}) div ${100 + tau}) + 1"))
        .cache()
      def occ(lenCol: String) = idx.select(col("doc_id"), col("sz"),
        posexplode(expr(s"slice(tarr, 1, cast($lenCol as int))")).as(Seq("p", "h")))
      val full = occ("plen")
      val short = occ("ipl")
      def filt(j: org.apache.spark.sql.DataFrame) = j.count()
      // symmetric: full x full, d1 < d2
      val sym = full.select(col("doc_id").as("d1"), col("sz").as("sa"), col("p").as("pa"), col("h"))
        .join(full.select(col("doc_id").as("d2"), col("sz").as("sb"), col("p").as("pb"), col("h")), Seq("h"))
        .filter(col("d1") < col("d2"))
        .filter(least(col("sa"), col("sb")) * 100 >= greatest(col("sa"), col("sb")) * tau)
        .filter((lit(1) + least(col("sa") - col("pa") - 1, col("sb") - col("pb") - 1)) *
          (100 + tau) >= (col("sa") + col("sb")) * tau)
      // asymmetric: short(index) x full(probe), (si, di) < (sp, dp)
      val asym = short.select(col("doc_id").as("di"), col("sz").as("si"), col("p").as("pi"), col("h"))
        .join(full.select(col("doc_id").as("dp"), col("sz").as("sp"), col("p").as("pp"), col("h")), Seq("h"))
        .filter(col("si") < col("sp") || (col("si") === col("sp") && col("di") < col("dp")))
        .filter(col("si") * 100 >= col("sp") * tau)
        .filter((lit(1) + least(col("si") - col("pi") - 1, col("sp") - col("pp") - 1)) *
          (100 + tau) >= (col("si") + col("sp")) * tau)
      def timed2[T](f: => T): (T, Double) = {
        val t0a = System.nanoTime(); f; val w1 = (System.nanoTime() - t0a) / 1e9
        val t0 = System.nanoTime(); val r = f
        (r, math.min(w1, (System.nanoTime() - t0) / 1e9))
      }
      val raw = short.select(col("doc_id").as("di"), col("sz").as("si"), col("p").as("pi"), col("h"))
        .join(full.select(col("doc_id").as("dp"), col("sz").as("sp"), col("p").as("pp"), col("h")), Seq("h"))
      val cand = asym.select(col("di"), col("dp"))
      val verif = cand
        .join(broadcast(idx.select(col("doc_id").as("di"), expr("array_sort(tarr)").as("va"), col("sz").as("na"))), Seq("di"))
        .join(broadcast(idx.select(col("doc_id").as("dp"), expr("array_sort(tarr)").as("vb"), col("sz").as("nb"))), Seq("dp"))
        .withColumn("inter", expr("sorted_inter_size(va, vb, " +
          s"((na + nb) * $tau + ${100 + tau - 1}) div ${100 + tau})"))
        .filter(col("inter") * 100 >= (col("na") + col("nb") - col("inter")) * tau)
      val (nRaw, tRaw) = timed2(raw.count())
      val (nCand, tCand) = timed2(cand.count())
      val (nVerif, tVerif) = timed2(verif.count())
      val (nDist, tDist) = timed2(verif.select("di", "dp", "inter").distinct().count())
      println(f"k=$k  raw=$nRaw(${tRaw}%.2f)  cand=$nCand($tCand%.2f)  " +
        f"verified=$nVerif($tVerif%.2f)  dist=$nDist($tDist%.2f)")
      if (k == 2) println(verif.queryExecution.executedPlan.toString.take(4000))
      idx.unpersist()
    }
    spark.stop()
  }
}
