package graft.sources

import org.apache.spark.sql.DataFrame

/** Loud-fail schema guard for persisted-INDEX read-back.
  *
  * The serving paths (n25/n26's store reads, the s32/s34/s35/s36
  * compacted index reads) trust parquet tables an earlier job wrote. A
  * schema-drifted index (a column renamed or dropped by a careless
  * migration) must fail AT THE READ with a message naming the table —
  * the alternative is an AnalysisException deep inside a join tree, or
  * worse, a silently-wrong probe result through a surviving
  * same-named column. (Truncated/corrupt FILES already fail loudly in
  * the parquet footer reader — RobustnessSpec pins both cases.)
  */
object ReadGuard {

  /** Assert `names` all exist on `df`; returns `df` for inline use. */
  def requireColumns(df: DataFrame, table: String, names: String*): DataFrame = {
    val have = df.columns.toSet
    val missing = names.filterNot(have)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"persisted index table '$table' is schema-drifted: missing " +
          s"column(s) ${missing.mkString(", ")} (present: " +
          s"${df.columns.mkString(", ")}) — refusing to serve from a " +
          "corrupt index")
    df
  }
}
