package graft

import java.nio.file.{Files, Paths}

/** Operational-robustness pins for the ingest path — the two failure modes
  * a 100 TB lake hits weekly: a corrupt object in a scan directory, and
  * files written under drifted (but compatible) schemas. Both behaviors
  * are CONFIGURED, not emergent, so both sides of each switch are pinned.
  */
class RobustnessSpec extends SparkSpec {

  test("corrupt parquet file: loud failure by default, skipped under ignoreCorruptFiles") {
    import spark.implicits._
    val dir = Files.createTempDirectory("robust_corrupt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // plant a non-parquet object where the scan will pick it up
    Files.write(Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes)
    // default: the bad object must FAIL the read — silent data loss on a
    // corrupt file is never acceptable as a default
    val loud = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    assert(loud != null)
    // opted in: the scan completes on the surviving files
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val rows = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq === Seq(1L, 2L), s"expected the good file's rows, got ${rows.toSeq}")
    } finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }

  test("parquet schema drift: mergeSchema unions columns; default keeps one file's view") {
    import spark.implicits._
    val dir = Files.createTempDirectory("robust_drift").toString
    // two writer generations: v2 adds a column
    Seq((1L, "a")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/gen=2")
    // mergeSchema: the union schema, old rows null-completed
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v", "score", "gen"),
      s"union schema expected, got ${merged.columns.toSeq}")
    val byId = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId === Map(1L -> None, 2L -> Some(9.5)), s"got $byId")
    // default (no mergeSchema): one footer's schema is used for all files —
    // the cheap path; pin only that it reads both rows without error
    val plain = spark.read.parquet(dir)
    assert(plain.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
