package graft.functions

/** Cross-engine deterministic hashing primitives, shared by the text/dedup
  * operator suite (TextOps, Dedup) and their DuckDB oracle SQL.
  *
  * Everything routes through md5 — the one hash both Spark and DuckDB
  * implement identically on UTF-8 strings — then takes the top 56 bits as a
  * non-negative BIGINT (14 hex digits < 2^56, so no sign/overflow trouble in
  * either engine). MinHash permutations are the classic universal-hash family
  * h_i(x) = (a_i*x + b_i) mod p with p = 2^31 - 1; a_i < p and x < p keep the
  * product under 2^62, inside BIGINT range on both engines.
  *
  * The SQL snippets are generated from the SAME Scala constants for both
  * engines, so the oracle can never drift from the implementation.
  */
object TextHash {

  /** Mersenne prime 2^31 - 1: modulus for the MinHash permutation family. */
  val P: Long = 2147483647L

  /** Number of MinHash hash functions (signature length). */
  val NumHashes: Int = 16

  /** Shingle size (word n-grams) for MinHash signatures. */
  val MinhashShingleK: Int = 3

  /** LSH banding: 4 bands x 4 rows = 16 signature slots. Candidate-pair
    * probability for Jaccard s is 1-(1-s^4)^4 — the usual S-curve with the
    * knee near s ≈ 0.55.
    */
  val NumBands: Int = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /** Fixed odd multipliers / offsets (deterministic LCG walk, all < P). */
  val A: IndexedSeq[Long] =
    (1 to NumHashes).map(i => (1103515245L * i + 12345L) % P | 1L)
  val B: IndexedSeq[Long] =
    (1 to NumHashes).map(i => (214013L * i + 2531011L) % P)

  /** 56-bit hash of a string expression — Spark spelling, routed through
    * the codegen'd Hash56 expression (GraftExtensions): first 7 md5 digest
    * bytes as a BIGINT, identical to the hex spelling
    * `cast(conv(substring(md5(e), 1, 14), 16, 10) as bigint)` (differential
    * test in PropertySpec) but without the 32-char hex string + base-16
    * parse per row — this hash runs once per shingle/token in the dedup
    * hot loops.
    */
  def sparkHash56(e: String): String =
    s"hash56($e)"

  /** Same 56-bit hash — DuckDB spelling (verified bit-identical to Spark). */
  def duckHash56(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 14) AS BIGINT)"

  /** SQL array literal of the multipliers, identical text on both engines. */
  val aLit: String = A.mkString("array(", ", ", ")")
  val bLit: String = B.mkString("array(", ", ", ")")
  val aLitDuck: String = A.mkString("[", ", ", "]")
  val bLitDuck: String = B.mkString("[", ", ", "]")

  /** Spark SQL: k-token shingles of a space-tokenized text column, via the
    * codegen'd `shingles` expression (graft.functions.Shingles, injected by
    * GraftExtensions). Documents shorter than k tokens produce one shingle
    * = the whole text — identical semantics to duckShingles below.
    *
    * PERFORMANCE: the earlier HOF spelling `transform(sequence(...), i ->
    * array_join(slice($tokensCol, i, $k), ' '))` ran as an interpreted
    * lambda with a sliced-array allocation per shingle — t04_fingerprint
    * cost 79.7 s at sf0.1 on it. The custom expression builds the array in
    * one codegen'd pass. Still pass a materialized ARRAY column, not an
    * inline `split(...)`, so the tokenization isn't duplicated into every
    * consumer of the shingle column.
    */
  def sparkShinglesOf(tokensCol: String, k: Int): String =
    s"shingles($tokensCol, $k)"

  /** DuckDB spelling of the same shingling. */
  def duckShingles(textCol: String, k: Int): String =
    s"""list_transform(
       |  generate_series(1, greatest(1, len(string_split($textCol, ' ')) - ${k - 1})),
       |  i -> array_to_string(list_slice(string_split($textCol, ' '), i, i + ${k - 1}), ' '))""".stripMargin
}
