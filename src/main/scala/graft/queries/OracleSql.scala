package graft.queries

import graft.functions.TextFunctions

/** DuckDB-side SQL fragments mirroring graft.functions.TextFunctions.
  * The Spark implementations are higher-order column functions; these
  * are the identical folds written as DuckDB list lambdas, so the
  * oracle computes bit-identical numbers. Kept in one place so a
  * change to the hash family updates both engines together. */
object OracleSql {
  val P: Long = TextFunctions.P

  /** The tokenizers' whitespace regex, shared verbatim with the Spark
    * side — see [[TextFunctions.Ws]] for why it is an explicit class
    * rather than `\s` (Java/RE2 disagree on vertical tab). */
  val Ws: String = TextFunctions.Ws

  /** Absolute path of a committed golden fixture (fixtures/<name>),
    * resolved from the working directory at runtime so the oracle SQL
    * works on any checkout location, not just /root/repo. */
  def golden(name: String): String =
    new java.io.File(s"fixtures/$name").getAbsolutePath

  /** Lowercased whitespace tokens of expression `x`. */
  def toks(x: String): String =
    s"list_filter(string_split_regex(lower($x), '$Ws'), t -> length(t) > 0)"

  /** Polynomial rolling hash of string expression `t` (tokenHash). */
  def tokenHash(t: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($t, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % $P)""".stripMargin

  /** Token-hash list for text expression `x`. */
  def tokenHashes(x: String): String =
    s"list_transform(${toks(x)}, tt -> ${tokenHash("tt")})"

  /** Fold a BIGINT list into one rolling hash (docFingerprint inner). */
  def foldHash(listExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), $listExpr),
       |  (fa, fb) -> (fa * 31 + fb) % $P)""".stripMargin

  /** One minhash value over a BIGINT hash list. */
  def minhash1(listExpr: String, a: Long, b: Long): String =
    s"list_min(list_transform($listExpr, mh -> (mh * $a + $b) % $P))"

  /** Word n-gram (shingle) hashes over a token-hash list expression
    * named `th` in scope: fold of each n-window (list_slice bounds are
    * 1-based inclusive). Mirror of TextFunctions.shinglesFromHashes —
    * shared by the dedup and decontamination oracles. */
  def shingles(n: Int): String =
    s"""list_transform(range(0, CAST(greatest(len(th) - ${n - 1}, 0) AS BIGINT)),
       |  si -> ${foldHash(s"list_slice(th, si + 1, si + $n)")})""".stripMargin

  /** SimHash fingerprint over a BIGINT token-hash list named `th` in
    * scope, `bits` wide — mirror of TextFunctions.simhash (bit j set
    * iff more than half the hashes have bit j set). Shared by the d05
    * gate and the dialect `simhash` scalar's gate. */
  def simhashBits(bits: Int): String =
    (0 until bits).map { j =>
      s"""(CASE WHEN 2 * ${lsum(s"list_transform(th, sv -> (sv >> $j) % 2)")}
         | > CAST(len(th) AS BIGINT)
         | THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString(" + ")

  /** Sum of a BIGINT list (empty → 0), as BIGINT. */
  def lsum(listExpr: String): String =
    s"CAST(coalesce(list_sum($listExpr), 0) AS BIGINT)"

  /** Sequential left fold sum of a DOUBLE list (order-faithful). */
  def dfold(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $listExpr), (ra, rb) -> ra + rb)"

  /** SQL IN-list literal for a stopword set. */
  def swList(lang: String): String =
    TextFunctions.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** Stopword-hit ratio of a token-list expression. */
  def stopwordRatio(toksExpr: String, lang: String): String =
    s"""(CAST(len(list_filter($toksExpr, sw -> list_contains(${swList(lang)}, sw))) AS DOUBLE)
       | / CAST(greatest(len($toksExpr), 1) AS DOUBLE))""".stripMargin
}
