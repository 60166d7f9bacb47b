package graft.queries

import graft.functions.RollingHash
import graft.operators.{Dedup, TextAnalysis}

/** Generators for the DuckDB oracle SQL of the hash-based pipeline queries.
  * Every constant (modulus, minhash params, stopword profiles) comes from
  * the SAME Scala values the Spark operators use, so the two sides cannot
  * drift apart silently.
  *
  * ==Dtype discipline: never emit an un-cast SUM==
  * DuckDB `SUM(BIGINT)` (plain or windowed) returns HUGEINT, which the
  * driver's pandas stack materializes as float64; the hash compare then sees
  * `46.0` vs Spark's int64 `46` and flunks `hash_match` with rows/schema
  * green (round-5 q42/q43). Every oracle column derived from a SUM — or from
  * arithmetic over one — must be wrapped `CAST(... AS BIGINT)`.
  * `tools/check_oracle.py` now fails on float-vs-int clashes to catch this
  * locally.
  */
object DuckSql {
  val P: Long = RollingHash.Mod

  /** Engine-neutral rolling hash of a string expression (mirrors
    * [[graft.functions.RollingHash.hash]]): fold (a·31 + cp) mod P over
    * code points, empty → 0. */
  def rollingHash(expr: String): String =
    s"(CASE WHEN length($expr) = 0 THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split_regex($expr, ''), x -> CAST(unicode(x) AS BIGINT)), " +
      s"(a, b) -> (a * 31 + b) % $P) END)" // BIGINT cast: lambda arithmetic would stay INT32 and overflow

  /** The quadratic decision mix over an already-computed hash COLUMN
    * (mirrors [[graft.operators.Sampling.decisionHash]]): `h·((h + K)
    * mod P) mod P` — pass a column NAME, not the rollingHash expression,
    * or the list_reduce evaluates twice. Every product ≤ ~3.7e18, exact
    * in BIGINT. */
  def decisionMix(hCol: String): String =
    s"(($hCol * (($hCol + 2654435761) % $P)) % $P)"

  /** Base-37 twin of [[rollingHash]] — the independent second hash of the
    * wide ~60-bit gram key (a salted base-31 hash would preserve every
    * equal-length collision; a different base does not). */
  def rollingHash37(expr: String): String =
    s"(CASE WHEN length($expr) = 0 THEN 0 ELSE " +
      s"list_reduce(list_transform(string_split_regex($expr, ''), x -> CAST(unicode(x) AS BIGINT)), " +
      s"(a, b) -> (a * 37 + b) % $P) END)"

  /** [[rollingHash]] with an explicit initial state `seed` (the stub
    * featurizer's per-component fold): the seed is prepended to the
    * code-point list so `list_reduce`'s first-element init replays
    * `h₀ = seed; h = (h·31 + cp) mod P` exactly. */
  def seededRollingHash(expr: String, seed: String): String =
    s"(CASE WHEN length($expr) = 0 THEN CAST($seed AS BIGINT) ELSE " +
      s"list_reduce([CAST($seed AS BIGINT)] || list_transform(string_split_regex($expr, ''), x -> CAST(unicode(x) AS BIGINT)), " +
      s"(a, b) -> (a * 31 + b) % $P) END)"

  /** Whitespace tokens of `text`, empty-safe (mirrors TextAnalysis.tokens). */
  def tokens(expr: String): String =
    raw"list_filter(string_split_regex($expr, '\s+'), t -> t <> '')"

  /** CTEs producing per-doc distinct 3-gram shingle hash lists `hs` over
    * `documents` (mirrors Dedup.shingleHashes with n=3). */
  def shingleCtes: String = shingleCtesN(3)

  /** [[shingleCtes]] for word n-grams of any `n`, optionally carrying extra
    * `documents` columns (e.g. `source`) through to the `hashed` CTE. */
  def shingleCtesN(n: Int, extraCols: Seq[String] = Nil): String = {
    require(n >= 2, s"shingle n must be >= 2, got $n")
    val extra = extraCols.map(c => s", $c").mkString
    val gram = (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
      .mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id$extra, ${tokens("text")} AS w FROM documents),
       |grams AS (SELECT doc_id$extra,
       |  list_distinct(list_transform(range(1, len(w) - ${n - 2}),
       |    i -> $gram)) AS g FROM toks),
       |hashed AS (SELECT doc_id$extra, list_transform(g, s -> ${rollingHash("s")}) AS hs
       |  FROM grams WHERE len(g) > 0)""".stripMargin
  }

  /** Minhash CTE `mh(doc, mh_0..mh_{k-1})` on top of [[shingleCtes]],
    * using the same affine params as Dedup.minhashSignatures. */
  def minhashCte(k: Int): String = {
    val params = Dedup.minhashParams(k)
    val aggs = params.zipWithIndex.map { case ((a, b), i) =>
      s"MIN((h * $a + $b) % $P) AS mh_$i"
    }.mkString(", ")
    s"""exploded AS (SELECT doc_id, unnest(hs) AS h FROM hashed),
       |mh AS (SELECT doc_id AS doc, $aggs FROM exploded GROUP BY doc_id)""".stripMargin
  }

  /** 30-bit simhash of the token-hash list expression `th` (mirrors
    * [[graft.functions.SimHash.hash]]). */
  def simhash(th: String): String = {
    val bits = (0 until graft.functions.SimHash.Bits).map { b =>
      s"(CASE WHEN list_sum(list_transform($th, h -> " +
        s"CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << b} ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** CASE chain replicating TextAnalysis.langId: alphabetical profile
    * order, >= keeps the earlier language, zero evidence → 'und'. */
  def langIdSql(textExpr: String): String = {
    val toks = tokens(s"lower($textExpr)")
    val scores = TextAnalysis.StopwordProfiles.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter($toks, t -> list_contains($list, t)))"
    }
    // fold as in langId: best-so-far vs next, earlier wins ties
    val bestName = scores.tail.foldLeft(s"'${scores.head._1}'" -> scores.head._2) {
      case ((nameSql, scoreSql), (l, s)) =>
        (s"(CASE WHEN $scoreSql >= $s THEN $nameSql ELSE '$l' END)",
          s"(CASE WHEN $scoreSql >= $s THEN $scoreSql ELSE $s END)")
    }._1
    val anyEvidence = scores.map(_._2).mkString("greatest(", ", ", ")")
    s"(CASE WHEN $anyEvidence = 0 THEN 'und' ELSE $bestName END)"
  }
}
