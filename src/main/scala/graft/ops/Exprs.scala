package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column` builders for every scalar operator in SURVEY.md §2.2/§2.3.
  *
  * Everything here composes Spark built-ins only — no UDFs — so each stays
  * inside whole-stage codegen and survives Catalyst's constant folding,
  * predicate pushdown and column pruning. That is the scale story: a filter
  * built from these reaches the parquet scan as a pushed predicate.
  */
object Exprs {

  /** Great-circle distance in meters (reference `main.py:75-86`): haversine
    * with R=6371000 and the `min(1, sqrt(a))` clamp. Codegen-friendly
    * composition of built-in math functions — not a UDF.
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2.0 * 6371000.0) * asin(least(lit(1.0), sqrt(a)))
  }

  /** ISO-8601 parse with the reference's `Z`→`+00:00` normalization
    * (`main.py:60-72`); unparseable → null (matching `None`), hence
    * `try_to_timestamp` (ANSI mode is on in Spark 4 — a plain cast throws).
    */
  def parseIsoTs(c: Column): Column =
    try_to_timestamp(regexp_replace(c, "Z$", "+00:00"),
      lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX"))

  /** Unit coalesce chain (`main.py:183-194`, sensor side `main.py:160`):
    * first TRUTHY candidate, else "". Python's `or` chain treats the empty
    * string as falsy, so "" candidates fall through to the next source —
    * not just nulls (confirmed against `_extract_unit`'s `if unit:`).
    */
  def unitCoalesce(cands: Column*): Column =
    coalesce(cands.map(nullifEmpty) :+ lit(""): _*)

  /** Name coalesce (`main.py:223`): `name or locality or s"id:$id"`.
    * Python `or` treats "" as falsy, so empty strings fall through too.
    */
  def nameCoalesce(name: Column, locality: Column, id: Column): Column =
    coalesce(nullifEmpty(name), nullifEmpty(locality), concat(lit("id:"), id))

  private def nullifEmpty(c: Column): Column = when(c =!= "", c)

  /** Numeric validation (`main.py:245-252`): value must parse as a float
    * (lexical "NaN"/"Infinity"/"1e3" all pass) but the ORIGINAL string is
    * what gets emitted. This is the validity predicate only.
    */
  def numericValid(c: Column): Column = c.try_cast("double").isNotNull

  /** Station freshness F1 (`main.py:89-97`): last-seen within the window,
    * missing/unparseable last-seen DROPPED (null comparison → null → false).
    */
  def freshDropNull(ts: Column, cutoff: Column): Column = ts >= cutoff

  /** Measurement freshness F8 (`main.py:255-259`): drop only when the date
    * parses AND is stale — unparseable/missing dates are KEPT. The deliberate
    * asymmetry vs F1.
    */
  def freshKeepNull(ts: Column, cutoff: Column): Column =
    ts.isNull || ts >= cutoff

  /** Sensor-id validity F6 (`main.py:233-239`): non-null after int coercion
    * and non-zero (Python falsy check drops id 0).
    */
  def sensorIdValid(c: Column): Column = {
    val id = c.try_cast("long")
    id.isNotNull && id =!= 0L
  }

  /** Engine-portable 60-bit deterministic hash: bigint from the first 15 hex
    * chars of md5. DuckDB spells the identical value as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`, which is what every
    * dedup/fingerprint oracle uses — exact integer equality across engines.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side replica of [[md5Long]] — the same md5-hex-prefix integer on
    * the same input string, for deriving constants (hash-family seeds, LSH
    * hyperplanes) that both engines can rebuild from the formula alone.
    */
  def md5LongLocal(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Word shingles of size `n` (word n-grams) from a token array; documents
    * shorter than `n` tokens collapse to one whole-text shingle. Built from
    * higher-order functions so it runs distributed with no UDF.
    */
  def wordShingles(tokens: Column, n: Int): Column = {
    // The token array is bound ONCE as a lambda variable via
    // `transform(array(tokens), t => ...)` before the per-position lambda
    // references it. Without the binding, a call site that passes a raw
    // `split(text, " ")` EXPRESSION (rather than a projected column) inlines
    // that expression into the inner lambda, where `slice(t, i, n)` and
    // `size(t)` re-evaluate it PER SHINGLE POSITION — an O(len²)-per-document
    // re-split (the q_bpe trap, re-found in round 16: shingleHashes and the
    // 2-gram Dedup call sites all passed `split(...)` directly and paid
    // len× redundant splits on every corpus pass). A lambda variable is a
    // slot read, so the binding makes every call site O(len) regardless of
    // what Column expression the caller hands in.
    val shingled = transform(array(tokens), { t =>
      val k = size(t)
      when(k >= n,
        transform(sequence(lit(1), k - (n - 1)),
          i => array_join(slice(t, i, lit(n)), " ")))
        .otherwise(array(array_join(t, " ")))
    })
    element_at(shingled, 1)
  }

  /** Dot product of two double arrays: left-to-right multiply-accumulate
    * from a 0.0 seed — bit-identical to the oracle's
    * `list_reduce(list_prepend(0.0::DOUBLE, list_transform(...)))` fold in
    * DuckDB. Implemented as a codegen-native Catalyst expression
    * ([[graft.functions.DotProduct]]) because the equivalent HOF chain
    * ([[hofDotProduct]]) is interpreted and dominates all-pairs similarity
    * joins.
    */
  def dotProduct(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProduct(a, b)

  /** Reference HOF formulation of [[dotProduct]] (kept for the bit-equality
    * regression test of the codegen expression).
    */
  def hofDotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float-array embeddings. Elements are cast to
    * double BEFORE multiplying (so DuckDB's `x::DOUBLE * y::DOUBLE` matches
    * bit-for-bit), and the final formula is `dot / sqrt(na * nb)` — keep the
    * oracle character-identical. A zero-norm (all-zero) vector yields NULL,
    * matching DuckDB's x/0 — Spark under ANSI mode would otherwise throw.
    * The SQL `cosine_similarity` registration composes the same guarded
    * shape (GraftExtensions), keeping SQL and Column callers bit-equal.
    */
  def cosineSim(a: Column, b: Column): Column = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    val n2 = dotProduct(ad, ad) * dotProduct(bd, bd)
    when(n2 > 0, dotProduct(ad, bd) / sqrt(n2))
  }

  /** Floor division of two non-negative BIGINTs without ever leaving exact
    * arithmetic: `(a - pmod(a, b)) / b` — the numerator is an exact multiple
    * of b, so the DECIMAL division has remainder 0 and the cast back to
    * long is exact at any magnitude (a plain `/` would detour through
    * DOUBLE and lose bits past 2^53). Callers guarantee a >= 0, b > 0.
    */
  def intDivFloor(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)"))
      .cast("long")

  /** EXACT half-away-from-zero rounding of the rational a/b at `scale`
    * decimal digits, computed entirely in integer arithmetic:
    * `sign(a) * floor((2|a|·10^scale + b) / (2b)) / 10^scale` (b > 0).
    *
    * This closes SURVEY §5.3's `round(double, n)` residual for declared
    * ratios whose inputs are exact integers/DECIMALs: `round()` on a DOUBLE
    * quotient rounds the double's shortest-decimal REPRESENTATION (Spark)
    * or its binary value (DuckDB), so a quotient landing on (or within one
    * ulp of) a representable .5 tie can diverge between engines. Here the
    * tie is resolved on the true rational before any float exists; the one
    * remaining float op — BIGINT / 10^scale — is a single IEEE division
    * both engines perform identically. [[roundDivSql]] is the
    * character-equivalent oracle form; keep the two in lockstep.
    *
    * Input contract (keep [[roundDivSql]] in lockstep): `num`/`den` must be
    * INTEGER-VALUED expressions (counts, scaled-integer DECIMAL sums) with
    * den > 0. The entry casts normalize representation only — Spark's
    * `.cast("long")` truncates a fractional value toward zero while
    * DuckDB's `CAST(... AS BIGINT)` rounds half-to-even, so a caller
    * passing a genuinely fractional DECIMAL diverges between engines
    * BEFORE the rounding formula runs. Every declared call site passes
    * exact integers; new callers must too.
    *
    * The scaled numerator (2|a|·10^scale + b) and the final rounded
    * magnitude are computed in decimal(38,0), so intermediate magnitudes
    * beyond BIGINT cannot silently wrap (Spark non-ANSI LongType wraps;
    * DuckDB's HUGEINT path does not — a silent cross-engine divergence if
    * this ever left exact arithmetic). Only the RESULT magnitude
    * |a|·10^scale/b (≤ |a|·10^scale by b ≥ 1) must fit a BIGINT.
    */
  def roundDiv(num: Column, den: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    val a = num.cast("long")
    val b = den.cast("long")
    val aD = abs(a).cast("decimal(38,0)")
    val bD = b.cast("decimal(38,0)")
    val mag = intDivFloor(aD * lit(2L) * lit(p) + bD, bD * lit(2L))
    (when(a < 0, -mag).otherwise(mag)).cast("double") / lit(p.toDouble)
  }

  /** DuckDB oracle rendering of [[roundDiv]] — same integer formula, same
    * final BIGINT/10^scale float division. `a`/`b` are SQL expressions of
    * BIGINT type, b > 0, and (as for [[roundDiv]], whose contract this
    * shares) both must be INTEGER-VALUED: DuckDB's CAST rounds a
    * fractional value half-to-even where Spark's cast truncates. DuckDB
    * promotes the scaled numerator through HUGEINT natively, matching the
    * Spark side's decimal(38,0) route.
    */
  def roundDivSql(a: String, b: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"((CASE WHEN ($a) < 0 THEN -1 ELSE 1 END) * " +
      s"((2*abs(CAST(($a) AS BIGINT))*$p + CAST(($b) AS BIGINT)) // " +
      s"(2*CAST(($b) AS BIGINT))) / $p.0)"
  }

  /** [[roundDiv]] for a numerator that is ALREADY an exact integer-valued
    * DECIMAL(38,0) expression wider than BIGINT (e.g. a product of longs
    * that the caller promoted to decimal BEFORE multiplying, precisely so
    * it can't wrap LongType). Skips [[roundDiv]]'s `.cast("long")` entry
    * normalization on the numerator — that cast would overflow (→ null
    * non-ANSI, throw ANSI) for values past 2^63. The denominator (b > 0,
    * integer-valued) is likewise taken through decimal(38,0) directly —
    * no long bottleneck — so a caller may pass a product of longs promoted
    * to decimal before multiplying (q_quality_auc's 2·P·N) as well as a
    * plain BIGINT-ranged expression.
    * [[roundDivSqlHuge]] is the character-equivalent oracle form (HUGEINT
    * where this uses decimal(38,0)); keep the two in lockstep. Result
    * magnitude |a|·10^scale/b must fit a double exactly (< 2^53) — same
    * final BIGINT/10^scale float step as [[roundDiv]].
    *
    * Headroom bound (ADVICE r14): the intermediate |a|·2·10^scale lives in
    * decimal(38,0), so it must stay below 10³⁸ — at scale 6 that caps
    * |num| at ~5·10³¹. Past it Spark decimal overflow yields NULL under
    * the default (non-ANSI) mode and throws ArithmeticException under ANSI
    * (the swept ansicheck mode) — either way LOUD (oracle mismatch or
    * error), never a silent wrap — but callers whose numerator is a
    * product of corpus-sized
    * counts (q_quality_auc's Σpos·credit, bounded by (2·P·N)·N) should
    * state where that puts their own corpus bound.
    */
  def roundDivDec(num: Column, den: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    val aD = abs(num).cast("decimal(38,0)")
    val bD = den.cast("decimal(38,0)")
    val mag = intDivFloor(aD * lit(2L) * lit(p) + bD, bD * lit(2L))
    (when(num < 0, -mag).otherwise(mag)).cast("double") / lit(p.toDouble)
  }

  /** DuckDB oracle rendering of [[roundDivDec]]: the numerator expression
    * `a` must itself be computed in HUGEINT by the caller (cast a factor
    * to HUGEINT before the wide multiply — DuckDB ERRORS on BIGINT
    * overflow, it does not wrap), mirroring the Spark caller promoting to
    * decimal(38,0) before multiplying. `b` (> 0) may be BIGINT-ranged or
    * a HUGEINT-promoted product — same rule as `a`: promote a factor
    * before any multiply that could pass 2^63, since DuckDB evaluates the
    * expression BEFORE this function's outer CAST.
    */
  def roundDivSqlHuge(a: String, b: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"((CASE WHEN ($a) < 0 THEN -1 ELSE 1 END) * " +
      s"((2*abs(CAST(($a) AS HUGEINT))*$p + CAST(($b) AS HUGEINT)) // " +
      s"(2*CAST(($b) AS HUGEINT))) / $p.0)"
  }
}
