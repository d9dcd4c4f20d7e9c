package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Tables._
import graft.ops.Exprs._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (builder prompt): language-ID, quality scoring, token
  * counting, document fingerprinting. Every computation is built from
  * higher-order functions + exact integer/divide arithmetic so the DuckDB
  * oracle reproduces it bit-for-bit; no UDFs, everything distributes.
  *
  * Scale: each query is a narrow per-row map over the scan (no shuffle at
  * all except the deterministic final ORDER BY) — at 100 TB these run at
  * parquet-scan speed and parallelize per split.
  */
object TextAnalysis {

  private def tokens: Column = split(col("text"), " ")

  /** Count of tokens in a fixed marker set, as a long. */
  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(x => x: Any): _*))).cast("long")

  private def markerSql(words: Seq[String]): String =
    s"len(list_filter(ts, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))::BIGINT"

  // marker vocabularies for the n-gram/stopword language heuristic
  private val M1 = Seq("the", "a", "of")          // "en"-ish function words
  private val M2 = Seq("table", "row", "query")   // "db" jargon
  private val M3 = Seq("join", "filter", "sort")  // "ops" jargon

  /** The hashing-trick linear classifier's score CTEs (`w`/`wl`/`bias`/
    * `t`/`sc`, ending in `sc(doc_id, score)`) — shared by the inference
    * query and the AUC evaluator so both oracles score identically.
    * Declared BEFORE `all`, which interpolates it at object init.
    */
  private val ClassifierScoreCte: String =
    """w AS (SELECT j,
      |    (('0x' || substr(md5('qw:' || j::VARCHAR), 1, 15))::BIGINT
      |      % 2001) - 1000 AS wt
      |  FROM range(0, 64) r(j)),
      |wl AS (SELECT list(wt ORDER BY j) AS wv FROM w),
      |bias AS (SELECT (('0x' || substr(md5('qw:bias'), 1, 15))::BIGINT
      |      % 2001) - 1000 AS b),
      |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sc AS (SELECT doc_id,
      |    b + list_reduce(list_prepend(0::BIGINT,
      |      list_transform(ts, x ->
      |        wv[((('0x' || substr(md5('fh:' || x), 1, 15))::BIGINT % 64)
      |            + 1)::INT])),
      |      (a, v) -> a + v) AS score
      |  FROM t CROSS JOIN wl CROSS JOIN bias)""".stripMargin

  /** Oracle tail of the exact-AUC evaluator, reading CTE `c(score, p, ng,
    * nb)` — the (distinct-score, pos-count, neg-count, negatives-below)
    * groups. Wide-integer discipline: num2 = Σ p·(2·nb+ng) and the
    * denominator 2·P·N are both products of N-sized counts, so each factor
    * is promoted to HUGEINT BEFORE its multiply (DuckDB errors — does not
    * wrap — on BIGINT overflow, so without the promotion the oracle would
    * abort where Spark longs would silently wrap). Keep in lockstep with
    * [[aucOfGroups]], the Spark side. Declared BEFORE `all` (init order).
    */
  private val AucFromGroupsSql: String =
    s"""agg AS (SELECT SUM(CAST(p AS HUGEINT) * (2*nb + ng)) AS num2,
       |          CAST(SUM(p) AS BIGINT) AS n_pos,
       |          CAST(SUM(ng) AS BIGINT) AS n_neg
       |        FROM c)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    ${graft.ops.Exprs.roundDivSqlHuge(
              "num2", "2*CAST(n_pos AS HUGEINT)*n_neg", 6)}
       |  END AS auc
       |FROM agg""".stripMargin

  /** Spark side of [[AucFromGroupsSql]]: exact Mann-Whitney AUC from
    * per-distinct-score (score, p, ng) group counts. The window runs over
    * DISTINCT SCORES (bounded by the model's score range, not the corpus),
    * and every N-sized product goes through decimal(38,0) before the
    * multiply — num2 via the promoted p factor, the 2·P·N denominator via
    * the promoted n_pos factor — so no LongType arithmetic ever sees an
    * N²-scale value at any corpus size (AucWideSpec pins this past the old
    * 2^63/2·10⁶ bound). private[graft] so the spec can drive it with
    * synthetic counts.
    */
  private[graft] def aucOfGroups(
      g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("score")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    g.withColumn("nb", sum(col("ng")).over(w) - col("ng"))
      .agg(
        sum(col("p").cast("decimal(38,0)") * (col("nb") * 2 + col("ng")))
          .as("num2"),
        sum(col("p")).as("n_pos"), sum(col("ng")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          graft.ops.Exprs.roundDivDec(col("num2"),
            col("n_pos").cast("decimal(38,0)") * col("n_neg") * 2, 6))
          .as("auc"))
  }

  // Fixed-point scale for q_logreg_train's weights: a weight w means the
  // real value w / LrS. All training arithmetic stays in exact integers so
  // the DuckDB oracle reproduces every epoch bit-for-bit. `final` +
  // literal ⇒ compile-time constant, and declared BEFORE `all` because the
  // oracle strings interpolate it at object init (initialization order —
  // a val below `all` reads as 0 there).
  private final val LrS = 1000000L

  val all: Seq[Q] = Seq(

    // ── language-ID: argmax over marker-set hit counts, fixed tie order ──
    Q("q_lang_id",
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id, lang,
         |        ${markerSql(M1)} AS s1, ${markerSql(M2)} AS s2, ${markerSql(M3)} AS s3
         |      FROM t)
         |SELECT doc_id, lang AS labeled, s1, s2, s3,
         |  CASE WHEN s1 >= s2 AND s1 >= s3 THEN 'en'
         |       WHEN s2 >= s3 THEN 'db' ELSE 'ops' END AS guessed
         |FROM s ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val t = documents(s, d).select(col("doc_id"), col("lang"), tokens.as("ts"))
        val scored = t.select(col("doc_id"), col("lang").as("labeled"),
          markerCount(col("ts"), M1).as("s1"),
          markerCount(col("ts"), M2).as("s2"),
          markerCount(col("ts"), M3).as("s3"))
        scored.withColumn("guessed",
          when(col("s1") >= col("s2") && col("s1") >= col("s3"), "en")
            .when(col("s2") >= col("s3"), "db")
            .otherwise("ops"))
          .orderBy("doc_id")
    },

    // ── quality scoring: length/stopword/token-shape heuristics ─────────
    // All ratios are exact-int ÷ exact-int (single correctly-rounded IEEE
    // division) so Spark and DuckDB agree to the last bit.
    Q("q_text_quality",
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  CAST(len(ts) AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(ts, x -> length(x)::BIGINT)), (a,b) -> a + b) AS sum_tok_len,
         |  ${markerSql(M1)} AS n_stop FROM t)
         |SELECT doc_id, len_chars, n_tokens,
         |  CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_tok_len,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) *
         |    (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS quality
         |FROM s ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val t = documents(s, d).select(col("doc_id"), col("text"), tokens.as("ts"))
        val sumTokLen = aggregate(
          transform(col("ts"), x => length(x).cast("long")),
          lit(0L), (a, b) => a + b)
        t.select(col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          size(col("ts")).cast("long").as("n_tokens"),
          sumTokLen.as("sum_tok_len"),
          markerCount(col("ts"), M1).as("n_stop"))
          .select(col("doc_id"), col("len_chars"), col("n_tokens"),
            (col("sum_tok_len").cast("double") / col("n_tokens")).as("avg_tok_len"),
            (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
            (least(lit(1.0), col("n_tokens").cast("double") / 100.0) *
              (lit(1.0) - col("n_stop").cast("double") / col("n_tokens"))).as("quality"))
          .orderBy("doc_id")
    },

    // ── token counting: whitespace + regex (BPE-ish pre-tokenizer) ──────
    Q("q_token_count",
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents)
        |SELECT doc_id,
        |  CAST(len(ts) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re,
        |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct
        |FROM t ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        documents(s, d).select(col("doc_id"),
          size(tokens).cast("long").as("n_ws"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
            .cast("long").as("n_re"),
          size(array_distinct(tokens)).cast("long").as("n_distinct"))
          .orderBy("doc_id")
    },

    // ── sketch cardinality, accuracy-gated: the one declared APPROXIMATE
    //    op. At 100 TB approx_count_distinct (HLL++) is the cardinality
    //    operator — one pass, mergeable fixed-size sketch, no distinct
    //    shuffle. Sketch REGISTERS are engine-specific, so the declared
    //    columns are the exact count plus a bounded-relative-error flag:
    //    if Spark's sketch ever drifts past 5% of truth the flag flips and
    //    the hash gate goes red (the q_ann_recall discipline — measure the
    //    approximation, hash the measurement). rsd=2% keeps 5% a wide
    //    margin, and HLL is deterministic for a given input set, so the
    //    flag is stable across runs/partitionings. ─────────────────────────
    Q("q_sketch_distinct",
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents)
        |SELECT source, count(DISTINCT tok) AS n_exact, TRUE AS within_5pct
        |FROM t GROUP BY source ORDER BY source""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source")
          .agg(count_distinct(col("tok")).as("n_exact"),
            approx_count_distinct(col("tok"), 0.02).as("n_approx"))
          .select(col("source"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")).cast("double") <=
              col("n_exact").cast("double") * 0.05).as("within_5pct"))
          .orderBy("source")
    },

    // ── TF-IDF: term frequency × inverse document frequency ─────────────
    // ln() differs by 1 ulp between engines on ~8% of inputs (measured), so
    // the score is round(.,6) on BOTH sides — the one declared query where
    // bit-exactness needs explicit rounding (SURVEY §5.3 rule 3).
    Q("q_tfidf",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, tok, tf, df,
        |  round(tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
        |FROM tf JOIN df USING (tok) CROSS JOIN n
        |WHERE doc_id % 97 = 0
        |ORDER BY doc_id, tok""".stripMargin) {
      (s, d) =>
        val tok = documents(s, d)
          .select(col("doc_id"), explode(tokens).as("tok"))
        val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = tok.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
        val n = documents(s, d).agg(count(lit(1)).as("n"))
        tf.join(df, "tok").crossJoin(broadcast(n))
          .filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("tok"), col("tf"), col("df"),
            round(col("tf") * log(col("n").cast("double") / col("df")), 6)
              .as("tfidf"))
          .orderBy("doc_id", "tok")
    },

    // ── array higher-order functions: filter / exists / forall / reduce
    //    over token arrays — all evaluated inside Catalyst (no UDF), the
    //    array-processing surface of a document pipeline ───────────────────
    Q("q_array_hof",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(ts, w -> length(w) > 6)) AS BIGINT) AS n_long,
        |  len(list_filter(ts, w -> w = 'the')) > 0 AS has_the,
        |  len(list_filter(ts, w -> length(w) < 1)) = 0 AS all_nonempty,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(ts, w -> CASE WHEN length(w) > 6
        |                                 THEN length(w)::BIGINT ELSE 0 END)),
        |    (a, b) -> a + b) AS long_chars
        |FROM t ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val ts = tokens
        documents(s, d).select(col("doc_id"),
          size(filter(ts, w => length(w) > 6)).cast("long").as("n_long"),
          exists(ts, w => w === "the").as("has_the"),
          forall(ts, w => length(w) >= 1).as("all_nonempty"),
          aggregate(
            transform(ts, w => when(length(w) > 6, length(w).cast("long"))
              .otherwise(0L)),
            lit(0L), (a, b) => a + b).as("long_chars"))
          .orderBy("doc_id")
    },

    // ── deterministic train/val/test split: hash-bucket assignment ──────
    // The reproducible-split idiom for training data: bucket = stable hash
    // of the id, never a random() — identical across engines, runs, and
    // cluster sizes; pure map stage at any scale.
    Q("q_split",
      """WITH b AS (SELECT doc_id,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bkt
        |  FROM documents)
        |SELECT doc_id, bkt,
        |  CASE WHEN bkt < 80 THEN 'train'
        |       WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"),
            (md5Long(col("doc_id").cast("string")) % 100).as("bkt"))
          .withColumn("split",
            when(col("bkt") < 80, "train")
              .when(col("bkt") < 90, "val").otherwise("test"))
          .orderBy("doc_id")
    },

    // ── histogram: fixed-width binning + counts (value profiling) ───────
    Q("q_histogram",
      """SELECT CAST(floor(length(text) / 100) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(min(length(text)) AS BIGINT) AS lo,
        |  CAST(max(length(text)) AS BIGINT) AS hi
        |FROM documents GROUP BY 1 ORDER BY bin""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .groupBy(floor(length(col("text")) / 100).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            min(length(col("text"))).cast("long").as("lo"),
            max(length(col("text"))).cast("long").as("hi"))
          .orderBy("bin")
    },

    // ── document fingerprint: polynomial rolling hash over tokens ───────
    // h(tok) = md5Long(tok) % 1000003; fp = fold (acc*131 + h) % 1000003.
    // Exact BIGINT arithmetic (acc*131 + h < 2^31), portable across engines.
    Q("q_fingerprint",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(ts, w ->
        |      ('0x' || substr(md5(w), 1, 15))::BIGINT % 1000003)),
        |    (a, b) -> (a * 131 + b) % 1000003) AS fp
        |FROM t ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        documents(s, d).select(col("doc_id"),
          aggregate(
            transform(tokens, w => md5Long(w) % 1000003L),
            lit(0L), (a, b) => (a * 131L + b) % 1000003L).as("fp"))
          .orderBy("doc_id")
    },

    // ── learned quality filter, inference shape: a linear classifier over
    //    the hashing-trick feature space (the fastText-style model every
    //    production quality gate runs after the heuristics). The 64 bucket
    //    weights are md5-derived integer literals on both engines (a
    //    trained model would broadcast its weight vector the same way);
    //    score = bias + Σ_tokens weight[h(token)] computed entirely inside
    //    one HOF fold over the token array — per-token weight lookup into
    //    a literal array, exact BIGINT accumulation, keep ⇔ score > 0
    //    (the sigmoid's 0.5 threshold without evaluating exp(), whose
    //    last-ULP behavior differs across engines). Feature channel 'fh:'
    //    matches q_feature_hash, so this IS inference over that encoder's
    //    space. Scale: no hash-partitioned shuffle anywhere (the explode+
    //    groupBy one-hot shape is exactly what the fold avoids) — scores
    //    at parquet-scan speed at any corpus size; plan-pinned by
    //    QualityClassifierSpec, which also re-derives every score through
    //    the avoided explode+groupBy plan and matches. ──────────────────
    Q("q_quality_classifier",
      s"""WITH $ClassifierScoreCte
        |SELECT doc_id, score, score > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        classifierScores(s, d)
          .select(col("doc_id"), col("score"),
            (col("score") > 0).as("keep"))
          .orderBy("doc_id")
    },

    // ── classifier evaluation, exact ROC-AUC (round 11): the measurement
    //    a production quality gate runs before trusting a filter — the
    //    probability a random positive outranks a random negative, with
    //    the standard half-credit for score ties (Mann-Whitney U). The
    //    declared label is `lang = 'en'` (binary, data-derived, ~40/60 at
    //    every SF); the statistic's value is incidental — what this row
    //    pins is the EVALUATOR's arithmetic. Everything is integer-exact:
    //    scores GROUP to (score, n_pos, n_neg), a running negative count
    //    orders the groups, twice-the-credit 2·nb+ng keeps the tie term
    //    integral, and AUC = Σ pos·(2·nb+ng) ∕ (2·P·N) rounds through
    //    roundDiv. Scale: per-doc scoring is the classifier's scan-speed
    //    fold; the ONLY window runs over DISTINCT SCORES, whose count is
    //    bounded by the score range (|bias| + 1000·max_tokens — a
    //    model-geometry constant, not a corpus size), so the global
    //    ordering never sees N rows. Overflow discipline (round 14, was a
    //    documented N ≈ 3e6 silent-wrap bound): num2 and the 2·P·N
    //    denominator are both products of N-sized counts, so BOTH are
    //    promoted to a wide integer BEFORE any multiply — Spark via
    //    decimal(38,0) (the q_bm25 rule, Exprs.roundDivDec), the oracle
    //    via HUGEINT (Exprs.roundDivSqlHuge). Nothing N-dependent ever
    //    touches LongType arithmetic, so there is no wrap at ANY corpus
    //    size that decimal(38,0) can hold; the residual bounds are (a)
    //    roundDivDec's result-fits-a-double contract (auc·10⁶ ≤ 10⁶ —
    //    always) and (b) its decimal(38,0) headroom (ADVICE r14): the
    //    intermediate num2·2·10⁶ must stay under 10³⁸, i.e.
    //    num2 ≤ 2·P·N ≲ 5·10³¹ → P·N ≲ 2.5·10³¹ docs² — ~10¹⁵ docs
    //    balanced, far past any corpus, and an overflow surfaces as NULL
    //    auc vs a HUGEINT oracle error (loud mismatch, never a silent
    //    wrap). AucWideSpec drives the
    //    shared aucOfGroups kernel with counts past the old 2^63 bound and
    //    matches an exact BigInt recomputation. ──────────────────────────
    Q("q_quality_auc",
      s"""WITH $ClassifierScoreCte,
        |lab AS (SELECT doc_id, lang = 'en' AS pos FROM documents),
        |s2 AS (SELECT sc.score, lab.pos FROM sc JOIN lab USING (doc_id)),
        |g AS (SELECT score, count(*) FILTER (pos) AS p,
        |        count(*) FILTER (NOT pos) AS ng
        |      FROM s2 GROUP BY score),
        |c AS (SELECT score, p, ng,
        |        CAST(SUM(ng) OVER (ORDER BY score) - ng AS BIGINT) AS nb
        |      FROM g),
        |$AucFromGroupsSql""".stripMargin) {
      (s, d) =>
        val g = labeledScores(s, d)
          .groupBy("score")
          .agg(count(when(col("pos"), 1)).as("p"),
            count(when(!col("pos"), 1)).as("ng"))
        aucOfGroups(g)
    },

    // ── classifier calibration (round 11): the OTHER half of evaluating a
    //    quality filter — AUC says the ranking is right, calibration says
    //    the scores MEAN something (does bin 9 actually contain mostly
    //    positives?). Scores land in 10 fixed-width integer bins over
    //    [min, max]: bin = least(9, (score−mn)·10 ÷ (mx−mn+1)), floor
    //    division on non-negative BIGINTs — no quantiles, because ntile
    //    over tied scores is ORDER-DEPENDENT across engines while the
    //    fixed-width edge is a pure function of (score, mn, mx). Per bin:
    //    volume, positive count/rate, mean score (both ratios through
    //    roundDiv — §5.3). Scale: scoring is the classifier's shuffle-free
    //    scan fold; the (mn, mx) extremes are a 1-row broadcast (no second
    //    shuffle); the final groupBy has AT MOST 10 groups with map-side
    //    partial aggregation — at 100 TB this is two scans and a
    //    10-row exchange. ─────────────────────────────────────────────────
    Q("q_quality_calibration",
      s"""WITH $ClassifierScoreCte,
        |lab AS (SELECT doc_id, lang = 'en' AS pos FROM documents),
        |ext AS (SELECT min(score) AS mn, max(score) AS mx FROM sc),
        |b AS (SELECT sc.doc_id, sc.score,
        |        least(9::BIGINT, ((sc.score - ext.mn) * 10)
        |          // (ext.mx - ext.mn + 1)) AS bin
        |      FROM sc CROSS JOIN ext),
        |j AS (SELECT b.bin, b.score, lab.pos
        |      FROM b JOIN lab USING (doc_id))
        |SELECT bin, count(*) AS n,
        |  CAST(count(*) FILTER (pos) AS BIGINT) AS n_pos,
        |  ${graft.ops.Exprs.roundDivSql(
             "count(*) FILTER (pos)", "count(*)", 6)} AS pos_rate,
        |  ${graft.ops.Exprs.roundDivSql(
             "sum(score)", "count(*)", 6)} AS mean_score
        |FROM j GROUP BY bin ORDER BY bin""".stripMargin) {
      (s, d) =>
        val sc0 = labeledScores(s, d)
        val ext = sc0.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
        sc0.crossJoin(broadcast(ext))
          .select(col("score"), col("pos"),
            least(lit(9L), graft.ops.Exprs.intDivFloor(
              (col("score") - col("mn")) * 10,
              col("mx") - col("mn") + 1)).as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            count(when(col("pos"), 1)).as("n_pos"),
            sum(col("score")).as("ssum"))
          .select(col("bin"), col("n"), col("n_pos"),
            graft.ops.Exprs.roundDiv(col("n_pos"), col("n"), 6)
              .as("pos_rate"),
            graft.ops.Exprs.roundDiv(col("ssum"), col("n"), 6)
              .as("mean_score"))
          .orderBy("bin")
    },

    // ── learned quality filter, TRAINING shape (round 13): the gradient-
    //    descent loop that PRODUCES a linear model — closing the classifier
    //    family's loop (q_feature_hash encodes, THIS trains, _classifier
    //    scores, _auc ranks, _calibration sanity-checks). Three full-batch
    //    epochs of logistic regression over an 8-bucket hashed feature
    //    space (label = lang='en'), entirely in fixed-point integers: the
    //    hard-sigmoid surrogate p̂ = clamp(½ + m∕4, 0, 1) replaces exp()
    //    (whose last-ULP behavior differs across engines), so every margin,
    //    residual, gradient sum and weight update is EXACT and the oracle
    //    replays the whole optimization bit-for-bit — the declared rows are
    //    the per-epoch weight vectors and training accuracy, i.e. the
    //    training CURVE is what's hash-gated. Scale: one narrow 9-column
    //    projection per document (8 HOF bucket counts, no explode, no
    //    shuffle), then ONE partial-aggregating 1-row gradient reduce per
    //    epoch — the classic distributed-GD shape: 4 corpus passes total at
    //    any size, each a scan + 12-sum map-side-combined aggregate; weight
    //    frames are 1-row broadcasts (the parameter-join pattern, 4 BNLJs).
    //    BIGINT bounds: |r|≤10⁶ and fⱼ≤tokens/doc keep per-row products
    //    long-safe; the SUMS route through decimal(38,0)/HUGEINT (exact to
    //    ~10³⁰ docs — the q_bm25 lesson applied at design time); margins
    //    |m| ≤ |b|+Σ|wⱼ|fⱼ ≤ 3·8·10⁵·L² stay long-safe for documents up to
    //    ~10⁵ tokens. Loop discipline: each epoch COLLECTS its one 19-value
    //    aggregate row (the q_bpe bounded-collect contract — 4 rows × ~200
    //    bytes total driver memory) and the update runs in driver BigInt;
    //    weights re-enter the next pass as a broadcast 1-row PARAMETER
    //    table, not literals, so all four passes compile to the same
    //    codegen text (Janino caches it) — and the plan depth stays
    //    constant in E where the plan-only chain would nest epoch e's
    //    aggregate inside epoch e+1's and recompute O(E²) passes. ───────────
    Q("q_logreg_train",
      s"""WITH $lrFeatSql,
        |w0 AS (SELECT CAST(0 AS BIGINT) AS b, ${(0 to 7)
             .map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
        |${lrStepSql(1)},
        |${lrUpdSql(1)},
        |${lrStepSql(2)},
        |${lrUpdSql(2)},
        |${lrStepSql(3)},
        |${lrUpdSql(3)},
        |${lrStepSql(4)}
        |SELECT * FROM (${lrReportSql(1, "a2")}
        |  UNION ALL ${lrReportSql(2, "a3")}
        |  UNION ALL ${lrReportSql(3, "a4")}) u
        |ORDER BY epoch""".stripMargin) {
      (s, d) =>
        // feat is reused by 4 epoch passes — cache the 9-long projection
        // (72 B/doc; at 10⁹ docs ~72 GB cluster-wide, the standard iterative
        // persist; uncached it would be 4 parquet scans, also correct)
        val feat = lrFeat(s, d).cache()
        import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
        val wSchema = StructType(
          StructField("b", LongType) +:
            (0 to 7).map(j => StructField(s"w$j", LongType)))
        def wDf(b: Long, w: Seq[Long]) = s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row.fromSeq(b +: w)), wSchema)
        def roundHalfAway(a: BigInt, bb: BigInt): Long =
          (((a.abs * 2 + bb) / (bb * 2)) * (if (a < 0) -1 else 1)).toLong
        var b = 0L
        var w: Seq[Long] = Vector.fill(8)(0L)
        val out = Vector.newBuilder[org.apache.spark.sql.Row]
        for (e <- 1 to 4) {
          val r = lrStep(feat, wDf(b, w)).collect()(0)
          val n = r.getAs[Long]("n"); val nc = r.getAs[Long]("nc")
          def grad(c: String): BigInt =
            BigInt(r.getAs[java.math.BigDecimal](c).toBigIntegerExact)
          // pass e evaluates AT the pre-update weights w_{e-1}: its
          // n_correct is epoch e-1's declared accuracy row
          if (e >= 2) {
            val acc = roundHalfAway(BigInt(nc) * 1000000, BigInt(n)) / 1.0e6
            out += org.apache.spark.sql.Row.fromSeq(
              (e - 1).toLong +: b +: w :+ nc :+ acc)
          }
          if (e <= 3) { // GD update at lr 1/10, exact BigInt rationals
            b -= roundHalfAway(grad("gb"), BigInt(10) * n)
            w = (0 to 7).map(j => w(j) - roundHalfAway(grad(s"g$j"), BigInt(10) * n))
          }
        }
        val outSchema = StructType(
          (StructField("epoch", LongType) +: wSchema.fields.toSeq) :+
            StructField("n_correct", LongType) :+
            StructField("accuracy", DoubleType))
        s.createDataFrame(java.util.List.of(out.result(): _*), outSchema)
          .orderBy("epoch")
    },

    // ── Zipf head (round 11): the exact top-50 token mass curve — rank,
    //    count, corpus share, cumulative share. The OTHER lens from
    //    q_heavy_hitters: that one pins the approximate CMS machinery
    //    with error bounds; this is the exact frequency head a corpus
    //    report prints to judge vocabulary concentration (how much of the
    //    corpus do the top-k tokens cover?). Deterministic tie order
    //    (cnt DESC, tok ASC); all integer until roundDiv. Scale: the
    //    token groupBy is classic wordcount (map-side combine → vocab-
    //    sized exchange); the head is TakeOrdered k=50 (per-partition
    //    top-k, never a global sort of the vocabulary); rank/cum windows
    //    run over the 50 SELECTED rows only; the corpus-total is a 1-row
    //    broadcast. ────────────────────────────────────────────────────────
    Q("q_zipf",
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM t),
        |h AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 50),
        |r AS (SELECT tok, cnt,
        |        CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
        |          AS rank,
        |        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok) AS BIGINT)
        |          AS cum
        |      FROM h)
        |SELECT rank, tok, cnt,
        |  ${graft.ops.Exprs.roundDivSql("cnt", "total", 6)} AS share,
        |  ${graft.ops.Exprs.roundDivSql("cum", "total", 6)} AS cum_share
        |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin) {
      (s, d) =>
        val t = spread(documents(s, d)).select(explode(tokens).as("tok"))
        val tot = t.agg(count(lit(1)).as("total"))
        val head = t.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(50)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tok"))
        head
          .withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("cum",
            sum(col("cnt")).over(w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .crossJoin(broadcast(tot))
          .select(col("rank"), col("tok"), col("cnt"),
            graft.ops.Exprs.roundDiv(col("cnt"), col("total"), 6)
              .as("share"),
            graft.ops.Exprs.roundDiv(col("cum"), col("total"), 6)
              .as("cum_share"))
          .orderBy("rank")
    },

    // ── vocabulary growth / Heaps' law (round 11): how fast do NEW
    //    trigram types appear as the corpus grows? The type unit is the
    //    3-gram, NOT the unigram — this corpus draws from a fixed
    //    31-token base vocabulary at every SF, so unigram novelty
    //    saturates in the first bin, while trigram types keep arriving
    //    (the same reason n-grams are the working unit of novelty and
    //    contamination analysis). Documents bucket into 10 fixed-width
    //    doc_id deciles (same integer edge as q_quality_calibration); a
    //    type is "new in bin b" when its corpus-first document
    //    (min doc_id over occurrences) lands in b. Output per bin: new
    //    types, cumulative types, trigram volume, cumulative volume, and
    //    the running type/occurrence ratio — the curve a pipeline reads
    //    to decide whether more data still buys novelty. All integer
    //    except the final roundDiv. Scale: one position-explode (a row
    //    per corpus trigram — the q_dedup_substring regime) into a
    //    wordcount-shaped groupBy(trigram → min(doc_id)) with map-side
    //    partials; both decile aggregates land on ≤ 10 groups; windows
    //    run over 10 rows. ─────────────────────────────────────────────────
    Q("q_vocab_growth",
      """WITH ext AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS ts
        |      FROM documents),
        |w AS (SELECT doc_id, ts,
        |        unnest(generate_series(1, len(ts) - 2)) AS pos
        |      FROM t WHERE len(ts) >= 3),
        |tk AS (SELECT doc_id, array_to_string(ts[pos:pos+2], ' ') AS tg
        |       FROM w),
        |ft AS (SELECT tg, min(doc_id) AS fd FROM tk GROUP BY tg),
        |nt AS (SELECT least(9::BIGINT, ((fd - mn) * 10) // (mx - mn + 1))
        |         AS bin, count(*) AS new_types
        |       FROM ft CROSS JOIN ext GROUP BY 1),
        |tv AS (SELECT least(9::BIGINT, ((doc_id - mn) * 10)
        |         // (mx - mn + 1)) AS bin,
        |         CAST(count(*) AS BIGINT) AS bin_ngrams
        |       FROM tk CROSS JOIN ext GROUP BY 1),
        |j AS (SELECT tv.bin, coalesce(nt.new_types, 0) AS new_types,
        |        tv.bin_ngrams
        |      FROM tv LEFT JOIN nt ON tv.bin = nt.bin),
        |r AS (SELECT bin, new_types,
        |        CAST(SUM(new_types) OVER (ORDER BY bin) AS BIGINT)
        |          AS cum_types,
        |        bin_ngrams,
        |        CAST(SUM(bin_ngrams) OVER (ORDER BY bin) AS BIGINT)
        |          AS cum_ngrams
        |      FROM j)
        |SELECT bin, new_types, cum_types, bin_ngrams, cum_ngrams,
        |  """.stripMargin +
        graft.ops.Exprs.roundDivSql("cum_types", "cum_ngrams", 6) +
        """ AS novelty_ratio
        |FROM r ORDER BY bin""".stripMargin) {
      (s, d) =>
        val docs = documents(s, d)
        val ext = docs.agg(min(col("doc_id")).as("mn"),
          max(col("doc_id")).as("mx"))
        def binOf(c: Column): Column =
          least(lit(9L), graft.ops.Exprs.intDivFloor(
            (c - col("mn")) * 10, col("mx") - col("mn") + 1))
        val tk = spread(docs)
          .select(col("doc_id"), tokens.as("ts"))
          .withColumn("n", size(col("ts")))
          .filter(col("n") >= 3)
          .select(col("doc_id"), col("ts"),
            explode(sequence(lit(1), col("n") - 2)).as("pos"))
          .select(col("doc_id"),
            array_join(slice(col("ts"), col("pos"), lit(3)), " ").as("tg"))
        val nt = tk.groupBy("tg").agg(min(col("doc_id")).as("fd"))
          .crossJoin(broadcast(ext))
          .groupBy(binOf(col("fd")).as("bin"))
          .agg(count(lit(1)).as("new_types"))
        val tv = tk.crossJoin(broadcast(ext))
          .groupBy(binOf(col("doc_id")).as("bin"))
          .agg(count(lit(1)).as("bin_ngrams"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        tv.join(nt, Seq("bin"), "left")
          .select(col("bin"),
            coalesce(col("new_types"), lit(0L)).as("new_types"),
            col("bin_ngrams"))
          .withColumn("cum_types", sum(col("new_types")).over(w))
          .withColumn("cum_ngrams", sum(col("bin_ngrams")).over(w))
          .select(col("bin"), col("new_types"), col("cum_types"),
            col("bin_ngrams"), col("cum_ngrams"),
            graft.ops.Exprs.roundDiv(col("cum_types"), col("cum_ngrams"), 6)
              .as("novelty_ratio"))
          .orderBy("bin")
    },

    // ── per-source distribution shift (round 11): KL divergence of each
    //    source's add-one-smoothed unigram distribution from the corpus
    //    distribution — the quantitative form of "which sources look like
    //    the mixture and which drag it", read next to q_mix_sources'
    //    weights and q_drift's centroids. Both sides smooth over the SAME
    //    corpus vocabulary V, so P and Q are genuine distributions and
    //    KL ≥ 0 (pinned in ChunkKlSpec up to the declared rounding).
    //    Float discipline = q_bigram_lm's: ln of an exact-integer ratio
    //    rounds to 6 decimals per term, the weighted sum accumulates in
    //    DECIMAL (exact), and ONE roundDiv closes the division — term
    //    order never matters. Overflow bounds, documented not latent: the
    //    ln-ratio's BIGINT products stay double-exact to n_all ~ 2^53/V;
    //    roundDiv at scale 0 needs |Σ(c_s+1)·lr·10^6| < 2^62 — holds to
    //    ~10^11 tokens/source. Scale: two wordcount groupBys; the
    //    source×vocab matrix is |S|·V rows with S a BROADCAST handful (a
    //    mixture has dozens of sources — an S that grows with the corpus
    //    would need the sparse-term + closed-remainder form instead);
    //    output is |S| rows. ──────────────────────────────────────────────
    Q("q_kl_sources",
      s"""WITH u AS (SELECT source, unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |ca AS (SELECT w, CAST(count(*) AS BIGINT) AS c_all
        |       FROM u GROUP BY w),
        |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
        |         CAST(count(DISTINCT w) AS BIGINT) AS v FROM u),
        |cs AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_s
        |       FROM u GROUP BY source, w),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
        |         CAST(count(DISTINCT w) AS BIGINT) AS v_src
        |       FROM u GROUP BY source),
        |m AS (SELECT ns.source, ns.n_s, ns.v_src, ca.w, ca.c_all,
        |        coalesce(cs.c_s, 0) AS c_s
        |      FROM ns CROSS JOIN ca
        |      LEFT JOIN cs ON cs.source = ns.source AND cs.w = ca.w),
        |term AS (SELECT source, n_s, v_src,
        |    c_s + 1 AS wgt, n_s + v AS den,
        |    CAST(round(ln((c_s + 1) * (n_all + v)
        |                  / CAST((c_all + 1) * (n_s + v) AS DOUBLE)), 6)
        |         AS DECIMAL(18,6)) AS lr
        |  FROM m CROSS JOIN na)
        |SELECT source, n_s AS n_tokens, v_src AS vocab_src,
        |  ${graft.ops.Exprs.roundDivSql("SUM(wgt * lr) * 1000000",
             "den", 0)} / 1000000.0 AS kl
        |FROM term GROUP BY source, n_s, v_src, den
        |ORDER BY source""".stripMargin) {
      (s, d) =>
        val u = spread(documents(s, d))
          .select(col("source"), explode(tokens).as("w"))
        val ca = u.groupBy("w").agg(count(lit(1)).as("c_all"))
        val na = u.agg(count(lit(1)).as("n_all"),
          count_distinct(col("w")).as("v"))
        val cs = u.groupBy("source", "w").agg(count(lit(1)).as("c_s"))
        val ns = u.groupBy("source").agg(count(lit(1)).as("n_s"),
          count_distinct(col("w")).as("v_src"))
        val cS = coalesce(col("c_s"), lit(0L))
        broadcast(ns).crossJoin(ca)
          .join(cs, Seq("source", "w"), "left")
          .crossJoin(broadcast(na))
          .select(col("source"), col("n_s"), col("v_src"),
            (cS + 1).as("wgt"), (col("n_s") + col("v")).as("den"),
            round(log(((cS + 1) * (col("n_all") + col("v"))) /
              ((col("c_all") + 1) * (col("n_s") + col("v")))
                .cast("double")), 6)
              .cast("decimal(18,6)").as("lr"))
          .groupBy("source", "n_s", "v_src", "den")
          .agg(graft.ops.Exprs.roundDiv(
            sum(col("wgt") * col("lr")) * lit(1000000L),
            col("den"), 0).as("klq"))
          .select(col("source"), col("n_s").as("n_tokens"),
            col("v_src").as("vocab_src"),
            (col("klq") / lit(1000000.0)).as("kl"))
          .orderBy("source")
    },

    // ── per-source two-sample Kolmogorov–Smirnov (round 11): for each
    //    source, KS distance between its n_chars distribution and the
    //    REST of the corpus — the nonparametric complement to
    //    q_kl_sources (which needs a vocabulary) and q_drift (which
    //    needs embeddings): pure order statistics on one numeric column.
    //    DECLARED SEMANTICS: both ECDFs are evaluated on the union value
    //    grid and rounded half-up to 9 decimals as scaled BIGINTs BEFORE
    //    differencing, so the statistic is "KS on 1e-9-quantized ECDFs"
    //    — exact on both engines, perturbing true KS by < 2e-9. at_value
    //    is the SMALLEST n_chars achieving the max (argmax decoded from
    //    one max() over diff9*(C) - (v+1) encodings, C = 10^9 — the
    //    q_argmax single-agg pattern; assumes n_chars < 10^9 - 1).
    //    Overflow bounds: 2*cum*10^9 + n needs cum ≤ 4.6e9 rows/side;
    //    (diff9+1)*C ≤ 1e18 < 2^63. Scale: the only corpus-wide work is
    //    groupBy(source, v) — map-side combined to |S|·V rows (V =
    //    distinct n_chars, bounded by the value domain, not the corpus);
    //    the grid/window/argmax all run on |S|·V. At 100 TB this is a
    //    scan + one combine; the window partitions by source over ≤ V
    //    rows each. ─────────────────────────────────────────────────────
    Q("q_ks_test",
      """WITH c AS (SELECT source, n_chars AS v,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM documents GROUP BY source, n_chars),
        |av AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS c_all FROM c GROUP BY v),
        |ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_s FROM c GROUP BY source),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
        |grid AS (SELECT ns.source, ns.n_s, av.v, av.c_all,
        |        coalesce(c.cnt, 0) AS cnt
        |      FROM ns CROSS JOIN av
        |      LEFT JOIN c ON c.source = ns.source AND c.v = av.v),
        |cum AS (SELECT source, n_s, v,
        |        CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v)
        |             AS BIGINT) AS cum_s,
        |        CAST(sum(c_all) OVER (PARTITION BY source ORDER BY v)
        |             AS BIGINT) AS cum_all
        |      FROM grid),
        |d AS (SELECT source, n_s, v,
        |        abs((2*cum_s*1000000000 + n_s) // (2*n_s)
        |          - (2*(cum_all - cum_s)*1000000000 + (n_all - n_s))
        |            // (2*(n_all - n_s))) AS diff9
        |      FROM cum CROSS JOIN n),
        |e AS (SELECT source, n_s,
        |        max((diff9 + 1) * 1000000000 - (v + 1)) AS enc
        |      FROM d GROUP BY source, n_s)
        |SELECT source, n_s,
        |  (enc // 1000000000) / 1000000000.0 AS ks,
        |  (enc // 1000000000 + 1) * 1000000000 - enc - 1 AS at_value
        |FROM e ORDER BY source""".stripMargin) {
      (s, d) =>
        val P = lit(1000000000L)
        val c = documents(s, d)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val av = c.groupBy("v").agg(sum(col("cnt")).as("c_all"))
        val ns = c.groupBy("source").agg(sum(col("cnt")).as("n_s"))
        val n = c.agg(sum(col("cnt")).as("n_all"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("v")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        // round-half-up of cum/den at 9 decimals, as a scaled BIGINT
        def ecdf9(cum: Column, den: Column): Column =
          intDivFloor(cum * lit(2L) * P + den, den * lit(2L))
        broadcast(ns).crossJoin(av)
          .join(c, Seq("source", "v"), "left")
          .select(col("source"), col("n_s"), col("v"), col("c_all"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
          .withColumn("cum_s", sum(col("cnt")).over(w))
          .withColumn("cum_all", sum(col("c_all")).over(w))
          .crossJoin(broadcast(n))
          .select(col("source"), col("n_s"), col("v"),
            abs(ecdf9(col("cum_s"), col("n_s")) -
              ecdf9(col("cum_all") - col("cum_s"),
                col("n_all") - col("n_s"))).as("diff9"))
          .groupBy("source", "n_s")
          .agg(max((col("diff9") + 1) * P - (col("v") + 1)).as("enc"))
          .select(col("source"), col("n_s"),
            (intDivFloor(col("enc"), P).cast("double") / lit(1.0e9))
              .as("ks"),
            ((intDivFloor(col("enc"), P) + 1) * P - col("enc") - 1)
              .as("at_value"))
          .orderBy("source")
    },

    // ── G-test of independence, source × lang (round 11): the
    //    likelihood-ratio counterpart of Pearson chi² — G_s =
    //    2·Σ_l o·ln(o·n /(n_s·n_l)) summed per source (total G = sum of
    //    the output column). Chosen over raw chi² because its per-cell
    //    term is ln of an EXACT-INTEGER ratio — the q_kl_sources float
    //    discipline applies verbatim (one double division, one ln,
    //    round to 6, DECIMAL-exact weighted sum; chi²'s (o·n−n_s·n_l)²
    //    numerator overflows BIGINT at ~4e6 rows and needs HUGEINT).
    //    Zero cells contribute 0 (lim x·ln x = 0), so only OBSERVED
    //    (source, lang) pairs participate on both engines. Bounds:
    //    o·n and n_s·n_l double-exact to n ~ 9.5e7 per the 2^53 budget
    //    (beyond that the declared rounding would move to DECIMAL
    //    division); the final DECIMAL(28,6)→DOUBLE cast is exact while
    //    2·Σ o·|lr| < 2^53/10^6. Scale: one groupBy(source, lang)
    //    map-combined to |S|·|L| cells; marginals broadcast; everything
    //    after the combine is constant-size. ─────────────────────────────
    Q("q_gtest_sources",
      """WITH o AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |      FROM documents GROUP BY source, lang),
        |ns AS (SELECT source, CAST(sum(o) AS BIGINT) AS n_s FROM o GROUP BY source),
        |nl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS n_l FROM o GROUP BY lang),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n_all FROM o),
        |term AS (SELECT o.source, o.lang, o.o,
        |        CAST(round(ln((o.o * n_all) /
        |                      CAST(ns.n_s * nl.n_l AS DOUBLE)), 6)
        |             AS DECIMAL(18,6)) AS lr
        |      FROM o JOIN ns ON o.source = ns.source
        |             JOIN nl ON o.lang = nl.lang
        |             CROSS JOIN n)
        |SELECT source, CAST(count(*) AS BIGINT) AS cells,
        |  CAST(2 * sum(o * lr) AS DOUBLE) AS g
        |FROM term GROUP BY source ORDER BY source""".stripMargin) {
      (s, d) =>
        val o = documents(s, d)
          .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val ns = o.groupBy("source").agg(sum(col("o")).as("n_s"))
        val nl = o.groupBy("lang").agg(sum(col("o")).as("n_l"))
        val n = o.agg(sum(col("o")).as("n_all"))
        o.join(broadcast(ns), Seq("source"))
          .join(broadcast(nl), Seq("lang"))
          .crossJoin(broadcast(n))
          .select(col("source"), col("o"),
            round(log((col("o") * col("n_all")) /
              (col("n_s") * col("n_l")).cast("double")), 6)
              .cast("decimal(18,6)").as("lr"))
          .groupBy("source")
          .agg(count(lit(1)).as("cells"),
            (sum(col("o") * col("lr")) * lit(2)).cast("double").as("g"))
          .orderBy("source")
    },

    // ── distinctive vocabulary per source (round 11): top-3 tokens per
    //    source by pointwise mutual information, PMI(w,s) =
    //    ln(c_ws·N / (c_s·c_w)), with a c_ws ≥ 5 support floor (the
    //    standard guard against PMI's low-count explosion). This is the
    //    curation diagnostic q_kl_sources (distribution distance) and
    //    q_gtest_sources (independence test) don't give: WHICH terms make
    //    a source distinctive. Float discipline is q_gtest_sources
    //    verbatim — the ln argument is an exact-integer ratio through one
    //    double division (double-exact while N < 9.5e7; beyond that the
    //    declared rounding moves to DECIMAL division), round to 6; ranking
    //    on the rounded value with tok ASC tiebreak is engine-exact.
    //    Scale: tokenize feeds ONE map-combined groupBy(source, tok) (the
    //    cached |S|·V frame that every marginal reuses — the corpus is
    //    scanned once); c_s/N broadcast, the c_w marginal joins on tok
    //    (both sides |S|·V-bounded, never corpus-sized), and the top-k
    //    window partitions by source over only the support-filtered
    //    terms. ──────────────────────────────────────────────────────────
    Q("q_pmi_terms",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |cws AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_ws
        |        FROM tok GROUP BY 1, 2),
        |cs AS (SELECT source, CAST(sum(c_ws) AS BIGINT) AS c_s
        |       FROM cws GROUP BY 1),
        |cw AS (SELECT tok, CAST(sum(c_ws) AS BIGINT) AS c_w
        |       FROM cws GROUP BY 1),
        |n AS (SELECT CAST(sum(c_ws) AS BIGINT) AS n FROM cws),
        |p AS (SELECT cws.source, cws.tok, cws.c_ws,
        |        round(ln((cws.c_ws * n.n) /
        |                 CAST(cs.c_s * cw.c_w AS DOUBLE)), 6) AS pmi
        |      FROM cws JOIN cs USING (source) JOIN cw USING (tok)
        |           CROSS JOIN n
        |      WHERE cws.c_ws >= 5),
        |r AS (SELECT source, tok, c_ws, pmi,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY pmi DESC, tok ASC) AS rnk
        |      FROM p)
        |SELECT source, rnk::BIGINT AS rnk, tok, c_ws, pmi
        |FROM r WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin) {
      (s, d) =>
        // one corpus scan: the (source, tok) count frame is small
        // (|S|·V-bounded) and feeds all three marginals plus the main leg
        val cws = documents(s, d)
          .select(col("source"), explode(tokens).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c_ws"))
          .cache()
        val cs = cws.groupBy("source").agg(sum(col("c_ws")).as("c_s"))
        val cw = cws.groupBy("tok").agg(sum(col("c_ws")).as("c_w"))
        val n = cws.agg(sum(col("c_ws")).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("pmi").desc, col("tok").asc)
        cws.filter(col("c_ws") >= 5)
          .join(broadcast(cs), Seq("source"))
          .join(cw, Seq("tok"))
          .crossJoin(broadcast(n))
          .select(col("source"), col("tok"), col("c_ws"),
            round(log((col("c_ws") * col("n")) /
              (col("c_s") * col("c_w")).cast("double")), 6).as("pmi"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("source"), col("rnk"), col("tok"), col("c_ws"),
            col("pmi"))
          .orderBy("source", "rnk")
    },

    // ── dataset card (round 11): the one-row-per-source summary a curator
    //    actually reads before mixing — volume (docs/tokens/chars),
    //    exact-dup rate (q_dedup_exact's first-2-token key, within
    //    source), language entropy (the q_gtest ln discipline: round-6
    //    DECIMAL terms, exact weighted sum, ONE final double division),
    //    and the mean hashing-trick classifier score (integer sum through
    //    roundDiv). Everything derives from ONE scan projection — source,
    //    lang, n_chars, token count, dup key, and the classifier score all
    //    ride the same row (the labeledScores compose-don't-join rule) —
    //    feeding two map-combined aggregates: per source and per
    //    (source, lang). At 100 TB this is two wordcount-shaped passes and
    //    an |S|-row join; no windows, no corpus-wide joins. ────────────────
    Q("q_dataset_card",
      s"""WITH $ClassifierScoreCte,
         |d0 AS (SELECT doc_id, source, lang, n_chars,
         |         string_split(text, ' ') AS ts FROM documents),
         |b AS (SELECT d0.source, d0.lang, d0.n_chars,
         |        CAST(len(d0.ts) AS BIGINT) AS n_tok,
         |        md5(array_to_string(d0.ts[1:2], ' ')) AS k, sc.score
         |      FROM d0 JOIN sc ON sc.doc_id = d0.doc_id),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |        CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
         |        CAST(sum(score) AS BIGINT) AS sum_score
         |      FROM b GROUP BY 1),
         |ol AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
         |       FROM b GROUP BY 1, 2),
         |ent AS (SELECT ol.source,
         |        CAST(-sum(ol.o *
         |          CAST(round(ln(ol.o / CAST(p.n_docs AS DOUBLE)), 6)
         |               AS DECIMAL(18,6))) AS DOUBLE) / p.n_docs AS h
         |      FROM ol JOIN per p ON p.source = ol.source
         |      GROUP BY ol.source, p.n_docs)
         |SELECT per.source, per.n_docs, per.n_tokens,
         |  per.sum_chars AS n_chars,
         |  ${roundDivSql("per.n_docs - per.n_keys", "per.n_docs", 6)}
         |    AS dup_rate,
         |  ent.h AS lang_entropy,
         |  ${roundDivSql("per.sum_score", "per.n_docs", 6)} AS mean_score
         |FROM per JOIN ent ON ent.source = per.source
         |ORDER BY per.source""".stripMargin) {
      (s, d) =>
        // one projection carries every per-doc ingredient
        val b = documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"),
            tokens.as("ts"))
          .select(col("source"), col("lang"), col("n_chars"),
            size(col("ts")).cast("long").as("n_tok"),
            md5(array_join(slice(col("ts"), 1, 2), " ")).as("k"),
            scoreOf(col("ts")).as("score"))
        val per = b.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(col("k")).as("n_keys"),
          sum(col("score")).as("sum_score"))
        val ol = b.groupBy("source", "lang").agg(count(lit(1)).as("o"))
        val ent = ol
          .join(broadcast(per.select(col("source"), col("n_docs"))),
            Seq("source"))
          .select(col("source"), col("o"),
            round(log(col("o") / col("n_docs").cast("double")), 6)
              .cast("decimal(18,6)").as("lr"), col("n_docs"))
          .groupBy("source", "n_docs")
          .agg(((sum(col("o") * col("lr")).cast("double") * lit(-1)) /
            col("n_docs").cast("double")).as("h"))
          .select(col("source"), col("h"))
        per.join(ent, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("sum_chars").as("n_chars"),
            graft.ops.Exprs.roundDiv(col("n_docs") - col("n_keys"),
              col("n_docs"), 6).as("dup_rate"),
            col("h").as("lang_entropy"),
            graft.ops.Exprs.roundDiv(col("sum_score"), col("n_docs"), 6)
              .as("mean_score"))
          .orderBy("source")
    },

    // ── bootstrap confidence interval (round 13): the error bar every
    //    corpus statistic should ship with — per source, a 32-replica
    //    half-sample bootstrap of mean document length, CI = the 2.5/97.5
    //    percentile of the replica means. Replica membership is the
    //    engine's determinism rule applied to resampling: doc ∈ replica b
    //    ⇔ md5('bs:'||b||':'||doc_id) is even — reproducible across
    //    engines, runs, and cluster sizes where random() is none of those.
    //    Replica means are exact integer rationals through roundDiv (so
    //    the percentile interpolates over 1e-6-grid doubles — parity
    //    pinned by q_percentile); B=32 is a compile-time constant, so
    //    Spark computes ALL replica sums in ONE corpus pass (64
    //    conditional aggregates, map-side combined: no 32× explode, no
    //    second scan) and unpivots the 32·|S| resulting cells with stack().
    //    The oracle takes the explode+groupBy shape — different plan, same
    //    exact values. Scale: one scan + a |S|-group exchange carrying 64
    //    numbers per source. ──────────────────────────────────────────────
    Q("q_bootstrap_ci",
      s"""WITH r AS (SELECT d.source, b.b, d.n_chars
        |      FROM documents d CROSS JOIN range(0, 32) b(b)
        |      WHERE ('0x' || substr(md5('bs:' || b.b::VARCHAR || ':'
        |              || d.doc_id::VARCHAR), 1, 15))::BIGINT % 2 = 0),
        |m AS (SELECT source, b, ${graft.ops.Exprs.roundDivSql(
             "sum(n_chars)", "count(*)", 6)} AS mean_b
        |      FROM r GROUP BY source, b),
        |f AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        ${graft.ops.Exprs.roundDivSql(
             "sum(n_chars)", "count(*)", 6)} AS mean_full
        |      FROM documents GROUP BY source)
        |SELECT f.source, f.n_docs, f.mean_full,
        |  CAST(count(m.b) AS BIGINT) AS n_replicas,
        |  quantile_cont(m.mean_b, 0.025) AS ci_lo,
        |  quantile_cont(m.mean_b, 0.975) AS ci_hi
        |FROM f JOIN m ON m.source = f.source
        |GROUP BY f.source, f.n_docs, f.mean_full
        |ORDER BY f.source""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.Column
        val B = 32
        def inRep(b: Int): Column =
          (md5Long(concat(lit(s"bs:$b:"), col("doc_id").cast("string")))
            % 2) === 0
        val aggs: Seq[Column] =
          (0 until B).map(b =>
            sum(when(inRep(b), col("n_chars"))).as(s"s$b")) ++
            (0 until B).map(b =>
              count(when(inRep(b), 1)).as(s"c$b")) ++
            Seq(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("s_all"))
        val g = spread(documents(s, d))
          .groupBy("source").agg(aggs.head, aggs.tail: _*)
        val stackExpr = s"stack($B, " + (0 until B)
          .map(b => s"$b, s$b, c$b").mkString(", ") + ") as (b, sb, cb)"
        val means = g.select(col("source"), col("n_docs"), col("s_all"),
            expr(stackExpr))
          .select(col("source"), col("n_docs"), col("s_all"),
            graft.ops.Exprs.roundDiv(col("sb"), col("cb"), 6).as("mean_b"))
          // an EMPTY half-sample replica (P ≈ 2^-n_docs — never at any
          // real size) stacks to a null mean here but simply has no GROUP
          // BY row in the oracle; align the two by dropping it
          .filter(col("mean_b").isNotNull)
        means.groupBy("source", "n_docs", "s_all")
          .agg(count(lit(1)).as("n_replicas"),
            expr("percentile(mean_b, 0.025)").as("ci_lo"),
            expr("percentile(mean_b, 0.975)").as("ci_hi"))
          .select(col("source"), col("n_docs"),
            graft.ops.Exprs.roundDiv(col("s_all"), col("n_docs"), 6)
              .as("mean_full"),
            col("n_replicas"), col("ci_lo"), col("ci_hi"))
          .orderBy("source")
    },

    // ── phrase search over a PERSISTED positional inverted index
    //    (round 13): the IR primitive q_bm25's bag-of-words scoring can't
    //    express — "docs containing these tokens ADJACENTLY". Postings
    //    (doc_id, position, token) are written to parquet (the search-infra
    //    layout; q_ann_persisted's discipline — the probe below reads the
    //    FILES back, so index round-trip fidelity is inside the hash gate)
    //    and phrase matching is the canonical positional join: postings ⋈
    //    postings on (doc_id, p+1 = p). The probed phrase is data-derived —
    //    the corpus's top bigram under the deterministic (count DESC, w1,
    //    w2) order — never a literal. Declared rows: every matching doc
    //    with its occurrence count and first position. Positions cap at
    //    1024 tokens/doc, mirroring q_bpe's documented range(1,1024) bound
    //    (DuckDB range() rejects subquery bounds): both engines ignore
    //    pairs past the cap identically. Scale: the index build is one
    //    narrow pass; the adjacency join co-shuffles both sides on doc_id
    //    once (postings are (doc,pos)-local — never a token-keyed
    //    hot-spot); the top-bigram is a TakeOrdered head and the phrase
    //    probe a 1-row broadcast semi-filter. A serving deployment would
    //    ADDITIONALLY bucket postings by token for term lookups — this
    //    query pins the layout-independent semantics. ──────────────────────
    Q("q_phrase_search",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
        |           FROM documents),
        |post AS (SELECT doc_id, i AS p, ts[i] AS w
        |         FROM t CROSS JOIN range(1, 1025) r(i)
        |         WHERE i <= least(len(ts), 1024)),
        |pr AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, a.p
        |       FROM post a JOIN post b
        |         ON a.doc_id = b.doc_id AND b.p = a.p + 1),
        |top AS (SELECT w1, w2 FROM pr GROUP BY w1, w2
        |        ORDER BY count(*) DESC, w1, w2 LIMIT 1)
        |SELECT pr.doc_id, max(top.w1) AS phrase_w1, max(top.w2) AS phrase_w2,
        |  count(*) AS n_occ, CAST(min(pr.p) AS BIGINT) AS first_pos
        |FROM pr JOIN top ON pr.w1 = top.w1 AND pr.w2 = top.w2
        |GROUP BY pr.doc_id ORDER BY pr.doc_id""".stripMargin) {
      (s, d) =>
        val t = spread(documents(s, d))
          .select(col("doc_id"), slice(tokens, 1, 1024).as("ts"))
        val post = t
          .select(col("doc_id"), posexplode(col("ts")).as(Seq("p0", "w")))
          .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
            col("w"))
        // build-once persisted index: first execution writes the postings,
        // every later one probes the same files with zero write jobs
        val dir = Sinks.buildOnceDir("graft-phrase-index", d)(p =>
          post.write.mode("overwrite").parquet(p))
        val idx = s.read.parquet(dir)
        val pr = idx.as("a")
          .join(idx.as("b"), col("a.doc_id") === col("b.doc_id") &&
            col("b.p") === col("a.p") + 1)
          .select(col("a.doc_id").as("doc_id"), col("a.w").as("w1"),
            col("b.w").as("w2"), col("a.p").as("p"))
        val top = pr.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
          .select("w1", "w2")
        pr.join(broadcast(top), Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(max(col("w1")).as("phrase_w1"), max(col("w2")).as("phrase_w2"),
            count(lit(1)).as("n_occ"), min(col("p")).as("first_pos"))
          .select(col("doc_id"), col("phrase_w1"), col("phrase_w2"),
            col("n_occ"), col("first_pos"))
          .orderBy("doc_id")
    }
  )

  /** The hashing-trick linear model's score as a Column over a projected
    * token-array column `ts` — per-token weight lookup into a literal
    * array folded entirely inside one HOF (no explode, no shuffle —
    * scores at parquet-scan speed). Spark side of [[ClassifierScoreCte]].
    */
  private def scoreOf(ts: Column): Column = {
    val wts: Seq[Long] =
      (0 until 64).map(j => (md5LongLocal(s"qw:$j") % 2001L) - 1000L)
    val bias = md5LongLocal("qw:bias") % 2001L - 1000L
    val wArr = array(wts.map(lit): _*)
    lit(bias) + aggregate(
      transform(ts, x =>
        element_at(wArr,
          (md5Long(concat(lit("fh:"), x)) % 64).cast("int") + 1)),
      lit(0L), (a, v) => a + v)
  }

  /** (doc_id, score) for the inference query. */
  private def classifierScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    spread(documents(s, d))
      .select(col("doc_id"), tokens.as("ts"))
      .select(col("doc_id"), scoreOf(col("ts")).as("score"))

  /** (doc_id, score, pos) for the evaluators — the `lang='en'` label is
    * computed IN THE SAME SCAN as the score: both derive from one
    * `documents` row, so joining a separate label frame back on doc_id
    * (the obvious composition) would shuffle the whole corpus for
    * nothing. Measured: that join read exponent 1.2 at the 100× scale
    * point; this shape removes the corpus-wide exchange entirely.
    */
  private def labeledScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    spread(documents(s, d))
      .select(col("doc_id"), tokens.as("ts"),
        (col("lang") === "en").as("pos"))
      .select(col("doc_id"), scoreOf(col("ts")).as("score"), col("pos"))

  // ───────────────────────── q_logreg_train machinery ──────────────────────
  // LrS itself lives above `all` (the ClassifierScoreCte rule: `all`
  // interpolates the oracle SQL at object init, and a val declared BELOW it
  // would still read 0 there — exactly the bug this comment prevents
  // reintroducing).

  /** (y, f0..f7) per document: label = `lang='en'`, features = token counts
    * in 8 hash buckets over an independent channel `lt:` — eight HOF
    * `filter` passes computed IN the document scan (the labeledScores
    * compose-don't-join rule): no explode, no shuffle, scan-speed at any
    * corpus size.
    */
  private def lrFeat(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val fs = (0 to 7).map { j =>
      size(filter(tokens, x => md5Long(concat(lit("lt:"), x)) % 8 === j))
        .cast("long").as(s"f$j")
    }
    spread(documents(s, d)).select(
      when(col("lang") === "en", 1L).otherwise(0L).as("y") +: fs: _*)
  }

  /** One full-batch pass at the weights carried by the 1-row frame `w`
    * (columns b, w0..w7, fixed-point ×LrS): margin m = b + Σ wⱼfⱼ, the
    * hard-sigmoid surrogate p̂ = clamp(LrS/2 + m/4, 0, LrS) (exact integers —
    * exp()'s last-ULP behavior differs across engines, the piecewise-linear
    * sigmoid doesn't), residual r = p̂ − y·LrS, and ONE aggregate returning
    * the carried weights, n, correct-count at these weights, and the nine
    * gradient sums Σr, Σr·fⱼ accumulated in decimal(38,0) (r ≤ 10⁶, fⱼ ≤
    * tokens/doc, so BIGINT would wrap near 10¹⁰ docs; decimal is exact to
    * ~10³⁰ — DuckDB's HUGEINT sum matches).
    */
  private def lrStep(feat: org.apache.spark.sql.DataFrame,
      w: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = col("b") + (0 to 7).map(j => col(s"w$j") * col(s"f$j"))
      .reduce(_ + _)
    // trunc-toward-zero m/4 (floor on the magnitude — both engines agree)
    val mQ = when(m < 0, -intDivFloor(abs(m), lit(4L)))
      .otherwise(intDivFloor(abs(m), lit(4L)))
    val phat = least(lit(LrS), greatest(lit(0L), lit(LrS / 2) + mQ))
    val r = phat - col("y") * LrS
    val carried = (col("b") +: (0 to 7).map(j => col(s"w$j"))) ++
      (col("y") +: (0 to 7).map(j => col(s"f$j")))
    val aggs: Seq[Column] =
      (max(col("b")).as("b") +:
        (0 to 7).map(j => max(col(s"w$j")).as(s"w$j"))) ++ Seq(
        count(lit(1)).as("n"),
        sum(when((col("m") > 0) === (col("y") === 1L), 1L).otherwise(0L))
          .as("nc"),
        sum(col("r").cast("decimal(38,0)")).as("gb")) ++
        (0 to 7).map(j =>
          sum((col("r") * col(s"f$j")).cast("decimal(38,0)")).as(s"g$j"))
    feat.crossJoin(broadcast(w))
      .select(carried :+ m.as("m") :+ r.as("r"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  // DuckDB rendering of the same training loop, CTE per epoch. sum(BIGINT)
  // is HUGEINT there — the exact-integer twin of the decimal(38,0) route.
  private def lrFeatSql: String =
    "feat AS (SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y, " +
      (0 to 7).map(j =>
        "CAST(len(list_filter(string_split(text, ' '), x -> " +
          s"('0x' || substr(md5('lt:' || x), 1, 15))::BIGINT % 8 = $j)) AS BIGINT) AS f$j")
        .mkString(", ") + " FROM documents)"

  private def lrStepSql(i: Int): String = {
    val margin = "b + " + (0 to 7).map(j => s"w$j * f$j").mkString(" + ")
    val wCols = "b, " + (0 to 7).map(j => s"w$j").mkString(", ")
    s"""a$i AS (SELECT max(b) AS b, ${(0 to 7).map(j => s"max(w$j) AS w$j").mkString(", ")},
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN (m > 0) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       |    sum(r) AS gb, ${(0 to 7).map(j => s"sum(r * f$j) AS g$j").mkString(", ")}
       |  FROM (SELECT y, ${(0 to 7).map(j => s"f$j").mkString(", ")}, $wCols, m,
       |          least(${LrS}, greatest(0, ${LrS / 2} +
       |            (CASE WHEN m < 0 THEN -1 ELSE 1 END) * (abs(m) // 4)))
       |            - y * ${LrS} AS r
       |        FROM (SELECT feat.*, wp.*, $margin AS m
       |              FROM feat CROSS JOIN w${i - 1} wp) s1) s2)""".stripMargin
  }

  private def lrUpdSql(i: Int): String = {
    def upd(g: String, w: String): String =
      s"$w - CAST((CASE WHEN $g < 0 THEN -1 ELSE 1 END) * " +
        s"((2 * abs($g) + 10 * n) // (2 * 10 * n)) AS BIGINT)"
    s"w$i AS (SELECT ${upd("gb", "b")} AS b, " +
      (0 to 7).map(j => upd(s"g$j", s"w$j") + s" AS w$j").mkString(", ") +
      s" FROM a$i)"
  }

  private def lrReportSql(epoch: Int, a: String): String =
    s"SELECT CAST($epoch AS BIGINT) AS epoch, b, " +
      (0 to 7).map(j => s"w$j").mkString(", ") +
      s", nc AS n_correct, ${graft.ops.Exprs.roundDivSql("nc", "n", 6)}" +
      s" AS accuracy FROM $a"
}
