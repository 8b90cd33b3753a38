package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 surfaces (q399+): corpus data-recipe planners — the
  * budget/shape decisions a training-data pipeline makes once the
  * curation ops (dedup, quality, mixture) have produced per-source and
  * per-document statistics. All exact-integer in the house style; the
  * planning algebra runs on AGGREGATED grains (source, quantile bucket,
  * language), so its windows sit on Aggregate-bounded frames — the shape
  * the plan audit's partition-less-Window rule explicitly allows. */
object Analytics5Queries {

  /** Realized q409 stop round — the q386 dynamic-oracle contract
    * ([[Analytics4Queries.realizedOrSentinel]]). */
  private[graft] val mkStopRound =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Convergence-WITNESSED Markov stationary distribution — the q386
    // epsilon-stop discipline applied to a LINEAR-OPERATOR fixpoint
    // (the third kernel class after mass-propagation PageRank/HITS and
    // path-relaxation Bellman-Ford): per-user consecutive event-type
    // transitions build the integer-ppm transition matrix, and the
    // behavior chain's stationary distribution power-iterates from
    // uniform with per-round floor quantization (s div 10⁶ — exact,
    // order-free integer algebra) until the exact L1 residual ≤ 100
    // ppm-units or 30 rounds. The realized stop round parameterizes the
    // dynamically-unrolled oracle, which recomputes the final residual
    // from its own last two iterates — termination is hash-checked.
    // Per-round cost: one key-equi join + one grouped sum on the
    // (types × types) matrix grain — tiny by construction.
    "q409_markov_stationary" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = ev
        .withColumn("nxt", lead(col("event_type"), 1).over(wU))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("i"), col("nxt").as("j"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint(true)
      val p = trans
        .withColumn("ni", sum(col("nij")).over(
          Window.partitionBy(col("i"))))
        .select(col("i"), col("j"), expr("nij * 1000000 div ni").as("p_ppm"))
        .localCheckpoint(true)
      val types = ev.select(col("event_type").as("t")).distinct()
        .localCheckpoint(true)
      val k = types.count()
      var pi = types.select(col("t"), lit(1000000L / k).as("pi_q"))
        .localCheckpoint(true)
      var round = 0
      var lastResid = -1L
      var converged = false
      while (round < 30 && !converged) {
        round += 1
        val sums = pi.join(p, pi("t") === p("i"))
          .groupBy(col("j"))
          .agg(sum(col("pi_q") * col("p_ppm")).as("s"))
        val next = types
          .join(sums, types("t") === sums("j"), "left_outer")
          .select(col("t"),
            coalesce(expr("s div 1000000"), lit(0L)).as("pi_q"))
          .localCheckpoint(true)
        lastResid = next.as("n").join(pi.as("o"), col("n.t") === col("o.t"))
          .agg(sum(abs(col("n.pi_q") - col("o.pi_q"))).as("r"))
          .head().getLong(0)
        converged = lastResid <= 100L
        pi = next
      }
      mkStopRound.set(round)
      pi.withColumn("stop_round", lit(round.toLong))
        .withColumn("final_residual", lit(lastResid))
    }),

    // Token-budget WATERFILLING across sources — the constrained-mixture
    // allocator ("give each source tokens proportional to its quality
    // weight, but never more than it has") behind every data-recipe
    // with per-source caps: alloc_s = min(c_s, λ·w_s) with Σ alloc = B.
    // Exact-integer closed form: order sources by the quantized ratio
    // c·10⁶ div w (the DECLARED order — both engines state it
    // identically), exclusive prefix sums give each row its remaining
    // budget and remaining weight, a row saturates iff spreading the
    // remaining budget over remaining weights already covers its
    // capacity ((B − Cc)·w ≥ c·Wrem — cross-multiplied, division-free),
    // and the capped set is the prefix-AND of that flag (waterfilling's
    // capped set is a ratio-order prefix). Uncapped rows split the
    // residual budget by weight with floor division (Σ alloc ≤ B; the
    // floor residue is declared), clamped to capacity. The fact-scale
    // work is ONE linear per-source rollup; the planning windows touch
    // only the source-grain aggregate.
    // The COMPOSED data recipe — dedup THEN budget (round 12): q419's
    // fingerprint-grain survivor policy feeds q399's waterfilling
    // allocator, so the per-source capacities are SURVIVING tokens only
    // (allocating against raw token counts double-budgets every
    // duplicate — the recipe mistake this surface exists to prevent;
    // compare c here vs q399's c to read each source's dedup haircut).
    // Same scale shape as its parts: one policy window at the
    // fingerprint grain + the source-grain waterfill algebra.
    "q421_dedup_waterfill" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = docs
        .select(col("doc_id"), col("source"),
          text.TextOps.fingerprint(col("text")).as("fp"),
          text.TextOps.tokens(col("text")).as("ts"))
        .select(col("doc_id"), col("source"), col("fp"),
          expr("cast(regexp_extract(source, '([0-9]+)', 1) as int) % 4")
            .cast("long").as("src_tier"),
          size(col("ts")).cast("long").as("n_tok"),
          size(array_distinct(col("ts"))).cast("long").as("n_dist"))
        .withColumn("quality_ppm",
          expr("n_dist * 1000000 div greatest(n_tok, 1L)"))
      val surv = llm.Dedup.clusterSurvivors(m, "fp",
        Seq(col("src_tier").asc, col("quality_ppm").desc,
          col("n_tok").desc, col("doc_id").asc))
      val src = surv.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("c"),
          sum(col("quality_ppm")).as("qsum"))
        .withColumn("w", greatest(lit(1L), expr("qsum div n_docs")))
      llm.Mixture.waterfill(src, "source", budgetNum = 6L, budgetDen = 10L)
        .select(col("source"), col("n_docs"), col("c"), col("w"),
          col("capped"), col("alloc"), col("share_ppm"))
    }),


    "q399_token_waterfill" -> ((s, dir) => {
      val per = Tables.documents(s, dir)
        .select(col("source"), text.TextOps.tokens(col("text")).as("ts"))
        .select(col("source"), size(col("ts")).cast("long").as("n_tok"),
          size(array_distinct(col("ts"))).cast("long").as("n_dist"))
      val src = per.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("c"),
          // per-source quality weight: mean lexical diversity in ppm
          sum(expr("n_dist * 1000000 div greatest(n_tok, 1L)")).as("qsum"))
        .withColumn("w", greatest(lit(1L), expr("qsum div n_docs")))
      // budget = 60% of corpus tokens; the allocation algebra lives in
      // llm.Mixture.waterfill (LawsSpec-pinned against an independent
      // driver-side rational fixpoint)
      llm.Mixture.waterfill(src, "source", budgetNum = 6L, budgetDen = 10L)
        .select(col("source"), col("n_docs"), col("c"), col("w"),
          col("capped"), col("alloc"), col("share_ppm"))
    }),


    // Sequence-length BUCKET planner — the padding-waste read behind
    // length-bucketed batching ("how much compute does padding to the
    // bucket boundary burn?"): documents land in exact-quartile buckets
    // by token length (rank via the distributedRank device — the naive
    // global row_number is what the oracle states), every doc pads to
    // its bucket's max length, and the bucket reports its exact padded
    // vs real token totals and waste ppm. One linear pass + the
    // two-phase rank; the planning grain is 4 rows.
    "q400_padding_buckets" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(text.TextOps.tokens(col("text"))).cast("long").as("len"))
      val ranked = ops.Stats.distributedRank(
        d, "len", tieBreak = Seq("doc_id"), out = "rn",
        bucketWidth = 1L << 8)
      ranked
        .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
        .withColumn("q",
          when(col("rn") * 100 <= col("n") * 25, 25L)
            .when(col("rn") * 100 <= col("n") * 50, 50L)
            .when(col("rn") * 100 <= col("n") * 75, 75L)
            .otherwise(100L))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("len")).as("real_tokens"),
          max(col("len")).as("bucket_len"))
        .withColumn("padded_tokens", col("n_docs") * col("bucket_len"))
        .withColumn("waste_ppm",
          when(col("padded_tokens") > 0, expr(
            "(padded_tokens - real_tokens) * 1000000 div padded_tokens")))
        .select(col("q"), col("n_docs"), col("bucket_len"),
          col("real_tokens"), col("padded_tokens"), col("waste_ppm"))
    }),


    // Inter-rater AGREEMENT (Cohen's kappa) between two deterministic
    // heuristic labelers — the labeling-pipeline read behind "do my
    // quality gates even agree?": rater A = lexical diversity > 1/2
    // (distinct·2 > total tokens), rater B = mean token length ≥ 5
    // chars (n_chars > 5·tokens), per language. The 2×2 contingency is
    // one pass; kappa = (p_o − p_e)/(1 − p_e) carried division-free as
    // kappa_ppm = (po_num·n − pe_num)·10⁶ div (n² − pe_num) with
    // po_num = n11+n00 (×n) and pe_num = marginal products (×n²) —
    // exact integers, NULL when the raters are degenerate (pe = 1).
    "q401_rater_kappa" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("lang"), col("n_chars").cast("long").as("n_chars"),
          text.TextOps.tokens(col("text")).as("ts"))
        .select(col("lang"),
          (size(array_distinct(col("ts"))) * 2 > size(col("ts")))
            .cast("long").as("ra"),
          (col("n_chars") > size(col("ts")).cast("long") * 5L)
            .cast("long").as("rb"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ra") === 1 && col("rb") === 1, 1L).otherwise(0L))
            .as("n11"),
          sum(when(col("ra") === 1 && col("rb") === 0, 1L).otherwise(0L))
            .as("n10"),
          sum(when(col("ra") === 0 && col("rb") === 1, 1L).otherwise(0L))
            .as("n01"),
          sum(when(col("ra") === 0 && col("rb") === 0, 1L).otherwise(0L))
            .as("n00"))
        .withColumn("po_num", col("n11") + col("n00"))
        .withColumn("pe_num",
          (col("n11") + col("n10")) * (col("n11") + col("n01")) +
            (col("n00") + col("n01")) * (col("n00") + col("n10")))
        .withColumn("kappa_ppm",
          when(col("n") * col("n") =!= col("pe_num"),
            expr("(po_num * n - pe_num) * 1000000 div (n * n - pe_num)")))
        .select(col("lang"), col("n"), col("n11"), col("n10"),
          col("n01"), col("n00"), col("kappa_ppm"))
    }),


    // Held-out bigram LM cross-entropy — the EVAL half of the LM-quality
    // family (q115 scores the corpus under a model fit on ITSELF; a real
    // data-quality loop scores held-out text under a model fit on train
    // only): md5 hash split (the q44 rule), add-one-smoothed bigram
    // probabilities p = (cb+1)/(cw1+V+1) from TRAIN counts only (unseen
    // contexts and bigrams degrade gracefully to the uniform floor),
    // per-bigram cost floor-quantized to µnats (one integer-ratio IEEE
    // division + one ln per DISTINCT join row — the q115 portability
    // rule). The fit here is RELATIONAL (count tables), so the whole
    // fit+serve is oracle-stated with no persisted artifact. Scale:
    // count tables are map-side partial aggregations; scoring is two
    // key-equi left joins + one scalar broadcast; no windows.
    "q402_heldout_bigram_xent" -> ((s, dir) => {
      val docs = ml.Models.hashSplit(Tables.documents(s, dir), "doc_id")
      val pairs = docs
        .select(col("doc_id"), col("split"),
          text.TextOps.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("split"),
          explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("split"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val train = pairs.filter(col("split") === "train")
      val cb = train.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cb"))
      val cw1 = train.groupBy(col("w1")).agg(count(lit(1)).as("cw1"))
      val vocab = docs.filter(col("split") === "train")
        .select(explode(text.TextOps.tokens(col("text"))).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      pairs.filter(col("split") === "holdout")
        .join(cb, Seq("w1", "w2"), "left_outer")
        .join(cw1, Seq("w1"), "left_outer")
        .crossJoin(broadcast(vocab))
        .withColumn("q", floor(lit(-1e6) * log(
          (coalesce(col("cb"), lit(0L)).cast("double") + 1.0) /
            (coalesce(col("cw1"), lit(0L)).cast("double") +
              col("v").cast("double") + 1.0))).cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sum_q"))
        .withColumn("xent_q", expr("sum_q div n_bigrams"))
        .select(col("doc_id"), col("n_bigrams"), col("sum_q"),
          col("xent_q"))
    }),


    // Robust outlier detection by MEDIAN/MAD (the heavy-tail-safe
    // z-score — mean/stddev break down exactly on the outliers you are
    // hunting): exact lower median of token length via the
    // distributedRank device, exact MAD (median absolute deviation) via
    // a SECOND rank pass over the deviations, flag docs whose deviation
    // clears 1.5·MAD (2·dev > 3·mad — cross-multiplied, integer-exact;
    // on this bounded-length corpus the classical 3·MAD fence flags
    // nothing, declared). Both medians are exact order statistics
    // (never interpolated); the oracle states both as naive global
    // row_numbers.
    "q410_mad_outliers" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(text.TextOps.tokens(col("text"))).cast("long").as("len"))
      def lowerMedian(df: DataFrame, vCol: String): DataFrame =
        ops.Stats.distributedRank(df, vCol, tieBreak = Seq("doc_id"),
            out = "_rn", bucketWidth = 1L << 8)
          .crossJoin(broadcast(df.agg(count(lit(1)).as("_n"))))
          .filter(col("_rn") === expr("(_n + 1) div 2"))
          .select(col(vCol).as("_m"))
      // the one-row medians ride as keys=[] aggregates (max of the
      // single row — value-identical) so the broadcast stays inside the
      // audited scalar-agg idiom (the q387 BNLJ rule)
      val med = lowerMedian(d, "len").agg(max(col("_m")).as("med"))
      val dev = d.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("len") - col("med")))
      val mad = lowerMedian(dev.select(col("doc_id"), col("dev")), "dev")
        .agg(max(col("_m")).as("mad"))
      dev.crossJoin(broadcast(mad))
        .filter(lit(2L) * col("dev") > lit(3L) * col("mad"))
        .select(col("doc_id"), col("len"), col("med"), col("mad"),
          col("dev"))
    }),


    // Embedding-space label AUDIT: the pairwise centroid-distance matrix
    // over the embeddings table ("are my labels geometrically distinct
    // before I train on them?"). Per-(label, dim) sums of µ-quantized
    // components fold in one pass (map-side partial; the element grid
    // is floor(x·10⁶) — exact both engines on identical stored floats);
    // centroid components divide on the +2·10⁶ OFFSET so the numerator
    // is non-negative and Spark's truncating div == DuckDB's floor //
    // (the q391 non-negative-div parity rule — components here are
    // signed, unlike the ln keys); the label×label distance join runs
    // on the tiny (labels × dims) centroid grain.
    "q408_label_centroids" -> ((s, dir) => {
      val off = 2000000L // |x| <= 2 by contract; quantized offset
      val c = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x").cast("double") * 1e6).cast("long")).as("sq"))
        .withColumn("c_q", expr(s"(sq + n * ${off}L) div n - ${off}L"))
        .select(col("label"), col("dim"), col("c_q"))
      c.as("a").join(c.as("b"), "dim")
        .filter(col("a.label") < col("b.label"))
        .select(col("a.label").as("la"), col("b.label").as("lb"),
          ((col("a.c_q") - col("b.c_q")) *
            (col("a.c_q") - col("b.c_q"))).as("d2"))
        .groupBy(col("la"), col("lb"))
        .agg(count(lit(1)).as("n_dims"), sum(col("d2")).as("dist2_q"))
    }),


    // Vocabulary COVERAGE curve — the tokenizer-budget read ("what share
    // of corpus token instances does a top-k vocab cover?"): term
    // frequencies fold once (map-side partial), the VOCAB grain —
    // aggregated by construction — ranks by (freq desc, term) in one
    // window, and the inclusive frequency prefix at k ∈ {100, 1000,
    // 10000} over the corpus total gives exact coverage ppm. The only
    // windows run on the distinct-term frame; the corpus total attaches
    // as the audited scalar-agg broadcast.
    "q405_vocab_coverage" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(explode(text.TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      val wOrd = Window.orderBy(col("f").desc, col("w").asc)
      val ranked = tf
        .withColumn("rk", row_number().over(wOrd).cast("long"))
        .withColumn("cum_f", sum(col("f")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ranked
        .crossJoin(broadcast(tf.agg(sum(col("f")).as("total_f"),
          count(lit(1)).as("n_terms"))))
        .withColumn("k", explode(array(lit(100L), lit(1000L), lit(10000L))))
        .filter(col("rk") === least(col("k"), col("n_terms")))
        .select(col("k"), col("n_terms"), col("total_f"),
          col("cum_f").as("covered_f"),
          expr("cum_f * 1000000 div total_f").as("coverage_ppm"))
    }),


    // Stratified QUOTA split — the eval-set construction op q44's
    // proportional hash split can't express ("exactly 20 eval docs per
    // language, deterministically"): per-stratum md5-order rank, first
    // `quota` rows are eval, the rest train. The rank is a PARTITIONED
    // window (per-stratum — the grouped-top-k tier, never a global
    // sort); the selection is a pure function of content, so any
    // cluster and the oracle reproduce it bit-for-bit.
    "q403_quota_split" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(text.TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("sk", md5(col("doc_id").cast("string")))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("sk"), col("doc_id"))
      d.withColumn("rk", row_number().over(w))
        .withColumn("split",
          when(col("rk") <= 20, lit("eval")).otherwise(lit("train")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
    }),
  )

  /** q409's dynamically-unrolled oracle: `rounds` power-iteration steps
    * of the same integer-ppm recurrence, final residual recomputed from
    * the oracle's OWN last two iterates (the q386/q397 mechanism). */
  private def markovUnrolledSql(rounds: Int): String = {
    def round(k: Int): String =
      s"""pi$k AS MATERIALIZED (
         |  SELECT ty.t,
         |    CAST(coalesce(s.s // 1000000, 0) AS BIGINT) AS pi_q
         |  FROM ty LEFT JOIN (
         |    SELECT p.j AS t, sum(pi.pi_q * p.p_ppm) AS s
         |    FROM pi${k - 1} pi JOIN p ON pi.t = p.i GROUP BY 1) s
         |    ON ty.t = s.t)""".stripMargin
    """WITH tr AS (
      |  SELECT event_type AS i,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS j
      |  FROM events
      |), tc AS (
      |  SELECT i, j, CAST(count(*) AS BIGINT) AS nij
      |  FROM tr WHERE j IS NOT NULL GROUP BY 1, 2
      |), p AS (
      |  SELECT i, j,
      |    CAST(nij * 1000000 // sum(nij) OVER (PARTITION BY i) AS BIGINT)
      |      AS p_ppm
      |  FROM tc
      |), ty AS (
      |  SELECT DISTINCT event_type AS t FROM events
      |), pi0 AS (
      |  SELECT t, CAST(1000000 // (SELECT count(*) FROM ty) AS BIGINT)
      |    AS pi_q
      |  FROM ty),
      |""".stripMargin +
      (1 to rounds).map(round).mkString(",\n") +
      s""",
         |resid AS (
         |  SELECT CAST(sum(abs(a.pi_q - b.pi_q)) AS BIGINT) AS r
         |  FROM pi$rounds a JOIN pi${rounds - 1} b ON a.t = b.t)
         |SELECT t, pi_q, CAST($rounds AS BIGINT) AS stop_round,
         |  resid.r AS final_residual
         |FROM pi$rounds CROSS JOIN resid""".stripMargin
  }

  /** A def, not a val: the q409 entry embeds the post-run stop round
    * (the [[Analytics4Queries]] dynamic-oracle contract). */
  def sql: Map[String, String] = Map(

    "q409_markov_stationary" ->
      Analytics4Queries.realizedOrSentinel("q409", mkStopRound.get)(
        markovUnrolledSql),

    // the q419 survivor policy chained into the q399 waterfill algebra,
    // both stated verbatim over the surviving-token source rollup
    "q421_dedup_waterfill" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    md5(array_to_string(
        |      regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp,
        |    CAST(CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4
        |      AS BIGINT) AS src_tier,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(
        |        regexp_extract_all(lower(text), '[a-z0-9]+'))) * 1000000
        |      // greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')),
        |                  1) AS BIGINT) AS quality_ppm
        |  FROM documents
        |), rr AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp
        |    ORDER BY src_tier ASC, quality_ppm DESC, n_tok DESC,
        |             doc_id ASC) AS rk
        |  FROM m
        |), surv AS (
        |  SELECT * FROM rr WHERE rk = 1
        |), src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS c,
        |    CAST(sum(quality_ppm) AS BIGINT) AS qsum
        |  FROM surv GROUP BY 1
        |), sw AS (
        |  SELECT *, greatest(1, qsum // n_docs) AS w FROM src
        |), b0 AS (
        |  SELECT *, (SELECT sum(c) FROM sw) * 6 // 10 AS b,
        |    (SELECT sum(w) FROM sw) AS wtot,
        |    c * 1000000 // w AS ratio_q
        |  FROM sw
        |), f AS (
        |  SELECT *,
        |    coalesce(sum(c) OVER (ORDER BY ratio_q, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cc_prev,
        |    wtot - coalesce(sum(w) OVER (ORDER BY ratio_q, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS w_rem
        |  FROM b0
        |), g AS (
        |  SELECT *, CASE WHEN (b - cc_prev) * w >= c * w_rem
        |                 THEN 1 ELSE 0 END AS flag
        |  FROM f
        |), h AS (
        |  SELECT *, min(flag) OVER (ORDER BY ratio_q, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |      AS capped
        |  FROM g
        |), agg AS (
        |  SELECT coalesce(sum(CASE WHEN capped THEN c END), 0) AS cc_star,
        |         coalesce(sum(CASE WHEN NOT capped THEN w END), 0) AS wu_star
        |  FROM h
        |), fin AS (
        |  SELECT source, n_docs, c, w, capped, b,
        |    CASE WHEN capped THEN c
        |         ELSE least(c, greatest(0, b - agg.cc_star) * w
        |                       // agg.wu_star) END AS alloc
        |  FROM h CROSS JOIN agg
        |)
        |SELECT source, n_docs, c, w, capped,
        |  CAST(alloc AS BIGINT) AS alloc,
        |  CAST(CASE WHEN b > 0 THEN alloc * 1000000 // b ELSE 0 END
        |    AS BIGINT) AS share_ppm
        |FROM fin""".stripMargin,

    // the identical division-free waterfilling algebra over the same
    // source-grain rollup; windows and prefix-AND stated verbatim
    "q399_token_waterfill" ->
      """WITH pp AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(regexp_extract_all(lower(text),
        |      '[a-z0-9]+'))) AS BIGINT) AS n_dist
        |  FROM documents
        |), src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS c,
        |    CAST(sum(n_dist * 1000000 // greatest(n_tok, 1)) AS BIGINT)
        |      AS qsum
        |  FROM pp GROUP BY 1
        |), sw AS (
        |  SELECT *, greatest(1, qsum // n_docs) AS w FROM src
        |), b0 AS (
        |  SELECT *, (SELECT sum(c) FROM sw) * 6 // 10 AS b,
        |    (SELECT sum(w) FROM sw) AS wtot,
        |    c * 1000000 // w AS ratio_q
        |  FROM sw
        |), f AS (
        |  SELECT *,
        |    coalesce(sum(c) OVER (ORDER BY ratio_q, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cc_prev,
        |    wtot - coalesce(sum(w) OVER (ORDER BY ratio_q, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS w_rem
        |  FROM b0
        |), g AS (
        |  SELECT *, CASE WHEN (b - cc_prev) * w >= c * w_rem
        |                 THEN 1 ELSE 0 END AS flag
        |  FROM f
        |), h AS (
        |  SELECT *, min(flag) OVER (ORDER BY ratio_q, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |      AS capped
        |  FROM g
        |), agg AS (
        |  SELECT coalesce(sum(CASE WHEN capped THEN c END), 0) AS cc_star,
        |         coalesce(sum(CASE WHEN NOT capped THEN w END), 0) AS wu_star
        |  FROM h
        |), fin AS (
        |  SELECT source, n_docs, c, w, capped, b,
        |    CASE WHEN capped THEN c
        |         ELSE least(c, greatest(0, b - agg.cc_star) * w
        |                       // agg.wu_star) END AS alloc
        |  FROM h CROSS JOIN agg
        |)
        |SELECT source, n_docs, c, w, capped,
        |  CAST(alloc AS BIGINT) AS alloc,
        |  CAST(CASE WHEN b > 0 THEN alloc * 1000000 // b ELSE 0 END
        |    AS BIGINT) AS share_ppm
        |FROM fin""".stripMargin,

    // the naive global row_number formulation of the quartile buckets —
    // the engine's two-phase rank must land on the identical assignment
    "q400_padding_buckets" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS len
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, len,
        |    CAST(row_number() OVER (ORDER BY len, doc_id) AS BIGINT) AS rn,
        |    (SELECT count(*) FROM d) AS n
        |  FROM d
        |), b AS (
        |  SELECT *, CASE WHEN rn * 100 <= n * 25 THEN 25
        |                 WHEN rn * 100 <= n * 50 THEN 50
        |                 WHEN rn * 100 <= n * 75 THEN 75
        |                 ELSE 100 END AS q
        |  FROM r
        |), g AS (
        |  SELECT q, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len) AS BIGINT) AS real_tokens,
        |    CAST(max(len) AS BIGINT) AS bucket_len
        |  FROM b GROUP BY 1
        |)
        |SELECT CAST(q AS BIGINT) AS q, n_docs, bucket_len, real_tokens,
        |  n_docs * bucket_len AS padded_tokens,
        |  CASE WHEN n_docs * bucket_len > 0
        |    THEN CAST((n_docs * bucket_len - real_tokens) * 1000000
        |              // (n_docs * bucket_len) AS BIGINT)
        |    END AS waste_ppm
        |FROM g""".stripMargin,

    // the ENTIRE fit+serve stated relationally: same md5 split, same
    // train-only count tables, same add-one µnat quantization
    "q402_heldout_bigram_xent" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |                   1, 2) AS INT) < 205
        |         THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, split, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM d, unnest(generate_series(1, len(ts) - 1)) AS u(i)
        |  WHERE len(ts) >= 2
        |), cb AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
        |  FROM p WHERE split = 'train' GROUP BY 1, 2
        |), cw1 AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS cw1
        |  FROM p WHERE split = 'train' GROUP BY 1
        |), v AS (
        |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |  FROM (SELECT unnest(ts) AS w FROM d WHERE split = 'train')
        |), h AS (
        |  SELECT p.doc_id,
        |    CAST(floor(-1e6 * ln(
        |      (CAST(coalesce(cb.cb, 0) AS DOUBLE) + 1.0)
        |      / (CAST(coalesce(cw1.cw1, 0) AS DOUBLE)
        |         + CAST(v.v AS DOUBLE) + 1.0))) AS BIGINT) AS q
        |  FROM p
        |  LEFT JOIN cb ON p.w1 = cb.w1 AND p.w2 = cb.w2
        |  LEFT JOIN cw1 ON p.w1 = cw1.w1
        |  CROSS JOIN v
        |  WHERE p.split = 'holdout'
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(q) AS BIGINT) AS sum_q,
        |  CAST(sum(q) // count(*) AS BIGINT) AS xent_q
        |FROM h GROUP BY 1""".stripMargin,

    // both medians as naive global row_numbers (the engine's two-phase
    // rank must land on the identical order statistics)
    "q410_mad_outliers" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS len
        |  FROM documents
        |), m AS (
        |  SELECT len AS med FROM (
        |    SELECT len, row_number() OVER (ORDER BY len, doc_id) AS rn,
        |           (SELECT count(*) FROM d) AS n
        |    FROM d)
        |  WHERE rn = (n + 1) // 2
        |), dv AS (
        |  SELECT doc_id, len, (SELECT med FROM m) AS med,
        |         abs(len - (SELECT med FROM m)) AS dev
        |  FROM d
        |), md AS (
        |  SELECT dev AS mad FROM (
        |    SELECT dev, row_number() OVER (ORDER BY dev, doc_id) AS rn,
        |           (SELECT count(*) FROM dv) AS n
        |    FROM dv)
        |  WHERE rn = (n + 1) // 2
        |)
        |SELECT doc_id, len, med, (SELECT mad FROM md) AS mad, dev
        |FROM dv WHERE 2 * dev > 3 * (SELECT mad FROM md)""".stripMargin,

    // same µ-grid, same offset-div centroid, same pair join — dims are
    // 0-based on both sides (posexplode's ordinal / i - 1)
    "q408_label_centroids" ->
      """WITH x AS (
        |  SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS q
        |  FROM embeddings, unnest(generate_series(1, len(embedding)))
        |    AS u(i)
        |), c AS (
        |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS sq
        |  FROM x GROUP BY 1, 2
        |), cc AS (
        |  SELECT label, dim,
        |    (sq + n * 2000000) // n - 2000000 AS c_q
        |  FROM c
        |)
        |SELECT a.label AS la, b.label AS lb,
        |  CAST(count(*) AS BIGINT) AS n_dims,
        |  CAST(sum((a.c_q - b.c_q) * (a.c_q - b.c_q)) AS BIGINT)
        |    AS dist2_q
        |FROM cc a JOIN cc b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY 1, 2""".stripMargin,

    // identical vocab-grain ranking and prefix; the k grid clamps to the
    // vocab size exactly as the engine does
    "q405_vocab_coverage" ->
      """WITH tf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |          AS w FROM documents)
        |  GROUP BY 1
        |), r AS (
        |  SELECT w, f,
        |    CAST(row_number() OVER (ORDER BY f DESC, w ASC) AS BIGINT)
        |      AS rk,
        |    CAST(sum(f) OVER (ORDER BY f DESC, w ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_f,
        |    (SELECT CAST(sum(f) AS BIGINT) FROM tf) AS total_f,
        |    (SELECT CAST(count(*) AS BIGINT) FROM tf) AS n_terms
        |  FROM tf
        |)
        |SELECT k, n_terms, total_f, cum_f AS covered_f,
        |  CAST(cum_f * 1000000 // total_f AS BIGINT) AS coverage_ppm
        |FROM r, unnest([CAST(100 AS BIGINT), CAST(1000 AS BIGINT),
        |                CAST(10000 AS BIGINT)]) AS u(k)
        |WHERE rk = least(k, n_terms)""".stripMargin,

    // same per-stratum md5-order rank and quota
    "q403_quota_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |      AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents
        |), r AS (
        |  SELECT lang, n_tok,
        |    row_number() OVER (PARTITION BY lang ORDER BY sk, doc_id) AS rk
        |  FROM d
        |)
        |SELECT lang, CASE WHEN rk <= 20 THEN 'eval' ELSE 'train' END
        |         AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM r GROUP BY 1, 2""".stripMargin,

    // identical contingency + division-free kappa ppm
    "q401_rater_kappa" ->
      """WITH d AS (
        |  SELECT lang,
        |    CASE WHEN len(list_distinct(regexp_extract_all(lower(text),
        |           '[a-z0-9]+'))) * 2
        |         > len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        |         THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN n_chars
        |         > len(regexp_extract_all(lower(text), '[a-z0-9]+')) * 5
        |         THEN 1 ELSE 0 END AS rb
        |  FROM documents
        |), g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM d GROUP BY 1
        |)
        |SELECT lang, n, n11, n10, n01, n00,
        |  CASE WHEN n * n <> (n11 + n10) * (n11 + n01)
        |                     + (n00 + n01) * (n00 + n10)
        |    THEN CAST(((n11 + n00) * n
        |               - ((n11 + n10) * (n11 + n01)
        |                  + (n00 + n01) * (n00 + n10))) * 1000000
        |              // (n * n - ((n11 + n10) * (n11 + n01)
        |                          + (n00 + n01) * (n00 + n10)))
        |         AS BIGINT)
        |    END AS kappa_ppm
        |FROM g""".stripMargin,
  )
}
