package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.text.TextOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 re-expressed
  * over the driver fixture tables; [[oracleSql]] carries the DuckDB-runnable
  * ANSI SQL equivalent for the driver's differential check. Column names and
  * types are aligned pairwise (the driver sorts columns by name and hashes
  * values). Floating aggregates use [[Relational.exactSum]] (exact decimal
  * accumulation surfaced as double) so both engines produce bit-identical
  * doubles regardless of aggregation order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's labeling pipeline heart (SURVEY §7.2 slice 0). */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    Relational.labelJoin(Tables.orders(spark, dir), Tables.lineitem(spark, dir))
  }

  // ---------------------------------------------------------------------
  // queries: one per implemented operator from SURVEY.md §2
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    oracleQueries ++ rowsOnlyQueries

  private def oracleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A5 generalized: grouped pricing summary (map-side partial agg)
    "q01_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Tables.lineitem(s, dir))),

    // SURVEY §7.2 slice 0: J3 + P7 + P11 + A2 + J4 (label, distinct, re-attach)
    "q02_label_join" -> ((s, dir) =>
      Relational.labelJoin(Tables.orders(s, dir), Tables.lineitem(s, dir))),

    // J3/J5-shaped dimension chain with broadcast joins
    "q03_dims_rollup" -> ((s, dir) =>
      Relational.dimsRollup(
        Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),

    // J6: theta self-join (equi bucket + inequality residual)
    "q04_theta_pairs" -> ((s, dir) =>
      Relational.thetaPairs(Tables.supplier(s, dir))),

    // J1/J2: left-outer equi join preserving unmatched rows, NULL→0 agg
    "q05_cust_orders" -> ((s, dir) =>
      Relational.customerOrderCounts(Tables.customer(s, dir), Tables.orders(s, dir))),

    // A2: distinct (dedup) on business keys
    "q06_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast("date").as("ship_date"))
        .distinct()),

    // A1/M10: one-pass confusion matrix (vs the reference's 4 scans, lr.scala:51-54)
    "q07_confusion" -> ((s, dir) =>
      Relational.confusionMatrix(
        Tables.events(s, dir)
          .withColumn("label", when(col("event_type") === "purchase", 1).otherwise(0))
          .withColumn("pred", when(col("value") >= 50.0, 1).otherwise(0)),
        "label", "pred")),

    // §2.5 grouped top-k via row_number window
    "q08_topk_orders" -> ((s, dir) =>
      Relational.groupedTopK(
        Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
        .withColumn("rank", col("rank").cast("long"))),

    // J7 as left-semi: customers with ≥1 order (EXISTS)
    "q09_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir); val o = Tables.orders(s, dir)
      Relational.semiJoin(c, o, c("c_custkey") === o("o_custkey"))
        .select(col("c_custkey"), col("c_name"))
    }),

    // J7 as left-anti: customers with no big-ticket order (NOT EXISTS —
    // broadcast stopword-filter semantics, acq_etl_code.scala:34,41)
    "q10_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
      Relational.antiJoin(c, o, c("c_custkey") === o("o_custkey"))
        .select(col("c_custkey"), col("c_name"))
    }),

    // §2.5 set ops: UNION / INTERSECT / EXCEPT with op tags
    "q11_set_ops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      def keys(status: String) =
        o.filter(col("o_orderstatus") === status).select(col("o_custkey")).distinct()
      val f = keys("F"); val oo = keys("O")
      f.union(oo).distinct().select(lit("union").as("op"), col("o_custkey"))
        .union(f.intersect(oo).select(lit("intersect").as("op"), col("o_custkey")))
        .union(f.except(oo).select(lit("except").as("op"), col("o_custkey")))
    }),

    // P12-P15 + M2: tokenize (lower + regex runs) and count, per document —
    // pure projection, no shuffle (acq_etl_code.scala:38-44 semantics)
    "q12_token_stats" -> ((s, dir) =>
      TextOps.tokenStats(Tables.documents(s, dir), "doc_id", "text")),

    // A3 relational core: document frequency with [minDF, maxDF] vocabulary
    // pruning (CountVectorizer minDF/maxDF, acq_etl_code.scala:73)
    "q13_doc_freq" -> ((s, dir) =>
      TextOps.docFreq(Tables.documents(s, dir), "doc_id", "text",
        minDF = 5L, maxDF = 400L)),

    // A3+A4+§2.5 top-k: tf × df → integer-scaled tf-idf score, top-3 terms
    // per doc. Integer DIV keeps the score engine-portable (no float sums).
    "q14_tfidf_topterms" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tf = TextOps.termFreq(docs, "doc_id", "text")
      val df = TextOps.docFreq(docs, "doc_id", "text")
      Relational.groupedTopK(
        tf.join(broadcast(df), "token")
          .withColumn("score", expr("(tf * 1000000) DIV df")),
        Seq("doc_id"), "score", "token", 3)
        .select(col("doc_id"), col("token"), col("tf"), col("score"),
          col("rank").cast("long").as("rank"))
    }),

    // M3 + §2.5 set-op: bigrams/trigrams + distinct union of gram arrays
    // (NGram ×2 + the mergeArrays UDF → array_union, acq_etl_code.scala:56-69)
    // Layered selects materialize each HOF result ONCE per row — inlining
    // them into one nested expression re-evaluated the interpreted ngram
    // lambdas per use and benched ~17x slower at sf0.1.
    "q15_ngram_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
        .select(col("doc_id"), col("ts"),
          TextOps.ngrams(col("ts"), 2).as("bi"), TextOps.ngrams(col("ts"), 3).as("tri"))
        .select(
          col("doc_id"),
          size(col("ts")).cast("long").as("n_uni"),
          size(col("bi")).cast("long").as("n_bi"),
          size(col("tri")).cast("long").as("n_tri"),
          size(TextOps.mergeGrams(col("ts"), col("bi"), col("tri"))).cast("long")
            .as("n_merged"))),

    // North-star near-dedup: MinHash (k=6, md5-portable) -> 3 LSH bands of
    // r=2 -> candidate pairs. Join key is the band bucket, so pair space is
    // sum(bucket^2), never n^2 (llm.Dedup scale notes).
    "q16_near_dedup" -> ((s, dir) =>
      llm.Dedup.candidatePairs(
        llm.Dedup.bandBuckets(Tables.documents(s, dir), "doc_id", "text",
          numHashes = 6, bands = 3, shingleWidth = 3),
        "doc_id")),

    // North-star similarity search, exactness baseline: broadcast 10 query
    // vectors x all candidates, integer-quantized dot product (order-free,
    // engine-portable), top-5 per query.
    "q17_sim_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      llm.Similarity.bruteForceTopK(
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        k = 5)
    }),

    // M7/A5: class-balancing weights as a pure plan (two-scalar agg
    // cross-joined back + when()), lr.scala:11-29 semantics with zero UDFs
    "q18_class_weights" -> ((s, dir) => {
      val labeled = Tables.events(s, dir)
        .withColumn("label", when(col("event_type") === "purchase", 1).otherwise(0))
      ml.Models.withClassWeights(labeled, "label", "weight")
        .groupBy(col("label"), col("weight"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(col("label"), col("n"), col("weight"))
    }),

    // North-star text analysis: function-word score (integer-valued
    // per-mille), punctuation ratio, language guess, quality bucket — all
    // deterministic integer/CASE arithmetic, pure projection
    "q19_doc_quality" -> ((s, dir) => {
      val ts = TextOps.tokens(col("text"))
      val nPunct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(ts).cast("long").as("n_tokens"),
        TextOps.functionWordScore(ts).as("fw_score"),
        when(length(col("text")) > 0,
          floor((nPunct.cast("long") * 1000L) / length(col("text")).cast("long")))
          .otherwise(0L).cast("long").as("punct_score"),
        when(TextOps.functionWordScore(ts) >= 100, "en_like").otherwise("other")
          .as("lang_guess"),
        TextOps.qualityBucket(size(ts)).as("quality"))
    }),

    // North-star exact-dup detection: md5 fingerprint of the canonical
    // token stream + per-fingerprint group size via window count
    "q20_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .withColumn("n_same",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp")))
            .cast("long"))),

    // §2.8 batch form of the streaming tumbling-window aggregate: 1-hour
    // windows over events (the same date_trunc bucketing the streaming
    // surface uses with a watermark)
    "q21_window_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          Relational.exactSum(col("value")).as("sum_value"))),

    // M1: rule-based stemming (the pluggable lemmatizer's default) over the
    // corpus — stem frequency. The rule chain is anchored-suffix regexes,
    // expressible identically in DuckDB's RE2.
    "q29_stem_freq" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("t"))
        .select(text.Stemmer.stemToken(col("t")).as("stem"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)),

    // As-of join (operator Spark lacks; Temporal.asofJoin): each click
    // attaches the most recent prior-or-simultaneous purchase value of the
    // same user. Union + one window pass — never an inequality join.
    "q30_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("last_purchase_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.ops.Temporal.asofJoin(
        clicks, purchases, Seq("user_id"), "ts", Seq("last_purchase_value"))
    }),

    // Range join (point-in-interval; Temporal.rangeJoin): clicks inside the
    // 30-minute window after each purchase, counted per window. Equi join
    // on (user, grain cell) + residual — no inequality-driven cross product.
    "q31_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("lo"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      graft.ops.Temporal
        .rangeJoin(clicks, windows, Seq("user_id"), "ts", "lo", "hi",
          grainSeconds = 1800L)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_clicks"))
    }),

    // North-star token counting: whitespace tokens vs BPE-ish pre-tokens
    // (contractions / letter runs / digit runs / punctuation runs) — both
    // pure projections, regex verified identical across engines.
    "q32_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("""\S+"""), lit(0)))
          .cast("long").as("n_ws"),
        size(TextOps.bpeTokens(col("text"))).cast("long").as("n_bpe"))),

    // North-star token counting, merge-table half: BPE subword units via
    // the native priority merge loop against the pinned DefaultMerges
    // table — unit frequencies over the corpus. The table is
    // rank-consistent, so the priority loop equals applying merges in rank
    // order, which the DuckDB oracle mirrors as nested replaces over a
    // double-space-joined char sequence (exact hash-match, not rows-only).
    "q39_bpe_merges" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(text.Bpe.subwords(col("text"))).as("unit"))
        .groupBy(col("unit"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)),

    // North-star language-ID, char-n-gram form: per-mille of top-English
    // character bigrams — integer arithmetic, IN-list membership. Pure
    // projection, complements the function-word score of q19.
    "q34_lang_bigrams" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.englishBigramScore(col("text")).as("bg_score"))
        .select(col("doc_id"), col("bg_score"),
          when(col("bg_score") >= 80, "en").otherwise("other").as("lang_bg"))),

    // North-star rolling-hash fingerprinting: winnowing (MOSS) over the
    // TOKEN stream — min-hash per sliding window of w=4 over 3-token
    // shingle hashes, then fingerprints shared by ≥2 docs. Guarantee: any
    // shared run of ≥ k+w-1 = 6 tokens is caught. RELATIONAL formulation:
    // native word_shingles → posexplode → codegen'd md5 → window-frame min
    // → distinct; every shingle hashes ONCE, the shuffle carries
    // (doc, pos, hash) triples, the window sort is per-doc-partition.
    // (Character-level winnowing lives in TextOps.winnowFingerprints /
    // native winnow_fps — q36; token granularity costs ~7× fewer digests
    // per doc at the same near-dup power.)
    "q35_winnow" -> ((s, dir) => {
      val w = 4
      val hashes = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.exprapi.wordShingles(TextOps.tokens(col("text")), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n"),
          posexplode(col("sh")).as(Seq("pos", "g")))
        .filter(col("n") >= w) // a full window must fit
        .select(col("doc_id"), col("pos"),
          (col("pos") <= col("n") - w).as("is_start"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
      hashes
        .withColumn("fp", min(col("h")).over(win))
        .filter(col("is_start"))
        .select(col("doc_id"), col("fp")).distinct()
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
    }),

    // North-star similarity, storage-efficiency path: int8 global-scale
    // quantization (floor — bit-identical across engines) + exact integer
    // dot ranking. 4× less candidate bandwidth than float32; scores and
    // ranks are pure integers, so the whole path hash-matches DuckDB.
    "q33_sim_int8" -> ((s, dir) => {
      val q8 = llm.Similarity.quantizeInt8Global(Tables.embeddings(s, dir))
      llm.Similarity.bruteForceTopKInt8(
        q8.filter(col("vec_id") % 50 === 0).select(col("vec_id").as("q_id"), col("qv")),
        q8.select(col("vec_id").as("n_id"), col("qv").as("cv")),
        k = 5)
    }),

    // S3+S6+P10+J1 end-to-end, oracle-checked: parquet → CSV sink →
    // explicit-schema CSV scan → left-outer customer-name join →
    // two-digit-year date parse with the POSIX century pivot. The CSV
    // round trip is the Spark side only; the oracle replays the same
    // format→parse on the parquet directly (DuckDB strptime's %y carries
    // the identical 69/68 pivot), so a hash match proves the round trip
    // lossless AND the pivot semantics equal.
    "q41_csv_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val out = new java.io.File("target/tmp/q41_csv").getAbsolutePath
      sources.Sources.writeCsv(
        Tables.orders(s, dir).select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          date_format(col("o_orderdate"), "MM/dd/yy").as("odate_s")),
        out)
      val back = sources.Sources.csv(s, out,
        StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("odate_s", StringType))),
        header = true)
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"))
      back.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("o_orderkey"), col("c_name"),
          sources.Sources.toDateMMDDYY(col("odate_s")).as("o_date"))
    }),

    // North-star dedup, embedding-space method: exact cosine near-dup
    // pairs over int8-quantized vectors — τ=0.4 as the integer 1600/10⁴.
    // Pure integer predicate ⇒ hash-matches the oracle end to end.
    "q42_emb_neardup" -> ((s, dir) =>
      llm.Similarity.int8NearDupPairs(Tables.embeddings(s, dir), tau2E4 = 1600L)),

    // §2.3 FULL OUTER: completes the join-type inventory — both null
    // sides exercised (rich customers with no orders; ordering customers
    // below the balance cut). Same shuffle shape as the inner join; only
    // the null-extension differs.
    "q51_full_outer" -> ((s, dir) => {
      val rich = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      val counts = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      rich.join(counts, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).cast("long").as("cust_id"),
          col("c_name"), col("n_orders"))
    }),

    // §2.5 CUBE: all four (priority, status) margins in one Expand +
    // map-side-partial hash agg; grouping_id disambiguates super-agg rows
    "q52_cube" -> ((s, dir) =>
      Relational.cubeSummary(
        Tables.orders(s, dir), "o_orderpriority", "o_orderstatus", "o_totalprice")),

    // §2.5 LAG/LEAD: per-customer order history deltas — one shuffle +
    // one sort serves all four window expressions; o_orderkey tie-break
    // makes the sequence total, hence deterministic
    "q53_order_deltas" -> ((s, dir) =>
      ops.Temporal.sequenceDeltas(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice",
        tieBreak = "o_orderkey")
        .select(col("o_orderkey"), col("o_custkey"),
          col("prev_value").as("prev_price"),
          col("next_value").as("next_price"),
          col("value_delta").as("price_delta"),
          col("days_since_prev"))),

    // §2.5 exact co-moment statistics: corr/covar from order-free BIGINT
    // sums (floor-quantized inputs) — bit-reproducible across engines,
    // unlike the streaming double accumulators of the corr() built-in
    "q54_corr_stats" -> ((s, dir) =>
      Relational.intCorrMoments(
        Tables.lineitem(s, dir), "l_returnflag",
        floor(col("l_quantity")), floor(col("l_extendedprice")))),

    // §2.5 GROUPING SETS: the general margin-list form — exactly the
    // margins asked for ((flag,status), (status), ()), nothing more
    "q55_grouping_sets" -> ((s, dir) =>
      Relational.groupingSetsSummary(
        Tables.lineitem(s, dir),
        Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_linestatus"), Seq.empty),
        Seq("l_returnflag", "l_linestatus"),
        "l_quantity")),

    // §2.5 fixed-width histogram: floor-division bucketing + min/max —
    // binned analytics as a pure projection + one hash agg
    "q56_histogram" -> ((s, dir) =>
      Relational.histogram(Tables.orders(s, dir), "o_totalprice", 20000.0)),

    // training-pipeline: deterministic per-language downsampling — the
    // corpus language-mix rebalance as a pure function of doc_id (same
    // decision on any cluster/partitioning/engine, unlike sampleBy's RNG)
    "q59_stratified_sample" -> ((s, dir) =>
      Relational.stratifiedHashSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "es" -> 0.25, "fr" -> 0.1))),

    // training-pipeline: text canonicalization (accent fold + lower +
    // whitespace collapse). The fixture corpus is ASCII, so accented
    // input is constructed deterministically — BOTH precomposed (é) and
    // combining-mark (e + U+0301) forms, exercising the NFD path
    "q60_canonicalize" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        text.TextOps.canonicalizeText(
          // explicit forms: precomposed \u00e9, combining \u0308 (NAÏVE)
          // and \u0301 (étude) — the fold must converge precomposed and
          // NFD inputs; the oracle mixes the forms the other way around
          concat(lit("Caf\u00e9  NAI\u0308VE e\u0301tude:\t"), col("text"))).as("norm_text"))),

    // §2.2 semi-structured extraction: schema'd JSON parse of the props
    // column (from_json — the production form: typed, null on malformed)
    // + integer aggregation. The parse is a pure projection; at scale the
    // win is parsing ONCE into a typed column, not per-expression
    "q66_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))),

    // §2.5 explicit ROWS frames: trailing-3 rolling spend + frame start +
    // forward-3 look, per customer — the row-bounded counterpart of q47's
    // RANGE frame; all four frame expressions share one partitioned sort.
    // Integer-quantized values make every frame sum engine-exact; the
    // trailing average divides two BIGINTs → identical IEEE double.
    "q67_window_frames" -> ((s, dir) =>
      Relational.rowsFrameStats(
        Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice")).cast("long").as("price_i")),
        partCol = "o_custkey", orderCol = "o_orderdate",
        tieBreak = "o_orderkey", valueInt = col("price_i"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("trail_sum"), col("trail_n"),
          (col("trail_sum") / col("trail_n")).as("trail_avg"),
          col("frame_first"), col("ahead_sum"))),

    // §2.3 UNPIVOT: wide→long melt of a per-flag aggregate — the inverse
    // of q49's pivot, as the native Unpivot node (one Expand, no
    // self-union re-scan of the input)
    "q68_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice")).cast("long")).as("sum_price"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("n_rows"), col("sum_qty"), col("sum_price")),
          "metric", "value")),

    // graph analytics: exact-integer PageRank on the customer↔supplier
    // trade graph (parity-disjoint node ids) — 5 fixed BIGINT rounds, so
    // the iterative kernel is hash-checkable against the oracle's
    // unrolled recurrence, not just tolerance-compared
    "q69_pagerank" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      ops.Graph.pageRankInt(edges, iters = 5)
    }),

    // training-pipeline: benchmark decontamination — corpus docs sharing
    // any EXACT word n-gram with the held-out eval split. n=4 here (the
    // production check uses 8–13) because the fixture's ~50-word
    // vocabulary has no 8-gram collisions to find
    "q70_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      llm.Dedup.contaminationReport(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 4)
    }),

    // retrieval: BM25 over a fixed 3-term query — one corpus-stats pass
    // broadcast back, scoring a pure projection; the score ships
    // µ-quantized so the only non-portable bit (ln's last ulp) can't
    // flip the hash
    "q71_bm25" -> ((s, dir) =>
      text.TextOps.bm25(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "join", "fast"))
        .select(col("doc_id"),
          floor(col("bm25") * lit(1000000.0)).cast("long").as("bm25_q"))),

    // §2.5 rank-function family: ntile / percent_rank / cume_dist per
    // priority group — one partitioned window sort serves all three;
    // o_orderkey tie-break keeps rank-derived doubles deterministic
    "q63_rank_family" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    }),

    // §2.2 temporal bucketing: calendar-month rollup (date_trunc), count
    // + exact sum per month — the time-series reporting shape
    "q64_monthly" -> ((s, dir) =>
      Tables.orders(s, dir)
        // month as ISO string: a DATE column round-trips through parquet
        // and the two engines' readers with different physical types —
        // the string form is representation-unambiguous for the compare
        .groupBy(date_format(trunc(to_date(col("o_orderdate")), "month"), "yyyy-MM-dd")
          .as("month"))
        .agg(count(lit(1)).as("n_orders"),
          Relational.exactSum(col("o_totalprice")).as("sum_price"))),

    // J-family: fuzzy name join — edit distance within id-suffix blocks
    // (the reference's exact name joins made typo-tolerant; blocking keeps
    // the pair space Σ bucket², never |C|×|S|)
    "q65_fuzzy_names" -> ((s, dir) =>
      Relational.editDistanceJoin(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
        "c_name", "s_name",
        bucket = name => regexp_extract(name, "([0-9]{2})$", 1),
        maxDist = 7)
        .select(col("c_custkey"), col("s_suppkey"), col("edit_dist"))),

    // training-pipeline: repetition quality signal (Gopher/C4 boilerplate
    // rule) — duplicate trigram fraction per doc; one int-ratio division
    // keeps the double engine-portable
    "q62_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          text.TextOps.duplicateGramStats(col("text"), 3).as("r"))
        .select(col("doc_id"), col("r.n_grams").as("n_tri"),
          col("r.dup_grams").as("dup_tri"), col("r.dup_ratio"))),

    // training-pipeline: PII masking — URLs, emails, phone-shaped runs →
    // typed placeholders. PII is injected deterministically from doc_id
    // (the fixture corpus carries none), same construction in the oracle
    "q61_pii_scrub" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        text.TextOps.scrubPii(concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 555-000-"),
          lpad(col("doc_id").cast("string"), 4, "0"),
          lit(" see https://ex.com/d/"), col("doc_id"))).as("clean_text"))),

    // §2.5 PIVOT: long→wide with an EXPLICIT value list (no
    // distinct-collect planning pass — the production form) — token-count
    // buckets × language counts. Conditional-aggregation mirror in SQL.
    "q49_pivot" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          (size(TextOps.tokens(col("text"))) >= 50).cast("int").as("long_doc"),
          col("lang"))
        .groupBy(col("long_doc"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        // fill ONLY the pivoted value columns — an unscoped fill would also
        // rewrite a NULL grouping key to 0 and diverge from the oracle
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))),

    // §2.5 exact percentiles (the exact counterpart of q37's sketches):
    // sort-based interpolated median — identical (1-d)·a + d·b arithmetic
    // in both engines ⇒ the double hash-matches.
    "q50_median" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          count(lit(1)).as("n"))),

    // §2.5 ROLLUP: per-(region, nation) subtotals + grand total in one
    // Expand + hash agg pass; NULL super-aggregate rows mirror ANSI
    "q48_rollup" -> ((s, dir) =>
      Relational.dimsHierarchy(
        Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))),

    // §2.5 RANGE-frame window (the rolling-aggregate shape tumbling
    // windows can't express: a trailing hour per EVENT, not per bucket) —
    // exact decimal sum inside the frame ⇒ hash-matches the oracle.
    "q47_rolling_hour" -> ((s, dir) =>
      ops.Temporal.rollingStats(Tables.events(s, dir), "user_id", "ts", "value")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("n_win"), col("sum_win"))),

    // S1+P16 end-to-end, oracle-checked: documents staged as REAL text
    // files named <date>_<cik>_doc.txt (driver-side fixture staging, like
    // q41's CSV), then the whole-file binary scan + filename-key parse
    // reads them back; the oracle recomputes the keys and char counts
    // from the parquet directly — a hash match proves the file round trip
    // and the path parsing both exact.
    "q46_corpus_scan" -> ((s, dir) => {
      val sub = Tables.documents(s, dir)
        .filter(col("doc_id") % 10 === 0 && col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .collect() // bounded fixture staging (|docs|/10 small files)
      val base = new java.io.File("target/tmp/q46_corpus")
      if (base.exists()) base.listFiles().foreach(_.delete())
      base.mkdirs()
      sub.foreach { r =>
        val id = r.getLong(0)
        java.nio.file.Files.write(
          new java.io.File(base, s"${20000101L + id}_${id}_doc.txt").toPath,
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      sources.Sources.corpusWithKeys(s, base.getAbsolutePath)
        .select(col("cik").cast("long").as("doc_id"),
          col("report_date_raw"),
          length(col("text")).cast("long").as("n_chars"))
    }),

    // North-star dedup, n-gram Jaccard method oracle-checked end to end:
    // portable md5 LSH candidates (q16's derivation) + exact Jaccard
    // verify over distinct 3-shingle sets. Same int-ratio division on both
    // engines ⇒ the double jaccard column hash-matches too.
    "q45_jaccard_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      llm.Dedup.jaccardVerify(
        docs,
        llm.Dedup.candidatePairs(
          llm.Dedup.bandBuckets(docs, "doc_id", "text",
            numHashes = 6, bands = 3, shingleWidth = 3),
          "doc_id"),
        "doc_id", "text", threshold = 0.5)
    }),

    // Reproducible train/holdout split: content-addressed md5-bucket
    // assignment (partition-layout-independent, unlike randomSplit) +
    // per-split corpus stats. Portable hash ⇒ exact oracle match.
    "q44_hash_split" -> ((s, dir) =>
      ml.Models.hashSplit(Tables.documents(s, dir), "doc_id")
        .select(col("split"), size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))),

    // Dedup survivor selection: connected components over the q16 LSH pair
    // graph — min-label propagation to a fixpoint; every doc in a
    // component labeled with the component's min doc id. Oracle is the
    // same pair SQL + a recursive-CTE transitive closure.
    "q43_dup_clusters" -> ((s, dir) =>
      llm.Dedup.dupClusters(
        llm.Dedup.candidatePairs(
          llm.Dedup.bandBuckets(Tables.documents(s, dir), "doc_id", "text",
            numHashes = 6, bands = 3, shingleWidth = 3),
          "doc_id"))),

    // training-pipeline: GPT-style sequence packing — the corpus token
    // stream concatenated in doc_id order and cut every 512 tokens; per
    // doc its [start,end) offsets and first/last chunk. Two-phase bucketed
    // cumsum (NO single-partition global window — see Packing scaladoc);
    // the oracle states the naive global-window form and hash-matches,
    // proving the parallel decomposition exact.
    "q72_seq_pack" -> ((s, dir) =>
      llm.Packing.packOffsets(
        Tables.documents(s, dir), "doc_id",
        size(TextOps.tokens(col("text"))).cast("long"),
        budget = 512L)),

    // q70 at the beyond-broadcast scale: Bloom sketch over the bench grams
    // pre-prunes the corpus explode before the (non-broadcast) exact join.
    // Same oracle SQL as q70 — the hash match proves the sketch path
    // changes the data movement, not the answer.
    "q73_bloom_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      llm.Dedup.contaminationReportBloom(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", n = 4)
    }),

    // EXACT heavy hitters (tokens with freq > N/100) via Misra–Gries
    // sketch + candidate-only recount — the intermediate sketch is
    // partition-dependent but the output is exact, so it hash-matches a
    // plain HAVING oracle. No full-vocabulary shuffle at any scale.
    "q74_heavy_hitters" -> ((s, dir) =>
      Relational.heavyHitters(
        Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("token")),
        "token", k = 100)),

    // training-pipeline: per-language length gate — keep the longest half
    // of EACH language's docs (distribution-aware quality filtering; a
    // global cutoff right for one language is wrong for another). Exact
    // per-group boundary, deterministic tie-break, one shuffle for both
    // windows.
    "q76_length_gate" -> ((s, dir) =>
      Relational.topFractionPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok")),
        Seq("lang"), "n_tok", "doc_id", fraction = 0.5)),

    // training-pipeline: deterministic k-per-stratum subsample — exactly
    // 20 docs per language, chosen by md5 order (a seeded reservoir
    // equivalent that is a pure function of the key: same pick on any
    // cluster, any partitioning, any engine)
    "q77_group_sample" -> ((s, dir) =>
      Relational.groupedTopK(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("h")),
        Seq("lang"), "h", "doc_id", k = 20, descending = false)
        .select(col("doc_id"), col("lang"))),

    // graph analytics third member: per-vertex TRIANGLE counts on the
    // co-supplier graph (suppliers sharing a high-quantity order) —
    // degree-oriented wedge closure, each triangle found once, wedge work
    // bounded by O(√m) outdegrees (never the hub-vertex C(deg,2) blow-up)
    "q92_triangles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_suppkey"))
      val e = li.alias("x").join(li.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      ops.Graph.triangleCounts(e)
    }),

    // §2.5 distinct aggregation inside time buckets: exact distinct users
    // + event count + exact sum per hour — the dashboard rollup shape
    // (Spark plans COUNT(DISTINCT) as the two-phase Expand rewrite: both
    // phases map-side partial, no per-group set materialization)
    "q90_window_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          Relational.exactSum(col("value")).as("sum_value"))),

    // embedding-space outlier screen: top-10 most-centroid-distant docs
    // per language (misembedded / mislabeled / junk detection). All
    // arithmetic integer-quantized (shift keeps sums positive so DIV and
    // floor-div agree) ⇒ the iterative-free long-form pipeline
    // hash-matches the oracle exactly.
    "q89_emb_outliers" -> ((s, dir) =>
      llm.Similarity.embeddingOutliers(
        Tables.embeddings(s, dir).select(col("vec_id").as("doc_id"), col("embedding")),
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "embedding", "lang", k = 10)),

    // embedding health check: per-DIMENSION stats across the corpus (dead
    // dims, scale drift, NaN screens) — posexplode + one hash agg; the
    // mean uses the exactSum decimal discipline so the float reduction is
    // order-free and hash-portable
    "q88_emb_dim_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n_vec"),
          Relational.exactSum(col("x").cast("double"), scale = 9).as("sum_x"),
          min(col("x")).cast("double").as("min_x"),
          max(col("x")).cast("double").as("max_x"))),

    // tokenizer diagnostics: BPE-unit fertility per language (subword
    // units per whitespace word, exact integer ratio) — what a
    // token-budgeted corpus mix actually pays per language
    "q86_fertility" -> ((s, dir) =>
      text.TextOps.tokenizerFertility(Tables.documents(s, dir), "lang", "text")),

    // quality: per-doc token-distribution ENTROPY (lexical diversity) —
    // per-token µ-quantization before the integer sum keeps the
    // aggregation order-free ⇒ hash-exact oracle (q83's discipline)
    "q87_token_entropy" -> ((s, dir) =>
      text.TextOps.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")),

    // §2.3 temporal family third member: INTERVAL×INTERVAL overlap join
    // (click windows × purchase windows per user) — grain-cell equi
    // decomposition on BOTH sides + pair dedup + residual predicate;
    // never an inequality-only (per-key cross product) join
    "q85_overlap_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id"),
          col("ts").as("c_lo"), (col("ts") + expr("INTERVAL 20 MINUTES")).as("c_hi"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_lo"), (col("ts") + expr("INTERVAL 35 MINUTES")).as("p_hi"))
      graft.ops.Temporal.overlapJoin(clicks, purchases, Seq("user_id"),
          "c_lo", "c_hi", "p_lo", "p_hi", grainSeconds = 1800L)
        .select(col("c_id"), col("p_id"))
    }),

    // dedup END-TO-END: LSH candidates → connected components → QUALITY
    // survivor selection (keep the longest member per cluster, min-id
    // ties) — the full curation pipeline in one query; oracle = q43's
    // recursive-CTE closure + ranked selection
    "q84_survivors" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val clusters = llm.Dedup.dupClusters(
        llm.Dedup.candidatePairs(
          llm.Dedup.bandBuckets(docs, "doc_id", "text",
            numHashes = 6, bands = 3, shingleWidth = 3),
          "doc_id"))
      llm.Dedup.selectSurvivors(clusters,
        docs.select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok")),
        "doc_id", "n_tok")
    }),

    // training-pipeline: CCNet-style perplexity gate — per-doc average
    // negative log-likelihood under the corpus's own unigram distribution.
    // Per-token µ-quantization BEFORE the integer per-doc sum makes the
    // aggregation order-free (a float avg would hash differently per
    // partitioning) ⇒ hash-exact oracle.
    "q83_unigram_nll" -> ((s, dir) =>
      text.TextOps.unigramLogLoss(Tables.documents(s, dir), "doc_id", "text")),

    // similarity, SPARSE lexical path: inverted-index self-join over
    // integer tf/df weights — the embedding-free member of the similarity
    // family (dense: q17/q25/q28/q33/q57/q58). Pair space Σ postings²
    // bounded by the maxDF gate; exact integer dot ÷ IEEE sqrt ⇒
    // hash-matches the oracle.
    "q82_sparse_cosine" -> ((s, dir) =>
      llm.Similarity.sparseCosinePairs(
        Tables.documents(s, dir), "doc_id", "text",
        minCosine = 0.9, minDF = 2L, maxDF = 400L)),

    // training-pipeline: WEIGHTED k-per-language sampling (Efraimidis–
    // Spirakis keyed by a content-addressed uniform) — longer docs more
    // likely picked, the pick a pure function of (doc_id, n_tok); the
    // sampling-family fourth member next to rate (q59), uniform-k (q77)
    // and budget (q80)
    "q81_weighted_sample" -> ((s, dir) =>
      Relational.weightedGroupSample(
        Tables.documents(s, dir), "lang", "doc_id",
        size(TextOps.tokens(col("text"))).cast("long"), k = 15)),

    // retrieval-corpus prep: sliding-window chunking — 32-token windows
    // every 16 tokens per doc with the trailing partial kept; a pure
    // projection + generator, no shuffle. Text re-joined so the oracle
    // hash pins the exact window contents, not just counts.
    "q79_chunking" -> ((s, dir) =>
      llm.Packing.slidingChunks(
        Tables.documents(s, dir), "doc_id",
        TextOps.tokens(col("text")), chunkSize = 32, stride = 16)),

    // corpus mixing by token RECIPE: admit docs per language in md5 order
    // until 2000 tokens are consumed (greedy, ≤1-doc overshoot) — the
    // budget-shaped counterpart of q59's rate-shaped sampling
    "q80_token_budget" -> ((s, dir) =>
      llm.Packing.tokenBudgetSample(
        Tables.documents(s, dir), "lang", "doc_id",
        size(TextOps.tokens(col("text"))).cast("long"), budget = 2000L)),

    // incremental-ingestion dedup: the "daily batch vs existing corpus"
    // shape — every third doc plays the arriving batch, the rest the
    // corpus; only cross-side LSH collisions become candidates, exact
    // Jaccard ≥ 0.5 verifies. Same portable md5 banding as q16/q45, so
    // the whole pipeline (banding, cross join, verify) hash-matches.
    "q78_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      llm.Dedup.incrementalDupMarks(
        docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", threshold = 0.5)
    }),

    // S5/S6 sibling for ORC: orders staged through the ORC sink/scan, then
    // aggregated — the oracle reads the original parquet, so a hash match
    // proves the ORC round trip value-exact (q41's contract, second format)
    "q75_orc_roundtrip" -> ((s, dir) => {
      val out = new java.io.File("target/tmp/q75_orc").getAbsolutePath
      sources.Sources.writeOrc(
        Tables.orders(s, dir).select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          floor(col("o_totalprice")).cast("long").as("price_i")),
        out)
      sources.Sources.orc(s, out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_i")).as("sum_price_i"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    }),

    // M2-M10 end-to-end, SPLIT at the fit/serve boundary: tfidf pipeline ->
    // class weights -> weighted LR (elasticNet .5, reg .03, threshold .68)
    // is the non-portable half and runs once, persisting flat predictions
    // (doc_id, label, prediction, prob) to parquet; the one-pass confusion
    // matrix is pure relational work over that parquet, so the oracle
    // recomputes it in DuckDB from the SAME persisted file and hash-checks
    // it — the fit stays spec-pinned (AUC/threshold specs in ModelsSpec),
    // the aggregation gets a hard oracle row.
    "q23_lr_confusion" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("label", when(col("lang") === "en", 1.0).otherwise(0.0))
      // cache the featurized frame: it feeds the weight stats, the LR fit
      // iterations AND the scoring pass — uncached, the tfidf pipeline
      // transform re-runs per consumer
      val feats = ml.Models.fitTfidf(docs, minDF = 2.0, vocabSize = 1000)
        .transform(docs)
        .select(col("doc_id"), col("label"), col("tfidf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val weighted = ml.Models.withClassWeights(feats, "label")
      val model = ml.Models.fitWeightedLR(weighted, "label")
      val preds = model.transform(weighted).select(
        col("doc_id"), col("label"), col("prediction"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("prob"))
      sources.Sources.writeParquet(preds, predsPath("q23_preds"))
      Relational.confusionMatrix(
        s.read.parquet(predsPath("q23_preds")), "label", "prediction")
    }),

    // M11+M12+J6 end-to-end (predictions.scala complete), same fit/serve
    // split: the LR fit persists flat scored predictions once; positives
    // filter, SIC/10 bucketing, top-k-per-bucket prune and the
    // `ap.prob * tp.prob` pair join (predictions.scala:37) are all pure
    // relational work the oracle replays over the persisted parquet —
    // IEEE-exact double multiply on identical stored bits hash-matches.
    "q27_pair_scoring" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("label", when(col("lang") === "en", 1.0).otherwise(0.0))
        // numeric pseudo-SIC from the source tag, predictions.scala:18 shape
        .withColumn("sic", regexp_extract(col("source"), "(\\d+)", 1).cast("int") * 7 + 3)
      // persisted: the featurized frame feeds the weight stats, the LR fit,
      // the scoring transform AND both sides of the pairing — recomputing
      // the tfidf chain per consumer benched ~2× the whole query
      val feats = ml.Models.fitTfidf(docs, minDF = 2.0, vocabSize = 1000)
        .transform(docs)
        .select(col("doc_id"), col("label"), col("sic"), col("tfidf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val weighted = ml.Models.withClassWeights(feats, "label")
      val model = ml.Models.fitWeightedLR(weighted, "label")
      val preds = model.transform(weighted).select(
        col("doc_id"), col("sic"), col("prediction"),
        element_at(org.apache.spark.ml.functions.vector_to_array(
          col("probability")), 2).as("prob"))
      sources.Sources.writeParquet(preds, predsPath("q27_preds"))
      val scored = pairs.Pairing.scoredPositivesFlat(
        s.read.parquet(predsPath("q27_preds")), "doc_id", "sic")
      pairs.Pairing.pairCandidates(scored, scored, "doc_id", maxPerBucket = 50)
    }),

    // §2.8 streaming, EXECUTED AS A STREAM: the events fixture staged to a
    // file source, drained through session_window under
    // Trigger.AvailableNow in bounded micro-batches (maxFilesPerTrigger
    // forces several, so cross-batch session-state MERGING is on the
    // hash-checked path, not just spec'd), self-terminating when caught
    // up — the backfill pattern where one streaming pipeline serves both
    // replay and live tail. Complete-mode memory sink: session windows
    // only finalize past the watermark in append mode, so a finite drain
    // needs complete mode to emit the tail; the result is the SESSIONS
    // frame (aggregated, driver-sized at any input scale where session
    // counts fit — a production tail uses the parquet sink in append
    // mode and accepts watermark-trailing finalization, StreamsSpec's
    // file-sink test). Oracle = q22's independent gaps-and-islands SQL:
    // a green row means an actual stream execution matched the batch
    // relational semantics bit-for-bit.
    "q93_sessionize_stream" -> ((s, dir) => {
      // streaming event time must be TIMESTAMP (not NTZ) — under the
      // engine's pinned UTC session the cast is lossless, and the session
      // bounds are cast back to NTZ below for oracle/type parity with q22
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q93_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      // staged files are NOT in event-time order, so a live-sized
      // watermark delay would LATE-DROP most of batches 2..n (the
      // watermark races to max(ts)-delay after batch 1). For a bounded
      // backfill drain the watermark's only job is state eviction —
      // which complete mode disables anyway — so span the whole fixture:
      // no late drops, and the drained result equals the batch frame. A
      // live tail keeps the default 2h delay and time-ordered arrival.
      val q = streaming.Streams.sessionize(stream, watermarkDelay = "3650 days")
        .writeStream
        .format("memory").queryName("q93_sessions").outputMode("complete")
        // fresh checkpoint per run: a reused one would see the staged
        // files as already-committed and drain zero batches
        .option("checkpointLocation",
          predsPath(s"q93_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q93_sessions").select(
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("user_id"), col("n_events"))
    }),

    // Bucketed CO-LOCATED join, driver-checked: both fact tables written
    // bucketed on the join key (pay the shuffle once at write time), then
    // joined AND aggregated on that key straight from the bucketed
    // layout — the executed plan has ZERO hash exchanges (PlanAuditSpec):
    // the scan's bucket partitioning serves the join's and the agg's
    // distribution alike. This is the repeatedly-joined-fact story at
    // 100 TB — the shuffle a daily pipeline would otherwise re-pay per
    // run is amortized into the table layout. The oracle replays the
    // join+agg over the ORIGINAL parquet, so a hash match also proves
    // the bucketed round trip value-exact (q41/q75's contract, third
    // layout).
    "q95_bucketed_join" -> ((s, dir) => {
      // the warehouse dir outlives the in-memory catalog across JVM
      // runs — clear stale locations or saveAsTable refuses the name
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
      for (t <- Seq("q95_orders_b", "q95_lineitem_b")) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(new java.io.File(wh.getPath), t)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      sources.Sources.writeBucketed(
        Tables.orders(s, dir).select(
          col("o_orderkey").cast("long").as("o_orderkey"), col("o_orderstatus")),
        "q95_orders_b", Seq("o_orderkey"))
      sources.Sources.writeBucketed(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").cast("long").as("l_orderkey"), col("l_quantity")),
        "q95_lineitem_b", Seq("l_orderkey"))
      s.table("q95_orders_b")
        .join(s.table("q95_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          Relational.exactSum(col("l_quantity")).as("sum_qty"))
    }),

    // North-star near-dedup, throughput path: native minhash_sig
    // expression + xxhash64 banding + exact Jaccard verify. SPLIT at the
    // candidate/verify boundary (the q25 pattern): the xxhash64 banding
    // is the non-portable half and persists its candidate pairs once;
    // the exact n-gram Jaccard — distinct shingle sets, integer
    // intersection/union sizes, one IEEE division, threshold — is
    // replayed by the oracle over the persisted ids (q45's scoring SQL
    // over stored pairs), so the verify stage of the 100-TB dedup path
    // is hash-checked and only the hash family stays spec-pinned.
    "q24_near_dedup_fast" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cands = llm.Dedup.candidatePairs(
        llm.Dedup.bandBucketsFast(docs, "doc_id", "text"), "doc_id")
      sources.Sources.writeParquet(cands, predsPath("q24_cands"))
      llm.Dedup.jaccardVerify(docs, s.read.parquet(predsPath("q24_cands")),
        "doc_id", "text", threshold = 0.5)
    }),

    // similarity SERVING path: q58's index persisted in its disk layout
    // (entries partitioned by cell + centroids + codebook meta), loaded
    // back, and probed FROM THE PERSISTED FILES — the build-once/
    // probe-forever shape a 100-TB deployment runs. The probe joins the
    // partitioned entries scan against the broadcast probe side, so
    // dynamic partition pruning restricts the scan to the probed cells'
    // directories at runtime (executed-plan-audited in SimilaritySpec:
    // nprobe=2 ⇒ ≤2 of nlist=16 partitions read). SPLIT at the
    // shortlist/re-rank boundary: the codebook-dependent ADC prune
    // persists its (q_id, n_id) shortlist and the unit vectors persist
    // once; the exact re-rank — quantized dots over stored float bits +
    // top-k with total-order tie-break — is replayed by the oracle over
    // the same files, so the serving path's FINAL ranking is
    // hash-checked, not just recall-spec'd.
    "q94_ivfpq_serving" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cands = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val idx = llm.Similarity.fitIvfPqIndex(
        cands, nlist = 16, m = 8, kc = 16, persistEntries = false)
      llm.Similarity.writeIvfPqIndex(idx, predsPath("q94_ivfpq_index"))
      val loaded = llm.Similarity.loadIvfPqIndex(s, predsPath("q94_ivfpq_index"))
      val queries = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val sl = llm.Similarity.ivfPqShortlist(
        loaded, queries, k = 5, nprobe = 4, rerankFactor = 4)
      sources.Sources.writeParquet(sl, predsPath("q94_shortlist"))
      sources.Sources.writeParquet(
        llm.Similarity.unitVectors(e), predsPath("q94_units"))
      llm.Similarity.exactRerankFromUnits(
        s.read.parquet(predsPath("q94_units")),
        s.read.parquet(predsPath("q94_shortlist")), k = 5)
    }),

    // North-star similarity, scale path: sign-LSH cosine candidate pairs
    // (bucket-local joins, exact re-score on candidates only). Floor 0.3
    // because the fixture embeddings are near-random (max pairwise cosine
    // ≈ 0.6 at sf0.1) — a higher floor returns an empty, meaningless
    // result. bits is AUTO (ceil(log2(n/targetBucketSize))): the bucket
    // count tracks the corpus, so this config never enters the quadratic
    // regime at a bigger sf — the 100-TB-safe default, not a demo
    // constant. SPLIT at the candidate/verify boundary (the q23/q27
    // pattern): the hyperplane hashing is the non-portable half and
    // persists its candidate pairs once; the exact verify — per-element
    // floor products, integer sums, IEEE division/sqrt, threshold — is
    // replayed by the oracle over the persisted ids, so the scoring
    // stage is hash-checked, not just recall-spec'd.
    "q25_sim_lsh" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val n = e.agg(count(lit(1))).head().getLong(0)
      val cands = llm.Similarity.signLshCandidates(
        e, bits = llm.Similarity.autoBits(n, 256), tables = 8)
      sources.Sources.writeParquet(cands, predsPath("q25_cands"))
      llm.Similarity.exactCosineVerify(
        e, s.read.parquet(predsPath("q25_cands")), minCosine = 0.3)
    }),

    // §2.8 streaming #2, EXECUTED AS A STREAM: watermarked tumbling-window
    // aggregation (count + exact decimal-accumulated sum) drained under
    // Trigger.AvailableNow — q93's harness applied to the time-window
    // family, so both streaming aggregation shapes (merging session state,
    // fixed windows) carry driver-checked rows. Same fixture-spanning
    // watermark rationale as q93 (unordered backfill files must not
    // late-drop); oracle = q21's independent date_trunc formulation.
    "q98_tumbling_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q98_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val q = streaming.Streams
        .tumblingAgg(stream, watermarkDelay = "3650 days")
        .writeStream
        .format("memory").queryName("q98_windows").outputMode("complete")
        .option("checkpointLocation",
          predsPath(s"q98_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q98_windows").select(
        col("window_start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
    }),

    // §2.8 streaming #3, EXECUTED AS A STREAM: the CUSTOM-KEYED-STATE
    // primitive (flatMapGroupsWithState) — cumulative per-user totals
    // folded across micro-batches, drained under AvailableNow in update
    // mode. Every micro-batch emits each touched user's running total;
    // n_events is strictly monotone per user, so max(n_events) is the
    // completed fold, and being an integer it oracle-compares exactly
    // (the double total_value stays spec-pinned — a cross-batch float
    // fold's addition ORDER is execution-dependent, which is precisely
    // why the hash-checked column is the count). Oracle = plain
    // per-user COUNT over events: a hash match proves arbitrary keyed
    // state executed across batches loses and duplicates nothing.
    "q99_keyed_state_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q99_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val q = streaming.Streams.runningUserTotals(stream)
        .writeStream
        .format("memory").queryName("q99_totals").outputMode("update")
        .option("checkpointLocation",
          predsPath(s"q99_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q99_totals")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"))
    }),

    // §2.8 streaming #5, EXECUTED AS A STREAM: SLIDING windows (width 1 h,
    // slide 30 min — every event lands in exactly two overlapping
    // windows), drained under AvailableNow in complete mode. Closes the
    // last window SHAPE that only had a batch-equivalence spec; oracle =
    // an independent two-candidate-starts unnest per event.
    "q105_sliding_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q105_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val q = streaming.Streams
        .slidingAgg(stream, width = "1 hour", slide = "30 minutes",
          watermarkDelay = "3650 days")
        .writeStream
        .format("memory").queryName("q105_sliding").outputMode("complete")
        .option("checkpointLocation",
          predsPath(s"q105_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q105_sliding").select(
        col("window_start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"))
    }),

    // §2.8 streaming #6, EXECUTED AS A STREAM: watermark-bounded DEDUP
    // (dropDuplicatesWithinWatermark) — first occurrence per
    // (user_id, event_type) wins, one row emitted per key across the
    // whole multi-batch drain. The output projects to the KEY columns:
    // which physical row arrives first is execution-order-dependent, the
    // key set is not — that projection is what makes a streaming dedup
    // hash-checkable at all. Oracle = the distinct key set; a hash match
    // proves cross-batch dedup state lost and duplicated nothing.
    "q106_dedup_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q106_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val q = streaming.Streams
        .dedupWithinWatermark(stream,
          keyCols = Seq("user_id", "event_type"),
          watermarkDelay = "3650 days")
        .select(col("user_id"), col("event_type"))
        .writeStream
        .format("memory").queryName("q106_keys").outputMode("append")
        .option("checkpointLocation",
          predsPath(s"q106_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q106_keys")
    }),

    // §2.8 streaming #7, EXECUTED AS A STREAM: stream-STATIC enrichment —
    // the streaming mirror of the J5 broadcast dimension join. The static
    // customer side is re-read per micro-batch and carries no state; the
    // drained rows are exactly the batch left join (event_id is unique, so
    // the result is deterministic row-for-row, unlike q106's key
    // projection). Completes the driver-checked streaming family: every
    // Streams operator except the order-dependent near-dup marker now has
    // a CORRECTNESS row that executed as a stream.
    "q107_enrich_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q107_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"),
          col("c_mktsegment"), col("c_nationkey"))
      val stream = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val q = streaming.Streams.enrichWithDim(stream, dim, "user_id")
        .select(col("event_id"), col("user_id"),
          col("event_type"), col("c_mktsegment"), col("c_nationkey"))
        .writeStream
        .format("memory").queryName("q107_enriched").outputMode("append")
        .option("checkpointLocation",
          predsPath(s"q107_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q107_enriched")
    }),

    // §2.8 streaming #4, EXECUTED AS A STREAM: the stream-stream
    // watermarked JOIN — two independent file streams over the same
    // staged events (clicks side, purchases side), matched on user within
    // the 1-hour attribution horizon, drained under AvailableNow in
    // append mode. Inner-join matches emit as they form (the watermark
    // only bounds state eviction), and the fixture-spanning delay keeps
    // ALL state live across the unordered backfill batches, so the
    // drained rows are exactly the batch join — oracle = the plain
    // interval-join SQL (q31's shape with the roles flipped). Completes
    // the driver-checked streaming family: windows (q98), sessions
    // (q93), keyed state (q99), joins (here).
    "q102_join_stream" -> ((s, dir) => {
      val batchEv = Tables.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
      val stage = predsPath("q102_events")
      sources.Sources.writeParquet(batchEv.repartition(4), stage)
      def src = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", "2").parquet(stage)
      val joined = streaming.Streams.clickPurchaseJoin(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"),
        horizon = "1 hour", watermarkDelay = "3650 days")
      val q = joined.writeStream
        .format("memory").queryName("q102_pairs").outputMode("append")
        .option("checkpointLocation",
          predsPath(s"q102_ckpt_${System.nanoTime()}"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "AvailableNow stream must drain")
      s.table("q102_pairs").select(
        col("click_id"), col("user_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"),
        col("purchase_id"),
        col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
        col("purchase_value"))
    }),

    // Skew-salted join, driver-checked: the hot-key mitigation (spread the
    // left side over saltFactor sub-keys, replicate the right side once
    // per sub-key) must be RESULT-INVISIBLE — the oracle replays the
    // plain join, so a hash match proves salting changes the schedule,
    // never the answer. The salt comes from monotonically_increasing_id:
    // any instance assignment is correct, which is exactly why the result
    // is partition-independent.
    "q96_salted_join" -> ((s, dir) =>
      Relational.saltedJoin(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")),
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus")),
        "l_orderkey", "o_orderkey", saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          Relational.exactSum(col("l_quantity")).as("sum_qty"))),

    // Asymmetric CONTAINMENT decontamination: flag corpus docs holding
    // ≥ threshold of an eval doc's distinct 4-gram shingles — the metric
    // for the short-eval-item-inside-long-train-doc regime where
    // union-normalized Jaccard (q45) under-triggers (DedupSpec pins the
    // 1.0-vs-low separation on an embedded item). Same bench/corpus split
    // convention as q70's exact-gram stage; the ratio is one IEEE
    // int-ratio division. Threshold is fixture-calibrated: the synthetic
    // docs contain no planted contamination (max pairwise containment
    // ≈ 0.045 at sf0.01), so a production-style 0.6 gate would make this
    // a trivially-empty frame — 0.02 keeps tens of rows flowing through
    // every stage of the checked pipeline.
    "q97_containment" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      llm.Dedup.containmentMarks(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text", threshold = 0.02, shingleWidth = 4)
    }),

    // SemDeDup-style SEMANTIC dedup (north-star dedup family, the
    // embedding-space scale path): coarse KMeans cells block the pair
    // space — compare only WITHIN a cell, the embedding analogue of q16's
    // LSH bands — then the q42 exact-integer cosine predicate marks
    // near-dups and the lower-id survivor rule keeps one per
    // neighborhood. SPLIT at the fit/serve boundary (the q23/q27
    // pattern): the KMeans fit is the non-portable half and persists its
    // (vec_id, cell) assignments once; the serving half — int8
    // quantization, cell-equi-join pairing, decimal threshold test, anti
    // join — is replayed by the oracle over the same stored assignments,
    // so the dedup DECISIONS are hash-checked end-to-end. τ = 0.4
    // (tau2E4 = 1600) matches q42, so q42 (all-pairs exact) is this
    // query's recall baseline: any pair q42 finds whose members share a
    // cell must be re-found here.
    // similarity scale path #3: product quantization — the ADC scan reads
    // m-code compressed vectors (16-32× less bandwidth than raw floats),
    // exact re-rank touches only k·rerankFactor rows per query. SPLIT at
    // the shortlist/re-rank boundary (the q94 pattern): the
    // codebook-dependent ADC prune persists its (q_id, n_id) shortlist
    // and the unit vectors persist once; the exact re-rank is replayed by
    // the oracle over the same files — identical frame to the one-shot
    // pqTopK, now hash-checked.
    "q57_sim_pq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val idx = llm.Similarity.fitPqIndex(
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        m = 8, kc = 16, persistCodes = false)
      sources.Sources.writeParquet(
        llm.Similarity.pqShortlist(idx,
          e.filter(col("vec_id") % 50 === 0)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          k = 5, rerankFactor = 4),
        predsPath("q57_shortlist"))
      sources.Sources.writeParquet(
        llm.Similarity.unitVectors(e), predsPath("q57_units"))
      llm.Similarity.exactRerankFromUnits(
        s.read.parquet(predsPath("q57_units")),
        s.read.parquet(predsPath("q57_shortlist")), k = 5)
    }),

    // similarity scale path #4: IVFPQ — cell pruning × code compression
    // multiply (FAISS's corpus-scale workhorse). The stateless harness
    // slot forces fit+probe in one call; serving holds the IvfPqIndex
    // and calls ivfPqProbe per batch (reuse pinned by SimilaritySpec).
    // Same shortlist/re-rank split as q57/q94 — the in-memory-index twin
    // of q94's persisted-layout serving path, hash-checked the same way.
    "q58_sim_ivfpq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cands = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val idx = llm.Similarity.fitIvfPqIndex(
        cands, nlist = 16, m = 8, kc = 16, persistEntries = false)
      sources.Sources.writeParquet(
        llm.Similarity.ivfPqShortlist(idx,
          e.filter(col("vec_id") % 50 === 0)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
          k = 5, nprobe = 4, rerankFactor = 4),
        predsPath("q58_shortlist"))
      sources.Sources.writeParquet(
        llm.Similarity.unitVectors(e), predsPath("q58_units"))
      llm.Similarity.exactRerankFromUnits(
        s.read.parquet(predsPath("q58_units")),
        s.read.parquet(predsPath("q58_shortlist")), k = 5)
    }),

    // North-star similarity, scale path #2: cosine IVF — KMeans coarse
    // quantizer, nprobe cell probing, exact re-rank within cells only.
    // SPLIT at the candidate/re-rank boundary (the q94 pattern, applied to
    // the plain-IVF path): the codebook-dependent probe selection persists
    // its (q_id, n_id) candidate pairs and the unit vectors persist once;
    // the exact re-rank — quantized dots over stored float bits + top-k
    // with total-order tie-break — is replayed by the oracle over the same
    // files. Result is IDENTICAL to the one-shot ivfTopK (same candidates,
    // same scores, same tie-break), now hash-checked.
    "q28_sim_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val idx = llm.Similarity.fitIvfIndex(
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        nlist = 16, persistCells = false)
      val queries = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      sources.Sources.writeParquet(
        llm.Similarity.ivfCandidatePairs(idx, queries, nprobe = 4),
        predsPath("q28_cands"))
      sources.Sources.writeParquet(
        llm.Similarity.unitVectors(e), predsPath("q28_units"))
      llm.Similarity.exactRerankFromUnits(
        s.read.parquet(predsPath("q28_units")),
        s.read.parquet(predsPath("q28_cands")), k = 5)
    }),

    // Z-order clustered layout (the multi-column data-skipping lever):
    // write the fact slice clustered on the Morton interleave of
    // min-max-scaled (l_partkey, l_suppkey), read it back from the
    // clustered files, and return each row's z-value recomputed over the
    // round-tripped rows. Scaling and interleave are IEEE-exact double ops
    // + pure bit arithmetic — the oracle recomputes them bit-for-bit —
    // and the round trip proves the layout write loses/duplicates
    // nothing. The LAYOUT property itself (pruning-grade min/max bands on
    // BOTH dimensions, vs a plain sort's one) is pinned by SourcesSpec.
    "q101_zorder" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
      sources.Sources.writeZOrdered(li, predsPath("q101_zli"),
        Seq("l_partkey", "l_suppkey"), bits = 16, numFiles = 8)
      val back = s.read.parquet(predsPath("q101_zli"))
      val stats = back.agg(
        min(col("l_partkey")).cast("double").as("pmin"),
        max(col("l_partkey")).cast("double").as("pmax"),
        min(col("l_suppkey")).cast("double").as("smin"),
        max(col("l_suppkey")).cast("double").as("smax"))
      back.crossJoin(broadcast(stats))
        .select(col("l_orderkey"), col("l_linenumber"),
          sources.Sources.mortonCode(Seq(
            sources.Sources.scaleToBits(col("l_partkey"), col("pmin"), col("pmax"), 16),
            sources.Sources.scaleToBits(col("l_suppkey"), col("smin"), col("smax"), 16)),
            bits = 16).as("zval"))
    }),

    "q100_semantic_dedup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      // nlist tracks the corpus (FAISS-style n/targetCellSize, floor 16 —
      // q25's autoBits rationale): per-cell population stays ~256 at any
      // SF, so the Σ|cell|² pair space never re-enters the quadratic
      // regime a bigger corpus would otherwise create
      val n = e.agg(count(lit(1))).head().getLong(0)
      val idx = llm.Similarity.fitIvfIndex(
        e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        nlist = math.max(16, (n / 256L).toInt), persistCells = false)
      sources.Sources.writeParquet(
        idx.cells.select(col("n_id").as("vec_id"), col("cell")),
        predsPath("q100_cells"))
      llm.Dedup.semanticDedup(
        s.read.parquet(predsPath("q100_cells")), e, tau2E4 = 1600L)
    }),

    // training-pipeline: cross-document duplicated-SPAN coverage (the
    // Lee-et-al substring-dedup signal, approximated with rolling 8-grams
    // + gaps-and-islands interval union). Span-level complement of the
    // doc-level dedup family q06/q16/q40/q100.
    "q103_dup_spans" -> ((s, dir) =>
      llm.Dedup.dupSpanCoverage(
        Tables.documents(s, dir), "doc_id", "text", l = 8, minDocs = 2)),

    // training-pipeline: DSIR importance weights — every doc scored by the
    // unigram log-likelihood ratio of target (lang='en') vs the raw pool,
    // deterministic top-50 selection; the data-MIXTURE member of the
    // curation family (sampling: q59/q77/q80/q81; quality: q19/q76).
    "q104_dsir_weights" -> ((s, dir) =>
      llm.Dsir.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
        col("lang") === "en", k = 50)),

    // MERGE/upsert for plain-parquet tables (read-join-rewrite — the
    // primitive every transactional format builds on): a deterministic
    // synthetic change set derived from orders itself — status updates
    // (keys %7), brand-new keys (%13, offset +1e8), and a CONFLICTING
    // second version for %21 keys that must lose to last-writer-wins.
    "q108_merge_upsert" -> ((s, dir) =>
      Relational.upsert(ordersSnapshot(s, dir), ordersChangeSet(s, dir),
        Seq("o_orderkey"), orderCol = "ver", tieCol = "o_orderstatus")),

    // CDC derivation: recover the change feed between the base snapshot
    // and the merged+pruned successor — inserts from the new-key branch,
    // updates from the %7 status rewrite, deletes from the %11 prune.
    "q111_snapshot_diff" -> ((s, dir) => {
      val base = ordersSnapshot(s, dir)
      val next = Relational.upsert(base, ordersChangeSet(s, dir),
          Seq("o_orderkey"), orderCol = "ver", tieCol = "o_orderstatus")
        .filter(col("o_orderkey") % 11 =!= 5)
      Relational.snapshotDiff(base, next, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
    }),

    // distance-≤1 fuzzy self-pairing with NO blocking key (deletion
    // neighborhoods, full-recall pigeonhole) — the generic form of q65's
    // domain-bucketed editDistanceJoin
    "q110_deletion_join" -> ((s, dir) =>
      Relational.deletionJoinPairs(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name")),

    // Spark-4 native XML source round trip (format("xml") is built into
    // spark-sql 4.x): write orders as <order> rows, read back with an
    // explicit schema — the oracle reads the ORIGINAL table, so the hash
    // match pins writer+parser inverse-ness incl. exact double round trip
    // (shortest-repr write, exact parse)
    "q124_xml_roundtrip" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      val stage = predsPath("q124_xml")
      o.write.mode("overwrite").format("xml")
        .option("rootTag", "orders").option("rowTag", "order").save(stage)
      s.read.format("xml").option("rowTag", "order")
        .schema(o.schema).load(stage)
    }),

    // Spark-4 VARIANT path for semi-structured columns: parse_json once,
    // typed variant_get extraction — the open-schema twin of q66's
    // fixed-schema from_json (the 100 TB-relevant difference: VARIANT
    // keeps the full document queryable without committing to a schema
    // at write time)
    "q125_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))),

    // A6/A7 with a hard oracle row, via the q23/q27 fit/serve split: the
    // LDA fit (non-portable treeAggregate loop) runs once and persists the
    // FULL flattened topic-term matrix (model-sized: k × vocab); the
    // describeTopics top-k is then pure relational work — per-topic window
    // top-5 by weight, term_idx tie-break for engine-identical order —
    // that DuckDB replays over the same stored doubles.
    "q126_lda_topics" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pipe = ml.Models.fitTfidf(docs, minDF = 2.0, vocabSize = 1000)
      val vocab = pipe.stages.collectFirst {
        case m: org.apache.spark.ml.feature.CountVectorizerModel => m
      }.get.vocabulary
      val feats = pipe.transform(docs).select(col("doc_id"), col("tfidf"))
      val lda = ml.Models.fitLDA(feats, k = 20)
      sources.Sources.writeParquet(
        ml.Models.topicTermRows(s, lda, vocab), predsPath("q126_topics"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("topic"))
        .orderBy(col("weight").desc, col("term_idx").asc)
      s.read.parquet(predsPath("q126_topics"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("topic"), col("rn"), col("term_idx"), col("term"),
          col("weight"))
    }),

    // §2.8 streaming #8, EXECUTED AS A STREAM: CDC apply — the q108
    // change set delivered as micro-batches, folded into a key-bucketed
    // partitioned table via foreachBatch + upsertVersioned, each batch
    // reading and dynamically overwriting ONLY the kb= partitions its
    // keys hash into (the 100 TB write-amplification fix; the
    // snapshot-chain variant stays spec-covered in StreamsSpec). The
    // per-key (ver, tie) max makes the fold independent of batch
    // boundaries and arrival order, so the drained final table must
    // hash-match the ONE-SHOT batch merge oracle.
    "q122_cdc_stream" -> ((s, dir) => {
      val base = ordersSnapshot(s, dir).withColumn("ver", lit(0))
      val changes = ordersChangeSet(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("ver"))
      val root = predsPath(s"q122_root_${System.nanoTime()}")
      sources.Sources.writeKeyBucketed(base, s"$root/table",
        Seq("o_orderkey"), nBuckets = 16)
      sources.Sources.writeParquet(changes.repartition(4), s"$root/changes")
      streaming.Streams.cdcApplyPartitioned(s, s"$root/changes",
          changes.schema, s"$root/table", Seq("o_orderkey"),
          orderCol = "ver", tieCol = "o_orderstatus", nBuckets = 16)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    }),

    // small-file compaction round trip: 64-way fragmented lineitem
    // rewritten as 4 range-sorted files — content identical (oracle reads
    // the ORIGINAL table), layout assertions in SourcesSpec
    "q123_compaction" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      sources.Sources.writeParquet(li.repartition(64), predsPath("q123_frag"))
      sources.Sources.compact(s, predsPath("q123_frag"),
        predsPath("q123_compacted"), sortCols = Seq("l_orderkey", "l_linenumber"),
        numFiles = 4)
    }),

    // schema-evolution read: two parquet generations (v2 adds a column),
    // one mergeSchema scan — v1 rows surface NULL for the late column,
    // exactly DuckDB's union_by_name over the same files
    "q120_schema_evolution" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      sources.Sources.writeParquet(
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice")),
        predsPath("q120_v1"))
      sources.Sources.writeParquet(
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
        predsPath("q120_v2"))
      s.read.option("mergeSchema", "true")
        .parquet(predsPath("q120_v1"), predsPath("q120_v2"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    }),

    // robust batch-health monitoring: per-type MAD outliers over event
    // values (exact interpolated median both engines — the q50 recipe)
    "q121_mad_outliers" -> ((s, dir) =>
      ops.Profile.madOutliers(Tables.events(s, dir), "event_type", "value",
        keepCols = Seq("event_id"), k = 3.0)),

    // ANALYZE-TABLE-shaped column profiler (long format, one shared
    // scan); doubles pre-cast to DECIMAL so the string forms are
    // engine-portable
    "q116_profile" -> ((s, dir) =>
      ops.Profile.profileColumns(
        Tables.lineitem(s, dir).select(
          col("l_orderkey"),
          col("l_quantity").cast("decimal(12,2)").as("l_quantity"),
          col("l_returnflag"), col("l_shipdate")),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))),

    // join-key skew diagnostics: top-k hot keys + exact-integer Gini of
    // the key distribution — the decision inputs for saltedJoin (q96)
    "q117_key_skew" -> ((s, dir) =>
      ops.Profile.keySkewProfile(Tables.orders(s, dir), "o_custkey", topK = 10)),

    // C4-style cross-document boilerplate-line removal over a staged
    // fixture (synthetic cookie-banner/footer sentences injected, since
    // the raw corpus has no cross-doc repeated sentences): banners reach
    // minDocs and drop, every unique body survives, in-doc repetition is
    // NOT boilerplate
    "q118_line_dedup" -> ((s, dir) => {
      val staged = Tables.documents(s, dir).select(col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0,
            lit("Accept cookies to continue. ")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 5 === 0,
            lit(". All rights reserved")).otherwise(lit(""))).as("text"))
      sources.Sources.writeParquet(staged, predsPath("q118_docs"))
      text.Lines.dropBoilerplateLines(
        s.read.parquet(predsPath("q118_docs")), "doc_id", "text", minDocs = 3L)
    }),

    // temperature-scaled training-mixture allocation (p_g ∝ tokens_g^(1/2),
    // Hamilton largest-remainder rounding sums EXACTLY to the budget)
    "q119_mixture" -> ((s, dir) =>
      llm.Mixture.temperatureAllocation(
        Tables.documents(s, dir), "lang",
        size(TextOps.tokens(col("text"))).cast("long"), budget = 100000L)),

    // interpolated-bigram LM cross-entropy (the CCNet/KenLM-direction
    // quality bucket, one model order up from q83's unigram NLL) —
    // µ-quantized per DISTINCT bigram, so per-doc scoring is exact
    // integer arithmetic and hash-checkable
    "q115_bigram_nll" -> ((s, dir) =>
      text.Lm.bigramLogLoss(Tables.documents(s, dir), "doc_id", "text")),

    // HTML→text extraction over a staged HTML fixture (entity-escaped
    // documents text wrapped in title/style/script/comment noise): both
    // engines run the SAME RE2-safe extraction chain over the same stored
    // bytes, so the hash match pins the extractor's cross-engine semantics
    "q113_html_extract" -> ((s, dir) => {
      val html = Tables.documents(s, dir).select(col("doc_id"),
        concat(
          lit("<html><!-- fixture --><head><title>doc "), col("doc_id"),
          lit("</title><style>p{color:red}</style></head><body><h1>"),
          upper(col("lang")), lit("</h1><p>"),
          web.WebOps.escapeHtml(col("text")),
          lit("</p><script>var x=\"<p>no</p>\";</script></body></html>"))
          .as("html"))
      sources.Sources.writeParquet(html, predsPath("q113_html"))
      s.read.parquet(predsPath("q113_html"))
        .select(col("doc_id"), web.WebOps.htmlToText(col("html")).as("text"))
    }),

    // per-domain document cap (the C4/RefinedWeb crawl-curation step):
    // tracking-decorated mixed-case URLs → canonical form → registrable
    // domain (eTLD+1, incl. co.uk-style second-level suffixes) → keep the
    // k lowest doc_ids per domain. The oracle re-derives everything from
    // scratch in SQL — an independent formulation of both URL ops.
    "q114_domain_cap" -> ((s, dir) => {
      val url = concat(lit("HTTPS://WWW."), col("source"),
        when(col("doc_id") % 3 === 0, lit(".com"))
          .when(col("doc_id") % 3 === 1, lit(".co.uk"))
          .otherwise(lit(".org")),
        lit(":443/p/"), col("doc_id"),
        lit("?utm_source=feed&id="), col("doc_id"), lit("&utm_c=x#frag"))
      val norm = Tables.documents(s, dir)
        .select(col("doc_id"), web.WebOps.normalizeUrl(url).as("url_norm"))
        .withColumn("domain", web.WebOps.registrableDomain(col("url_norm")))
      Relational.groupedTopK(norm, Seq("domain"), "doc_id", "doc_id",
          k = 5, descending = false)
        .select(col("domain"), col("doc_id"), col("url_norm"),
          col("rank").cast("long").as("rank"))
    }),

    // WARC round trip: serialize documents as spec-shaped response
    // records (deterministic IDs/date), parse them back with the
    // Content-Length-driven scanner — the oracle reads the ORIGINAL
    // documents table, so a hash match proves parse(serialize(x)) == x
    // byte-for-byte including multi-byte UTF-8 octet accounting.
    "q112_warc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .selectExpr("concat('https://corpus.local/doc/', doc_id) AS uri", "text")
      sources.Warc.writeWarc(docs, "uri", "text", predsPath("q112_warc"))
      sources.Warc.warcRecords(s, predsPath("q112_warc"))
        .filter(col("warc_type") === "response")
        .selectExpr(
          "CAST(regexp_extract(target_uri, '([0-9]+)$', 1) AS BIGINT) AS doc_id",
          "payload_text AS text",
          "CAST(octet_length(payload) AS BIGINT) AS n_bytes")
    }),

    // SCD2 dimension-history build from a change log: per-user event_type
    // versions with [valid_from, valid_to) intervals, no-op changes
    // collapsed, (ts, event_id) ordering so duplicate timestamps stay
    // deterministic.
    "q109_scd2" -> ((s, dir) =>
      ops.Temporal.scd2(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id"))
  )

  /** Absolute path for a query-persisted intermediate parquet — shared by
    * the Spark query and its DuckDB oracle (which `read_parquet`s the same
    * files), so both derive from identical stored bits. Namespaced by the
    * `graft.preds.tag` system property (Verify sets it to the SF dir name)
    * so multi-SF verify sequences keep each SF's persisted splits — and
    * the paths its oracle_sql.json embeds — separate. */
  /** q108/q111 shared fixture: the base orders snapshot and a
    * deterministic synthetic change set derived from it — status updates
    * (%7 keys, ver 2), a conflicting earlier version that must lose
    * last-writer-wins (%21 keys, ver 1), and brand-new keys (%13,
    * offset +1e8). */
  private def ordersSnapshot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def ordersChangeSet(s: SparkSession, dir: String): DataFrame = {
    val o = ordersSnapshot(s, dir)
    val upd2 = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("X").as("o_orderstatus"),
        col("o_totalprice"), lit(2).as("ver"))
    val upd1 = o.filter(col("o_orderkey") % 21 === 0)
      .select(col("o_orderkey"), lit("D").as("o_orderstatus"),
        col("o_totalprice"), lit(1).as("ver"))
    val ins = o.filter(col("o_orderkey") % 13 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"), lit(1).as("ver"))
    upd2.unionByName(upd1).unionByName(ins)
  }

  private def predsPath(name: String): String = {
    val tag = sys.props.getOrElse("graft.preds.tag", "default")
    new java.io.File(s"target/tmp/$tag/$name").getAbsolutePath
  }

  /** Queries with no SQL-expressible oracle (ML fits, non-portable hash
    * paths, synthetic inputs) — the driver records a weaker rows-only
    * check; Bench times them as first-class headline queries. */
  private def rowsOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.8 session windows (oracle-checked: q22 IS in oracleSql — the
    // gaps-and-islands SQL is an independent relational formulation of
    // session_window's merge semantics)
    "q22_session_windows" -> ((s, dir) =>
      streaming.Streams.sessionize(Tables.events(s, dir))),

    // North-star multimodal: synthetic binary assets -> per-modality
    // feature stats. ALL modalities are REAL decodes of public formats:
    // 24-bit BMP + baseline JPEG (channel means over actual pixels — the
    // JPEG payloads are real entropy-coded T.81 streams, distinguished
    // from BMPs by content alone), PCM16 WAV (stats over actual samples),
    // YUV4MPEG2 (stats over actual luma planes). n_decoded == n_assets in
    // the image row proves the compressed path decodes, not just parses.
    "q26_multimodal_stats" -> ((s, dir) =>
      multimodal.Multimodal.featureStats(
        multimodal.Multimodal.syntheticAssets(s, 2000).unionByName(
          multimodal.Multimodal.syntheticJpegAssets(s, 500)))),

    // North-star rolling-hash fingerprinting, throughput path: the native
    // O(n) Karp-Rabin winnowing expression (one codegen'd pass per doc vs
    // one md5 per k-gram in q35). Different hash family than the portable
    // form, so rows-only — the q24-vs-q16 dual-path pattern.
    "q36_winnow_fast" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.exprapi.winnowFps(
            text.TextOps.normalizedText(col("text")), 8, 4)).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)),

    // Sketch aggregates — the 100-TB aggregation staple: HyperLogLog++
    // distinct counts and t-digest-style percentiles in ONE map-side-
    // partial pass, constant memory per group regardless of cardinality.
    // Sketch families differ across engines, so rows-only; the tolerance
    // contract (approx within 5% of exact) is pinned in RelationalSpec.
    "q37_approx_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)")
            .as("price_pcts"),
          count(lit(1)).as("n"))
        // one shared sketch, projected to scalars: the driver's rows-only
        // canonicalizer sorts/hashes column values and cannot order an
        // array<double> cell (r2 harness err) — scalar p50/p95 can be.
        .select(
          col("l_returnflag"), col("approx_orders"),
          element_at(col("price_pcts"), 1).as("p50"),
          element_at(col("price_pcts"), 2).as("p95"),
          col("n"))),

    // M1 full parity: COMPLETE Porter (1980) stemming over the corpus via
    // the native porter_stem expression — stem frequency, q29's shape at
    // full algorithm fidelity. The measure-based conditions (m, *o, *v*)
    // are not regex-expressible in one SQL dialect portably, so rows-only;
    // correctness is pinned by TextOpsSpec's verbatim paper example pairs.
    "q38_porter_freq" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(
          graft.exprapi.porterStem(text.TextOps.tokens(col("text")))).as("stem"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)),



    // North-star dedup, SimHash method: banded 64-bit sketches, exact
    // hamming verify — an EXACT hamming≤3 join by pigeonhole (hamMax <
    // bands). xxhash64-based sketch has no DuckDB mirror ⇒ rows-only;
    // the guarantee and separation contracts are pinned by DedupSpec.
    "q40_simhash_dups" -> ((s, dir) =>
      llm.Dedup.simhashDups(Tables.documents(s, dir))),

    // quality: DEFLATE compression ratio per doc (per-mille) — the
    // long-range-redundancy screen complementing q62's fixed-width
    // duplicate-gram rule. zlib output is engine-local ⇒ rows-only; the
    // discrimination and determinism contracts are pinned by TextOpsSpec.
    "q91_compress_ratio" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
          graft.exprapi.deflateLen(col("text").cast("binary")).cast("long").as("z_bytes"))
        .filter(col("n_bytes") > 0)
        .withColumn("ratio_pm", expr("(z_bytes * 1000) DIV n_bytes")))
  )

  // ---------------------------------------------------------------------
  // oracleSql: DuckDB equivalents (driver registers each parquet as a view
  // named by table). Aliases match the Spark column names exactly.
  // ---------------------------------------------------------------------

  /** `exactSum` rendered in DuckDB SQL. */
  private def dSum(expr: String, scale: Int = 2, as: String = ""): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)" +
      (if (as.nonEmpty) s" AS $as" else "")

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dSum("l_quantity", 2, "sum_qty")},
         |  ${dSum("l_extendedprice", 2, "sum_base_price")},
         |  ${dSum("l_extendedprice * (1.0 - l_discount)", 6, "sum_disc_price")},
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_label_join" ->
      """WITH joined AS (
        |  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS odate, o.o_orderpriority,
        |         datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS diff
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |), labeled AS (
        |  SELECT *, CASE WHEN diff >= 0 AND diff < 365 THEN 1 ELSE 0 END AS acquired
        |  FROM joined
        |), positives AS (
        |  SELECT DISTINCT o_orderkey AS p_orderkey, odate AS p_odate, acquired AS p_acquired
        |  FROM labeled WHERE acquired = 1
        |)
        |SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_date, o.o_orderpriority,
        |       COALESCE(p.p_acquired, 0) AS acquired
        |FROM orders o LEFT JOIN positives p
        |  ON o.o_orderkey = p.p_orderkey AND CAST(o.o_orderdate AS DATE) = p.p_odate""".stripMargin,

    "q03_dims_rollup" ->
      s"""SELECT r_name, COUNT(*) AS n_customers, ${dSum("c_acctbal", 2, "sum_acctbal")}
         |FROM customer c
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1""".stripMargin,

    // Declared semantic: pair the top-1000 suppliers per nation bucket
    // (acctbal desc, suppkey tiebreak) — the quadratic-output cap that makes
    // the theta join scale-safe. At sf<=0.1 no bucket reaches the cap, so
    // this equals the unpruned join.
    "q04_theta_pairs" ->
      """WITH pruned AS (
        |  SELECT * FROM (
        |    SELECT s_suppkey, s_nationkey, s_acctbal,
        |           ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |                              ORDER BY s_acctbal DESC, s_suppkey) AS rk
        |    FROM supplier) WHERE rk <= 1000
        |)
        |SELECT a.s_suppkey AS a_suppkey, b.s_suppkey AS b_suppkey,
        |       a.s_nationkey AS nationkey, a.s_acctbal + b.s_acctbal AS pair_bal
        |FROM pruned a JOIN pruned b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey <> b.s_suppkey""".stripMargin,

    "q05_cust_orders" ->
      s"""SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders,
         |  ${dSum("COALESCE(o.o_totalprice, 0.0)", 2, "sum_spend")}
         |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
         |GROUP BY 1, 2""".stripMargin,

    "q06_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem""".stripMargin,

    "q07_confusion" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
        |       CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS prediction,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q08_topk_orders" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 3""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000.0)""".stripMargin,

    "q11_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     oo AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'union' AS op, o_custkey FROM (SELECT * FROM f UNION SELECT * FROM oo)
        |UNION ALL
        |SELECT 'intersect' AS op, o_custkey FROM (SELECT * FROM f INTERSECT SELECT * FROM oo)
        |UNION ALL
        |SELECT 'except' AS op, o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM oo)""".stripMargin,

    "q12_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_distinct
        |FROM documents""".stripMargin,

    "q13_doc_freq" ->
      """SELECT tok AS token, CAST(count(*) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
        |      FROM documents)
        |GROUP BY tok HAVING count(*) >= 5 AND count(*) <= 400""".stripMargin,

    "q14_tfidf_topterms" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok
        |), df AS (
        |  SELECT tok AS token, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tok
        |        FROM documents)
        |  GROUP BY tok
        |)
        |SELECT doc_id, token, tf, score, rank FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, (tf.tf * 1000000) // df.df AS score,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |                ORDER BY (tf.tf * 1000000) // df.df DESC, tf.token) AS BIGINT) AS rank
        |  FROM tf JOIN df ON tf.token = df.token
        |) WHERE rank <= 3""".stripMargin,

    "q15_ngram_stats" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), g AS (
        |  SELECT doc_id, ts,
        |    list_transform(generate_series(1, len(ts)-1), i -> ts[i] || ' ' || ts[i+1]) AS bi,
        |    list_transform(generate_series(1, len(ts)-2), i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS tri
        |  FROM t
        |)
        |SELECT doc_id,
        |  CAST(len(ts) AS BIGINT) AS n_uni,
        |  CAST(len(bi) AS BIGINT) AS n_bi,
        |  CAST(len(tri) AS BIGINT) AS n_tri,
        |  CAST(len(list_distinct(ts || bi || tri)) AS BIGINT) AS n_merged
        |FROM g""".stripMargin,

    // hash_j(s) = a 15-hex (60-bit) slice of md5(ceil(j/2):s) as BIGINT —
    // odd j takes hex 1-15, even j hex 16-30, so one digest feeds two hash
    // families (halves the md5 work on the Spark side; numeric minima keep
    // the signature aggregation in a primitive hash-agg buffer). md5 hex
    // and the 60-bit slices parse identically in both engines.
    "q16_near_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, 6),
        |                        j -> list_aggregate(list_transform(shingles,
        |                               s -> CAST('0x' || substr(md5(CAST((j+1)//2 AS VARCHAR) || ':' || s),
        |                                                 CASE WHEN j%2=1 THEN 1 ELSE 16 END, 15) AS BIGINT)),
        |                             'min')) AS mh
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b AS band_id,
        |         md5(CAST(mh[2*b-1] AS VARCHAR) || '|' || CAST(mh[2*b] AS VARCHAR)) AS bucket
        |  FROM sig, unnest(generate_series(1, 3)) AS u(b)
        |)
        |SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
        |FROM bands a JOIN bands b
        |  ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin,

    "q17_sim_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS n_id, embedding AS ce FROM embeddings),
        |dots AS (
        |  SELECT q_id, n_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qe)), i ->
        |      CAST(floor(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
        |      AS BIGINT) AS dot_q
        |  FROM q, c WHERE q_id <> n_id
        |)
        |SELECT * FROM (
        |  SELECT q_id, n_id, dot_q,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS BIGINT) AS rank
        |  FROM dots) WHERE rank <= 5""".stripMargin,

    "q18_class_weights" ->
      """WITH lab AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label FROM events
        |), stats AS (
        |  SELECT count(*) AS total, sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS neg FROM lab
        |)
        |SELECT l.label, CAST(count(*) AS BIGINT) AS n,
        |       CASE WHEN l.label = 0 THEN CAST(s.neg AS DOUBLE) / s.total
        |            ELSE 1.0 - CAST(s.neg AS DOUBLE) / s.total END AS weight
        |FROM lab l, stats s GROUP BY l.label, s.neg, s.total""".stripMargin,

    "q19_doc_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
        |         CAST(floor(1000.0 * len(list_filter(ts,
        |           x -> x IN ('the','a','an','of','to','and','in','is','it','that'))) / len(ts))
        |           AS BIGINT) AS fw_score,
        |         CASE WHEN len(text) > 0 THEN
        |           CAST(floor((len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) * 1000) / len(text)) AS BIGINT)
        |         ELSE 0 END AS punct_score
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, fw_score, punct_score,
        |       CASE WHEN fw_score >= 100 THEN 'en_like' ELSE 'other' END AS lang_guess,
        |       CASE WHEN n_tokens >= 80 THEN 'long'
        |            WHEN n_tokens >= 40 THEN 'medium'
        |            ELSE 'short' END AS quality
        |FROM s""".stripMargin,

    "q20_fingerprint" ->
      """SELECT doc_id, fp, CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_same
        |FROM (SELECT doc_id,
        |             md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
        |      FROM documents)""".stripMargin,

    "q21_window_agg" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  COUNT(*) AS n, ${dSum("value", 2, "sum_value")}
         |FROM events GROUP BY 1, 2""".stripMargin,

    // Independent relational formulation of session_window merge semantics:
    // gaps-and-islands — new session iff the gap to the previous event is
    // NOT < 30 min (session_window merges strictly-before-window-end).
    "q22_session_windows" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   < INTERVAL 30 MINUTE
        |              THEN 0 ELSE 1 END AS new_s
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,

    // identical gaps-and-islands semantics as q22 — here the Spark side
    // EXECUTED session_window as an actual AvailableNow stream, so the
    // hash match pins streaming execution, not just the operator
    "q93_sessionize_stream" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   < INTERVAL 30 MINUTE
        |              THEN 0 ELSE 1 END AS new_s
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,

    // the Spark side ran this join+agg from bucketed tables with zero
    // hash exchanges; the oracle replays it over the original parquet —
    // a hash match proves the bucketed layout is value-exact
    "q95_bucketed_join" ->
      s"""SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       ${dSum("l.l_quantity", 2, "sum_qty")}
         |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |GROUP BY 1, 2""".stripMargin,

    // identical semantics as q21 — here the Spark side EXECUTED the
    // windowed aggregation as an AvailableNow stream
    "q98_tumbling_stream" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  COUNT(*) AS n, ${dSum("value", 2, "sum_value")}
         |FROM events GROUP BY 1, 2""".stripMargin,

    // the final keyed state per user after a full drain == the plain
    // per-user count; integer-exact across engines
    "q99_keyed_state_stream" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // independent formulation of window(ts, 1h, 30m): each event belongs
    // to exactly the two 30-min-aligned hour windows covering it
    "q105_sliding_stream" ->
      """WITH s AS (
        |  SELECT event_type,
        |         unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
        |           AS window_start
        |  FROM events
        |)
        |SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY 1, 2""".stripMargin,

    // the drained first-occurrence key set == the distinct key set
    "q106_dedup_stream" ->
      """SELECT user_id, event_type FROM events GROUP BY 1, 2""".stripMargin,

    // the stream-static broadcast enrichment == the plain batch left join
    "q107_enrich_stream" ->
      """SELECT e.event_id, e.user_id, e.event_type,
        |       c.c_mktsegment, c.c_nationkey
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "q108_merge_upsert" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |), u AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice, 2 AS ver
        |  FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', o_totalprice, 1 FROM o WHERE o_orderkey % 21 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'N', o_totalprice, 1
        |  FROM o WHERE o_orderkey % 13 = 0
        |), win AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                    ORDER BY ver DESC, o_orderstatus DESC) AS rn
        |        FROM u)
        |  WHERE rn = 1
        |)
        |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM o
        |WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM win)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM win""".stripMargin,

    // independent SCD2 formulation: lag-collapse no-ops, then lead over
    // the survivors gives each version its [valid_from, valid_to)
    "q109_scd2" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |), k AS (
        |  SELECT user_id, ts, event_id, event_type FROM m
        |  WHERE prev IS NULL OR event_type <> prev
        |)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS valid_to,
        |       CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) IS NULL
        |            THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM k""".stripMargin,

    // XML round trip: oracle reads the ORIGINAL table
    "q124_xml_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders""".stripMargin,

    // VARIANT extraction == plain JSON path extraction over the same strings
    "q125_variant" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    // the drained streaming CDC fold == the one-shot batch merge (q108's
    // oracle verbatim — same change set, same last-writer-wins rule)
    "q122_cdc_stream" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |), u AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice, 2 AS ver
        |  FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', o_totalprice, 1 FROM o WHERE o_orderkey % 21 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'N', o_totalprice, 1
        |  FROM o WHERE o_orderkey % 13 = 0
        |), win AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                    ORDER BY ver DESC, o_orderstatus DESC) AS rn
        |        FROM u)
        |  WHERE rn = 1
        |)
        |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM o
        |WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM win)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM win""".stripMargin,

    // the serve half of the LDA split replayed over the persisted
    // topic-term matrix: same stored doubles, same deterministic
    // (weight DESC, term_idx) top-5 — hash-identical ranks
    "q126_lda_topics" ->
      s"""SELECT topic, rn, term_idx, term, weight FROM (
         |  SELECT *, row_number() OVER (PARTITION BY topic
         |            ORDER BY weight DESC, term_idx) AS rn
         |  FROM read_parquet('${predsPath("q126_topics")}/*.parquet'))
         |WHERE rn <= 5""".stripMargin,

    // compaction must be content-invariant: the oracle reads the ORIGINAL
    "q123_compaction" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem""".stripMargin,

    "q120_schema_evolution" ->
      s"""SELECT o_orderkey, o_totalprice, o_orderstatus
         |FROM read_parquet(['${predsPath("q120_v1")}/*.parquet',
         |                   '${predsPath("q120_v2")}/*.parquet'],
         |                  union_by_name = true)""".stripMargin,

    "q121_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1
        |), dev AS (
        |  SELECT event_id, event_type, value, med, abs(value - med) AS dev
        |  FROM events JOIN med USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1
        |)
        |SELECT event_type, event_id, value, med, mad
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev > 3 * mad""".stripMargin,

    "q116_profile" ->
      """SELECT 'l_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |       min(v) AS min_s, max(v) AS max_s
        |FROM (SELECT CAST(l_orderkey AS VARCHAR) AS v FROM lineitem)
        |UNION ALL
        |SELECT 'l_quantity', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT v) AS BIGINT), min(v), max(v)
        |FROM (SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS v
        |      FROM lineitem)
        |UNION ALL
        |SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT v) AS BIGINT), min(v), max(v)
        |FROM (SELECT CAST(l_returnflag AS VARCHAR) AS v FROM lineitem)
        |UNION ALL
        |SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT v) AS BIGINT), min(v), max(v)
        |FROM (SELECT CAST(l_shipdate AS VARCHAR) AS v FROM lineitem)""".stripMargin,

    "q117_key_skew" ->
      """WITH counts AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT key, c, row_number() OVER (ORDER BY c ASC, key ASC) AS i
        |  FROM counts
        |), stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(sum(i * c) AS BIGINT) AS s1
        |  FROM ranked
        |)
        |SELECT key, c, CAST(r AS BIGINT) AS metric
        |FROM (SELECT key, c,
        |             row_number() OVER (ORDER BY c DESC, key ASC) AS r
        |      FROM counts)
        |WHERE r <= 10
        |UNION ALL
        |SELECT '__gini__', n_keys,
        |       CAST(floor(1e6 * (CAST(2*s1 - (n_keys+1)*n_rows AS DOUBLE) /
        |                         CAST(n_keys*n_rows AS DOUBLE))) AS BIGINT)
        |FROM stats""".stripMargin,

    // both engines replay the df>=3 sentence filter over the SAME staged
    // fixture; string_agg/array_join rebuild surviving text in order
    "q118_line_dedup" ->
      s"""WITH s AS (
         |  SELECT doc_id, bg.pos AS pos, bg.sent AS sent FROM (
         |    SELECT doc_id,
         |           unnest(list_transform(string_split(lower(text), '. '),
         |             (x, i) -> struct_pack(pos := i, sent := x))) AS bg
         |    FROM read_parquet('${predsPath("q118_docs")}/*.parquet'))
         |  WHERE trim(sent) <> ''
         |), df AS (
         |  SELECT sent, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM s GROUP BY 1
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sent,
         |       CAST(sum(CASE WHEN df >= 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |       coalesce(string_agg(CASE WHEN df < 3 THEN sent END, '. '
         |                           ORDER BY pos), '') AS text
         |FROM s JOIN df USING (sent)
         |GROUP BY doc_id""".stripMargin,

    "q119_mixture" ->
      """WITH sizes AS (
        |  SELECT lang,
        |         CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
        |           AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT lang, n_tokens,
        |         CAST(floor(1e6 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS wq
        |  FROM sizes
        |), ex AS (
        |  SELECT lang, n_tokens, wq,
        |         (100000 * CAST(wq AS DOUBLE)) /
        |           CAST((SELECT sum(wq) FROM w) AS DOUBLE) AS share
        |  FROM w
        |), e2 AS (
        |  SELECT *, CAST(floor(share) AS BIGINT) AS alloc0,
        |         share - floor(share) AS frac
        |  FROM ex
        |), sp AS (
        |  SELECT 100000 - sum(alloc0) AS spare FROM e2
        |)
        |SELECT lang, n_tokens, wq,
        |       CAST(alloc0 + CASE WHEN row_number()
        |           OVER (ORDER BY frac DESC, lang ASC) <= (SELECT spare FROM sp)
        |         THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM e2""".stripMargin,

    "q115_bigram_nll" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        |  FROM documents
        |), pb AS (
        |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(generate_series(1, len(ts)-1),
        |             i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS bg
        |    FROM t WHERE len(ts) >= 2)
        |), tfb AS (
        |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tfb
        |  FROM pb GROUP BY 1, 2, 3
        |), cb AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM pb GROUP BY 1, 2
        |), cw1 AS (
        |  SELECT w1, CAST(sum(cb) AS BIGINT) AS cw1 FROM cb GROUP BY 1
        |), uni AS (
        |  SELECT unnest(ts) AS w2 FROM t
        |), cu AS (
        |  SELECT w2, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY 1
        |), model AS (
        |  SELECT cb.w1, cb.w2,
        |         CAST(floor(-1e6 * ln(
        |           CAST(0.75 AS DOUBLE) * (CAST(cb AS DOUBLE) / CAST(cw1 AS DOUBLE)) +
        |           CAST(0.25 AS DOUBLE) * (CAST(cu AS DOUBLE) /
        |             CAST((SELECT count(*) FROM uni) AS DOUBLE)))) AS BIGINT) AS q
        |  FROM cb JOIN cw1 USING (w1) JOIN cu USING (w2)
        |)
        |SELECT doc_id, CAST(sum(tfb) AS BIGINT) AS n_bigrams,
        |       CAST(sum(tfb * q) // sum(tfb) AS BIGINT) AS nll_q
        |FROM tfb JOIN model USING (w1, w2)
        |GROUP BY 1""".stripMargin,

    // both engines run the same RE2-safe extraction chain over the SAME
    // staged HTML bytes — cross-engine semantic pin of htmlToText
    "q113_html_extract" ->
      s"""SELECT doc_id,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(
         |            regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
         |            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |        '<[^>]+>', ' ', 'g'),
         |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', ''''), '&amp;', '&'),
         |    '\\s+', ' ', 'g')) AS text
         |FROM read_parquet('${predsPath("q113_html")}/*.parquet')""".stripMargin,

    // independent SQL re-derivation of URL canonicalization, eTLD+1
    // grouping, and the per-domain cap
    "q114_domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'HTTPS://WWW.' || source ||
        |         CASE WHEN doc_id % 3 = 0 THEN '.com'
        |              WHEN doc_id % 3 = 1 THEN '.co.uk' ELSE '.org' END ||
        |         ':443/p/' || doc_id || '?utm_source=feed&id=' || doc_id ||
        |         '&utm_c=x#frag' AS url
        |  FROM documents
        |), n AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |    || '://' ||
        |    regexp_replace(regexp_replace(
        |      lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
        |      ':(80|443)$', ''), '^www\.', '') ||
        |    regexp_replace(regexp_replace(regexp_replace(
        |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1),
        |      '(?:utm_[^&=]*|fbclid|gclid)=[^&]*&', '', 'g'),
        |      '[?&](?:utm_[^&=]*|fbclid|gclid)=[^&]*$', ''),
        |      '\?$', '') AS url_norm
        |  FROM u
        |), h AS (
        |  SELECT doc_id, url_norm,
        |    regexp_extract(url_norm, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)
        |      AS host
        |  FROM n
        |), d AS (
        |  SELECT doc_id, url_norm,
        |    coalesce(nullif(regexp_extract(host,
        |      '([^.]+\.(?:co|com|org|net|ac|gov|edu)\.(?:uk|au|jp|br|in|nz|za))$',
        |      1), ''), regexp_extract(host, '([^.]+\.[^.]+)$', 1)) AS domain
        |  FROM h
        |)
        |SELECT domain, doc_id, url_norm, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT domain, doc_id, url_norm,
        |             row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        |      FROM d)
        |WHERE rn <= 5""".stripMargin,

    // the Spark side serialized to WARC and parsed back; the oracle reads
    // the ORIGINAL table — the hash match proves the round trip is exact
    "q112_warc_roundtrip" ->
      """SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // the Spark side blocks with deletion neighborhoods; the oracle is the
    // BRUTE-FORCE quadratic join — the hash match proves the blocking has
    // full recall at distance <= 1
    "q110_deletion_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "q111_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |), u AS (
        |  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice, 2 AS ver
        |  FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', o_totalprice, 1 FROM o WHERE o_orderkey % 21 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'N', o_totalprice, 1
        |  FROM o WHERE o_orderkey % 13 = 0
        |), win AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |                    ORDER BY ver DESC, o_orderstatus DESC) AS rn
        |        FROM u)
        |  WHERE rn = 1
        |), nxt AS (
        |  SELECT * FROM (
        |    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM o
        |    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM win)
        |    UNION ALL
        |    SELECT o_orderkey, o_orderstatus, o_totalprice FROM win)
        |  WHERE o_orderkey % 11 <> 5
        |)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |       o.o_orderstatus AS old_o_orderstatus,
        |       o.o_totalprice  AS old_o_totalprice,
        |       n.o_orderstatus AS new_o_orderstatus,
        |       n.o_totalprice  AS new_o_totalprice,
        |       CASE WHEN o.o_orderkey IS NULL THEN 'I'
        |            WHEN n.o_orderkey IS NULL THEN 'D'
        |            WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
        |              OR (o.o_totalprice  IS DISTINCT FROM n.o_totalprice)
        |            THEN 'U' END AS change_type
        |FROM o FULL JOIN nxt n ON o.o_orderkey = n.o_orderkey
        |WHERE CASE WHEN o.o_orderkey IS NULL THEN 'I'
        |           WHEN n.o_orderkey IS NULL THEN 'D'
        |           WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
        |             OR (o.o_totalprice  IS DISTINCT FROM n.o_totalprice)
        |           THEN 'U' END IS NOT NULL""".stripMargin,

    // the Spark side salted the join; the oracle is the PLAIN join — the
    // hash match proves the skew mitigation is result-invisible
    "q96_salted_join" ->
      s"""SELECT o.o_orderstatus,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       ${dSum("l.l_quantity", 2, "sum_qty")}
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1""".stripMargin,

    // asymmetric containment over distinct 4-gram shingles, bench side =
    // doc_id % 100 = 0 (q70's split convention)
    "q97_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(t) - 3, 0)),
        |      i -> array_to_string(t[i:i+3], ' ')))) AS gram
        |  FROM toks
        |), bsz AS (
        |  SELECT doc_id AS b_doc, CAST(count(*) AS BIGINT) AS b_n
        |  FROM grams WHERE doc_id % 100 = 0 GROUP BY 1
        |), hits AS (
        |  SELECT c.doc_id AS c_doc, b.doc_id AS b_doc,
        |         CAST(count(*) AS BIGINT) AS n_hit
        |  FROM grams c JOIN grams b USING (gram)
        |  WHERE c.doc_id % 100 <> 0 AND b.doc_id % 100 = 0
        |  GROUP BY 1, 2
        |)
        |SELECT h.c_doc, h.b_doc, h.n_hit, s.b_n,
        |       CAST(h.n_hit AS DOUBLE) / s.b_n AS containment
        |FROM hits h JOIN bsz s USING (b_doc)
        |WHERE CAST(h.n_hit AS DOUBLE) / s.b_n >= 0.02""".stripMargin,

    // Morton interleave over min-max-scaled dims, recomputed bit-for-bit:
    // scaled = floor((c - min)·2^16 / (max - min + 1)) is exact-in-double
    // on both engines; column j's bit i lands at 2i+j, positions are
    // disjoint so the sum over terms equals the OR
    "q101_zorder" ->
      """WITH s AS (
        |  SELECT CAST(min(l_partkey) AS DOUBLE) AS pmin, CAST(max(l_partkey) AS DOUBLE) AS pmax,
        |         CAST(min(l_suppkey) AS DOUBLE) AS smin, CAST(max(l_suppkey) AS DOUBLE) AS smax
        |  FROM lineitem
        |), v AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(floor((l_partkey - pmin) * 65536 / (pmax - pmin + 1)) AS BIGINT) AS p,
        |    CAST(floor((l_suppkey - smin) * 65536 / (smax - smin + 1)) AS BIGINT) AS q
        |  FROM lineitem, s
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(list_sum(list_transform(generate_series(0, 15), i ->
        |    (((p >> i) & 1) << (2*i)) + (((q >> i) & 1) << (2*i+1))
        |  )) AS BIGINT) AS zval
        |FROM v""".stripMargin,

    // candidate/re-rank split (q94's oracle applied to the plain-IVF
    // path): exact quantized-dot re-rank + deterministic top-k replayed
    // over the persisted candidate pairs and unit vectors
    "q28_sim_ivf" ->
      s"""WITH sl AS (
         |  SELECT q_id, n_id FROM read_parquet('${predsPath("q28_cands")}/*.parquet')
         |), u AS (
         |  SELECT vec_id, unit FROM read_parquet('${predsPath("q28_units")}/*.parquet')
         |), dots AS (
         |  SELECT s.q_id, s.n_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(a.unit)), i ->
         |      CAST(floor(CAST(a.unit[i] AS DOUBLE) * CAST(b.unit[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS dot_q
         |  FROM sl s
         |  JOIN u a ON s.q_id = a.vec_id
         |  JOIN u b ON s.n_id = b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT q_id, n_id, dot_q,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS BIGINT) AS rank
         |  FROM dots) WHERE rank <= 5""".stripMargin,

    // shortlist/re-rank split (q94's oracle, flat-PQ path): exact
    // quantized-dot re-rank + deterministic top-k over the persisted ADC
    // shortlist and unit vectors
    "q57_sim_pq" ->
      s"""WITH sl AS (
         |  SELECT q_id, n_id FROM read_parquet('${predsPath("q57_shortlist")}/*.parquet')
         |), u AS (
         |  SELECT vec_id, unit FROM read_parquet('${predsPath("q57_units")}/*.parquet')
         |), dots AS (
         |  SELECT s.q_id, s.n_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(a.unit)), i ->
         |      CAST(floor(CAST(a.unit[i] AS DOUBLE) * CAST(b.unit[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS dot_q
         |  FROM sl s
         |  JOIN u a ON s.q_id = a.vec_id
         |  JOIN u b ON s.n_id = b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT q_id, n_id, dot_q,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS BIGINT) AS rank
         |  FROM dots) WHERE rank <= 5""".stripMargin,

    // shortlist/re-rank split (q94's oracle, in-memory IVFPQ path)
    "q58_sim_ivfpq" ->
      s"""WITH sl AS (
         |  SELECT q_id, n_id FROM read_parquet('${predsPath("q58_shortlist")}/*.parquet')
         |), u AS (
         |  SELECT vec_id, unit FROM read_parquet('${predsPath("q58_units")}/*.parquet')
         |), dots AS (
         |  SELECT s.q_id, s.n_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(a.unit)), i ->
         |      CAST(floor(CAST(a.unit[i] AS DOUBLE) * CAST(b.unit[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS dot_q
         |  FROM sl s
         |  JOIN u a ON s.q_id = a.vec_id
         |  JOIN u b ON s.n_id = b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT q_id, n_id, dot_q,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS BIGINT) AS rank
         |  FROM dots) WHERE rank <= 5""".stripMargin,

    // fit/serve split: q42's exact int8 CTE chain verbatim, with the pair
    // space restricted to same-cell pairs read from the PERSISTED KMeans
    // assignments, then the lower-id survivor anti-join — the entire
    // serving half of the semantic dedup replayed over identical stored
    // bits
    "q100_semantic_dedup" ->
      s"""WITH s AS (
         |  SELECT CAST(max(list_max(list_transform(embedding, x -> abs(x)))) AS DOUBLE) / 127 AS g
         |  FROM embeddings
         |), v AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / g) AS BIGINT)) AS qv
         |  FROM embeddings, s
         |), w AS (
         |  SELECT c.vec_id, c.cell, v.qv,
         |         CAST(list_sum(list_transform(v.qv, x -> x * x)) AS BIGINT) AS n2
         |  FROM v JOIN read_parquet('${predsPath("q100_cells")}/*.parquet') c USING (vec_id)
         |), ok AS (
         |  SELECT cell FROM read_parquet('${predsPath("q100_cells")}/*.parquet')
         |  GROUP BY cell HAVING count(*) <= 10000
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(list_sum(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8,
         |    a.n2 AS na2, b.n2 AS nb2
         |  FROM w a JOIN w b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN ok ON ok.cell = a.cell
         |), dropped AS (
         |  SELECT DISTINCT id_b FROM pairs
         |  WHERE dot_i8 > 0
         |    AND CAST(dot_i8 AS HUGEINT) * dot_i8 * 10000 >= CAST(1600 AS HUGEINT) * na2 * nb2
         |)
         |SELECT w.vec_id, w.cell FROM w
         |WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = w.vec_id)""".stripMargin,

    // the stream-stream join drained under AvailableNow must equal the
    // plain batch interval join — losing or duplicating a buffered match
    // across micro-batches breaks the hash
    "q102_join_stream" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |         value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.click_id, c.user_id, c.click_ts,
        |       p.purchase_id, p.purchase_ts, p.purchase_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts <= c.click_ts
        |  AND p.purchase_ts >= c.click_ts - INTERVAL 1 HOUR""".stripMargin,

    "q103_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok, i AS pos,
        |         array_to_string(ts[i:i+7], ' ') AS gram
        |  FROM t, unnest(generate_series(1, len(ts) - 7)) AS u(i)
        |  WHERE len(ts) >= 8
        |), d AS (
        |  SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |), h AS (
        |  SELECT g.doc_id, g.n_tok, g.pos FROM g JOIN d USING (gram)
        |), m AS (
        |  SELECT doc_id, n_tok, pos,
        |         max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM h
        |), isl AS (
        |  SELECT doc_id, n_tok, pos,
        |         CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END AS ni
        |  FROM m
        |), num AS (
        |  SELECT doc_id, n_tok, pos,
        |         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM isl
        |), sp AS (
        |  SELECT doc_id, n_tok, island, min(pos) AS s, max(pos + 7) AS e
        |  FROM num GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, n_tok,
        |       CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
        |       CAST(sum(e - s + 1) * 1000000 // n_tok AS BIGINT) AS cov_ppm
        |FROM sp GROUP BY 1, 2""".stripMargin,

    "q104_dsir_weights" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), tgt AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS ct
        |  FROM tf
        |  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
        |  GROUP BY 1
        |), raw AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cr FROM tf GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
        |         (SELECT CAST(COALESCE(sum(ct), 0) AS BIGINT) FROM tgt) AS nt,
        |         (SELECT CAST(count(*) AS BIGINT) FROM raw) AS v
        |), vq AS (
        |  SELECT raw.tok,
        |         CAST(floor(1e6 * ((ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE))
        |                            - ln(CAST(tot.nt + tot.v AS DOUBLE)))
        |                           - (ln(CAST(raw.cr + 1 AS DOUBLE))
        |                              - ln(CAST(tot.nr + tot.v AS DOUBLE))))) AS BIGINT) AS q
        |  FROM raw CROSS JOIN tot LEFT JOIN tgt USING (tok)
        |), w AS (
        |  SELECT doc_id,
        |         CAST(sum(tf) AS BIGINT) AS n_tok,
        |         CAST(sum(tf * q) AS BIGINT) AS w_q
        |  FROM tf JOIN vq ON tf.tok = vq.tok
        |  GROUP BY 1
        |), top AS (
        |  SELECT doc_id FROM w ORDER BY w_q DESC, doc_id LIMIT 50
        |)
        |SELECT w.doc_id, w.n_tok, w.w_q,
        |       CAST(CASE WHEN top.doc_id IS NULL THEN 0 ELSE 1 END AS INT) AS sel
        |FROM w LEFT JOIN top ON w.doc_id = top.doc_id""".stripMargin,

    "q30_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max(value) AS last_purchase_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.last_purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "q31_range_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS lo,
        |                  ts + INTERVAL 30 MINUTE AS hi
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, CAST(count(*) AS BIGINT) AS n_clicks
        |FROM p JOIN c ON p.user_id = c.user_id AND c.ts >= p.lo AND c.ts <= p.hi
        |GROUP BY 1""".stripMargin,

    "q32_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(lower(text),
        |       '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s'']+')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,

    "q39_bpe_merges" -> {
      // chars joined by DOUBLE spaces, whole string wrapped in single
      // spaces; each merge = one literal replace of ' a  b ' with ' ab ' —
      // the surrounding spaces anchor unit boundaries (a bare 'a  b'
      // pattern would false-match the TAIL of a multi-char unit, e.g.
      // 'st  o' ⊃ 't  o'). Left-to-right non-overlapping replace = the
      // fuse-all semantics of one merge step; rank order = table order
      // (rank-consistent table ⇒ in-order == priority loop).
      val enc = text.Bpe.DefaultMerges.foldLeft(
        "' ' || trim(regexp_replace(t, '(.)', '\\1  ', 'g')) || ' '") {
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
      }
      s"""WITH toks AS (
         |  SELECT unnest(regexp_extract_all(lower(text),
         |    '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\\s'']+')) AS t
         |  FROM documents
         |), enc AS (SELECT $enc AS s FROM toks),
         |u AS (SELECT unnest(string_split(trim(s), '  ')) AS unit FROM enc)
         |SELECT unit, CAST(count(*) AS BIGINT) AS n
         |FROM u GROUP BY 1 HAVING count(*) >= 20""".stripMargin
    },

    "q34_lang_bigrams" ->
      """WITH n AS (
        |  SELECT doc_id, array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS s
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    CASE WHEN len(s) >= 2 THEN
        |      CAST(floor((len(list_filter(list_transform(generate_series(1, len(s)-1),
        |                                                 i -> substr(s, i, 2)),
        |             x -> x IN ('th','he','in','er','an','re','on','at','en','nd',
        |                        'ti','es','or','te','of','ed','is','it','al','ar',
        |                        'st','to','nt','ng','se','ha','as','ou','io','le'))) * 1000)
        |                 / (len(s) - 1)) AS BIGINT)
        |    ELSE 0 END AS bg_score
        |  FROM n
        |)
        |SELECT doc_id, bg_score,
        |       CASE WHEN bg_score >= 80 THEN 'en' ELSE 'other' END AS lang_bg
        |FROM sc""".stripMargin,

    // same 60-bit md5 hash family as q16 over 3-token shingles;
    // hs[i:i+3] is the w=4 window, min per window, distinct per doc,
    // then cross-doc sharing counts
    "q35_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), h AS (
        |  SELECT doc_id,
        |         list_transform(shingles, g -> CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)) AS hs
        |  FROM sh WHERE len(shingles) >= 4
        |), m AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, len(hs) - 3),
        |                                      i -> list_aggregate(hs[i:i+3], 'min'))) AS fps
        |  FROM h
        |), e AS (SELECT doc_id, unnest(fps) AS fp FROM m)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs
        |FROM e GROUP BY fp HAVING count(*) >= 2""".stripMargin,

    // Global scale g = max|x|/127 (float max cast to double in both
    // engines), q_i = floor(x/g) — floor is the one rounding both engines
    // share bit-for-bit; all scores share g², so ranking is integer-only
    "q33_sim_int8" ->
      """WITH s AS (
        |  SELECT CAST(max(list_max(list_transform(embedding, x -> abs(x)))) AS DOUBLE) / 127 AS g
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / g) AS BIGINT)) AS qv
        |  FROM embeddings, s WHERE vec_id % 50 = 0
        |), c AS (
        |  SELECT vec_id AS n_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / g) AS BIGINT)) AS cv
        |  FROM embeddings, s
        |), dots AS (
        |  SELECT q_id, n_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i])) AS BIGINT) AS dot_i8
        |  FROM q, c WHERE q_id <> n_id
        |)
        |SELECT * FROM (
        |  SELECT q_id, n_id, dot_i8,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_i8 DESC, n_id) AS BIGINT) AS rank
        |  FROM dots) WHERE rank <= 5""".stripMargin,

    // Mirror of graft.text.Stemmer.stemToken — same ordered rule chain;
    // all patterns are $-anchored so replace-first vs replace-all agree
    "q29_stem_freq" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents
        |), stems AS (
        |  SELECT CASE
        |    WHEN regexp_matches(t, 'sses$') THEN regexp_replace(t, 'sses$', 'ss')
        |    WHEN regexp_matches(t, 'ies$') THEN regexp_replace(t, 'ies$', 'y')
        |    WHEN regexp_matches(t, '^[a-z]*[aeiou][a-z]{2,}ing$') THEN regexp_replace(t, 'ing$', '')
        |    WHEN regexp_matches(t, '^[a-z]*[aeiou][a-z]+ed$') THEN regexp_replace(t, 'ed$', '')
        |    WHEN regexp_matches(t, '^[a-z]{3,}ly$') THEN regexp_replace(t, 'ly$', '')
        |    WHEN regexp_matches(t, '^[a-z]*[aeiou][a-z]*[^su]s$')
        |         AND NOT regexp_matches(t, 'ss$') THEN regexp_replace(t, 's$', '')
        |    ELSE t END AS stem
        |  FROM toks
        |)
        |SELECT stem, CAST(count(*) AS BIGINT) AS n
        |FROM stems GROUP BY stem HAVING count(*) >= 20""".stripMargin,

    // No CSV on the oracle side: the SQL replays format→parse on the
    // parquet directly — DuckDB strftime/strptime's %y uses the same POSIX
    // 68/69 century pivot as Sources.toDateMMDDYY's explicit correction.
    "q41_csv_roundtrip" ->
      """SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
        |       c.c_name AS c_name,
        |       CAST(strptime(strftime(o.o_orderdate, '%m/%d/%y'), '%m/%d/%y') AS DATE) AS o_date
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    // Same floor int8 quantization as q33; the near-dup predicate is pure
    // 64-bit integer arithmetic: dot>0 ∧ dot²·10⁴ ≥ 1600·|a|²·|b|² (τ=0.4)
    "q42_emb_neardup" ->
      """WITH s AS (
        |  SELECT CAST(max(list_max(list_transform(embedding, x -> abs(x)))) AS DOUBLE) / 127 AS g
        |  FROM embeddings
        |), v AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / g) AS BIGINT)) AS qv
        |  FROM embeddings, s
        |), w AS (
        |  SELECT vec_id, qv,
        |         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
        |  FROM v
        |), pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum(list_transform(generate_series(1, len(a.qv)), i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot_i8,
        |    a.n2 AS na2, b.n2 AS nb2
        |  FROM w a JOIN w b ON a.vec_id < b.vec_id
        |)
        |SELECT id_a, id_b, dot_i8 FROM pairs
        |WHERE dot_i8 > 0
        |  AND CAST(dot_i8 AS HUGEINT) * dot_i8 * 10000 >= CAST(1600 AS HUGEINT) * na2 * nb2""".stripMargin,

    // q16's pair derivation verbatim, then connected components as a
    // recursive transitive closure: min over each doc's reachable set ==
    // min-label fixpoint (components are small, so closure is cheap here;
    // the Spark side converges by iteration, not enumeration)
    "q43_dup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, 6),
        |                        j -> list_aggregate(list_transform(shingles,
        |                               s -> CAST('0x' || substr(md5(CAST((j+1)//2 AS VARCHAR) || ':' || s),
        |                                                 CASE WHEN j%2=1 THEN 1 ELSE 16 END, 15) AS BIGINT)),
        |                             'min')) AS mh
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b AS band_id,
        |         md5(CAST(mh[2*b-1] AS VARCHAR) || '|' || CAST(mh[2*b] AS VARCHAR)) AS bucket
        |  FROM sig, unnest(generate_series(1, 3)) AS u(b)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
        |  FROM bands a JOIN bands b
        |    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |), edges AS (
        |  SELECT a_doc AS src, b_doc AS dst FROM pairs
        |  UNION ALL SELECT b_doc, a_doc FROM pairs
        |), reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
        |)
        |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY id""".stripMargin,

    "q51_full_outer" ->
      """WITH l AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000),
        |r AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
        |SELECT CAST(COALESCE(l.c_custkey, r.o_custkey) AS BIGINT) AS cust_id,
        |       l.c_name AS c_name, r.n_orders AS n_orders
        |FROM l FULL JOIN r ON l.c_custkey = r.o_custkey""".stripMargin,

    "q52_cube" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       ${dSum("o_totalprice", 2, "sum_value")}
         |FROM orders
         |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "q53_order_deltas" ->
      """SELECT o_orderkey, o_custkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       o_totalprice - lag(o_totalprice) OVER w AS price_delta,
        |       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // co-moments as exact BIGINT sums over floor-quantized values; the
    // closed-form corr/covar combination is the IDENTICAL double
    // expression in both engines, so the doubles hash-match
    "q54_corr_stats" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_quantity) AS BIGINT) AS xq,
        |         CAST(floor(l_extendedprice) AS BIGINT) AS yq
        |  FROM lineitem
        |), m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |         CAST(sum(xq*xq) AS BIGINT) AS sxx,
        |         CAST(sum(xq*yq) AS BIGINT) AS sxy,
        |         CAST(sum(yq*yq) AS BIGINT) AS syy
        |  FROM q GROUP BY 1
        |)
        |SELECT l_returnflag, n, sx, sy, sxx, sxy, syy,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_pop,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
        |FROM m""".stripMargin,

    "q55_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       ${dSum("l_quantity", 2, "sum_value")}
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""".stripMargin,

    "q56_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       min(o_totalprice) AS min_value,
        |       max(o_totalprice) AS max_value
        |FROM orders GROUP BY 1""".stripMargin,

    // first 32 bits of md5(key) as an unsigned int vs fraction*2^32 —
    // the q44 content-addressed trick widened to per-stratum thresholds
    "q59_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) <
        |  CASE lang WHEN 'en' THEN 2147483648 WHEN 'de' THEN 4294967296
        |            WHEN 'es' THEN 1073741824 WHEN 'fr' THEN 429496729
        |            ELSE 0 END""".stripMargin,

    // strip_accents (utf8proc) ≡ NFD + drop combining marks for this
    // input; same lower/collapse/trim chain, 'g' flag = Spark's
    // replace-all default
    "q60_canonicalize" ->
      ("SELECT doc_id, " +
        "trim(regexp_replace(lower(strip_accents('Café  NAÏVE étude:' || chr(9) || text)), " +
        "'\\s+', ' ', 'g')) AS norm_text FROM documents"),

    "q66_json_extract" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "q67_window_frames" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(price_i) OVER w AS BIGINT) AS trail_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n,
        |  CAST(sum(price_i) OVER w AS BIGINT) / CAST(count(*) OVER w AS BIGINT) AS trail_avg,
        |  first_value(price_i) OVER w AS frame_first,
        |  CAST(sum(price_i) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT) AS ahead_sum
        |FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |        CAST(floor(o_totalprice) AS BIGINT) AS price_i FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q68_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide""".stripMargin,

    // 5 unrolled integer rounds — DuckDB's recursive CTEs forbid the
    // per-round aggregation PageRank needs, and the unrolled form is the
    // same recurrence the Spark loop runs, BIGINT for BIGINT
    "q69_pagerank" -> {
      def round(k: Int): String =
        s"""pr$k AS (
           |  SELECT n.node,
           |    CAST((SELECT base FROM params) + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS score
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, SUM(p.score // d.deg) AS s
           |    FROM pr${k - 1} p JOIN deg d ON p.node = d.node
           |    JOIN edges e ON e.src = p.node
           |    GROUP BY e.dst) m ON n.node = m.node)""".stripMargin
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
        |params AS (SELECT CAST(1000000000000 // count(*) AS BIGINT) AS init,
        |                  CAST((15 * (1000000000000 // count(*))) // 100 AS BIGINT) AS base
        |           FROM nodes),
        |pr0 AS (SELECT node, (SELECT init FROM params) AS score FROM nodes),
        |""".stripMargin +
        (1 to 5).map(round).mkString(",\n") +
        "\nSELECT node, score FROM pr5"
    },

    "q70_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(t) - 3, 0)),
        |      i -> array_to_string(t[i:i+3], ' ')))) AS gram
        |  FROM toks
        |), bg AS (
        |  SELECT DISTINCT gram FROM grams WHERE doc_id % 100 = 0
        |)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
        |FROM grams g JOIN bg USING (gram)
        |WHERE g.doc_id % 100 <> 0
        |GROUP BY 1""".stripMargin,

    // constants written as the SAME double arithmetic the engine runs
    // ((1.2 + 1.0), (1 - 0.75)) so both engines fold to identical bits
    "q71_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         CAST(sum(len(ts)) AS DOUBLE) AS sum_len,
        |         CAST(sum(CASE WHEN list_contains(ts, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |         CAST(sum(CASE WHEN list_contains(ts, 'join') THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |         CAST(sum(CASE WHEN list_contains(ts, 'fast') THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |  FROM toks
        |), per AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS DOUBLE) AS len,
        |    CAST(len(ts) - len(list_filter(ts, x -> x <> 'spark')) AS DOUBLE) AS tf0,
        |    CAST(len(ts) - len(list_filter(ts, x -> x <> 'join')) AS DOUBLE) AS tf1,
        |    CAST(len(ts) - len(list_filter(ts, x -> x <> 'fast')) AS DOUBLE) AS tf2
        |  FROM toks
        |)
        |SELECT doc_id,
        |  CAST(floor((
        |      ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0))
        |        / (tf0 + 1.2 * ((1 - 0.75) + 0.75 * len / (sum_len / n_docs)))
        |    + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0))
        |        / (tf1 + 1.2 * ((1 - 0.75) + 0.75 * len / (sum_len / n_docs)))
        |    + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0))
        |        / (tf2 + 1.2 * ((1 - 0.75) + 0.75 * len / (sum_len / n_docs)))
        |  ) * 1000000.0) AS BIGINT) AS bm25_q
        |FROM per, stats""".stripMargin,

    "q63_rank_family" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q64_monthly" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       ${dSum("o_totalprice", 2, "sum_price")}
         |FROM orders GROUP BY 1""".stripMargin,

    "q65_fuzzy_names" ->
      """SELECT c_custkey, s_suppkey,
        |       CAST(levenshtein(c_name, s_name) AS BIGINT) AS edit_dist
        |FROM customer c JOIN supplier s
        |  ON regexp_extract(c_name, '([0-9]{2})$', 1) = regexp_extract(s_name, '([0-9]{2})$', 1)
        |WHERE levenshtein(c_name, s_name) <= 7""".stripMargin,

    "q62_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ts) >= 3
        |         THEN list_transform(generate_series(1, len(ts)-2),
        |                             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
        |         ELSE [] END AS tri
        |  FROM t
        |)
        |SELECT doc_id,
        |  CAST(len(tri) AS BIGINT) AS n_tri,
        |  CAST(len(tri) - len(list_distinct(tri)) AS BIGINT) AS dup_tri,
        |  CASE WHEN len(tri) > 0
        |       THEN CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE)
        |       ELSE 0.0 END AS dup_ratio
        |FROM g""".stripMargin,

    "q61_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-000-'
        |             || lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' see https://ex.com/d/' || CAST(doc_id AS VARCHAR),
        |        'https?://[^ ]+', '[URL]', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '[PHONE]', 'g') AS clean_text
        |FROM documents""".stripMargin,

    "q49_pivot" ->
      """SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 50 AS INT) AS long_doc,
        |       CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS de,
        |       CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS en,
        |       CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS es,
        |       CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
        |       CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS zh
        |FROM documents GROUP BY 1""".stripMargin,

    "q50_median" ->
      """SELECT o_orderpriority,
        |       quantile_cont(o_totalprice, 0.5) AS median_price,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "q48_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers, ${dSum("c_acctbal", 2, "sum_acctbal")}
         |FROM customer c
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    // RANGE frame over epoch micros; ties on the timestamp are included by
    // RANGE semantics identically in both engines
    "q47_rolling_hour" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id,
        |       CAST(user_id AS BIGINT) AS user_id,
        |       CAST(count(*) OVER w AS BIGINT) AS n_win,
        |       CAST(sum(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sum_win
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // Keys and char counts recomputed from parquet — the Spark side must
    // round-trip them through real files and path parsing
    "q46_corpus_scan" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(20000101 + doc_id AS VARCHAR) AS report_date_raw,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL""".stripMargin,

    // q16's pair CTEs + exact Jaccard over distinct shingle sets; the
    // division is the same (int intersection)/(int union) in IEEE double
    // on both engines, so even the float column hash-matches
    "q45_jaccard_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, 6),
        |                        j -> list_aggregate(list_transform(shingles,
        |                               s -> CAST('0x' || substr(md5(CAST((j+1)//2 AS VARCHAR) || ':' || s),
        |                                                 CASE WHEN j%2=1 THEN 1 ELSE 16 END, 15) AS BIGINT)),
        |                             'min')) AS mh
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b AS band_id,
        |         md5(CAST(mh[2*b-1] AS VARCHAR) || '|' || CAST(mh[2*b] AS VARCHAR)) AS bucket
        |  FROM sig, unnest(generate_series(1, 3)) AS u(b)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
        |  FROM bands a JOIN bands b
        |    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |), sets AS (
        |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh
        |), scored AS (
        |  SELECT p.a_doc, p.b_doc,
        |         CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE) /
        |           (len(sa.sset) + len(sb.sset) - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))))
        |           AS jaccard
        |  FROM pairs p
        |  JOIN sets sa ON p.a_doc = sa.doc_id
        |  JOIN sets sb ON p.b_doc = sb.doc_id
        |)
        |SELECT a_doc, b_doc, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin,

    // Same md5 first-byte bucket arithmetic; token mirror is q12's
    "q44_hash_split" ->
      """SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT) < 205
        |            THEN 'train' ELSE 'holdout' END AS split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY 1""".stripMargin,

    "q72_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
        |  FROM t
        |)
        |SELECT doc_id, n_tok, end_off - n_tok AS start_off, end_off,
        |       CAST((end_off - n_tok) // 512 AS BIGINT) AS first_seq,
        |       CAST(greatest((end_off - 1) // 512, (end_off - n_tok) // 512) AS BIGINT) AS last_seq
        |FROM o""".stripMargin,

    // identical to q70's oracle by design: the bloom path must return the
    // exact-join answer bit for bit
    "q73_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(t) - 3, 0)),
        |      i -> array_to_string(t[i:i+3], ' ')))) AS gram
        |  FROM toks
        |), bg AS (
        |  SELECT DISTINCT gram FROM grams WHERE doc_id % 100 = 0
        |)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
        |FROM grams g JOIN bg USING (gram)
        |WHERE g.doc_id % 100 <> 0
        |GROUP BY 1""".stripMargin,

    "q74_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents
        |), tot AS (SELECT count(*) AS n FROM tok)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok, tot
        |GROUP BY token, n
        |HAVING count(*) * 100 > n""".stripMargin,

    "q75_orc_roundtrip" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_i,
        |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY 1""".stripMargin,

    // candidate/verify split: the oracle replays q45's exact-Jaccard
    // scoring over the persisted candidate pairs the native-LSH stage
    // wrote — distinct 3-token shingle sets, |A∩B| / (|A|+|B|−|A∩B|),
    // threshold 0.5
    "q24_near_dedup_fast" ->
      s"""WITH cands AS (
         |  SELECT a_doc, b_doc FROM read_parquet('${predsPath("q24_cands")}/*.parquet')
         |), t AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(generate_series(1, len(ts)-2),
         |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sset
         |  FROM t WHERE len(ts) >= 3
         |), scored AS (
         |  SELECT c.a_doc, c.b_doc,
         |         CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE) /
         |           (len(sa.sset) + len(sb.sset) - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))))
         |           AS jaccard
         |  FROM cands c
         |  JOIN sh sa ON c.a_doc = sa.doc_id
         |  JOIN sh sb ON c.b_doc = sb.doc_id
         |)
         |SELECT a_doc, b_doc, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin,

    // shortlist/re-rank split: the oracle replays the exact re-rank
    // (quantized dots over the persisted unit vectors' stored float
    // bits + top-k with n_id tie-break) over the persisted shortlist —
    // q17's ranking formulation applied to the serving path's files
    "q94_ivfpq_serving" ->
      s"""WITH sl AS (
         |  SELECT q_id, n_id FROM read_parquet('${predsPath("q94_shortlist")}/*.parquet')
         |), u AS (
         |  SELECT vec_id, unit FROM read_parquet('${predsPath("q94_units")}/*.parquet')
         |), dots AS (
         |  SELECT s.q_id, s.n_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(a.unit)), i ->
         |      CAST(floor(CAST(a.unit[i] AS DOUBLE) * CAST(b.unit[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS dot_q
         |  FROM sl s
         |  JOIN u a ON s.q_id = a.vec_id
         |  JOIN u b ON s.n_id = b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT q_id, n_id, dot_q,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot_q DESC, n_id) AS BIGINT) AS rank
         |  FROM dots) WHERE rank <= 5""".stripMargin,

    // candidate/verify split: the oracle replays the exact-cosine verify
    // (per-element floor products at 10^12, integer sums, IEEE
    // division/sqrt, threshold with the engine's conservative margin)
    // over the SAME persisted candidate pairs the LSH stage wrote —
    // q17's quantized-dot formulation applied to stored ids
    "q25_sim_lsh" ->
      s"""WITH cands AS (
         |  SELECT a_doc, b_doc
         |  FROM read_parquet('${predsPath("q25_cands")}/*.parquet')
         |), nrm AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_sum(list_transform(generate_series(1, len(embedding)), i ->
         |      CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS nrm
         |  FROM embeddings
         |), scored AS (
         |  SELECT c.a_doc AS a_id, c.b_doc AS b_id,
         |    CAST(CAST(list_sum(list_transform(generate_series(1, len(a.embedding)), i ->
         |      CAST(floor(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT)))
         |      AS BIGINT) AS DOUBLE)
         |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS cosine
         |  FROM cands c
         |  JOIN nrm a ON c.a_doc = a.vec_id
         |  JOIN nrm b ON c.b_doc = b.vec_id
         |)
         |SELECT a_id, b_id, cosine FROM scored
         |WHERE cosine >= CAST(0.3 AS DOUBLE) + CAST(1e-9 AS DOUBLE)""".stripMargin,

    // fit/serve split: the oracle replays the confusion aggregation over
    // the SAME predictions parquet the Spark query persisted — the LR fit
    // is upstream of the compared relational work, so identical stored
    // bits make the count grouping hash-exact
    "q23_lr_confusion" ->
      s"""SELECT label, prediction, count(*) AS n
         |FROM read_parquet('${predsPath("q23_preds")}/*.parquet')
         |GROUP BY 1, 2""".stripMargin,

    // fit/serve split: positives filter, SIC//10 bucketing, top-50-per-
    // bucket prune (prob DESC, doc_id tiebreak — groupedTopK's total
    // order) and the ap.prob*tp.prob pair join, replayed in DuckDB over
    // the persisted predictions. Double multiply of identical stored bits
    // is IEEE-exact on both engines.
    "q27_pair_scoring" ->
      s"""WITH s AS (
         |  SELECT doc_id, CAST(sic // 10 AS INTEGER) AS bucket, prob
         |  FROM read_parquet('${predsPath("q27_preds")}/*.parquet')
         |  WHERE prediction = 1.0
         |), r AS (
         |  SELECT doc_id, bucket, prob,
         |         row_number() OVER (PARTITION BY bucket
         |           ORDER BY prob DESC, doc_id ASC) AS rn
         |  FROM s
         |), k AS (
         |  SELECT doc_id, bucket, prob FROM r WHERE rn <= 50
         |)
         |SELECT a.doc_id AS a_id, t.doc_id AS t_id, a.bucket AS bucket,
         |       a.prob * t.prob AS pair_prob
         |FROM k a JOIN k t ON a.bucket = t.bucket
         |WHERE a.doc_id <> t.doc_id""".stripMargin,

    "q76_length_gate" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, n_tok,
        |         row_number() OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tok FROM r WHERE rn <= CAST(ceil(n * 0.5) AS BIGINT)""".stripMargin,

    "q77_group_sample" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, lang FROM r WHERE rn <= 20""".stripMargin,

    // q16/q45's md5-LSH pipeline with the pair space restricted to
    // cross-side (new × existing) collisions
    "q78_incremental_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, 6),
        |                        j -> list_aggregate(list_transform(shingles,
        |                               s -> CAST('0x' || substr(md5(CAST((j+1)//2 AS VARCHAR) || ':' || s),
        |                                                 CASE WHEN j%2=1 THEN 1 ELSE 16 END, 15) AS BIGINT)),
        |                             'min')) AS mh
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b AS band_id,
        |         md5(CAST(mh[2*b-1] AS VARCHAR) || '|' || CAST(mh[2*b] AS VARCHAR)) AS bucket
        |  FROM sig, unnest(generate_series(1, 3)) AS u(b)
        |), bandsz AS (
        |  SELECT doc_id, band_id, bucket,
        |         count(*) OVER (PARTITION BY band_id, bucket, doc_id % 3 = 0) AS bsz
        |  FROM bands
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
        |  FROM bandsz a JOIN bandsz b
        |    ON a.band_id = b.band_id AND a.bucket = b.bucket
        |  WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
        |    AND a.bsz <= 1000 AND b.bsz <= 1000
        |), sets AS (
        |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh
        |), scored AS (
        |  SELECT p.a_doc, p.b_doc,
        |         CAST(len(list_filter(sa.sset, x -> list_contains(sb.sset, x))) AS DOUBLE) /
        |           (len(sa.sset) + len(sb.sset) - len(list_filter(sa.sset, x -> list_contains(sb.sset, x))))
        |           AS jaccard
        |  FROM pairs p
        |  JOIN sets sa ON p.a_doc = sa.doc_id
        |  JOIN sets sb ON p.b_doc = sb.doc_id
        |)
        |SELECT a_doc, b_doc, jaccard FROM scored WHERE jaccard >= 0.5""".stripMargin,

    "q79_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), k AS (
        |  SELECT doc_id, ts,
        |         CAST(greatest(ceil((len(ts) - 32.0) / 16), 0) AS BIGINT) AS last_k
        |  FROM t WHERE len(ts) > 0
        |)
        |SELECT doc_id,
        |       u.k AS chunk_id,
        |       CAST(u.k * 16 + 1 AS BIGINT) AS start,
        |       CAST(len(ts[(u.k*16+1):(u.k*16+32)]) AS BIGINT) AS n_tok,
        |       array_to_string(ts[(u.k*16+1):(u.k*16+32)], ' ') AS chunk_text
        |FROM k, unnest(generate_series(0, last_k)) AS u(k)""".stripMargin,

    "q80_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |         CAST(sum(n_tok) OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tok, cum_tok FROM c WHERE cum_tok - n_tok < 2000""".stripMargin,

    "q81_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w
        |  FROM documents
        |), kq AS (
        |  SELECT doc_id, lang, w,
        |         CAST(floor(1e12 * ln(
        |             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1.0)
        |               / 4294967296.0) / w) AS BIGINT) AS key_q
        |  FROM t WHERE w > 0
        |), r AS (
        |  SELECT doc_id, lang, w, key_q,
        |         row_number() OVER (PARTITION BY lang ORDER BY key_q DESC, doc_id) AS rn
        |  FROM kq
        |)
        |SELECT doc_id, lang, w, key_q FROM r WHERE rn <= 15""".stripMargin,

    "q82_sparse_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), d AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
        |  GROUP BY 1 HAVING count(*) >= 2 AND count(*) <= 400
        |), w AS (
        |  SELECT doc_id, tf.tok, (tf * 1000000) // df AS wt
        |  FROM tf JOIN d ON tf.tok = d.tok
        |), n AS (
        |  SELECT doc_id, sum(wt * wt) AS nrm FROM w GROUP BY 1
        |), dots AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(sum(a.wt * b.wt) AS BIGINT) AS dot
        |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a_id, b_id, dot,
        |       CAST(dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS cosine
        |FROM dots
        |JOIN n na ON dots.a_id = na.doc_id
        |JOIN n nb ON dots.b_id = nb.doc_id
        |WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) >= 0.9""".stripMargin,

    "q83_unigram_nll" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1
        |), vq AS (
        |  SELECT tok,
        |         CAST(floor(1e6 * (ln(CAST((SELECT sum(c) FROM c) AS DOUBLE))
        |                           - ln(CAST(c AS DOUBLE)))) AS BIGINT) AS q
        |  FROM c
        |)
        |SELECT doc_id,
        |       CAST(sum(tf) AS BIGINT) AS n_tok,
        |       CAST(sum(tf * q) // sum(tf) AS BIGINT) AS nll_q
        |FROM tf JOIN vq USING (tok)
        |GROUP BY 1""".stripMargin,

    "q84_survivors" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(ts)-2),
        |                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS shingles
        |  FROM t WHERE len(ts) >= 3
        |), sig AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, 6),
        |                        j -> list_aggregate(list_transform(shingles,
        |                               s -> CAST('0x' || substr(md5(CAST((j+1)//2 AS VARCHAR) || ':' || s),
        |                                                 CASE WHEN j%2=1 THEN 1 ELSE 16 END, 15) AS BIGINT)),
        |                             'min')) AS mh
        |  FROM sh
        |), bands AS (
        |  SELECT doc_id, b AS band_id,
        |         md5(CAST(mh[2*b-1] AS VARCHAR) || '|' || CAST(mh[2*b] AS VARCHAR)) AS bucket
        |  FROM sig, unnest(generate_series(1, 3)) AS u(b)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
        |  FROM bands a JOIN bands b
        |    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |), edges AS (
        |  SELECT a_doc AS src, b_doc AS dst FROM pairs
        |  UNION ALL SELECT b_doc, a_doc FROM pairs
        |), reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
        |), clusters AS (
        |  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        |  FROM reach GROUP BY id
        |), ranked AS (
        |  SELECT c.cluster_id, c.doc_id,
        |         CAST(len(t.ts) AS BIGINT) AS n_tok,
        |         row_number() OVER (PARTITION BY c.cluster_id
        |           ORDER BY len(t.ts) DESC, c.doc_id) AS rn
        |  FROM clusters c JOIN t ON c.doc_id = t.doc_id
        |)
        |SELECT cluster_id, doc_id AS survivor_id, n_tok
        |FROM ranked WHERE rn = 1""".stripMargin,

    "q85_overlap_join" ->
      """WITH c AS (SELECT event_id AS c_id, user_id, ts AS c_lo,
        |                  ts + INTERVAL 20 MINUTE AS c_hi
        |           FROM events WHERE event_type = 'click'),
        |     p AS (SELECT event_id AS p_id, user_id, ts AS p_lo,
        |                  ts + INTERVAL 35 MINUTE AS p_hi
        |           FROM events WHERE event_type = 'purchase')
        |SELECT c_id, p_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |              AND c.c_lo < p.p_hi AND p.p_lo < c.c_hi""".stripMargin,

    "q86_fertility" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(lower(text),
        |         '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s'']+')) AS BIGINT) AS n_units,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words
        |  FROM documents WHERE len(trim(text)) > 0
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_units) AS BIGINT) AS sum_units,
        |       CAST(sum(n_words) AS BIGINT) AS sum_words,
        |       CAST((sum(n_units) * 1000000) // sum(n_words) AS BIGINT) AS fertility_q
        |FROM t GROUP BY 1""".stripMargin,

    "q87_token_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), n AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1
        |), h AS (
        |  SELECT tf.doc_id, n.n,
        |         CAST(floor(1e6 * tf * (ln(CAST(n AS DOUBLE)) - ln(CAST(tf AS DOUBLE)))) AS BIGINT) AS h_q
        |  FROM tf JOIN n ON tf.doc_id = n.doc_id
        |)
        |SELECT doc_id, CAST(min(n) AS BIGINT) AS n_tok,
        |       CAST(sum(h_q) // min(n) AS BIGINT) AS entropy_q
        |FROM h GROUP BY 1""".stripMargin,

    "q88_emb_dim_stats" ->
      """SELECT CAST(i - 1 AS BIGINT) AS dim,
        |       CAST(count(*) AS BIGINT) AS n_vec,
        |       CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,9))) AS DOUBLE) AS sum_x,
        |       CAST(min(embedding[i]) AS DOUBLE) AS min_x,
        |       CAST(max(embedding[i]) AS DOUBLE) AS max_x
        |FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |GROUP BY 1""".stripMargin,

    "q89_emb_outliers" ->
      """WITH l AS (
        |  SELECT d.lang, e.vec_id AS doc_id, i - 1 AS dim,
        |         CAST(floor(1e6 * (CAST(embedding[i] AS DOUBLE) + 1024.0)) AS BIGINT) AS qx
        |  FROM embeddings e
        |  JOIN documents d ON e.vec_id = d.doc_id,
        |       unnest(generate_series(1, len(embedding))) AS t(i)
        |), c AS (
        |  SELECT lang, dim, sum(qx) // count(*) AS qc FROM l GROUP BY 1, 2
        |), dist AS (
        |  SELECT l.lang, l.doc_id,
        |         CAST(sum((qx - qc) * (qx - qc)) AS BIGINT) AS dist_q
        |  FROM l JOIN c USING (lang, dim) GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, doc_id, dist_q,
        |         row_number() OVER (PARTITION BY lang ORDER BY dist_q DESC, doc_id) AS rn
        |  FROM dist
        |)
        |SELECT lang, doc_id, dist_q FROM r WHERE rn <= 10""".stripMargin,

    "q90_window_distinct" ->
      """SELECT date_trunc('hour', ts) AS hour,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "q92_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
        |), e AS (
        |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM li x JOIN li y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        |), tri AS (
        |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT u AS node FROM tri
        |  UNION ALL SELECT v FROM tri
        |  UNION ALL SELECT w FROM tri
        |) GROUP BY 1""".stripMargin
  )
}
