package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import QueryShared.predsPath

/** Round-10 surfaces (q386+): the convergence-witnessed PageRank
  * (epsilon-stop loop whose realized stop round rides the output AND
  * parameterizes a dynamically-unrolled oracle), the bias-baseline
  * recommender promoted to a persisted fit/serve artifact, and the SRM
  * gate's custom-keyed-state streaming form.
  *
  * New mechanism in this file: [[sql]] is a `def`, not a `val` — the
  * q386 oracle text embeds the stop round the engine REALIZED, which
  * only exists after the query has run. `graft.Verify` dumps
  * `oracle_sql.json` after executing every query, and
  * [[graft.SparkEntry.oracleSql]] re-merges the area maps on each
  * access, so the dynamic entry is always read post-run. Entries for
  * queries that have not run fall back to a 1-round unroll — harmless,
  * because the driver only replays oracles for dumped results. */
object Analytics4Queries {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(30,2)") * 100).cast("long")

  /** Realized q386 stop round, set by the query run and read by the
    * dynamic oracle entry (-1 = not run this process). */
  private[graft] val prStopRound = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** The q69 interaction graph (customer/supplier bipartite, doubled to
    * undirected) — reused so the convergence twin anchors to the same
    * fixed-round recurrence the q69 oracle already replays. */
  private def interactionEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Convergence-WITNESSED PageRank (the q69 recurrence with an
    // epsilon-stop loop instead of a fixed round count): iterate until
    // the exact L1 residual drops to <= 2.5e11 scale units (25% of
    // total mass — measured ~9 rounds on this graph; the bipartite
    // doubling slows the 0.85^r contraction) or 20 rounds.
    // The realized stop round and final residual ride EVERY output row,
    // and the oracle — generated AFTER the run — unrolls exactly
    // stop_round rounds of the identical integer recurrence and
    // recomputes the final residual from its own last two rounds: the
    // termination behavior itself is hash-checked, not just the scores.
    // GraphSpec pins the residual monotonicity and stop-condition laws.
    "q386_pagerank_converged" -> ((s, dir) => {
      val (scores, stopRound, residuals) =
        ops.Graph.pageRankIntConverged(interactionEdges(s, dir),
          maxIters = 20, epsilonUnits = 250000000000L)
      prStopRound.set(stopRound)
      scores
        .withColumn("stop_round", lit(stopRound.toLong))
        .withColumn("final_residual", lit(residuals.last))
    }),


    // Bias-baseline recommender as a PERSISTED fit/serve split (the
    // q186/q169 shape over q385's promoted ml.Models.biasBaseline): the
    // fit half writes the (mu, b_i, b_u) artifacts once; the SERVE half
    // — what this query registers — scores every 20th customer's
    // held-out (fold 0) interactions from the STORED artifacts, clamped
    // to the rating bounds. The oracle replays the serve joins from the
    // same parquet artifacts, so the check is exact however the fit ran.
    "q387_bias_serving" -> ((s, dir) => {
      val r = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"),
            (col("l_quantity").cast("long") * 100).as("q_c")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
          col("q_c"), (col("o_orderkey") % 2).as("fold"))
      val (mu, bi, bu) = ml.Models.biasBaseline(
        r.filter(col("fold") === 1), "u", "i", "q_c")
      mu.coalesce(1).write.mode("overwrite").parquet(predsPath("q387_mu"))
      bi.coalesce(1).write.mode("overwrite").parquet(predsPath("q387_bi"))
      bu.coalesce(1).write.mode("overwrite").parquet(predsPath("q387_bu"))
      val muS = s.read.parquet(predsPath("q387_mu"))
      val biS = s.read.parquet(predsPath("q387_bi"))
      val buS = s.read.parquet(predsPath("q387_bu"))
      r.filter(col("fold") === 0 && col("u") % 20 === 0)
        .crossJoin(broadcast(muS))
        .join(biS, Seq("i"), "left")
        .join(buS, Seq("u"), "left")
        .withColumn("pred_c",
          greatest(lit(100L), least(lit(5000L),
            col("mu_c") + coalesce(col("b_i"), lit(0L)) +
              coalesce(col("b_u"), lit(0L)))))
        .select(col("u"), col("i"), col("q_c"), col("pred_c"))
    }),


    // §2.8 custom keyed state over the EXPERIMENT surface: the SRM gate
    // maintained in flatMapGroupsWithState (cumulative per-variant
    // counters — ONE record per arm, bounded by design, which is why
    // NoTimeout needs no watermark eviction here; see the method's
    // scaladoc for the unbounded-domain contrast). Update-mode
    // emissions land batchId-keyed; readout = each variant's latest
    // cumulative emission -> the same srmFromCounts chi-square as batch
    // q208, which is exactly what the oracle replays.
    "q388_srm_keyed_stream" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"))
      val root = predsPath(s"q388_root_${System.nanoTime()}")
      sources.Sources.writeParquet(ev.repartition(6), s"$root/events")
      streaming.Streams.srmKeyedStream(s, s"$root/events", ev.schema,
        s"$root/partials", s"$root/ckpt",
        groupCol = "event_type", userCol = "user_id")
    }),
  )

  /** q69's unrolled-round oracle generator, parameterized by round count
    * — the fixed-round anchor the convergence witness replays against. */
  private def pagerankUnrolledSql(rounds: Int): String = {
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
      (1 to rounds).map(round).mkString(",\n") +
      s""",
         |resid AS (
         |  SELECT CAST(SUM(ABS(a.score - b.score)) AS BIGINT) AS r
         |  FROM pr$rounds a JOIN pr${rounds - 1} b ON a.node = b.node)
         |SELECT a.node, a.score,
         |  CAST($rounds AS BIGINT) AS stop_round,
         |  resid.r AS final_residual
         |FROM pr$rounds a CROSS JOIN resid""".stripMargin
  }

  /** Dynamic oracle map — see the object scaladoc for why this is a
    * `def`: the q386 entry must embed the post-run stop round. */
  def sql: Map[String, String] = Map(

    "q386_pagerank_converged" ->
      pagerankUnrolledSql(math.max(1, prStopRound.get)),

    // serve replayed from the SAME persisted bias artifacts: identical
    // coalesce-and-clamp arithmetic, identical sampled user set
    "q387_bias_serving" ->
      s"""WITH r AS (
         |  SELECT o_custkey AS u, l_partkey AS i,
         |    CAST(l_quantity AS BIGINT) * 100 AS q_c,
         |    o_orderkey % 2 AS fold
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |mu AS (SELECT mu_c FROM
         |  read_parquet('${predsPath("q387_mu")}/*.parquet')),
         |bi AS (SELECT i, b_i FROM
         |  read_parquet('${predsPath("q387_bi")}/*.parquet')),
         |bu AS (SELECT u, b_u FROM
         |  read_parquet('${predsPath("q387_bu")}/*.parquet'))
         |SELECT r.u, r.i, r.q_c,
         |  greatest(100, least(5000, mu.mu_c + COALESCE(bi.b_i, 0)
         |    + COALESCE(bu.b_u, 0))) AS pred_c
         |FROM r CROSS JOIN mu
         |LEFT JOIN bi ON r.i = bi.i
         |LEFT JOIN bu ON r.u = bu.u
         |WHERE r.fold = 0 AND r.u % 20 = 0""".stripMargin,

    // the q208 batch algebra — the keyed-state drain must land exactly
    // here under any batch split
    "q388_srm_keyed_stream" ->
      """WITH a AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM events GROUP BY 1
        |), e AS (
        |  SELECT *, CAST(n0 + n1 AS DOUBLE) / 2.0 AS expected FROM a
        |)
        |SELECT event_type, n0, n1,
        |  (CAST(n0 AS DOUBLE) - expected) * (CAST(n0 AS DOUBLE) - expected)
        |    / expected
        |  + (CAST(n1 AS DOUBLE) - expected) * (CAST(n1 AS DOUBLE) - expected)
        |    / expected AS chi2,
        |  (CAST(n0 AS DOUBLE) - expected) * (CAST(n0 AS DOUBLE) - expected)
        |    / expected
        |  + (CAST(n1 AS DOUBLE) - expected) * (CAST(n1 AS DOUBLE) - expected)
        |    / expected > 3.841 AS srm
        |FROM e""".stripMargin,
  )
}
