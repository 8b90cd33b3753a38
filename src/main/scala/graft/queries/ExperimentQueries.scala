package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryShared._

/** Experiment analytics and supervised-baseline surfaces: CUPED variance
  * reduction, sample-ratio-mismatch gating, multi-touch linear
  * attribution, grouped least-squares, nearest-centroid classification,
  * and cohort LTV curves.
  *
  * Portability recipe throughout: every aggregate is integer-exact
  * (cents / micro-units, BIGINT sums), and ratios/regression
  * coefficients are derived from those exact integers by a FIXED
  * sequence of IEEE double operations mirrored token-for-token in the
  * oracle SQL — float accumulation (the one order-dependent operation)
  * never happens on either engine.
  */
object ExperimentQueries {

  private val cut = "2024-01-16"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CUPED (controlled-experiment variance reduction): per-user
    // pre-period metric X and post-period metric Y fold in ONE grouped
    // pass (conditional sums, map-side partial); θ = cov(X,Y)/var(X)
    // comes from a scalar aggregate over the user grain (the
    // crossJoin(broadcast(scalar)) idiom), and each variant's adjusted
    // mean Ŷ−θ(X̄_v−X̄) is exact-integer algebra + doubles at the end.
    // At 100 TB the user-grain frame is the only shuffle; the scalar
    // stats and the variant rollup both reduce it map-side.
    "q207_cuped" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .select(col("user_id"),
          (col("value").cast("decimal(30,2)") * 100).cast("long").as("c"),
          (col("ts") < lit(cut).cast("timestamp_ntz")).as("pre"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
          sum(when(col("pre"), lit(0L)).otherwise(col("c"))).as("y"))
      val g = perUser.agg(
        count(lit(1)).cast("double").as("gn"),
        sum(col("x")).cast("double").as("gsx"),
        sum(col("y")).cast("double").as("gsy"),
        sum(col("x") * col("y")).cast("double").as("gsxy"),
        sum(col("x") * col("x")).cast("double").as("gsxx"))
      perUser
        .groupBy((col("user_id") % 2).cast("int").as("variant"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sum_x_cents"),
          sum(col("y")).as("sum_y_cents"))
        .crossJoin(broadcast(g))
        .withColumn("theta",
          (col("gn") * col("gsxy") - col("gsx") * col("gsy")) /
            (col("gn") * col("gsxx") - col("gsx") * col("gsx")))
        .withColumn("mean_y",
          col("sum_y_cents").cast("double") /
            (col("n").cast("double") * 100.0))
        .withColumn("mean_adj",
          (col("sum_y_cents").cast("double") / col("n").cast("double") -
            col("theta") *
              (col("sum_x_cents").cast("double") / col("n").cast("double") -
                col("gsx") / col("gn"))) / 100.0)
        .select(col("variant"), col("n"), col("sum_x_cents"),
          col("sum_y_cents"), col("theta"), col("mean_y"), col("mean_adj"))
    }),


    // Sample-ratio mismatch gate: per event type, the 50/50 split's
    // chi-square statistic from exact counts — the pre-read every
    // experiment readout must pass before its metrics mean anything.
    // One grouped pass, map-side partial; the chi² is derived math.
    "q208_srm_check" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
        .withColumn("expected", (col("n0") + col("n1")).cast("double") / 2.0)
      d.withColumn("chi2",
          (col("n0").cast("double") - col("expected")) *
            (col("n0").cast("double") - col("expected")) / col("expected") +
            (col("n1").cast("double") - col("expected")) *
              (col("n1").cast("double") - col("expected")) / col("expected"))
        .withColumn("srm", col("chi2") > 3.841)
        .select(col("event_type"), col("n0"), col("n1"), col("chi2"),
          col("srm"))
    }),


    // Multi-touch LINEAR attribution (the even-split counterpart of
    // q200's last-touch): every view within the purchase's 24 h lookback
    // shares the credit equally, credit = 1000000 div n in integer
    // micro-units so the split is exact and order-free (1/n double sums
    // are not). The join is user-equi + a time-range residual — shuffle
    // by user only, never an inequality-only join; the per-purchase
    // window count runs on the already-joined grain.
    "q209_linear_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      val joined = purchases.join(views, Seq("user_id"))
        .filter(col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
        .withColumn("n_views",
          count(lit(1)).over(Window.partitionBy(col("p_id"))))
        .withColumn("credit_micros", expr("1000000 div n_views"))
      joined
        .groupBy(hour(col("v_ts")).cast("long").as("view_hour"))
        .agg(count(lit(1)).as("n_credited"),
          sum(col("credit_micros")).as("credit_micros"))
    }),


    // Grouped least squares (price-vs-quantity slope per brand): the
    // five sufficient statistics (n, Σx, Σy, Σxy, Σx²) fold in ONE
    // grouped pass as exact BIGINTs; slope and intercept are a fixed
    // double formula over them. The closed form needs no iteration, no
    // driver round-trips — at any scale this is one map-side-partial
    // aggregate over the broadcast-joined brand key.
    "q210_group_regression" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast("decimal(30,2)") * 100).cast("long")
            .as("y"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_cents",
          (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
        .withColumn("intercept_cents",
          (col("sy").cast("double") -
            col("slope_cents") * col("sx").cast("double")) /
            col("n").cast("double"))
        .select(col("p_brand"), col("n"), col("slope_cents"),
          col("intercept_cents"))),


    // Nearest-centroid classifier, fit+serve in one plan: class
    // centroids from offset-positive micro-quantized dims (the q89
    // recipe — `div`//`//` agree on non-negatives), then every vector
    // scores against the 10-row broadcast centroid table with an exact
    // BIGINT squared distance (zip_with/aggregate — codegen'd, no UDF);
    // argmin by (dist², label) is deterministic. Scale shape: the fit is
    // a dims×labels aggregate (tiny output), the serve is a constant-key
    // broadcast hash join — embeddings shuffle once for the per-vector
    // window, nothing is quadratic in the corpus.
    "q211_centroid_classify" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          transform(col("embedding"),
            x => round((x.cast("double") + lit(1024.0)) * 1e6).cast("long"))
            .as("q"))
      val cent = emb
        .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
        .withColumn("c", expr("sv div nv"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("cvec"))
        .select(col("label").as("c_label"), col("cvec"))
      // the all-vectors×all-centroids attach as a BROADCAST HASH join:
      // the key is constant-valued but derived from a real column on
      // each side, so Catalyst cannot fold the equality away into a
      // nested-loop plan — every row probes the tiny hash table instead
      val scored = emb
        .withColumn("_k", pmod(col("vec_id"), lit(1L)).cast("int"))
        .join(broadcast(cent
            .withColumn("_k", pmod(col("c_label"), lit(1L)).cast("int"))),
          Seq("_k"))
        .withColumn("dist2",
          aggregate(zip_with(col("q"), col("cvec"),
            (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("dist2"), col("c_label"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("c_label").as("pred_label"),
          col("dist2"))
    }),


    // Cohort LTV curve: cohort = the user's first-activity date, age in
    // days, per-(cohort, age) active users and purchase revenue, and the
    // running cumulative revenue per cohort. Two shuffles (user grain
    // for first-activity, cohort/age rollup) plus one cohort-partitioned
    // window — each cohort's curve is one partition, never a global sort.
    "q212_cohort_ltv" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cohorts = ev.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort"))
      ev.join(cohorts, Seq("user_id"))
        .withColumn("age_days",
          datediff(to_date(col("ts")), col("cohort")).cast("long"))
        .groupBy(col("cohort"), col("age_days"))
        .agg(countDistinct(col("user_id")).as("n_active"),
          sum(when(col("event_type") === "purchase",
            (col("value").cast("decimal(30,2)") * 100).cast("long"))
            .otherwise(0L)).as("rev_cents"))
        .withColumn("cum_rev_cents",
          sum(col("rev_cents")).over(Window.partitionBy(col("cohort"))
            .orderBy(col("age_days"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),
  )

  val sql: Map[String, String] = Map(

    "q207_cuped" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$cut'
         |      THEN CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN ts < TIMESTAMP '$cut' THEN 0
         |      ELSE CAST(CAST(value AS DECIMAL(30,2)) * 100 AS BIGINT)
         |      END) AS BIGINT) AS y
         |  FROM events GROUP BY 1
         |), g AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS gn,
         |         CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS gsx,
         |         CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS gsy,
         |         CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS gsxy,
         |         CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS gsxx
         |  FROM pu
         |), v AS (
         |  SELECT CAST(user_id % 2 AS INT) AS variant,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sum_x_cents,
         |         CAST(sum(y) AS BIGINT) AS sum_y_cents
         |  FROM pu GROUP BY 1
         |)
         |SELECT variant, n, sum_x_cents, sum_y_cents,
         |  (gn * gsxy - gsx * gsy) / (gn * gsxx - gsx * gsx) AS theta,
         |  CAST(sum_y_cents AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_y,
         |  (CAST(sum_y_cents AS DOUBLE) / CAST(n AS DOUBLE)
         |    - ((gn * gsxy - gsx * gsy) / (gn * gsxx - gsx * gsx))
         |      * (CAST(sum_x_cents AS DOUBLE) / CAST(n AS DOUBLE) - gsx / gn))
         |    / 100.0 AS mean_adj
         |FROM v, g""".stripMargin,

    "q208_srm_check" ->
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

    "q209_linear_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
        |), j AS (
        |  SELECT p.p_id, v.v_ts,
        |         count(*) OVER (PARTITION BY p.p_id) AS n_views
        |  FROM p JOIN v ON p.user_id = v.user_id
        |  WHERE v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 24 HOUR
        |)
        |SELECT CAST(date_part('hour', v_ts) AS BIGINT) AS view_hour,
        |       CAST(count(*) AS BIGINT) AS n_credited,
        |       CAST(sum(CAST(1000000 // n_views AS BIGINT)) AS BIGINT)
        |         AS credit_micros
        |FROM j GROUP BY 1""".stripMargin,

    "q210_group_regression" ->
      """WITH d AS (
        |  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS x,
        |         CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT)
        |           AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |), a AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM d GROUP BY 1
        |)
        |SELECT p_brand, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents,
        |  (CAST(sy AS DOUBLE) -
        |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
        |FROM a""".stripMargin,

    "q211_centroid_classify" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         CAST(i - 1 AS INT) AS pos,
        |         CAST(round((CAST(embedding[i] AS DOUBLE) + 1024.0) * 1e6)
        |              AS BIGINT) AS v
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) AS t(i)
        |), cent AS (
        |  SELECT label AS c_label, pos,
        |         CAST(sum(v) // count(*) AS BIGINT) AS c
        |  FROM q GROUP BY 1, 2
        |), d AS (
        |  SELECT q.vec_id, q.label, cent.c_label,
        |         CAST(sum((q.v - cent.c) * (q.v - cent.c)) AS BIGINT) AS dist2
        |  FROM q JOIN cent ON q.pos = cent.pos
        |  GROUP BY 1, 2, 3
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY dist2, c_label) AS rn
        |  FROM d
        |)
        |SELECT vec_id, label, c_label AS pred_label, dist2
        |FROM r WHERE rn = 1""".stripMargin,

    "q212_cohort_ltv" ->
      """WITH c AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT c.cohort,
        |         CAST(datediff('day', c.cohort, CAST(e.ts AS DATE)) AS BIGINT)
        |           AS age_days,
        |         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
        |         CAST(sum(CASE WHEN e.event_type = 'purchase'
        |           THEN CAST(CAST(e.value AS DECIMAL(30,2)) * 100 AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS rev_cents
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  GROUP BY 1, 2
        |)
        |SELECT cohort, age_days, n_active, rev_cents,
        |       CAST(sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age_days
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
        |FROM a""".stripMargin,
  )
}
