package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.Tables
import graft.queries.Relational.{Fn, Q}

/** Round-7 batch 17: neighborhood collaborative filtering over the
  * interaction log — the classic item-item recommender primitive.
  *
  * Same determinism discipline as ExtraQueries3–15.
  */
object ExtraQueries16 {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  // ---------------------------------------- r112 item-item CF

  val CfTopK = 5

  /** r112: item-item collaborative filtering — cosine similarity
    * between items over the binary user-interaction matrix, top-
    * [[CfTopK]] neighbors per item. Items are the `props.k` values of
    * the event log (the payload a product event carries); "users who
    * touched X also touched Y" is the neighborhood recommender that
    * ships before any learned model, and its item-item form (not
    * user-user) is the one that scales — item co-occurrence is
    * user-keyed, and the catalog is orders of magnitude smaller than
    * the user base.
    *
    * Exactness: the interaction matrix is the distinct (user, item)
    * relation; co-occurrence and degrees are integers; cosine =
    * co/√(d₁·d₂) is one mirrored double rounded once; neighbor ranking
    * ties break (cosine DESC, neighbor ASC) identically.
    * Scale shape: co-occurrence pairs come from ONE user-keyed
    * self-join of the interaction relation (|items-per-user|² rows per
    * user, the inherent cost — at 100 TB the standard mitigations are
    * a per-user item cap and frequent-item pruning, both map-side
    * filters on this same plan); degrees ride in as a broadcast
    * item-grain join; the top-k window is item-partitioned over the
    * item-pair relation. */
  private val r112: Fn = (s, d) => {
    val inter = events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("item"))
      .filter(col("item").isNotNull)
      .distinct()
    val deg = inter.groupBy("item").agg(count(lit(1)).as("deg"))
    val a = inter.select(col("user_id"), col("item").as("i1"))
    val b = inter.select(col("user_id"), col("item").as("i2"))
    val co = a.join(b, Seq("user_id")).filter(col("i1") < col("i2"))
      .groupBy("i1", "i2").agg(count(lit(1)).as("co"))
    val sym = co.unionByName(
      co.select(col("i2").as("i1"), col("i1").as("i2"), col("co")))
    val scored = sym
      .join(broadcast(deg.select(col("item").as("i1"), col("deg").as("d1"))), Seq("i1"))
      .join(broadcast(deg.select(col("item").as("i2"), col("deg").as("d2"))), Seq("i2"))
      .withColumn("cosine", round(col("co").cast(DoubleType) /
        sqrt((col("d1") * col("d2")).cast(DoubleType)), 6))
    val w = Window.partitionBy("i1").orderBy(desc("cosine"), col("i2"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CfTopK)
      .select(col("i1").as("item"), col("rk").cast(LongType).as("rk"),
        col("i2").as("neighbor"), col("co").as("co_users"), col("cosine"))
      .orderBy("item", "rk")
  }

  private val r112Sql =
    s"""WITH inter AS (
       |  SELECT DISTINCT user_id,
       |         CAST(json_extract_string(props, '$$.k') AS INTEGER) AS item
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
       |deg AS (SELECT item, count(*) AS deg FROM inter GROUP BY 1),
       |co AS (
       |  SELECT a.item AS i1, b.item AS i2, count(*) AS co
       |  FROM inter a JOIN inter b ON a.user_id = b.user_id AND a.item < b.item
       |  GROUP BY 1, 2),
       |sym AS (
       |  SELECT i1, i2, co FROM co
       |  UNION ALL
       |  SELECT i2, i1, co FROM co),
       |scored AS (
       |  SELECT s.i1, s.i2, s.co,
       |         round(CAST(s.co AS DOUBLE) /
       |               sqrt(CAST(d1.deg * d2.deg AS DOUBLE)), 6) AS cosine
       |  FROM sym s
       |  JOIN deg d1 ON s.i1 = d1.item
       |  JOIN deg d2 ON s.i2 = d2.item),
       |ranked AS (
       |  SELECT i1, i2, co, cosine,
       |         row_number() OVER (PARTITION BY i1 ORDER BY cosine DESC, i2) AS rk
       |  FROM scored)
       |SELECT i1 AS item, CAST(rk AS BIGINT) AS rk, i2 AS neighbor,
       |       co AS co_users, cosine
       |FROM ranked WHERE rk <= $CfTopK
       |ORDER BY item, rk""".stripMargin

  // ---------------------------------------- r113 cross-correlation

  val CcfMaxLag = 3

  /** r113: lead–lag cross-correlation — Pearson correlation between
    * every region pair's daily revenue series at lags −[[CcfMaxLag]]
    * … +[[CcfMaxLag]], on the dense zero-filled calendar. The CCF is
    * how analysts find which segment LEADS a movement (r96's ACF is
    * the self-lag special case; r67 is the lag-0 matrix) — a peak off
    * lag 0 says one region's demand front-runs another's.
    *
    * Exactness: the series is exact cents on a dense day grid
    * (zero-filled — gaps are real zero-revenue days, not missing
    * data); sufficient statistics accumulate in DECIMAL(38,0)
    * (Σxy ≈ 2e21 overflows BIGINT at sf0.1 — the r67/r96 HUGEINT
    * discipline), and each correlation is ONE mirrored double
    * expression from decimals cast once.
    * Scale shape: the corpus collapses to the (region, day) aggregate
    * first; the dense grid is calendar × |regions| (bounded); each lag
    * arm is a keyed equi-join on the shifted day — 2·[[CcfMaxLag]]+1
    * bounded joins, no window over anything corpus-sized.
    *
    * SCALE BOUND (explicit, enforced): the pair count is C(series, 2),
    * so join rows = C(series,2) · |calendar| · (2·[[CcfMaxLag]]+1) —
    * fine for a region-like dimension (C(5,2)=10 pairs × ~2.4k days),
    * QUADRATIC for a 1000-source dimension (≈500k pairs × days × lags).
    * [[CcfMaxSeries]] caps the series dimension and the plan REFUSES
    * (fails loudly) past it rather than silently planning the
    * quadratic grid; pointing this at a wide dimension means
    * pre-selecting the series of interest first (top-N by volume, an
    * explicit list), not raising the cap. */
  val CcfMaxSeries = 64L

  private val r113: Fn = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("x"))
    val days = daily.select(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val regions = daily.select(col("r_name")).distinct()
    // Bounded driver scalar (1 row): the C(series,2) refusal gate.
    val nSeries = regions.count()
    require(nSeries <= CcfMaxSeries,
      s"r113: $nSeries series would plan C(n,2)=${nSeries * (nSeries - 1) / 2} " +
        s"dense pair grids (cap $CcfMaxSeries) — pre-select the series first")
    val grid = days.crossJoin(broadcast(regions))
      .join(daily, Seq("r_name", "day"), "left")
      .select(col("r_name"), col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val g1 = grid.select(col("r_name").as("ra"), col("day"), col("x").as("xa"))
    val g2 = grid.select(col("r_name").as("rb"), col("day").as("day2"), col("x").as("xb"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val arms = (-CcfMaxLag to CcfMaxLag).map { lag =>
      g1.join(g2, col("ra") < col("rb") && col("day2") === date_add(col("day"), lag))
        .groupBy(col("ra"), col("rb"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("xa"))).as("sx"), sum(dec(col("xb"))).as("sy"),
          sum(dec(col("xa")) * dec(col("xb"))).as("sxy"),
          sum(dec(col("xa")) * dec(col("xa"))).as("sxx"),
          sum(dec(col("xb")) * dec(col("xb"))).as("syy"))
        .withColumn("lag", lit(lag.toLong))
    }
    val num = (dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
    val dx = (dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val dy = (dec(col("n")) * col("syy") - col("sy") * col("sy")).cast(DoubleType)
    arms.reduce(_ unionByName _)
      .withColumn("ccf", when(dx === 0.0 || dy === 0.0, lit(0.0))
        .otherwise(round(num / sqrt(dx * dy), 6)))
      .select(col("ra"), col("rb"), col("lag"), col("n").cast(LongType).as("n"), col("ccf"))
      .orderBy("ra", "rb", "lag")
  }

  private val r113Sql = {
    val arms = (-CcfMaxLag to CcfMaxLag).map { lag =>
      s"""SELECT a.ra, b.rb, CAST($lag AS BIGINT) AS lag, count(*) AS n,
         |       sum(CAST(a.xa AS DECIMAL(38,0))) AS sx,
         |       sum(CAST(b.xb AS DECIMAL(38,0))) AS sy,
         |       sum(CAST(a.xa AS DECIMAL(38,0)) * CAST(b.xb AS DECIMAL(38,0))) AS sxy,
         |       sum(CAST(a.xa AS DECIMAL(38,0)) * CAST(a.xa AS DECIMAL(38,0))) AS sxx,
         |       sum(CAST(b.xb AS DECIMAL(38,0)) * CAST(b.xb AS DECIMAL(38,0))) AS syy
         |FROM g a JOIN g2 b
         |  ON a.ra < b.rb AND b.day2 = a.day + $lag
         |GROUP BY 1, 2""".stripMargin
    }
    s"""WITH daily AS (
       |  SELECT r_name, CAST(o_orderdate AS DATE) AS day,
       |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  GROUP BY 1, 2),
       |days AS (
       |  SELECT unnest(generate_series(
       |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
       |    INTERVAL 1 DAY))::DATE AS day),
       |grid AS (
       |  SELECT r.r_name, d.day, COALESCE(x.x, 0) AS x
       |  FROM days d
       |  CROSS JOIN (SELECT DISTINCT r_name FROM daily) r
       |  LEFT JOIN daily x ON x.r_name = r.r_name AND x.day = d.day),
       |g AS (SELECT r_name AS ra, day, x AS xa FROM grid),
       |g2 AS (SELECT r_name AS rb, day AS day2, x AS xb FROM grid),
       |armed AS (
       |${arms.mkString("\nUNION ALL\n")})
       |SELECT ra, rb, lag, CAST(n AS BIGINT) AS n,
       |       CASE WHEN CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) = 0.0
       |              OR CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) = 0.0 THEN 0.0
       |            ELSE round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) /
       |                       sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) *
       |                            CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6) END AS ccf
       |FROM armed
       |ORDER BY ra, rb, lag""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("r112_item_cf", r112, Some(r112Sql)),
    Q("r113_crosscorr", r113, Some(r113Sql)))
}
