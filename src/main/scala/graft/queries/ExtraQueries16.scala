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

  val all: Seq[Q] = Seq(
    Q("r112_item_cf", r112, Some(r112Sql)))
}
