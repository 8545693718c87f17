package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, dsum, davg, fround, tsStr}

/** SURVEY.md §2.4 Q16–Q23 — multi-key aggregation, ROLLUP, window functions,
  * set operations and exact dedup (E7–E14).
  *
  * Window scale notes: every window here partitions by a grouping key
  * (user_id / custkey / brand), so state is bounded per key and Spark plans a
  * single hash-partition exchange + per-partition sort — the same shape a
  * 1000-executor cluster runs. No window is unpartitioned (an ORDER BY over
  * the whole table would serialize onto one task at 100 TB).
  */
object WindowQueries {
  import CoreQueries.Q

  /** Q16 — TPC-H Q1 shape: multi-key agg with exact-decimal sums (E7). */
  val q16: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        round(dsum(col("l_quantity")), 2).as("sum_qty"),
        round(dsum(col("l_extendedprice")), 2).as("sum_price"),
        fround(dsum((lit(1.0) - col("l_discount")) * col("l_extendedprice"), 4), 2).as("sum_disc_price"),
        fround(davg(col("l_discount")), 4).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q17 — ROLLUP with GROUPING() disambiguation (E8). */
  val q17: Q = (s, d) => {
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n"),
        grouping(col("r_name")).cast("long").as("g_r"),
        grouping(col("n_name")).cast("long").as("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Q40 — CUBE over (returnflag, linestatus): all 2^2 grouping-set
    * combinations in one pass (E8's CUBE face; q17 covers ROLLUP). Spark
    * plans this as a single Expand + hash aggregate — rows are replicated
    * per grouping set BEFORE the shuffle, so the exchange carries
    * (sets × groups), not (sets × input rows). */
  val q40: Q = (s, d) =>
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("vol"),
        grouping(col("l_returnflag")).cast("long").as("g_r"),
        grouping(col("l_linestatus")).cast("long").as("g_l"))
      .orderBy(col("g_r"), col("g_l"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q41 — explicit GROUPING SETS through the SQL surface (E8's third face;
    * q17 ROLLUP, q40 CUBE): the chosen sets (both keys / priority only /
    * grand total) plan as one Expand + hash aggregate, same as rollup. Also
    * exercises temp-view registration + spark.sql end-to-end. */
  val q41: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("orders_v")
    s.sql("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
            |CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
            |CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s
            |FROM orders_v
            |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
            |ORDER BY g_p, g_s, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  }

  /** Q18 — row_number ranking window: first order per customer (E9). */
  val q18: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), tsStr(col("o_orderdate")).as("od"))
      .orderBy(col("o_custkey"))
  }

  /** Q19 — lag analytic window: per-user value deltas (E10). */
  val q19: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(col("event_id"), round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
      .orderBy(col("event_id"))
  }

  /** Q20 — frame aggregate: moving average over 3-row frame (E11). */
  val q20: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    t(s, d, "events")
      .select(col("event_id"), fround(avg(col("value")).over(w), 2).as("mavg"))
      .orderBy(col("event_id"))
  }

  /** Q21 — top-3 per group via ranking window (E12). */
  val q21: Q = (s, d) => {
    val w = Window.partitionBy(col("p_brand")).orderBy(desc("p_retailprice"), col("p_partkey"))
    t(s, d, "part")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn").cast("long").as("rn"), col("p_partkey"),
        round(col("p_retailprice"), 2).as("price"))
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Q22 — INTERSECT / EXCEPT / UNION-distinct in one tagged result (E13). */
  val q22: Q = (s, d) => {
    val n = t(s, d, "nation").select(col("n_regionkey").cast("long").as("k"))
    val r = t(s, d, "region").select(col("r_regionkey").cast("long").as("k"))
    val inter = n.intersect(r).select(lit("intersect").as("op"), col("k"))
    val exc = r.except(n).select(lit("except").as("op"), col("k"))
    val uni = n.union(r).distinct().select(lit("union").as("op"), col("k"))
    inter.unionAll(exc).unionAll(uni).orderBy(col("op"), col("k"))
  }

  /** Q23 — exact dedup, deterministic survivor via row_number()=1 (E14):
    * first event per (user_id, event_type) by (ts, event_id). */
  val q23: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .agg(count(lit(1)).as("n"), sum(col("event_id")).cast("long").as("checksum"))
  }

  /** x141 — skyline / Pareto frontier (E145): the parts no other part
    * beats on BOTH dimensions (lower retail price, larger size) — the
    * SKYLINE operator of the preference-query literature (Börzsönyi et
    * al., ICDE 2001), the multi-objective "best trade-offs" verb a
    * single ORDER BY cannot express. Declarative twin: the textbook
    * NOT-EXISTS dominance anti-join (O(N²) — DuckDB pays it); the Spark
    * side is the sort-sweep decomposition: (1) per-price champions — a
    * map-side-combined groupBy keeps only max(size) per price (equal
    * price + smaller size is strictly dominated), (2) one prefix-max
    * sweep over the DISTINCT-price frame — a point survives iff its
    * size exceeds every strictly-cheaper point's, (3) an equi-join back
    * to members (coordinate ties all kept: equal points don't dominate
    * each other). The sweep's frame is |distinct prices| rows — already
    * aggregated, not data-sized; past ~10M distinct values the
    * range-bucketed prefix-max decomposition (the proven x77Decomposed
    * pattern: per-bucket max + broadcast cross-bucket prefix +
    * within-bucket sweep) replaces the single window. */
  val x141: Q = (s, d) => {
    val p = t(s, d, "part").select(col("p_partkey"),
      col("p_retailprice").as("price"), col("p_size").cast("long").as("size"))
    val champs = p.groupBy(col("price")).agg(max(col("size")).as("msize"))
    val sweep = Window.orderBy(col("price")).rowsBetween(Window.unboundedPreceding, -1)
    val sky = champs
      .withColumn("pmax", max(col("msize")).over(sweep))
      .filter(col("pmax").isNull || col("msize") > col("pmax"))
      .select(col("price"), col("msize").as("size"))
    p.join(sky, Seq("price", "size"))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "x141_skyline" -> x141,
    "q16_tpch_q1" -> q16,
    "q17_rollup" -> q17,
    "q40_cube" -> q40,
    "q41_grouping_sets" -> q41,
    "q18_row_number" -> q18,
    "q19_lag_delta" -> q19,
    "q20_moving_avg" -> q20,
    "q21_topk_per_group" -> q21,
    "q22_set_ops" -> q22,
    "q23_dedup_first" -> q23)

  val oracles: Map[String, String] = Map(
    "x141_skyline" ->
      """SELECT a.p_partkey, a.p_retailprice AS price, CAST(a.p_size AS BIGINT) AS size
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
        |ORDER BY a.p_partkey""".stripMargin,
    "q16_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE),2) AS sum_qty,
        |ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE),2) AS sum_price,
        |floor(CAST(SUM(CAST((1.0 - l_discount) * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_disc_price,
        |floor(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000 AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q17_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n,
        |CAST(GROUPING(r_name) AS BIGINT) AS g_r, CAST(GROUPING(n_name) AS BIGINT) AS g_n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q41_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        |CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
        |CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_p, g_s, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q40_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol,
        |CAST(GROUPING(l_returnflag) AS BIGINT) AS g_r,
        |CAST(GROUPING(l_linestatus) AS BIGINT) AS g_l
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_r, g_l, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q18_row_number" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS od FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q19_lag_delta" ->
      """SELECT event_id, ROUND(value - lag(value) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
        |FROM events ORDER BY event_id""".stripMargin,
    "q20_moving_avg" ->
      """SELECT event_id, floor(AVG(value) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS mavg
        |FROM events ORDER BY event_id""".stripMargin,
    "q21_topk_per_group" ->
      """SELECT p_brand, CAST(rn AS BIGINT) AS rn, p_partkey, ROUND(p_retailprice,2) AS price FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "q22_set_ops" ->
      """SELECT 'intersect' AS op, k FROM (SELECT CAST(n_regionkey AS BIGINT) AS k FROM nation
        |  INTERSECT SELECT CAST(r_regionkey AS BIGINT) FROM region)
        |UNION ALL SELECT 'except', k FROM (SELECT CAST(r_regionkey AS BIGINT) AS k FROM region
        |  EXCEPT SELECT CAST(n_regionkey AS BIGINT) FROM nation)
        |UNION ALL SELECT 'union', k FROM (SELECT CAST(n_regionkey AS BIGINT) AS k FROM nation
        |  UNION SELECT CAST(r_regionkey AS BIGINT) FROM region)
        |ORDER BY op, k""".stripMargin,
    "q23_dedup_first" ->
      """WITH ranked AS (
        |  SELECT event_id, ROW_NUMBER() OVER
        |    (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS checksum
        |FROM ranked WHERE rn = 1""".stripMargin)
}
