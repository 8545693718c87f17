package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, davg, fround}

/** Table-statistics / data-quality operators (SURVEY §2.2 E94–E96):
  * ANALYZE-style column stats, equi-width histograms, and a referential-
  * integrity audit across the TPC-H FK graph. These are the engine-side
  * "know your data" primitives a 100 TB lakehouse runs continuously — the
  * stats feed the optimizer (NDV/min-max for join ordering and pruning)
  * and the audits gate ingest.
  *
  * Reference note: the reference verifies tables with row counts and
  * head samples only (`/root/reference/duckdb/verify.py`); these are the
  * north-star extensions of that verifier surface per SURVEY §2.2.
  */
object StatsQueries {
  import CoreQueries.Q

  /** The audited numeric columns of lineitem (x101/x102). */
  private[graft] val statCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** x101 — ANALYZE-style column statistics (E94): one row per audited
    * column with count / nulls / exact NDV / min / max / fix-point mean —
    * the stats block `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`
    * maintains for the optimizer.
    *
    * 100 TB shape: ONE wide aggregate over the scan (no unpivot — melting
    * first would 4× the shuffled rows); the multi-column exact distincts
    * expand map-side and combine per column, so the exchange carries
    * partial aggregates, not data. The 1×(6·cols) result row is melted to
    * per-column rows AFTER aggregation (driver-side width, cluster-side
    * height). NDV is exact by contract here (the optimizer-stats use case
    * tolerates approx_count_distinct — that scale escape is x63's). */
  val x101: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val aggs = statCols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"),
        davg(col(c)).as(s"av_$c"))
    }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val perCol = statCols.map { c =>
      one.select(lit(c).as("col_name"), col(s"n_$c").as("n_values"),
        col(s"nn_$c").as("n_nulls"), col(s"ndv_$c").as("ndv"),
        fround(col(s"mn_$c"), 6).as("vmin"), fround(col(s"mx_$c"), 6).as("vmax"),
        fround(col(s"av_$c"), 6).as("vmean"))
    }
    perCol.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  /** x102 — equi-width histograms (E95): B=8 bins per
    * audited column between its global min/max, the `width_bucket`
    * distribution sketch behind optimizer selectivity estimates and data-
    * drift monitors.
    *
    * Two passes, both map-side-combined hash aggs: pass 1 is a 1-row
    * global (min,max) per column (broadcast back as a cross join — the
    * benign scalar-broadcast shape); pass 2 buckets each value by
    * fix-point width and counts per (col, bin). The histogram is bounded
    * by cols × B, independent of row count. Bin rule: half-open
    * [lo, hi) with the max value folded into the last bin (the standard
    * width_bucket clamp); empty bins are materialized with cnt=0 via the
    * bounded grid so drift diffs line up positionally. */
  val x102: Q = (s, d) => {
    val nBins = 8
    val li = t(s, d, "lineitem")
    val bAggs = statCols.map(c => min(col(c)).as(s"mn_$c")) ++
      statCols.map(c => max(col(c)).as(s"mx_$c"))
    val bounds = li.agg(bAggs.head, bAggs.tail: _*)
    val binned = statCols.map { c =>
      li.select(col(c).as("v")).where(col("v").isNotNull)
        .crossJoin(broadcast(bounds))
        .select(lit(c).as("col_name"),
          least(floor((col("v") - col(s"mn_$c")) * nBins / (col(s"mx_$c") - col(s"mn_$c"))),
            lit(nBins - 1L)).cast("long").as("bin"))
        .groupBy(col("col_name"), col("bin")).agg(count(lit(1)).as("cnt"))
    }.reduce(_.unionAll(_))
    val grid = statCols.map(c =>
      broadcast(bounds).select(lit(c).as("col_name"),
        explode(sequence(lit(0L), lit(nBins - 1L))).as("bin"),
        col(s"mn_$c").as("mn"), col(s"mx_$c").as("mx"))).reduce(_.unionAll(_))
    grid.join(binned, Seq("col_name", "bin"), "left")
      .select(col("col_name"), col("bin"),
        fround(col("mn") + col("bin") * (col("mx") - col("mn")) / nBins, 6).as("lo"),
        fround(col("mn") + (col("bin") + 1) * (col("mx") - col("mn")) / nBins, 6).as("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(col("col_name"), col("bin"))
  }

  /** The audited FK edges: (child table, fk column, parent table, pk column).
    * Shared with the generated x103 twin so both engines walk one list. */
  private[graft] val fkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** x103 — referential-integrity audit (E96): orphan detection across the
    * full TPC-H FK graph — one row per edge with child row count, distinct
    * FK values, and rows whose FK has no parent (NULL FKs are not orphans).
    *
    * 100 TB shape: each edge is ONE left join on the key (PK side unique ⇒
    * no row multiplication) with the counts riding the same aggregate;
    * small parents (nation/region/part at dim scale) broadcast under AQE,
    * big ones (orders under lineitem) shuffle co-partitioned on the key —
    * exactly the join the fact table already buckets for. The 7 audits are
    * independent jobs over independent scans; output is |edges| rows. */
  val x103: Q = (s, d) => {
    fkEdges.map { case (child, fk, parent, pk) =>
      val c = t(s, d, child).select(col(fk).cast("long").as("fk"))
      val p = t(s, d, parent).select(col(pk).cast("long").as("pk"))
      c.join(p, col("fk") === col("pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("fk")).as("n_fk_distinct"),
          sum(when(col("fk").isNotNull && col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(child).as("child"), lit(fk).as("fk"), lit(parent).as("parent"),
          col("n_rows"), col("n_fk_distinct"), col("n_orphans"))
    }.reduce(_.unionAll(_)).orderBy(col("child"), col("fk"))
  }

  /** x140 — data-quality expectations engine (E144): the declarative
    * rule-suite verb (dbt tests / Great Expectations / Deequ) as ONE
    * engine operator — a rule set evaluates to (rule, n_checked,
    * n_failed) and a CI gate thresholds on it. Three rule shapes, each
    * with its scale-correct plan:
    *  - ROW rules (not-null, range, domain, positivity) — all of them
    *    ride ONE pass over the table as conditional counts in a single
    *    map-side-combined aggregate (adding a rule adds a counter, not a
    *    scan);
    *  - UNIQUENESS — one groupBy on the key with a >1 filter (the
    *    aggregate IS the check; 8-byte keys cross the exchange);
    *  - REFERENTIAL — x103's left-join orphan count (dim side broadcasts
    *    at any realistic dim/fact ratio).
    * The rule list is data here; production wires it from config. */
  val x140: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    def rowRule(name: String, failed: Column) =
      struct(lit(name).as("rule"), count(lit(1)).as("n_checked"),
        sum(when(failed, 1L).otherwise(0L)).as("n_failed"))
    val rowRules = li.agg(array(
        rowRule("l_orderkey_not_null", col("l_orderkey").isNull),
        rowRule("l_quantity_in_1_50",
          col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
        rowRule("l_returnflag_domain", !col("l_returnflag").isin("R", "A", "N")),
        rowRule("l_extendedprice_positive", col("l_extendedprice") <= 0.0),
        rowRule("l_discount_in_0_0p1",
          col("l_discount") < 0.0 || col("l_discount") > 0.1)).as("rs"))
      .select(explode(col("rs")).as("r")).select(col("r.*"))
    val unique = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_checked"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("n_failed"))
      .select(lit("orderkey_linenumber_unique").as("rule"),
        col("n_checked"), col("n_failed"))
    val fk = li.select(col("l_orderkey").as("fk"))
      .join(t(s, d, "orders").select(col("o_orderkey").as("pk")),
        col("fk") === col("pk"), "left")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_failed"))
      .select(lit("l_orderkey_fk_orders").as("rule"), col("n_checked"), col("n_failed"))
    rowRules.unionAll(unique).unionAll(fk).orderBy(col("rule"))
  }

  /** All (i ≤ j) column pairs of [[statCols]] — the upper triangle of the
    * x142 co-moment matrix, diagonal included (variance rows). */
  private[graft] val covPairs: Seq[(String, String)] =
    for { i <- statCols.indices; j <- i until statCols.size }
      yield (statCols(i), statCols(j))

  /** x142 — exact covariance / correlation matrix (E146): the pairwise
    * second-moment profile over lineitem's audited numeric columns — the
    * multi-column complement of x101's per-column stats. Feeds correlated-
    * column detection (CBO multi-column selectivity, redundant-feature
    * pruning before embedding training) and the drift family: a corr
    * matrix delta is the standard multivariate drift signal next to
    * x116's per-column TVD.
    *
    * Determinism: inputs are scale-2 decimals stored as doubles, so
    * `round(v·100)` longs are exact and per-row products are exact scale-4
    * integers; Σxy accumulates as DECIMAL(38,0) (exact, any reduction
    * order — the long would overflow at Σ|xy|·10⁴ > 2⁶³, which the price
    * columns reach by sf0.1). The only floats are the final covariance /
    * correlation renders, identical IEEE expression trees in the twin,
    * fround(6).
    *
    * 100 TB shape: ONE wide map-side-combined aggregate over the scan —
    * |cols|²/2 decimal sums ride a single exchange carrying partial
    * aggregates, not rows (the naive per-pair-query plan is |cols|²/2
    * scans). The 10-cell result melts driver-side-width AFTER aggregation,
    * like x101. */
  val x142: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    def q(c: String) = round(col(c) * 100).cast("long")
    val aggs = Seq(count(lit(1)).as("n")) ++
      statCols.map(c => sum(q(c)).as(s"s_$c")) ++
      covPairs.map { case (a, b) =>
        sum((q(a) * q(b)).cast("decimal(38,0)")).as(s"p_${a}_$b") }
    // Materialized ONCE (r17, VERDICT r16 #6): the 10-branch melt below
    // references this 1-row aggregate per pair; without pinning, one scan
    // depends on the planner reusing the agg's exchange across branches.
    // An eager localCheckpoint of ONE row makes single-scan true by
    // construction — the melt branches read a local 1-row RDD, and the
    // final plan contains no parquet scan at all (asserted in StatsSpec).
    val one = li.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val nd = col("n").cast("double")
    def sd(c: String) = col(s"s_$c").cast("double") / lit(100.0)
    // Σxy exceeds 2^53 (and 2^63) at scale: render the exact integer as
    // hi·1e9 + lo (both halves exactly double-representable), so the one
    // rounding step is the same IEEE multiply-add on both engines — a
    // direct DECIMAL→DOUBLE (Spark) vs HUGEINT→DOUBLE (DuckDB) cast
    // disagrees in the last ulp. Sums are non-negative here (all audited
    // columns are positive), so div/% truncation conventions never differ.
    def pd(x: String, y: String) =
      (expr(s"p_${x}_$y div 1000000000").cast("double") * lit(1e9) +
        expr(s"p_${x}_$y % 1000000000").cast("double")) / lit(10000.0)
    def cov(x: String, y: String) = (pd(x, y) - sd(x) * sd(y) / nd) / nd
    val rows = covPairs.map { case (a, b) =>
      one.select(lit(a).as("col_x"), lit(b).as("col_y"), col("n").as("n_rows"),
        fround(cov(a, b), 6).as("cov"),
        fround(cov(a, b) / sqrt(cov(a, a) * cov(b, b)), 6).as("corr"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("col_x"), col("col_y"))
  }

  /** x143 — ROC-AUC / Mann–Whitney rank-sum (E147): per-day AUC of
    * `value` as a purchase classifier over events — the model-eval verb a
    * training pipeline runs on every scored candidate feature (quality
    * scores, dedup weights, retrieval scores vs click labels). Exact tie
    * handling: AUC = [#(pos>neg) + ½#(pos=neg)] / (n₁·n₀), carried as the
    * ×2-scaled integer numerator Σ np(v)·(2·cum_neg_below(v) + nn(v)) so
    * the only float is the final division (identical IEEE tree, fround 6).
    *
    * 100 TB shape: raw rows collapse FIRST to per-(day, value) counts (a
    * map-side-combined hash agg — the exchange carries distinct scores,
    * not events), and the rank prefix-sum runs day-partitioned over those
    * distinct rows: no global sort, no per-row window. Degenerate days
    * (single-class) emit NULL AUC rather than a fake 0. */
  val x143: Q = (s, d) => {
    val g = t(s, d, "events")
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("day"), col("value"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
        sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L)).as("nn"))
    // rows are unique per (day, value), so a ROWS frame to -1 is exactly
    // "strictly lower scores" — no RANGE frame needed
    val w = Window.partitionBy(col("day")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("cn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("day"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cn") + col("nn"))).as("num2"))
    r.select(col("day"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(fround(col("num2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
      .orderBy(col("day"))
  }

  /** x146 — per-group OLS trend fit (E150): slope / intercept / R² of
    * `value` against the day index, per event type — the "is this metric
    * trending and how confidently" verb run next to x104's anomaly flags
    * and x145's change-points. Closed-form least squares from five sums,
    * nothing iterative.
    *
    * Determinism: x = whole days since the global min day (exact ints),
    * y = scale-2 value as cents (exact longs, the dsum argument), so n,
    * Σx, Σy, Σxy, Σx² are exact longs that stay under 2⁵³ (x ≤ days,
    * y ≤ 10⁵ cents) — only Σy² needs the x142 DECIMAL(38,0) + hi·1e9+lo
    * render. Slope/intercept/R² are then fixed single-expression IEEE
    * trees over those exact doubles, identical in the twin, fround(6).
    *
    * 100 TB shape: one scalar min-day broadcast + ONE map-side-combined
    * per-type aggregate — partials cross the exchange, never rows. */
  val x146: Q = (s, d) => {
    val ev = t(s, d, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val d0 = ev.agg(min(col("day")).as("d0")) // 1-row scalar broadcast
    val base = ev.crossJoin(broadcast(d0)).select(col("event_type"),
      datediff(col("day"), col("d0")).cast("long").as("x"),
      round(col("value") * 100).cast("long").as("y"))
    val agg = base.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    val nd = col("n").cast("double")
    val (sx, sy, sxy, sxx) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"))
    val syyD = expr("syy div 1000000000").cast("double") * lit(1e9) +
      expr("syy % 1000000000").cast("double")
    val num = nd * sxy - sx * sy
    val den = nd * sxx - sx * sx
    val deny = nd * syyD - sy * sy
    val slope = num / den / lit(100.0)
    val intercept = (sy / nd - num / den * (sx / nd)) / lit(100.0)
    val r2 = num * num / (den * deny)
    agg.select(col("event_type"), col("n"),
        when(col("n") < 2L || den === 0.0, lit(null).cast("double"))
          .otherwise(fround(slope, 6)).as("slope"),
        when(col("n") < 2L || den === 0.0, lit(null).cast("double"))
          .otherwise(fround(intercept, 6)).as("intercept"),
        when(col("n") < 2L || den === 0.0 || deny === 0.0, lit(null).cast("double"))
          .otherwise(fround(r2, 6)).as("r2"))
      .orderBy(col("event_type"))
  }

  /** The join/shuffle key columns x150 profiles. */
  private[graft] val skewCols = Seq("l_orderkey", "l_partkey", "l_suppkey")

  /** x150 — shuffle-skew profiler (E154): per join key, the key-frequency
    * distribution read a planner (or an engineer sizing
    * spark.sql.shuffle.partitions) needs BEFORE shuffling 100 TB on that
    * key: n_keys, max/p99/avg per-key cardinality, the max/avg imbalance
    * factor, and the Gini coefficient of the key histogram — the audit
    * that decides between a plain shuffle, AQE skew splitting, and the
    * x117 salted join.
    *
    * Scale shape: per key column, ONE map-side-combined count-by-key (the
    * only data-scale exchange), then everything runs on the (cnt, freq)
    * HISTOGRAM — bounded by the distinct per-key cardinalities (a handful
    * of values), not by keys or rows: the p99 pick and the Gini prefix
    * sum are windows over that tiny frame. Exact integers throughout;
    * p99 is the x108 picked-element rank rule (never interpolated); Gini's
    * Σi·xᵢ accumulates as DECIMAL(38,0) with the x142 hi·1e9+lo render
    * (it crosses 2⁵³ when keys do). */
  val x150: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val perCol = skewCols.map { k =>
      // histogram-sized frame referenced by the totals agg AND the
      // cumulative chain — materialized once so the two corpus-wide
      // grouping passes behind it run once (r19, guide §2.4)
      val cf = li.groupBy(col(k)).agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
        .localCheckpoint(true)
      val tot = cf.agg(sum(col("freq")).as("n_keys"),
        sum(col("cnt") * col("freq")).as("n_rows"), max(col("cnt")).as("max_cnt"))
      val w = Window.orderBy(col("cnt")).rowsBetween(Window.unboundedPreceding, -1)
      val cum = cf // histogram-sized frame: |distinct cnt| rows
        .withColumn("cbefore", coalesce(sum(col("freq")).over(w), lit(0L)))
        .crossJoin(broadcast(tot))
      val r99 = floor((col("n_keys") - 1L).cast("double") * lit(0.99)).cast("long")
      val p99 = cum.filter(col("cbefore") <= r99 && r99 < col("cbefore") + col("freq"))
        .agg(min(col("cnt")).as("p99_cnt")) // exactly one row matches; the
        // global-agg wrapper makes the 1-row broadcast shape provable
      // ascending-rank weighted sum: a run of `freq` keys of size `cnt`
      // after `cbefore` smaller keys contributes cnt·(freq·cbefore + f(f+1)/2)
      val six = cum.agg(sum((col("cnt") *
          (col("freq") * col("cbefore") + expr("freq * (freq + 1L) div 2")))
          .cast("decimal(38,0)")).as("six"))
      val sixD = expr("six div 1000000000").cast("double") * lit(1e9) +
        expr("six % 1000000000").cast("double")
      val (nk, nr, mx) = (col("n_keys").cast("double"), col("n_rows").cast("double"),
        col("max_cnt").cast("double"))
      tot.crossJoin(broadcast(six)).crossJoin(broadcast(p99)).select(
        lit(k).as("col_name"), col("n_rows"), col("n_keys"), col("max_cnt"),
        col("p99_cnt"), fround(nr / nk, 6).as("avg_cnt"),
        fround(mx / (nr / nk), 6).as("imbalance"),
        fround((lit(2.0) * sixD - (nk + lit(1.0)) * nr) / (nk * nr), 6).as("gini"))
    }
    perCol.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  /** x100 layout-audit constants: 64 target files, 8-bit per-dimension
    * normalization (so the interleaved z-value fits 16 bits). */
  private val zFiles = 64
  private val zBits = 8

  /** Bit-interleave two `zBits`-wide longs (a in the odd positions, b in
    * the even) — the Morton/Z-order curve index. Non-overlapping bit
    * positions make `+` equal `|`, and the same term list is emitted into
    * the twin by [[zSql]]. */
  private def zInterleave(a: Column, b: Column): Column =
    (0 until zBits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** DuckDB twin of [[zInterleave]] over SQL expressions. */
  private def zSql(a: String, b: String): String =
    (0 until zBits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i + 1)} + (($b >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** x100 — Z-order data-layout clustering + file-skipping audit (E99):
    * the `OPTIMIZE ZORDER BY (l_partkey, l_suppkey)` decision, measured.
    * Rows are assigned to 64 files under three layouts — ingest order
    * (orderkey ranges), single-key sort (partkey ranges), and the Morton
    * curve over (partkey, suppkey) — and for each layout the audit
    * computes the per-file (min,max) key stats a lakehouse keeps, then
    * replays every distinct key as a point probe against those stats:
    * `avg_scan_part` / `avg_scan_supp` = how many of the 64 files a
    * partkey / suppkey predicate must open on average. Linear layout
    * prunes nothing on either probe dim, single-key sort is perfect on
    * its key and blind on the other, Z-order prunes BOTH — the reason
    * multi-dimensional clustering wins at 100 TB, stated as a number.
    *
    * 100 TB shape: TWO scans of the fact table total (bounds, then the
    * layout-stamped stats agg) plus the two distinct-probe streams. The
    * 1-row bounds agg and the ≤3·64-row per-(layout,file) stats table are
    * both bounded MODEL DIMENSIONS collected to the driver (the x111/x170
    * LocalRelation posture): bounds become literal codegen bucket
    * arithmetic (no crossJoin), and all three layouts are stamped in ONE
    * pass via a 3-element literal explode instead of a 3-way union of
    * separate aggregations — the r12→r13 formulation recomputed the
    * un-materialized stats union for each of its three consumers, ~14
    * fact-table scans where 4 suffice (measured 1.0→0.4 s at sf0.1). The
    * probe sweep joins the LOCAL stats table (broadcast) against the
    * distinct-key stream and averages — nothing quadratic, nothing
    * unbounded collected. The real write path would end
    * `.repartitionByRange(64, zval)` + per-file stats as parquet footers;
    * the audit computes exactly those footers. */
  val x100: Q = (s, d) => {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
    val bRow = li.agg(min(col("ok")), max(col("ok")), min(col("pk")),
      max(col("pk")), min(col("sk")), max(col("sk"))).collect()(0)
    // empty table ⇒ null bounds: degrade to an empty audit frame (the
    // pre-collect crossJoin formulation's behavior) instead of an NPE
    if (bRow.isNullAt(0)) {
      import s.implicits._
      Seq.empty[(String, Long, Long, Long, Double, Double)]
        .toDF("layout", "n_files", "min_file_rows", "max_file_rows",
          "avg_scan_part", "avg_scan_supp")
    } else {
    val (mnOk, mxOk, mnPk, mxPk, mnSk, mxSk) =
      (bRow.getLong(0), bRow.getLong(1), bRow.getLong(2), bRow.getLong(3),
        bRow.getLong(4), bRow.getLong(5))
    // equal-width bucketing: floor((v - mn) * n / (mx - mn + 1)) — monotone,
    // deterministic, bounded to [0, n); double arithmetic exact at key scale
    // (identical to the pre-collect column form: long minus long, times
    // double, divided by a long — the twin replays the same expression)
    def bucket(v: Column, mn: Long, mx: Long, n: Int): Column =
      floor((v - lit(mn)) * n.toDouble / lit(mx - mn + 1L))
    val e = li
      .withColumn("pk8", bucket(col("pk"), mnPk, mxPk, 1 << zBits))
      .withColumn("sk8", bucket(col("sk"), mnSk, mxSk, 1 << zBits))
      .withColumn("zval", zInterleave(col("pk8"), col("sk8")))
    val tagged = e.select(col("pk"), col("sk"), explode(array(
        struct(lit("linear").as("layout"),
          bucket(col("ok"), mnOk, mxOk, zFiles).cast("long").as("file")),
        struct(lit("partsort").as("layout"),
          bucket(col("pk"), mnPk, mxPk, zFiles).cast("long").as("file")),
        struct(lit("zorder").as("layout"),
          floor(col("zval") * zFiles.toDouble / (1 << (2 * zBits)))
            .cast("long").as("file")))).as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file").as("file"),
        col("pk"), col("sk"))
    val statsRows = tagged.groupBy(col("layout"), col("file"))
      .agg(count(lit(1)).as("n"),
        min(col("pk")).as("f_mn_pk"), max(col("pk")).as("f_mx_pk"),
        min(col("sk")).as("f_mn_sk"), max(col("sk")).as("f_mx_sk"))
      .collect() // bounded: ≤ 3 layouts × zFiles rows (model dimension)
    val stats = {
      import s.implicits._
      statsRows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toDF("layout", "file", "n", "f_mn_pk", "f_mx_pk", "f_mn_sk", "f_mx_sk")
    }
    def probeAvg(keyCol: String, lo: String, hi: String) =
      li.select(col(keyCol).as("probe")).distinct()
        .join(broadcast(stats), col("probe") >= col(lo) && col("probe") <= col(hi))
        .groupBy(col("layout"))
        .agg((count(lit(1)) / countDistinct(col("probe"))).as(s"avg_scan_$keyCol"))
    val balance = stats.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"), min(col("n")).as("min_file_rows"),
        max(col("n")).as("max_file_rows"))
    balance
      .join(probeAvg("pk", "f_mn_pk", "f_mx_pk"), "layout")
      .join(probeAvg("sk", "f_mn_sk", "f_mx_sk"), "layout")
      .select(col("layout"), col("n_files"), col("min_file_rows"), col("max_file_rows"),
        fround(col("avg_scan_pk"), 6).as("avg_scan_part"),
        fround(col("avg_scan_sk"), 6).as("avg_scan_supp"))
      .orderBy(col("layout"))
    }
  }

  /** x122 sampling rate: keep h60-buckets < 100 of 10,000 (1%). */
  private val aqpBuckets = 100L

  /** x122 — sampled approximate aggregation with error bars (E121): the
    * AQP capability — estimate AVG(l_extendedprice) from a deterministic
    * 1% hash-sample with a CLT standard error, next to the exact answer
    * it predicts. At 100 TB the 1% scan is the difference between an
    * interactive answer and a coffee break; the error bar is what makes
    * the estimate usable (Hellerstein et al., online aggregation). The
    * sample is h60-bucketed (not row-position — deterministic under any
    * partitioning/AQE replay, and a NEW column samples consistently),
    * the estimate is the fix-point exact mean over the sample, and the
    * variance sums ride as DECIMAL(38,4) (each price² is an exact
    * scale-4 rational, so the cast loses nothing and decimal addition is
    * order-independent — the documented alternative where the fix-point
    * long would overflow). sqrt is correctly-rounded IEEE; z and the
    * 3σ verdict derive deterministically.
    *
    * The gate is integer MULTIPLICATIVE MIXING (key·Knuth-constants,
    * prime-folded, mod 10⁴), not h60: content-hashing every fact row
    * with md5 to pick 1% of them is exactly the cost AQP exists to
    * avoid (measured 8.0→1.3 s at sf1), integer mixing is replayable on
    * both engines, and the sampling gate needs UNIFORMITY, not
    * content-hash parity — h60 stays the tool where the HASH VALUE
    * itself must match (fingerprints, band keys, checksums).
    *
    * 100 TB shape: ONE pass over the sample partition-pruned by the
    * pushed bucket predicate + one full pass for the verification column
    * (dropped in production — you run AQP precisely to SKIP the full
    * pass); both are map-side-combined single-row aggs. */
  val x122: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("p"))
    val keyed = li.withColumn("bk",
      pmod(pmod(pmod(col("l_orderkey"), lit(1000003L)) * 2654435761L
        + col("l_linenumber") * 2246822519L, lit(1000003L)), lit(10000L)))
    val samp = keyed.filter(col("bk") < aqpBuckets)
      .agg(count(lit(1)).as("n_sample"),
        davg(col("p")).as("est_mean"),
        sum((col("p") * col("p")).cast(DecimalType(38, 4))).as("sumsq"))
    val exact = li.agg(davg(col("p")).as("exact_mean"))
    samp.crossJoin(broadcast(exact)) // 1-row global aggregates
      .withColumn("svar",
        (col("sumsq").cast("double") - col("n_sample") * col("est_mean") * col("est_mean"))
          / (col("n_sample") - 1))
      .withColumn("stderr", sqrt(col("svar") / col("n_sample")))
      .withColumn("z", (col("est_mean") - col("exact_mean")) / col("stderr"))
      .select(col("n_sample"),
        fround(col("est_mean"), 6).as("est_mean"),
        fround(col("exact_mean"), 6).as("exact_mean"),
        fround(col("stderr"), 6).as("stderr"),
        fround(col("z"), 6).as("z"),
        (abs(col("z")) <= 3.0).as("within_3sigma"))
  }

  /** x124 sampling rate: 5% per stratum (groups are ~3k rows at gate
    * scale — 1% would leave ~30-row strata with useless error bars;
    * stratified AQP sizes the rate to the SMALLEST stratum, the
    * classic allocation concern). */
  private val aqpGroupBuckets = 500L

  /** x124 — stratified sampled aggregation (E124): x122's AQP per GROUP —
    * estimated AVG(o_totalprice) per order priority, each stratum with
    * its own CLT error bar, next to the exact answers. The grouped form
    * is what dashboards actually need ("revenue by segment, now,
    * ±error"), and stratification is where AQP earns or loses trust: a
    * small stratum's bar widens honestly instead of the global bar
    * hiding it. Same deterministic integer-mix gate, fix-point means,
    * DECIMAL variance sums — per group; the verification columns
    * (exact means) are the full pass production skips.
    *
    * 100 TB shape: both aggs are map-side-combined on the group key;
    * the sample agg's scan carries the pushed-down gate, the join is
    * |groups| rows. */
  val x124: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    val o = t(s, d, "orders").select(col("o_orderpriority").as("g"),
      col("o_totalprice").as("p"), col("o_orderkey").as("k"))
    val keyed = o.withColumn("bk",
      pmod(pmod(pmod(col("k"), lit(1000003L)) * 2654435761L, lit(1000003L)), lit(10000L)))
    val samp = keyed.filter(col("bk") < aqpGroupBuckets)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_sample"), davg(col("p")).as("est_mean"),
        sum((col("p") * col("p")).cast(DecimalType(38, 4))).as("sumsq"))
    val exact = o.groupBy(col("g")).agg(davg(col("p")).as("exact_mean"))
    samp.join(exact, Seq("g"))
      .withColumn("svar",
        (col("sumsq").cast("double") - col("n_sample") * col("est_mean") * col("est_mean"))
          / (col("n_sample") - 1))
      .withColumn("stderr", sqrt(col("svar") / col("n_sample")))
      .withColumn("z", (col("est_mean") - col("exact_mean")) / col("stderr"))
      .select(col("g").as("o_orderpriority"), col("n_sample"),
        fround(col("est_mean"), 6).as("est_mean"),
        fround(col("exact_mean"), 6).as("exact_mean"),
        fround(col("stderr"), 6).as("stderr"),
        fround(col("z"), 6).as("z"),
        (abs(col("z")) <= 3.0).as("within_3sigma"))
      .orderBy(col("o_orderpriority"))
  }

  /** x154 — calibration bins + per-bin Brier (E158): is the score
    * CALIBRATED, the complement of x143's "does it rank" — per decile of
    * the min-max-normalized `value`, the mean normalized score vs the
    * observed purchase rate, their gap, and the bin's Brier contribution
    * mean((p−y)²). A scored feature with AUC 0.9 can still be wildly
    * miscalibrated; this is the reliability-diagram table model-eval
    * actually plots.
    *
    * Determinism: the bin is EXACT integer arithmetic — floor((c−cmin)·10
    * div R) with R = cmax−cmin (cents), clamped to 9, so no float ever
    * touches a bin boundary. Per-bin sums are exact: Σd, Σ_pos d as longs
    * (d ≤ 2·10⁵ cents ⇒ safe past 10¹² rows), Σd² as DECIMAL(38,0) with
    * the hi·1e9+lo render. mean_p = Σd/n/R, brier = (Σd²/R² − 2Σ_pos d/R
    * + n_pos)/n — fixed IEEE trees, fround 6. R=0 (constant corpus)
    * degenerates to bin 0 with p=0 via the shared greatest(R,1) guard.
    *
    * 100 TB shape: one scalar min/max broadcast + ONE map-side-combined
    * aggregate to the 10-bin grid — partials cross the exchange, never
    * rows; the same two-exchange shape as x146. */
  val x154: Q = (s, d) => {
    val ev = t(s, d, "events").select(
      round(col("value") * 100).cast("long").as("c"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val mm = ev.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
    val base = ev.crossJoin(broadcast(mm)).select(
      (col("c") - col("cmin")).as("dc"), col("y"),
      greatest(col("cmax") - col("cmin"), lit(1L)).as("r"))
    val agg = base
      .withColumn("bin", least(expr("(dc * 10) div r"), lit(9L)))
      .groupBy(col("bin"), col("r")).agg(
        count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("dc")).as("sd"),
        sum((col("dc") * col("dc")).cast("decimal(38,0)")).as("sdd"),
        sum(col("dc") * col("y")).as("sdy"))
    val (nD, rD) = (col("n").cast("double"), col("r").cast("double"))
    val sddD = expr("sdd div 1000000000").cast("double") * lit(1e9) +
      expr("sdd % 1000000000").cast("double")
    val meanP = col("sd").cast("double") / nD / rD
    val posRate = col("n_pos").cast("double") / nD
    val brier = (sddD / rD / rD - lit(2.0) * col("sdy").cast("double") / rD +
      col("n_pos").cast("double")) / nD
    agg.select(col("bin"), col("n"), col("n_pos"),
        fround(meanP, 6).as("mean_score"),
        fround(posRate, 6).as("pos_rate"),
        fround(abs(meanP - posRate), 6).as("gap"),
        fround(brier, 6).as("bin_brier"))
      .orderBy(col("bin"))
  }

  /** Benford expected shares, log10(1 + 1/d) — computed ONCE in Scala and
    * interpolated into both engines (Spark lit()s and the generated twin
    * SQL via Double round-trip formatting), so neither engine's own log10
    * is in the comparison surface. */
  private val benfordP: Seq[(Long, Double)] =
    (1L to 9L).map(dd => dd -> math.log10(1.0 + 1.0 / dd))

  /** x158 — Benford first-digit audit (E162): the data-forensics verb —
    * distribution of the first significant digit of l_extendedprice
    * against Benford's law, with per-digit χ² contributions. Fabricated
    * or truncated financial columns fail this audit; a per-source run is
    * the classic fraud/ETL-bug screen (Nigrini 1996). TPC-H prices are
    * range-bound rather than multi-decade, so the audit correctly
    * reports a large χ² — the operator's job is the measurement, not a
    * pass verdict.
    *
    * Determinism: the digit comes from the INTEGER cents string — no
    * log/pow on data anywhere, so grouping is exact; expected shares are
    * shared literals; dev²/(n·p) is a fixed IEEE tree over exact counts,
    * fround 6.
    *
    * 100 TB shape: ONE map-side-combined count to a ≤9-row grid + a
    * 1-row total broadcast. */
  val x158: Q = (s, d) => {
    val digits = t(s, d, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .filter(col("c") > 0L)
      .select(substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
    val cnt = digits.groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    val tot = digits.agg(count(lit(1)).as("n")) // 1-row scalar broadcast
    val expCol = benfordP.tail.foldLeft(when(col("digit") === benfordP.head._1,
        lit(benfordP.head._2))) { case (acc, (dd, p)) =>
      acc.when(col("digit") === dd, lit(p))
    }.otherwise(lit(0.0))
    val (ndD, nD) = (col("n_d").cast("double"), col("n").cast("double"))
    val dev = ndD - nD * expCol
    cnt.crossJoin(broadcast(tot)).select(
        col("digit"), col("n_d"),
        fround(ndD / nD, 6).as("obs_share"),
        fround(expCol, 6).as("exp_share"),
        fround(dev * dev / (nD * expCol), 6).as("chi2_part"))
      .orderBy(col("digit"))
  }

  /** x159 — exact Kolmogorov–Smirnov two-sample test (E164): is the
    * `value` distribution of purchase events the SAME as that of view
    * events — the exact nonparametric complement of x116's binned drift
    * score (PSI needs a bin width; KS is binless and distribution-free)
    * and of x149's mean-only z readout. D = max |F₁(c) − F₂(c)| over the
    * pooled support, the max attained at the reported cents value.
    *
    * Determinism: D is located on cross-multiplied EXACT integers —
    * |C₁·N₂ − C₂·N₁| as DECIMAL(38,0) (HUGEINT in the twin; at 100 TB
    * C·N ~ 1e24 overflows longs) — so argmax and its (dnum DESC, c ASC)
    * tie-break are integer-decided on both engines; the only floats are
    * final renders (fround 6) and the significance call, an IEEE
    * mult/div/sqrt tree (exactly-rounded ops — no transcendental, the
    * x158 no-log discipline).
    *
    * 100 TB shape: rows collapse to the VALUE GRID first (ONE map-side-
    * combined count keyed by cents — bounded by the value range, ~17.8k
    * cells at sf0.1, saturating as data grows since the domain is
    * range-bound like x102's histograms), the ECDF window and top-1 pick
    * run on the grid, never on rows; one 1-row totals broadcast. */
  val x159: Q = (s, d) => {
    val ev = t(s, d, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(round(col("value") * 100).cast("long").as("c"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("g2"))
    val grid = ev.groupBy(col("c"))
      .agg(sum(col("g1")).as("n1"), sum(col("g2")).as("n2"))
    val tot = grid.agg(sum(col("n1")).as("n1t"), sum(col("n2")).as("n2t"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0) // grid-bounded, not rows
    val cum = grid
      .withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("dnum",
        abs(col("c1").cast("decimal(38,0)") * col("n2t") -
          col("c2").cast("decimal(38,0)") * col("n1t")))
    val topRow = cum.orderBy(desc("dnum"), col("c")).limit(1)
    val dnumD = expr("dnum div 1000000000").cast("double") * lit(1e9) +
      expr("dnum % 1000000000").cast("double")
    val (n1D, n2D) = (col("n1t").cast("double"), col("n2t").cast("double"))
    val ksD = dnumD / (n1D * n2D)
    val crit = lit(1.358) * sqrt((n1D + n2D) / (n1D * n2D))
    topRow.select(
      col("n1t").as("n_purchase"), col("n2t").as("n_view"),
      col("c").as("at_cents"),
      fround(ksD, 6).as("ks_d"),
      fround(crit, 6).as("ks_crit"),
      (ksD > crit).as("significant"))
  }

  /** x170 — equal-frequency decile binning / quantile discretizer (E176):
    * bin `value` into deciles by count — the feature-prep verb (monotone
    * binning before WOE/IV scoring, histogram-equalized features) and the
    * fourth quantile leg: q35 exact per-group arrays, x64 approx sketches,
    * x108 exact order statistics, x170 materializes the ASSIGNMENT —
    * every row gets its bin, with the per-bin audit (count, bounds, mean)
    * proving the edges round-trip.
    *
    * Determinism: edges by the x165 cumulative-histogram rule on the
    * exact cents grid (edge_q = smallest cents cell whose cumulative
    * count ≥ ⌈q·n/10⌉, all-integer rank arithmetic); a row's bin =
    * 1 + #edges strictly below its cell — heavy ties can merge adjacent
    * deciles (equal edges), identically on both engines. Per-bin mean an
    * exact DECIMAL(38,0) cents sum, hi·1e9+lo render, fround 6.
    *
    * 100 TB shape: rows collapse to the range-bound cents grid in ONE
    * map-side-combined count; edges are a bounded MODEL DIMENSION (9
    * rank picks — the x111 posture) collected to the driver and stamped
    * onto the grid as literal codegen predicates, so the assignment is a
    * pure map with NO join at all; the bin report is grid-bounded — the
    * row-level bin column is a map-side stamp at read time, never a row
    * sort. */
  val x170: Q = (s, d) => {
    val grid = t(s, d, "events")
      .select(round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("f"))
    val tot = grid.agg(sum(col("f")).as("n"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0) // grid-bounded, not rows
    val cum = grid.withColumn("cum", sum(col("f")).over(w))
      .crossJoin(broadcast(tot))
    val edges = cum
      .withColumn("q", explode(typedLit((1 to 9).toArray)))
      .withColumn("k", expr("(q * n + 9) div 10"))
      .filter(col("cum") >= col("k") && col("cum") - col("f") < col("k"))
      .select(col("q"), col("c").as("ec"))
    // 9 edge cells = the model dimension; literal predicates beat a
    // broadcast NLJ (bounded driver collect, x111's LocalRelation rule)
    val edgeVals = edges.orderBy(col("q")).collect().map(_.getLong(1)).toSeq
    val b0 = edgeVals.map(e => when(lit(e) < col("c"), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val assign = grid.select(col("c"), col("f"), b0.as("b0"))
    def hilo(c: String) =
      expr(s"$c div 1000000000").cast("double") * lit(1e9) +
        expr(s"$c % 1000000000").cast("double")
    assign.groupBy((col("b0") + 1L).as("bin"))
      .agg(sum(col("f")).as("n_rows"),
        min(col("c")).as("min_cents"), max(col("c")).as("max_cents"),
        // decimal BEFORE the multiply: c·f overflows longs at 100 TB and
        // non-ANSI long wrap would silently diverge from the HUGEINT twin
        sum(col("c").cast("decimal(38,0)") * col("f")).as("sc"))
      .select(col("bin"), col("n_rows"), col("min_cents"), col("max_cents"),
        fround(hilo("sc") / col("n_rows").cast("double") / lit(100.0), 6)
          .as("mean_value"))
      .orderBy(col("bin"))
  }

  /** x175 — trimmed & winsorized mean per event type (E180): the robust
    * LOCATION estimators completing the robust family — x104 scores
    * anomalies (median/MAD), x173 fits slope (pairwise median), x175
    * reports the center you quote when the tails are contaminated:
    * 10%-trimmed (drop the bottom/top n÷10 observations) and winsorized
    * (CLAMP them to the trim edges — keeps n constant, the estimator
    * regulators ask for).
    *
    * Determinism: everything is rank arithmetic on the exact cents grid —
    * the kept-rank window [lo+1, hi] intersects each cell's rank span
    * [cum−f+1, cum] with an ALL-INTEGER overlap weight, the trim edges
    * are picked cells (x108 rule), the winsorized sum adds lo·edge_lo +
    * (n−hi)·edge_hi exactly; sums DECIMAL(38,0)/HUGEINT, hi·1e9+lo
    * renders, fround 6.
    *
    * 100 TB shape: ONE map-side-combined count to the (type, cents)
    * grid; the cumulative window, edge picks and weighted sum are all
    * grid-bounded against a broadcast ≤|types| totals frame — no
    * row-level sort (the same posture as x165/x170). */
  val x175: Q = (s, d) => {
    val grid = t(s, d, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("f"))
    val tot = grid.groupBy(col("event_type")).agg(sum(col("f")).as("n"))
      .withColumn("lo", expr("n div 10"))
      .withColumn("hi", col("n") - col("lo"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0) // grid-bounded, not rows
    val cum = grid.withColumn("cum", sum(col("f")).over(w))
      .join(broadcast(tot), "event_type")
    val core = cum
      .withColumn("wt", greatest(lit(0L),
        least(col("cum"), col("hi")) -
          greatest(col("cum") - col("f") + 1L, col("lo") + 1L) + 1L))
      .groupBy(col("event_type")).agg(
        // decimal before the multiply (c·wt wraps longs at 100 TB)
        sum(col("c").cast("decimal(38,0)") * col("wt")).as("ts"))
    val elo = cum.filter(col("cum") >= col("lo") + 1L &&
        col("cum") - col("f") < col("lo") + 1L)
      .select(col("event_type"), col("c").as("edge_lo"))
    val ehi = cum.filter(col("cum") >= col("hi") && col("cum") - col("f") < col("hi"))
      .select(col("event_type"), col("c").as("edge_hi"))
    def sghl(c: String) =
      (when(col(c) < 0, lit(-1.0)).otherwise(lit(1.0))) *
        (expr(s"abs($c) div 1000000000").cast("double") * lit(1e9) +
          expr(s"abs($c) % 1000000000").cast("double"))
    val out = core.join(broadcast(tot), "event_type")
      .join(broadcast(elo), "event_type").join(broadcast(ehi), "event_type")
      .withColumn("ws", col("ts") +
        col("lo").cast("decimal(38,0)") * col("edge_lo") +
        (col("n") - col("hi")).cast("decimal(38,0)") * col("edge_hi"))
    out.select(col("event_type"), col("n"),
        (col("hi") - col("lo")).as("n_kept"),
        col("edge_lo").as("lo_cents"), col("edge_hi").as("hi_cents"),
        fround(sghl("ts") / (col("hi") - col("lo")).cast("double") / lit(100.0), 6)
          .as("trimmed_mean"),
        fround(sghl("ws") / col("n").cast("double") / lit(100.0), 6)
          .as("winsorized_mean"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "x159_ks_test" -> x159,
    "x170_decile_bins" -> x170,
    "x175_trimmed_mean" -> x175,
    "x158_benford" -> x158,
    "x154_calibration" -> x154,
    "x100_zorder_audit" -> x100,
    "x122_sampled_agg" -> x122,
    "x124_grouped_aqp" -> x124,
    "x101_analyze_stats" -> x101,
    "x102_histograms" -> x102,
    "x103_fk_audit" -> x103,
    "x140_expectations" -> x140,
    "x142_corr_matrix" -> x142,
    "x143_roc_auc" -> x143,
    "x146_trend_fit" -> x146,
    "x150_skew_profile" -> x150)

  /** GENERATED x142 twin: the identical scaled-long sums (HUGEINT exact in
    * DuckDB where Spark holds DECIMAL(38,0)) and the identical IEEE
    * covariance/correlation expression trees, per [[covPairs]] cell. */
  private def corrMatrixOracle: String = {
    val sumCols = statCols.map(c =>
      s"SUM(CAST(round($c * 100) AS BIGINT)) AS s_$c")
    val prodCols = covPairs.map { case (a, b) =>
      s"SUM(CAST(round($a * 100) AS BIGINT) * CAST(round($b * 100) AS BIGINT)) AS p_${a}_$b" }
    def sd(c: String) = s"(CAST(s_$c AS DOUBLE) / 100.0)"
    def pd(x: String, y: String) =
      s"((CAST(p_${x}_$y // 1000000000 AS DOUBLE) * 1e9 + CAST(p_${x}_$y % 1000000000 AS DOUBLE)) / 10000.0)"
    def cov(x: String, y: String) = s"((${pd(x, y)} - ${sd(x)} * ${sd(y)} / nd) / nd)"
    val blocks = covPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, n AS n_rows,
         |  floor(${cov(a, b)} * 1000000.0 + 0.5) / 1000000.0 AS cov,
         |  floor(${cov(a, b)} / sqrt(${cov(a, a)} * ${cov(b, b)}) * 1000000.0 + 0.5) / 1000000.0 AS corr
         |FROM s""".stripMargin
    }
    s"""WITH s0 AS (
       |  SELECT COUNT(*) AS n, ${(sumCols ++ prodCols).mkString(",\n    ")}
       |  FROM lineitem),
       |s AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM s0)
       |SELECT * FROM (${blocks.mkString("\nUNION ALL\n")})
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** GENERATED x150 twin: identical histogram chain per key column. */
  private def skewProfileOracle: String = {
    val blocks = skewCols.map { k =>
      s"""SELECT '$k' AS col_name, n_rows, n_keys, max_cnt,
         |  (SELECT cnt FROM cum_$k, tot_$k
         |   WHERE cbefore <= CAST(floor(CAST(n_keys - 1 AS DOUBLE) * 0.99) AS BIGINT)
         |     AND CAST(floor(CAST(n_keys - 1 AS DOUBLE) * 0.99) AS BIGINT) < cbefore + freq) AS p99_cnt,
         |  floor(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS avg_cnt,
         |  floor(CAST(max_cnt AS DOUBLE) / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS imbalance,
         |  floor((2.0 * (CAST(six // 1000000000 AS DOUBLE) * 1e9 + CAST(six % 1000000000 AS DOUBLE))
         |    - (CAST(n_keys AS DOUBLE) + 1.0) * CAST(n_rows AS DOUBLE))
         |    / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS gini
         |FROM tot_$k, six_$k""".stripMargin
    }
    val ctes = skewCols.map { k =>
      s"""cf_$k AS (
         |  SELECT cnt, COUNT(*) AS freq FROM (
         |    SELECT $k, COUNT(*) AS cnt FROM lineitem GROUP BY 1) GROUP BY 1),
         |tot_$k AS (
         |  SELECT CAST(SUM(freq) AS BIGINT) AS n_keys,
         |    CAST(SUM(cnt * freq) AS BIGINT) AS n_rows, MAX(cnt) AS max_cnt
         |  FROM cf_$k),
         |cum_$k AS (
         |  SELECT cnt, freq, CAST(COALESCE(SUM(freq) OVER (ORDER BY cnt
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cbefore
         |  FROM cf_$k),
         |six_$k AS (
         |  SELECT SUM(cnt * (freq * cbefore + freq * (freq + 1) // 2)) AS six
         |  FROM cum_$k)""".stripMargin
    }
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT * FROM (${blocks.mkString("\nUNION ALL\n")})
       |ORDER BY col_name""".stripMargin
  }

  /** GENERATED x158 twin: the same integer-cents digit extraction and the
    * SAME Benford literals (Double round-trip formatting) — neither
    * engine's log10 participates. */
  private def benfordOracle: String = {
    val caseExpr = benfordP.map { case (dd, p) => s"WHEN digit = $dd THEN $p" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM lineitem WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
       |cnt AS (SELECT digit, COUNT(*) AS n_d FROM digits GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n FROM digits)
       |SELECT digit, n_d,
       |  floor(CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS obs_share,
       |  floor(($caseExpr) * 1000000.0 + 0.5) / 1000000.0 AS exp_share,
       |  floor((CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * ($caseExpr))
       |      * (CAST(n_d AS DOUBLE) - CAST(n AS DOUBLE) * ($caseExpr))
       |      / (CAST(n AS DOUBLE) * ($caseExpr)) * 1000000.0 + 0.5) / 1000000.0 AS chi2_part
       |FROM cnt, tot ORDER BY digit""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "x175_trimmed_mean" ->
      """WITH grid AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, COUNT(*) AS f
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(SUM(f) AS BIGINT) AS n,
        |    CAST(SUM(f) AS BIGINT) // 10 AS lo,
        |    CAST(SUM(f) AS BIGINT) - CAST(SUM(f) AS BIGINT) // 10 AS hi
        |  FROM grid GROUP BY 1),
        |cum AS (
        |  SELECT g.event_type, c, f, n, lo, hi,
        |    SUM(f) OVER (PARTITION BY g.event_type ORDER BY c) AS cum
        |  FROM grid g JOIN tot USING (event_type)),
        |core AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(c AS HUGEINT) * GREATEST(0,
        |      LEAST(cum, hi) - GREATEST(cum - f + 1, lo + 1) + 1)) AS HUGEINT) AS ts
        |  FROM cum GROUP BY 1),
        |elo AS (
        |  SELECT event_type, c AS edge_lo FROM cum
        |  WHERE cum >= lo + 1 AND cum - f < lo + 1),
        |ehi AS (
        |  SELECT event_type, c AS edge_hi FROM cum
        |  WHERE cum >= hi AND cum - f < hi),
        |j AS (
        |  SELECT t.event_type, n, lo, hi, edge_lo, edge_hi, ts,
        |    ts + CAST(lo AS HUGEINT) * edge_lo + CAST(n - hi AS HUGEINT) * edge_hi AS ws
        |  FROM tot t JOIN core USING (event_type)
        |  JOIN elo USING (event_type) JOIN ehi USING (event_type))
        |SELECT event_type, n, hi - lo AS n_kept, edge_lo AS lo_cents, edge_hi AS hi_cents,
        |  floor((CASE WHEN ts < 0 THEN -1.0 ELSE 1.0 END)
        |    * (CAST(abs(ts) // 1000000000 AS DOUBLE) * 1e9 + CAST(abs(ts) % 1000000000 AS DOUBLE))
        |    / CAST(hi - lo AS DOUBLE) / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS trimmed_mean,
        |  floor((CASE WHEN ws < 0 THEN -1.0 ELSE 1.0 END)
        |    * (CAST(abs(ws) // 1000000000 AS DOUBLE) * 1e9 + CAST(abs(ws) % 1000000000 AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS winsorized_mean
        |FROM j ORDER BY event_type""".stripMargin,
    "x170_decile_bins" ->
      """WITH grid AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c, COUNT(*) AS f
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS n FROM grid),
        |cum AS (SELECT c, f, SUM(f) OVER (ORDER BY c) AS cum FROM grid),
        |edges AS (
        |  SELECT q, c AS ec FROM cum, tot,
        |    (SELECT unnest(range(1, 10)) AS q) qs
        |  WHERE cum >= (q * n + 9) // 10 AND cum - f < (q * n + 9) // 10),
        |assign AS (
        |  SELECT g.c, g.f,
        |    CAST(SUM(CASE WHEN e.ec < g.c THEN 1 ELSE 0 END) AS BIGINT) AS b0
        |  FROM grid g CROSS JOIN edges e GROUP BY 1, 2),
        |bins AS (
        |  SELECT b0 + 1 AS bin, CAST(SUM(f) AS BIGINT) AS n_rows,
        |    MIN(c) AS min_cents, MAX(c) AS max_cents,
        |    SUM(CAST(c AS HUGEINT) * f) AS sc
        |  FROM assign GROUP BY 1)
        |SELECT bin, n_rows, min_cents, max_cents,
        |  floor((CAST(sc // 1000000000 AS DOUBLE) * 1e9 + CAST(sc % 1000000000 AS DOUBLE))
        |    / CAST(n_rows AS DOUBLE) / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_value
        |FROM bins ORDER BY bin""".stripMargin,
    "x159_ks_test" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |grid AS (
        |  SELECT c, CAST(SUM(g1) AS BIGINT) AS n1, CAST(SUM(g2) AS BIGINT) AS n2
        |  FROM ev GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n1) AS BIGINT) AS n1t, CAST(SUM(n2) AS BIGINT) AS n2t
        |  FROM grid),
        |cum AS (
        |  SELECT c, SUM(n1) OVER (ORDER BY c) AS c1, SUM(n2) OVER (ORDER BY c) AS c2
        |  FROM grid),
        |d AS (
        |  SELECT c, abs(CAST(c1 AS HUGEINT) * n2t - CAST(c2 AS HUGEINT) * n1t) AS dnum,
        |    n1t, n2t
        |  FROM cum, tot),
        |top AS (SELECT * FROM d ORDER BY dnum DESC, c LIMIT 1)
        |SELECT n1t AS n_purchase, n2t AS n_view, c AS at_cents,
        |  floor((CAST(dnum // 1000000000 AS DOUBLE) * 1e9 + CAST(dnum % 1000000000 AS DOUBLE))
        |    / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS ks_d,
        |  floor(1.358 * sqrt((CAST(n1t AS DOUBLE) + CAST(n2t AS DOUBLE))
        |    / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS ks_crit,
        |  ((CAST(dnum // 1000000000 AS DOUBLE) * 1e9 + CAST(dnum % 1000000000 AS DOUBLE))
        |    / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE))
        |    > 1.358 * sqrt((CAST(n1t AS DOUBLE) + CAST(n2t AS DOUBLE))
        |      / (CAST(n1t AS DOUBLE) * CAST(n2t AS DOUBLE)))) AS significant
        |FROM top""".stripMargin,
    "x158_benford" -> benfordOracle,
    "x154_calibration" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |mm AS (SELECT min(c) AS cmin, max(c) AS cmax FROM ev),
        |base AS (
        |  SELECT c - cmin AS dc, y,
        |    greatest(cmax - cmin, 1) AS r
        |  FROM ev, mm),
        |agg AS (
        |  SELECT least((dc * 10) // r, 9) AS bin, r, COUNT(*) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(dc) AS BIGINT) AS sd,
        |    SUM(dc * dc) AS sdd,
        |    CAST(SUM(dc * y) AS BIGINT) AS sdy
        |  FROM base GROUP BY 1, 2)
        |SELECT bin, n, n_pos,
        |  floor(CAST(sd AS DOUBLE) / n / r * 1000000.0 + 0.5) / 1000000.0 AS mean_score,
        |  floor(CAST(n_pos AS DOUBLE) / n * 1000000.0 + 0.5) / 1000000.0 AS pos_rate,
        |  floor(abs(CAST(sd AS DOUBLE) / n / r - CAST(n_pos AS DOUBLE) / n) * 1000000.0 + 0.5) / 1000000.0 AS gap,
        |  floor(((CAST(sdd // 1000000000 AS DOUBLE) * 1e9 + CAST(sdd % 1000000000 AS DOUBLE)) / r / r
        |      - 2.0 * CAST(sdy AS DOUBLE) / r + CAST(n_pos AS DOUBLE)) / n * 1000000.0 + 0.5) / 1000000.0 AS bin_brier
        |FROM agg ORDER BY bin""".stripMargin,
    "x142_corr_matrix" -> corrMatrixOracle,
    "x150_skew_profile" -> skewProfileOracle,
    "x146_trend_fit" ->
      """WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |base AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', d0.d0, CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events, d0),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM base GROUP BY 1),
        |dd AS (
        |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(syy // 1000000000 AS DOUBLE) * 1e9 + CAST(syy % 1000000000 AS DOUBLE) AS syyd
        |  FROM agg),
        |fit AS (
        |  SELECT event_type, n,
        |    nd * sxyd - sxd * syd AS num, nd * sxxd - sxd * sxd AS den,
        |    nd * syyd - syd * syd AS deny, sxd, syd, nd
        |  FROM dd)
        |SELECT event_type, n,
        |  CASE WHEN n < 2 OR den = 0.0 THEN NULL
        |    ELSE floor(num / den / 100.0 * 1000000.0 + 0.5) / 1000000.0 END AS slope,
        |  CASE WHEN n < 2 OR den = 0.0 THEN NULL
        |    ELSE floor((syd / nd - num / den * (sxd / nd)) / 100.0 * 1000000.0 + 0.5) / 1000000.0 END AS intercept,
        |  CASE WHEN n < 2 OR den = 0.0 OR deny = 0.0 THEN NULL
        |    ELSE floor(num * num / (den * deny) * 1000000.0 + 0.5) / 1000000.0 END AS r2
        |FROM fit ORDER BY event_type""".stripMargin,
    "x143_roc_auc" ->
      """WITH g AS (
        |  SELECT CAST(ts AS DATE) AS day, value,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS nn
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT *, COALESCE(SUM(nn) OVER (PARTITION BY day ORDER BY value
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn
        |  FROM g),
        |r AS (
        |  SELECT day, SUM(np) AS n_pos, SUM(nn) AS n_neg,
        |    SUM(np * (2 * cn + nn)) AS num2
        |  FROM c GROUP BY 1)
        |SELECT day, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE floor(CAST(num2 AS DOUBLE) /
        |      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS auc
        |FROM r ORDER BY day""".stripMargin,
    "x140_expectations" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey_not_null' AS rule, COUNT(*) AS n_checked,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity_in_1_50', COUNT(*),
        |    CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag_domain', COUNT(*),
        |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('R','A','N') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice_positive', COUNT(*),
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount_in_0_0p1', COUNT(*),
        |    CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orderkey_linenumber_unique', CAST(SUM(n) AS BIGINT),
        |    CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
        |  FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'l_orderkey_fk_orders', COUNT(*),
        |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |ORDER BY rule""".stripMargin,
    "x124_grouped_aqp" ->
      s"""WITH k AS (
         |  SELECT o_orderpriority AS g, o_totalprice AS p,
         |    (((o_orderkey % 1000003) * 2654435761) % 1000003) % 10000 AS bk
         |  FROM orders),
         |samp AS (
         |  SELECT g, COUNT(*) AS n_sample,
         |    CAST(SUM(CAST(p AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS est_mean,
         |    SUM(CAST(p * p AS DECIMAL(38,4))) AS sumsq
         |  FROM k WHERE bk < $aqpGroupBuckets GROUP BY g),
         |ex AS (
         |  SELECT o_orderpriority AS g,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS exact_mean
         |  FROM orders GROUP BY 1),
         |calc AS (
         |  SELECT s.g, n_sample, est_mean, exact_mean,
         |    sqrt(((CAST(sumsq AS DOUBLE) - n_sample * est_mean * est_mean)
         |          / (n_sample - 1)) / n_sample) AS stderr
         |  FROM samp s JOIN ex ON ex.g = s.g)
         |SELECT g AS o_orderpriority, n_sample,
         |  floor(est_mean * 1000000.0 + 0.5) / 1000000.0 AS est_mean,
         |  floor(exact_mean * 1000000.0 + 0.5) / 1000000.0 AS exact_mean,
         |  floor(stderr * 1000000.0 + 0.5) / 1000000.0 AS stderr,
         |  floor((est_mean - exact_mean) / stderr * 1000000.0 + 0.5) / 1000000.0 AS z,
         |  abs((est_mean - exact_mean) / stderr) <= 3.0 AS within_3sigma
         |FROM calc ORDER BY o_orderpriority""".stripMargin,
    "x122_sampled_agg" -> {
      s"""WITH k AS (
         |  SELECT l_extendedprice AS p,
         |    (((l_orderkey % 1000003) * 2654435761 + l_linenumber * 2246822519) % 1000003) % 10000 AS bk
         |  FROM lineitem),
         |samp AS (
         |  SELECT COUNT(*) AS n_sample,
         |    CAST(SUM(CAST(p AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS est_mean,
         |    SUM(CAST(p * p AS DECIMAL(38,4))) AS sumsq
         |  FROM k WHERE bk < $aqpBuckets),
         |ex AS (
         |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
         |    / COUNT(*) AS exact_mean
         |  FROM lineitem),
         |calc AS (
         |  SELECT n_sample, est_mean, exact_mean,
         |    sqrt(((CAST(sumsq AS DOUBLE) - n_sample * est_mean * est_mean)
         |          / (n_sample - 1)) / n_sample) AS stderr
         |  FROM samp, ex)
         |SELECT n_sample,
         |  floor(est_mean * 1000000.0 + 0.5) / 1000000.0 AS est_mean,
         |  floor(exact_mean * 1000000.0 + 0.5) / 1000000.0 AS exact_mean,
         |  floor(stderr * 1000000.0 + 0.5) / 1000000.0 AS stderr,
         |  floor((est_mean - exact_mean) / stderr * 1000000.0 + 0.5) / 1000000.0 AS z,
         |  abs((est_mean - exact_mean) / stderr) <= 3.0 AS within_3sigma
         |FROM calc""".stripMargin
    },
    "x100_zorder_audit" ->
      s"""WITH b AS (
         |  SELECT MIN(l_orderkey) AS mn_ok, MAX(l_orderkey) AS mx_ok,
         |         MIN(l_partkey) AS mn_pk, MAX(l_partkey) AS mx_pk,
         |         MIN(l_suppkey) AS mn_sk, MAX(l_suppkey) AS mx_sk
         |  FROM lineitem),
         |e AS (
         |  SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
         |    CAST(floor((l_partkey - b.mn_pk) * ${1 << zBits}.0 / (b.mx_pk - b.mn_pk + 1)) AS BIGINT) AS pk8,
         |    CAST(floor((l_suppkey - b.mn_sk) * ${1 << zBits}.0 / (b.mx_sk - b.mn_sk + 1)) AS BIGINT) AS sk8,
         |    b.mn_ok, b.mx_ok, b.mn_pk, b.mx_pk, b.mn_sk, b.mx_sk
         |  FROM lineitem, b),
         |z AS (SELECT *, ${zSql("pk8", "sk8")} AS zval FROM e),
         |f AS (
         |  SELECT 'linear' AS layout,
         |    CAST(floor((ok - mn_ok) * $zFiles.0 / (mx_ok - mn_ok + 1)) AS BIGINT) AS file, pk, sk FROM z
         |  UNION ALL
         |  SELECT 'partsort',
         |    CAST(floor((pk - mn_pk) * $zFiles.0 / (mx_pk - mn_pk + 1)) AS BIGINT), pk, sk FROM z
         |  UNION ALL
         |  SELECT 'zorder',
         |    CAST(floor(zval * $zFiles.0 / ${1 << (2 * zBits)}) AS BIGINT), pk, sk FROM z),
         |stats AS (
         |  SELECT layout, file, COUNT(*) AS n, MIN(pk) AS f_mn_pk, MAX(pk) AS f_mx_pk,
         |         MIN(sk) AS f_mn_sk, MAX(sk) AS f_mx_sk
         |  FROM f GROUP BY 1, 2),
         |pav AS (
         |  SELECT s.layout, COUNT(*) / COUNT(DISTINCT p.probe) AS avg_scan_part
         |  FROM (SELECT DISTINCT l_partkey AS probe FROM lineitem) p
         |  JOIN stats s ON p.probe >= s.f_mn_pk AND p.probe <= s.f_mx_pk
         |  GROUP BY 1),
         |sav AS (
         |  SELECT s.layout, COUNT(*) / COUNT(DISTINCT p.probe) AS avg_scan_supp
         |  FROM (SELECT DISTINCT l_suppkey AS probe FROM lineitem) p
         |  JOIN stats s ON p.probe >= s.f_mn_sk AND p.probe <= s.f_mx_sk
         |  GROUP BY 1),
         |bal AS (
         |  SELECT layout, COUNT(*) AS n_files, MIN(n) AS min_file_rows, MAX(n) AS max_file_rows
         |  FROM stats GROUP BY 1)
         |SELECT bal.layout, n_files, min_file_rows, max_file_rows,
         |  floor(avg_scan_part * 1000000.0 + 0.5) / 1000000.0 AS avg_scan_part,
         |  floor(avg_scan_supp * 1000000.0 + 0.5) / 1000000.0 AS avg_scan_supp
         |FROM bal JOIN pav USING (layout) JOIN sav USING (layout)
         |ORDER BY layout""".stripMargin,
    "x101_analyze_stats" -> {
      val blocks = statCols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT($c) AS n_values,
           |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
           |  COUNT(DISTINCT $c) AS ndv,
           |  floor(MIN($c) * 1000000.0 + 0.5) / 1000000.0 AS vmin,
           |  floor(MAX($c) * 1000000.0 + 0.5) / 1000000.0 AS vmax,
           |  floor(CAST(SUM(CAST($c AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
           |        * 1000000.0 + 0.5) / 1000000.0 AS vmean
           |FROM lineitem""".stripMargin
      }
      s"SELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY col_name"
    },
    "x102_histograms" -> {
      val blocks = statCols.map { c =>
        s"""SELECT '$c' AS col_name, g.bin,
           |  floor((b.mn + g.bin * (b.mx - b.mn) / 8) * 1000000.0 + 0.5) / 1000000.0 AS lo,
           |  floor((b.mn + (g.bin + 1) * (b.mx - b.mn) / 8) * 1000000.0 + 0.5) / 1000000.0 AS hi,
           |  COALESCE(h.cnt, 0) AS cnt
           |FROM (SELECT MIN($c) AS mn, MAX($c) AS mx FROM lineitem) b
           |CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) g
           |LEFT JOIN (
           |  SELECT LEAST(CAST(floor(($c - b2.mn) * 8 / (b2.mx - b2.mn)) AS BIGINT), 7) AS bin,
           |         COUNT(*) AS cnt
           |  FROM lineitem, (SELECT MIN($c) AS mn, MAX($c) AS mx FROM lineitem) b2
           |  WHERE $c IS NOT NULL GROUP BY 1) h ON h.bin = g.bin""".stripMargin
      }
      s"SELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY col_name, bin"
    },
    "x103_fk_audit" -> {
      val blocks = fkEdges.map { case (child, fk, parent, pk) =>
        s"""SELECT '$child' AS child, '$fk' AS fk, '$parent' AS parent,
           |  COUNT(*) AS n_rows, COUNT(DISTINCT c.$fk) AS n_fk_distinct,
           |  COUNT(CASE WHEN c.$fk IS NOT NULL AND p.$pk IS NULL THEN 1 END) AS n_orphans
           |FROM $child c LEFT JOIN $parent p ON p.$pk = c.$fk""".stripMargin
      }
      s"SELECT * FROM (${blocks.mkString(" UNION ALL ")}) ORDER BY child, fk"
    })
}
