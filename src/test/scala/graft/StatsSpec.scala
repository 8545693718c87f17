package graft

import org.apache.spark.sql.functions._
import graft.operators.StatsQueries

/** Planted-defect and self-consistency tests for the stats/audit family
  * (x101 ANALYZE stats, x102 histograms, x103 FK audit). The synthetic
  * TPC-H data is referentially intact, so the orphan detector is proven on
  * a deliberately corrupted copy of the tables. */
class StatsSpec extends SparkSpec {

  test("x101 column stats agree with directly computed values") {
    val rows = StatsQueries.x101(spark, sfDir).collect()
    assert(rows.length == 4)
    val li = Tables.t(spark, sfDir, "lineitem")
    val n = li.count()
    val qty = rows.find(_.getString(0) == "l_quantity").get
    assert(qty.getLong(1) == n, "count(l_quantity) = rows (no nulls in testdata)")
    assert(qty.getLong(2) == 0L, "no nulls")
    val ndv = li.select(col("l_quantity")).distinct().count()
    assert(qty.getLong(3) == ndv, s"exact NDV: ${qty.getLong(3)} vs $ndv")
    assert(qty.getDouble(4) <= qty.getDouble(6) && qty.getDouble(6) <= qty.getDouble(5),
      "min <= mean <= max")
  }

  test("x102 histograms: counts cover the table, edges tile [min,max], max folds into last bin") {
    val rows = StatsQueries.x102(spark, sfDir).collect()
    assert(rows.length == 4 * 8)
    val n = Tables.t(spark, sfDir, "lineitem").count()
    StatsQueries.statCols.foreach { c =>
      val bins = rows.filter(_.getString(0) == c).sortBy(_.getLong(1))
      assert(bins.map(_.getLong(4)).sum == n, s"$c: bin counts must sum to row count")
      // edges tile: each bin's hi is the next bin's lo (same fix-point arithmetic)
      bins.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(3) == b.getDouble(2), s"$c: non-contiguous bins $a | $b")
      }
      assert(bins.last.getLong(4) > 0, s"$c: max value must fold into the last bin")
    }
  }

  test("x142 corr matrix: diagonal is 1, |corr| bounded, variance matches direct compute") {
    val rows = StatsQueries.x142(spark, sfDir).collect()
    assert(rows.length == 10, "4 cols -> 10 upper-triangle cells")
    rows.foreach { r =>
      val (cx, cy, corr) = (r.getString(0), r.getString(1), r.getDouble(4))
      assert(corr >= -1.0000001 && corr <= 1.0000001, s"|corr| <= 1: $r")
      if (cx == cy) {
        assert(corr == 1.0, s"diagonal corr must be exactly 1.0 after fround: $r")
        assert(r.getDouble(3) >= 0.0, s"variance cell must be non-negative: $r")
      }
    }
    // variance cell vs direct scaled-integer compute in plain Scala
    val q = Tables.t(spark, sfDir, "lineitem").select(col("l_quantity")).collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val n = q.length.toDouble
    val direct = (q.map(v => v * v).sum / 10000.0 - (q.sum / 100.0) * (q.sum / 100.0) / n) / n
    val cell = rows.find(r => r.getString(0) == "l_quantity" && r.getString(1) == "l_quantity").get
    assert(math.abs(cell.getDouble(3) - direct) < 1e-6, s"var(l_quantity): ${cell.getDouble(3)} vs $direct")
  }

  test("x142 melts ONE materialized aggregate: no parquet scan in the emitted plan") {
    // The 10-branch pair melt must not depend on planner exchange reuse
    // for its single-scan promise: the 1-row aggregate is eagerly
    // checkpointed, so the final plan reads a local RDD — zero FileScans.
    val plan = StatsQueries.x142(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"x142 plan should contain no parquet scan (melt reads the checkpointed 1-row agg):\n$plan")
    Engine.reapLocalCheckpoints(spark)
  }

  test("x100 layout audit: zorder prunes both probe dims, single-key sort only its own") {
    val rows = StatsQueries.x100(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    val (linF, linP, linS) = rows("linear")
    val (_, psP, psS) = rows("partsort")
    val (_, zP, zS) = rows("zorder")
    // linear layout (ingest order) prunes ~nothing on either key
    assert(linP > linF * 0.8 && linS > linF * 0.8, s"linear should not prune: $rows")
    // single-key sort: near-perfect on its own key, blind on the other
    assert(psP < linP / 4, s"partsort must prune partkey probes: $rows")
    assert(psS > linF * 0.8, s"partsort is blind on suppkey: $rows")
    // zorder prunes BOTH dimensions materially
    assert(zP < linP / 2 && zS < linS / 2, s"zorder must prune both dims: $rows")
  }

  test("x103 audit is clean on intact data and finds planted orphans") {
    val clean = StatsQueries.x103(spark, sfDir).collect()
    assert(clean.length == StatsQueries.fkEdges.length)
    assert(clean.forall(_.getLong(5) == 0L), s"synthetic TPC-H must be intact: ${clean.mkString(";")}")

    // corrupt a copy: drop one order that has lineitems, then the audit must
    // report exactly that order's lineitem rows as orphans on the
    // lineitem->orders edge and stay clean elsewhere
    val dir = tmpDir("fkaudit")
    val tables = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    val victim = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).limit(1).collect().head.getLong(0)
    tables.foreach { tn =>
      val df = Tables.t(spark, sfDir, tn)
      val out = if (tn == "orders") df.filter(col("o_orderkey") =!= victim) else df
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$tn.parquet")
    }
    val expectOrphans = Tables.t(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") === victim).count()
    assert(expectOrphans > 0, "victim order must have lineitems")
    val audit = StatsQueries.x103(spark, dir).collect()
    val liOrders = audit.find(r => r.getString(0) == "lineitem" && r.getString(1) == "l_orderkey").get
    assert(liOrders.getLong(5) == expectOrphans,
      s"planted orphans: ${liOrders.getLong(5)} vs $expectOrphans")
    assert(audit.filterNot(r => r.getString(0) == "lineitem" && r.getString(1) == "l_orderkey")
      .forall(_.getLong(5) == 0L), "other edges stay clean")
  }

  test("x158 Benford audit matches a naive digit recount + chi-square replay") {
    val rows = StatsQueries.x158(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cents = Tables.t(spark, sfDir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0L)
    val byDigit = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cents.length.toDouble
    rows.foreach { r =>
      val (d, nd) = (r.getLong(0), r.getLong(1))
      assert(byDigit(d) == nd, s"digit $d count: $nd vs ${byDigit(d)}")
      val p = math.log10(1.0 + 1.0 / d)
      assert(r.getDouble(2) == fr6(nd / n), s"obs_share($d)")
      assert(r.getDouble(3) == fr6(p), s"exp_share($d)")
      val dev = nd - n * p
      assert(math.abs(r.getDouble(4) - fr6(dev * dev / (n * p))) < 1e-9, s"chi2_part($d)")
    }
    // every observed digit appears exactly once, ascending
    assert(rows.map(_.getLong(0)).toSeq == byDigit.keys.toSeq.sorted)
  }

  test("x159 KS statistic matches a plain-Scala exact ECDF replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.t(spark, sfDir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val s1 = ev.filter(_._1 == "purchase").map(_._2)
    val s2 = ev.filter(_._1 == "view").map(_._2)
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val grid = (s1 ++ s2).distinct.sorted
    var (c1, c2) = (0L, 0L)
    var best = (BigInt(-1), Long.MaxValue) // (dnum, c) — max dnum, tie min c
    grid.foreach { c =>
      c1 += s1.count(_ == c); c2 += s2.count(_ == c)
      val dnum = (BigInt(c1) * n2 - BigInt(c2) * n1).abs
      if (dnum > best._1) best = (dnum, c)
    }
    val r = operators.StatsQueries.x159(spark, sfDir).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == best._2, s"argmax cents: ${r.getLong(2)} vs ${best._2}")
    val d = best._1.toDouble / (n1.toDouble * n2.toDouble)
    assert(r.getDouble(3) == fr6(d), s"ks_d: ${r.getDouble(3)} vs ${fr6(d)}")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    val crit = 1.358 * math.sqrt((n1.toDouble + n2.toDouble) / (n1.toDouble * n2.toDouble))
    assert(r.getBoolean(5) == (d > crit), "significance call replays")
  }

  test("x162 snapshot reconciliation matches a plain-Scala two-state replay") {
    val t1 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .filter(_._2.before(t2))
    val byKey = li.groupBy(_._1)
    val classes = byKey.toSeq.map { case (_, rows) =>
      val in1 = rows.filter(_._2.before(t1))
      val cls = if (in1.isEmpty) "inserted"
        else if (rows.length > in1.length) "updated" else "unchanged"
      (cls, (rows.length - in1.length).toLong, rows.map(_._3).sum - in1.map(_._3).sum)
    }
    val expect = classes.groupBy(_._1).map { case (cls, xs) =>
      cls -> (xs.length.toLong, xs.map(_._2).sum,
        math.floor(xs.map(_._3).sum.toDouble / 100.0 * 100.0 + 0.5) / 100.0)
    }
    val got = operators.IvmQueries.x162(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nk, dr, dd) = expect(r.getString(0))
      assert(r.getLong(1) == nk && r.getLong(2) == dr && r.getDouble(3) == dd,
        s"class ${r.getString(0)}: ($nk, $dr, $dd) vs $r")
    }
    // unchanged keys contribute zero delta by construction
    got.find(_.getString(0) == "unchanged").foreach { r =>
      assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
  }

  test("x175 trimmed/winsorized means match a naive sorted replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = operators.StatsQueries.x175(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == ev.map(_._1).toSet)
    ev.groupBy(_._1).foreach { case (et, g) =>
      val cs = g.map(_._2).sorted
      val n = cs.length
      val lo = n / 10
      val hi = n - lo
      val kept = cs.slice(lo, hi) // ranks lo+1..hi, 0-indexed
      val (eLo, eHi) = (cs(lo), cs(hi - 1))
      val ts = kept.map(BigInt(_)).sum
      val ws = ts + BigInt(lo) * eLo + BigInt(n - hi) * eHi
      val r = out(et)
      assert(r.getLong(1) == n.toLong && r.getLong(2) == (hi - lo).toLong, s"$et ns")
      assert(r.getLong(3) == eLo && r.getLong(4) == eHi, s"$et edges")
      def hilo(x: BigInt): Double =
        (if (x < 0) -1.0 else 1.0) *
          (((x.abs / 1000000000).toDouble * 1e9) + (x.abs % 1000000000).toDouble)
      assert(r.getDouble(5) == fr6(hilo(ts) / (hi - lo).toDouble / 100.0), s"$et tmean")
      assert(r.getDouble(6) == fr6(hilo(ws) / n.toDouble / 100.0), s"$et wmean")
      // winsorizing pulls toward the center no further than the raw mean spread
      assert(r.getLong(3) <= r.getLong(4), s"$et edge order")
    }
  }

  test("x170 decile bins match a naive sorted-edge replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cs = Tables.t(spark, sfDir, "events")
      .select(round(col("value") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cs.length.toLong
    // all 9 edge ROWS, duplicates kept: coincident quantile edges make the
    // operator's bin numbering skip, and the replay must skip identically
    val edges = (1 to 9).map(q => cs(((q * n + 9) / 10 - 1).toInt))
    val binOf = (c: Long) => 1L + edges.count(_ < c)
    val expect = cs.groupBy(binOf).view.mapValues { g =>
      (g.length.toLong, g.min, g.max, g.map(BigInt(_)).sum)
    }.toMap
    val out = operators.StatsQueries.x170(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == expect.keySet, s"bins: ${out.keySet} vs ${expect.keySet}")
    assert(out.size >= 8, "ties must not collapse the deciles to a handful of bins")
    def hilo(x: BigInt): Double = ((x / 1000000000).toDouble * 1e9) + (x % 1000000000).toDouble
    expect.foreach { case (b, (nr, mn, mx, sc)) =>
      val r = out(b)
      assert(r.getLong(1) == nr && r.getLong(2) == mn && r.getLong(3) == mx, s"bin $b")
      assert(r.getDouble(4) == fr6(hilo(sc) / nr.toDouble / 100.0), s"bin $b mean")
    }
    // equal-frequency contract: every bin within ~1 cell of n/10 on this data
    assert(expect.values.map(_._1).max <= 2 * n / 10 + 1, "no degenerate bin")
  }
}
