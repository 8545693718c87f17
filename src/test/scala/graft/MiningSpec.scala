package graft

import org.apache.spark.sql.functions._
import graft.operators.{MiningQueries, StatsQueries}

/** Plain-Scala replays for the pattern-mining family (x143 ROC-AUC,
  * x144 association rules, x145 CUSUM) — each operator's distributed
  * result re-derived with naive single-threaded code over the same rows. */
class MiningSpec extends SparkSpec {

  private def events =
    Tables.t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2)))

  test("x143 per-day AUC matches the naive all-pairs Mann-Whitney count") {
    val rows = StatsQueries.x143(spark, sfDir).collect()
    assert(rows.nonEmpty, "one row per day")
    val byDay = events.groupBy(_._1)
    rows.take(5).foreach { r =>
      val day = r.getDate(0).toString
      val (pos, neg) = byDay(day).partition(_._2 == "purchase")
      assert(r.getLong(1) == pos.size && r.getLong(2) == neg.size, s"class counts: $r")
      if (pos.nonEmpty && neg.nonEmpty) {
        // the O(n^2) definition: #(pos>neg) + 0.5 * #(pos==neg)
        val wins = (for (p <- pos; n <- neg) yield {
          if (p._3 > n._3) 2L else if (p._3 == n._3) 1L else 0L
        }).sum
        val auc = wins.toDouble / (2.0 * pos.size * neg.size)
        assert(math.abs(r.getDouble(3) - auc) < 1e-6, s"$day: ${r.getDouble(3)} vs $auc")
      } else assert(r.isNullAt(3), s"degenerate day must emit NULL AUC: $r")
    }
  }

  test("x154 calibration bins match a naive min-max binning replay") {
    val rows = StatsQueries.x154(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val cs = events.map { case (_, et, v) =>
      (math.round(v * 100), if (et == "purchase") 1L else 0L)
    }
    val (cmin, cmax) = (cs.map(_._1).min, cs.map(_._1).max)
    val r = math.max(cmax - cmin, 1L)
    val byBin = cs.groupBy { case (c, _) => math.min((c - cmin) * 10 / r, 9L) }
    assert(rows.length == byBin.size, "one row per non-empty bin")
    rows.foreach { row =>
      val bin = row.getLong(0)
      val es = byBin(bin)
      assert(row.getLong(1) == es.length, s"bin $bin n")
      assert(row.getLong(2) == es.map(_._2).sum, s"bin $bin n_pos")
      val ps = es.map(e => (e._1 - cmin).toDouble / r)
      val meanP = ps.sum / ps.length
      assert(math.abs(row.getDouble(3) - meanP) < 1e-5, s"bin $bin mean_score")
      val posRate = es.map(_._2).sum.toDouble / es.length
      assert(math.abs(row.getDouble(4) - posRate) < 1e-5, s"bin $bin pos_rate")
      assert(math.abs(row.getDouble(5) - math.abs(meanP - posRate)) < 1e-5, s"bin $bin gap")
      val brier = es.map { case (c, y) =>
        val p = (c - cmin).toDouble / r; (p - y) * (p - y)
      }.sum / es.length
      assert(math.abs(row.getDouble(6) - brier) < 1e-5, s"bin $bin brier: ${row.getDouble(6)} vs $brier")
    }
  }

  test("x144 association rules match a naive basket recount; ranks are total-ordered") {
    val rules = MiningQueries.x144(spark, sfDir).collect()
    assert(rules.nonEmpty && rules.length <= 50)
    val baskets = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val isup = baskets.groupBy(_._2).map { case (i, xs) => i -> xs.length.toLong }
    val th = math.max(2L, math.ceil(isup.values.sum.toDouble / isup.size).toLong)
    val freqB = baskets.filter(b => isup(b._2) >= th)
    val pairSup = freqB.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).distinct.sorted
      for (i <- is.indices; j <- i + 1 until is.size) yield (is(i), is(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val nb = baskets.map(_._1).distinct.length.toLong
    rules.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1, s"rank must be dense from 1: $r")
      val (a, b, sup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pairSup((a, b)) == sup, s"pair support recount: $r")
      assert(r.getLong(4) == isup(a) && r.getLong(5) == isup(b), s"item supports: $r")
      val lift = nb.toDouble * sup / (isup(a).toDouble * isup(b).toDouble)
      assert(math.abs(r.getDouble(8) - lift) < 1e-6, s"lift: $r vs $lift")
    }
    // the reported head is the true max support over ALL qualifying pairs
    assert(rules.head.getLong(3) == pairSup.values.max, "rank 1 carries the max support")
  }

  test("x146 OLS trend matches a naive least-squares fit per event type") {
    val rows = StatsQueries.x146(spark, sfDir).collect()
    val byType = events.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    val d0 = events.map(_._1).min
    def dayIdx(d: String) =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(d0), java.time.LocalDate.parse(d)).toDouble
    rows.foreach { r =>
      val xs = byType(r.getString(0)).map(e => (dayIdx(e._1), e._3))
      val n = xs.length.toDouble
      assert(r.getLong(1) == xs.length)
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map(e => e._1 * e._2).sum
      val sxx = xs.map(e => e._1 * e._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = sy / n - slope * (sx / n)
      assert(math.abs(r.getDouble(2) - slope) < 1e-4, s"slope: $r vs $slope")
      assert(math.abs(r.getDouble(3) - icept) < 1e-3, s"intercept: $r vs $icept")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"r2 in [0,1]: $r")
    }
  }

  test("x147 RRF fusion: score recomputes from the emitted ranks; prior list matches direct compute") {
    val rows = operators.TextQueries.x147(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1, "dense rank from 1")
      val ra = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rb = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val expect = ra.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-6, s"rrf recompute: $r")
    }
    val rrfs = rows.map(_.getDouble(4))
    assert(rrfs.sameElements(rrfs.sortBy(-_)), "rrf non-increasing with rank")
    // the prior ranking is exactly (n_chars DESC, doc_id) over the corpus
    val prior = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, nc) => (-nc, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(prior.get(r.getLong(1)).contains(r.getLong(3)), s"prior rank: $r")
    }
    // the lexical ranks agree with x34 (same ordering, top-20 visible there)
    val bm = operators.TextQueries.x34(spark, sfDir).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    rows.filter(r => !r.isNullAt(2) && r.getLong(2) <= 20).foreach { r =>
      assert(bm.get(r.getLong(1)).contains(r.getLong(2)), s"bm25 rank vs x34: $r")
    }
  }

  test("x149 A/B readout matches a naive recount and the closed-form z") {
    val r = MiningQueries.x149(spark, sfDir).collect().head
    val evs = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(e => (e.getLong(0) % 2, e.getString(1) == "purchase"))
    val (a, b) = evs.partition(_._1 == 0)
    assert(r.getLong(0) == a.length && r.getLong(2) == b.length, s"group sizes: $r")
    val (ca, cb) = (a.count(_._2).toLong, b.count(_._2).toLong)
    assert(r.getLong(1) == ca && r.getLong(3) == cb, s"conversions: $r")
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val p = (ca + cb) / (na + nb)
    val z = (ca / na - cb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-6, s"z: ${r.getDouble(6)} vs $z")
    assert(r.getBoolean(7) == (math.abs(z) >= 1.96), s"significance call: $r")
  }

  test("x150 skew profile matches a naive key-frequency recount per column") {
    val rows = StatsQueries.x150(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    val li = Tables.t(spark, sfDir, "lineitem")
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach { c =>
      val counts = li.select(col(c)).collect().map(_.getLong(0))
        .groupBy(identity).values.map(_.length.toLong).toSeq.sorted
      val r = rows(c)
      val (nk, nr) = (counts.length.toLong, counts.sum)
      assert(r.getLong(1) == nr && r.getLong(2) == nk && r.getLong(3) == counts.max, s"$c: $r")
      val p99 = counts(math.floor((nk - 1).toDouble * 0.99).toInt)
      assert(r.getLong(4) == p99, s"$c p99: ${r.getLong(4)} vs $p99")
      val six = counts.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      val gini = (2.0 * six - (nk + 1.0) * nr) / (nk.toDouble * nr)
      assert(math.abs(r.getDouble(7) - gini) < 1e-6, s"$c gini: ${r.getDouble(7)} vs $gini")
    }
  }

  test("x151 prefix-filtered join equals the brute-force Jaccard>=0.8 pair set") {
    val got = operators.DedupQueries.x151(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // brute force in plain Scala over the same shingle sets
    val sets = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        val sh = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(r.getString(1))
        r.getLong(0) -> sh
      }.sortBy(_._1)
    val expect = (for {
      i <- sets.indices; j <- i + 1 until sets.length
      in = (sets(i)._2 & sets(j)._2).size.toLong
      un = (sets(i)._2 | sets(j)._2).size.toLong
      if 5 * in >= 4 * un
    } yield ((sets(i)._1, sets(j)._1), (in, un))).toMap
    assert(got == expect,
      s"missing=${(expect.keySet -- got.keySet).take(3)} extra=${(got.keySet -- expect.keySet).take(3)}")
    assert(expect.nonEmpty, "fixture must contain near-dup pairs or the test is vacuous")
  }

  test("x145 CUSUM matches a naive sequential fold per event type") {
    val out = MiningQueries.x145(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val byType = events.groupBy(_._2)
    assert(out.keySet == byType.keySet)
    byType.foreach { case (et, xs) =>
      val daily = xs.groupBy(_._1).map { case (d, ys) => d -> ys.length.toLong }
        .toSeq.sortBy(_._1)
      val tot = daily.map(_._2).sum
      val nd = daily.length.toLong
      var (sp, sn, bp, bn) = (0L, 0L, -1L, -1L)
      var (dp, dn): (String, String) = (null, null)
      daily.foreach { case (day, cnt) =>
        sp = math.max(0L, sp + nd * cnt - tot)
        sn = math.max(0L, sn - (nd * cnt - tot))
        if (sp > bp) { bp = sp; dp = day }
        if (sn > bn) { bn = sn; dn = day }
      }
      val r = out(et)
      assert(r.getLong(1) == nd, s"$et n_days")
      assert(r.getLong(2) == bp && r.getDate(3).toString == dp, s"$et pos peak: $r vs ($bp,$dp)")
      assert(r.getLong(4) == bn && r.getDate(5).toString == dn, s"$et neg peak: $r vs ($bn,$dn)")
    }
  }

  test("x165 conformal threshold + coverage match a naive quantile replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = operators.MiningQueries.x165(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val cal = rows.filter(_._3 % 2 == 0).map(_._2).sorted
      val test = rows.filter(_._3 % 2 != 0).map(_._2)
      val k = (9 * (cal.length + 1) + 9) / 10
      val q = cal(k - 1) // k-th smallest, 1-indexed
      val cov = test.count(_ <= q).toDouble / test.length
      val r = out(et)
      assert(r.getLong(1) == cal.length.toLong && r.getLong(2) == test.length.toLong)
      assert(r.getLong(3) == k.toLong, s"$et rank k")
      assert(r.getLong(4) == q, s"$et threshold: ${r.getLong(4)} vs $q")
      assert(r.getDouble(5) == fr6(cov), s"$et coverage")
      // The split-conformal guarantee (coverage ≥ 1−α) is marginal over
      // exchangeable splits; a FIXED even/odd split realizes one binomial
      // draw, so test within 3σ of the target for this test-half size —
      // a deterministic band that can only fail if the operator is wrong
      // by more than sampling noise, not because the fixture got unlucky.
      val band = 0.9 - 3.0 * math.sqrt(0.9 * 0.1 / test.length) - 1.0 / test.length
      assert(r.getDouble(5) >= band,
        s"$et coverage ${r.getDouble(5)} below 3-sigma band $band (n_test=${test.length})")
    }
  }

  test("x166 ABC classes match a naive sorted-cumulative-share replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * (1.0 - r.getDouble(2)) * 10000.0)))
    val rev = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (pk, rv) => (-rv, pk) }
    val tot = rev.map(x => BigInt(x._2)).sum
    var cum = BigInt(0)
    val classed = rev.map { case (_, rv) =>
      cum += rv
      if (cum * 5 <= tot * 4) "A" else if (cum * 20 <= tot * 19) "B" else "C"
    }
    val expect = classed.zip(rev.map(_._2)).groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(x => BigInt(x._2)).sum)).toMap
    val out = operators.MiningQueries.x166(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == expect.keySet, s"classes: ${out.keySet} vs ${expect.keySet}")
    // the flood-of-equal-revenue degenerate can merge classes; the fixture must not
    assert(out.keySet == Set("A", "B", "C"), "fixture must produce all three classes")
    def hilo(x: BigInt): Double = ((x / 1000000000).toDouble * 1e9) + (x % 1000000000).toDouble
    expect.foreach { case (cls, (nCls, revCls)) =>
      val r = out(cls)
      assert(r.getLong(1) == nCls, s"$cls n_parts")
      assert(r.getDouble(2) == fr6(nCls.toDouble / rev.length.toDouble), s"$cls part_share")
      assert(r.getDouble(3) == fr6(hilo(revCls) / hilo(tot)), s"$cls rev_share")
    }
  }
}
