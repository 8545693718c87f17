package graft

import org.apache.spark.sql.functions._

/** CurationDemo: stage arithmetic and byte-level reproducibility, plus
  * planted-fixture tests for the x45 decontamination and x46 PII-scrub
  * stages (the synthetic corpus has no PII, so the PII regexes are proven
  * on planted documents). */
class CurationSpec extends SparkSpec {

  test("curation pipeline filters monotonically and reproduces identical splits") {
    val out1 = tmpDir("curation1")
    val (raw, scored, kept, lm, clean, surv, sampled) = CurationDemo.run(spark, sfDir, out1)
    assert(raw > 0 && scored <= raw && kept <= scored && lm <= kept &&
      clean <= lm && surv <= clean && sampled <= surv,
      s"($raw, $scored, $kept, $lm, $clean, $surv, $sampled)")
    assert(sampled > 0, "pipeline must not drop everything")
    // the boilerplate gate (x78, df≥3 density ≥ 0.7) must actually fire on
    // this corpus: the sf tables contain docs above the threshold
    assert(kept < scored, s"boilerplate gate dropped nothing ($scored -> $kept)")
    // the LM gate (x58, avg_p/oov thresholds) must actually fire too
    assert(lm < kept, s"LM gate dropped nothing ($kept -> $lm)")

    // shipped parquet is self-consistent: n_chars describes the scrubbed
    // text that ships, not the pre-scrub lengths
    Seq("train", "val", "test").foreach { s =>
      val bad = spark.read.parquet(s"$out1/$s")
        .filter(col("n_chars") =!= length(col("text"))).count()
      assert(bad == 0L, s"split $s has $bad rows where n_chars != len(text)")
    }

    val splitCounts = Seq("train", "val", "test").map { s =>
      s -> spark.read.parquet(s"$out1/$s").count()
    }.toMap
    assert(splitCounts.values.sum == sampled, s"$splitCounts vs $sampled")

    // the shipped data card accounts for every shipped doc, with zero
    // residual within-source exact dups (dedup ran upstream)
    val cards = spark.read.parquet(s"$out1/cards").collect()
    assert(cards.map(_.getLong(1)).sum == sampled, "cards must cover the shipped corpus")
    assert(cards.forall(_.getLong(4) == 0L), "no residual within-source exact dups")

    // train shards (x79) cover exactly the train split, with contiguous
    // per-shard positions
    val shards = spark.read.parquet(s"$out1/shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val trainIds = spark.read.parquet(s"$out1/train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shards.map(_._1).toSet == trainIds, "shards must cover the train split")
    shards.groupBy(_._2).foreach { case (sh, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (0L until xs.length).toSeq,
        s"shard $sh positions not contiguous")
    }

    // the shipped tokenizer (x67 over the train split): K merges, counts
    // nonincreasing, pairs bounded by the split's token stream
    val merges = spark.read.parquet(s"$out1/tokenizer")
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(merges.map(_._1).toSeq == (1L to 6L))
    val mN = merges.map(_._3)
    assert(mN.zip(mN.tail).forall { case (a, b) => a >= b })

    // reproducibility: second run writes value-identical splits + tokenizer
    val out2 = tmpDir("curation2")
    CurationDemo.run(spark, sfDir, out2)
    Seq("train", "val", "test", "tokenizer").foreach { s =>
      def sorted(dir: String) = {
        val df = spark.read.parquet(s"$dir/$s")
        df.orderBy(df.columns.map(col).toSeq: _*).collect().toSeq
      }
      assert(sorted(out1) == sorted(out2), s"artifact $s not reproducible")
    }
  }

  test("no dropped cluster member survives, every keeper does (modulo quality gate)") {
    val members = operators.DedupQueries.clusterMembers(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    val out = tmpDir("curation3")
    CurationDemo.run(spark, sfDir, out)
    val surviving = Seq("train", "val", "test").flatMap { s =>
      spark.read.parquet(s"$out/$s").select("doc_id").collect().map(_.getLong(0))
    }.toSet
    members.filter(!_._2).foreach { case (id, _) =>
      assert(!surviving.contains(id), s"non-keeper $id survived dedup")
    }
  }

  /** Write a planted documents table; returns its dir. Text column only
    * needs (doc_id, lang, text) — every curation query reads just these. */
  private def plant(rows: Seq[(Long, String, String)], prefix: String): String = {
    val dir = tmpDir(prefix)
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x45 flags exactly the planted train→test contamination") {
    // split assignment is a pure function of doc_id — compute it up front
    import spark.implicits._
    val split = (0L until 200L).toDF("doc_id")
      .withColumn("s", operators.SamplingQueries.splitCol(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = (0L until 200L).find(split(_) == "train").get
    val testId = (0L until 200L).find(split(_) == "test").get
    val valId = (0L until 200L).find(split(_) == "val").get

    // 20 shared tokens → 8 shared 13-grams between trainId and testId;
    // a val↔test copy must NOT appear (only train docs are reported);
    // everything else gets unique tokens (no 13-gram can repeat)
    val shared = (1 to 20).map(i => s"leak$i").mkString(" ")
    val rows = (0L until 200L).map { id =>
      val text =
        if (id == trainId || id == testId) shared
        else if (id == valId) shared // val copy: leaks, but not train's problem
        else (1 to 20).map(j => s"u${id}t$j").mkString(" ")
      (id, "en", text)
    }
    val dir = plant(rows, "decon")
    val got = operators.CurationQueries.x45(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(trainId),
      s"expected only doc $trainId, got ${got.map(_.getLong(0)).mkString(",")}")
    val r = got.head
    assert(r.getLong(1) == 8 && r.getLong(2) == 8, s"20 tokens → 8 13-grams: $r")
    assert(r.getLong(3) == 1, s"one eval doc hit: $r")
    assert(r.getDouble(4) == 1.0, s"fully contaminated: $r")
  }

  test("x88 Bloom-prefiltered decontamination: exact x45 parity + real pruning") {
    // EXACTNESS: the Bloom stage must be invisible in the result — x88's
    // whole report equals x45's on the real corpus (and both answer to the
    // same oracle twin). Collected as sorted tuples: sub-second at sf0.001.
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(rows(operators.CurationQueries.x88(spark, sfDir))
      == rows(operators.CurationQueries.x45(spark, sfDir)))

    // The expression itself: no false negatives, codegen + interpreted agree.
    import spark.implicits._
    val bf = org.apache.spark.util.sketch.BloomFilter.create(3, 0.03)
    Seq(7L, 8L, 9L).foreach(bf.putLong)
    val bytes = graft.functions.BloomExpr.toBytes(bf)
    val probe = (0L until 1000L).toDF("g")
    val kept = probe
      .filter(graft.functions.BloomExpr.mightContainLong(bytes, col("g")))
      .collect().map(_.getLong(0)).toSet
    assert(Set(7L, 8L, 9L).subsetOf(kept), s"false negative: $kept")
    // fpp sanity (not exactness — just that the filter filters): ≤5% of the
    // 997 non-members may slip through at the 3% operating point
    assert(kept.size <= 3 + 50, s"bloom passed ${kept.size} of 1000")
  }

  test("contaminatedIds (pair-free flag form) equals x45's flagged id set") {
    val flagged = operators.CurationQueries.decontamination(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val semi = operators.CurationQueries.contaminatedIds(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(semi == flagged,
      s"semi-join flag set must equal the x45 report's ids: $semi vs $flagged")
  }

  test("x47 separates planted boilerplate from planted unique text") {
    val rows = Seq(
      // 10 tokens, all one repeated word -> 9 identical 2-grams
      (0L, "en", Seq.fill(10)("spam").mkString(" ")),
      // 10 distinct tokens -> 9 distinct 2-grams
      (1L, "en", (1 to 10).map(i => s"w$i").mkString(" ")),
      // half-and-half: "a b" repeated 5 times -> 9 grams, 2 distinct,
      // top gram "a b" appears 5 times
      (2L, "en", Seq.fill(5)("a b").mkString(" ")))
    val dir = plant(rows, "rep")
    val got = operators.TextQueries.x47(spark, dir).orderBy(col("doc_id")).collect()
    val byId = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(byId(0L) == ((9L, 1L, 9L, 1.0, 0.8889)), s"boilerplate: ${byId(0L)}")
    assert(byId(1L) == ((9L, 9L, 1L, 0.1111, 0.0)), s"unique: ${byId(1L)}")
    assert(byId(2L) == ((9L, 2L, 5L, 0.5556, 0.7778)), s"mixed: ${byId(2L)}")
  }

  test("x36 normalization merges planted case/punct/stopword variants") {
    val rows = Seq(
      (0L, "en", "The  Quick, BROWN fox!"),   // case+punct+double-space noise
      (1L, "en", "quick brown fox"),           // already canonical — must merge with 0
      (2L, "en", "the a of and"),              // all stopwords -> empty canon
      (3L, "en", "unique words here"))
    val dir = plant(rows, "norm")
    val got = operators.TextQueries.x36(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 4L, "docs")
    assert(r.getLong(2) == 4L, "raw texts all distinct")
    assert(r.getLong(3) == 3L, "canon merges 0 and 1")
    assert(r.getLong(4) == 9L, "canon tokens: 3 + 3 + 0 + 3")
  }

  test("x37 vocab induction: exact ranks, tie-break by token, cumulative coverage") {
    val rows = Seq(
      (0L, "en", "b b b a"),
      (1L, "en", "a c b"),
      (2L, "en", "d d")) // d ties a at n=2 -> token-ascending order
    val dir = plant(rows, "vocab")
    val got = operators.TextQueries.x37(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "b", 4L, 0.444444),
      (2L, "a", 2L, 0.666667),
      (3L, "d", 2L, 0.888889),
      (4L, "c", 1L, 1.0)), got.toSeq.toString)
  }

  test("x38 source overlap: planted containment matrix, direction-sensitive") {
    // A: grams {w1w2w3, w2w3w4, w3w4w5} (w2w3w4 appears in both A docs —
    // counted once); B: {w1w2w3, w2w3zz}; C: short doc -> whole-text gram,
    // overlaps nothing and must not appear in the matrix.
    val dir = tmpDir("overlap")
    import spark.implicits._
    Seq(
      (0L, "en", "w1 w2 w3 w4", "A"),
      (1L, "en", "w2 w3 w4 w5", "A"),
      (2L, "en", "w1 w2 w3 zz", "B"),
      (3L, "en", "aa bb", "C"))
      .toDF("doc_id", "lang", "text", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextQueries.x38(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("A", "B", 1L, 3L, 0.3333),
      ("B", "A", 1L, 2L, 0.5)), got.toSeq.toString)
  }

  test("x39 sequence packing: prefix sums, boundary straddle, per-source reset") {
    // Source A: doc0 has 500 tokens (seq 0, off 0..499), doc1 has 20 tokens
    // (starts seq 0 off 500, ends in seq 1 -> straddles), doc2 has 4 tokens
    // (seq 1). Source B restarts at prev=0.
    val rows = Seq(
      (0L, "en", Seq.fill(500)("w").mkString(" "), "A"),
      (1L, "en", Seq.fill(20)("w").mkString(" "), "A"),
      (2L, "en", "w w w w", "A"),
      (3L, "en", "y y y", "B"))
    val dir = tmpDir("pack")
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextQueries.x39(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("A", 0L, 500L, 0L, 0L, 0L),
      ("A", 1L, 20L, 0L, 500L, 1L),
      ("A", 2L, 4L, 1L, 8L, 1L),
      ("B", 3L, 3L, 0L, 0L, 0L)), got.toSeq.toString)
  }

  test("x78 boilerplate density: df>=3 span flagged, unique spans not") {
    // "a b c" appears in docs 0,1,2 (df=3 -> common); every other 3-gram
    // is unique (df=1). Doc 3 shares no span at threshold.
    val rows = Seq(
      (0L, "en", "a b c d e"),
      (1L, "en", "a b c x y"),
      (2L, "en", "a b c z w"),
      (3L, "en", "p q r s"))
    val dir = plant(rows, "boiler")
    val got = operators.TextQueries.x78(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (0L, 3L, 1L, 0.3333),
      (1L, 3L, 1L, 0.3333),
      (2L, 3L, 1L, 0.3333),
      (3L, 2L, 0L, 0.0)), got.toSeq.toString)
  }

  test("x46 scrubs planted PII and counts hits per class") {
    val rows = Seq(
      (0L, "en", "contact alice.smith+x@example.org for the report"),
      (1L, "en", "call 555-123-4567 or +1 555 987 6543 today"),
      (2L, "en", "ssn 123-45-6789 on file"),
      (3L, "en", "the customer bought a vector of parts"),
      (4L, "en", "nothing sensitive here at all"))
    val dir = plant(rows, "pii")
    val sc = operators.CurationQueries.scrubbed(spark, dir)
      .orderBy(col("doc_id")).collect()
    assert(sc(0).getAs[String]("scrubbed") == "contact [EMAIL] for the report")
    assert(sc(1).getAs[String]("scrubbed") == "call [PHONE] or +1 [PHONE] today")
    assert(sc(2).getAs[String]("scrubbed") == "ssn [ID] on file")
    assert(sc(3).getAs[String]("scrubbed") == "the [TERM] bought a [TERM] of parts")
    assert(sc(4).getAs[String]("scrubbed") == rows(4)._3, "clean doc unchanged")

    val agg = operators.CurationQueries.x46(spark, dir).collect()
    assert(agg.length == 1)
    val r = agg.head
    assert(r.getAs[Long]("hits_email") == 1)
    assert(r.getAs[Long]("hits_phone") == 2)
    // the SSN also matches the phone-shaped prefix? no — phone needs two
    // separators with 3-3-4 digit groups; 123-45-6789 is 3-2-4 → id only
    assert(r.getAs[Long]("hits_id") == 1)
    assert(r.getAs[Long]("hits_term") == 2)
    assert(r.getAs[Long]("docs_flagged") == 4)
  }

  test("PiiScrubScan differentially matches the java.util.regex chain") {
    import java.util.regex.Pattern
    val pats = operators.CurationQueries.piiPatterns
    val compiled = pats.map { case (n, p, r) => (n, Pattern.compile(p), r) }
    // the reference semantics the scanner must replay: regexp_count =
    // non-overlapping find() loop on RAW text; regexp_replace chain =
    // sequential replaceAll in declaration order (replacements contain no
    // $ or \, so Matcher.replaceAll is verbatim — same as Spark's)
    def ref(text: String): (Seq[Long], String) = {
      val counts = compiled.map { case (_, p, _) =>
        val m = p.matcher(text); var c = 0L
        while (m.find()) c += 1
        c
      }
      val scrub = compiled.foldLeft(text) { case (t, (_, p, r)) =>
        p.matcher(t).replaceAll(r)
      }
      (counts, scrub)
    }
    val adversarial = Seq(
      // email greedy/backtrack shapes
      "a@b.co", "a@b.c", "a@b.comm5", "a@b.co-customer", "a@b.co9customer",
      "..ab@c.de fg", "x@y..co", "a@b.c-d.co", "%+-@x.ab", "@x.ab", "a@b",
      "a.b@c", "abc@def.GHI", "a@b.co.", "user@sub.domain.co.uk extra",
      "a@b.cocustomer", "a@b.co_customer", "123-45-6789@x.ab tail",
      // phone optional-plus / separators / digit-run edges
      "+555-123-4567", "555.123.4567", "555 123 45678", "1555-123-4567",
      "+a555-123-4567", "+1 555 987 6543", "555-123-456", "++555-123-4567",
      // id vs phone disambiguation, overlap advance
      "123-45-6789", "9123-45-67890", "123-456-7890", "123-45-6789-12-3456",
      // term word boundaries incl. non-ASCII neighbors
      "customer", "customers", "a customer.", "vector_x", "VECTOR",
      "my,vector!", "customervector", "customer customer", "é customer",
      "naïve vector café", "0customer", "customer0", "_vector_",
      // mixed & degenerate
      "email a1@b2.cd phone 555-123-4567 ssn 123-45-6789 customer vector",
      "", " ", "@", "+", ".", "a", "....", "+++", "---")
    // deterministic fuzz over a pattern-char-dense alphabet
    val alphabet = "abc@.-_ 0159+%customer vectoré\n"
    var seed = 0x9e3779b97f4a7c15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val fuzz = (0 until 300).map { _ =>
      val len = nextInt(60)
      (0 until len).map(_ => alphabet(nextInt(alphabet.length))).mkString
    }
    val texts = adversarial ++ fuzz
    import spark.implicits._
    val got = texts.toDF("text")
      .select(col("text"), functions.PiiExprs.piiScrubScan(col("text")).as("pii"))
      .select(col("text"), col("pii.*")).collect()
    got.foreach { r =>
      val text = r.getString(0)
      val (cs, scrub) = ref(text)
      val gotCs = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(gotCs == cs, s"counts for <$text>: got $gotCs want $cs")
      assert(r.getString(5) == scrub, s"scrub for <$text>: got <${r.getString(5)}> want <$scrub>")
    }
  }

  test("x160 chi2 feature selection matches a naive 2x2-table replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").distinct))
    val n = docs.length.toLong
    val langTot = docs.groupBy(_._1).map { case (l, xs) => l -> xs.length.toLong }
    val tl = docs.flatMap { case (l, toks) => toks.map(tk => (tk, l)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val tokTot = tl.toSeq.groupBy(_._1._1).map { case (tk, xs) => tk -> xs.map(_._2).sum }
    val scored = tl.toSeq.map { case ((tk, l), a) =>
      val (nt, nl) = (tokTot(tk), langTot(l))
      val det = (BigInt(a) * (n - nt - nl + a) - BigInt(nt - a) * (nl - a)).toDouble
      val chi2 = n.toDouble * det * det /
        (nt.toDouble * (n - nt).toDouble * nl.toDouble * (n - nl).toDouble)
      (tk, l, a, nt, nl, fr6(chi2))
    }
    val best = scored.groupBy(_._1).map { case (_, xs) =>
      xs.minBy { case (_, l, _, _, _, c) => (-c, l) } // chi2 desc, lang asc
    }.toSeq
    val expect = best.sortBy { case (tk, _, _, _, _, c) => (-c, tk) }
      .take(operators.TextQueries.chi2TopK)
      .map { case (tk, l, a, nt, nl, c) => (tk, l, a, nt, nl, c) }
    val got = operators.TextQueries.x160(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect, s"got ${got.take(2)} … expected ${expect.take(2)} …")
  }

  test("x164 Zipf audit matches a plain-Scala fix-point OLS replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val toks = Tables.t(spark, sfDir, "documents")
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
    val top = toks.groupBy(identity).toSeq
      .map { case (tk, xs) => (tk, xs.length.toLong) }
      .sortBy { case (tk, c) => (-c, tk) }.take(20)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1e9 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1e9 + 0.5).toLong)
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble / 1e9
    val sy = pts.map(_._2).sum.toDouble / 1e9
    def big(f: ((Long, Long)) => BigInt) = pts.map(f).sum.toDouble / 1e18
    val sxx = big { case (x, _) => BigInt(x) * x }
    val sxy = big { case (x, y) => BigInt(x) * y }
    val syy = big { case (_, y) => BigInt(y) * y }
    val (cxy, cxx, cyy) = (m * sxy - sx * sy, m * sxx - sx * sx, m * syy - sy * sy)
    val r = operators.TextQueries.x164(spark, sfDir).collect().head
    assert(r.getLong(0) == pts.length.toLong)
    assert(math.abs(r.getDouble(1) - fr6(-(cxy / cxx))) < 2e-6, "alpha")
    assert(math.abs(r.getDouble(2) - fr6((sy - (cxy / cxx) * sx) / m)) < 2e-6, "intercept")
    assert(math.abs(r.getDouble(3) - fr6(cxy * cxy / (cxx * cyy))) < 2e-6, "r2")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "R2 range")
    assert(r.getDouble(1) > 0.0, "rank-frequency curve must fall (alpha > 0)")
  }

  test("x169 kappa matches a naive confusion-matrix replay of the lang-ID") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val profiles = Map( // the x32 bigram profiles, mirrored
      "en" -> Seq("th", "he", "in", "er", "an"),
      "es" -> Seq("de", "en", "la", "el", "os"),
      "fr" -> Seq("es", "le", "de", "en", "re"),
      "de" -> Seq("en", "er", "ch", "de", "ei"),
      "zh" -> Seq("zh", "sh", "ng", "ia", "uo"))
    val langs = profiles.keys.toSeq.sorted
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // non-overlapping occurrence count via replaceAll — the regexp_replace
    // semantics both engines use, NOT a sliding window (overlaps differ)
    def score(text: String, l: String): Int =
      profiles(l).map(bg => (text.length - text.replaceAll(bg, "").length) / 2).sum
    val conf = docs.map { case (label, text) =>
      val guess = langs.maxBy(l => (score(text, l), -langs.indexOf(l)))
      (label, guess)
    }
    val n = BigInt(conf.length)
    val diag = BigInt(conf.count { case (a, b) => a == b })
    val rows = conf.groupBy(_._1).view.mapValues(g => BigInt(g.length)).toMap
    val cols = conf.groupBy(_._2).view.mapValues(g => BigInt(g.length)).toMap
    val rc = rows.map { case (k, r) => r * cols.getOrElse(k, BigInt(0)) }.sum
    def hilo(x: BigInt): Double = ((x / 1000000000).toDouble * 1e9) + (x % 1000000000).toDouble
    val (num, den) = (n * diag - rc, n * n - rc)
    val kappa = (if (num < 0) -1.0 else 1.0) * hilo(num.abs) / hilo(den)
    val r = operators.TextQueries.x169(spark, sfDir).collect().head
    assert(r.getLong(0) == conf.length.toLong && r.getLong(1) == diag.toLong)
    assert(r.getDouble(2) == fr6(diag.toDouble / conf.length.toDouble), "po")
    assert(r.getDouble(3) == fr6(hilo(rc) / (conf.length.toDouble * conf.length.toDouble)), "pe")
    assert(r.getDouble(4) == fr6(kappa), s"kappa ${r.getDouble(4)} vs ${fr6(kappa)}")
  }

  test("x171 burstiness matches a naive per-doc count replay with absent-as-zero") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val texts = Tables.t(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val nd = BigInt(texts.length)
    val perDoc = texts.map(_.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong).toMap)
    val totals = perDoc.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = totals.toSeq.sortBy { case (tok, s) => (-s, tok) }.take(30)
    val out = operators.TextQueries.x171(spark, sfDir).collect()
    assert(out.length == top.length)
    def hilo(x: BigInt): Double = ((x / 1000000000).toDouble * 1e9) + (x % 1000000000).toDouble
    out.zip(top).foreach { case (r, (tok, s)) =>
      assert(r.getString(0) == tok, s"order: ${r.getString(0)} vs $tok")
      val cs = perDoc.map(_.getOrElse(tok, 0L)).filter(_ > 0)
      assert(r.getLong(1) == cs.size.toLong && r.getLong(2) == s, s"$tok counts")
      val ss = cs.map(c => BigInt(c) * c).sum
      val num = nd * ss - BigInt(s) * BigInt(s)
      val vmr = hilo(num) / (nd.toDouble * s.toDouble)
      assert(r.getDouble(3) == fr6(vmr), s"$tok vmr ${r.getDouble(3)} vs ${fr6(vmr)}")
    }
    // the corpus must actually exhibit burstiness or the audit is vacuous
    assert(out.exists(_.getDouble(3) > 1.0), "at least one over-dispersed token")
  }

  test("x174 JS divergence matches a naive dense-grid replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (src, tx) => tx.split(" ", -1).map(src -> _) }
    val top = toks.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(200).map(_._1)
    val topSet = top.toSet
    val byScT = toks.filter(t => topSet(t._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val srcs = docs.map(_._1).distinct.sorted
    def cnt(src: String, tok: String) = byScT.getOrElse((src, tok), 0L)
    val tots = srcs.map(s0 => s0 -> top.map(tk => cnt(s0, tk)).sum).toMap
    def hilo(x: BigInt): Double = ((x / 1000000000).toDouble * 1e9) + (x % 1000000000).toDouble
    def sghl(x: BigInt): Double = (if (x < 0) -1.0 else 1.0) * hilo(x.abs)
    val out = operators.TextQueries.x174(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == srcs.length * (srcs.length - 1) / 2, "all source pairs")
    for (i <- srcs.indices; j <- i + 1 until srcs.length) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (ta, tb) = (BigInt(tots(sa)), BigInt(tots(sb)))
      var (la, lb) = (BigInt(0), BigInt(0))
      top.foreach { tk =>
        val (ca, cb) = (BigInt(cnt(sa, tk)), BigInt(cnt(sb, tk)))
        val den = ca * tb + cb * ta
        if (ca > 0) la += ca * BigInt(math.floor(
          math.log((BigInt(2) * ca * tb).toDouble / den.toDouble) * 1e9 + 0.5).toLong)
        if (cb > 0) lb += cb * BigInt(math.floor(
          math.log((BigInt(2) * cb * ta).toDouble / den.toDouble) * 1e9 + 0.5).toLong)
      }
      val js = (sghl(la) / (tots(sa).toDouble * 1e9) + sghl(lb) / (tots(sb).toDouble * 1e9)) / 2.0
      val r = out((sa, sb))
      assert(r.getLong(2) == tots(sa) && r.getLong(3) == tots(sb), s"($sa,$sb) totals")
      assert(r.getDouble(4) == fr6(js), s"($sa,$sb) js ${r.getDouble(4)} vs ${fr6(js)}")
      assert(r.getDouble(4) >= -1e-6 && r.getDouble(4) <= 0.6931472 + 1e-6, "JS in [0, ln2]")
    }
  }

  test("x172 readability matches a naive per-source count replay") {
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).view.mapValues { g =>
      val ch = g.map(d => d._2.replaceAll("[^A-Za-z0-9]", "").length.toLong).sum
      val w = g.map(d => d._2.split(" ", -1).length.toLong).sum
      val sn = g.map(d => "[.!?]+".r.findAllIn(d._2).length.toLong).sum
      (g.length.toLong, ch, w, sn)
    }.toMap
    val out = operators.TextQueries.x172(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == expect.keySet)
    expect.foreach { case (src, (nd, ch, w, sn)) =>
      val r = out(src)
      assert(r.getLong(1) == nd && r.getLong(2) == ch && r.getLong(3) == w &&
        r.getLong(4) == sn, s"$src counts: $r vs ($nd, $ch, $w, $sn)")
      if (sn == 0L) assert(r.isNullAt(5) && r.isNullAt(6), s"$src zero-sentence NULLs")
      else {
        val ari = 4.71 * ch.toDouble / w.toDouble + 0.5 * w.toDouble / sn.toDouble - 21.43
        assert(r.getDouble(5) == fr6(ari), s"$src ari")
        assert(r.getDouble(6) == fr6(w.toDouble / sn.toDouble), s"$src wps")
      }
    }
  }
}
