package graft

import org.apache.spark.sql.functions._
import graft.Tables.{dsum, fround}

/** Tier-3 property tests (SURVEY §5.2): algebraic invariants of the
  * canonical-rendering helpers and the custom expressions, over seeded
  * random instances (scalatest+scalacheck bridge isn't in the offline
  * cache, so generation is a seeded loop — same coverage, deterministic). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val trials = 20

  test("dsum equals the exact rational sum for any scale-2 inputs (order-independent)") {
    (1 to trials).foreach { _ =>
      val xs = List.fill(50)(rnd.between(-100000L, 100000L))
      val doubles = xs.map(_ / 100.0)
      val got = doubles.toDF("v").repartition(7).agg(dsum($"v").as("s")).head().getDouble(0)
      val expected = xs.sum / 100.0
      assert(got == expected, s"dsum($xs)")
    }
  }

  test("fround is floor-form half-up at scale 2") {
    (1 to trials * 5).foreach { _ =>
      val x = rnd.between(-99999L, 99999L) / 1000.0
      val got = Seq(x).toDF("v").select(fround($"v", 2).as("r")).head().getDouble(0)
      // independent expectation with the same IEEE ops on the same double
      val expected = math.floor(x * 100.0 + 0.5) / 100.0
      assert(got == expected, s"fround($x)")
    }
  }

  test("canonToks is idempotent: the canonical form is a fixed point") {
    // seeded noisy strings over the classes canonicalization handles:
    // case, punctuation, repeated whitespace, stopwords, digits
    val atoms = Seq("The", "QUICK", "fox,", "jump42", "  ", "a", "of", "--",
      "word", "WORD!", "9", "mid-dash", "tail.")
    (1 to trials * 3).foreach { _ =>
      val s = List.fill(rnd.between(0, 12))(atoms(rnd.nextInt(atoms.length))).mkString(" ")
      val once = Seq(s).toDF("text")
        .select(array_join(operators.TextQueries.canonToks($"text"), " ").as("c"))
        .head().getString(0)
      val twice = Seq(once).toDF("text")
        .select(array_join(operators.TextQueries.canonToks($"text"), " ").as("c"))
        .head().getString(0)
      assert(twice == once, s"canon not a fixed point for '$s': '$once' -> '$twice'")
      assert(once == once.trim && !once.contains("  "), s"canon not normalized: '$once'")
    }
  }

  test("FloatDot equals the HOF zip_with/aggregate dot for any float vectors") {
    (1 to trials).foreach { _ =>
      val a = List.fill(16)(rnd.between(-1000, 1000) / 100.0f)
      val b = List.fill(16)(rnd.between(-1000, 1000) / 100.0f)
      val df = Seq((a, b)).toDF("a", "b")
      val custom = df.select(graft.functions.VectorExprs.floatDot($"a", $"b")).head().getDouble(0)
      val hof = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
      assert(custom == hof, s"dot($a, $b)")
    }
  }

  test("DoubleDot equals the HOF zip_with/aggregate dot for any double vectors") {
    (1 to trials).foreach { _ =>
      val a = List.fill(12)(rnd.between(-1000, 1000) / 100.0)
      val b = List.fill(12)(rnd.between(-1000, 1000) / 100.0)
      val df = Seq((a, b)).toDF("a", "b")
      val custom = df.select(graft.functions.VectorExprs.doubleDot($"a", $"b")).head().getDouble(0)
      val hof = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
      assert(custom == hof, s"dot($a, $b)")
    }
  }

  test("SimHash64 of a permuted token-hash array is unchanged (bag semantics)") {
    (1 to trials).foreach { _ =>
      val hs = List.fill(rnd.between(1, 40))(rnd.nextLong())
      val df = Seq((hs, new scala.util.Random(7).shuffle(hs))).toDF("a", "b")
      val r = df.select(
        graft.functions.VectorExprs.simHash64($"a"),
        graft.functions.VectorExprs.simHash64($"b")).head()
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("MinHash signature is monotone under shingle-set union (min can only drop)") {
    (1 to trials).foreach { _ =>
      val s1 = List.fill(rnd.between(1, 20))(rnd.alphanumeric.take(6).mkString)
      val s2 = List.fill(rnd.between(1, 20))(rnd.alphanumeric.take(6).mkString)
      val df = Seq((s1, s1 ++ s2)).toDF("a", "ab")
      val r = df.select(
        graft.functions.VectorExprs.minHashSigs($"a", 8),
        graft.functions.VectorExprs.minHashSigs($"ab", 8)).head()
      val sa = r.getSeq[Long](0)
      val sab = r.getSeq[Long](1)
      assert(sa.zip(sab).forall { case (x, y) => y <= x })
    }
  }

  test("identical texts share every MinHash band (candidate-generation soundness)") {
    val words = Array("the", "fast", "key", "sort", "merge")
    (1 to trials).foreach { _ =>
      val text = List.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
        .select($"doc_id", split($"text", " ").as("tk"))
        .select($"doc_id",
          graft.functions.VectorExprs.minHashSigs(
            array_distinct(graft.operators.DedupQueries.shingles3($"tk")), 8).as("sigs"))
      val rows = df.orderBy($"doc_id").collect()
      assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1))
    }
  }

  test("H60/H60Array are bit-identical to the conv(substring(md5)) formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // adversarial-ish strings: empty, unicode, long, hex-looking, controls
    val samples = Seq("", "a", "hello world", "ÜñíçødÉ ☃ 中文", "0xDEADBEEF",
      "line\nbreak\ttab", "x" * 5000) ++ (1 to 200).map(i => s"tok$i doc${i * 7}")
    val df = samples.toDF("s")
      .withColumn("fast", graft.functions.VectorExprs.h60(col("s")))
      .withColumn("ref", conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10).cast("long"))
      .withColumn("fastArr", element_at(
        graft.functions.VectorExprs.h60Array(array(col("s"))), 1))
    val bad = df.filter(col("fast") =!= col("ref") || col("fastArr") =!= col("ref")).count()
    assert(bad == 0, "codegen h60 must equal the documented md5-hex-parse formulation")
  }
}
