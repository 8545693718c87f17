package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom codegen Catalyst expressions for the vector/dedup hot paths
  * (SURVEY §4: "fallback if HOF perf is inadequate at bench scale" — it is:
  * higher-order `zip_with`/`aggregate` lambdas are interpreted per element
  * and allocate an intermediate array per row; measured 43 s for the 125k-
  * pair cosine sweep vs <2 s with these).
  *
  * Numeric contract: FloatDot accumulates left-to-right in double, the exact
  * op sequence of the HOF formulation AND of DuckDB's
  * `list_aggregate(list_transform(...), 'sum')` oracle twin — swapping these
  * in changes nothing about result hashes.
  */
/** Codegen'd dot product of two array<double> columns — the double-typed
  * sibling of [[FloatDot]] (identical left-to-right accumulation, so it
  * matches the twins' `list_aggregate(list_transform(list_zip ...), 'sum')`
  * order convention). Exists because the interpreted HOF form
  * (`aggregate(zip_with(...))`) costs ~an expression-tree walk per element
  * per row — measured 3.8→1.9 s on x125's pair sweep at sf1. */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[GraftExprBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[GraftExprBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All prefix dot products of two float arrays in ONE pass (codegen'd):
  * returns array<double> with, for each boundary m in `bounds` (ascending),
  * the left-to-right double accumulation over the first min(m, n) element
  * pairs. Bit-identical to `FloatDot(slice(a,1,m), slice(b,1,m))` per bound
  * — left-to-right accumulation means the m-prefix dot IS the running
  * accumulator after m terms, so one 64-element pass replaces one pass per
  * tier (8+16+32+64 = 120 multiply-adds → 64) AND the per-tier slice()
  * array copies (2 per tier per row). Built for x181's Matryoshka tier
  * sweep; any nested-prefix kernel can ride it. */
case class FloatPrefixDots(left: Expression, right: Expression, bounds: Seq[Int])
    extends BinaryExpression with ExpectsInputTypes {
  require(bounds.nonEmpty && bounds == bounds.sorted && bounds.head > 0,
    "bounds must be ascending positive prefix lengths")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_prefix_dots"

  private val boundsArr: Array[Int] = bounds.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](boundsArr.length)
    var sum = 0.0
    var bi = 0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
      while (bi < boundsArr.length && boundsArr(bi) == i) { out(bi) = sum; bi += 1 }
    }
    while (bi < boundsArr.length) { out(bi) = sum; bi += 1 } // short arrays
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bounds", boundsArr, "int[]")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bi = ctx.freshName("bi")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double[] $out = new double[$bRef.length];
         |double $acc = 0.0;
         |int $bi = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  while ($bi < $bRef.length && $bRef[$bi] == $i + 1) { $out[$bi] = $acc; $bi++; }
         |}
         |while ($bi < $bRef.length) { $out[$bi] = $acc; $bi++; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[FloatDot]]'s mixed-type sibling: array<float> · array<double> — the
  * shape every trained-quantizer kernel needs (raw float vectors against
  * k-means-trained centroid/codeword coordinates, which are fix-point
  * doubles, see graft.operators.Quantizers). Same left-to-right double
  * accumulation as FloatDot and as the DuckDB
  * `list_aggregate(list_transform(list_zip(...)))` twin (where the
  * CAST(double AS DOUBLE) on the trained side is the identity). */
case class FloatDoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  // The element accessors are type-ASYMMETRIC (getFloat left, getDouble
  // right); declaring inputTypes makes a swapped call fail analysis instead
  // of silently misreading element bytes (ADVICE r8).
  override def inputTypes: Seq[GraftExprBridge.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $x.getFloat($i) * $y.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass readability counters over a string column →
  * struct<ch, w, sn> (all long):
  *   ch = count of [A-Za-z0-9] chars   (= length(regexp_replace(text, "[^A-Za-z0-9]", "")))
  *   w  = count(' ') + 1               (= size(split(text, " ")), Spark split keeps empties)
  *   sn = maximal runs of [.!?]        (= size(regexp_extract_all(text, "[.!?]+", 0)))
  * Replaces THREE java.util.regex passes (one of which materialized a
  * stripped copy of the document) with one loop over the UTF-8 bytes —
  * exact for these classes because every byte of a multi-byte UTF-8
  * sequence is ≥ 0x80 and can never match the ASCII letter/digit/space/
  * punctuation tests. CodegenFallback like MinHashSigs: one virtual call
  * per ROW, the loop itself is compiled JVM code. */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("ch", LongType, nullable = false),
    StructField("w", LongType, nullable = false),
    StructField("sn", LongType, nullable = false)))
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = s.numBytes
    var ch = 0L
    var sp = 0L
    var sn = 0L
    var prevPunct = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
        (b >= '0' && b <= '9')) ch += 1
      else if (b == ' ') sp += 1
      val p = b == '.' || b == '!' || b == '?'
      if (p && !prevPunct) sn += 1
      prevPunct = p
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ch, sp + 1, sn))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a pre-hashed token array (array<long> -> long): one
  * pass over the hashes, 64 bit-votes each, sign -> bit. Replaces 64
  * interpreted `aggregate` HOF passes. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(LongType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass counts of a fixed set of 2-char ASCII patterns over a string
  * column (x32/x169 lang-ID hot loop): returns array<long>, counts(i) =
  * non-overlapping left-to-right occurrences of patterns(i) — exactly
  * `(length(s) − length(regexp_replace(s, p, ''))) / 2`, the form the
  * DuckDB twins replay, but 25 regexp_replace string-building passes per
  * row collapse to ONE byte scan with a 128×128 direct-index lookup
  * (VERDICT r12: the one genuinely compressible hot loop, ~5×).
  *
  * Byte-level matching of ASCII-only patterns is exact on UTF-8: every
  * non-ASCII code unit has the high bit set, so a 2-ASCII-byte window can
  * never straddle or false-match a multi-byte character. Non-overlap is
  * per-pattern greedy (match at i consumes i..i+1 FOR THAT PATTERN ONLY —
  * patterns are distinct, at most one matches a window, but the skip
  * state is still tracked per pattern for regex parity). */
case class BigramCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty && patterns.forall(p =>
    p.length == 2 && p.forall(c => c < 128)),
    "BigramCounts: patterns must be 2-char ASCII")
  // duplicates would silently overwrite the lookup slot and leave the
  // earlier index counting 0 forever — fail construction instead
  require(patterns.distinct.size == patterns.size,
    "BigramCounts: patterns must be distinct")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bigram_counts"

  // (b1<<7 | b2) -> 1-based pattern index; 0 = no pattern
  @transient private lazy val table: Array[Int] = {
    val t = new Array[Int](128 * 128)
    patterns.zipWithIndex.foreach { case (p, i) =>
      t((p.charAt(0) << 7) | p.charAt(1)) = i + 1
    }
    t
  }

  private def count(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    val nextOk = new Array[Int](patterns.length)
    val tab = table
    var i = 0
    val n = bytes.length - 1
    while (i < n) {
      val b1 = bytes(i); val b2 = bytes(i + 1)
      if (b1 >= 0 && b2 >= 0) {
        val idx = tab((b1 << 7) | b2)
        if (idx > 0 && i >= nextOk(idx - 1)) {
          counts(idx - 1) += 1L
          nextOk(idx - 1) = i + 2
        }
      }
      i += 1
    }
    counts
  }

  override def nullSafeEval(a: Any): Any =
    ArrayData.toArrayData(count(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val self = ctx.addReferenceObj("bigramCounts", this, classOf[BigramCounts].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $self.genCount($x);
       """.stripMargin
    })

  /** codegen entry: the scan itself is a tight JVM loop already — the win
    * is eliminating the 25 regex passes, not inlining the scan into janino. */
  def genCount(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    ArrayData.toArrayData(count(s.getBytes))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The MinHash permutation family shared by the Spark expression and the
  * GENERATED DuckDB oracle twin (the x32/x34 trick: both sides derive from
  * the same constants, so they cannot drift).
  *
  * Universal hashing over the Mersenne prime P = 2^31-1:
  *   base(x) = first 15 hex digits of md5(x)       (Tables.h60 — engine-exact)
  *   h_j(x)  = (A(j) * (base(x) mod P) + B(j)) mod P
  * All operands stay below 2^62, so the arithmetic is exact signed-64 in
  * Spark, DuckDB (which errors on overflow rather than wrapping), and the
  * JVM eval below — the whole family is engine-portable by construction. */
object MinHash {
  val P: Long = 2147483647L // 2^31 - 1
  private def lcg(seed: Long, n: Int): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % (P - 1)) + 1 // in [1, P-1]
    }
  }
  /** Affine coefficients, fixed for the library's lifetime (signatures are
    * persisted artifacts in a real pipeline — changing these rehashes). */
  val A: Array[Long] = lcg(0x5DEECE66DL, 64)
  val B: Array[Long] = lcg(0x9E3779B9L, 64)

  private val mdTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** 60-bit base hash: big-endian first 8 md5 bytes >>> 4 — bit-identical to
    * parsing the first 15 hex digits (Tables.h60 / its DuckDB twin). */
  def base60(bytes: Array[Byte]): Long = {
    val md = mdTL.get(); md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }
  def perm(j: Int, base: Long): Long = (A(j) * (base % P) + B(j)) % P
  /** DuckDB expression computing perm(j) of the BIGINT SQL expression `h`. */
  def permSql(j: Int, h: String): String = s"(${A(j)} * ($h % $P) + ${B(j)}) % $P"
}

/** 60-bit engine-parity content hash (string -> long), the codegen form of
  * `Tables.h60`: md5 of the UTF-8 bytes, top 60 bits ([[MinHash.base60]] —
  * bit-identical to parsing the first 15 hex digits, which is what the
  * DuckDB twin does). The Column-expression formulation
  * (conv(substring(md5(...)))) materializes a 32-char hex string and
  * base-16-parses it per call — this goes digest-bytes -> long directly.
  * Same cross-engine value, so every oracle stays hash-matched. */
case class H60(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h60"

  override def nullSafeEval(a: Any): Any =
    MinHash.base60(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.MinHash.base60($x.getBytes());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Element-wise [[H60]] over array<string> -> array<long>: the hot
  * `transform(arr, x -> h60(x))` shape (token hashes, shingle grams) without
  * the interpreted-HOF per-element expression walk — one JVM loop per row,
  * one md5 per element, no hex-string materialization. CodegenFallback like
  * MinHashSigs: one virtual call per ROW. */
case class H60Array(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(StringType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h60_array"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = MinHash.base60(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All-in-one MinHash signature: array<string> shingles -> array<long> of
  * `numHashes` minhash values from the [[MinHash]] affine family (md5-based,
  * so the DuckDB oracle reproduces it exactly). One md5 per shingle + one
  * pass over the shingles; replaces numHashes separate
  * array_min(transform(...)) trees whose whole-stage codegen alone took
  * ~10 s to janino-compile. CodegenFallback is deliberate: one virtual call
  * per ROW (not per hash) keeps the generated source tiny while the loop
  * runs compiled JVM code. */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(numHashes <= MinHash.A.length, s"at most ${MinHash.A.length} hashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(StringType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sigs = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = MinHash.base60(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < numHashes) {
        val v = MinHash.perm(j, h)
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Argmax-dot nearest-centroid assignment as ONE expression: the whole
  * nlist-wide sweep — dot the float vector against every trained double
  * centroid, keep the lexicographic max of (score, cid) — in a single tight
  * generated loop over a REFERENCED centroid matrix.
  *
  * Replaces the `array_max(array(struct(dot, cid) × nlist))` formulation,
  * which scales catastrophically in nlist: at nlist=2048 (the sf10
  * `nlistFor` value) that plan carries 2048 expression subtrees — the
  * generated class splits into 500+ methods (no JIT inlining), every task
  * binary is ~6 MB, and every ROW allocates a 2048-element struct array
  * before array_max scans it. Measured on the round-15 sf10 sweep: the x26
  * kNN chain dropped 83 s → 23 s warm from this swap alone; at bench SF
  * (nlist=16) the two forms are within noise.
  *
  * Semantics are IDENTICAL to the old form, bit for bit:
  *  - each dot is [[FloatDoubleDot]]'s exact left-to-right
  *    `sum += (double) a[i] * c[i]` accumulation (the twins' list_zip CAST
  *    convention);
  *  - the argmax is Spark's struct ordering (SQLOrderingUtil.compareDoubles:
  *    `==` short-circuit first, so -0.0 ties +0.0; NaN greatest), ties
  *    broken to the GREATER cid — exactly what array_max computed.
  *  - a NULL embedding row yields NULL (nullIntolerant), unlike the old
  *    array_max form, whose null-scored structs fell through to the max
  *    cid. Intentional divergence: an unscoreable vector must not be
  *    silently assigned; training/serving inputs are non-null by schema
  *    (the generator writes REQUIRED lists), so twins are unaffected.
  * The centroid matrix and cid vector ride the expression as constructor
  * state (they are planner-side trained-model constants, exactly like the
  * literal arrays they replace) and reach generated code via
  * `ctx.addReferenceObj` — one shared reference per task instead of nlist
  * embedded literals. */
case class CentroidArgmax(child: Expression,
                          cids: Array[Long],
                          cents: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty && cids.length == cents.length,
    s"centroid_argmax: ${cids.length} cids vs ${cents.length} centroids")
  override def dataType: DataType = StructType(Seq(
    StructField("sc", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_argmax"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = x.numElements()
    var best = Double.NegativeInfinity
    var bestCid = Long.MinValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(dim, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * c(i); i += 1 }
      // SQLOrderingUtil.compareDoubles mirror: == first (-0.0 ties +0.0)
      val cmp = if (s == best) 0 else java.lang.Double.compare(s, best)
      if (cmp > 0 || (cmp == 0 && cids(j) > bestCid)) { best = s; bestCid = cids(j) }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestCid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("centMatrix", cents, "double[][]")
      val ids = ctx.addReferenceObj("centCids", cids, "long[]")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val dim = ctx.freshName("dim")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cmp = ctx.freshName("cmp")
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestCid = Long.MIN_VALUE;
         |int $dim = $x.numElements();
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $c = $m[$j];
         |  int $n = java.lang.Math.min($dim, $c.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $x.getFloat($i) * $c[$i];
         |  }
         |  int $cmp = ($s == $best) ? 0 : java.lang.Double.compare($s, $best);
         |  if ($cmp > 0 || ($cmp == 0 && $ids[$j] > $bestCid)) {
         |    $best = $s;
         |    $bestCid = $ids[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Double.valueOf($best), java.lang.Long.valueOf($bestCid) });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // Content-based equality (case-class default hashes the arrays by
  // identity, defeating CSE/plan-cache matching when two instances are
  // built from separate-but-identical trained models). Compares the model
  // by value; the expression is otherwise state-free.
  override def equals(that: Any): Boolean = that match {
    case o: CentroidArgmax =>
      child == o.child && java.util.Arrays.equals(cids, o.cids) &&
        cents.length == o.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), o.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(cids)) +
      cents.map(java.util.Arrays.hashCode).foldLeft(0)(31 * _ + _)
}

/** Whole-sweep top-2 centroid assignment: [[CentroidArgmax]] extended with
  * the runner-up — struct(sc, cid, sc2, cid2) under the same (sc, cid)
  * lexicographic struct order (max sc, tie → max cid; == first so -0.0
  * ties +0.0, the SQLOrderingUtil convention). Replaces x161's
  * `array_max(arr)` + `array_max(filter(arr, ≠best))` over an
  * nlist-struct array literal tree, which at sf10's nlist=2048 exceeds
  * janino's 64 KB method budget and drops the scan to interpreted
  * evaluation (the PqArgmin finding's sibling, r18). cids are unique, so
  * "filter out the element equal to best" ≡ "runner-up in the total
  * order" — bit-identical to the tree it replaces for nlist ≥ 2. */
case class CentroidTop2(child: Expression,
                        cids: Array[Long],
                        cents: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.length >= 2 && cids.length == cents.length,
    s"centroid_top2: needs ≥2 centroids, got ${cents.length}")
  override def dataType: DataType = StructType(Seq(
    StructField("sc", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("sc2", DoubleType, nullable = false),
    StructField("cid2", LongType, nullable = false)))
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_top2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = x.numElements()
    var b1 = Double.NegativeInfinity; var c1 = Long.MinValue
    var b2 = Double.NegativeInfinity; var c2 = Long.MinValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(dim, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * c(i); i += 1 }
      val cmp1 = if (s == b1) 0 else java.lang.Double.compare(s, b1)
      if (cmp1 > 0 || (cmp1 == 0 && cids(j) > c1)) {
        b2 = b1; c2 = c1; b1 = s; c1 = cids(j)
      } else {
        val cmp2 = if (s == b2) 0 else java.lang.Double.compare(s, b2)
        if (cmp2 > 0 || (cmp2 == 0 && cids(j) > c2)) { b2 = s; c2 = cids(j) }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](b1, c1, b2, c2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("centMatrix", cents, "double[][]")
      val ids = ctx.addReferenceObj("centCids", cids, "long[]")
      val b1 = ctx.freshName("b1"); val c1 = ctx.freshName("c1")
      val b2 = ctx.freshName("b2"); val c2 = ctx.freshName("c2")
      val dim = ctx.freshName("dim"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val cmp = ctx.freshName("cmp"); val cmp2 = ctx.freshName("cmp2")
      s"""
         |double $b1 = Double.NEGATIVE_INFINITY; long $c1 = Long.MIN_VALUE;
         |double $b2 = Double.NEGATIVE_INFINITY; long $c2 = Long.MIN_VALUE;
         |int $dim = $x.numElements();
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $c = $m[$j];
         |  int $n = java.lang.Math.min($dim, $c.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $x.getFloat($i) * $c[$i];
         |  }
         |  int $cmp = ($s == $b1) ? 0 : java.lang.Double.compare($s, $b1);
         |  if ($cmp > 0 || ($cmp == 0 && $ids[$j] > $c1)) {
         |    $b2 = $b1; $c2 = $c1; $b1 = $s; $c1 = $ids[$j];
         |  } else {
         |    int $cmp2 = ($s == $b2) ? 0 : java.lang.Double.compare($s, $b2);
         |    if ($cmp2 > 0 || ($cmp2 == 0 && $ids[$j] > $c2)) { $b2 = $s; $c2 = $ids[$j]; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Double.valueOf($b1), java.lang.Long.valueOf($c1),
         |                 java.lang.Double.valueOf($b2), java.lang.Long.valueOf($c2) });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def equals(that: Any): Boolean = that match {
    case o: CentroidTop2 =>
      child == o.child && java.util.Arrays.equals(cids, o.cids) &&
        cents.length == o.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), o.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode + java.util.Arrays.hashCode(cids)) +
      cents.map(java.util.Arrays.hashCode).foldLeft(0)(31 * _ + _)
}

/** Dense matrix–vector product over a float input: out[k] =
  * (float) ⟨x, mat[k]⟩ with each dot accumulated left-to-right in double
  * (the FloatDoubleDot order) — bit-identical to
  * `array(mat.map(row => floatDoubleDot(x, typedLit(row)).cast("float")))`,
  * which it replaces on the OPQ rotation path: the 64-element array
  * constructor over 64 separate dot subtrees evaluated at
  * expression-tree-walk speed (~0.3 ms/row measured at sf0.1 AND sf10 —
  * the x94 probe), whereas this is one codegen'd loop nest over a single
  * referenced matrix. */
case class MatVecFloat(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(mat.nonEmpty, "mat_vec: empty matrix")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mat_vec_float"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val out = new Array[Float](mat.length)
    var k = 0
    while (k < mat.length) {
      val row = mat(k)
      val n = math.min(dim, row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * row(i); i += 1 }
      out(k) = s.toFloat
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("matVecMat", mat, "double[][]")
      val out = ctx.freshName("out")
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |float[] $out = new float[$m.length];
         |int $dim = $x.numElements();
         |for (int $k = 0; $k < $m.length; $k++) {
         |  double[] $row = $m[$k];
         |  int $n = java.lang.Math.min($dim, $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $x.getFloat($i) * $row[$i];
         |  }
         |  $out[$k] = (float) $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def equals(that: Any): Boolean = that match {
    case o: MatVecFloat =>
      child == o.child && mat.length == o.mat.length &&
        mat.indices.forall(i => java.util.Arrays.equals(mat(i), o.mat(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + mat.map(java.util.Arrays.hashCode).foldLeft(0)(31 * _ + _)
}

/** Whole-codebook PQ argmin: per subspace i, the nearest codeword of
  * `cents(i)` to the row's i-th embedding subvector, as
  * array<struct<code int, d double>> (index = subspace). One codegen'd
  * loop nest over a referenced [sub][code][dim] matrix — replaces the
  * pqM·pqK struct/array_min expression TREE whose generated
  * doConsume blew janino's 64 KB method limit at sf10 (the whole
  * projection then ran INTERPRETED — the >2,700 s index-build finding,
  * BASELINE.md §composed-pipeline).
  *
  * Numeric contract (bit-identical to the tree it replaces, and to the
  * DuckDB pqTrainCtes twin): per (sub, code),
  * d = (⟨s,s⟩ − 2.0·⟨s,c⟩) + ‖c‖², with ⟨s,s⟩ and ⟨s,c⟩ each accumulated
  * left-to-right in double over the float subvector (FloatDot /
  * FloatDoubleDot order), ‖c‖² passed in precomputed (the trainer's
  * foldLeft literal). Argmin ties → LOWEST code (array_min struct order /
  * ROW_NUMBER d ASC, code ASC), realized by strict `<` over ascending j
  * with the == -0.0/+0.0 tie convention of [[CentroidArgmax]]. */
case class PqArgmin(child: Expression,
                    cents: Array[Array[Array[Double]]],
                    norms: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty && cents.length == norms.length &&
    cents.indices.forall(i => cents(i).length == norms(i).length),
    "pq_argmin: codebook/norm shape mismatch")
  private val subDim = cents(0)(0).length
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("code", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false))), containsNull = false)
  override def inputTypes: Seq[GraftExprBridge.AbstractType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_argmin"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val total = x.numElements()
    val out = new Array[Any](cents.length)
    var sub = 0
    while (sub < cents.length) {
      val base = sub * subDim
      val n = math.min(subDim, math.max(0, total - base))
      // ⟨s,s⟩ once per subspace (identical for every code)
      var ss = 0.0
      var k = 0
      while (k < n) {
        val f = x.getFloat(base + k).toDouble; ss += f * f; k += 1
      }
      val cb = cents(sub); val nm = norms(sub)
      var best = Double.PositiveInfinity
      // bestCode seeds at 0, not -1: if every codeword distance is NaN
      // (NaN embedding values), the replaced array_min tree degraded to
      // code 0 — a -1 would break downstream 1-based element_at/LUT
      // indexing (r19, ADVICE)
      var bestCode = 0
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var sc = 0.0
        var i = 0
        while (i < n) { sc += x.getFloat(base + i).toDouble * c(i); i += 1 }
        val d = (ss - 2.0 * sc) + nm(j)
        val cmp = if (d == best) 0 else java.lang.Double.compare(d, best)
        if (cmp < 0) { best = d; bestCode = j }
        j += 1
      }
      out(sub) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](bestCode, best))
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("pqCents", cents, "double[][][]")
      val nms = ctx.addReferenceObj("pqNorms", norms, "double[][]")
      val out = ctx.freshName("out")
      val total = ctx.freshName("total")
      val sub = ctx.freshName("sub")
      val bse = ctx.freshName("bse")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val f = ctx.freshName("f")
      val k = ctx.freshName("k")
      val cb = ctx.freshName("cb")
      val nm = ctx.freshName("nm")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val sc = ctx.freshName("sc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val cmp = ctx.freshName("cmp")
      s"""
         |Object[] $out = new Object[$m.length];
         |int $total = $x.numElements();
         |for (int $sub = 0; $sub < $m.length; $sub++) {
         |  int $bse = $sub * $subDim;
         |  int $n = java.lang.Math.min($subDim, java.lang.Math.max(0, $total - $bse));
         |  double $ss = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    double $f = (double) $x.getFloat($bse + $k); $ss += $f * $f;
         |  }
         |  double[][] $cb = $m[$sub];
         |  double[] $nm = $nms[$sub];
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestCode = 0; // all-NaN edge degrades to code 0, like the replaced tree

         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    double[] $c = $cb[$j];
         |    double $sc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sc += (double) $x.getFloat($bse + $i) * $c[$i];
         |    }
         |    double $d = ($ss - 2.0 * $sc) + $nm[$j];
         |    int $cmp = ($d == $best) ? 0 : java.lang.Double.compare($d, $best);
         |    if ($cmp < 0) { $best = $d; $bestCode = $j; }
         |  }
         |  $out[$sub] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { java.lang.Integer.valueOf($bestCode), java.lang.Double.valueOf($best) });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // Content-based equality, the CentroidArgmax convention: the default
  // case-class identity-hash on nested arrays defeats CSE/plan-cache
  // matching across separately-built-but-identical trained models.
  override def equals(that: Any): Boolean = that match {
    case o: PqArgmin =>
      child == o.child && cents.length == o.cents.length &&
        cents.indices.forall(s => cents(s).length == o.cents(s).length &&
          cents(s).indices.forall(j => java.util.Arrays.equals(cents(s)(j), o.cents(s)(j)))) &&
        norms.length == o.norms.length &&
        norms.indices.forall(s => java.util.Arrays.equals(norms(s), o.norms(s)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode +
      cents.map(_.map(java.util.Arrays.hashCode).foldLeft(0)(31 * _ + _)).foldLeft(0)(31 * _ + _) +
      norms.map(java.util.Arrays.hashCode).foldLeft(0)(31 * _ + _)
}

object VectorExprs {
  /** Double-precision dot product of two float-array columns (codegen'd). */
  def floatDot(a: Column, b: Column): Column = GraftExprBridge.toColumn(FloatDot(GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b)))
  /** All prefix dots of two float-array columns at ascending boundaries
    * (one pass, codegen'd) — see [[FloatPrefixDots]]. */
  def floatPrefixDots(a: Column, b: Column, bounds: Seq[Int]): Column =
    GraftExprBridge.toColumn(FloatPrefixDots(
      GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b), bounds))
  /** Dot of two double-array columns (codegen'd) — see [[DoubleDot]]. */
  def doubleDot(a: Column, b: Column): Column =
    GraftExprBridge.toColumn(DoubleDot(GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b)))
  /** Dot of a float-array column with a double-array column (codegen'd). */
  def floatDoubleDot(a: Column, b: Column): Column =
    GraftExprBridge.toColumn(FloatDoubleDot(GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b)))
  /** 64-bit SimHash of an array<long> token-hash column (codegen'd). */
  def simHash64(th: Column): Column = GraftExprBridge.toColumn(SimHash64(GraftExprBridge.toExpression(th)))
  /** numHashes MinHash signature values of an array<string> shingle column. */
  def minHashSigs(sh: Column, numHashes: Int): Column =
    GraftExprBridge.toColumn(MinHashSigs(GraftExprBridge.toExpression(sh), numHashes))
  /** 60-bit engine-parity hash of a string column (codegen'd md5-top-bits). */
  def h60(c: Column): Column = GraftExprBridge.toColumn(H60(GraftExprBridge.toExpression(c)))
  /** Element-wise h60 over an array<string> column. */
  def h60Array(c: Column): Column = GraftExprBridge.toColumn(H60Array(GraftExprBridge.toExpression(c)))
  /** One-pass readability counters (alnum chars, words, sentence runs). */
  def textStats(c: Column): Column = GraftExprBridge.toColumn(TextStats(GraftExprBridge.toExpression(c)))
  /** One-pass non-overlapping counts of 2-char ASCII patterns (array<long>). */
  def bigramCounts(c: Column, patterns: Seq[String]): Column =
    GraftExprBridge.toColumn(BigramCounts(GraftExprBridge.toExpression(c), patterns))
  /** Whole-sweep nearest-centroid assignment → struct(sc, cid); see
    * [[CentroidArgmax]]. `cents` = (cid, centroid) in any order. */
  def centroidArgmax(emb: Column, cents: Array[(Long, Array[Double])]): Column =
    GraftExprBridge.toColumn(CentroidArgmax(GraftExprBridge.toExpression(emb),
      cents.map(_._1), cents.map(_._2)))
  /** Dense mat×vec → array<float> of per-row dots; see [[MatVecFloat]]. */
  def matVecFloat(x: Column, mat: Array[Array[Double]]): Column =
    GraftExprBridge.toColumn(MatVecFloat(GraftExprBridge.toExpression(x), mat))
  /** Best + runner-up assignment → struct(sc, cid, sc2, cid2); see
    * [[CentroidTop2]]. `cents` = (cid, centroid) in any order. */
  def centroidTop2(emb: Column, cents: Array[(Long, Array[Double])]): Column =
    GraftExprBridge.toColumn(CentroidTop2(GraftExprBridge.toExpression(emb),
      cents.map(_._1), cents.map(_._2)))
  /** Whole-codebook PQ argmin → array<struct<code,d>>; see [[PqArgmin]].
    * `cbs` = [subspace][code] (codeword, precomputed ‖c‖²). */
  def pqArgmin(emb: Column, cbs: Array[Array[(Array[Double], Double)]]): Column =
    GraftExprBridge.toColumn(PqArgmin(GraftExprBridge.toExpression(emb),
      cbs.map(_.map(_._1)), cbs.map(_.map(_._2))))
}
