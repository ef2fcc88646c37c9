package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the vector/set hot paths. The
  * higher-order-function formulations (`aggregate(zip_with(...))`) are
  * interpreted per-row closures; these compile into whole-stage codegen and
  * profile ~5-10x faster on the embedding/dedup pair joins, while keeping
  * EXACTLY the left-fold accumulation order of the HOF versions (and the
  * DuckDB oracle's `list_reduce`), so hash-matched results are unchanged.
  */
object NativeExpressions {
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def jaccardSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def minHashSignature(a: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(a), k))

  def simHash64(a: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(a)))

  def jaccardSortedLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSortedLong(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def earlierArrayMatch(a: Column, b: Column, n: Column): Column =
    GraftSqlBridge.column(EarlierArrayMatch(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(n)))

  def charEntropy(c: Column): Column =
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(c)))

  def bpeEncode(c: Column): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(c)))

  def nfcNormalize(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))

  def wordShingles(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(c), n))

  def minHashAffine(a: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashAffine(GraftSqlBridge.expression(a), k))

  def md5Base60Array(a: Column, modP: Boolean): Column =
    GraftSqlBridge.column(Md5Base60Array(GraftSqlBridge.expression(a), modP))

  def simHashBits(a: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHashBits(GraftSqlBridge.expression(a), bits))

  def portableLshBuckets(a: Column, tables: Int, nBits: Int, dim: Int): Column =
    GraftSqlBridge.column(PortableLshBuckets(
      GraftSqlBridge.expression(a), tables, nBits, dim))

  def pqCodes(a: Column, cen: Array[Array[Array[Double]]],
      cc: Array[Array[Double]]): Column =
    GraftSqlBridge.column(PqCodes(GraftSqlBridge.expression(a), cen, cc))

  def pqDtab(a: Column, cen: Array[Array[Array[Double]]],
      cc: Array[Array[Double]]): Column =
    GraftSqlBridge.column(PqDtab(GraftSqlBridge.expression(a), cen, cc))

  def bloomMightContainLong(h: Column, bloom: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContainLong(GraftSqlBridge.expression(h), bloom))
}

/** The PORTABLE hash family shared with the DuckDB oracle: 60-bit md5
  * prefixes mixed by an affine universal family mod a 30-bit prime. Every
  * step is expressible in plain SQL on any engine (md5 + integer
  * arithmetic), which is what makes MinHash-LSH and SimHash pair sets
  * oracle-checkable cross-engine — unlike the xxhash64 family, which is
  * faster but engine-internal. Constants are part of the family's
  * definition; the oracle SQL must use the same three formulas.
  */
object PortableHashFamily {
  /** Largest prime below 2^30 — keeps a_i * x + b_i inside 2^52. */
  val P: Long = 1073741789L
  /** floor(2^64 / P) for Barrett reduction (P does not divide 2^64, so
    * floor((2^64-1)/P) — what divideUnsigned(-1, P) computes — equals it). */
  val BarrettM: Long = java.lang.Long.divideUnsigned(-1L, P)
  def a(i: Int): Long = (48271L * (i + 1)) % P
  def b(i: Int): Long = (16807L * i + 12345L) % P
}

/** The portable family's base hash over a whole string array in one pass:
  * per element, md5 of the UTF-8 bytes, first 15 hex digits (= top 60
  * bits) as a long, optionally reduced mod P. Value-identical to the
  * column formulation `conv(substring(md5(s), 1, 15), 16, 10)` — which
  * allocates two strings per element inside an interpreted `transform` —
  * but digests bytes directly (d03's profile is dominated by exactly
  * this step).
  */
case class Md5Base60Array(child: Expression, modP: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_base60 requires array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    DedupKernels.md5Base60Array(v.asInstanceOf[ArrayData], modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.md5Base60Array($c, $modP)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static per-row kernels shared by the interpreted eval and the generated
  * code of the portable-family dedup expressions ([[Md5Base60Array]],
  * [[MinHashAffine]], [[SimHashBits]]) — same shape as [[TextKernels]]:
  * the WholeStageCodegen function makes one plain static call per row. */
object DedupKernels {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Parsed-bloom cache for [[BloomMightContainLong]], keyed by the byte
    * array's identity (arrays use reference equals, and the reference-object
    * array is ONE instance per executor per plan) — weak so a finished
    * plan's sketch can be collected. */
  private val blooms = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Byte], org.apache.spark.util.sketch.BloomFilter]())

  def bloomMightContainLong(h: Long, bytes: Array[Byte]): Boolean = {
    var bf = blooms.get(bytes)
    if (bf == null) {
      bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      blooms.put(bytes, bf)
    }
    bf.mightContainLong(h)
  }

  /** Plane tensors for [[PortableLshBuckets]], derived once per JVM per
    * geometry — weight (t, i, j) = md5-60("t:i:j")/2^59 − 1, the exact
    * [[graft.analytics.Similarity.portablePlanes]] family (one source of
    * truth for the bytes→long step is [[md5Base60Array]]'s layout). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Array[Double]]]]()

  private def md5Base60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(s.getBytes("UTF-8"))
    var v64 = 0L
    var j = 0
    while (j < 8) { v64 = (v64 << 8) | (h(j) & 0xffL); j += 1 }
    v64 >>> 4
  }

  def lshPlanes(tables: Int, nBits: Int, dim: Int): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((tables, nBits, dim), _ =>
      Array.tabulate(tables, nBits, dim) { (t, i, j) =>
        md5Base60(s"$t:$i:$j").toDouble / 576460752303423488.0d - 1.0
      })

  def portableLshBuckets(arr: ArrayData, isFloat: Boolean,
      tables: Int, nBits: Int, dim: Int): ArrayData = {
    val planes = lshPlanes(tables, nBits, dim)
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var j = 0
    while (j < n) {
      xs(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val pt = planes(t)
      var acc = 0L
      var i = 0
      while (i < nBits) {
        val w = pt(i)
        val m = math.min(w.length, n) // DotProduct's min-length contract
        var s = 0.0
        var k = 0
        while (k < m) { s += xs(k) * w(k); k += 1 }
        if (s >= 0.0) acc |= (1L << i)
        i += 1
      }
      out(t) = acc
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  private def toDoubles(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var j = 0
    while (j < n) {
      xs(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    xs
  }

  /** d(s, c) = cc − 2·Σ_j x_{s·dsub+j}·cen_j — the exact IEEE sequence of
    * the compositional `cc − 2·DotProduct(slice, cen)`. */
  private def pqDist(xs: Array[Double], cen: Array[Double], cc: Double,
      off: Int): Double = {
    var s = 0.0
    var j = 0
    val m = math.min(cen.length, math.max(0, xs.length - off))
    while (j < m) { s += xs(off + j) * cen(j); j += 1 }
    cc - 2.0 * s
  }

  def pqCodes(arr: ArrayData, isFloat: Boolean,
      cen: Array[Array[Array[Double]]], cc: Array[Array[Double]]): ArrayData = {
    val xs = toDoubles(arr, isFloat)
    val m = cen.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val dsub = if (cen(s).length > 0) cen(s)(0).length else 0
      var best = 0
      var bestD = Double.NaN
      var c = 0
      while (c < cen(s).length) {
        val d = pqDist(xs, cen(s)(c), cc(s)(c), s * dsub)
        // (d, c) lexicographic min, c ascending → strict < keeps earlier c,
        // matching array_min over struct(d, c)
        if (c == 0 || d < bestD) { best = c; bestD = d }
        c += 1
      }
      out(s) = best
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  def pqDtab(arr: ArrayData, isFloat: Boolean,
      cen: Array[Array[Array[Double]]], cc: Array[Array[Double]]): ArrayData = {
    val xs = toDoubles(arr, isFloat)
    val m = cen.length
    val out = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val dsub = if (cen(s).length > 0) cen(s)(0).length else 0
      val ds = new Array[Double](cen(s).length)
      var c = 0
      while (c < cen(s).length) {
        ds(c) = pqDist(xs, cen(s)(c), cc(s)(c), s * dsub)
        c += 1
      }
      out(s) = ArrayData.toArrayData(ds)
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  def md5Base60Array(arr: ArrayData, modP: Boolean): ArrayData = {
    val md = digest.get()
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      md.reset()
      val h = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 bytes big-endian, top nibble of byte 7 kept → 15 hex digits
      var v64 = 0L
      var j = 0
      while (j < 8) { v64 = (v64 << 8) | (h(j) & 0xffL); j += 1 }
      val base = v64 >>> 4
      out(i) = if (modP) base % PortableHashFamily.P else base
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  // per-k affine coefficient tables (k is a handful of fixed widths; the
  // generated code cannot carry instance state, so the cache is keyed here)
  private val coeffs =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffsFor(k: Int): (Array[Long], Array[Long]) =
    coeffs.computeIfAbsent(k, kk =>
      (Array.tabulate(kk)(PortableHashFamily.a), Array.tabulate(kk)(PortableHashFamily.b)))

  def minHashAffine(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coeffsFor(k)
    val p = PortableHashFamily.P
    // Barrett reduction: the inner loop runs k divisions per element if
    // written as `% p` (the JIT cannot strength-reduce a non-constant
    // divisor) — |sh|·k hardware divides dominated this expression's
    // profile. q = floor(x·M / 2^64) with M = floor(2^64/P) is off by at
    // most 1 for x < 2^52 (error term x·(2^64 mod P)/(P·2^64) < 2^-12),
    // so one conditional subtract yields the EXACT `% p` value.
    val m = PortableHashFamily.BarrettM
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val t = as(j) * x + bs(j) // < 2^52: a < 2^22, x < 2^30, b < 2^30
        var h = t - java.lang.Math.multiplyHigh(t, m) * p
        if (h >= p) h -= p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  def simHashBits(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** k-permutation MinHash signature over PRE-HASHED base values (md5-60bit
  * mod P, computed upstream with built-in md5/conv columns): one pass, k
  * affine mixes per element — the portable-family twin of [[MinHashSig]].
  */
case class MinHashAffine(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_affine requires array<bigint>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    DedupKernels.minHashAffine(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.minHashAffine($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over PRE-HASHED 60-bit token values: each of the low `bits`
  * bits votes ±1 per token occurrence; the signature packs the vote signs.
  * Portable-family twin of [[SimHash64]] — the oracle rebuilds the same
  * packed value from the same md5 prefixes with plain bit arithmetic.
  */
case class SimHashBits(child: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 60, s"bits must be in [1,60], got $bits")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_bits requires array<bigint>, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    DedupKernels.simHashBits(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.simHashBits($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL `tables` portable sign-LSH bucket ids in ONE pass over the vector.
  * The compositional form (`tables × nBits` separate [[DotProduct]]s, each
  * against a dim-element literal) generates enormous per-row code — at
  * 8 tables × 12 bits × dim 64 the round-7 d19 rehearsal measured it at
  * 3× the cost of the exact n² tiling it exists to beat, with multi-MiB
  * task binaries. Here the plane tensor is derived once per JVM (cached by
  * (tables, nBits, dim) — it is a pure function of those) and the per-row
  * work is a tight fused loop. Plane weights and per-(table, bit) fold
  * order are EXACTLY [[graft.analytics.Similarity.portablePlanes]]'s
  * md5-60/2^59−1 family and DotProduct's j=0..dim−1 left fold, so bucket
  * ids are bit-identical to the compositional form (spec-asserted) and to
  * the DuckDB oracle's replay. */
case class PortableLshBuckets(child: Expression, tables: Int, nBits: Int, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(tables >= 1 && nBits >= 1 && nBits <= 60 && dim >= 1,
    s"invalid LSH geometry: tables=$tables nBits=$nBits dim=$dim")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_lsh_buckets requires array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    DedupKernels.portableLshBuckets(
      v.asInstanceOf[ArrayData], isFloat, tables, nBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.portableLshBuckets($c, $isFloat, $tables, $nBits, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization sub-space codes in ONE pass — the PQ twin of
  * [[PortableLshBuckets]]: the compositional form (m×ksub literal-array
  * dot-product structs per row inside array_min) generates the same
  * pathological per-row code volume the LSH buckets had (v10 measured
  * 10.6 s at sf1 for a 20k-row corpus). The codebook rides the task binary
  * as a reference object; per (sub-space, centroid) the distance is the
  * identical IEEE sequence `cc − 2·Σ_j x_j·cen_j` (j ascending — the
  * DotProduct fold over the slice) with the same (d, c) lexicographic
  * tie-break as `array_min(struct(d, c))`, so codes are bit-identical to
  * the compositional form (spec) and the DuckDB oracle. */
case class PqCodes(child: Expression, cen: Array[Array[Array[Double]]],
    cc: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_codes requires array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    DedupKernels.pqCodes(v.asInstanceOf[ArrayData], isFloat, cen, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("cen", cen, "double[][][]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.pqCodes($c, $isFloat, $cenRef, $ccRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC distance tables in one pass — [[PqCodes]]'s companion:
  * dtab(s)(c) = cc − 2·Σ_j q_j·cen_j, identical op sequence to the
  * compositional nested-array form. */
case class PqDtab(child: Expression, cen: Array[Array[Array[Double]]],
    cc: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_dtab requires array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    DedupKernels.pqDtab(v.asInstanceOf[ArrayData], isFloat, cen, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cenRef = ctx.addReferenceObj("cen", cen, "double[][][]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.pqDtab($c, $isFloat, $cenRef, $ccRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Membership probe against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` — the map-side prefilter of the broadcast-bloom join
  * pattern (Spark's own runtime bloom-filter join injects exactly this
  * shape). The serialized sketch rides the task binary as a codegen
  * reference object and is parsed once per executor (identity-keyed weak
  * cache in [[DedupKernels.bloomMightContainLong]]); the probe is a pure
  * bit-test inside WholeStageCodegen, so non-matching rows die in the scan
  * stage before any exchange. Probabilistic one-way: may pass a
  * non-member (callers re-verify with an exact join), never drops a
  * member. */
case class BloomMightContainLong(child: Expression, bloom: Array[Byte])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires bigint, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    DedupKernels.bloomMightContainLong(v.asInstanceOf[Long], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DedupKernels.bloomMightContainLong($c, $bloomRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static per-row kernels shared by the interpreted eval and the generated
  * code of [[CharEntropy]] / [[WordShingles]] (the generated Java calls these
  * directly — a plain static call inside the WholeStageCodegen function, the
  * same shape as Spark's own UTF8String-backed string expressions).
  */
object TextKernels {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Unicode NFC via the JDK normalizer. Fast path: `isNormalized` is a
    * cheap scan and virtually all real text IS already NFC, so the common
    * case never allocates the normalized copy. */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Shannon entropy (bits/char) of the code-point distribution, summed in
    * ascending code-point order — the exact fold order of the HOF
    * formulation `-aggregate(transform(array_sort(array_distinct(split(s,
    * ""))), ...))` (UTF-8 binary sort of single-code-point strings IS
    * code-point order), so results are bitwise identical, including the
    * `-0.0` of empty / single-symbol input. */
  def charEntropy(u: UTF8String): Double = {
    val str = u.toString
    val len = str.length
    var sum = 0.0
    if (len == 0) return -sum // split("","") = [""]: one symbol, p=1, H=-0.0
    val cps = new Array[Int](len)
    var i = 0
    var m = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(m) = cp
      m += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, m)
    val n = m.toDouble
    var start = 0
    while (start < m) {
      var end = start + 1
      while (end < m && cps(end) == cps(start)) end += 1
      val p = (end - start) / n
      // StrictMath, not Math: Spark's Logarithm evaluates via
      // StrictMath.log, and the two differ by 1 ulp on some inputs
      sum += p * (java.lang.StrictMath.log(p) / java.lang.StrictMath.log(2.0))
      start = end
    }
    -sum
  }

  /** Distinct word n-grams in first-occurrence order — exactly
    * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
    * i => concat_ws(" ", slice(toks, i+1, n))))` over
    * `toks = split(trim(s), "\s+")`: Spark's trim strips U+0020 only, the
    * regex split keeps Java semantics (leading token may be "", trailing
    * empties retained at limit -1), and windows shorter than n (at the
    * array tail or when the doc has < n tokens) join what exists. */
  def wordShingles(u: UTF8String, n: Int): ArrayData = {
    var str = u.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    val toks = Whitespace.split(str, -1)
    val m = toks.length
    val out = new java.util.LinkedHashSet[UTF8String]()
    val last = math.max(m - n, 0)
    var i = 0
    while (i <= last) {
      val end = math.min(i + n, m)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    ArrayData.toArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** Codegen'd twin of the HOF char-entropy formulation (t17's hot path): one
  * O(len·log len) pass per row instead of an interpreted
  * filter-per-distinct-char chain that is O(distinct·len) with a fresh array
  * allocation per distinct character.
  */
case class CharEntropy(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires string, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    TextKernels.charEntropy(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the pass a
  * training-data pipeline runs BEFORE hashing/dedup so that 'é' and
  * 'e'+COMBINING ACUTE hash identically. Wraps the JDK's
  * `java.text.Normalizer` (the Unicode-standard algorithm — DuckDB's
  * `nfc_normalize` implements the same spec, so outputs hash-match
  * cross-engine); codegen'd so it stays inside whole-stage codegen next
  * to the md5/shingle kernels it feeds.
  */
case class NfcNormalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    TextKernels.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd twin of the HOF word-shingle formulation (t18 + the dedup
  * family's shingling step): one tokenizer pass + one LinkedHashSet per row
  * instead of an interpreted sequence/slice/concat_ws chain that re-slices
  * the token array per window.
  */
case class WordShingles(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires string, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    TextKernels.wordShingles(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-permutation MinHash signature in ONE pass over the shingle array
  * (vs k interpreted `array_min(transform(...))` scans): per element one
  * xxhash64 of the bytes, then k cheap seed-chained mixes — identical
  * hash family to `xxhash64(shingle, i)`.
  */
case class MinHashSig(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string|bigint>, got $t")
    }

  private lazy val preHashed =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val base =
        if (preHashed) XxHash64Function.hash(arr.getLong(i), LongType, 42L)
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < k) {
        val h = XxHash64Function.hash(j, IntegerType, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array in one pass (vs 64 separate Catalyst
  * aggregates): per token one xxhash64, each of its bits votes ±1; sign of
  * each vote becomes the signature bit.
  */
case class SimHash64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Strict left-fold dot product over two numeric arrays in double precision:
  * ((0 + x0*y0) + x1*y1) + ... — bitwise identical to the `aggregate`/
  * `zip_with` HOF chain and DuckDB's `list_reduce(list_transform(list_zip))`.
  *
  * Precondition: non-null elements (embedding fixtures are dense); arrays of
  * differing length fold over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ($getA) * ($getB);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED, DISTINCT long arrays via a linear merge
  * walk — no per-row hash-set allocation, fully codegen'd. This is the
  * verification kernel for MinHash-LSH dedup at scale: shingles are hashed to
  * longs and sorted ONCE per document upstream, so each of the millions of
  * candidate pairs costs only |A|+|B| long comparisons.
  */
case class JaccardSortedLong(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted requires array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = $union == 0 ? 0.0 : (double) $inter / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** True iff `a(i) == b(i)` for some `i < n` — the LSH "emit each candidate
  * pair from its first colliding band only" test (drop the pair at band `n`
  * when an earlier band already matched). Replaces a dropDuplicates shuffle
  * over the full pre-dedup candidate stream with a codegen'd O(bands) filter;
  * the interpreted HOF formulation (`exists(zip_with(slice..))`) profiles
  * ~8x slower at bench scale.
  */
case class EarlierArrayMatch(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    // compare ELEMENT types only: a bucket array read back from parquet is
    // containsNull=true while the kernel-computed side is false, and the
    // persisted-index query (d24/v15) joins exactly that mix — the eval
    // only reads elements, and bucket derivations never produce null
    // elements, so nullability must not fail the pair
    def elem(t: DataType) = t.asInstanceOf[ArrayType].elementType
    if (ok(first.dataType) && ok(second.dataType) &&
        elem(first.dataType) == elem(second.dataType) &&
        third.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"earlier_array_match requires (array<int|bigint>, same element type, int), got " +
        s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  private lazy val isLong =
    first.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lim = math.min(math.min(x.numElements(), y.numElements()), n.asInstanceOf[Int])
    var i = 0
    while (i < lim) {
      val eq = if (isLong) x.getLong(i) == y.getLong(i) else x.getInt(i) == y.getInt(i)
      if (eq) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => {
      val i = ctx.freshName("i")
      val lim = ctx.freshName("lim")
      val get = if (isLong) "getLong" else "getInt"
      s"""
         |int $lim = java.lang.Math.min(java.lang.Math.min($a.numElements(), $b.numElements()), $n);
         |${ev.value} = false;
         |for (int $i = 0; $i < $lim; $i++) {
         |  if ($a.$get($i) == $b.$get($i)) { ${ev.value} = true; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Jaccard similarity |A∩B| / |A∪B| of two string arrays in a single
  * hash-set pass (vs the two passes + per-call set builds of
  * array_intersect + array_union). Distinctness is applied internally and an
  * empty union yields NULL — exactly the 0/0 division result of the built-in
  * idiom `size(array_intersect)/size(array_union)` under default (non-ANSI)
  * semantics, so the two formulations agree on every input including
  * empty/empty.
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard requires array<string>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val sa = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { sa.add(x.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String](y.numElements() * 2)
    i = 0
    while (i < y.numElements()) { sb.add(y.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size() + sb.size() - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixed-merges byte-pair encoding (VERDICT r9 #6) — the
  * tokenizer-APPLICATION step a training-data pipeline runs at corpus
  * scale (t05 only COUNTS pretokens; this produces the subword stream).
  *
  * The merges table is the task's fixed binary reference (a trained
  * tokenizer ships its merges file exactly like this — an ordered list of
  * symbol pairs; cf. the BPE application rule of Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  * Application contract, chosen to be EXACTLY replayable in plain SQL:
  *
  *   - words are maximal ASCII-letter runs, lowercased (the fixture
  *     corpus' own alphabet; anything else is a separator),
  *   - a word starts as its character sequence,
  *   - each merge rule (x, y), IN TABLE ORDER, merges every adjacent
  *     (x, y) symbol pair left-to-right, non-overlapping. Because a
  *     merge's output differs from both inputs, one left-to-right pass
  *     per rule is exhaustive for that rule (the merged symbol can never
  *     re-pair under the same rule), so this greedy array pass computes
  *     the standard BPE result.
  *
  * The DuckDB oracle replays the same loop UNROLLED on the spaced-symbol
  * string form (` a b c ` with sentinel spaces): each rule is two
  * `replace(s, ' x y ', ' xy ')` passes — two, because adjacent matches
  * share their delimiter space and a single non-overlapping pass skips
  * every other occurrence; the skipped ones are isolated after pass one,
  * so the second pass is exactly the remainder. Both formulations compute
  * the same greedy non-overlapping merge set, hence hash-match.
  */
object Bpe {
  /** Ordered merges: cascading chains (t a→ta→tab→table) prove multi-level
    * merging; the vocabulary matches the fixture corpus so the encoder
    * produces real multi-char subwords there. */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("t", "h"), ("th", "e"),
    ("r", "o"), ("ro", "w"),
    ("k", "e"), ("ke", "y"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("h", "a"), ("ha", "s"), ("has", "h"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("f", "a"), ("fa", "s"), ("fas", "t"),
    ("s", "o"), ("so", "r"), ("sor", "t"),
    ("s", "l"), ("sl", "o"), ("slo", "w"),
    // the sp chain PRECEDES (p, a): merge rank decides, and 'spark' must
    // win its 'p a' interior from the 'part' chain below
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
    ("m", "e"), ("me", "r"), ("mer", "g"), ("merg", "e"),
    ("p", "a"), ("pa", "r"), ("par", "t"),
    ("b", "a"), ("ba", "t"), ("bat", "c"), ("batc", "h"),
    ("l", "i"), ("li", "n"), ("lin", "e"),
    ("w", "i"), ("wi", "n"), ("win", "d"), ("wind", "o"), ("windo", "w"),
    ("a", "g"), ("ag", "g"))

  /** One document → its BPE token stream: extract lowercased ASCII-letter
    * words, encode each with the greedy per-rule array pass, concatenate.
    * One O(len × rules) pass per row, no regex, no per-row closures. */
  def encode(u: UTF8String): ArrayData = {
    val s = u.toString
    val out = new java.util.ArrayList[UTF8String]()
    val word = new java.lang.StringBuilder()
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val lower =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else ' '
      if (lower != ' ') word.append(lower)
      else if (word.length > 0) {
        encodeWord(word.toString, out)
        word.setLength(0)
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit =
    applyMerges(w, Merges).foreach(s => out.add(UTF8String.fromString(s)))

  /** The greedy per-rule array pass over an arbitrary ORDERED merges
    * table — the application half a learned tokenizer ships
    * ([[graft.analytics.BpeTrain]] learns the table; the train/encode
    * agreement spec pins that applying the learned merges reproduces the
    * trainer's final vocabulary state). */
  def applyMerges(w: String, merges: Seq[(String, String)]): Seq[String] = {
    val syms = new Array[String](w.length)
    var m = w.length
    var i = 0
    while (i < m) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    merges.foreach { case (x, y) =>
      if (m > 1) {
        var r = 0 // read
        var k = 0 // write
        while (r < m) {
          if (r + 1 < m && syms(r) == x && syms(r + 1) == y) {
            syms(k) = x + y; r += 2
          } else {
            syms(k) = syms(r); r += 1
          }
          k += 1
        }
        m = k
      }
    }
    syms.take(m).toSeq
  }

  /** The oracle's unrolled replay of the SAME loop over `col` (a DuckDB
    * SQL expression string): spaced-symbol form, two replaces per rule. */
  def oracleSqlExpr(col: String): String = {
    val spaced = "' ' || regexp_replace(" + col + ", '(.)', '\\1 ', 'g')"
    Merges.foldLeft(spaced) { case (acc, (x, y)) =>
      val once = s"replace($acc, ' $x $y ', ' $x$y ')"
      s"replace($once, ' $x $y ', ' $x$y ')"
    }
  }
}

/** Codegen'd wrapper for [[Bpe.encode]] — stays inside whole-stage codegen
  * next to the aggregate that consumes the token stream. */
case class BpeEncode(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires string, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    Bpe.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
