package org.apache.spark.sql.graft

// Hosted inside the org.apache.spark.sql package tree so the
// private[sql] catalyst type-coercion traits (AbstractDataType,
// ImplicitCastInputTypes) are accessible — the standard pattern for
// third-party native expressions.

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * their lambdas interpretively row-by-row — they never enter
  * whole-stage codegen. A brute-force scan at 100 TB spends essentially
  * all its time in the distance kernel, so these expressions generate
  * the tight primitive loop directly (`doGenCode`), keeping the whole
  * scan → distance → rank pipeline inside one WholeStageCodegen span
  * with zero boxing.
  *
  * Mirrors the metrics of the reference store (EUCLID at
  * /root/reference/insert.py:72; cosine as the standard alternative).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** body(xi, yi, s, sa, sb) → accumulation stmt; result(s, sa, sb) → final expr */
  protected def kernel(xi: String, yi: String, s: String, sa: String, sb: String): (String, String)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    evalLoop(x, y, n)
  }

  protected def evalLoop(x: ArrayData, y: ArrayData, n: Int): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val s = ctx.freshName("s")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val (body, result) = kernel(xi, yi, s, sa, sb)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $body
         |}
         |${ev.value} = $result;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — identical fold order to the DuckDB oracle. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"
  override protected def kernel(xi: String, yi: String, s: String, sa: String, sb: String) =
    (s"$s += $xi * $yi;", s)
  override protected def evalLoop(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** √Σ (aᵢ−bᵢ)² — the reference collection's EUCLID metric. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_l2"
  override protected def kernel(xi: String, yi: String, s: String, sa: String, sb: String) =
    (s"double ${s}_d = $xi - $yi; $s += ${s}_d * ${s}_d;", s"java.lang.Math.sqrt($s)")
  override protected def evalLoop(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ|aᵢ − bᵢ| — MANHATTAN distance, Qdrant's fourth metric
  * (`Distance.Manhattan`, beside cosine / dot / euclid): one
  * abs-accumulate per element, same codegen shape as [[L2Distance]].
  */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_l1"
  override protected def kernel(xi: String, yi: String, s: String, sa: String, sb: String) =
    (s"$s += java.lang.Math.abs($xi - $yi);", s)
  override protected def evalLoop(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(x.getDouble(i) - y.getDouble(i)); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot/(‖a‖·‖b‖) in one pass over both arrays. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"
  override protected def kernel(xi: String, yi: String, s: String, sa: String, sb: String) =
    (s"$s += $xi * $yi; $sa += $xi * $xi; $sb += $yi * $yi;",
      s"$s / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb))")
  override protected def evalLoop(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      s += xi * yi; sa += xi * xi; sb += yi * yi; i += 1
    }
    s / (math.sqrt(sa) * math.sqrt(sb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Argmin-centroid id under squared-euclidean (≡ euclidean argmin) for
  * a fixed, plan-time centroid set (k-means assignment / nearest-
  * centroid classification). The centroid matrix rides along as a
  * codegen reference object — one tight double[][] loop per row, no
  * per-row struct/array allocation, no join, no shuffle. Ties break to
  * the lowest centroid id (centroids iterated in ascending-id order).
  */
case class NearestCentroid(child: Expression, cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val sorted = cents.sortBy(_._1)
  @transient private lazy val mat: Array[Array[Double]] = sorted.map(_._2.toArray).toArray
  @transient private lazy val ids: Array[Long] = sorted.map(_._1).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < mat.length) {
      val cv = mat(c); val n = math.min(x.numElements(), cv.length)
      var s = 0.0; var i = 0
      while (i < n) { val d0 = x.getDouble(i) - cv(i); s += d0 * d0; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val matRef = ctx.addReferenceObj("cmat", mat, "double[][]")
      val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val cv = ctx.freshName("cv")
      val n = ctx.freshName("n"); val d0 = ctx.freshName("d0")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $matRef.length; $c++) {
         |  double[] $cv = $matRef[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d0 = $a.getDouble($i) - $cv[$i]; $s += $d0 * $d0;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = $idsRef[$best];
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Centroid ids with distances, RANKED by (l2 distance asc, cid asc) —
  * the probe-selection kernel. Returns ARRAY<STRUCT<d: DOUBLE, cid:
  * BIGINT>>, element-for-element identical to
  * `array_sort(array(struct(graft_l2(v, lit(c)), lit(cid)), ...))` (the
  * literal-expression formulation it replaces): d is the SQRT'd l2
  * distance and ties break by ascending cid via j.l.Double.compare
  * (sqrt never yields -0.0 on a nonneg sum, and NaN sorts last — the
  * same total order Spark's struct comparator applies). The literal
  * form builds an nlist×dim constant expression tree that the
  * optimizer re-folds and Janino re-compiles PER STAGE (~seconds at
  * nlist=√n, and past method limits it falls back to interpreted
  * per-row struct allocation); here the centroid matrix rides along as
  * one codegen reference object and each row costs one tight loop +
  * one small argsort.
  */
case class CentroidRanks(child: Expression, cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_centroid_ranks"

  @transient private lazy val sorted = cents.sortBy(_._1)
  @transient private lazy val mat: Array[Array[Double]] = sorted.map(_._2.toArray).toArray
  @transient private lazy val ids: Array[Long] = sorted.map(_._1).toArray

  override def nullSafeEval(a: Any): Any =
    CentroidRanks.ranks(a.asInstanceOf[ArrayData], mat, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val matRef = ctx.addReferenceObj("cmat", mat, "double[][]")
      val idsRef = ctx.addReferenceObj("cids", ids, "long[]")
      s"""
         |${ev.value} = org.apache.spark.sql.graft.CentroidRanks.ranks(
         |  $a, $matRef, $idsRef);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CentroidRanks {
  /** Shared kernel (interpreted + codegen paths). */
  def ranks(x: ArrayData, mat: Array[Array[Double]], ids: Array[Long]): ArrayData = {
    val k = mat.length
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = mat(c); val n = math.min(x.numElements(), cv.length)
      var s = 0.0; var i = 0
      while (i < n) { val d0 = x.getDouble(i) - cv(i); s += d0 * d0; i += 1 }
      ds(c) = math.sqrt(s)
      c += 1
    }
    // argsort by (d asc, cid asc); ids are pre-sorted ascending, so a
    // stable sort on d alone preserves the cid tie-break
    val order = Array.range(0, k).sortWith { (i, j) =>
      val cmp = java.lang.Double.compare(ds(i), ds(j))
      if (cmp != 0) cmp < 0 else ids(i) < ids(j)
    }
    val rows = new Array[Any](k)
    c = 0
    while (c < k) {
      val o = order(c)
      rows(c) = InternalRow(ds(o), ids(o))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** l2 distance (sqrt'd, [[L2Distance]]-identical) from a vector to the
  * centroid NAMED by the row's cid column — the assigned-centroid
  * residual kernel. Replaces both the `element_at(<literal centroid
  * matrix>, cid+1)` lookup and the per-cid when-chain of literal
  * l2Distance terms (nlist× the literal-tree cost of
  * [[CentroidRanks]]'s rationale). A cid outside the centroid set
  * yields NaN — the when-chain's `otherwise(NaN)` contract.
  */
case class CentroidDistById(left: Expression, right: Expression,
                            cents: Seq[(Long, Seq[Double])])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), LongType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_centroid_dist"

  @transient private lazy val byId: java.util.HashMap[java.lang.Long, Array[Double]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Double]]()
    cents.foreach { case (cid, cv) => m.put(cid, cv.toArray) }
    m
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CentroidDistById.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[Long], byId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mapRef = ctx.addReferenceObj("cbyid", byId, "java.util.HashMap")
      s"""
         |${ev.value} = org.apache.spark.sql.graft.CentroidDistById.dist(
         |  $a, $b, $mapRef);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CentroidDistById {
  /** Shared kernel (interpreted + codegen paths). */
  def dist(x: ArrayData, cid: Long,
           byId: java.util.HashMap[java.lang.Long, Array[Double]]): Double = {
    val cv = byId.get(cid)
    if (cv == null) return Double.NaN
    val n = math.min(x.numElements(), cv.length)
    var s = 0.0; var i = 0
    while (i < n) { val d0 = x.getDouble(i) - cv(i); s += d0 * d0; i += 1 }
    math.sqrt(s)
  }
}

/** Jaccard similarity of two SORTED, DISTINCT long arrays via a single
  * merge walk — |A∩B| / |A∪B| in O(|A|+|B|) with no allocation. The
  * verify kernel for signature-based dedup when per-doc sorted hash
  * arrays are precomputed (sort_array(collect_set(xxhash64(shingle)))):
  * a candidate pair costs one codegen'd loop instead of a per-shingle
  * join + groupBy count.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |long $inter = 0L; int $i = 0; int $j = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = ($na == 0 && $nb == 0) ? 0.0
         |  : (double) $inter / ($na + $nb - $inter);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** #dims whose SIGN BIT differs — the binary-quantization hamming
  * distance computed straight from the float column. The `zip_with` +
  * `aggregate` formulation of the same count evaluates two interpreted
  * lambdas per row (BENCH_r02: 9.0 s for the BQ stage-1 scan vs 0.8 s
  * for its PQ sibling); this is one codegen'd branchless loop
  * (`(a>=0) != (b>=0)` compiles to a sign-bit xor). At scale the sign
  * bitmap is the stored artifact and this kernel runs over packed
  * longs; over the inline float column it is already scan-bound.
  * Integer result — engine-exact, ties deterministic.
  */
case class HammingSign(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming_sign"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 0L; var i = 0
    while (i < n) {
      if ((x.getDouble(i) >= 0) != (y.getDouble(i) >= 0)) h += 1
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (($a.getDouble($i) >= 0) != ($b.getDouble($i) >= 0)) $h++;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pack a float vector's SIGN BITS into ⌈dim/64⌉ longs — the stored
  * binary-quantization artifact: dim/8 bytes per vector instead of
  * dim×8 for the float column, a 64× scan-I/O reduction for the BQ
  * coarse stage. Bit i of word i/64 is set iff v(i) >= 0 — the exact
  * predicate [[HammingSign]] counts with, so
  * `HammingPacked(SignPack(a), SignPack(b)) ≡ HammingSign(a, b)` for
  * equal-length vectors (spec-proved). Bits past dim stay 0.
  */
case class SignPack(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sign_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SignPack.pack(x))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  org.apache.spark.sql.graft.SignPack.pack($a));
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SignPack {
  /** Shared kernel (interpreted + codegen paths). */
  def pack(x: ArrayData): Array[Long] = {
    val n = x.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.getDouble(i) >= 0) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }
}

/** Hamming distance over two packed sign bitmaps ([[SignPack]] output):
  * Σ bitCount(xor) over the common word prefix — one branchless popcount
  * per 64 dims, reading dim/8 bytes per vector. Equal-dim contract
  * (fixed-dim BQ collections): unequal vector lengths compare whole
  * words, not dims, past the shorter vector's last partial word.
  * Integer result — engine-exact, ties deterministic.
  */
case class HammingPacked(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming_packed"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 0L; var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The deterministic feature-hash text embedding fused into ONE
  * map-side expression: split text on single spaces, Murmur3-hash each
  * token (seed 42 — bit-identical to `functions.hash`), accumulate ±1
  * into `pmod(h, dim)` buckets (+1 when h is even), L2-normalize.
  *
  * The declarative formulation (explode → (doc, bucket) partial agg →
  * dim conditional-sum assembly) is the right shape for an engine
  * without per-row kernels, but it pays TWO doc-keyed exchanges and
  * dim× conditional evaluations per doc — 14.9 s at sf0.1, the
  * single largest line of BENCH_r02. This kernel touches each
  * character once per row with no shuffle at all; the embed stage of
  * fromTexts / searchText / vs_embed_text becomes a pure map over the
  * corpus — embarrassingly parallel at any scale. Bucket sums are
  * order-free (±1 integers in double), so output is bit-identical to
  * the declarative pipeline (EquivalenceSpec-proved).
  */
case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(dim > 0, s"dim must be positive, got $dim")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_feature_hash_embed"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      FeatureHashEmbed.embed(s, dim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  org.apache.spark.sql.graft.FeatureHashEmbed.embed($a, $dim));
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FeatureHashEmbed {
  /** Shared kernel (interpreted + codegen paths): one pass over the
    * UTF-8 bytes; token boundaries at 0x20 — byte-equivalent to
    * `split(text, " ")`, whose default limit -1 KEEPS empty tokens
    * (leading, interior, and trailing; "" → one empty token), so a
    * row always hashes n_spaces+1 tokens. 0x20 never occurs inside a
    * UTF-8 multi-byte sequence, so byte scanning ≡ character scanning.
    */
  def embed(s: org.apache.spark.unsafe.types.UTF8String, dim: Int): Array[Double] = {
    val bytes = s.getBytes
    val out = new Array[Double](dim)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          i - start, 42)
        val idx = ((h % dim) + dim) % dim
        out(idx) += (if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0)
        start = i + 1
      }
      i += 1
    }
    var nrm = 0.0
    var k = 0
    while (k < dim) { nrm += out(k) * out(k); k += 1 }
    nrm = math.sqrt(nrm) // all-cancelled sums → 0/0 = NaN, as Normalize does
    k = 0
    while (k < dim) { out(k) /= nrm; k += 1 }
    out
  }
}

/** int8 scalar-quantization RECONSTRUCTION fused into one pass: per
  * dimension, code = min(⌊(v−lo)/rng·256⌋, 255), v' = lo+(code+0.5)/256·rng
  * — the stage-1 scoring input of the SQ rerank search. The zip_with
  * formulation chains FOUR interpreted lambdas per row (quantize two,
  * reconstruct two); this is one codegen'd loop with the per-dim
  * bounds riding along as reference arrays (dim doubles — the
  * persisted quantizer state). Arithmetic is the identical double
  * sequence, so scores are bit-equal and the DuckDB oracle is
  * unaffected.
  */
case class SqReconstruct(child: Expression, lo: Array[Double], rng: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq_reconstruct"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), lo.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val code = math.min(math.floor((x.getDouble(i) - lo(i)) / rng(i) * 256), 255.0)
      out(i) = lo(i) + (code + 0.5) / 256 * rng(i)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val loRef = ctx.addReferenceObj("sqlo", lo, "double[]")
      val rngRef = ctx.addReferenceObj("sqrng", rng, "double[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val code = ctx.freshName("code")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $loRef.length);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $code = java.lang.Math.min(
         |    java.lang.Math.floor(($a.getDouble($i) - $loRef[$i]) / $rngRef[$i] * 256), 255.0);
         |  $out[$i] = $loRef[$i] + ($code + 0.5) / 256 * $rngRef[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit STUB perceptual hash of a (ASCII) payload: bit i =
  * popcount-parity of the byte sampled at position ⌊i·len/64⌋ — a
  * deterministic, locality-sensitive stand-in for a real DCT pHash
  * (no media codecs in this container; byte-sampling ≡ the oracle's
  * character sampling on ASCII payloads). One generated loop; the
  * column-expression formulation (64 substring+ascii+bit_count terms)
  * overflows Janino's method limits and falls back to interpreted
  * eval, which is exactly the anti-pattern §5.1 documents.
  */
case class Phash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_phash64"

  override def nullSafeEval(a: Any): Any =
    Phash64.hash(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.Phash64.hash($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Phash64 {
  /** Shared kernel (interpreted + codegen paths). */
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val len = bytes.length.toLong
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (len > 0) {
        val p = (i * len / 64).toInt
        sig |= (java.lang.Integer.bitCount(bytes(p) & 0xff) & 1).toLong << i
      }
      i += 1
    }
    sig
  }
}

/** a / ‖a‖₂ — unit-normalize in ONE fused pass (norm loop + scale loop).
  * The composable formulation `transform(a, x => x / graft_norm(a))`
  * re-evaluates the norm — itself an O(d) loop over the (possibly
  * freshly assembled) array — inside the per-element lambda, i.e. O(d²)
  * interpreted work per row; the optimizer then duplicates the whole
  * expression into inferred filters (e.g. `size(e) > 0` before a
  * posexplode), doubling it again. This expression is O(d), codegen'd,
  * and cheap enough to duplicate. Zero-norm inputs divide to NaN —
  * identical to the transform formulation's x/0.0.
  */
case class Normalize(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i); $s += $v * $v;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $a.getDouble($i) / $nrm; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ‖a‖₂ (unary). */
case class L2Norm(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_norm"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      s"""
         |double sum = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double v = $a.getDouble($i); sum += v * v;
         |}
         |${ev.value} = java.lang.Math.sqrt(sum);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
