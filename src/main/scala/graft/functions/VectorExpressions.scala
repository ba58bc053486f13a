package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/hash hot paths.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated interpretively per element — benchmarked ~20× slower on the
  * embedding workload. These expressions generate a tight Java loop inside
  * whole-stage codegen instead (spark_guide: custom Expression with
  * doGenCode beats UDFs beats interpreted HOFs).
  */

/** dot(a, b) over array<float> or array<double>, result double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

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
      def get(v: String, e: Expression): String =
        if (elemType(e) == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += ${get(a, left)} * ${get(b, right)};
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ − bᵢ)² over two array<float> columns, FLOAT accumulation —
  * bit-identical to the interpreted HOF form
  * `aggregate(zip_with(a, b, (x, y) => (x−y)·(x−y)), 0.0f, _ + _)`
  * it replaces (per element: float subtract, float square, float
  * accumulate — the same IEEE ops in the same order), but generated as
  * a tight Java loop inside whole-stage codegen. The HOF form was the
  * PQ train/encode/rerank hot path: ~1M interpreted evaluations per
  * assignment pass (r17 JobProbe: 0.4–0.9 s single-task stages).
  */
case class L2SquaredFloat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = FloatType
  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_l2sq expects array<float>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0f
    var i = 0
    while (i < n) {
      val d = x.getFloat(i) - y.getFloat(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |float $s = 0.0f;
        |for (int $i = 0; $i < $n; $i++) {
        |  float $d = $a.getFloat($i) - $b.getFloat($i);
        |  $s += $d * $d;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over array<string> tokens: bit i set iff the sum of
  * ±1 votes from bit i of xxhash64(token, seed=42) is positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
        |int[] $votes = new int[64];
        |int $n = $a.numElements();
        |for (int $t = 0; $t < $n; $t++) {
        |  if (!$a.isNullAt($t)) {
        |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($t);
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    for (int $b = 0; $b < 64; $b++) {
        |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
        |    }
        |  }
        |}
        |long $out = 0L;
        |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $out |= (1L << $b); }
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over array<string> shingles: sig[j] = min over
  * shingles of xxhash64(shingle, seed=j), j < numHashes. One pass over the
  * shingles hashing each against every seed — no per-seed string concat,
  * no interpreted lambdas.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      s"""
        |long[] $sig = new long[$numHashes];
        |java.util.Arrays.fill($sig, Long.MAX_VALUE);
        |int $n = $a.numElements();
        |for (int $t = 0; $t < $n; $t++) {
        |  if (!$a.isNullAt($t)) {
        |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($t);
        |    for (int $j = 0; $j < $numHashes; $j++) {
        |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $j);
        |      if ($h < $sig[$j]) $sig[$j] = $h;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word k-shingles over array<string>: ["a","b","c","d"], k=3 →
  * ["a b c","b c d"]; inputs shorter than k yield one joined shingle.
  * Native loop replacing the transform(sequence)+slice+concat_ws HOF
  * pipeline (benchmarked ~2 ms/row interpreted on 50-token docs).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingles expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val count = math.max(n - k + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val upper = math.min(i + k, n)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](upper - i)
      var j = i
      while (j < upper) { parts(j - i) = arr.getUTF8String(j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val up = ctx.freshName("up")
      val parts = ctx.freshName("parts")
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
        |int $n = $a.numElements();
        |int $cnt = java.lang.Math.max($n - ${k - 1}, 1);
        |Object[] $out = new Object[$cnt];
        |for (int $i = 0; $i < $cnt; $i++) {
        |  int $up = java.lang.Math.min($i + $k, $n);
        |  $u8[] $parts = new $u8[$up - $i];
        |  for (int $j = $i; $j < $up; $j++) { $parts[$j - $i] = $a.getUTF8String($j); }
        |  $out[$i] = $u8.concatWs($u8.fromString(" "), $parts);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Position-ordered xxhash64 of every k-token window of a token array —
  * the map half of the substring-dedup inverted index (Dedup
  * windowHashes). Bit-identical to the interpreted HOF form
  * `transform(sequence(1, n−k+1), i => xxhash64(array_join(slice(tk, i, k), " ")))`
  * (same seed-42 XXH64 over the same space-joined UTF-8 bytes; n < k
  * yields an empty array), but generated as a tight loop — the HOF form
  * re-entered the interpreter per window and was the dominant task CPU
  * of the d19/d47/d48/d33 family (JobProbe: 10–24 s summed task time
  * per gate on a ~1 MB corpus).
  */
case class WindowHashes64(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_window_hashes expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val count = n - k + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val w = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      out(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val parts = ctx.freshName("parts")
      val w = ctx.freshName("w")
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
        |int $n = $a.numElements();
        |int $cnt = $n - ${k - 1};
        |if ($cnt < 0) $cnt = 0;
        |long[] $out = new long[$cnt];
        |for (int $i = 0; $i < $cnt; $i++) {
        |  $u8[] $parts = new $u8[$k];
        |  for (int $j = 0; $j < $k; $j++) { $parts[$j] = $a.getUTF8String($i + $j); }
        |  $u8 $w = $u8.concatWs($u8.fromString(" "), $parts);
        |  $out[$i] = $xxh.hashUnsafeBytes($w.getBaseObject(), $w.getBaseOffset(), $w.numBytes(), 42L);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH bucket: `numPlanes` sign bits of projections onto
  * pseudo-random planes derived from xxhash64(seed, plane, dim) — fully
  * deterministic, no RNG state. Input array<float|double>, output long.
  */
case class HyperplaneBucket(child: Expression, numPlanes: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_bucket expects array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var out = 0L
    var i = 0
    while (i < numPlanes) {
      var proj = 0.0
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(((seed.toLong * 1024 + i) << 20) | j, 42L)
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        proj += x * (h.toDouble / Long.MaxValue.toDouble)
        j += 1
      }
      if (proj > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val proj = ctx.freshName("proj"); val h = ctx.freshName("h")
      val get = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
        |int $n = $a.numElements();
        |long $out = 0L;
        |for (int $i = 0; $i < $numPlanes; $i++) {
        |  double $proj = 0.0;
        |  for (int $j = 0; $j < $n; $j++) {
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
        |      ((${seed}L * 1024 + $i) << 20) | $j, 42L);
        |    $proj += $get * ((double) $h / (double) Long.MAX_VALUE);
        |  }
        |  if ($proj > 0) $out |= (1L << $i);
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Johnson–Lindenstrauss random projection to `dOut` dimensions with a
  * Rademacher (±1) matrix (Achlioptas 2003, "Database-friendly random
  * projections" — ±1 entries satisfy the JL lemma with the same
  * distortion bound as Gaussians and cost one sign flip per term):
  * y_k = (1/√dOut) Σ_j x_j · s(j,k). The sign is a seeded INTEGER
  * congruence, s(j,k) = +1 iff ((j·2654435761 + k·40503 +
  * j·k·2246822519 + seed) mod 1000003) is even — exact int64
  * arithmetic any engine replays digit-for-digit (the correctness gate
  * recomputes it in SQL), unlike a float RNG. The j·k cross term is
  * load-bearing: without it the congruence is LINEAR in k, adjacent
  * sign columns come out ~perfectly anti-correlated (measured −0.78 to
  * −1.00) and the projection collapses in rank; with it, adjacent
  * columns measure |ρ| ≤ 0.12 (spec-pinned decorrelation). One tight dOut×dIn codegen loop per row, map-only; the
  * 100 TB use is shrinking 768-dim embeddings to 32–64 dims BEFORE the
  * shuffle-heavy ANN tiers (rows carry 12× fewer vector bytes into
  * clustering/LSH, distances distorted by at most the JL ε).
  */
case class RandomProjection(child: Expression, dOut: Int, seed: Long)
    extends UnaryExpression {
  require(dOut >= 1, s"dOut must be >= 1, got $dOut")
  require(seed >= 0, s"seed must be non-negative (both engines' mod must agree), got $seed")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_random_projection"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_random_projection expects array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val scale = math.sqrt(dOut.toDouble)
    val out = new Array[Double](dOut)
    var k = 0
    while (k < dOut) {
      var s = 0.0
      var j = 0
      while (j < n) {
        // j.toLong BEFORE the j*k product (codegen casts the same way)
        // and s / sqrt, not s * (1/sqrt): eval and codegen must produce
        // the SAME double bit-for-bit or a codegen-fallback row rounds
        // differently at the oracle's 6dp boundary
        val sign =
          if ((j * 2654435761L + k * 40503L + j.toLong * k * 2246822519L + seed)
              % 1000003L % 2L == 0L) 1.0 else -1.0
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        s += x * sign
        j += 1
      }
      out(k) = s / scale
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val sign = ctx.freshName("sign")
      val get = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
        |int $n = $a.numElements();
        |double[] $out = new double[$dOut];
        |for (int $k = 0; $k < $dOut; $k++) {
        |  double $s = 0.0;
        |  for (int $j = 0; $j < $n; $j++) {
        |    double $sign =
        |      (($j * 2654435761L + $k * 40503L
        |          + (long) $j * $k * 2246822519L + ${seed}L)
        |        % 1000003L % 2L == 0L) ? 1.0 : -1.0;
        |    $s += $get * $sign;
        |  }
        |  $out[$k] = $s / java.lang.Math.sqrt((double) $dOut);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared kernel for [[CharGrams]]: both the interpreted eval and the
  * generated code call this one static method, so the two paths are
  * bit-identical by construction. One detached byte copy of the input
  * per row; every gram is a zero-copy UTF8String slice of it, and the
  * char→byte offset table is computed once — the HOF form
  * (`transform(sequence(...), i => substr(s, i, n))` per n) re-entered
  * the interpreter per gram AND paid substr's from-the-start char scan
  * per gram (O(L²) on long docs).
  */
object CharGramsUtil {
  def pooled(s: org.apache.spark.unsafe.types.UTF8String,
             ns: Array[Int]): ArrayData = {
    // getBytes returns the underlying array only when the string spans
    // it exactly (a freshly-allocated expression result — never a
    // reused row/page buffer, which are always nonzero-offset slices
    // and therefore copied), so slicing `bytes` is safe.
    val bytes = s.getBytes
    val nb = bytes.length
    var chars = 0
    var b = 0
    while (b < nb) {
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      chars += 1
    }
    val offs = new Array[Int](chars + 1)
    var c = 0
    b = 0
    while (b < nb) {
      offs(c) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(chars) = nb
    var total = 0
    var t = 0
    while (t < ns.length) {
      if (chars >= ns(t)) total += chars - ns(t) + 1
      t += 1
    }
    val out = new Array[AnyRef](total)
    var o = 0
    t = 0
    while (t < ns.length) {
      val n = ns(t)
      val cnt = chars - n + 1
      var i = 0
      while (i < cnt) {
        out(o) = org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, offs(i), offs(i + n) - offs(i))
        o += 1
        i += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Pooled character n-grams of a string: for each n in `ns` (in order),
  * every char-level n-gram of the input, concatenated into one array —
  * exactly `concat(transform(sequence(1, L-n+1), i => substr(s, i, n)) for
  * n in ns)` with the `length(s) >= n` guard (shorter strings contribute
  * nothing for that n). Character semantics match `substr` (codepoint
  * positions, not bytes). NULL input yields NULL (callers that need the
  * HOF form's empty-array-on-null coalesce it). This is CharLangId's
  * featurize step (d51/d51b): the HOF form was the gates' dominant task
  * CPU, interpreted per gram.
  */
case class CharGrams(child: Expression, ns: Seq[Int]) extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1), s"n-gram lengths must be >= 1, got $ns")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_grams"

  private lazy val nsArr: Array[Int] = ns.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_char_grams expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharGramsUtil.pooled(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
      s"${ev.value} = graft.functions.CharGramsUtil.pooled($a, $nsRef);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points for the native expressions. */
object VectorFunctions {
  def dotp(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normCol(a: Column): Column = org.apache.spark.sql.functions.sqrt(dotp(a, a))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2SquaredFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def minhash(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  def shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))

  def windowHashes64(tokens: Column, k: Int): Column =
    ColumnBridge.column(WindowHashes64(ColumnBridge.expression(tokens), k))

  def charGrams(text: Column, ns: Seq[Int]): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(text), ns))

  def hyperplaneBucket(vec: Column, numPlanes: Int, seed: Int): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec), numPlanes, seed))

  def randomProjection(vec: Column, dOut: Int, seed: Long = 0L): Column =
    ColumnBridge.column(RandomProjection(ColumnBridge.expression(vec), dOut, seed))
}
