package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the embedding hot path. Lives in an
  * `org.apache.spark.sql` subpackage because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]` — the standard placement for
  * library-provided expressions compiled against Spark; the public
  * entry point is `graft.functions.Native`.
  *
  * The composable formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates an intermediate products array per row pair and walks it
  * twice. For ANN scoring — the one expression evaluated O(corpus ×
  * queries) times — a dedicated `BinaryExpression` with `doGenCode` is
  * justified (SURVEY §2.11 note): a single fused loop, no allocation,
  * inside WholeStageCodegen. On equal-length arrays of NON-NULL elements
  * semantics are identical to the composable form (each float widened to
  * double, products accumulated in element order), so oracle results are
  * bit-identical. Arrays *containing* null elements are outside the
  * embedding contract: the composable form propagates null, while this
  * expression reads such slots as 0.0 — do not rely on either behavior.
  */
object GraftNative {

  /** Σ aᵢ·bᵢ over two float arrays, double accumulation. Null if either
    * side is null or lengths mismatch; array ELEMENTS must be non-null
    * (embedding contract — null slots read as 0.0, unlike the composable
    * form which propagates null; see object doc).
    */
  case class FloatDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_dot"

    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      // mismatched dimensions → null (matching the composable zip_with
      // form), never a silently-truncated partial dot
      if (n != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API entry point. */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 28 bits of md5(s) as a long — bit-identical to
    * `conv(substring(md5(s), 1, 7), 16, 10)` (the first 7 lowercase hex
    * chars are the first 3.5 digest bytes), without materializing the
    * 32-char hex string. Public static so generated code can call it.
    */
  def md5Base28(s: UTF8String): Long = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 20) | ((h(1) & 0xffL) << 12) |
      ((h(2) & 0xffL) << 4) | ((h(3) & 0xffL) >>> 4)
  }

  /** Per-element [[md5Base28]] over a string array — the MinHash
    * base-hash pass. The composable form (`transform(sh, s =>
    * conv(substring(md5(s), 1, 7), 16, 10))`) runs as an INTERPRETED
    * higher-order function (lambdas are outside whole-stage codegen) and
    * builds a 32-char hex string plus a decimal-conversion string per
    * shingle; this expression is one codegen'd loop over digest bytes.
    * Evaluated once per document in the (cached) minhash base build —
    * the dedup pipeline's hot scan-side pass at corpus scale. Array
    * elements must be non-null (the shingle contract: concat_ws output).
    */
  case class Md5Base28Array(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "md5_base28_array"

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = md5Base28(arr.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val cls = "org.apache.spark.sql.graftnative.GraftNative"
        s"""
           |final int $n = $a.numElements();
           |final long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $cls.md5Base28($a.getUTF8String($i));
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def md5Base28Array(arr: Column): Column =
    ExpressionUtils.column(Md5Base28Array(ExpressionUtils.expression(arr)))

  /** Unsigned byte values of a binary column as array<int> — the
    * sample-extraction pass of the audio windowing. The composable form
    * (`transform(sequence(1, length(x)), j => conv(substring(hex(x),
    * 2j−1, 2), 16, 10))`) materializes a 2n-char hex string per window
    * and runs an interpreted lambda doing a string substring + base
    * conversion PER BYTE; this is one codegen'd loop reading the bytes
    * directly (measured ~4× on mm_audio_window at sf0.1). Bit-identical
    * output: both read each byte as unsigned 0..255.
    */
  case class BytesToIntArray(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(org.apache.spark.sql.types.BinaryType)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "bytes_to_int_array"

    override protected def nullSafeEval(a: Any): Any = {
      val bytes = a.asInstanceOf[Array[Byte]]
      val out = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) {
        out(i) = bytes(i) & 0xff
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |final int[] $out = new int[$a.length];
           |for (int $i = 0; $i < $a.length; $i++) {
           |  $out[$i] = $a[$i] & 0xff;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def bytesToIntArray(bin: Column): Column =
    ExpressionUtils.column(BytesToIntArray(ExpressionUtils.expression(bin)))

  /** MinHash signature from a base-hash array in ONE pass: element i is
    * min over bases b of (aᵢ·b + bᵢ) mod P, with (aᵢ, bᵢ, P) exactly
    * `PortableHash.affineFamily` (aᵢ = 1000003·(i+1), bᵢ = 666019·(i+1),
    * P = 2³¹−1; aᵢ·b + bᵢ < 2⁵⁹ so the long arithmetic never overflows,
    * and all terms are non-negative so Java `%` equals `pmod`).
    *
    * The composable form — numHashes × `array_min(transform(bases, …))`
    * — walks the base array once PER FAMILY MEMBER as an interpreted
    * higher-order function and allocates an intermediate array each
    * time; this is a single codegen'd loop carrying numHashes running
    * minima. Evaluated once per document in every MinHash pipeline
    * (dedup_minhash_lsh / components / incremental / chunk_dedup) — the
    * corpus-scale scan-side hot path. Empty base arrays yield NULL (the
    * composable form yields an all-null signature; the shingle contract
    * — concat_ws output, ≥ 1 element — makes both unreachable).
    */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override def nullable: Boolean = true

    private val aStep = graft.functions.PortableHash.FamilyAStep
    private val bStep = graft.functions.PortableHash.FamilyBStep
    private val prime = graft.functions.PortableHash.P

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) null
      else {
        val out = Array.fill(numHashes)(Long.MaxValue)
        var j = 0
        while (j < n) {
          // null ELEMENTS are outside the contract (the md5 base pass
          // emits containsNull=false); this reads such a slot as 0L
          // where the composable form would null the whole member
          val base = arr.getLong(j)
          var i = 0
          while (i < numHashes) {
            val h = (aStep * (i + 1) * base + bStep * (i + 1)) % prime
            if (h < out(i)) out(i) = h
            i += 1
          }
          j += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val base = ctx.freshName("base")
        val h = ctx.freshName("h")
        s"""
           |final int $n = $a.numElements();
           |if ($n == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  final long[] $out = new long[$numHashes];
           |  java.util.Arrays.fill($out, Long.MAX_VALUE);
           |  for (int $j = 0; $j < $n; $j++) {
           |    final long $base = $a.getLong($j);
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      final long $h =
           |        (${aStep}L * ($i + 1) * $base + ${bStep}L * ($i + 1))
           |          % ${prime}L;
           |      if ($h < $out[$i]) $out[$i] = $h;
           |    }
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def minhashSignature(bases: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(bases), numHashes))

  private val wsPatternU = UTF8String.fromString("\\s+")
  private val spaceU = UTF8String.fromString(" ")

  /** Distinct k-shingles of a raw text value in one pass — the fused
    * form of `array_distinct(transform(sequence(0, greatest(size(toks)
    * − k, 0)), i => concat_ws(" ", slice(toks, i+1, k))))` over
    * `toks = split(lower(trim(text)), "\\s+")` (the composable
    * reference kept as `Dedup.shingles`). Bit-identical by
    * construction: trim/lower/split call the SAME `UTF8String`
    * methods the `StringTrim`/`Lower`/`StringSplit` expressions call
    * (space-only trim, UTF8 lowercase, Java-regex split with
    * limit −1 so a leading non-space whitespace still yields the
    * empty first token), the join is `UTF8String.concatWs` (what
    * `ConcatWs` calls), and dedup preserves first-occurrence order
    * like `ArrayDistinct`. Public static so generated code can call
    * it.
    */
  def shingleArray(text: UTF8String, k: Int): ArrayData = {
    val toks = text.trim().toLowerCase().split(wsPatternU, -1)
    val n = toks.length
    val last = math.max(n - k, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      val part = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { part(j - i) = toks(j); j += 1 }
      seen.add(UTF8String.concatWs(spaceU, part: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** [[shingleArray]] as an expression. The composable HOF pipeline it
    * replaces runs INTERPRETED (lambdas sit outside whole-stage
    * codegen) and does per-shingle work that dwarfs the payload: a
    * `sequence` array allocation, a `slice` copy and a distinct pass
    * of n² UTF8 comparisons per document — measured as the dominant
    * scan-side cost of every shingle-based dedup/text operator once
    * the corpus outgrows the cache (≈4,300 of 6,500 CPU-seconds of
    * the sf10 exact-containment run were tokenize+shingle). This is
    * one virtual call per row inside WholeStageCodegen, with a
    * hash-set dedup. Null text → null, matching the composable form's
    * null propagation.
    */
  case class ShingleArray(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingle_array"

    override protected def nullSafeEval(a: Any): Any =
      shingleArray(a.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cls = "org.apache.spark.sql.graftnative.GraftNative"
        s"${ev.value} = $cls.shingleArray($a, $k);"
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def shingleArrayCol(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleArray(ExpressionUtils.expression(text), k))

  /** First 15 lowercase hex chars of md5(s) as a long — bit-identical
    * to `conv(substring(md5(s), 1, 15), 16, 10)` (60 bits: seven full
    * digest bytes plus the high nibble of the eighth), without the
    * 32-char hex string. The token hash of the SimHash family
    * (`PortableHash.md5Long(c, 15)`). Public static for generated code.
    */
  def md5Long60(s: UTF8String): Long = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 52) | ((h(1) & 0xffL) << 44) |
      ((h(2) & 0xffL) << 36) | ((h(3) & 0xffL) << 28) |
      ((h(4) & 0xffL) << 20) | ((h(5) & 0xffL) << 12) |
      ((h(6) & 0xffL) << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** 60-bit SimHash of a token array: bit b is set when
    * Σ_tokens (±1 by bit b of md5Long60(token)) is positive — the
    * whole per-document SimHash in ONE pass. Public static so the
    * generated code is a single call (the 60-counter loop does not
    * belong inlined in a generated method). */
  def simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = md5Long60(tokens.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Per-document fused SimHash (round 18, VERDICT r17 task 6): the
    * composable form explodes the token stream and runs SIXTY
    * conditional-sum aggregates per document — at sf10 the hash pass
    * dominated the whole operator (tcpu 330 s of the 28 s-wall solo
    * anchor). This expression computes the identical 60-bit hash in
    * one codegen'd pass over the token array: no explode (no n_tokens×
    * row expansion), no 60-column aggregation buffer, and — because
    * the result is per-ROW — no groupBy shuffle at all: the hash stays
    * inside the scan stage. Bit-identical to the aggregate form on
    * unique ids (Round18OpsSpec parity pin, including the null/empty
    * edge rows); input rows with duplicate ids are outside the
    * contract (the old groupBy silently merged their token streams —
    * an artifact of the aggregate formulation, not a semantic anyone
    * depends on: every caller feeds unique doc ids).
    */
  case class Simhash60(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash60"

    override protected def nullSafeEval(a: Any): Any =
      simhash60(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cls = "org.apache.spark.sql.graftnative.GraftNative"
        s"${ev.value} = $cls.simhash60($a);"
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def simhash60Col(tokens: Column): Column =
    ExpressionUtils.column(Simhash60(ExpressionUtils.expression(tokens)))

  // ------------------------------------------------------------------
  // Manual runtime-filter injection: the same BloomFilterAggregate /
  // BloomFilterMightContain pair Catalyst's InjectRuntimeFilter uses,
  // exposed as Column builders so a query can build the filter over a
  // selective dimension DISTRIBUTED (one binary row out of an
  // aggregation — no key collect) and push the membership probe into
  // the fact scan ahead of the exact join. Both expressions are
  // codegen'd; the probe costs one xxhash64 + bitset test per row.

  /** Aggregate: distributed Bloom-filter build over `key`. Returns one
    * binary value (the serialized sketch). `expectedItems`/`numBits`
    * size the filter (numBits/expectedItems ≈ 10 → ~1% fpp).
    */
  def bloomFilterAgg(key: Column, expectedItems: Long,
      numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Predicate: membership probe of `key` against a driver-held
    * serialized filter (one small binary literal shipped with the plan —
    * the standard broadcast shape for a runtime filter).
    */
  def bloomMightContain(filterBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(filterBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
  }

  /** All LSH band keys of a MinHash signature in ONE pass: element b is
    * the signature slice [b·rowsPerBand, (b+1)·rowsPerBand) joined with
    * "-" — bit-identical to the composable
    * `array((0 until bands).map(b => array_join(transform(slice(sig,
    * b·r+1, r), _.cast("string")), "-")))` (Long→string cast IS
    * `Long.toString`; ConcatWs-with-"-"-joined). The composable form
    * runs `bands` interpreted `transform` lambdas per document, each
    * allocating a slice copy, a string array and the joined string;
    * this is one codegen'd loop building the band strings directly —
    * the band-key pass is the next scan-side cost tier of every MinHash
    * family member after the round-12 native shingle/md5/signature
    * passes. Null signature → null; slices beyond the signature length
    * are the caller's bug (bands·rowsPerBand must equal numHashes) and
    * throw rather than truncate, as do null signature ELEMENTS (which
    * would otherwise silently read as 0 where the composable
    * array_join form skips them).
    */
  case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "minhash_band_keys"

    override protected def nullSafeEval(a: Any): Any =
      bandKeysOf(a.asInstanceOf[ArrayData], bands, rowsPerBand)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cls = "org.apache.spark.sql.graftnative.GraftNative"
        s"${ev.value} = $cls.bandKeysOf($a, $bands, $rowsPerBand);"
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Static worker for [[MinHashBandKeys]] (public so generated code can
    * call it).
    */
  def bandKeysOf(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    require(sig.numElements() >= bands * rowsPerBand,
      s"signature has ${sig.numElements()} elements, " +
        s"need $bands x $rowsPerBand")
    val out = new Array[UTF8String](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 12)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = 0
      while (i < rowsPerBand) {
        if (i > 0) sb.append('-')
        // fail loudly like the length require: getLong on a null slot
        // would silently read 0 where the composable array_join form
        // skips the element — reachable via the graft_band_keys SQL
        // surface with a hand-built ArrayType(LongType) column
        require(!sig.isNullAt(b * rowsPerBand + i),
          s"null signature element at ${b * rowsPerBand + i}: band keys " +
            "require a complete minhash signature (containsNull=false)")
        sb.append(sig.getLong(b * rowsPerBand + i))
        i += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  /** Column API entry point. */
  def minhashBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ExpressionUtils.column(
      MinHashBandKeys(ExpressionUtils.expression(sig), bands, rowsPerBand))

  /** |a ∩ b| over two string arrays WITHOUT materializing the
    * intersection — bit-identical to `size(array_intersect(a, b))`
    * including duplicate semantics (distinct elements of `a` also
    * present in `b`; each counted once). The builtin builds the
    * intersection ARRAY (hash set of b + output array of a's matches)
    * only for `size` to throw it away — per candidate pair, in the
    * verify stage of every LSH family member, that allocation is the
    * hot spot once candidates reach corpus scale. Null if either side
    * is null; a null ELEMENT present in both arrays counts once,
    * exactly like the builtin (so the generic `graft_intersect_size`
    * SQL surface is bit-identical for null-containing arrays too, not
    * just under the shingle contract's containsNull=false).
    */
  case class ArrayIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType =
      org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "array_intersect_size"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any =
      intersectSizeOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val cls = "org.apache.spark.sql.graftnative.GraftNative"
        s"${ev.value} = $cls.intersectSizeOf($a, $b);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Static worker for [[ArrayIntersectSize]]: hash set of the SMALLER
    * side, membership-remove from the larger — `remove` counts each
    * distinct common element exactly once (array_intersect's duplicate
    * semantics) without a second "seen" set.
    */
  def intersectSizeOf(a: ArrayData, b: ArrayData): Int = {
    // build the set from the smaller array: |set| memory, one pass each
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, ns * 2))
    // builtin array_intersect matches a null element present in BOTH
    // sides (counted once, like any other distinct value) — track it
    // with a flag instead of poisoning the hash set
    var smallHasNull = false
    var i = 0
    while (i < ns) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var count = 0
    var nullPending = smallHasNull
    val nl = large.numElements()
    var j = 0
    while (j < nl && (!set.isEmpty || nullPending)) {
      if (large.isNullAt(j)) {
        if (nullPending) { count += 1; nullPending = false }
      } else if (set.remove(large.getUTF8String(j))) count += 1
      j += 1
    }
    count
  }

  /** Column API entry point. */
  def arrayIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  // ------------------------------------------------------------------
  // Bounded-buffer list aggregation: the posting-list build of the
  // exact-containment dedup (ops/Dedup.containmentPairsExact).

  /** Mutable aggregation state of [[CollectListCapped]]: the collected
    * values plus a sticky overflow flag. On overflow the values are
    * DROPPED immediately — an over-cap group holds ~zero memory from
    * the moment it crosses the cap, which is the whole point.
    */
  final class CappedListBuffer {
    var overflowed: Boolean = false
    val values: scala.collection.mutable.ArrayBuffer[Any] =
      scala.collection.mutable.ArrayBuffer.empty[Any]
  }

  /** `collect_list` with a hard per-group cap: groups that would exceed
    * `cap` elements evaluate to NULL (and their partially-collected
    * buffer is freed the moment the cap is crossed).
    *
    * Why not `collect_list` + `filter(size(ds) <= cap)`: the builtin
    * materializes EVERY group's full list before the filter can see its
    * size, and a list-typed aggregation buffer cannot spill WITHIN a
    * group — one boilerplate shingle posted by millions of documents
    * (exactly what the cap exists to discard) is one executor
    * aggregation buffer holding millions of entries. This aggregate
    * bounds every buffer at `cap` elements by construction, on the
    * update path and on the merge path (partial aggregation: two
    * under-cap partials whose union exceeds the cap overflow at merge).
    *
    * For groups of ≤ `cap` elements the result is element-for-element
    * what `collect_list` returns under the same evaluation order
    * (nulls skipped, intra-group order nondeterministic as always) —
    * parity is spec-pinned. Over-cap groups return NULL rather than a
    * truncated list, so a caller can both filter them and COUNT them
    * (e.g. via `observe`) — a bound cap is surfaced, never silent.
    */
  case class CollectListCapped(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[CappedListBuffer]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def dataType: DataType =
      ArrayType(child.dataType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "collect_list_capped"

    override def createAggregationBuffer(): CappedListBuffer =
      new CappedListBuffer

    override def update(
        b: CappedListBuffer,
        input: org.apache.spark.sql.catalyst.InternalRow): CappedListBuffer = {
      if (!b.overflowed) {
        val v = child.eval(input)
        if (v != null) {
          if (b.values.length >= cap) {
            b.overflowed = true
            b.values.clear()
          } else {
            // copy: the evaluated value may point into a reused row
            b.values += org.apache.spark.sql.catalyst.InternalRow.copyValue(v)
          }
        }
      }
      b
    }

    override def merge(
        b: CappedListBuffer, other: CappedListBuffer): CappedListBuffer = {
      if (b.overflowed || other.overflowed ||
          b.values.length + other.values.length > cap) {
        b.overflowed = true
        b.values.clear()
      } else {
        b.values ++= other.values
      }
      b
    }

    override def eval(b: CappedListBuffer): Any =
      if (b.overflowed) null else new GenericArrayData(b.values.toArray)

    // serialization between partial and final aggregation: the buffer as
    // one nullable array column (null = overflowed) — the same
    // UnsafeProjection scheme the builtin Collect uses
    private lazy val bufProjection =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
        Array[DataType](ArrayType(child.dataType, containsNull = false)))
    private lazy val bufRow =
      new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)

    override def serialize(b: CappedListBuffer): Array[Byte] = {
      val arr =
        if (b.overflowed) null else new GenericArrayData(b.values.toArray)
      bufProjection.apply(
        org.apache.spark.sql.catalyst.InternalRow.apply(arr)).getBytes()
    }

    override def deserialize(bytes: Array[Byte]): CappedListBuffer = {
      val b = new CappedListBuffer
      bufRow.pointTo(bytes, bytes.length)
      if (bufRow.isNullAt(0)) {
        b.overflowed = true
      } else {
        bufRow.getArray(0).foreach(child.dataType, (_, x: Any) =>
          b.values += org.apache.spark.sql.catalyst.InternalRow.copyValue(x))
      }
      b
    }

    override def withNewMutableAggBufferOffset(
        newOffset: Int): CollectListCapped =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): CollectListCapped =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column API entry point. */
  def collectListCapped(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      CollectListCapped(ExpressionUtils.expression(c), cap)
        .toAggregateExpression())

  // ------------------------------------------------------------------
  // SQL surface: names for the native expressions so a pure-SQL caller
  // (spark.sql, thrift, notebooks) reaches the same codegen'd hot
  // paths as the Column API. Registered at session build via
  // `spark.sql.extensions=graft.plans.GraftExtensions`, or on a live
  // session via [[registerSqlFunctions]] (no restart).

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal => CLiteral}

  private def fnInfo(name: String, usage: String) =
    new ExpressionInfo(getClass.getName, name, usage)

  val sqlFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_float_dot"),
        fnInfo("graft_float_dot",
          "graft_float_dot(a, b) - fused dot product of two float arrays"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_float_dot(a, b)")
          FloatDotProduct(args(0), args(1))
        }),
      (FunctionIdentifier("graft_md5_base28"),
        fnInfo("graft_md5_base28",
          "graft_md5_base28(arr) - 28-bit md5 base hash per string element"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "graft_md5_base28(arr)")
          Md5Base28Array(args(0))
        }),
      (FunctionIdentifier("graft_minhash_signature"),
        fnInfo("graft_minhash_signature",
          "graft_minhash_signature(bases, n) - n-hash minhash signature " +
            "over base-28 hashes"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "graft_minhash_signature(bases, numHashes)")
          val n = args(1) match {
            case CLiteral(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"numHashes must be an integer literal, got $other")
          }
          MinHashSignature(args(0), n)
        }),
      (FunctionIdentifier("graft_shingles"),
        fnInfo("graft_shingles",
          "graft_shingles(text, k) - distinct lowercased whitespace " +
            "k-shingles of a text value"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_shingles(text, k)")
          val k = args(1) match {
            case CLiteral(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"k must be an integer literal, got $other")
          }
          ShingleArray(args(0), k)
        }),
      (FunctionIdentifier("graft_band_keys"),
        fnInfo("graft_band_keys",
          "graft_band_keys(sig, bands, rowsPerBand) - LSH band key " +
            "strings of a minhash signature"),
        (args: Seq[Expression]) => {
          require(args.length == 3,
            "graft_band_keys(sig, bands, rowsPerBand)")
          val ints = args.drop(1).map {
            case CLiteral(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"bands/rowsPerBand must be integer literals, got $other")
          }
          MinHashBandKeys(args(0), ints(0), ints(1))
        }),
      (FunctionIdentifier("graft_intersect_size"),
        fnInfo("graft_intersect_size",
          "graft_intersect_size(a, b) - size(array_intersect(a, b)) " +
            "without materializing the intersection"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_intersect_size(a, b)")
          ArrayIntersectSize(args(0), args(1))
        }))

  /** Imperative registration on a live session — `sessionState` is
    * private[sql], which is why this lives here and not in
    * `graft.plans`.
    */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
