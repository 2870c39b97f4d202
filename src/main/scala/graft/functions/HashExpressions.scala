package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-loop implementations for the sketch/vector kernels.
  *
  * The composable higher-order-function versions (aggregate/zip_with/
  * transform in Dedup/VectorFunctions) are semantically clear but
  * allocate an array per element per step — measured 40s/33s/16s for
  * simhash / minhash-LSH / cosine-dedup at sf0.1. These static helpers
  * run the same math as a single tight Java loop; the Expressions below
  * inline a call to them inside whole-stage codegen. 10-100× on the
  * three heaviest operators.
  *
  * Hash = Spark's own XXH64 (seed 42 matches the SQL `xxhash64`);
  * per-seed MinHash permutations derive from one base hash with an
  * avalanche mix — one string hash per shingle regardless of k.
  */
object GraftKernels {
  final val SEED = 42L

  // splitmix64 finalizer — full avalanche, cheap. Public because the
  // DuckDB oracle builder replays the per-slot constants mix64(s).
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** NFC Unicode normalization with an all-ASCII fast path: ASCII
    * bytes are NFC-invariant, so the common crawl-text case never
    * pays the String round-trip; only rows carrying non-ASCII go
    * through java.text.Normalizer (the JDK's ICU-derived tables —
    * pure JVM, no library).
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  /** 64-bit SimHash over a string array (distinct-ness is the caller's
    * choice): each element's hash votes ±1 per bit.
    */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashString(arr.getUTF8String(i), SEED)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** k-minima MinHash signature: one XXH64 per element, k derived
    * hashes via splitmix of (base ^ mix(seed_i)).
    */
  def minhash(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = hashString(arr.getUTF8String(i), SEED)
        var s = 0
        while (s < k) {
          val h = mix64(base ^ mix64(s.toLong))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    mins
  }

  /** b-bit minhash compression (Li & König 2010): keep only the low
    * `b` bits of each signature lane, packed little-endian into 64-bit
    * words — k·b bits per document instead of 64·k. `b` must divide 64
    * and k must be a multiple of 64/b so words pack exactly (callers
    * assert; k=32, b=4 → 2 words vs 32).
    */
  def bbitPack(sig: ArrayData, b: Int): Array[Long] = {
    val lanesPerWord = 64 / b
    val k = sig.numElements()
    // exact packing is a correctness precondition, not a convenience:
    // zero-padded trailing lanes would count as MATCHES in bbitMatches
    // (both sides pad with zeros), biasing the estimator upward
    require(k % lanesPerWord == 0,
      s"signature length $k must be a multiple of ${64 / b} lanes (b=$b)")
    val words = new Array[Long](k / lanesPerWord)
    val mask = (1L << b) - 1L
    var s = 0
    while (s < k) {
      val lane = sig.getLong(s) & mask
      words(s / lanesPerWord) |= lane << ((s % lanesPerWord) * b)
      s += 1
    }
    words
  }

  /** Count equal b-bit lanes between two packed signatures (the
    * collision count behind the Li–König estimator).
    */
  def bbitMatches(a: ArrayData, other: ArrayData, b: Int): Int = {
    val lanesPerWord = 64 / b
    val mask = (1L << b) - 1L
    val n = math.min(a.numElements(), other.numElements())
    var cnt = 0
    var w = 0
    while (w < n) {
      var x = a.getLong(w) ^ other.getLong(w)
      var l = 0
      while (l < lanesPerWord) {
        if ((x & mask) == 0L) cnt += 1
        x = x >>> b
        l += 1
      }
      w += 1
    }
    cnt
  }

  /** ICWS weighted minhash (Ioffe 2010): consistent weighted sampling
    * for the weighted Jaccard Σmin(tfₐ,tf_b)/Σmax(tfₐ,tf_b) — the
    * tf-weighted upgrade over [[minhash]]'s set semantics. Per token
    * and sample, five uniforms derive from splitmix64 of the token's
    * ONE string hash (the [[minhash]] economics): r, c ~ Gamma(2,1)
    * as −ln(u·u), β ~ U(0,1); t = ⌊ln w/r + β⌋, ln a = ln c − r(t−β)
    * − r; the sample's value identifies the argmin (token, t) pair.
    * P(valueₐ = value_b) = J_w exactly (the paper's theorem).
    *
    * Determinism across engines: draws are integer-derived (bit
    * exact); ln a rounds to 6 dp before the argmin with the SORTED
    * token order breaking ties — the perplexity_filter rank-on-
    * rounded discipline. Tokens iterate in UTF8 binary order.
    */
  def weightedMinhash(arr: ArrayData, k: Int): Array[Long] = {
    val tf = new java.util.TreeMap[UTF8String, Integer]()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = tf.get(s)
        tf.put(s, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    val out = new Array[Long](k)
    val best = Array.fill(k)(Double.PositiveInfinity)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val base = hashString(e.getKey, SEED)
      val lnw = math.log(e.getValue.doubleValue())
      var s = 0
      while (s < k) {
        def u(j: Int): Double =
          ((mix64(base ^ mix64((s * 5 + j).toLong)) >>> 11).toDouble + 0.5) /
            9007199254740992.0
        val r = -math.log(u(0) * u(1))
        val lnc = math.log(-math.log(u(2) * u(3)))
        val beta = u(4)
        val t = math.floor(lnw / r + beta)
        val lna0 = lnc - r * (t - beta) - r
        // round half away from zero to 6 dp (DuckDB round semantics)
        val lna = math.signum(lna0) *
          math.floor(math.abs(lna0) * 1e6 + 0.5) / 1e6
        if (lna < best(s)) { // strict <: sorted-token first-win tiebreak
          best(s) = lna
          out(s) = mix64(base ^ mix64(t.toLong))
        }
        s += 1
      }
    }
    out
  }

  /** Cosine similarity of two float vectors, accumulated in double
    * (index order — same result as the HOF left-fold it replaces).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Index of the nearest centroid by squared L2 (IVF coarse
    * quantizer). Ties break to the lower index.
    */
  def nearestCentroid(vec: ArrayData, centroids: ArrayData): Int = {
    val k = centroids.numElements()
    val d = vec.numElements()
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < k) {
      val cent = centroids.getArray(c)
      var dist = 0.0
      var i = 0
      val n = math.min(d, cent.numElements())
      while (i < n) {
        val diff = vec.getFloat(i).toDouble - cent.getFloat(i).toDouble
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  /** Rolling 64-bit hash of EVERY `len`-codepoint window of `s` —
    * O(n) total where the substring-then-hash alternative is O(n·len)
    * and materializes n gram strings. The hash only NOMINATES
    * (SuffixDedup exact-verifies survivors on the real substrings),
    * so collision rate is all that matters, not cross-engine
    * portability; the splitmix64 finalizer decorrelates the
    * polynomial structure without breaking the O(1) roll.
    */
  def charWindowHashes(s: UTF8String, len: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < len)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0
    var i = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    val B = 0x9E3779B97F4A7C15L | 1L
    var pow = 1L
    i = 0
    while (i < len - 1) { pow *= B; i += 1 }
    val out = new Array[Long](n - len + 1)
    var h = 0L
    i = 0
    while (i < len) { h = h * B + cps(i); i += 1 }
    out(0) = mix64(h)
    i = len
    while (i < n) {
      h = (h - cps(i - len) * pow) * B + cps(i)
      out(i - len + 1) = mix64(h)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Rebuild `s` dropping every codepoint covered by a `len`-codepoint
    * window starting at any of `starts` (1-based codepoint positions,
    * any order, duplicates fine) — the single-pass kernel behind
    * SuffixDedup's positional rewrite. Exactly equivalent to
    * "filter positions 1..n by membership in ∪[p, p+len−1], then
    * concatenate the survivors", which the HOF formulation paid
    * O(n·|cov|) array_contains probes and n one-char substrings for.
    */
  def stripCoveredWindows(s: UTF8String, starts: ArrayData,
                          len: Int): UTF8String = {
    val m = starts.numElements()
    if (m == 0) return s
    val str = s.toString
    val nChars = str.length
    // cover flags over UTF-16 char indices, walked in codepoint steps
    val n = str.codePointCount(0, nChars)
    val cover = new Array[Boolean](n)
    var k = 0
    while (k < m) {
      val p0 = starts.getInt(k) - 1 // 0-based first covered codepoint
      var i = p0
      val end = math.min(p0 + len, n)
      while (i < end) { cover(i) = true; i += 1 }
      k += 1
    }
    val sb = new java.lang.StringBuilder(nChars)
    var ci = 0
    var cp = 0
    while (ci < nChars) {
      val c = str.codePointAt(ci)
      if (!cover(cp)) sb.appendCodePoint(c)
      cp += 1
      ci += Character.charCount(c)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Array twin of [[stripCoveredWindows]]: drop every element of
    * `toks` whose 0-based position is covered by an `n`-position
    * window starting at any of `starts` (0-based, any order,
    * duplicates fine). Returns the kept elements in order — replaces
    * the O(|toks|·|cov|) `filter(toks, (x,i) => !array_contains(...))`
    * HOF probe with one boolean-mask pass.
    */
  def stripCoveredPositions(toks: ArrayData, starts: ArrayData,
                            n: Int): ArrayData = {
    val m = starts.numElements()
    if (m == 0) return toks
    val len = toks.numElements()
    val cover = new Array[Boolean](len)
    var k = 0
    while (k < m) {
      var i = starts.getInt(k)
      val end = math.min(i + n, len)
      while (i < end) { cover(i) = true; i += 1 }
      k += 1
    }
    var kept = 0
    var i = 0
    while (i < len) { if (!cover(i)) kept += 1; i += 1 }
    val out = new Array[Any](kept)
    var o = 0
    i = 0
    while (i < len) {
      if (!cover(i)) {
        out(o) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def cpHashSkip(cps: Array[Int], skip1: Int, skip2: Int): Long = {
    var h = SEED
    var i = 0
    while (i < cps.length) {
      if (i != skip1 && i != skip2)
        h = mix64(h ^ (cps(i) * 0x9E3779B97F4A7C15L + 0xA5A5L))
      i += 1
    }
    h
  }

  /** Hashes of the ≤`maxDeletes`-deletion neighborhood of `s` (the
    * string itself plus every variant reachable by deleting 1..d
    * codepoints), deduplicated — the FastSS blocking set of
    * FuzzyJoin, without materializing a single variant string. The
    * HOF formulation (`transform(sequence...)` + substr concats +
    * `array_distinct`) was CodegenFallback and allocated |s|+1
    * strings per row; this emits one chained-mix hash per variant in
    * a tight loop. Any deterministic hash preserves blocking
    * COMPLETENESS (equal variant strings ⇒ equal hashes, so every
    * pair the string join found, the hash join finds); collisions
    * can only ADD candidates, which the exact levenshtein verify
    * removes — the same argument the old `xxhash64(variant)` rode.
    */
  def deletionHashes(s: UTF8String, maxDeletes: Int): ArrayData = {
    val str = s.toString
    val m = str.length
    val cps = new Array[Int](str.codePointCount(0, m))
    var ci = 0
    var k = 0
    while (ci < m) {
      val c = str.codePointAt(ci); cps(k) = c; k += 1
      ci += Character.charCount(c)
    }
    val n = cps.length
    val total = 1 + n + (if (maxDeletes >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](total)
    var o = 0
    out(o) = cpHashSkip(cps, -1, -1); o += 1
    var i = 0
    while (i < n) { out(o) = cpHashSkip(cps, i, -1); o += 1; i += 1 }
    if (maxDeletes >= 2) {
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { out(o) = cpHashSkip(cps, i, j); o += 1; j += 1 }
        i += 1
      }
    }
    // dedup (the HOF formulation array_distinct'd the variant strings;
    // hash-level dedup is completeness-safe — the hash VALUE is what
    // joins, so merging equal hashes never loses a match)
    java.util.Arrays.sort(out)
    var distinct = if (total > 0) 1 else 0
    i = 1
    while (i < total) { if (out(i) != out(i - 1)) distinct += 1; i += 1 }
    val res = new Array[Any](distinct)
    var r = 0
    i = 0
    while (i < total) {
      if (i == 0 || out(i) != out(i - 1)) { res(r) = out(i); r += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  /** Luhn mod-10 sum of an ASCII digit string — positions counted
    * from the RIGHT, every 2nd digit doubled (−9 above 9); the exact
    * integer the `aggregate(sequence(...))` HOF in
    * TextFunctions.luhnSum computes, as one tight loop. */
  def luhnSum(s: UTF8String): Int = {
    val str = s.toString
    var sum = 0
    var idx = str.length - 1
    var pos = 1
    while (idx >= 0) {
      val d = str.charAt(idx) - '0'
      sum += (if (pos % 2 == 0) { val dd = d * 2; if (dd > 9) dd - 9 else dd }
              else d)
      idx -= 1
      pos += 1
    }
    sum
  }

  /** Single-pass Luhn candidate scan + redaction. Exactly equivalent
    * to the HOF chain it replaces (TextQueries.textRedactLuhn):
    * `regexp_extract_all(s, '[0-9]{13,16}', 0)` (greedy,
    * non-overlapping, ASCII digits — a digit run of length L yields
    * ⌊…⌋ successive 16-digit matches while ≥16 remain, then one
    * final 13–15 match if the remainder allows, exactly the
    * backtracking-free greedy scan), `filter(c => luhnSum(c)%10==0)`
    * (sum from the rightmost digit, doubling every 2nd position,
    * −9 above 9), and the sequential
    * `aggregate(valid, s, (txt,c) => replace(txt, c, '<CC>'))` fold
    * (each valid candidate replace-ALL-occurrences, in match order,
    * against the accumulated string). The HOF chain was
    * CodegenFallback and evaluated the candidate array three times
    * (size, filter, fold); this is one pass plus K tiny loops.
    *
    * @return struct(n_candidates int, n_valid int, redacted string)
    */
  def luhnRedact(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val n = str.length
    val cands = new scala.collection.mutable.ArrayBuffer[String](2)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i + 1
        while (j < n && { val d = str.charAt(j); d >= '0' && d <= '9' }) j += 1
        var p = i
        while (j - p >= 13) {
          val take = if (j - p >= 16) 16 else j - p
          cands += str.substring(p, p + take)
          p += take
        }
        i = j
      } else i += 1
    }
    var nValid = 0
    var out = str
    var k = 0
    while (k < cands.length) {
      val cand = cands(k)
      if (luhnSum(UTF8String.fromString(cand)) % 10 == 0) {
        nValid += 1
        out = out.replace(cand, "<CC>")
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cands.length, nValid, UTF8String.fromString(out)))
  }

  /** Asymmetric distance computation for product-quantized codes:
    * squared L2 between a raw query vector and a PQ-coded corpus
    * vector, read off the flattened codebooks
    * (layout: `flat((j·ksub + c)·ds + i)` = centroid i-th dim of code
    * c in subspace j). Index-order double fold per subspace, subspaces
    * summed in order — deterministic, mirrorable.
    */
  def pqAdc(q: ArrayData, codes: ArrayData, flat: Array[Float],
            ksub: Int, ds: Int): Double = {
    val m = codes.numElements()
    var sum = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getByte(j).toInt & 0xFF
      val base = (j * ksub + c) * ds
      val qbase = j * ds
      var i = 0
      while (i < ds) {
        val d = q.getFloat(qbase + i).toDouble - flat(base + i).toDouble
        sum += d * d
        i += 1
      }
      j += 1
    }
    sum
  }

  /** One PCA component: `Σ_i (v_i − mean_i)·axis_i` folded in index
    * order, then / div (√eigenvalue when whitening, 1.0 otherwise —
    * x/1.0 is the bitwise identity). Exactly the HOF
    * transform/zip_with/aggregate fold, as a codegen kernel.
    */
  def vecProject(v: ArrayData, mean: Array[Double], axis: Array[Double],
                 div: Double): Double = {
    var acc = 0.0
    var i = 0
    val n = mean.length
    while (i < n) {
      acc += (v.getFloat(i).toDouble - mean(i)) * axis(i)
      i += 1
    }
    acc / div
  }

  /** Random-hyperplane LSH bucket (see VectorFunctions.hyperplaneBucket
    * for the HOF twin): plane p dim i sign = bit of xxhash64(p, i).
    */
  def hyperplaneBucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        // sign convention matches the SQL xxhash64(p, i) chain:
        // hash long p with seed 42, then long i with that result
        val hp = XXH64.hashLong(p.toLong, SEED)
        val h = XXH64.hashLong(i.toLong, hp)
        val x = v.getFloat(i).toDouble
        proj += (if ((h & 1L) == 1L) x else -x)
        i += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** SimHash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(GraftKernels.simhash(v.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** MinHashSig(array<string>, k) → array<long> of the k minima. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string> and k>0, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GraftKernels.minhash(v.asInstanceOf[ArrayData], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.GraftKernels.minhash($c, $k))")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** WeightedMinHashSig(array<string>, k) → array<long> ICWS samples. */
case class WeightedMinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"weighted_minhash_sig needs array<string> and k>0, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GraftKernels.weightedMinhash(v.asInstanceOf[ArrayData], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.GraftKernels.weightedMinhash($c, $k))")
  override protected def withNewChildInternal(newChild: Expression): WeightedMinHashSig =
    copy(child = newChild)
  override def prettyName: String = "weighted_minhash_sig"
}

/** BbitPack(array<long>, b) → array<long>: b-bit minhash compression. */
case class BbitPack(child: Expression, b: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if b > 0 && b < 64 && 64 % b == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bbit_pack needs array<long> and b in {1,2,4,8,16,32}, got $t / b=$b")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GraftKernels.bbitPack(v.asInstanceOf[ArrayData], b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.GraftKernels.bbitPack($c, $b))")
  override protected def withNewChildInternal(newChild: Expression): BbitPack =
    copy(child = newChild)
  override def prettyName: String = "bbit_pack"
}

/** BbitMatches(array<long>, array<long>, b) → int: equal-lane count. */
case class BbitMatches(left: Expression, right: Expression, b: Int)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _))
      if b > 0 && b < 64 && 64 % b == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bbit_matches needs two array<long> and b in {1,2,4,8,16,32}, got $t / b=$b")
  }
  override def nullSafeEval(a: Any, o: Any): Any =
    java.lang.Integer.valueOf(GraftKernels.bbitMatches(
      a.asInstanceOf[ArrayData], o.asInstanceOf[ArrayData], b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, o) =>
      s"graft.functions.GraftKernels.bbitMatches($a, $o, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BbitMatches =
    copy(left = l, right = r)
  override def prettyName: String = "bbit_matches"
}

/** VecCosine(array<float>, array<float>) → double. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_cosine needs two array<float>, got $t")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(GraftKernels.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** HyperplaneBucket(array<float>, planes) → long. */
case class HyperplaneBucketExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes > 0 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket needs array<float> and 0<planes<64, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(GraftKernels.hyperplaneBucket(
      v.asInstanceOf[ArrayData], planes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.hyperplaneBucket($c, $planes)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

/** CharWindowHashes(string, len) → array<long>: one rolling hash per
  * len-codepoint window (see GraftKernels.charWindowHashes).
  */
case class CharWindowHashes(child: Expression, len: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if len > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_window_hashes needs string and len>0, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    GraftKernels.charWindowHashes(v.asInstanceOf[UTF8String], len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.charWindowHashes($c, $len)")
  override protected def withNewChildInternal(newChild: Expression): CharWindowHashes =
    copy(child = newChild)
  override def prettyName: String = "char_window_hashes"
}

/** StripCoveredWindows(string, array<int> starts, len) → string with
  * every `len`-codepoint window at the (1-based) start positions
  * removed (see GraftKernels.stripCoveredWindows).
  */
case class StripCoveredWindows(left: Expression, right: Expression, len: Int)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) if len > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"strip_covered_windows needs (string, array<int>) and len>0, got $t")
    }
  override def nullSafeEval(s: Any, starts: Any): Any =
    GraftKernels.stripCoveredWindows(
      s.asInstanceOf[UTF8String], starts.asInstanceOf[ArrayData], len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"graft.functions.GraftKernels.stripCoveredWindows($s, $p, $len)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StripCoveredWindows =
    copy(left = l, right = r)
  override def prettyName: String = "strip_covered_windows"
}

/** StripCoveredPositions(array<string>, array<int> starts, n) →
  * array<string> with every `n`-position window at the (0-based)
  * start positions removed (see GraftKernels.stripCoveredPositions).
  */
case class StripCoveredPositions(left: Expression, right: Expression, n: Int)
  extends BinaryExpression {
  override def dataType: DataType = left.dataType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if n > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"strip_covered_positions needs (array<string>, array<int>) and n>0, got $t")
    }
  override def nullSafeEval(toks: Any, starts: Any): Any =
    GraftKernels.stripCoveredPositions(
      toks.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.GraftKernels.stripCoveredPositions($t, $p, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StripCoveredPositions =
    copy(left = l, right = r)
  override def prettyName: String = "strip_covered_positions"
}

/** PqAdc(array<float> query, array<tinyint> codes) → double squared-L2
  * via the flattened PQ codebooks. The codebooks ship with the
  * serialized plan through `ctx.addReferenceObj` (NOT a static
  * registry — executors on a real cluster only see plan references).
  */
case class PqAdc(left: Expression, right: Expression,
                 flat: Array[Float], ksub: Int, ds: Int)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<float>, array<tinyint>), got $t")
    }
  override def nullSafeEval(q: Any, codes: Any): Any =
    java.lang.Double.valueOf(GraftKernels.pqAdc(
      q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], flat, ksub, ds))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", flat, "float[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftKernels.pqAdc($a, $b, $ref, $ksub, $ds)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

/** VecProject(array<float> vec) → double PCA component via the
  * plan-shipped mean/axis (`ctx.addReferenceObj`, the PqAdc
  * discipline). One instance per component; whitening folds into
  * `div`. HOFs (transform/zip_with/aggregate) are CodegenFallback, so
  * the hot-path projection runs through this kernel instead — the
  * same lesson the greedy tokenizer learned (SURVEY round 6).
  */
case class VecProject(child: Expression, mean: Array[Double],
                      axis: Array[Double], div: Double)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_project needs array<float>, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(GraftKernels.vecProject(
      v.asInstanceOf[ArrayData], mean, axis, div))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val aRef = ctx.addReferenceObj("pcaAxis", axis, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.vecProject($c, $mRef, $aRef, $div)")
  }
  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
  override def prettyName: String = "vec_project"
}


/** NfcNorm(string) → NFC-normalized string (D85): the canonical form
  * under which composed (U+00E9) and decomposed (U+0065 U+0301)
  * spellings hash identically — byte-exact dedup misses these.
  */
case class NfcNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_norm needs string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    GraftKernels.nfcNormalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNorm =
    copy(child = newChild)
  override def prettyName: String = "nfc_norm"
}

/** DeletionHashes(string, d) → array<long> — hashes of the
  * ≤d-deletion neighborhood (see GraftKernels.deletionHashes).
  */
case class DeletionHashes(child: Expression, maxDeletes: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if maxDeletes >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deletion_hashes needs string and d>=1, got $t / $maxDeletes")
  }
  override def nullSafeEval(v: Any): Any =
    GraftKernels.deletionHashes(v.asInstanceOf[UTF8String], maxDeletes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.deletionHashes($c, $maxDeletes)")
  override protected def withNewChildInternal(newChild: Expression): DeletionHashes =
    copy(child = newChild)
  override def prettyName: String = "deletion_hashes"
}

/** LuhnSum(string) → int — see GraftKernels.luhnSum. */
case class LuhnSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"luhn_sum needs string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    GraftKernels.luhnSum(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.luhnSum($c)")
  override protected def withNewChildInternal(newChild: Expression): LuhnSum =
    copy(child = newChild)
  override def prettyName: String = "luhn_sum"
}

/** LuhnRedact(string) → struct(n_candidates int, n_valid int,
  * redacted string) — see GraftKernels.luhnRedact.
  */
case class LuhnRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_candidates", IntegerType, nullable = false),
    StructField("n_valid", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"luhn_redact needs string, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    GraftKernels.luhnRedact(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.luhnRedact($c)")
  override protected def withNewChildInternal(newChild: Expression): LuhnRedact =
    copy(child = newChild)
  override def prettyName: String = "luhn_redact"
}

/** Column-API entry points for the kernel expressions. */
object GraftFunctions {
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def nfc_norm(c: Column): Column =
    ColumnBridge.column(NfcNorm(ColumnBridge.expression(c)))
  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
  def weighted_minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(WeightedMinHashSig(ColumnBridge.expression(c), k))
  def bbit_pack(c: Column, b: Int): Column =
    ColumnBridge.column(BbitPack(ColumnBridge.expression(c), b))
  def bbit_matches(a: Column, o: Column, b: Int): Column =
    ColumnBridge.column(BbitMatches(ColumnBridge.expression(a),
      ColumnBridge.expression(o), b))
  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hyperplane_bucket(v: Column, planes: Int): Column =
    ColumnBridge.column(HyperplaneBucketExpr(ColumnBridge.expression(v), planes))
  def char_window_hashes(c: Column, len: Int): Column =
    ColumnBridge.column(CharWindowHashes(ColumnBridge.expression(c), len))
  def strip_covered_windows(s: Column, starts: Column, len: Int): Column =
    ColumnBridge.column(StripCoveredWindows(ColumnBridge.expression(s),
      ColumnBridge.expression(starts), len))
  def strip_covered_positions(toks: Column, starts: Column, n: Int): Column =
    ColumnBridge.column(StripCoveredPositions(ColumnBridge.expression(toks),
      ColumnBridge.expression(starts), n))
  def pq_adc(q: Column, codes: Column, flat: Array[Float],
             ksub: Int, ds: Int): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), flat, ksub, ds))
  def vec_project(v: Column, mean: Array[Double], axis: Array[Double],
                  div: Double): Column =
    ColumnBridge.column(VecProject(ColumnBridge.expression(v),
      mean, axis, div))
  def luhn_redact(c: Column): Column =
    ColumnBridge.column(LuhnRedact(ColumnBridge.expression(c)))
  def luhn_sum(c: Column): Column =
    ColumnBridge.column(LuhnSum(ColumnBridge.expression(c)))
  def deletion_hashes(c: Column, maxDeletes: Int): Column =
    ColumnBridge.column(DeletionHashes(ColumnBridge.expression(c), maxDeletes))
}
