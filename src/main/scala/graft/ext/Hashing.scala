package graft.ext

/** Deterministic 64-bit mixing used to derive hash families (MinHash
  * permutations, LSH hyperplane signs) from a base hash. Splitmix64
  * finalizer over `a ^ (b * GOLDEN)` — wraparound Java long arithmetic,
  * replicable in any engine with 128-bit integers as mod-2^64 unsigned
  * arithmetic (see the DuckDB oracles in [[ExtQueries]]).
  */
object Hashing {
  def mix64(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit SimHash over a string array (FNV-1a base hash, majority vote
    * per bit, ties -> 0). One compiled loop per document — semantically the
    * per-bit ±1 vote aggregation, without exploding shingles into rows.
    * Null elements are skipped (the functions are user-facing via
    * spark.sql.extensions, so `graft_simhash64(array('a', NULL))` must not
    * throw): a null shingle contributes no vote.
    */
  def simhash64(shingles: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = TextAnalysis.fnv1a64Bytes(shingles.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Winnowing fingerprints in one compiled pass: FNV hash of every k-char
    * gram (shorter tail grams hash their remaining chars, exactly like
    * `substring(text, i+1, k)`), sliding w-window minima, first-occurrence
    * dedup. ASCII fast path hashes byte windows in place; non-ASCII falls
    * back to per-gram char substrings.
    */
  def winnow(
      text: org.apache.spark.unsafe.types.UTF8String,
      k: Int,
      w: Int
  ): org.apache.spark.sql.catalyst.util.ArrayData = {
    val nChars = text.numChars()
    val nGrams = math.max(nChars - k, 0) + 1
    val hs = new Array[Long](nGrams)
    if (text.numBytes() == nChars) {
      val b = text.getBytes
      var i = 0
      while (i < nGrams) {
        var h = 0xcbf29ce484222325L
        val end = math.min(i + k, nChars)
        var j = i
        while (j < end) { h ^= (b(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
        hs(i) = h
        i += 1
      }
    } else {
      var i = 0
      while (i < nGrams) {
        hs(i) = TextAnalysis.fnv1a64Bytes(text.substringSQL(i + 1, k).getBytes)
        i += 1
      }
    }
    val nWins = math.max(nGrams - w, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWins) {
      var m = Long.MaxValue
      val end = math.min(j + w, nGrams)
      var t = j
      while (t < end) { if (hs(t) < m) m = hs(t); t += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** FNV-1a 64 of the n-word shingle `ws[start..start+n)` joined by a
    * single space — hashed straight from the word bytes, no shingle string
    * ever allocated. Null words contribute nothing, including their
    * separator (matching `concat_ws(' ', slice(...))`). Tail shingles
    * shorter than n hash their remaining words, exactly like `slice`.
    */
  private def shingleFnv(
      ws: org.apache.spark.sql.catalyst.util.ArrayData, start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    val end = math.min(start + n, ws.numElements())
    var first = true
    var j = start
    while (j < end) {
      if (!ws.isNullAt(j)) {
        if (!first) { h ^= 0x20L; h *= 0x100000001b3L }
        first = false
        val bytes = ws.getUTF8String(j).getBytes
        var b = 0
        while (b < bytes.length) { h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1 }
      }
      j += 1
    }
    h
  }

  /** Number of n-shingles the HOF form emits: max(size - n, 0) + 1 —
    * including the single short shingle of an under-length document.
    */
  private def shingleCount(size: Int, n: Int): Int = math.max(size - n, 0) + 1

  /** Fused shingle->MinHash: signature element k = min over n-word shingles
    * of mix64(shingleFnv, k). Identical to `minhashSig(shingles(ws, n))` —
    * min is unaffected by duplicate shingles, so no dedup pass is needed —
    * but one compiled loop from the word array, no shingle strings.
    */
  def shingleMinhash(
      ws: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int,
      numHashes: Int
  ): org.apache.spark.sql.catalyst.util.ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val cnt = shingleCount(ws.numElements(), n)
    var i = 0
    while (i < cnt) {
      val h = shingleFnv(ws, i, n)
      var k = 0
      while (k < numHashes) {
        val m = mix64(h, k.toLong)
        if (m < mins(k)) mins(k) = m
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Fused shingle->SimHash: per-bit majority vote over the DISTINCT n-word
    * shingles (the HOF form dedupes shingle strings; here duplicates are
    * dropped by hash — equivalent unless two distinct shingles of one
    * document collide in FNV-64, a ~2^-64-per-pair event the oracle would
    * surface).
    */
  def shingleSimhash64(
      ws: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    val cnt = shingleCount(ws.numElements(), n)
    var i = 0
    while (i < cnt) {
      val h = shingleFnv(ws, i, n)
      if (seen.add(h)) {
        var j = 0
        while (j < 64) {
          votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** MinHash signature over a string array: element i is
    * min over shingles of mix64(fnv1a64(shingle), i). Same family as the
    * aggregated form (min is order-independent), one compiled loop per
    * document. Null elements are skipped, like [[simhash64]].
    */
  def minhashSig(
      shingles: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int
  ): org.apache.spark.sql.catalyst.util.ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = TextAnalysis.fnv1a64Bytes(shingles.getUTF8String(i).getBytes)
        var k = 0
        while (k < numHashes) {
          val m = mix64(h, k.toLong)
          if (m < mins(k)) mins(k) = m
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Morton (Z-order) interleave: bit `i` of dimension `d` lands at output
    * bit `i * n + d`, using the low `bits` bits of each of the `n` input
    * keys. The standard multi-dimensional clustering value for file-level
    * data skipping: sorting/range-partitioning a 100 TB table by this value
    * keeps EVERY dimension's min/max tight per file, so predicates on any
    * key prune, not just the leading sort key. Null elements contribute
    * zero bits (chunk keys are null-free by the attach-time contract);
    * `n * bits` must fit a signed long.
    */
  def zorder(keys: org.apache.spark.sql.catalyst.util.ArrayData, bits: Int): Long = {
    val n = keys.numElements()
    require(n * bits <= 63, s"zorder needs n*bits <= 63, got n=$n bits=$bits")
    var z = 0L
    var d = 0
    while (d < n) {
      val v = if (keys.isNullAt(d)) 0L else keys.getLong(d)
      var i = 0
      while (i < bits) {
        z |= ((v >>> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    z
  }
}
