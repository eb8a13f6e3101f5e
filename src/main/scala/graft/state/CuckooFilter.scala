package graft.state

/** Partial-key cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher:
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014) — the
  * north_star's per-partition URL-seen sketch. Approximate-membership with
  * NO false negatives; ~0.1-1% false positives at 16-bit fingerprints;
  * supports deletion (unused here) and, unlike Bloom, merges by relocating
  * fingerprints.
  *
  * Layout: `numBuckets` buckets × 4 slots × 16-bit fingerprints, one bucket
  * per Long. A key's two candidate buckets are i1 = hash and
  * i2 = i1 ^ scramble(fingerprint) — the partial-key property lets any
  * stored (bucket, fp) pair recover its alternate bucket, which is what
  * makes inserts-with-eviction and filter merges possible.
  */
final class CuckooFilter private (
    val numBuckets: Int, // power of two
    val table: Array[Long],
    private var overflowed: Boolean,
    private var count: Long) extends Serializable {

  import CuckooFilter._

  private def mask: Int = numBuckets - 1

  def size: Long = count
  def hasOverflowed: Boolean = overflowed

  private def slot(bucket: Long, s: Int): Int = ((bucket >>> (16 * s)) & 0xffffL).toInt
  private def setSlot(bucket: Long, s: Int, fp: Int): Long =
    (bucket & ~(0xffffL << (16 * s))) | (fp.toLong << (16 * s))

  private def tryInsertAt(i: Int, fp: Int): Boolean = {
    val b = table(i)
    var s = 0
    while (s < 4) {
      if (slot(b, s) == 0) { table(i) = setSlot(b, s, fp); return true }
      s += 1
    }
    false
  }

  private def containsAt(i: Int, fp: Int): Boolean = {
    val b = table(i)
    slot(b, 0) == fp || slot(b, 1) == fp || slot(b, 2) == fp || slot(b, 3) == fp
  }

  /** Insert a 64-bit key hash. Returns false only on table overflow, in
    * which case the filter degrades to always-maybe (no false negatives). */
  def insert(hash: Long): Boolean = {
    val fp = fingerprint(hash)
    val i1 = index1(hash, mask)
    val i2 = altIndex(i1, fp, mask)
    if (containsAt(i1, fp) || containsAt(i2, fp)) return true // idempotent
    count += 1
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) return true
    // evict: random-walk relocation, bounded
    var i = if ((hash & 1L) == 0L) i1 else i2
    var f = fp
    var n = 0
    var rnd = mix(hash)
    while (n < MaxEvictions) {
      val s = (rnd & 3L).toInt
      rnd = mix(rnd)
      val victim = slot(table(i), s)
      table(i) = setSlot(table(i), s, f)
      f = victim
      i = altIndex(i, f, mask)
      if (tryInsertAt(i, f)) return true
      n += 1
    }
    overflowed = true
    false
  }

  def mightContain(hash: Long): Boolean = {
    if (overflowed) return true
    val fp = fingerprint(hash)
    val i1 = index1(hash, mask)
    containsAt(i1, fp) || containsAt(altIndex(i1, fp, mask), fp)
  }

  /** Merge another filter's fingerprints into this one (same size). Each
    * stored (bucket, fp) can be placed at its bucket or the alternate —
    * both are valid homes under partial-key hashing. */
  def merge(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets, "cuckoo merge requires equal sizing")
    if (other.overflowed) overflowed = true
    else {
      var i = 0
      while (i < other.table.length) {
        val b = other.table(i)
        var s = 0
        while (s < 4) {
          val fp = slot(b, s)
          if (fp != 0 && !(containsAt(i, fp) || containsAt(altIndex(i, fp, mask), fp))) {
            count += 1
            if (!(tryInsertAt(i, fp) || tryInsertAt(altIndex(i, fp, mask), fp))) {
              // rare under ≤50% fill; degrade safely rather than evict-loop here
              overflowed = true
            }
          }
          s += 1
        }
        i += 1
      }
    }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 1 + 8 + 8 * table.length)
    bb.putInt(Magic).putInt(numBuckets).put(if (overflowed) 1.toByte else 0.toByte).putLong(count)
    table.foreach(bb.putLong)
    bb.array()
  }
}

object CuckooFilter {
  private final val Magic = 0x43554b46 // "CUKF"
  private final val MaxEvictions = 500

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 16-bit nonzero fingerprint from the high hash bits. */
  @inline private[state] def fingerprint(hash: Long): Int = {
    val fp = ((hash >>> 48) & 0xffffL).toInt
    if (fp == 0) 1 else fp
  }
  @inline private[state] def index1(hash: Long, mask: Int): Int = (hash & mask).toInt
  /** Alternate bucket: i ^ scramble(fp) — involutive, so alt(alt(i)) == i. */
  @inline private[state] def altIndex(i: Int, fp: Int, mask: Int): Int =
    i ^ (mix(fp.toLong).toInt & mask)

  /** Size for `capacity` keys at ≤ ~95% fill of 4-slot buckets. */
  def create(capacity: Long): CuckooFilter = {
    val needed = math.max(1L, math.ceil(capacity / 4.0 / 0.84).toLong)
    var n = 1
    while (n < needed && n < (1 << 28)) n <<= 1
    new CuckooFilter(n, new Array[Long](n), false, 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "not a cuckoo filter blob")
    val n = bb.getInt()
    val overflowed = bb.get() == 1
    val count = bb.getLong()
    val table = new Array[Long](n)
    var i = 0
    while (i < n) { table(i) = bb.getLong(); i += 1 }
    new CuckooFilter(n, table, overflowed, count)
  }
}
