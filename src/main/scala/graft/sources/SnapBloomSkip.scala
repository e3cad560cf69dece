package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-level BLOOM file skipping — point lookups on columns the
  * table is NOT clustered by.
  *
  * Min/max boxes prune range predicates on the columns files are
  * sorted or z-ordered by; a high-cardinality UNORDERED column (a
  * document id, a user hash, a tag) has full-width boxes in every
  * file and a point lookup degenerates to a full scan. A table that
  * declares `bloomCols` records one small bloom sidecar per (file,
  * column) at write time — every value's xxhash64 inserted — and the
  * scan probes the candidates' sidecars for EqualTo/IN literals:
  * a file whose bloom rejects the hash PROVABLY holds no matching
  * row (blooms have no false negatives) and is pruned before any
  * footer is opened. False positives only cost an extra file read;
  * the filters stay residual, so results are exact. At 100 TB this
  * turns "find document X" from a million-file scan into the handful
  * of files whose sketches admit it — Iceberg/Delta ship the same
  * idea as parquet-level bloom columns, here lifted to the manifest
  * tier where it prunes file OPENS, not just row groups.
  *
  * Sidecars live under `root/bloom/<uuid>/` (one dir per commit, like
  * DV sidecars), are immutable, referenced by the manifest's
  * `bloom=` field, and vacuum like data files. Hashing is Catalyst's
  * XxHash64 (seed 42) of the column's internal representation — the
  * exact pairing the write-side [[graft.ops.BloomPrune.bloomAgg]]
  * (Scala commits) and the inline DSv2 writer both insert, so one
  * probe serves files from either write path.
  */
object SnapBloomSkip {
  /** Catalyst XxHash64's default seed — both insert and probe. */
  val Seed = 42L

  /** Expected distinct values per file sketch; with fpp 0.03 the
    * sidecar is ~18 KB. Files with more distinct values degrade
    * toward "never prunes", never toward wrong.
    */
  def items: Long =
    sys.props.get("graft.snap.bloomItems").map(_.toLong).getOrElse(20000L)
  def fpp: Double = 0.03
  def numBits: Long =
    org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp)

  /** Driver-side sidecar cache (immutable files, LRU-capped). */
  private val MaxEntries = 128
  private val cache = new java.util.LinkedHashMap[String,
      org.apache.spark.util.sketch.BloomFilter](32, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String,
        org.apache.spark.util.sketch.BloomFilter]): Boolean =
      size() > MaxEntries
  }

  /** PROBE counters (probes, not loads — cache-independent, so gates
    * can assert on them as data): per-FILE sidecar probes vs
    * per-COMMIT aggregate probes. The two-tier contract a 100 TB
    * table needs is "file probes ≤ files in admitted commits":
    * planning I/O on a point-lookup MISS is O(commits), never
    * O(live files).
    */
  val fileProbes = new java.util.concurrent.atomic.AtomicLong(0L)
  val aggProbes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Actual sidecar READS (cache misses) — the I/O the two-tier
    * design bounds: per-FILE loads vs per-COMMIT aggregate loads.
    */
  val fileLoads = new java.util.concurrent.atomic.AtomicLong(0L)
  val aggLoads = new java.util.concurrent.atomic.AtomicLong(0L)

  private def load(path: String)
      : org.apache.spark.util.sketch.BloomFilter = {
    cache.synchronized {
      val hit = cache.get(path)
      if (hit != null) return hit
    }
    val name = path.substring(path.lastIndexOf('/') + 1)
    (if (name.startsWith("_agg.")) aggLoads else fileLoads)
      .incrementAndGet()
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      graft.io.SnapIo.readBytes(path))
    cache.synchronized { cache.put(path, bf) }
    bf
  }

  /** Might the file's sidecar contain a value hashing to `h`? An
    * unreadable sidecar answers true (cannot prune — never wrong).
    */
  def mightContain(sidecarPath: String, h: Long): Boolean = {
    fileProbes.incrementAndGet()
    try load(sidecarPath).mightContainLong(h)
    catch { case _: Exception => true }
  }

  /** COMMIT-AGGREGATE sidecar: every commit that writes per-file
    * bloom sidecars into `root/bloom/<uuid>/` also writes ONE
    * `_agg.<col>.bf` there — the bitwise union of the commit's
    * per-file sketches. Planning probes the aggregate FIRST: a
    * rejecting union proves NO file of the commit holds the value
    * (unions keep the no-false-negative guarantee), so the whole
    * commit's candidates drop without a single per-file sidecar
    * read. This is the manifest-tier fix for the O(live files)
    * planning cost: a point lookup on a non-clustered column (where
    * min/max boxes prune nothing) does O(commits) aggregate probes
    * plus per-file probes ONLY inside admitted commits — on a miss,
    * zero per-file reads and zero data-file opens at any table size.
    * A commit with many files saturates its fixed-size union and
    * degrades toward admit-always (per-file probes then do the
    * work, exactly the pre-aggregate behavior), never toward wrong.
    */
  def aggName(col: String): String = s"_agg.$col.bf"

  /** Aggregate path derived from a per-file sidecar path — same
    * commit directory, fixed name. No manifest format change: legacy
    * commits simply lack the file and admit everything.
    */
  def aggPathOf(fileSidecar: String, col: String): String = {
    val cut = fileSidecar.lastIndexOf('/')
    fileSidecar.substring(0, cut + 1) + aggName(col)
  }

  /** Might the commit's aggregate admit ANY of the hashes? Missing or
    * unreadable aggregate answers true (cannot prune — never wrong).
    */
  def aggAdmits(aggPath: String, hs: Array[Long]): Boolean = {
    aggProbes.incrementAndGet()
    try {
      val bf = load(aggPath)
      hs.exists(bf.mightContainLong)
    } catch { case _: Exception => true }
  }

  /** Union serialized sketches (driver-side, at commit) — all sized
    * identically by [[items]]/[[fpp]], so mergeInPlace never refuses.
    */
  def union(parts: Seq[Array[Byte]]): Array[Byte] = {
    val merged = parts.map(b =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(b))
      .reduce((a, b) => a.mergeInPlace(b))
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    out.toByteArray
  }

  /** xxhash64 of a pushed-filter literal in the encoding the write
    * side inserted: Catalyst hashes int/date as 4-byte ints,
    * long/timestamp as longs, strings as their UTF-8 bytes. `None`
    * for types the bloom tier does not cover (the filter then simply
    * cannot bloom-prune).
    */
  def hashOf(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(XXH64.hashLong(l.longValue(), Seed))
    case i: java.lang.Integer => Some(XXH64.hashInt(i.intValue(), Seed))
    case s: String =>
      Some(XXH64.hashUTF8String(UTF8String.fromString(s), Seed))
    case u: UTF8String => Some(XXH64.hashUTF8String(u, Seed))
    case d: java.sql.Date =>
      Some(XXH64.hashInt(d.toLocalDate.toEpochDay.toInt, Seed))
    case d: java.time.LocalDate =>
      Some(XXH64.hashInt(d.toEpochDay.toInt, Seed))
    case t: java.sql.Timestamp => Some(XXH64.hashLong(
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaTimestamp(t), Seed))
    case i: java.time.Instant => Some(XXH64.hashLong(
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .instantToMicros(i), Seed))
    case _ => None
  }
}
