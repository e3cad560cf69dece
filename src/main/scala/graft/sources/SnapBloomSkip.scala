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

  /** Capacity ceiling for a COMMIT-AGGREGATE sketch built from raw
    * values (`items × files in the commit`, capped): a 100-file bulk
    * load holds ~100× a file's distinct values, and an aggregate
    * sized for one file saturates to admit-always exactly where
    * pruning matters most. The cap bounds the sidecar (~3.5 MB at
    * the default 2M / fpp 0.001); commits beyond it degrade
    * gracefully toward admit-always, never toward wrong.
    */
  def aggItemsCap: Long =
    sys.props.get("graft.snap.bloomAggItems").map(_.toLong)
      .getOrElse(2000000L)

  /** Aggregates use a tighter fpp than per-file sketches: ONE
    * aggregate false positive admits a whole commit's files (and a
    * gate asserting a miss prunes everything must not flake), while
    * the cost is only bits in a driver-side sidecar.
    */
  def aggFpp: Double = 0.001

  /** Raw-value aggregate capacity for a commit of `nFiles` files. */
  def aggItemsFor(nFiles: Int): Long =
    math.min(items * math.max(nFiles, 1), aggItemsCap)

  /** Driver-side sidecar cache — BYTE-budgeted, not entry-counted:
    * per-file sidecars (~18 KB) and commit aggregates (up to a few
    * MB) share it, and a hot table can have far more than a fixed
    * entry count of admitted files. Eviction is LRU among PER-FILE
    * entries first; `_agg` aggregates and checkpoint packs — the
    * highest-reuse entries, probed on EVERY planning pass — are
    * evicted only when the budget cannot be met otherwise.
    */
  private def cacheBudgetBytes: Long =
    sys.props.get("graft.snap.bloomCacheBytes").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  private final case class Entry(
      bf: org.apache.spark.util.sketch.BloomFilter,
      bytes: Long, pinned: Boolean)
  private val cache =
    new java.util.LinkedHashMap[String, Entry](32, 0.75f, true)
  private var cacheBytes = 0L

  private def cachePut(path: String, e: Entry): Unit =
    cache.synchronized {
      val prev = cache.put(path, e)
      cacheBytes += e.bytes - (if (prev == null) 0L else prev.bytes)
      if (cacheBytes > cacheBudgetBytes) {
        // pass 1: evict LRU unpinned; pass 2: LRU pinned if still over
        Seq(false, true).foreach { allowPinned =>
          val it = cache.entrySet().iterator()
          while (cacheBytes > cacheBudgetBytes && it.hasNext) {
            val en = it.next()
            if ((allowPinned || !en.getValue.pinned) &&
                en.getKey != path) {
              cacheBytes -= en.getValue.bytes
              it.remove()
            }
          }
        }
      }
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
      if (hit != null) return hit.bf
    }
    val name = path.substring(path.lastIndexOf('/') + 1)
    val isAgg = name.startsWith("_agg.")
    (if (isAgg) aggLoads else fileLoads).incrementAndGet()
    val raw = graft.io.SnapIo.readBytes(path)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(raw)
    cachePut(path, Entry(bf, raw.length.toLong, pinned = isAgg))
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

  // ---- CHECKPOINT-TIER bloom pack: the per-commit aggregates of
  // every live commit directory, CONCATENATED into one `_log/
  // c<v>.bloom.<col>.bfpack` sidecar written with the checkpoint.
  // Planning loads the pack ONCE (one sequential read) and probes
  // each contained aggregate in memory — a cold point-lookup MISS on
  // a 100k-commit streaming table costs 1 pack read + per-commit
  // loads only for POST-checkpoint commits, instead of 100k serial
  // driver sidecar loads. Concatenation (not a bitwise union) keeps
  // per-commit rejection granularity AND sidesteps the size-mismatch
  // a union would hit now that aggregates are sized per commit.
  // Entries are keyed by the commit directory's UUID (its last path
  // segment) — rename-invariant, so a repointed table's pack stays
  // valid without rewriting binary sidecars.

  /** Commit-dir key of a sidecar path `.../bloom/<uuid>/<name>`. */
  def dirKeyOf(sidecarPath: String): String = {
    val cut = sidecarPath.lastIndexOf('/')
    val dir = sidecarPath.substring(0, cut)
    dir.substring(dir.lastIndexOf('/') + 1)
  }

  private val PackMagic = 0x47425031 // "GBP1"

  /** Serialize (dirKey → serialized aggregate) entries. */
  def packBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(PackMagic)
    out.writeInt(entries.length)
    entries.foreach { case (k, b) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  /** Parse a pack into raw (dirKey → aggregate bytes) entries —
    * used by the incremental checkpoint writer to carry forward
    * still-live entries without re-reading their commit sidecars.
    */
  def unpackBytes(raw: Array[Byte]): Map[String, Array[Byte]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(raw))
    require(in.readInt() == PackMagic, "not a bloom pack")
    val n = in.readInt()
    (0 until n).map { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      new String(kb, "UTF-8") -> vb
    }.toMap
  }

  /** Parsed-pack cache entries ride the same byte budget, pinned
    * like aggregates (highest reuse: one probe per planning pass).
    */
  // accessOrder=true: eviction below is LRU (a hot pack probed every
  // planning pass survives a cold one) — insertion order would make
  // it FIFO (ADVICE r17)
  private val packCache = new java.util.LinkedHashMap[String,
      (Map[String, org.apache.spark.util.sketch.BloomFilter], Long)](
      16, 0.75f, true)
  private var packHeld = 0L

  /** Pack loads (cache misses) — the ONE sequential read a cold
    * planning pass pays for all pre-checkpoint commits.
    */
  val packLoads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test/gate hook: drop every cached sketch and pack so an I/O
    * measurement starts cold (the gates assert LOADS as data).
    */
  private[graft] def clearCache(): Unit = {
    cache.synchronized { cache.clear(); cacheBytes = 0L }
    packCache.synchronized { packCache.clear(); packHeld = 0L }
  }

  /** Load (and cache) a checkpoint pack: dirKey → aggregate sketch.
    * An unreadable pack answers empty — planning falls back to
    * per-commit probes, never wrong.
    */
  def loadPack(path: String)
      : Map[String, org.apache.spark.util.sketch.BloomFilter] = {
    packCache.synchronized {
      val hit = packCache.get(path)
      if (hit != null) return hit._1
    }
    try {
      packLoads.incrementAndGet()
      val raw = graft.io.SnapIo.readBytes(path)
      val parsed = unpackBytes(raw).map { case (k, b) =>
        k -> org.apache.spark.util.sketch.BloomFilter.readFrom(b)
      }
      packCache.synchronized {
        // byte-budgeted like the sketch cache: drop LRU packs once
        // they exceed a quarter of the budget (packs can be large)
        val budget = cacheBudgetBytes / 4
        val it = packCache.entrySet().iterator()
        while (packHeld + raw.length > budget && it.hasNext) {
          packHeld -= it.next().getValue._2
          it.remove()
        }
        packCache.put(path, (parsed, raw.length.toLong))
        packHeld += raw.length
      }
      parsed
    } catch { case _: Exception => Map.empty }
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
    // BINARY content digests are the canonical non-clustered
    // point-lookup key of a training-data lake (image/document
    // hashes) — Catalyst's XxHash64 hashes BinaryType over the raw
    // bytes, and so do both write paths
    case b: Array[Byte] => Some(XXH64.hashUnsafeBytes(b,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length,
      Seed))
    case _ => None
  }
}
