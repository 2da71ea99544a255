package org.apache.spark.sql.graftext

/** Minimal ISO BMFF (MP4) box walker — the container-structure half of
  * video handling. At 100 TB video is an I/O plan before it is a decode:
  * which byte ranges hold which samples is decided entirely by the
  * `moov/trak/mdia/minf/stbl` sample tables (ISO/IEC 14496-12 §8.5-8.7),
  * so a frame-sampling plan that does not read `stts`/`stsc`/`stsz`/
  * `stco` is an approximation. This walker reads them.
  *
  * Wire format (all integers big-endian): a file is a sequence of boxes
  * `[u32 size][4cc type][payload]`; size 1 means a u64 `largesize`
  * follows the type, size 0 means "to the end of the enclosing box" (legal
  * only for the last box). Container boxes (`moov`, `trak`, `mdia`,
  * `minf`, `stbl`) hold child boxes as their payload; unknown siblings
  * (`free`, `udta`, `tkhd`, `stsd`, ...) are skipped via their OWN size
  * fields — exactly the walk discipline the JPEG marker prober uses.
  *
  * Tables read (version-0 full boxes; `mdhd` also in version 1):
  *  - `mdhd`: media timescale + duration (ticks).
  *  - `stts`: run-length (sample_count, sample_delta) decoding timestamps.
  *  - `stsc`: (first_chunk, samples_per_chunk) runs mapping samples→chunks.
  *  - `stsz`: per-sample byte sizes (or one uniform size).
  *  - `stco`/`co64`: absolute file offsets of each chunk.
  * From these, [[parse]] derives the per-sample absolute byte offset and
  * timestamp — `offset(s) = stco[chunk(s)] + Σ sizes of prior samples in
  * the chunk` — which is what a ranged-GET fetch plan addresses.
  *
  * STRICT on structure, total on input: any truncation, overrun, table
  * inconsistency (stts total ≠ stsz count, stsc underflow, sample extent
  * past EOF), or hostile count (allocation cap) returns None — corrupt
  * bytes at 100 TB are data, not exceptions, and a quarantined video
  * costs one pass, never a hung or OOMing task.
  */
object Mp4Boxes {
  import MediaHeaderParse.{be32, tagAt}

  /** Big-endian u64 at byte offset `o` (caller checked bounds). */
  def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** The fully-derived sample table of the FIRST track carrying one.
    * `offsets`/`timesTs`/`sizes` are indexed by sample; `tableBytes` is
    * the stsz sum (what the table claims the media data occupies) and
    * `mdatBytes` the actual mdat payload bytes — a validator compares
    * the two. `syncs` holds the stss sync-sample numbers (1-BASED, per
    * the wire format); NULL means the file carries no stss box, which
    * the spec defines as "every sample is a sync sample" — distinct
    * from a PRESENT-but-empty stss, which declares that NO sample is a
    * sync sample (the inverse!). */
  final case class SampleTable(timescale: Long, durationTs: Long,
      mdatBytes: Long, tableBytes: Long,
      sizes: Array[Long], offsets: Array[Long], timesTs: Array[Long],
      syncs: Array[Long]) {
    def nSamples: Int = sizes.length
    /** 0-based index of the sync sample a seek targeting sample `s`
      * must START decoding at (I-frame dependency): the LATEST sync at
      * or before `s`, or — when `s` precedes the first keyframe — the
      * FIRST sync sample (the earliest decodable content; real players
      * substitute it, they don't decode garbage from sample 0). No stss
      * ⇒ s itself; present-but-EMPTY stss ⇒ -1 (nothing is decodable —
      * callers must quarantine, not fabricate a start). */
    def syncBefore(s: Int): Int = {
      if (syncs == null) return s
      if (syncs.length == 0) return -1
      var i = syncs.length - 1
      while (i >= 0 && syncs(i) > s + 1) i -= 1
      if (i < 0) (syncs(0) - 1).toInt else (syncs(i) - 1).toInt
    }
  }

  /** Hostile-count allocation cap: a lying `stsz`/`stts` count may not
    * demand more entries than this (the fixture corpus is ~10^2-10^3;
    * real movies are ~10^5-10^6 — the cap bounds one task's allocation,
    * same role as the PNG side cap). */
  private val MaxSamples = 1 << 22

  /** Parse the box tree and derive the sample plan. None = quarantine. */
  def parse(b: Array[Byte]): Option[SampleTable] = {
    if (b == null) return None
    val fileEnd = b.length.toLong
    if (fileEnd < 16 || !tagAt(b, 4, "ftyp")) return None

    var timescale = 0L; var durationTs = 0L
    var sttsCounts: Array[Long] = null; var sttsDeltas: Array[Long] = null
    var stscFirst: Array[Long] = null; var stscPer: Array[Long] = null
    var sizes: Array[Long] = null
    var chunks: Array[Long] = null
    var syncs: Array[Long] = null // null = no stss box = all-sync
    var mdatBytes = 0L
    var committed = false // a trak's tables have been accepted
    // per-trak slots: each trak parses into these, and only a COMPLETE
    // set (stts+stsc+stsz+stco) from a video-or-untyped handler commits
    // into the outer vars — so an audio/metadata FIRST trak (or one with
    // a partial stbl) is skipped and a later video trak still plans,
    // instead of hijacking the sample plan or quarantining the file
    var tTimescale = 0L; var tDurationTs = 0L
    var tSttsCounts: Array[Long] = null; var tSttsDeltas: Array[Long] = null
    var tStscFirst: Array[Long] = null; var tStscPer: Array[Long] = null
    var tSizes: Array[Long] = null
    var tChunks: Array[Long] = null
    var tSyncs: Array[Long] = null
    var tHandler: String = null // hdlr 4cc when the box is present

    def u32(o: Long): Long = be32(b, o.toInt)

    /** Walk the children of [start, end); dispatch each to `handle`.
      * False on any framing violation (short header, overrun, gap). */
    def walkChildren(start: Long, end: Long,
        handle: (String, Long, Long) => Boolean): Boolean = {
      var o = start
      while (o < end) {
        if (o + 8 > end) return false
        var size = u32(o)
        var hdr = 8L
        if (size == 1L) { // 64-bit largesize follows the type
          if (o + 16 > end) return false
          size = be64(b, o.toInt + 8); hdr = 16L
        } else if (size == 0L) size = end - o // "to end of enclosing box"
        if (size < hdr || size > end - o) return false
        val tpe = new String(b, o.toInt + 4, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        if (!handle(tpe, o + hdr, o + size)) return false
        o += size
      }
      true // loop exits exactly at end (size overruns already rejected)
    }

    def parseMdhd(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 4) return false
      val version = b(ps.toInt) & 0xFF
      if (version == 0) {
        if (pe - ps < 20) return false
        tTimescale = u32(ps + 12); tDurationTs = u32(ps + 16)
      } else if (version == 1) {
        if (pe - ps < 32) return false
        tTimescale = u32(ps + 20); tDurationTs = be64(b, ps.toInt + 24)
      } else return false
      true
    }

    def parseStts(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 8 || u32(ps) != 0L) return false
      val cnt = u32(ps + 4)
      if (cnt > (pe - ps - 8) / 8 || cnt > MaxSamples) return false
      tSttsCounts = new Array[Long](cnt.toInt)
      tSttsDeltas = new Array[Long](cnt.toInt)
      var i = 0
      while (i < cnt) {
        tSttsCounts(i) = u32(ps + 8 + 8L * i)
        tSttsDeltas(i) = u32(ps + 12 + 8L * i)
        i += 1
      }
      true
    }

    def parseStsc(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 8 || u32(ps) != 0L) return false
      val cnt = u32(ps + 4)
      if (cnt > (pe - ps - 8) / 12 || cnt > MaxSamples) return false
      tStscFirst = new Array[Long](cnt.toInt)
      tStscPer = new Array[Long](cnt.toInt)
      var i = 0
      while (i < cnt) {
        tStscFirst(i) = u32(ps + 8 + 12L * i)
        tStscPer(i) = u32(ps + 12 + 12L * i)
        // first_chunk runs must start at 1 and strictly increase
        if (tStscFirst(i) < 1 || (i > 0 && tStscFirst(i) <= tStscFirst(i - 1)) ||
          (i == 0 && tStscFirst(0) != 1L) || tStscPer(i) < 1) return false
        i += 1
      }
      true
    }

    def parseStsz(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 12 || u32(ps) != 0L) return false
      val uniform = u32(ps + 4)
      val cnt = u32(ps + 8)
      if (cnt > MaxSamples) return false
      if (uniform != 0L) {
        tSizes = Array.fill(cnt.toInt)(uniform)
      } else {
        if (cnt > (pe - ps - 12) / 4) return false
        tSizes = new Array[Long](cnt.toInt)
        var i = 0
        while (i < cnt) { tSizes(i) = u32(ps + 12 + 4L * i); i += 1 }
      }
      true
    }

    def parseStco(ps: Long, pe: Long, wide: Boolean): Boolean = {
      if (pe - ps < 8 || u32(ps) != 0L) return false
      val w = if (wide) 8 else 4
      val cnt = u32(ps + 4)
      if (cnt > (pe - ps - 8) / w || cnt > MaxSamples) return false
      tChunks = new Array[Long](cnt.toInt)
      var i = 0
      while (i < cnt) {
        tChunks(i) = if (wide) be64(b, (ps + 8 + 8L * i).toInt)
                     else u32(ps + 8 + 4L * i)
        i += 1
      }
      true
    }

    def parseStss(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 8 || u32(ps) != 0L) return false
      val cnt = u32(ps + 4)
      if (cnt > (pe - ps - 8) / 4 || cnt > MaxSamples) return false
      tSyncs = new Array[Long](cnt.toInt)
      var i = 0
      while (i < cnt) {
        tSyncs(i) = u32(ps + 8 + 4L * i)
        // sync sample numbers are 1-based and strictly ascending
        if (tSyncs(i) < 1 || (i > 0 && tSyncs(i) <= tSyncs(i - 1))) return false
        i += 1
      }
      true
    }

    val inStbl: (String, Long, Long) => Boolean = {
      case ("stts", ps, pe) => parseStts(ps, pe)
      case ("stsc", ps, pe) => parseStsc(ps, pe)
      case ("stsz", ps, pe) => parseStsz(ps, pe)
      case ("stco", ps, pe) => parseStco(ps, pe, wide = false)
      case ("co64", ps, pe) => parseStco(ps, pe, wide = true)
      case ("stss", ps, pe) => parseStss(ps, pe)
      case _ => true // stsd and friends: skipped by their own size
    }
    val inMinf: (String, Long, Long) => Boolean = {
      case ("stbl", ps, pe) => walkChildren(ps, pe, inStbl)
      case _ => true
    }
    // hdlr (ISO 14496-12 §8.4.3): version/flags(4) + pre_defined(4) +
    // the handler 4cc at payload offset 8 — 'vide'/'soun'/'meta'...
    def parseHdlr(ps: Long, pe: Long): Boolean = {
      if (pe - ps < 12) return false
      tHandler = new String(b, ps.toInt + 8, 4,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      true
    }
    val inMdia: (String, Long, Long) => Boolean = {
      case ("mdhd", ps, pe) => parseMdhd(ps, pe)
      case ("hdlr", ps, pe) => parseHdlr(ps, pe)
      case ("minf", ps, pe) => walkChildren(ps, pe, inMinf)
      case _ => true
    }
    val inTrak: (String, Long, Long) => Boolean = {
      case ("mdia", ps, pe) => walkChildren(ps, pe, inMdia)
      case _ => true // tkhd/edts: skipped wholesale
    }
    val inMoov: (String, Long, Long) => Boolean = {
      case ("trak", ps, pe) if !committed =>
        // fresh slots per trak; framing violations inside a trak still
        // quarantine the whole file (strict on structure)
        tTimescale = 0L; tDurationTs = 0L
        tSttsCounts = null; tSttsDeltas = null
        tStscFirst = null; tStscPer = null
        tSizes = null; tChunks = null; tSyncs = null; tHandler = null
        if (!walkChildren(ps, pe, inTrak)) false
        else {
          // take the FIRST trak with a COMPLETE sample table whose
          // handler (when declared) is video — an audio/metadata trak,
          // or one with a partial stbl, is skipped and the scan
          // continues to later traks
          val complete = tSttsCounts != null && tStscFirst != null &&
            tSizes != null && tChunks != null
          if (complete && (tHandler == null || tHandler == "vide")) {
            timescale = tTimescale; durationTs = tDurationTs
            sttsCounts = tSttsCounts; sttsDeltas = tSttsDeltas
            stscFirst = tStscFirst; stscPer = tStscPer
            sizes = tSizes; chunks = tChunks; syncs = tSyncs
            committed = true
          }
          true
        }
      case _ => true // free/udta/mvhd/further traks: skipped wholesale
    }
    val topLevel: (String, Long, Long) => Boolean = {
      case ("moov", ps, pe) => walkChildren(ps, pe, inMoov)
      case ("mdat", ps, pe) => mdatBytes += pe - ps; true
      case _ => true
    }

    if (!walkChildren(0L, fileEnd, topLevel)) return None
    if (sizes == null || chunks == null || sttsCounts == null ||
      stscFirst == null) return None

    // ---- derive per-sample timestamps (stts expansion) ----
    val n = sizes.length
    var total = 0L
    var i = 0
    while (i < sttsCounts.length) { total += sttsCounts(i); i += 1 }
    if (total != n) return None // stts and stsz disagree on sample count
    val timesTs = new Array[Long](n)
    var s = 0; var t = 0L; i = 0
    while (i < sttsCounts.length) {
      var k = 0L
      while (k < sttsCounts(i)) { timesTs(s) = t; t += sttsDeltas(i); s += 1; k += 1 }
      i += 1
    }

    // ---- derive per-sample offsets (stsc runs × stco × stsz) ----
    val offsets = new Array[Long](n)
    var tableBytes = 0L
    s = 0
    var run = 0      // current stsc run
    var chunkIx = 0L // 0-based chunk number
    while (s < n) {
      if (chunkIx >= chunks.length) return None // chunk table underflow
      // advance the stsc run when the NEXT run's first_chunk is reached
      while (run + 1 < stscFirst.length &&
        chunkIx + 1 >= stscFirst(run + 1)) run += 1
      var off = chunks(chunkIx.toInt)
      var k = 0L
      while (k < stscPer(run) && s < n) {
        offsets(s) = off
        val sz = sizes(s)
        // extent-past-EOF check in overflow-safe form: `off + sz` can
        // wrap negative for a hostile co64 offset near Long.MaxValue,
        // which would pass a naive `off + sz > fileEnd` — compare
        // against fileEnd - sz instead (both operands already
        // non-negative-checked, so the subtraction cannot wrap)
        if (off < 0 || sz < 0 || sz > fileEnd || off > fileEnd - sz)
          return None
        off += sz; tableBytes += sz
        s += 1; k += 1
      }
      chunkIx += 1
    }

    // stss entries must reference existing samples
    if (syncs != null && syncs.length > 0 && syncs(syncs.length - 1) > n)
      return None

    Some(SampleTable(timescale, durationTs, mdatBytes, tableBytes,
      sizes, offsets, timesTs, syncs))
  }
}
