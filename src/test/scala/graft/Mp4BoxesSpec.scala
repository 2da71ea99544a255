package graft

import org.apache.spark.sql.graftext.Mp4Boxes

import org.scalatest.funsuite.AnyFunSuite

/** Golden-bytes exercises for the ISO BMFF box walker: a hand-assembled
  * MULTI-CHUNK file (2 stts runs, 2 stsc runs, per-sample stsz, 2 stco
  * chunks, planted free/udta/tkhd/stsd boxes that must be skipped via
  * their OWN size fields) whose per-sample offsets/timestamps are
  * asserted against hand-computed values — plus the hostile-input
  * catalogue (truncation, overrun, table inconsistencies, lying counts)
  * that must quarantine, never throw or loop. No Spark session needed:
  * the walker is plain byte code. */
class Mp4BoxesSpec extends AnyFunSuite {

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xFFFFFFFFL)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    u32(8L + payload.length) ++ tpe.getBytes("ISO-8859-1") ++ payload

  private val ftyp = box("ftyp", "isom".getBytes ++ u32(0x200))

  /** The golden file: 5 samples in 2 chunks with 5 bytes of dead slack
    * between the chunks inside mdat (legal — mdat bytes the tables don't
    * cover), planted skip-boxes at every level. */
  private def golden(): (Array[Byte], Long, Long) = {
    val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(600) ++ u32(1200) ++ u32(0x55C40000L)) // timescale 600, dur 1200
    val stts = box("stts", u32(0) ++ u32(2) ++
      u32(2) ++ u32(100) ++ u32(3) ++ u32(50)) // 2×Δ100 then 3×Δ50
    val stsc = box("stsc", u32(0) ++ u32(2) ++
      u32(1) ++ u32(2) ++ u32(1) ++            // chunk 1: 2 samples
      u32(2) ++ u32(3) ++ u32(1))              // chunks 2+: 3 samples
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(5) ++
      Array(10L, 20L, 30L, 40L, 50L).flatMap(u32))
    def stblWith(c1: Long, c2: Long) = box("stbl",
      box("stsd", u32(0) ++ u32(0)) ++ // planted: must be skipped
        stts ++ stsc ++ stsz ++
        box("stco", u32(0) ++ u32(2) ++ u32(c1) ++ u32(c2)))
    def fileWith(c1: Long, c2: Long): Array[Byte] = {
      val moov = box("moov",
        box("udta", u32(0)) ++                 // planted: skipped
          box("trak",
            box("tkhd", u32(0) ++ u32(0)) ++   // planted: skipped
              box("mdia", mdhd ++ box("minf", stblWith(c1, c2)))))
      ftyp ++ box("free", u64(0)) ++ moov ++   // planted top-level free
        box("mdat", new Array[Byte](155))      // 30 + 5 slack + 120
    }
    // two-pass: sizes are content-determined, so measure then re-emit
    val probe = fileWith(0, 0)
    val mdatPayloadStart = probe.length - 155L
    val c1 = mdatPayloadStart
    val c2 = c1 + 30 + 5 // chunk 2 after the 5-byte slack
    (fileWith(c1, c2), c1, c2)
  }

  test("multi-chunk golden file: offsets/timestamps hand-verified, planted boxes skipped") {
    val (bytes, c1, c2) = golden()
    val t = Mp4Boxes.parse(bytes).getOrElse(fail("golden file must parse"))
    assert(t.timescale == 600L && t.durationTs == 1200L)
    assert(t.nSamples == 5 && t.mdatBytes == 155L && t.tableBytes == 150L)
    assert(t.sizes.toSeq == Seq(10L, 20L, 30L, 40L, 50L))
    assert(t.offsets.toSeq ==
      Seq(c1, c1 + 10, c2, c2 + 30, c2 + 70),
      "offsets must come from stco bases + stsz prefixes WITHIN each chunk")
    assert(t.timesTs.toSeq == Seq(0L, 100L, 200L, 250L, 300L),
      "timestamps must expand the stts runs")
  }

  test("largesize (size=1 + u64), to-EOF (size=0), and uniform stsz all parse") {
    val (bytes, _, _) = golden()
    // rewrite the trailing mdat as a largesize box: same payload
    val noMdat = bytes.dropRight(163) // 8 hdr + 155 payload
    val large = noMdat ++ u32(1) ++ "mdat".getBytes ++ u64(16L + 155L) ++
      new Array[Byte](155)
    val lt = Mp4Boxes.parse(large).getOrElse(fail("largesize mdat must parse"))
    assert(lt.mdatBytes == 155L && lt.offsets.length == 5)
    // size=0: the final box runs to EOF
    val toEof = noMdat ++ u32(0) ++ "mdat".getBytes ++ new Array[Byte](155)
    val et = Mp4Boxes.parse(toEof).getOrElse(fail("size-0 mdat must parse"))
    assert(et.mdatBytes == 155L)
    // uniform stsz: sample_size != 0, no entry table
    val uniStsz = box("stsz", u32(0) ++ u32(30) ++ u32(5))
    val stts = box("stts", u32(0) ++ u32(1) ++ u32(5) ++ u32(10))
    val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(5) ++ u32(1))
    def mk(stcoOff: Long) = {
      val moov = box("moov", box("trak", box("mdia",
        box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(50) ++ u32(0)) ++
          box("minf", box("stbl", stts ++ stsc ++ uniStsz ++
            box("stco", u32(0) ++ u32(1) ++ u32(stcoOff)))))))
      ftyp ++ moov ++ box("mdat", new Array[Byte](150))
    }
    val probeLen = mk(0).length
    val ut = Mp4Boxes.parse(mk(probeLen - 150L))
      .getOrElse(fail("uniform stsz must parse"))
    assert(ut.sizes.toSeq == Seq.fill(5)(30L) && ut.tableBytes == 150L)
    assert(ut.offsets.toSeq == (0 until 5).map(i => probeLen - 150L + 30L * i))
  }

  test("stss sync table: parsed, validated ascending/in-range, and syncBefore snaps correctly") {
    // rebuild the uniform-stsz fixture WITH an stss {1, 4}: targets 0-2
    // snap to sync sample 0, targets 3-4 to sync sample 3
    val stts = box("stts", u32(0) ++ u32(1) ++ u32(5) ++ u32(10))
    val stsc = box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(5) ++ u32(1))
    val uniStsz = box("stsz", u32(0) ++ u32(30) ++ u32(5))
    def mk(stss: Array[Byte], stcoOff: Long): Array[Byte] = {
      val moov = box("moov", box("trak", box("mdia",
        box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(50) ++ u32(0)) ++
          box("minf", box("stbl", stts ++ stsc ++ uniStsz ++
            box("stco", u32(0) ++ u32(1) ++ u32(stcoOff)) ++ stss)))))
      ftyp ++ moov ++ box("mdat", new Array[Byte](150))
    }
    val good = box("stss", u32(0) ++ u32(2) ++ u32(1) ++ u32(4))
    val base = mk(good, 0).length - 150L
    val t = Mp4Boxes.parse(mk(good, base)).getOrElse(fail("stss file must parse"))
    assert(t.syncs.toSeq == Seq(1L, 4L))
    assert((0 until 5).map(t.syncBefore) == Seq(0, 0, 0, 3, 3))
    // no stss at all: every sample is its own sync point (ISO default);
    // the file is 24 B shorter, so its mdat starts earlier
    val baseN = mk(Array.empty[Byte], 0).length - 150L
    val none = Mp4Boxes.parse(mk(Array.empty[Byte], baseN))
      .getOrElse(fail("no-stss file must parse"))
    assert(none.syncs == null && (0 until 5).forall(s => none.syncBefore(s) == s))
    // a first keyframe PAST the early targets: stss={3} means samples
    // 0-1 precede every sync point — the seek must snap FORWARD to the
    // first decodable sample (players substitute it), never fabricate a
    // start at non-keyframe sample 0
    val late = box("stss", u32(0) ++ u32(1) ++ u32(3))
    val baseL = mk(late, 0).length - 150L // 20 B box: mdat starts earlier
    val lt = Mp4Boxes.parse(mk(late, baseL)).getOrElse(fail("stss={3} must parse"))
    assert((0 until 5).map(lt.syncBefore) == Seq(2, 2, 2, 2, 2))
    // a PRESENT-but-empty stss declares NO sample is a sync sample (the
    // inverse of an absent box): syncBefore must say "nothing decodable"
    val empty = box("stss", u32(0) ++ u32(0))
    val baseE = mk(empty, 0).length - 150L
    val et2 = Mp4Boxes.parse(mk(empty, baseE)).getOrElse(fail("empty stss must parse"))
    assert((0 until 5).forall(s => et2.syncBefore(s) == -1),
      "present-but-empty stss = no sync samples, not all-sync")
    // hostile stss: non-ascending entries, and an entry past the table
    val desc = box("stss", u32(0) ++ u32(2) ++ u32(4) ++ u32(2))
    assert(Mp4Boxes.parse(mk(desc, base)).isEmpty, "descending stss")
    val past = box("stss", u32(0) ++ u32(2) ++ u32(1) ++ u32(9))
    assert(Mp4Boxes.parse(mk(past, base)).isEmpty, "stss entry past n")
  }

  test("multi-trak: audio/incomplete traks are skipped, the first complete video trak plans") {
    val mdhdA = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(48000) ++ u32(96000) ++ u32(0x55C40000L)) // the audio clock
    val mdhdV = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(1000) ++ u32(2000) ++ u32(0x55C40000L))   // the video clock
    def hdlr(h: String) = box("hdlr", u32(0) ++ u32(0) ++
      h.getBytes("ISO-8859-1") ++ u32(0) ++ u32(0) ++ u32(0))
    def stblFor(sz: Long, off: Long) = box("stbl",
      box("stts", u32(0) ++ u32(1) ++ u32(1) ++ u32(500)) ++
        box("stsc", u32(0) ++ u32(1) ++ u32(1) ++ u32(1) ++ u32(1)) ++
        box("stsz", u32(0) ++ u32(0) ++ u32(1) ++ u32(sz)) ++
        box("stco", u32(0) ++ u32(1) ++ u32(off)))
    def trak(mdhd: Array[Byte], h: Option[String], stbl: Option[Array[Byte]]) =
      box("trak", box("mdia",
        mdhd ++ h.map(hdlr).getOrElse(Array.empty[Byte]) ++
          box("minf", stbl.getOrElse(box("stbl",
            // INCOMPLETE: an stts alone, no stsc/stsz/stco
            box("stts", u32(0) ++ u32(1) ++ u32(1) ++ u32(10)))))))
    // two-pass builder (the golden() discipline): measure where mdat's
    // payload lands, then re-emit with real chunk offsets
    def fileOf(offToTraks: Long => Seq[Array[Byte]]): Array[Byte] = {
      def emit(off: Long) = ftyp ++
        box("moov", offToTraks(off).flatten.toArray) ++
        box("mdat", new Array[Byte](40))
      emit(emit(0L).length - 40L)
    }
    // trak 1: complete but hdlr 'soun' — an audio plan must NOT hijack
    // the video seek plan; trak 2: 'vide' but incomplete stbl — skipped;
    // trak 3: 'vide' complete — THIS one plans
    val threeTrak = fileOf(off => Seq(
      trak(mdhdA, Some("soun"), Some(stblFor(7, off))),
      trak(mdhdV, Some("vide"), None),
      trak(mdhdV, Some("vide"), Some(stblFor(9, off + 7)))))
    val off3 = threeTrak.length - 40L
    val t = Mp4Boxes.parse(threeTrak).get
    assert(t.timescale == 1000L && t.durationTs == 2000L,
      "the VIDEO trak's clock, not the audio's")
    assert(t.nSamples == 1 && t.sizes(0) == 9L && t.offsets(0) == off3 + 7,
      s"the video trak's table: ${t.sizes.toSeq} @ ${t.offsets.toSeq}")
    // an untyped complete trak (no hdlr — the fixture arm) still plans
    val u = Mp4Boxes.parse(fileOf(off =>
      Seq(trak(mdhdV, None, Some(stblFor(5, off)))))).get
    assert(u.nSamples == 1 && u.sizes(0) == 5L, "untyped trak plans")
    // nothing plannable: only audio/incomplete traks → quarantine
    assert(Mp4Boxes.parse(fileOf(off => Seq(
      trak(mdhdA, Some("soun"), Some(stblFor(7, off))),
      trak(mdhdV, Some("vide"), None)))).isEmpty,
      "no video sample table anywhere: quarantine, not the audio plan")
  }

  test("hostile inputs quarantine: truncation, overrun, inconsistent tables, lying counts") {
    val (bytes, _, _) = golden()
    def mutated(f: Array[Byte] => Array[Byte]): Option[_] =
      Mp4Boxes.parse(f(bytes.clone()))
    // truncated mid-box
    assert(Mp4Boxes.parse(bytes.take(bytes.length - 40)).isEmpty)
    // a box size below the 8-byte header (degenerate; must not loop)
    assert(mutated { b => b(3) = 4; b }.isEmpty)
    // a box size overrunning the file
    assert(mutated { b => b(0) = 0x7F; b }.isEmpty)
    // stts total (5) vs a lying stsz count (payload byte +16..19 is the
    // entry count; drop it to 4)
    val stszAt = indexOfTag(bytes, "stsz")
    assert(mutated { b => b(stszAt + 19) = 4; b }.isEmpty,
      "stsz/stts sample-count disagreement must quarantine")
    // stco chunk offset pointing past EOF (payload byte +16 leads the
    // first offset): sample extent check fires
    val stcoAt = indexOfTag(bytes, "stco")
    assert(mutated { b => b(stcoAt + 16) = 0x7F; b }.isEmpty,
      "sample extent past EOF must quarantine")
    // a lying stco COUNT demanding more entries than the box holds
    assert(mutated { b => b(stcoAt + 12) = 0x7F; b }.isEmpty,
      "stco entry count past the box must quarantine")
    // a co64 offset near Long.MaxValue: off + sz would WRAP NEGATIVE and
    // sneak past a naive `off + sz > fileEnd` — must still quarantine
    val (goldBytes, _, _) = golden()
    val co64File = {
      val stcoStart = indexOfTag(goldBytes, "stco")
      val pre = goldBytes.take(stcoStart)
      val post = goldBytes.drop(stcoStart + 24) // old stco box was 24 B
      val hostile = box("co64", u32(0) ++ u32(2) ++
        u64(0x7FFFFFFFFFFFFF00L) ++ u64(0x7FFFFFFFFFFFFF00L))
      // splice in; fix the three enclosing container sizes (+8 bytes each)
      val spliced = pre ++ hostile ++ post
      def bump(tag: String): Unit = {
        val at = indexOfTag(spliced, tag)
        val old = ((spliced(at) & 0xFF) << 24) | ((spliced(at + 1) & 0xFF) << 16) |
          ((spliced(at + 2) & 0xFF) << 8) | (spliced(at + 3) & 0xFF)
        val nw = old + 8
        spliced(at) = (nw >> 24).toByte; spliced(at + 1) = (nw >> 16).toByte
        spliced(at + 2) = (nw >> 8).toByte; spliced(at + 3) = nw.toByte
      }
      Seq("moov", "trak", "mdia", "minf", "stbl").foreach(bump)
      spliced
    }
    assert(Mp4Boxes.parse(co64File).isEmpty,
      "overflowing co64 extent must quarantine, not wrap past the EOF check")
    // foreign bytes / no ftyp
    assert(Mp4Boxes.parse("not an mp4 at all".getBytes).isEmpty)
    assert(Mp4Boxes.parse(null).isEmpty)
    // missing sample tables: a moov with no stbl
    val bare = ftyp ++ box("moov", box("trak", box("mdia",
      box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(1) ++ u32(0)))))
    assert(Mp4Boxes.parse(bare).isEmpty)
  }

  private def indexOfTag(b: Array[Byte], t: String): Int = {
    val pat = t.getBytes("ISO-8859-1")
    (0 until b.length - 4).find(i => pat.indices.forall(j => b(i + j) == pat(j)))
      .map(_ - 4).getOrElse(fail(s"tag $t not found"))
  }
}
