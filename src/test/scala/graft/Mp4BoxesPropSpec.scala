package graft

import org.apache.spark.sql.graftext.Mp4Boxes

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-driven generality proof for the box walker: RANDOM valid box
  * trees — arbitrary per-sample sizes, arbitrary chunk splits with
  * arbitrary dead-gap bytes between chunks, multi-run stts, optional
  * stss subsets, stco/co64 coin flips — whose per-sample offsets and
  * timestamps are recomputed INDEPENDENTLY in the test from the
  * generated structure (plain running sums, no walker code). The fixed
  * goldens pin known layouts; this pins the walker on layouts nobody
  * hand-picked. Deterministic seeds (no scalatestplus bridge offline). */
class Mp4BoxesPropSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 30): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u64(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xFFFFFFFFL)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    u32(8L + payload.length) ++ tpe.getBytes("ISO-8859-1") ++ payload

  /** A generated movie: per-sample sizes, a chunking of the samples with
    * per-chunk leading gap bytes, stts runs, an optional stss subset. */
  private case class Movie(sizes: List[Int], chunkCounts: List[Int],
      gaps: List[Int], sttsRuns: List[(Int, Int)], stss: Option[List[Int]],
      timescale: Int, wide: Boolean)

  private val genMovie: Gen[Movie] = for {
    n <- Gen.choose(1, 40)
    sizes <- Gen.listOfN(n, Gen.choose(1, 200))
    // chunk the n samples into 1..5 runs of ≥1
    nChunks <- Gen.choose(1, math.min(n, 5))
    cuts <- Gen.pick(nChunks - 1, 1 until n).map(_.toList.sorted)
    gaps <- Gen.listOfN(nChunks, Gen.choose(0, 50))
    // stts: split n into 1..4 runs with deltas
    nRuns <- Gen.choose(1, math.min(n, 4))
    tCuts <- Gen.pick(nRuns - 1, 1 until n).map(_.toList.sorted)
    deltas <- Gen.listOfN(nRuns, Gen.choose(1, 1000))
    stss <- Gen.option(Gen.someOf(1 to n).map(_.toList.sorted))
    timescale <- Gen.choose(1, 48000)
    wide <- Gen.oneOf(true, false)
  } yield {
    def runsOf(c: List[Int]): List[Int] =
      (0 :: c).zip(c :+ n).map { case (a, b) => b - a }
    Movie(sizes, runsOf(cuts), gaps, runsOf(tCuts).zip(deltas), stss,
      timescale, wide)
  }

  private def build(m: Movie): (Array[Byte], List[Long], List[Long]) = {
    val n = m.sizes.length
    val stts = box("stts", u32(0) ++ u32(m.sttsRuns.length) ++
      m.sttsRuns.flatMap { case (c, d) => u32(c) ++ u32(d) }.toArray)
    // stsc runs: one entry per change of samples-per-chunk
    val stscEntries = m.chunkCounts.zipWithIndex.collect {
      case (c, i) if i == 0 || c != m.chunkCounts(i - 1) => (i + 1, c)
    }
    val stsc = box("stsc", u32(0) ++ u32(stscEntries.length) ++
      stscEntries.flatMap { case (f, c) => u32(f) ++ u32(c) ++ u32(1) }.toArray)
    val stsz = box("stsz", u32(0) ++ u32(0) ++ u32(n) ++
      m.sizes.flatMap(s => u32(s)).toArray)
    val stssBox = m.stss.map(ks =>
      box("stss", u32(0) ++ u32(ks.length) ++ ks.flatMap(k => u32(k)).toArray))
      .getOrElse(Array.empty[Byte])
    def stblWith(chunkOffs: List[Long]) = {
      val co =
        if (m.wide) box("co64", u32(0) ++ u32(chunkOffs.length) ++
          chunkOffs.flatMap(u64).toArray)
        else box("stco", u32(0) ++ u32(chunkOffs.length) ++
          chunkOffs.flatMap(u32).toArray)
      box("stbl", stts ++ stsc ++ stsz ++ co ++ stssBox)
    }
    val dur = m.sttsRuns.map { case (c, d) => c.toLong * d }.sum
    def fileWith(chunkOffs: List[Long]): Array[Byte] = {
      val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++
        u32(m.timescale) ++ u32(dur) ++ u32(0))
      val moov = box("moov", box("trak",
        box("mdia", mdhd ++ box("minf", stblWith(chunkOffs)))))
      // mdat payload: per chunk, gap bytes then its samples
      val chunkSampleBytes = chunkSlices(m).map(_.map(m.sizes(_)).sum)
      val payloadLen = m.gaps.sum + chunkSampleBytes.sum
      ftypBytes ++ moov ++ box("mdat", new Array[Byte](payloadLen))
    }
    // two-pass: measure with zeros, then place the real chunk offsets
    val probeLen = fileWith(List.fill(m.chunkCounts.length)(0L)).length
    val mdatStart = probeLen -
      (m.gaps.sum + chunkSlices(m).map(_.map(m.sizes(_)).sum).sum).toLong
    // chunk base = mdat start + everything before it + its own gap
    val (offs, _) = chunkSlices(m).zip(m.gaps).foldLeft(
      (List.empty[Long], mdatStart)) { case ((acc, pos), (slice, gap)) =>
        val base = pos + gap
        (acc :+ base, base + slice.map(m.sizes(_)).sum)
      }
    // independent per-sample offsets: chunk base + running size sum
    val sampleOffs = chunkSlices(m).zip(offs).flatMap { case (slice, base) =>
      slice.scanLeft(base) { case (p, s) => p + m.sizes(s) }.init
    }
    // independent timestamps: stts run expansion
    val times = m.sttsRuns.flatMap { case (c, d) => List.fill(c)(d.toLong) }
      .scanLeft(0L)(_ + _).init
    (fileWith(offs), sampleOffs, times)
  }

  /** Sample indices per chunk, from the chunk counts. */
  private def chunkSlices(m: Movie): List[List[Int]] = {
    val starts = m.chunkCounts.scanLeft(0)(_ + _)
    starts.zip(m.chunkCounts).map { case (s, c) => (s until s + c).toList }
  }

  private val ftypBytes = box("ftyp", "isom".getBytes ++ u32(0x200))

  test("property: walker offsets/timestamps equal independent running sums on random valid trees") {
    samples(genMovie).foreach { m =>
      val (bytes, expOffs, expTimes) = build(m)
      val t = Mp4Boxes.parse(bytes).getOrElse(
        fail(s"generated movie must parse: $m"))
      assert(t.timescale == m.timescale.toLong)
      assert(t.sizes.toSeq == m.sizes.map(_.toLong))
      assert(t.offsets.toSeq == expOffs, s"offsets diverge for $m")
      assert(t.timesTs.toSeq == expTimes, s"timestamps diverge for $m")
      assert(t.tableBytes == m.sizes.map(_.toLong).sum)
      assert(t.mdatBytes == m.sizes.sum.toLong + m.gaps.sum)
      // syncBefore vs a reference implementation over the generated stss
      val n = m.sizes.length
      (0 until n).foreach { s =>
        val exp = m.stss match {
          case None => s
          case Some(Nil) => -1
          case Some(ks) =>
            ks.filter(_ <= s + 1).lastOption.getOrElse(ks.head) - 1
        }
        assert(t.syncBefore(s) == exp, s"syncBefore($s) for stss=${m.stss}")
      }
    }
  }
}
