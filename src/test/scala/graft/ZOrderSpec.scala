package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Z-order layout: the written row groups must bound BOTH dimensions —
  * the property single-column sort-on-write cannot give. */
class ZOrderSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  /** Per-file (min, max) of a long column from the parquet footers. */
  private def fileRanges(path: String, column: String): Seq[(Long, Long)] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get.getStatistics
          (c.genericGetMin.asInstanceOf[Long], c.genericGetMax.asInstanceOf[Long])
        }.toSeq
        finally r.close()
      }
  }

  test("zvalue matches a reference Morton implementation") {
    import spark.implicits._
    def mortonRef(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until ScaleOps.ZBits) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // 70000 exercises the mask
    val got = cases.toDF("x", "y")
      .select(ScaleOps.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == mortonRef(x & 0xFFFFL, y & 0xFFFFL), s"($x,$y)")
    }
  }

  test("z-ordered layout bounds BOTH dimensions per file; x-sorted layout does not") {
    import spark.implicits._
    // deterministic 128×128 grid scaled into the full 16-bit range
    val grid = (0 until 16384).map { i =>
      (i.toLong, (i % 128).toLong * 512L, (i / 128).toLong * 512L)
    }
    val df = grid.toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_z_").toString

    ScaleOps.writeZOrdered(df, "x", "y", s"$base/z", partitions = 16)
    val zx = fileRanges(s"$base/z", "x")
    val zy = fileRanges(s"$base/z", "y")
    assert(zx.size >= 8)
    // each z range-partition is a contiguous curve segment ≈ a rectangle
    // pinning the top interleaved bits of BOTH dims. Individual partitions
    // can straddle a quadrant edge (range boundaries are SAMPLED), so the
    // claim is statistical: the MEAN span per dimension must be well under
    // the global extent — single-column sort can't do this for the other
    // dimension no matter how the boundaries fall.
    val extent = (127L * 512L).toDouble
    def meanSpan(rs: Seq[(Long, Long)]): Double =
      rs.map { case (lo, hi) => (hi - lo).toDouble }.sum / rs.size
    assert(meanSpan(zx) <= 0.5 * extent, s"mean x span: ${meanSpan(zx)}")
    assert(meanSpan(zy) <= 0.5 * extent, s"mean y span: ${meanSpan(zy)}")

    // contrast: sort-on-write by x alone leaves y unbounded in every file
    ScaleOps.writeSorted(df, "x", s"$base/xs", partitions = 16)
    val sy = fileRanges(s"$base/xs", "y")
    assert(meanSpan(sy) > 0.9 * extent,
      s"x-sorted layout should leave y spanning ~the full range: ${meanSpan(sy)}")
  }
}
