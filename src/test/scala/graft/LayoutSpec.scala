package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey interleaves bits at position b*k + j (hand-checked)") {
    // x = 0b11, y = 0b01, bits = 2: x0→pos0, y0→pos1, x1→pos2, y1→pos3
    // set bits: x0=1, y0=1, x1=1, y1=0 → 0b0111 = 7
    val out = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(out === 7L)
    // single dimension degenerates to the masked value itself
    val one = Seq((13L, 0L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x")), bits = 4).as("z"))
      .head().getLong(0)
    assert(one === 13L)
  }

  test("mortonKey uses only the low `bits` bits of each dimension") {
    // raw high-bit input on the LEFT side: the kernel itself must
    // ignore bits >= `bits`, no external masking
    val out = Seq((1024L + 3L, 1L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x"), col("y")), bits = 10).as("z"))
      .head().getLong(0)
    val base = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x"), col("y")), bits = 10).as("z"))
      .head().getLong(0)
    assert(out === base)
  }

  test("every aligned 4×4 tile is one contiguous z-key range (the data-skipping property)") {
    // the reason z-order prunes: an aligned 2^m × 2^m tile occupies
    // EXACTLY one contiguous key interval of length 4^m, so a file
    // covering a key range has a tight multi-dim bounding box — unlike
    // row-major order, where a 16-cell tile scatters across 4 rows of
    // the full-width key space
    val grid = (0 until 1024).map(i => (i.toLong, (i % 32).toLong, (i / 32).toLong))
      .toDF("id", "x", "y")
    val z = grid.select((col("x") / 4).cast("long").as("tx"),
      (col("y") / 4).cast("long").as("ty"),
      Layout.mortonKey(Seq(col("x"), col("y")), bits = 5).as("z"))
    val tiles = z.groupBy("tx", "ty")
      .agg(countDistinct("z").as("n"), (max("z") - min("z")).as("span"),
        (min("z") % 16).as("offset"))
      .collect()
    assert(tiles.length === 64)
    tiles.foreach { r =>
      assert(r.getAs[Long]("n") === 16L && r.getAs[Long]("span") === 15L &&
        r.getAs[Long]("offset") === 0L, s"tile not a contiguous aligned z-range: $r")
    }
  }

  test("z-ordered parquet files carry tight per-file min/max on BOTH dimensions") {
    // the end-to-end data-skipping evidence: write the same grid
    // z-ordered and row-major, read each output file separately, and
    // compare per-file bounding-box areas — a format with file-level
    // min/max stats (Delta/Iceberg) prunes on either column only if
    // the boxes are tight on both
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong, (i % n).toLong, (i / n).toLong))
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zorderLayout(grid, Seq(col("x"), col("y")), bits = 6, partitions = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    grid.orderBy("id").repartitionByRange(16, col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$dir/row")

    def maxArea(path: String): Long = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 1, s"expected multiple output files in $path")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(1) - r.getLong(0) + 1) * (r.getLong(3) - r.getLong(2) + 1)
      }.max
    }
    val zArea = maxArea(s"$dir/z")
    val rowArea = maxArea(s"$dir/row")
    // row-major slices span the full x range (64 × slice height);
    // z-order slices stay near-square — at 16 slices of 256 cells the
    // worst z box is ≤ 2 quadrants (32×16 = 512) vs row-major's
    // 64-wide strips (≥ 64×4 = 256... with 16 even slices exactly
    // 64×4): the z win shows on the per-dimension spans, so assert
    // both: every z file bounds BOTH dims ≤ 32, while row files span
    // the full 64 in x
    assert(zArea <= 512L, s"z-order worst box $zArea")
    val zFiles = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    zFiles.foreach { f =>
      val r = spark.read.parquet(f).agg(min("x"), max("x"), min("y"), max("y")).head()
      assert(r.getLong(1) - r.getLong(0) <= 32 && r.getLong(3) - r.getLong(2) <= 32,
        s"z file spans too wide: $r")
    }
    val rowSpansFullX = new java.io.File(s"$dir/row").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      .exists { f =>
        val r = spark.read.parquet(f).agg(min("x"), max("x")).head()
        r.getLong(1) - r.getLong(0) === (n - 1).toLong
      }
    assert(rowSpansFullX, "row-major baseline should have full-width x spans")
    assert(rowArea >= zArea,
      s"row-major worst box $rowArea should not beat z-order's $zArea")
  }

  test("mortonKey bounds: bits × dims must fit a signed long") {
    intercept[IllegalArgumentException] {
      Layout.mortonKey(Seq(col("x"), col("y")), bits = 32)
    }
  }
}
