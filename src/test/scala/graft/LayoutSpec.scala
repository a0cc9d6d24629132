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

  test("mortonKey bounds: bits × dims must fit a signed long") {
    intercept[IllegalArgumentException] {
      Layout.mortonKey(Seq(col("x"), col("y")), bits = 32)
    }
  }
}
