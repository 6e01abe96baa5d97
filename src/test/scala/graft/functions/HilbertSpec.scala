package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The properties a Hilbert index exists for, checked exhaustively over
  * the full 256×256 grid (65,536 cells — cheap in-process).
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid: Map[Long, (Long, Long)] = (for {
    x <- 0L until 256L
    y <- 0L until 256L
  } yield Hilbert.xy2d(x, y) -> ((x, y))).toMap

  test("xy2d is a bijection onto [0, 65536)") {
    assert(grid.size == 65536)
    assert(grid.keys.min == 0L && grid.keys.max == 65535L)
  }

  test("consecutive curve positions are grid neighbours (|Δ| = 1)") {
    // THE Hilbert property (Z-order fails it at every seam): walking
    // d = 0..n²−1 never jumps, so a contiguous key range is a connected
    // blob of cells — the locality that makes zone maps prune
    (0L until 65535L).foreach { d =>
      val (x1, y1) = grid(d)
      val (x2, y2) = grid(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("codegen expression path matches the static function") {
    val df = Seq((0L, 0L), (255L, 255L), (17L, 200L), (128L, 64L))
      .toDF("x", "y")
      .withColumn("k", Hilbert.hilbert_key(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == Hilbert.xy2d(r.getLong(0), r.getLong(1)))
    }
  }
}
