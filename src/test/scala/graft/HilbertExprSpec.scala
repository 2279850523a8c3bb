package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertCurve
import graft.operators.ZOrder

/** The native Hilbert expressions ([[graft.functions.HilbertIndex]] /
  * [[HilbertIndex3]]) — the scalar/SQL face of the layout curves.
  *
  * The certifying properties of a Hilbert layout are (a) bijection on
  * the full grid (every cell gets exactly one curve position) and
  * (b) unit-step adjacency (consecutive positions are Manhattan-
  * adjacent cells — the no-jump property Z lacks, which is where the
  * tighter bounding boxes come from). Both are EXACT, so both are
  * specced by walking complete grids — plus, for 2-D, bit-identity to
  * the already-oracled [[ZOrder.withHilbert]] recurrence. */
class HilbertExprSpec extends SparkSpec {
  import spark.implicits._

  test("2-D expression ≡ withHilbert on the full 16×16 grid (and via SQL face)") {
    val bits = 4
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val viaTransform = ZOrder.withHilbert(grid, col("x"), col("y"), bits, "d")
      .select(col("x"), col("y"), col("d"))
    val viaExpr = grid.select(col("x"), col("y"),
      ZOrder.hilbertIndex2(col("x"), col("y"), bits).as("d"))
    assert(viaExpr.exceptAll(viaTransform).isEmpty &&
      viaTransform.exceptAll(viaExpr).isEmpty)
    GraftSession.registerFunctions(spark)
    grid.createOrReplaceTempView("hilbert_grid")
    val viaSql = spark.sql(s"SELECT x, y, hilbert_d(x, y, $bits) AS d FROM hilbert_grid")
    assert(viaSql.exceptAll(viaTransform).isEmpty)
  }

  test("3-D kernel: bijection + unit-step adjacency on the full 8×8×8 grid") {
    val bits = 3
    val n = 1 << bits
    val cells = for {
      x <- 0 until n; y <- 0 until n; z <- 0 until n
    } yield (HilbertCurve.index3(x, y, z, bits), (x, y, z))
    // bijection: all d distinct and exactly covering [0, n^3)
    val ds = cells.map(_._1)
    assert(ds.distinct.size === n * n * n)
    assert(ds.min === 0L && ds.max === (n * n * n - 1).toLong)
    // adjacency: consecutive d are Manhattan-adjacent (distance 1)
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2)
      assert(dist === 1, s"jump between ($x1,$y1,$z1) and ($x2,$y2,$z2)")
    }
  }

  test("3-D expression via DataFrame and SQL agree with the kernel") {
    val bits = 2
    val n = 1 << bits
    val grid = (for { x <- 0 until n; y <- 0 until n; z <- 0 until n }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val expected = grid.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        HilbertCurve.index3(r.getLong(0), r.getLong(1), r.getLong(2), bits))
    }.toSeq.toDF("x", "y", "z", "d")
    val viaExpr = grid.select(col("x"), col("y"), col("z"),
      ZOrder.hilbertIndex3(col("x"), col("y"), col("z"), bits).as("d"))
    assert(viaExpr.exceptAll(expected).isEmpty)
    GraftSession.registerFunctions(spark)
    grid.createOrReplaceTempView("hilbert3_grid")
    val viaSql = spark.sql(
      s"SELECT x, y, z, hilbert_d3(x, y, z, $bits) AS d FROM hilbert3_grid")
    assert(viaSql.exceptAll(expected).isEmpty)
  }

  test("2-D adjacency holds for the kernel too (full 32×32 grid, bits=5)") {
    val bits = 5
    val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (HilbertCurve.index2(x, y, bits), (x, y))
    assert(cells.map(_._1).distinct.size === n * n)
    cells.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1)
    }
  }

  test("out-of-range coordinates fail loud (both arities)") {
    intercept[IllegalArgumentException] { HilbertCurve.index2(16, 0, 4) }
    intercept[IllegalArgumentException] { HilbertCurve.index2(0, -1, 4) }
    intercept[IllegalArgumentException] { HilbertCurve.index3(0, 8, 0, 3) }
  }

  test("null coordinates yield null (nullIntolerant contract)") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("x", "y")
      .select(ZOrder.hilbertIndex2(col("x"), col("y"), 4).as("d"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
