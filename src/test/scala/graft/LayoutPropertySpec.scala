package graft

import org.apache.spark.sql.functions._

/** Property-style batch tests of the Layout math: thousands of
  * fixed-seed random samples evaluated in one Spark job each, with the
  * invariants checked driver-side against exact BigInt arithmetic.
  */
class LayoutPropertySpec extends GraftSuite {
  import operators.Layout

  private val rnd = new scala.util.Random(42)

  test("zorderKey is injective and invertible on the 16-bit domain") {
    import spark.implicits._
    val samples = Seq.fill(5000)(
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)).distinct
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // injective: as many distinct keys as distinct inputs
    assert(out.map(_._3).distinct.length == samples.length)
    // invertible: de-interleaving the bits recovers both keys
    out.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 16) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"z=$z decoded to ($ra,$rb), want ($a,$b)")
    }
    // range: 32 bits
    assert(out.forall { case (_, _, z) => z >= 0L && z < (1L << 32) })
  }

  test("scaleKey matches exact BigInt floor division on random ranges") {
    import spark.implicits._
    val samples = Seq.fill(5000) {
      val mn = rnd.nextLong(1000000000000L)
      val mx = mn + 1 + rnd.nextLong(1000000000000L)
      val x = mn + rnd.nextLong(mx - mn + 1)
      (x, mn, mx)
    }
    val out = samples.toDF("x", "mn", "mx")
      .select(col("x"), col("mn"), col("mx"),
        Layout.scaleKey(col("x"), col("mn"), col("mx")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mask = BigInt((1L << 16) - 1)
    out.foreach { case (x, mn, mx, s) =>
      val expect = (BigInt(x - mn) * mask / BigInt(mx - mn)).toLong
      assert(s == expect, s"scale($x,$mn,$mx)=$s, exact=$expect")
      assert(s >= 0L && s <= 65535L)
    }
    // endpoints are exact
    val ends = Seq((7L, 7L, 19L), (19L, 7L, 19L)).toDF("x", "mn", "mx")
      .select(Layout.scaleKey(col("x"), col("mn"), col("mx"))).collect()
    assert(ends.map(_.getLong(0)).toSeq == Seq(0L, 65535L))
    // constant column scales to 0, not a division error
    val const = Seq((5L, 5L, 5L)).toDF("x", "mn", "mx")
      .select(Layout.scaleKey(col("x"), col("mn"), col("mx"))).collect()
    assert(const.head.getLong(0) == 0L)
    // full-domain span: (mx-mn) overflows a long subtraction — the
    // DECIMAL path must engage (no ANSI overflow, no wrong branch)
    val mn = Long.MinValue / 2 - 1; val mx = Long.MaxValue / 2 + 1
    val wide = Seq((0L, mn, mx), (mn, mn, mx), (mx, mn, mx))
      .toDF("x", "mn", "mx")
      .select(Layout.scaleKey(col("x"), col("mn"), col("mx"))).collect()
      .map(_.getLong(0)).toSeq
    val wideExpect = Seq(0L, mn, mx).map(x =>
      (BigInt(x) - BigInt(mn)) * mask / (BigInt(mx) - BigInt(mn))).map(_.toLong)
    assert(wide == wideExpect, s"$wide vs $wideExpect")
  }

  test("curve locality: nearby (a,b) boxes occupy contiguous key ranges") {
    import spark.implicits._
    // For each 256x256-aligned tile, the z-range spanned by its members
    // must not overlap any other tile's range — the property file-level
    // min/max skipping relies on (an aligned power-of-two tile IS one
    // contiguous curve segment).
    val pts = for { a <- 0 until 1024 by 64; b <- 0 until 1024 by 64 }
      yield (a.toLong, b.toLong)
    val keyed = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0) / 256, r.getLong(1) / 256), r.getLong(2)))
    val ranges = keyed.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).min, xs.map(_._2).max) }.toSeq
    ranges.combinations(2).foreach { case Seq((t1, (l1, h1)), (t2, (l2, h2))) =>
      assert(h1 < l2 || h2 < l1, s"tiles $t1 and $t2 overlap in z")
    }
  }
}
