package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck laws for the sketch kernels' one-sided-error guarantees,
  * exercised directly on the hash/index math (the Spark-level behavior is
  * covered by SketchExprsSpec; these pin the INVARIANTS on random inputs).
  */
object SketchProperties extends Properties("sketches") {

  private val genHashes: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))

  private def bloomInsert(bits: Array[Long], h: Long, k: Int, numBits: Int): Unit = {
    var i = 0
    while (i < k) {
      val idx = SketchHash.index(h, i, numBits)
      bits(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  private def bloomContains(bits: Array[Long], h: Long, k: Int, numBits: Int): Boolean = {
    var i = 0
    while (i < k) {
      val idx = SketchHash.index(h, i, numBits)
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  property("bloom: no false negatives for any insert set and any filter size") =
    forAll(genHashes, Gen.oneOf(64, 256, 4096), Gen.choose(1, 8)) { (hs, numBits, k) =>
      val bits = new Array[Long](numBits / 64)
      hs.foreach(bloomInsert(bits, _, k, numBits))
      hs.forall(bloomContains(bits, _, k, numBits))
    }

  property("bloom: merge (bitwise OR) equals single-pass build") =
    forAll(genHashes, genHashes, Gen.choose(1, 6)) { (h1, h2, k) =>
      val numBits = 1024
      val a = new Array[Long](numBits / 64)
      val b = new Array[Long](numBits / 64)
      val whole = new Array[Long](numBits / 64)
      h1.foreach(bloomInsert(a, _, k, numBits))
      h2.foreach(bloomInsert(b, _, k, numBits))
      (h1 ++ h2).foreach(bloomInsert(whole, _, k, numBits))
      val merged = a.zip(b).map { case (x, y) => x | y }
      merged.sameElements(whole)
    }

  property("cms: estimate never undercounts the true multiplicity") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 30L)), Gen.choose(1, 5)) { (vs, depth) =>
      val width = 64
      val grid = new Array[Long](depth * width)
      vs.foreach { v =>
        var d = 0
        while (d < depth) {
          grid(d * width + SketchHash.index(v, d, width)) += 1L
          d += 1
        }
      }
      val exact = vs.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (v, cnt) =>
        val est = (0 until depth)
          .map(d => grid(d * width + SketchHash.index(v, d, width))).min
        est >= cnt
      }
    }

  property("sketch index derivation is stable and in range") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 16),
        Gen.oneOf(64, 1024, 8192)) { (h, i, mod) =>
      val a = SketchHash.index(h, i, mod)
      a == SketchHash.index(h, i, mod) && a >= 0 && a < mod
    }
}
