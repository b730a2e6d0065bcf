package graft.functions

import graft.sources.ExcelDates
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the round-2 native kernels — each checked
  * against a brute-force reference implementation on random inputs.
  */
object KernelProperties extends Properties("kernels") {

  // -- CrossPairCount ≡ brute-force pair counting ----------------------------

  /** Distribution: sorted unique prices with positive counts. */
  private val genDist: Gen[Seq[(Double, Long)]] = for {
    prices <- Gen.containerOf[Set, Int](Gen.choose(0, 50))
    cnts <- Gen.listOfN(prices.size, Gen.choose(1L, 5L))
  } yield prices.toSeq.sorted.map(_.toDouble).zip(cnts)

  private def toArrayData(d: Seq[(Double, Long)]): GenericArrayData =
    new GenericArrayData(d.map { case (p, c) => InternalRow(p, c) }.toArray[Any])

  property("crossPairCount equals brute-force over expanded multisets") =
    forAll(genDist, genDist) { (a, b) =>
      val expanded = for {
        (pa, ca) <- a; (pb, cb) <- b
        if pa < pb
      } yield ca * cb
      val expected = expanded.sum
      val got = CrossPairCount(null, null)
        .nullSafeEval(toArrayData(a), toArrayData(b))
        .asInstanceOf[Long]
      got == expected
    }

  // -- NearestCells ≡ brute-force argmin ranking -----------------------------

  private val genVec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.choose(-10.0, 10.0)).map(_.toArray)

  private val genCentroids: Gen[Array[Array[Double]]] =
    Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, genVec).map(_.toArray))

  property("nearestCells matches brute-force distance ranking") =
    forAll(genVec, genCentroids, Gen.choose(1, 4)) { (v, cs, nprobe) =>
      val expr = NearestCells(null, cs, nprobe)
      val got = expr.nullSafeEval(new GenericArrayData(v))
        .asInstanceOf[GenericArrayData].toIntArray().toSeq
      // reference: full ||v-c||^2 sort, ties by index (stable sortBy)
      val expected = cs.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.sortBy(identity).map(_._2).take(math.min(nprobe, cs.length)).toSeq
      // distances computed by different formulas (cc-2vc vs expanded) can
      // differ in ulps; accept either order when two distances are within
      // float noise of each other, else require exact agreement
      got.length == expected.length && got.zip(expected).forall {
        case (g, e) =>
          g == e || {
            def d(i: Int) = cs(i).zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
            math.abs(d(g) - d(e)) <= 1e-9 * (1.0 + math.abs(d(e)))
          }
      }
    }

  property("nearestCells survives NaN components (total, valid indices)") =
    forAll(genCentroids) { cs =>
      val nanVec = Array.fill(8)(Double.NaN)
      val got = NearestCells(null, cs, 2).nullSafeEval(new GenericArrayData(nanVec))
        .asInstanceOf[GenericArrayData].toIntArray()
      got.length == math.min(2, cs.length) &&
        got.forall(i => i >= 0 && i < cs.length) && got.distinct.length == got.length
    }

  // -- ExcelDates ------------------------------------------------------------

  property("serialToIso is monotone over whole-day serials") =
    forAll(Gen.choose(61L, 2958465L)) { s => // 1900-03-01 .. 9999-12-31
      val a = ExcelDates.serialToIso(s.toDouble, date1904 = false)
      val b = ExcelDates.serialToIso((s + 1).toDouble, date1904 = false)
      a < b // ISO-8601 strings sort chronologically
    }

  property("whole-day serials render midnight; fractions render the time") =
    forAll(Gen.choose(61L, 2958465L), Gen.choose(0, 23), Gen.choose(0, 59)) {
      (s, hh, mm) =>
        val day = ExcelDates.serialToIso(s.toDouble, date1904 = false)
        val frac = (hh * 3600 + mm * 60).toDouble / 86400.0
        val t = ExcelDates.serialToIso(s + frac, date1904 = false)
        day.endsWith("T00:00:00") &&
          t == day.stripSuffix("00:00:00") + f"$hh%02d:$mm%02d:00"
    }
}
