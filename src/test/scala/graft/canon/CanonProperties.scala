package graft.canon

import graft.receiver.MiniJson
import graft.receiver.MiniJson._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites over the pure (non-Spark) protocol logic
  * (SURVEY.md §5.2 #2). Run natively by sbt's ScalaCheck framework.
  */
object CanonProperties extends Properties("canon") {

  // -- generators: arbitrary JSON value trees --------------------------------
  private val genScalarString: Gen[JVal] =
    Gen.asciiPrintableStr.map(JStr) // printable covers quotes/backslashes
  private val genControlString: Gen[JVal] =
    Gen.listOf(Gen.choose(0.toChar, 0x1f.toChar)).map(cs => JStr(cs.mkString))
  private val genNum: Gen[JVal] = Gen.oneOf(
    Gen.long.map(n => JNum(n.toString)),
    Gen.choose(-1e9, 1e9).map(d => JNum(java.lang.Double.toString(d))))
  private val genScalar: Gen[JVal] = Gen.oneOf(
    Gen.const(JNull), Gen.oneOf(true, false).map(JBool),
    genNum, genScalarString, genControlString)

  private def genJVal(depth: Int): Gen[JVal] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      1 -> Gen.listOfN(3, genJVal(depth - 1)).map(vs => JArr(vs.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr, genJVal(depth - 1)))
        .map(fs => JObj(fs.toVector)))

  private val genDoc: Gen[JVal] = genJVal(3)

  // -- properties ------------------------------------------------------------

  property("canonical is a fixpoint: parse ∘ canonical = identity on bytes") =
    forAll(genDoc) { v =>
      val c = MiniJson.canonical(v)
      MiniJson.canonical(MiniJson.parse(c)) == c
    }

  property("object key order never changes canonical bytes or the checksum") =
    forAll(Gen.listOfN(5, Gen.zip(Gen.alphaNumStr, genJVal(1)))) { fields =>
      val a = JObj(fields.toVector)
      val b = JObj(scala.util.Random.shuffle(fields).toVector)
      val (ca, cb) = (MiniJson.canonical(a), MiniJson.canonical(b))
      // duplicate keys make order observable; restrict to distinct-key maps
      fields.map(_._1).distinct.size != fields.size ||
        (ca == cb && Identity.sha256Hex(ca) == Identity.sha256Hex(cb))
    }

  property("identity derivation is injective over (path, type) changes") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (p1, p2) =>
      p1 == p2 || Identity.fileId(p1, "json") != Identity.fileId(p2, "json")
    }

  property("chunk checksum is order-sensitive (A15: records hashed in order)") =
    forAll(Gen.listOfN(4, Gen.long)) { xs =>
      val recs = xs.map(x => s"""{"v":$x}""")
      xs.distinct.size != xs.size || recs.size < 2 ||
        Identity.chunkChecksum(recs) != Identity.chunkChecksum(recs.reverse)
    }

  property("chunk id embeds the ingestion id and the dense chunk number") =
    forAll(Gen.choose(0L, 1000000L)) { n =>
      val iid = Identity.ingestionId(Identity.fileId("f", "json"), "resume")
      Identity.chunkId(iid, n) == s"$iid:$n"
    }
}
