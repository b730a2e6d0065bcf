package graft.canon

import graft.TestSpark
import graft.receiver.MiniJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CanonicalJsonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(colExpr: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(CanonicalJson(colExpr).as("c")).collect()(0).getString(0)

  test("struct keys are sorted at every nesting level") {
    val c = canon(struct(
      lit("v").as("zeta"),
      struct(lit(2).as("b"), lit(1).as("a")).as("inner"),
      lit(7L).as("alpha")))
    assert(c == """{"alpha":7,"inner":{"a":1,"b":2},"zeta":"v"}""")
  }

  test("string escaping: quotes, backslash, control chars") {
    val c = canon(struct(lit("a\"b\\c\nd\te\u0001f").as("s")))
    assert(c == "{\"s\":\"a\\\"b\\\\c\\nd\\te\\u0001f\"}")
  }

  test("numbers: integral doubles drop the fraction; decimals are plain") {
    val c = canon(struct(
      lit(3.0).as("a"), lit(2.5).as("b"),
      lit(BigDecimal("12.3400")).as("c"), lit(42).as("d")))
    assert(c == """{"a":3,"b":2.5,"c":12.3400,"d":42}""")
  }

  test("null, boolean, array") {
    val c = canon(struct(
      lit(null).cast("string").as("n"), lit(true).as("t"),
      array(lit(1), lit(2)).as("arr")))
    assert(c == """{"arr":[1,2],"n":null,"t":true}""")
  }

  test("map keys are sorted") {
    val c = canon(struct(map_from_arrays(
      array(lit("z"), lit("a")), array(lit(1), lit(2))).as("m")))
    assert(c == """{"m":{"a":2,"z":1}}""")
  }

  test("receiver MiniJson.canonical(parse(x)) reproduces the expression's bytes") {
    // the sender↔receiver contract: the independent parser + re-serializer
    // must agree with the Catalyst expression on every canonical document
    val samples = Seq(
      """{"alpha":7,"inner":{"a":1,"b":2},"zeta":"v"}""",
      """{"arr":[1,2.5,null,true],"s":"x\ny"}""",
      """{"empty_arr":[],"empty_obj":{}}""",
      "{\"u\":\"\\u0001\"}")
    samples.foreach { s =>
      assert(MiniJson.canonical(MiniJson.parse(s)) == s, s"round-trip broke for $s")
    }
  }

  test("MiniJson key-sorts unsorted input; number lexemes pass through verbatim") {
    // numbers are NOT re-normalized: the sender already emits one canonical
    // lexeme per value, and re-parsing through Double would corrupt decimals
    assert(MiniJson.canonical(MiniJson.parse("""{ "b" : 2.0 , "a" : [ 1e2 ] }"""))
      == """{"a":[1e2],"b":2.0}""")
  }

  test("decimal lexemes survive the receiver round-trip byte-for-byte") {
    // regression: a DECIMAL(15,4) renders as "19.9900" on the sender; the
    // receiver's independent recompute must hash the same bytes
    val rec = canon(struct(lit(BigDecimal("19.9900")).as("price"),
      lit(BigDecimal("0.00001")).as("eps")))
    assert(rec == """{"eps":0.00001,"price":19.9900}""")
    assert(MiniJson.canonical(MiniJson.parse(rec)) == rec)
    assert(Identity.sha256Hex(MiniJson.canonical(MiniJson.parse(rec))) ==
      Identity.sha256Hex(rec))
  }

  test("map keys sort by raw code units, matching MiniJson's object sort") {
    // "a\n" < "a0" in raw UTF-16; an escaped-form sort would invert them
    val viaExpr = canon(struct(map_from_arrays(
      array(lit("a0"), lit("a\n")), array(lit(1), lit(2))).as("m")))
    assert(viaExpr == "{\"m\":{\"a\\n\":2,\"a0\":1}}")
    assert(MiniJson.canonical(MiniJson.parse(viaExpr)) == viaExpr)
  }

  test("checksum permutation stability: key order never changes the hash") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = rnd.nextInt()
      val b = rnd.nextLong()
      val s = MiniJson.canonical(MiniJson.JStr(rnd.nextString(rnd.nextInt(20))))
      val s1 = MiniJson.canonical(MiniJson.parse(s"""{"a":$a,"b":$b,"s":$s}"""))
      val s2 = MiniJson.canonical(MiniJson.parse(s"""{"s":$s,"b":$b,"a":$a}"""))
      assert(s1 == s2)
      assert(Identity.sha256Hex(s1) == Identity.sha256Hex(s2))
    }
  }

  test("identity derivation matches the reference's scheme on a known vector") {
    // sha256("path.json|json"), then sha256(fileId + "|resume") — verified
    // against an independent sha256 implementation
    val fid = Identity.fileId("path.json", "json")
    assert(fid == Identity.sha256Hex("path.json|json"))
    assert(fid.length == 64 && fid.matches("[0-9a-f]+"))
    val iid = Identity.ingestionId(fid, "resume")
    assert(iid == Identity.sha256Hex(s"$fid|resume"))
    assert(Identity.chunkId(iid, 7) == s"$iid:7")
    // fixed vector (sha256 of "abc" is a published test vector)
    assert(Identity.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }
}
