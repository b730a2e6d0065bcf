package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck law: as-of join results are bucketSize-INVARIANT. The bucket
  * width is a physical-plan knob (how candidates are generated), never a
  * semantic one — for any random event set, any direction, strictness and
  * tolerance, the matches must be identical whether every row sits in its
  * own bucket, buckets hold a handful of rows, or the whole axis collapses
  * into one bucket (which degenerates to the naive all-pairs plan, the
  * reference semantics by construction).
  */
object AsofProperties extends Properties("AsofBucketInvariance") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private val genEvents: Gen[(List[(String, Long)], List[(String, Long)])] = for {
    nKeys <- Gen.choose(1, 3)
    keys = (0 until nKeys).map(i => s"k$i")
    nl <- Gen.choose(0, 25)
    nr <- Gen.choose(0, 25)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.oneOf(keys), Gen.choose(0L, 200L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.oneOf(keys), Gen.choose(0L, 200L)))
  } yield (ls, rs)

  // every row its own bucket · a-few-rows buckets · one all-spanning bucket
  private val bucketSizes = Seq(0.7, 7.0, 1e9)

  private def matches(ls: List[(String, Long)], rs: List[(String, Long)],
      forward: Boolean, strict: Boolean, tol: Option[Long],
      bucket: Double): Seq[(Long, Option[Long])] = {
    import spark.implicits._
    val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "lt")
    val r = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("rid", "k", "rt").select("k", "rid", "rt")
    val joined =
      if (forward)
        // tolerance needs TIMESTAMP columns; exercise it through a cast
        if (tol.isDefined) {
          val lts = l.withColumn("lt", timestamp_seconds(col("lt")))
          val rts = r.withColumn("rt", timestamp_seconds(col("rt")))
          Joins.asofForward(lts, rts, Seq("k"), "lt", "rt", "rid",
            strict = strict, toleranceSec = tol, bucketSize = bucket)
        } else Joins.asofForward(l, r, Seq("k"), "lt", "rt", "rid",
          strict = strict, bucketSize = bucket)
      else Joins.asofBackward(l, r, Seq("k"), "lt", "rt", "rid",
        strict = strict, bucketSize = bucket)
    joined.select("lid", "rid").collect()
      .map(row => (row.getLong(0), Option(row.get(1)).map(_.asInstanceOf[Long])))
      .toSeq.sortBy(_._1)
  }

  property("backward matches are identical across bucket widths") =
    forAll(genEvents, Gen.oneOf(true, false)) { case ((ls, rs), strict) =>
      val results = bucketSizes.map(matches(ls, rs, forward = false,
        strict = strict, tol = None, _))
      results.distinct.size == 1
    }

  property("forward matches (with and without tolerance) are identical across bucket widths") =
    forAll(genEvents, Gen.oneOf(true, false),
      Gen.oneOf(None, Some(10L), Some(50L))) { case ((ls, rs), strict, tol) =>
      val results = bucketSizes.map(matches(ls, rs, forward = true,
        strict = strict, tol = tol, _))
      results.distinct.size == 1
    }
}
