package graft

import graft.functions.CosineSim
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the CosineSim Catalyst expression
  * (interpreted path), mirroring the reference's property-style
  * round-trip tests (reference `src/types.rs:164-179`).
  */
class PropertySpec extends AnyFunSuite {

  private def cos(a: Array[Float], b: Array[Float]): Option[Double] = {
    val e = CosineSim(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType)))
    Option(e.eval(null)).map(_.asInstanceOf[Double])
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("cosine is bounded in [-1, 1] (modulo fp eps)") {
    check(Prop.forAll(vecGen) { a =>
      cos(a, a.map(-_)).forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    })
  }

  test("cosine is symmetric") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val x = cos(a, b.take(a.length).padTo(a.length, 1.0f))
      val y = cos(b.take(a.length).padTo(a.length, 1.0f), a)
      (x, y) match {
        case (Some(u), Some(v)) => math.abs(u - v) < 1e-12
        case (None, None) => true
        case _ => false
      }
    })
  }

  test("self-similarity is 1 for nonzero vectors") {
    check(Prop.forAll(vecGen) { a =>
      val nz = if (a.forall(_ == 0.0f)) a.updated(0, 1.0f) else a
      cos(nz, nz).exists(c => math.abs(c - 1.0) < 1e-12)
    })
  }

  private val posVecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0.1f, 10.0f)).map(_.toArray))

  test("scale invariance: cos(ka, b) == cos(a, b) for k > 0") {
    // positive components only: mixed-sign vectors make the cosine
    // ill-conditioned (cancellation), which tests float rounding of
    // the generator rather than the kernel
    check(Prop.forAll(posVecGen, Gen.chooseNum(0.1f, 8.0f)) { (a, k) =>
      val b = a.map(x => x + 1.0f)
      (cos(a.map(_ * k), b), cos(a, b)) match {
        case (Some(u), Some(v)) => math.abs(u - v) < 1e-5
        case _ => false
      }
    })
  }

  test("length mismatch and zero vectors yield null") {
    assert(cos(Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)).isEmpty)
    assert(cos(Array(0.0f, 0.0f), Array(1.0f, 2.0f)).isEmpty)
  }
}

/** ScalaCheck invariants for the bounded top-k Aggregator: any split
  * of any input into partial buffers merges to exactly the sorted
  * top-k — the associativity/commutativity contract partial
  * aggregation depends on.
  */
class TopKPropertySpec extends AnyFunSuite {
  private val agg = new graft.functions.TopKAggregator(5)

  private val rowsGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L)))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def expected(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(5)

  test("reduce-then-merge equals sorted take-k for any partition split") {
    check(Prop.forAll(rowsGen, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val (a, b) = xs.splitAt(cut % (xs.length + 1))
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      merged == expected(xs)
    })
  }

  test("merge is commutative") {
    check(Prop.forAll(rowsGen, rowsGen) { (a, b) =>
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    })
  }
}

/** ScalaCheck invariant for the range-join marker expression: its
  * interpreted eval matches the plain interval predicate for any
  * (point, lo, hi).
  */
class RangeJoinPropertySpec extends AnyFunSuite {
  import org.apache.spark.sql.types.DoubleType

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("marker eval equals p >= lo && p < hi") {
    val d = Gen.chooseNum(-1000.0, 1000.0)
    check(Prop.forAll(d, d, d) { (p, lo, hi) =>
      val e = graft.plans.RangeJoinCond(
        Literal.create(p, DoubleType), Literal.create(lo, DoubleType),
        Literal.create(hi, DoubleType), Literal.create(50.0, DoubleType))
      e.eval(null) == (p >= lo && p < hi)
    })
  }
}

/** ScalaCheck invariants for the threshold levenshtein contract that
  * q_dedup_fuzzy_edit's single-conjunct filter relies on: within the
  * budget the banded form returns the true distance; past it, -1 —
  * never a wrong small number.
  */
class LevenshteinPropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions.{levenshtein, col}
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("threshold levenshtein = full distance under budget, -1 sentinel past it") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOfN(24, Gen.zip(wordGen, wordGen))) { pairs =>
      val rows = pairs.toDF("a", "b")
        .select(levenshtein(col("a"), col("b")).as("full"),
          levenshtein(col("a"), col("b"), 16).as("banded"))
        .collect()
      rows.forall { r =>
        val (full, banded) = (r.getInt(0), r.getInt(1))
        if (full <= 16) banded == full else banded == -1
      }
    })
  }
}

/** The adaptive-LSH width formula is a pure function; its contract —
  * the one that kills the measured exp-2.01 candidate growth — is that
  * expected bucket occupancy n/2^bits stays in (TargetBucket/2,
  * TargetBucket] once the corpus outgrows the 6-bit floor, and the
  * width never shrinks as the corpus grows.
  */
class AdaptiveBitsPropertySpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import sim.Similarity.bitsFor

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  private val nGen: Gen[Long] = Gen.chooseNum(1L, 1L << 40)

  test("width floors at 6 bits and is monotone in corpus size") {
    check(Prop.forAll(nGen, nGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      bitsFor(lo) >= 6 && bitsFor(lo) <= bitsFor(hi)
    })
  }

  test("bucket occupancy is pinned to (4, 8] above the floor") {
    check(Prop.forAll(nGen) { n =>
      val bits = bitsFor(n)
      val occ = n.toDouble / (1L << bits)
      if (bits == 6) occ <= 8.0 // floor region: under-full is expected
      else occ > 4.0 - 1e-9 && occ <= 8.0 + 1e-9
    })
  }
}

/** The span merge is the one piece of the span-dedup pipeline with
  * nontrivial edge cases (exact-adjacency, exact-gap, singleton
  * islands); check it against a reference interval-union over random
  * flagged-position sets.
  */
class SpanMergePropertySpec extends SparkSpec {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  // reference: union of [p, p+7] intervals, merging overlap OR adjacency
  private def refMerge(pos: Seq[Long]): Seq[(Long, Long)] =
    pos.distinct.sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc, p) =>
        val (s0, e0) = (p, p + 7)
        acc.lastOption match {
          case Some((ls, le)) if s0 <= le + 1 => acc.init :+ (ls, math.max(le, e0))
          case _ => acc :+ ((s0, e0))
        }
    }

  private val posGen: Gen[List[Long]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 120L)))

  test("distributed gaps-and-islands merge equals the reference interval union") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(posGen, posGen) { (pa, pb) =>
      val flagged = (pa.map(("a", _)) ++ pb.map(("b", _))).distinct
        .toDF("doc_id", "pos")
      val got = dedup.Dedup.mergeSpans(flagged).collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
        .toMap
      got.getOrElse("a", Nil) == refMerge(pa) &&
        got.getOrElse("b", Nil) == refMerge(pb) &&
        got.values.flatten.forall { case (s0, e0) => e0 - s0 + 1 >= 8 }
    })
  }
}

/** The dHash locality bound q_media_phash_dedup's fixture relies on:
  * a single-byte substitution touches one stripe, hence at most its
  * two adjacent comparisons — Hamming distance ≤ 2 for ANY payload
  * and ANY edit position (length-preserving).
  */
class DHashPropertySpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import graft.media.Multimodal.dHash64

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  // From length 1: sub-64 payloads are zero-padded inside dHash64 so
  // the ≤2-bit single-edit bound holds unconditionally — the floor
  // this generator used to carry (64) would have masked that case.
  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(1, 2048).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126)).map(_.map(_.toByte).toArray))

  test("single-byte substitution flips at most 2 dHash bits") {
    check(Prop.forAll(payloadGen, Gen.chooseNum(0, 1 << 20),
      Gen.chooseNum(32, 126)) { (b, posSeed, nb) =>
      val pos = posSeed % b.length
      val edited = b.clone(); edited(pos) = nb.toByte
      java.lang.Long.bitCount(dHash64(b) ^ dHash64(edited)) <= 2
    })
  }

  test("hash is deterministic and total on empty/short payloads") {
    assert(dHash64(Array.emptyByteArray) == 0L)
    val one = Array[Byte](65)
    assert(dHash64(one) == dHash64(one.clone()))
  }
}
