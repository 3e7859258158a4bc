package graft

import graft.functions.CosineSimilarity
import graft.ops.UdfOps
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property suite (SURVEY §5): algebraic laws of the custom numeric kernels,
  * checked on ScalaCheck-generated inputs — these are the pieces with
  * hand-written math (codegen'd cosine, Welford weighted mean) where a
  * subtle sign/order bug would poison every downstream K-query.
  * (ScalaCheck is driven through its own runner: the scalatestplus bridge
  * is not in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(2, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100f, 100f)).map(_.toArray))

  test("resolveClusters equals a local union-find on random graphs") {
    // the distributed min-label propagation (pointer-jumping, O(log n)
    // rounds) must agree with the textbook sequential answer on arbitrary
    // topology — seeded so the run is deterministic; a handful of dense-ish
    // graphs rather than 100 tiny ones (each check spins Spark jobs)
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { trial =>
      val n = 60 + trial * 40
      val nEdges = n / 2 + rnd.nextInt(n)
      val pairs = Seq.fill(nEdges) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // sequential oracle: path-compressing union-find, then min-relabel
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val minOfRoot = touched.groupBy(v => find(v.toInt)).flatMap {
        case (_, members) => members.map(_ -> members.min)
      }
      val got = graft.ops.LlmOps.resolveClusters(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === minOfRoot, s"trial $trial (n=$n, edges=${pairs.length})")
    }
  }

  test("cosine(v, v) == 1 for non-zero v") {
    check("self-cosine", Prop.forAll(vecGen) { v =>
      !v.exists(x => math.abs(x) > 1e-3f) ||
        math.abs(CosineSimilarity.compute(v, v) - 1.0) < 1e-9
    })
  }

  test("cosine is symmetric") {
    check("symmetry", Prop.forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val x = a.take(n); val y = b.take(n)
      CosineSimilarity.compute(x, y) == CosineSimilarity.compute(y, x)
    })
  }

  test("cosine is bounded in [-1, 1] (up to fp slack)") {
    check("bounds", Prop.forAll(vecGen, vecGen) { (a, b) =>
      val c = CosineSimilarity.compute(a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9
    })
  }

  test("cosine is scale-invariant for positive scaling") {
    check("scale-invariance", Prop.forAll(vecGen, Gen.choose(0.1f, 10f)) { (v, s) =>
      !v.exists(x => math.abs(x) > 1e-3f) ||
        math.abs(CosineSimilarity.compute(v, v.map(_ * s)) - 1.0) < 1e-6
    })
  }

  test("cosine of zero vector is 0 (guarded, not NaN)") {
    assert(CosineSimilarity.compute(Array(0f, 0f), Array(1f, 2f)) === 0.0)
    assert(!CosineSimilarity.compute(Array(0f, 0f), Array(0f, 0f)).isNaN)
  }

  private val weightedGen: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.choose(-1e6, 1e6)
      w <- Gen.choose(0.1, 100.0)
    } yield (x, w))

  private def fold(zs: List[(Double, Double)]): UdfOps.WBuf =
    zs.foldLeft(UdfOps.WeightedMean.zero) { case (b, (x, w)) =>
      UdfOps.WeightedMean.reduce(b, UdfOps.WIn(x, w))
    }

  test("WeightedMean reduce chain equals sum(x*w)/sum(w)") {
    check("welford-direct", Prop.forAll(weightedGen) { xs =>
      val got = UdfOps.WeightedMean.finish(fold(xs))
      val direct = xs.map { case (x, w) => x * w }.sum / xs.map(_._2).sum
      math.abs(got - direct) <= 1e-8 * math.max(1.0, math.abs(direct))
    })
  }

  test("WeightedMean merge of split partials equals single-pass result") {
    check("welford-merge", Prop.forAll(weightedGen, weightedGen) { (xs, ys) =>
      val merged = UdfOps.WeightedMean.finish(
        UdfOps.WeightedMean.merge(fold(xs), fold(ys)))
      val whole = UdfOps.WeightedMean.finish(fold(xs ++ ys))
      math.abs(merged - whole) <= 1e-8 * math.max(1.0, math.abs(whole))
    })
  }
}
