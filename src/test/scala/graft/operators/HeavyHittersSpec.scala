package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkHarness

/** HeavyHitters: the MG sketch guarantee, and exactness/determinism
  * of the two-pass result against the naive full groupBy — across
  * partition counts (the sketch estimates vary with partitioning;
  * the recounted result must not).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkHarness.spark

  /** Zipf-ish stream: item i appears ~N/(i+1) times, shuffled. */
  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    rnd.shuffle((0 until n).flatMap(i =>
      Seq.fill(n / (i + 1))(s"item$i")))
  }

  test("misraGries: any item with freq > n/(k+1) survives; est ≤ freq") {
    val items = zipf(200, seed = 1)
    val exact = items.groupBy(identity).map { case (x, xs) =>
      x -> xs.size.toLong }
    val k = 15
    val (sketch, n) = HeavyHitters.misraGries(items.iterator, k)
    assert(n == items.size)
    val floor = n / (k + 1)
    exact.foreach { case (x, f) =>
      if (f > floor) assert(sketch.contains(x), s"$x freq=$f floor=$floor")
      sketch.get(x).foreach { est =>
        assert(est <= f && est >= f - floor, s"$x est=$est f=$f")
      }
    }
    assert(sketch.size <= k)
  }

  test("exactByFraction == naive groupBy HAVING, stable across partitioning") {
    val s = spark
    import s.implicits._
    val data = zipf(500, seed = 7)
    val naive = data.groupBy(identity).collect {
      case (x, xs) if xs.size >= math.ceil(0.005 * data.size) =>
        x -> xs.size.toLong
    }.toMap
    assert(naive.nonEmpty)
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toDF("tok").repartition(parts)
      val got = HeavyHitters.exactByFraction(df, "tok", 0.005, k = 1023)
        .as[(String, Long)].collect().toMap
      assert(got == naive, s"parts=$parts")
    }
  }

  test("random streams: exact == naive across k and fraction (property)") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    // heavy skew + uniform tail mixed: some items above threshold,
    // many near it — the boundary regime
    val streamGen = for {
      nHeavy <- Gen.chooseNum(0, 3)
      heavy <- Gen.listOfN(nHeavy, Gen.chooseNum(0, 4))
      tail <- Gen.listOfN(300, Gen.chooseNum(0, 40))
    } yield (heavy.flatMap(h => List.fill(60)(s"h$h")) ++
      tail.map(t => s"t$t"))
    new graft.PropertyHarness {}.forAllSampled(streamGen, n = 10) { items =>
      for ((frac, k) <- Seq((0.05, 63), (0.1, 31))) {
        val minCount = math.ceil(frac * items.size).toLong
        val naive = items.groupBy(identity).collect {
          case (x, xs) if xs.size >= minCount => x -> xs.size.toLong
        }.toMap
        val got = HeavyHitters.exactByFraction(
            items.toDF("tok").repartition(5), "tok", frac, k)
          .as[(String, Long)].collect().toMap
        assert(got == naive, s"frac=$frac k=$k n=${items.size}")
      }
    }
  }

  test("completeness floor is enforced loudly") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "b").toDF("tok")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactByFraction(df, "tok", 0.001, k = 63)
    }
    assert(e.getMessage.contains("1/(k+1)"))
  }

  test("empty input and all-null column yield empty result") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[String].toDF("tok")
    assert(HeavyHitters.exactByFraction(empty, "tok", 0.01).count() == 0)
    val nulls = Seq[Option[String]](None, None).toDF("tok")
    assert(HeavyHitters.exactByFraction(nulls, "tok", 0.01).count() == 0)
  }
}
