package graft

import graft.core._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for window-assignment laws (SURVEY.md §5: ScalaCheck for
  * coder/window-assignment invariants).
  */
object WindowLawsProps extends Properties("WindowLaws") {

  private val tsGen = Gen.chooseNum(0L, 10_000_000L)
  private val sizeGen = Gen.chooseNum(1L, 100_000L)

  property("fixed: element is inside its window; aligned; exactly one") =
    forAll(tsGen, sizeGen) { (ts, size) =>
      val ws = FixedWindows(size).assign(ts)
      ws.size == 1 && {
        val w = ws.head.asInstanceOf[IntervalWindow]
        w.start <= ts && ts < w.end && (w.end - w.start) == size && w.start % size == 0
      }
    }

  property("sliding: element in every window; window count = size/period") =
    forAll(tsGen, Gen.chooseNum(1L, 50L), Gen.chooseNum(1L, 20L)) { (ts, periodK, mult) =>
      val period = periodK * 100
      val size = period * mult
      val ws = SlidingWindows(size, period).assign(ts).map(_.asInstanceOf[IntervalWindow])
      ws.size == mult &&
        ws.forall(w => w.start <= ts && ts < w.end && (w.end - w.start) == size) &&
        ws.map(_.start).distinct.size == ws.size
    }

  property("sessions merge: outputs disjoint, cover inputs, respect the gap") =
    forAll(Gen.nonEmptyListOf(tsGen), Gen.chooseNum(1L, 50_000L)) { (tss, gap) =>
      val fn = Sessions(gap)
      val assigned = tss.map(ts => fn.assign(ts).head)
      val mapping = fn.mergeWindows(assigned)
      val merged = mapping.values.toSeq.distinct.map(_.asInstanceOf[IntervalWindow])
        .sortBy(_.start)
      val disjoint = merged.sliding(2).forall {
        case Seq(a, b) => a.end <= b.start
        case _ => true
      }
      val covered = assigned.forall { w =>
        val m = mapping(w).asInstanceOf[IntervalWindow]
        val iw = w.asInstanceOf[IntervalWindow]
        m.start <= iw.start && iw.end <= m.end
      }
      // within a merged window, consecutive event gaps are < gap
      val gapLaw = merged.forall { m =>
        val inside = tss.filter(t => m.start <= t && t < m.end).sorted
        inside.sliding(2).forall {
          case Seq(a, b) => b - a < gap
          case _ => true
        }
      }
      disjoint && covered && gapLaw
    }

  property("minhash jaccard estimate tracks true jaccard within 0.25") = {
    import org.apache.spark.sql.functions._
    val s = SparkTestBase.spark
    import s.implicits._
    forAll(Gen.chooseNum(0, 20), Gen.chooseNum(5, 25)) { (shared, unique) =>
      // two sets with `shared` common tokens and `unique` distinct each
      val a = (0 until shared).map(i => s"c$i") ++ (0 until unique).map(i => s"a$i")
      val b = (0 until shared).map(i => s"c$i") ++ (0 until unique).map(i => s"b$i")
      val trueJ = shared.toDouble / (shared + 2 * unique)
      val est = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.Hashing.minHashJaccard(
          graft.plans.NativeExpressions.minHashSignature(col("a"), 128),
          graft.plans.NativeExpressions.minHashSignature(col("b"), 128)).as("j"))
        .first().getDouble(0)
      math.abs(est - trueJ) <= 0.25
    }
  }

  property("windowed value explode keeps value and timestamp") =
    forAll(tsGen, Gen.chooseNum(1L, 10L)) { (ts, n) =>
      val wv = WindowedValue("v", ts,
        (0L until n).map(i => IntervalWindow(i * 100, i * 100 + 100)))
      val ex = wv.explode
      ex.size == n && ex.forall(e => e.value == "v" && e.timestamp == ts && e.windows.size == 1)
    }
}
