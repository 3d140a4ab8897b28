package graft

import graft.operators.EvalMetrics
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** PAV laws on random weighted censuses, pure JVM (no Spark):
  *
  *  1. stack PAV == the minimax closed form fit(t) = max_{i<=t}
  *     min_{j>=t} avg(y[i..j]) — the identity d219's oracle runs in SQL,
  *     pinned here across the whole random input space;
  *  2. the two-level decomposition lemma isotonicFit's distribution
  *     rests on: PAV(PAV(left) ++ PAV(right)) == PAV(all) for EVERY
  *     split point;
  *  3. monotonicity and per-pool mass conservation.
  */
object EvalMetricsProps extends Properties("EvalMetricsPav") {

  private type Block = (Double, Double, Long, Long)

  private val censusGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      n <- Gen.chooseNum(1L, 50L)
      sy <- Gen.chooseNum(0L, 50L)
    } yield (n, math.min(sy, n)))

  private def blocks(c: List[(Long, Long)]): List[Block] =
    c.zipWithIndex.map { case ((n, sy), i) => (i.toDouble, i.toDouble, n, sy) }

  private def fitted(c: List[(Long, Long)]): List[Double] = {
    val pooled = EvalMetrics.pavBlocks(blocks(c).iterator)
    c.indices.map { i =>
      val b = pooled.find(bl => bl._1 <= i && i <= bl._2).get
      b._4.toDouble / b._3
    }.toList
  }

  private def minimax(c: List[(Long, Long)]): List[Double] = {
    val n = c.map(_._1).toArray; val sy = c.map(_._2).toArray
    val v = c.length
    (0 until v).map { t =>
      (0 to t).map { i =>
        (t until v).map { j =>
          val nn = (i to j).map(n).sum; val ss = (i to j).map(sy).sum
          ss.toDouble / nn
        }.min
      }.max
    }.toList
  }

  property("stack PAV equals the minimax closed form") =
    forAll(censusGen) { c => fitted(c) == minimax(c) }

  property("two-level decomposition: PAV(PAV(L) ++ PAV(R)) == PAV(all)") =
    forAll(censusGen, Gen.chooseNum(0, 100)) { (c, cutRaw) =>
      val cut = cutRaw % (c.length + 1)
      val (l, r) = blocks(c).splitAt(cut)
      val twoLevel = EvalMetrics.pavBlocks(
        (EvalMetrics.pavBlocks(l.iterator) ++
          EvalMetrics.pavBlocks(r.iterator)).iterator)
      twoLevel.toList == EvalMetrics.pavBlocks(blocks(c).iterator).toList
    }

  property("fit is monotone non-decreasing") =
    forAll(censusGen) { c =>
      val f = fitted(c)
      f.zip(f.drop(1)).forall { case (a, b) => a <= b }
    }

  property("each pool's fitted value is its exact pooled mean") =
    forAll(censusGen) { c =>
      EvalMetrics.pavBlocks(blocks(c).iterator).forall { case (lo, hi, n, sy) =>
        val idx = (lo.toInt to hi.toInt)
        n == idx.map(i => c(i)._1).sum && sy == idx.map(i => c(i)._2).sum
      }
    }
}
