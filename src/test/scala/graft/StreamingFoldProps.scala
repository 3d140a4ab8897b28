package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The order-sensitive state spectrum's batch↔stream identities, pinned
  * as pure-JVM laws over the WHOLE random input space (the real-data
  * battery rows hash-prove them on one corpus; these prove the algebra):
  *
  *  1. absorbing walk (d231/d232): the sequential SPRT fold — stop at
  *     the first crossing, ignore everything after — equals the batch
  *     plan's declarative extraction (min crossing index over prefix
  *     sums), for any step sequence and any bounds;
  *  2. running clamp (d202/d214): the Lindley recursion
  *     b_t = max(0, b_{t−1} + δ) equals the reflection identity
  *     S_t − min(0, runmin(S));
  *  3. incremental packing (d59/d238): the one-Long running-count fold
  *     assigns every row the bin the exclusive-prefix-div window plan
  *     does, under ANY batch split (state crossing micro-batch
  *     boundaries is exactly a split);
  *  4. interval merge (d209/d213): the open-span fold over lo-sorted
  *     intervals equals the running-max island plan.
  */
object StreamingFoldProps extends Properties("StreamingFolds") {

  private val stepsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-5L, 5L))

  property("absorbing SPRT fold == first-crossing extraction") =
    forAll(stepsGen, Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)) {
      (steps, hi, loMag) =>
        val lo = -loMag
        // sequential absorbing fold (the d232 stream semantics)
        var cum = 0L; var n = 0L
        var dec: Option[(String, Long, Long)] = None
        steps.foreach { s =>
          if (dec.isEmpty) {
            cum += s; n += 1
            if (cum >= hi) dec = Some(("accept", n, cum))
            else if (cum <= lo) dec = Some(("reject", n, cum))
          }
        }
        val fold = dec.getOrElse(("open", n, cum))
        // batch extraction (the d231 window plan): prefix sums + min
        // crossing seq; absorption falls out of taking the FIRST crossing
        val prefix = steps.scanLeft(0L)(_ + _).tail
        val xseq = prefix.indexWhere(c => c >= hi || c <= lo)
        val batch =
          if (xseq < 0) ("open", steps.length.toLong, prefix.last)
          else (if (prefix(xseq) >= hi) "accept" else "reject",
            (xseq + 1).toLong, prefix(xseq))
        fold == batch
    }

  property("Lindley clamp fold == reflection identity") =
    forAll(stepsGen) { deltas =>
      var bal = 0L
      val fold = deltas.map { d => bal = math.max(0L, bal + d); bal }
      val prefix = deltas.scanLeft(0L)(_ + _).tail
      val runmin = prefix.scanLeft(Long.MaxValue)(math.min).tail
      val closed = prefix.zip(runmin).map { case (s, mn) =>
        s - math.min(0L, mn)
      }
      fold == closed
    }

  property("incremental pack fold == exclusive-prefix-div, under any batch split") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L)),
      Gen.chooseNum(1L, 30L), Gen.chooseNum(0, 50)) { (ntoks, budget, cutRaw) =>
      // batch plan: bin = exclusive running sum div budget
      val excl = ntoks.scanLeft(0L)(_ + _).init
      val batch = excl.map(_ / budget)
      // stream fold, state carried across a split at an arbitrary point
      val cut = cutRaw % (ntoks.length + 1)
      var cum = 0L
      def fold(part: List[Long]): List[Long] = part.map { t =>
        val bin = cum / budget; cum += t; bin
      }
      val stream = fold(ntoks.take(cut)) ++ fold(ntoks.drop(cut))
      stream == batch
    }

  property("open-span merge fold == running-max island plan") =
    forAll(Gen.nonEmptyListOf(for {
      lo <- Gen.chooseNum(0L, 100L)
      len <- Gen.chooseNum(0L, 20L)
    } yield (lo, lo + len))) { raw =>
      val sp = raw.sortBy(identity)
      // fold: extend the open span while lo <= maxHi, else close it
      var open: Option[(Long, Long, Long)] = None
      val folded = collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      sp.foreach { case (lo, hi) =>
        open match {
          case Some((slo, shi, n)) if lo <= shi =>
            open = Some((slo, math.max(shi, hi), n + 1))
          case Some(done) =>
            folded += done; open = Some((lo, hi, 1L))
          case None => open = Some((lo, hi, 1L))
        }
      }
      open.foreach(folded += _)
      // batch: island breaks where lo > max of all PRIOR ends
      val priorMax = sp.map(_._2).scanLeft(Long.MinValue)(math.max).init
      val isl = sp.zip(priorMax).scanLeft(0L) {
        case (i, ((lo, _), pm)) => if (pm == Long.MinValue || lo > pm) i + 1 else i
      }.tail
      val batch = sp.zip(isl).groupBy(_._2).toList.sortBy(_._1).map {
        case (_, rows) =>
          (rows.map(_._1._1).min, rows.map(_._1._2).max, rows.length.toLong)
      }
      folded.toList == batch
    }
}
