package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.EventStreams.SessionState

/** Pure properties of the streaming session interval-merge core
  * ([[EventStreams.absorb]]) — the invariants that make out-of-order
  * and cross-batch arrival safe. */
object SessionAbsorbProps extends Properties("sessionAbsorb") {

  private val gap = 10L
  private val genEvents =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 120L), Gen.chooseNum(-5, 5).map(_.toDouble)))

  private def fold(evs: List[(Long, Double)]): List[SessionState] =
    evs.foldLeft(List.empty[SessionState]) { case (ss, (t, v)) =>
      EventStreams.absorb(ss, t, v, gap)
    }

  private def shape(ss: List[SessionState]) =
    ss.map(s => (s.start, s.last, s.n)).sortBy(x => (x._1, x._2))

  property("session set is arrival-order independent") =
    forAll(genEvents, Gen.long) { (evs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      shape(fold(evs)) == shape(fold(shuffled))
    }

  property("consecutive sessions are separated by at least the gap") =
    forAll(genEvents) { evs =>
      val ss = shape(fold(evs))
      ss.zip(ss.drop(1)).forall { case ((_, lastA, _), (startB, _, _)) =>
        startB - lastA >= gap
      }
    }

  property("event count and value mass are conserved") =
    forAll(genEvents) { evs =>
      val ss = fold(evs)
      ss.map(_.n).sum == evs.size &&
        math.abs(ss.map(_.total).sum - evs.map(_._2).sum) < 1e-6
    }

  property("every event lands inside its session interval") =
    forAll(genEvents) { evs =>
      val ss = shape(fold(evs))
      evs.forall { case (t, _) => ss.exists(s => s._1 <= t && t <= s._2) }
    }
}
