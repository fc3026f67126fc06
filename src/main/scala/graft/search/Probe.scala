package graft.search

import scala.collection.concurrent.TrieMap

/** Lightweight wall-clock probe for the search's driver-side loop — the
  * search is job-count bound, so optimization work starts from this
  * breakdown (enabled by CdfcTimer; zero overhead otherwise).
  */
object Probe {
  @volatile var enabled = false
  val times: TrieMap[String, (Long, Long)] = TrieMap.empty

  def time[A](key: String)(f: => A): A =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f finally {
        val dt = System.nanoTime() - t0
        times.updateWith(key) {
          case Some((n, t)) => Some((n + 1, t + dt))
          case None         => Some((1L, dt))
        }
      }
    }

  def report(): Seq[String] =
    times.toSeq.sortBy(-_._2._2).map { case (k, (n, ns)) =>
      f"$k%-28s calls=$n%3d total=${ns / 1e9}%6.2f s"
    }
}
