package graft.archive

import scala.collection.immutable.SortedSet

/** Driver-side query planning that the reference performs in its HTTP
  * controller (Api10Controller.java:382-518): pick the decimation level
  * whose period best matches the requested sample count, then fall back
  * to coarser levels for time ranges the chosen level's retention no
  * longer covers. This is *planning-time* logic (it decides which
  * tables/predicates go into the DataFrame), mirroring SURVEY.md §4's
  * conclusion that it does not belong in Catalyst.
  */
object ResolutionPlanner {

  /** Pick the decimation level (by period, seconds; 0 = raw) for a
    * request of `count` samples over [startNs, endNs] —
    * Api10Controller.java:396-442. Prefer the level with the largest
    * period <= the "perfect" period; accept the next-longer period
    * instead when it is closer and within 5% tolerance.
    */
  def selectLevel(availablePeriodsSec: Iterable[Long], startNs: Long,
                  endNs: Long, count: Option[Long]): Long = {
    val levels = SortedSet.from(availablePeriodsSec)
    count match {
      case None => 0L
      case Some(c) if c <= 0 => 0L
      case Some(c) =>
        val perfect = (endNs - startNs).toDouble / c / 1e9
        val shorter = levels.rangeTo(perfect.toLong).lastOption
        val longer = levels.rangeFrom(perfect.toLong + 1).headOption
        (shorter, longer) match {
          case (None, None) => 0L
          case (Some(s), None) => s
          case (None, Some(l)) => l
          case (Some(s), Some(l)) =>
            // prefer the shorter period unless the longer one is within
            // 5% of perfect and strictly closer
            val shorterDiff = perfect - s
            val longerDiff = l - perfect
            if (longerDiff < 0.05 * perfect && longerDiff < shorterDiff) l else s
        }
    }
  }

  /** Retention fallback plan: given the chosen level and each level's
    * earliest available sample time, produce (period, fromNs, toNs)
    * segments coarse→fine covering [startNs, endNs] without overlap —
    * Api10Controller.java:446-518 re-expressed declaratively. Levels
    * with no data are skipped; segments are clipped so each coarser
    * level only contributes time strictly before the finer level's
    * earliest sample.
    */
  def fallbackSegments(chosenPeriod: Long,
                       earliestByPeriod: Map[Long, Long],
                       coarserPeriods: Seq[Long],
                       startNs: Long, endNs: Long): Seq[(Long, Long, Long)] = {
    var segments = List.empty[(Long, Long, Long)]
    var end = endNs
    var covered = false
    val chain = chosenPeriod +: coarserPeriods.filter(_ > chosenPeriod).sorted
    for (p <- chain if !covered && end >= startNs) {
      earliestByPeriod.get(p).foreach { earliest =>
        if (earliest <= end) {
          val from = math.max(startNs, earliest)
          segments = (p, from, end) :: segments
          end = from - 1
          if (earliest <= startNs) covered = true
        }
      }
    }
    segments.sortBy(_._2)
  }
}
