package graft

import org.apache.spark.sql.Observation

/** Side-channel from query builders to the bench harness for
  * `Observation` metrics (VERDICT r8 item 1: the m14 skew guard's
  * bucket-size evidence must land in the bench stderr, not only be
  * *available* to callers who thread their own Observation through).
  *
  * A gate builder creates a fresh Observation per call, passes it into
  * the operator, and registers it here; after the harness's action
  * completes it drains the queue non-blockingly (`getOrEmpty` — an
  * observation whose query never ran yields nothing rather than
  * hanging the suite). Verify ignores the registry; entries from
  * un-drained runs are overwritten-by-drain at the next bench rep, so
  * the queue cannot grow unboundedly across a suite.
  */
object ObsRegistry {
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Observation)]()

  def register(name: String, o: Observation): Unit = pending.add((name, o))

  /** Completed observations' metrics, oldest first; clears the queue. */
  def drain(): Seq[(String, Map[String, Any])] = {
    val out = collection.mutable.ListBuffer.empty[(String, Map[String, Any])]
    var e = pending.poll()
    while (e != null) {
      val m: Map[String, Any] =
        org.apache.spark.sql.graftbridge.Bridge.observationMetrics(e._2)
      if (m.nonEmpty) out += ((e._1, m))
      e = pending.poll()
    }
    out.toList
  }
}
