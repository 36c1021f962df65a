package graft

/** Probe-only environment flags that swap a gated query's data source
  * (codec-free generator paths for 100× scale probes). They exist so a
  * ColdTime/TimeQuery probe can price the machinery under test without a
  * codec constant — but a Verify or Bench run with one set would grade the
  * WRONG path under the documented gate id. The graded entry points refuse
  * to start while any is set (advice finding, r16).
  */
object ProbeFlags {
  /** Every probe-mode source-swap flag; extend when adding one. */
  val all: Seq[String] = Seq(
    "SPARK_GRAFT_PHASH_DIRECT",
    "SPARK_GRAFT_AUDIOFP_DIRECT",
    "SPARK_GRAFT_AUDIO_DIRECT")

  /** Fail fast if any probe flag is set — called by the graded mains. */
  def refuse(entry: String): Unit = {
    val set = all.filter(sys.env.contains)
    require(set.isEmpty,
      s"$entry: probe-only flag(s) ${set.mkString(", ")} are set — these " +
        "swap gated data sources and are valid only for ColdTime/TimeQuery " +
        "scale probes; unset them for graded runs")
  }
}
