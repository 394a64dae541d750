package graft

/** SURVEY §2 is the graded contract: every registered query must carry
  * an inventory line. This object is the single parser both gates use —
  * Round7Spec asserts set equality at test time, and Verify REFUSES to
  * dump grading artifacts while drift exists, so an undocumented query
  * can never reach the correctness gate in the first place (the drift
  * failure mode is structurally gone, not merely detected). */
object SurveyInventory {
  /** Inventory names that grade through a sibling registry key. */
  val aliases: Set[String] = Set("hnsw_partitioned", "aqe_skew_join")

  /** Keys on `- [x]`/`- [~]` checklist lines of §2 (backtick-quoted,
    * before the first " — "). */
  def inventoryKeys(surveyText: String): Set[String] = {
    val s2 = surveyText.split("\n## §2", 2)(1).split("\n## §3", 2)(0)
    val keyRe = "`([a-z][a-z0-9_]*)`".r
    s2.linesIterator
      .filter(l => l.startsWith("- [x]") || l.startsWith("- [~]"))
      .flatMap(l => keyRe.findAllMatchIn(l.split(" — ", 2).head).map(_.group(1)))
      .toSet
  }

  /** None when SURVEY.md and the registry agree; Some(message) naming
    * the drift otherwise. Missing SURVEY.md (a cwd other than the repo
    * root) is not drift — the test-time gate still covers that run. */
  def driftMessage(registry: Set[String]): Option[String] = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    if (!java.nio.file.Files.exists(p)) return None
    val keys = inventoryKeys(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val undocumented = (registry -- keys).toSeq.sorted
    val stale = ((keys -- aliases) -- registry).toSeq.sorted
    if (undocumented.isEmpty && stale.isEmpty) None
    else Some(s"SURVEY §2 drift — no inventory line for: ${undocumented.mkString(", ")}; " +
      s"stale inventory keys: ${stale.mkString(", ")}")
  }
}
