package graft

/** Diffs every registered query's shape-normalized plan fingerprint
  * against the committed docs/plan_fingerprints.json (VERDICT r7
  * item 5): a refactor that silently changes a plan — lost pushdown,
  * join strategy flip, new exchange — fails HERE with the offending
  * query names instead of surfacing as a bench regression a round
  * later. Intentional plan changes regenerate the file:
  * `sbt "runMain graft.PlanFingerprints"` and commit it alongside the
  * change. */
class PlanFingerprintSpec extends SparkSpec {

  test("every query's plan shape matches the committed fingerprint") {
    val path = java.nio.file.Paths.get(PlanFingerprints.Path)
    assert(java.nio.file.Files.isRegularFile(path),
      s"${PlanFingerprints.Path} missing — run `sbt \"runMain graft.PlanFingerprints\"` and commit it")
    val committed = java.nio.file.Files.readString(path)
      .linesIterator.flatMap { l =>
        "\"([^\"]+)\": \"([0-9a-f]{64})\"".r.findFirstMatchIn(l)
          .map(m => m.group(1) -> m.group(2))
      }.toMap
    val current = PlanFingerprints.all(spark).toMap
    val missing = current.keySet -- committed.keySet
    val stale = committed.keySet -- current.keySet
    val changed = (current.keySet & committed.keySet)
      .filter(k => current(k) != committed(k)).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty && changed.isEmpty,
      s"plan fingerprints drifted — if intentional, regenerate via " +
        s"`sbt \"runMain graft.PlanFingerprints\"` and commit. " +
        s"missing=${missing.toSeq.sorted} stale=${stale.toSeq.sorted} changed=$changed")
    // no two queries may share a fingerprint (VERDICT r11 item 6: the
    // graph kernels once committed ONE identical hash — vacuous as a
    // regression gate and blind to a cross-query mixup)
    val dupes = current.groupBy(_._2).filter(_._2.size > 1)
      .values.map(_.keys.toSeq.sorted).toSeq
    assert(dupes.isEmpty, s"queries sharing a fingerprint: $dupes")
  }

  test("every driver-eager query hashes a feeder plan") {
    // a query whose heavy lifting runs before a driver-side collect
    // would otherwise hash only its trivial post-collect plan — the
    // aux mechanism must cover the full eager list
    val missing = PlanFingerprints.EagerQueries.filterNot(n =>
      PlanFingerprints.auxPlan(n, spark, PlanFingerprints.SfDir).isDefined)
    assert(missing.isEmpty, s"eager queries without an aux feeder plan: $missing")
    // and the list itself must track the registry (a renamed query
    // would silently drop out of the aux dispatch otherwise)
    val unknown = PlanFingerprints.EagerQueries.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"EagerQueries names not in the registry: $unknown")
  }
}
