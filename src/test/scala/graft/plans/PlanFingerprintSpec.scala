package graft.plans

import graft.SparkSpec
import graft.operators.QueryCatalog

/** Plan-shape drift gate: every headline (benched) query's normalized
  * physical-plan skeleton must match the committed fingerprint in
  * `src/test/resources/plan_fingerprints.txt` (see
  * [[PlanFingerprint]] for the normalization rules).
  *
  * A silent plan flip — broadcast→sort-merge after a threshold nudge,
  * a lost partial aggregate, an extra exchange, a window losing its
  * group-limit — previously surfaced only as a bench mystery; now it
  * fails here with both skeletons printed. After an INTENTIONAL plan
  * change, regenerate with `sbt "runMain graft.FingerprintGen"` and
  * justify the diff in PLANS.md.
  */
class PlanFingerprintSpec extends SparkSpec {

  private lazy val committed: Map[String, String] = {
    val in = getClass.getResourceAsStream("/plan_fingerprints.txt")
    assert(in != null, "missing resource plan_fingerprints.txt — run " +
      "sbt \"runMain graft.FingerprintGen\"")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    txt.linesIterator.foldLeft(
      (Map.empty[String, String], Option.empty[String],
        new StringBuilder)) {
      case ((acc, cur, sb), line) =>
        if (line.startsWith("#")) (acc, cur, sb)
        else if (line.startsWith("=== ")) {
          val acc2 = cur.fold(acc)(n => acc + (n -> sb.toString))
          (acc2, Some(line.stripPrefix("=== ").trim), new StringBuilder)
        } else (acc, cur, sb.append(line).append('\n'))
    } match {
      case (acc, cur, sb) => cur.fold(acc)(n => acc + (n -> sb.toString))
    }
  }

  test("every benched headline query has a committed plan fingerprint") {
    val missing = graft.Bench.headline
      .filter(QueryCatalog.byName.contains)
      .filterNot(committed.contains)
    assert(missing.isEmpty,
      s"no fingerprint for: ${missing.mkString(", ")} — regenerate with " +
        "sbt \"runMain graft.FingerprintGen\"")
  }

  test("headline plan shapes match the committed fingerprints " +
    "(broadcast/shuffle/agg/window skeleton, no silent drift)") {
    // cache-independent comparison: a cached frame changes reported
    // partitioning (elides exchanges) and stops CombineUnions at the
    // InMemoryRelation boundary (changes union flattening) — observed
    // both in full-suite runs. FingerprintGen clears before every
    // build; compare under the identical discipline, so the skeleton
    // is a pure function of the query regardless of which suites ran
    // first or in what order the comparisons execute.
    val drift = committed.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      QueryCatalog.byName.get(name).map { q =>
        spark.catalog.clearCache()
        val got = PlanFingerprint.of(q.fn(spark, sf0001))
        if (got != want)
          Some(s"--- $name drifted ---\nCOMMITTED:\n$want\nACTUAL:\n$got")
        else None
      }.getOrElse(
        Some(s"--- $name has a fingerprint but is not in the catalog ---"))
    }.flatten
    if (drift.nonEmpty) fail("\n" + drift.mkString("\n"))
  }
}
