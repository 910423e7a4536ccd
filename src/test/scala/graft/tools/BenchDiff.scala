// Regression gate for the committed bench artifact:
//   sbt "Test/runMain graft.tools.BenchDiff [artifact]"
// Compares the WORKING-TREE artifact (a fresh Bench run) against the
// version committed at HEAD (git show) and fails on regressions.
package graft.tools

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Per-query bench regression gate — run before a round's close commit:
  * a query counts as REGRESSED when it is BOTH >30% and >0.3 s slower
  * than the committed artifact (single-query drift on a shared box is
  * ±25% one-signed; the absolute floor keeps millisecond queries from
  * tripping the ratio). Exits non-zero with the offender list; new and
  * removed queries are reported informationally.
  *
  * ANCHOR NORMALIZATION (VERDICT r15 #7): shared-box sessions drift ±2×
  * as a whole (r14 dedup_keep_best, the r15 82.2 s baseline — both
  * box state, not plans). Seconds are divided by the session drift
  * factor — fresh(anchor)/committed(anchor) for [[Anchor]], a fast
  * stable-plan query — before gating, and BOTH raw and normalized deltas
  * print, so a diff separates plan changes from box state mechanically.
  * The factor is clamped to [0.5, 2]: a drift estimate outside that says
  * the anchor itself changed, and trusting it would mask real
  * regressions. */
object BenchDiff {

  val RatioGate = 1.30
  val AbsGateSec = 0.30
  val Anchor = "knn_topk"

  private def queriesOf(json: String): Map[String, Double] = {
    val root = new ObjectMapper().readTree(json)
    val q = root.get("queries")
    require(q != null, "artifact has no \"queries\" map")
    q.properties().asScala
      .map(e => e.getKey -> e.getValue.get("sec").asDouble()).toMap
  }

  /** Per-query spill MB — absent in pre-spill-column artifacts → empty. */
  private def spillOf(json: String): Map[String, Double] = {
    val root = new ObjectMapper().readTree(json)
    val q = root.get("queries")
    if (q == null) Map.empty
    else q.properties().asScala.flatMap { e =>
      Option(e.getValue.get("spill_mb")).map(v => e.getKey -> v.asDouble())
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val artifact = if (args.length > 0) args(0) else "bench/bench_sf0.1.json"
    val committed = {
      val p = new ProcessBuilder("git", "show", s"HEAD:$artifact")
        .redirectErrorStream(false).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      require(p.waitFor() == 0, s"git show HEAD:$artifact failed — not committed yet?")
      out
    }
    val fresh = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(artifact)),
      java.nio.charset.StandardCharsets.UTF_8)
    val base = queriesOf(committed)
    val now = queriesOf(fresh)
    // session drift factor from the anchor query (see scaladoc); 1.0 when
    // the anchor is absent on either side or the estimate is implausible
    val drift: Double = (base.get(Anchor), now.get(Anchor)) match {
      case (Some(b), Some(n)) if b > 0 =>
        val d = n / b
        if (d >= 0.5 && d <= 2.0) d else {
          println(f"anchor $Anchor moved ${d}%.2fx — outside the plausible " +
            "box-drift band, normalization disabled (did its plan change?)")
          1.0
        }
      case _ => 1.0
    }
    if (drift != 1.0)
      println(f"session drift (anchor $Anchor): ${drift}%.2fx — gating on " +
        "anchor-normalized seconds; raw deltas shown alongside")
    val regressed = now.toSeq.sortBy(_._1).flatMap { case (q, sec) =>
      base.get(q).collect {
        case b if sec / drift > b * RatioGate && sec / drift - b > AbsGateSec =>
          (q, b, sec)
      }
    }
    val added = (now.keySet -- base.keySet).toSeq.sorted
    val removed = (base.keySet -- now.keySet).toSeq.sorted
    if (added.nonEmpty) println(s"new queries (no baseline): ${added.mkString(", ")}")
    if (removed.nonEmpty) println(s"missing vs baseline: ${removed.mkString(", ")}")
    val totB = base.values.sum
    val totN = now.filterKeys(base.contains).values.sum
    println(f"shared-query total: committed $totB%.1f s -> fresh $totN%.1f s (normalized ${totN / drift}%.1f s at drift ${drift}%.2fx; ${now.size} fresh / ${base.size} committed)")
    // Spill policy (VERDICT r12 item 5): moderate drift is FLAGGED (spill
    // bytes vary with box memory pressure — the 12.3x-vs-4.5x
    // dedup_ngram_capped variance this column exists to make visible),
    // but a query that goes from essentially-no-spill to >1 GB at fixture
    // scale is a PLAN regression, not noise — that is the class the
    // ObjectHashAggregate threshold fix repaired a round late because the
    // gate only printed. Fail it.
    val SpillFailFreshMb = 1024.0
    val SpillFailBaseMb = 100.0
    // The hard gate is calibrated for the sf0.1 fixture artifact, where
    // ANY GB-scale spill is a plan regression. Scale artifacts
    // (bench_sf1/3/10/30) legitimately carry GB-level spill with
    // box-dependent variance — there the gate only REPORTS (ADVICE r13).
    val hardGate = artifact.endsWith("bench_sf0.1.json")
    val spillBase = spillOf(committed)
    val spillNow = spillOf(fresh)
    val spillFailed = spillNow.toSeq.sortBy(_._1).flatMap { case (q, mb) =>
      val b = spillBase.getOrElse(q, 0.0)
      if (hardGate && b < SpillFailBaseMb && mb > SpillFailFreshMb) Some((q, b, mb))
      else {
        if (mb > 10.0 && mb > b * 2.0)
          println(f"SPILL (informational) $q: $b%.1f MB -> $mb%.1f MB")
        None
      }
    }
    spillFailed.foreach { case (q, b, mb) =>
      println(f"SPILL REGRESSED $q: $b%.1f MB -> $mb%.1f MB (started spilling >1 GB)")
    }
    if (regressed.isEmpty && spillFailed.isEmpty)
      println(s"OK: no query >${((RatioGate - 1) * 100).toInt}% and >$AbsGateSec s slower; no 0->1GB spill onset")
    else {
      regressed.foreach { case (q, b, n) =>
        println(f"REGRESSED $q: $b%.3f s -> $n%.3f s raw (${(n / b - 1) * 100}%.0f%%), ${n / drift}%.3f s normalized (${(n / drift / b - 1) * 100}%.0f%%)")
      }
      sys.exit(1)
    }
  }
}
