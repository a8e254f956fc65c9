package graft

import java.io.File

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Per-query shuffle-read budgets — the regression gate for "a plan grew a
  * new exchange". Round-5 verdict: the measurement existed (`shuffle_mb` in
  * Bench) but nothing failed when a query regressed into a shuffle it
  * didn't have. The budget file pins, per query, the measured warm-run
  * shuffle-read MB plus slack, per scale, with two enforcers:
  *
  *  - `"sf0.01"` — measured by [[graft.ShuffleBudgetSpec]] under the test
  *    session (local[4], 4 shuffle partitions); enforced on every
  *    `sbt test`.
  *  - Bench scales (`"sf0.1"`, `"testdata-sf1"`, …) — measured by [[Bench]]
  *    under its own session (local[32], 32 partitions), section named after
  *    the SF dir; enforced on every bench run at an armed scale, breaches
  *    land in the committed bench JSON as `"shuffle_over_budget"`. A scale
  *    without a section is measured, not gated.
  *
  * Each measurer owns its section: rerunning it with
  * `SPARK_GRAFT_REGEN_BUDGET=1` rebaselines that section only, so the two
  * environments never cross-contaminate each other's numbers. Slack is
  * multiplicative + additive (×1.3 + 0.3 MB): shuffle bytes for a fixed
  * plan on fixed data are stable to a few percent (compression block
  * boundaries, AQE coalescing), while a genuinely new exchange on these
  * tables shows up ≥1 MB even at sf0.01.
  */
object ShuffleBudget {
  val DefaultPath = "SHUFFLE_BUDGET.json"

  def budgetFor(measuredMb: Double): Double =
    math.ceil((measuredMb * 1.3 + 0.3) * 10) / 10

  /** scale -> query -> (measured_mb, budget_mb); empty if the file is absent. */
  def load(path: String = DefaultPath): Map[String, Map[String, (Double, Double)]] = {
    val f = new File(path)
    if (!f.exists()) return Map.empty
    val root = new ObjectMapper().readTree(f)
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala.map { q =>
        q.getKey -> ((q.getValue.get("measured_mb").asDouble(),
          q.getValue.get("budget_mb").asDouble()))
      }.toMap
    }.toMap
  }

  /** Replace one scale's section, preserving the others. */
  def saveSection(scale: String, measuredMb: Map[String, Double],
      path: String = DefaultPath): Unit = {
    val all = load(path) + (scale -> measuredMb.map { case (k, m) =>
      k -> ((math.round(m * 10) / 10.0, budgetFor(m)))
    })
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    all.toSeq.sortBy(_._1).foreach { case (sc, qs) =>
      val sec = root.putObject(sc)
      qs.toSeq.sortBy(_._1).foreach { case (q, (meas, bud)) =>
        val n: ObjectNode = sec.putObject(q)
        n.put("measured_mb", meas)
        n.put("budget_mb", bud)
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  /** Breaches: (query, measured_mb, budget_mb). Queries without a budget
    * entry are breaches too (measured vs -1) — adding a query without
    * rebaselining must fail loudly, not silently widen the surface.
    */
  def check(scale: String, measuredMb: Map[String, Double],
      path: String = DefaultPath): Seq[(String, Double, Double)] = {
    val section = load(path).getOrElse(scale, Map.empty)
    if (section.isEmpty) return Seq.empty // no file/section: gate not armed
    measuredMb.toSeq.sortBy(_._1).flatMap { case (q, m) =>
      section.get(q) match {
        case None => Some((q, math.round(m * 10) / 10.0, -1.0))
        case Some((_, bud)) if m > bud => Some((q, math.round(m * 10) / 10.0, bud))
        case _ => None
      }
    }
  }
}
