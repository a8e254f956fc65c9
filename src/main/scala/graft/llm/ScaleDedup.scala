package graft.llm

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-path dedup companions to [[LlmQueries]]: benchmark decontamination
  * by exact token-span overlap, and the fully distributed connected-components
  * clustering that replaces the driver union-find of `dedup_cluster` when the
  * near-dup pair graph outgrows driver memory (the cutover its guard names).
  */
object ScaleDedup {
  import Tables._
  import graft.functions.{CrossHash => H}

  /** Span length for decontamination (tokens per exact-match window). */
  private val SpanLen = 5

  val queries: Seq[Q] = Seq(

    // Benchmark decontamination: which corpus docs (doc_id ≥ 10) contain an
    // exact 5-token span that also appears in the "benchmark" set
    // (doc_id < 10)? The standard train-set hygiene operator. Spark side:
    // one posexplode + per-token polynomial hash, then a single window pass
    // turns token hashes into rolling span hashes (lead(h,k) — no
    // re-tokenization per span), and the span join is against the DISTINCT
    // benchmark spans, a tiny broadcast side at any corpus scale: cost is
    // one shuffle of corpus spans by hash. The oracle rebuilds identical
    // span hashes via a DuckDB list comprehension over the same
    // cross-engine polynomial.
    Q("decontaminate_spans", {
      def h(x: String) = H.sqlWordHash(x)
      val spanExpr = H.sqlFoldHash((0 until SpanLen).map(k => h(s"ws[i+$k]")))
      s"""WITH spans AS (
         |  SELECT doc_id,
         |    unnest([$spanExpr FOR i IN range(1, len(ws) - ${SpanLen - 2})]) AS sp
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
         |bench AS (SELECT DISTINCT sp FROM spans WHERE doc_id < 10)
         |SELECT doc_id, count(*) AS n_hits, count(DISTINCT sp) AS n_uniq
         |FROM spans WHERE doc_id >= 10 AND sp IN (SELECT sp FROM bench)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val toks = documents(s, d)
        .select($"doc_id", posexplode(split($"text", " ")))
        .withColumnRenamed("col", "w")
        .withColumn("h", H.wordHash($"w"))
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      // rolling span hash: fold of this token's hash and the next SpanLen-1
      // (lead returns NULL past the end → NULL span, filtered)
      val span = H.foldHash((0 until SpanLen).map {
        case 0 => $"h"
        case k => lead($"h", k).over(w)
      })
      val spans = toks.select($"doc_id", span.as("sp")).filter($"sp".isNotNull)
      val bench = spans.filter($"doc_id" < 10).select($"sp").distinct()
      spans.filter($"doc_id" >= 10)
        .join(bench, "sp")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_hits"), countDistinct($"sp").as("n_uniq"))
        .orderBy($"doc_id")
    },

    // dedup_cluster's 100 TB path: min-label propagation over the near-dup
    // edge list, entirely distributed — no driver materialization of the
    // graph. Each round is one join + one min-aggregate, both partitioned
    // by node id; labels strictly decrease, so `changed == 0` is a sound
    // fixpoint test, reached after diameter rounds (near-dup components are
    // quasi-cliques — 2-3 rounds in practice; the O(log n) worst-case
    // refinement is large-star/small-star alternation on the same edge
    // frame). Oracle and output are IDENTICAL to dedup_cluster, proving
    // the scale path computes the same components as the driver union-find.
    Q("dedup_cluster_dist", LlmQueries.ClusterOracleSql) { (s, d) =>
      val good = LlmQueries.jaccardPairs(documents(s, d), 0.5)
        .select($"a_id", $"b_id")
      val edges = good.union(good.select($"b_id", $"a_id"))
        .toDF("src", "dst").persist()
      var labels = edges.select($"src".as("id")).distinct()
        .select($"id", $"id".as("label")).persist()
      // Labels only ever DECREASE, so Σlabel strictly decreases until the
      // fixpoint — one cheap agg action per round doubles as both the
      // materialization of `next` and the convergence test (no per-round
      // join+count).
      var prevSum = Long.MaxValue
      var curSum = labels.agg(sum($"label")).head.getLong(0)
      var rounds = 0
      while (curSum < prevSum && rounds < 50) {
        val prop = edges.join(labels, $"dst" === $"id")
          .select($"src".as("id"), $"label")
        val next = labels.union(prop)
          .groupBy($"id").agg(min($"label").as("label")).persist()
        prevSum = curSum
        curSum = next.agg(sum($"label")).head.getLong(0)
        labels.unpersist(blocking = false)
        labels = next
        rounds += 1
      }
      edges.unpersist(blocking = false)
      labels.select($"id".as("doc_id"), $"label".as("cluster"))
        .orderBy($"doc_id")
    }
  )

  // $"…" sugar without a SparkSession-bound `implicits` import.
  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
