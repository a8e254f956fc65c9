package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-2 widening of the relational surface (SURVEY.md §2B): full-outer
  * join, statistical/boolean/string aggregates, conditional/bitwise/struct
  * scalar functions, SQL subquery forms (scalar, correlated, EXISTS), and
  * window frames (RANGE by value, first/last/nth navigation).
  *
  * Same contracts as [[RelationalQueries]]: pure DataFrame/SQL API, total
  * ORDER BY, exact arithmetic (integer cents / DECIMAL sums) so the DuckDB
  * oracle hash-matches bit-for-bit.
  */
object ExtendedQueries {
  import Tables._

  /** Shared ANSI SQL (run verbatim by Spark AND DuckDB — the subquery
    * queries prove the SQL entry point handles nested query forms).
    */
  private val ScalarSubquerySql =
    """SELECT o_orderpriority, count(*) AS n_big
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                             / count(*) FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val CorrelatedSubquerySql =
    """SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  private val LateralSubquerySql =
    """SELECT c_custkey, l.o_orderkey, CAST(l.o_totalprice AS DOUBLE) AS top_price
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l
      |ORDER BY c_custkey""".stripMargin

  val queries: Seq[Q] = Seq(

    // ───────────────────────── joins ─────────────────────────
    // FULL OUTER over filtered sides so both produce unmatched rows; the
    // coalesced key keeps the output totally ordered (NULLS FIRST pinned
    // explicitly — Spark's asc default vs DuckDB's NULLS LAST differ).
    Q("join_full",
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS k,
        |  c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
        |FROM (SELECT * FROM customer WHERE c_acctbal > 7500) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY k, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      val c = customer(s, d).filter($"c_acctbal" > 7500)
      val o = orders(s, d).filter($"o_totalprice" > 400000)
      c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("k"),
          $"c_custkey", $"c_acctbal", $"o_orderkey", $"o_totalprice")
        .orderBy($"k", $"o_orderkey".asc_nulls_first)
    },

    // ───────────────────── aggregations ─────────────────────
    // Statistical moments from EXACT integer-cents sums (sum/sum-of-squares/
    // cross-sum), combined in DECIMAL(38) (Spark) / HUGEINT (DuckDB) — both
    // exact — with ONE double cast at the end, so variance/stddev/corr are
    // bit-identical across engines and any aggregation order. Built-in
    // stddev/corr use order-sensitive Welford merges, which can't hash-match.
    Q("agg_stats",
      """SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) / n / 100 AS mean_qty,
        |  CAST(n * sx2 - sx * sx AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) / 10000 AS var_qty,
        |  sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) / 10000) AS stddev_qty,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr_qty_disc
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(qx) AS HUGEINT) AS sx, CAST(sum(qx * qx) AS HUGEINT) AS sx2,
        |    CAST(sum(qy) AS HUGEINT) AS sy, CAST(sum(qy * qy) AS HUGEINT) AS sy2,
        |    CAST(sum(qx * qy) AS HUGEINT) AS sxy
        |  FROM (SELECT l_returnflag,
        |          CAST(round(l_quantity * 100) AS BIGINT) AS qx,
        |          CAST(round(l_discount * 100) AS BIGINT) AS qy
        |        FROM lineitem)
        |  GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val d38 = DecimalType(38, 0)
      val base = lineitem(s, d).select($"l_returnflag",
        round($"l_quantity" * 100).cast(LongType).as("qx"),
        round($"l_discount" * 100).cast(LongType).as("qy"))
      val agg = base.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        sum($"qx").cast(d38).as("sx"), sum($"qx" * $"qx").cast(d38).as("sx2"),
        sum($"qy").cast(d38).as("sy"), sum($"qy" * $"qy").cast(d38).as("sy2"),
        sum($"qx" * $"qy").cast(d38).as("sxy"))
      val n38 = $"n".cast(d38)
      val varNum = (n38 * $"sx2" - $"sx" * $"sx").cast(DoubleType)
      val nPairs = (n38 * ($"n" - 1).cast(d38)).cast(DoubleType)
      agg.select($"l_returnflag", $"n",
          ($"sx".cast(DoubleType) / $"n" / 100).as("mean_qty"),
          (varNum / nPairs / 10000).as("var_qty"),
          sqrt(varNum / nPairs / 10000).as("stddev_qty"),
          ((n38 * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
            (sqrt(varNum) *
              sqrt((n38 * $"sy2" - $"sy" * $"sy").cast(DoubleType)))).as("corr_qty_disc"))
        .orderBy($"l_returnflag")
    },

    // Boolean/conditional aggregates: count_if, bool_and, bool_or.
    Q("agg_bool",
      """SELECT o_orderpriority,
        |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'F') AS any_finished
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      orders(s, d).groupBy($"o_orderpriority")
        .agg(count_if($"o_totalprice" > 200000).as("n_big"),
          bool_and($"o_totalprice" > 1000).as("all_over_1k"),
          bool_or($"o_orderstatus" === "F").as("any_finished"))
        .orderBy($"o_orderpriority")
    },

    // Ordered string aggregation (listagg): Spark spells it
    // sort-then-concat (collect_list is unordered by contract); DuckDB has
    // ORDER BY inside the aggregate. Same string either way.
    Q("agg_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      nation(s, d).join(region(s, d), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy($"r_name")
    },

    // ─────────────────────── scalar fns ───────────────────────
    Q("fn_conditional",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'MASKED') AS seg_masked,
        |  greatest(c_acctbal, 0.0) AS bal_floor0,
        |  least(c_acctbal, 0.0) AS bal_cap0
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).select($"c_custkey",
          when($"c_acctbal" < 0, "neg")
            .when($"c_acctbal" < 5000, "mid").otherwise("high").as("bal_band"),
          nullif($"c_mktsegment", lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("MASKED")).as("seg_masked"),
          greatest($"c_acctbal", lit(0.0)).as("bal_floor0"),
          least($"c_acctbal", lit(0.0)).as("bal_cap0"))
        .orderBy($"c_custkey")
    },

    Q("fn_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS and255,
        |  o_orderkey | 4096 AS or4096,
        |  xor(o_orderkey, 255) AS xor255,
        |  o_orderkey << 3 AS shl3,
        |  o_orderkey >> 2 AS shr2,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      orders(s, d).select($"o_orderkey",
          $"o_orderkey".bitwiseAND(255).as("and255"),
          $"o_orderkey".bitwiseOR(4096).as("or4096"),
          $"o_orderkey".bitwiseXOR(255).as("xor255"),
          shiftleft($"o_orderkey", 3).as("shl3"),
          shiftright($"o_orderkey", 2).as("shr2"),
          bit_count($"o_orderkey").as("popcount"))
        .orderBy($"o_orderkey")
    },

    // Struct construction, nesting, and field access — the typed-record
    // shape the shardpack entries schema uses (FIXTURES.md §B), exercised
    // through the expression layer.
    Q("fn_struct",
      """SELECT o_orderkey,
        |  ({'k': o_orderkey, 'p': o_totalprice}).p AS price_via_struct,
        |  ({'inner': {'k': o_orderkey, 'p': o_totalprice}, 'tag': 1}).inner.k AS key_via_nested
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val st = struct($"o_orderkey".as("k"), $"o_totalprice".as("p"))
      orders(s, d).select($"o_orderkey",
          st.getField("p").as("price_via_struct"),
          struct(st.as("inner"), lit(1).as("tag"))
            .getField("inner").getField("k").as("key_via_nested"))
        .orderBy($"o_orderkey")
    },

    // ─────────────────────── subqueries ───────────────────────
    // Shared SQL text = Spark query AND oracle: scalar subquery in WHERE.
    Q("subquery_scalar", ScalarSubquerySql) { (s, d) =>
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(ScalarSubquerySql)
    },

    // Correlated scalar subquery + correlated EXISTS (planned by Catalyst
    // as an aggregate-join and a left-semi join respectively).
    Q("subquery_correlated", CorrelatedSubquerySql) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(CorrelatedSubquerySql)
    },

    // LATERAL correlated subquery (top-1-per-group without a window): the
    // inner query re-evaluates per outer row; Catalyst decorrelates it.
    Q("subquery_lateral", LateralSubquerySql) { (s, d) =>
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(LateralSubquerySql)
    },

    // try_cast: error-safe casts yield NULL instead of failing the task —
    // the right semantics for dirty data at scale (one bad row cannot kill
    // a 100 TB job under ANSI mode).
    Q("fn_try",
      """SELECT p_partkey,
        |  try_cast(p_brand AS INTEGER) AS brand_int,
        |  try_cast(substr(p_brand, 7) AS INTEGER) AS brand_num,
        |  try_cast(p_size AS SMALLINT) AS size_small
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      part(s, d).select($"p_partkey",
          $"p_brand".try_cast(IntegerType).as("brand_int"),
          substring($"p_brand", 7, 10).try_cast(IntegerType).as("brand_num"),
          $"p_size".try_cast(ShortType).as("size_small"))
        .orderBy($"p_partkey")
    },

    // ───────────────────────── windows ─────────────────────────
    // RANGE frame by VALUE (trailing 30-day revenue per customer): the
    // frame is epoch-seconds based so both engines bound it identically;
    // peers (equal timestamps) are included by RANGE semantics.
    Q("win_range_frame",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY es
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
        |FROM (SELECT o_custkey, o_orderkey,
        |        CAST(epoch(o_orderdate) AS BIGINT) AS es, o_totalprice
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"o_custkey").orderBy($"es")
        .rangeBetween(-2592000L, Window.currentRow)
      orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          // TIMESTAMP_NTZ → epoch seconds needs the TimestampType hop
          // (session is pinned UTC, so the reinterpretation is exact)
          $"o_orderdate".cast(TimestampType).cast(LongType).as("es"), $"o_totalprice")
        .select($"o_custkey", $"o_orderkey",
          sum(dec($"o_totalprice")).over(w).cast(DoubleType).as("rev_30d"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Navigation over an explicit full frame: first/last/nth per customer
    // by (date, key) total order.
    Q("win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d).select($"o_custkey", $"o_orderkey",
          first($"o_orderkey").over(w).as("first_key"),
          last($"o_orderkey").over(w).as("last_key"),
          nth_value($"o_orderkey", 2).over(w).as("second_key"))
        .orderBy($"o_custkey", $"o_orderkey")
    }
  )

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
