package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-expression surface (SURVEY.md §2B "Scalar fns" + "UDF surface"):
  * string / date / math / array / JSON functions and one Scala UDF, every
  * query mirrored by DuckDB SQL. All built-in `functions._` (codegen'd); the
  * UDF demonstrates the extension point only.
  *
  * The reference stores payloads as untyped bytes with MIME content types and
  * leaves decoding to the reader (`/root/reference/docs/draft.md:154-165`);
  * this module is the decode/compute layer over those payloads once typed.
  *
  * Cross-engine type notes: DuckDB year()/length()/len() return BIGINT where
  * Spark returns INT, and DuckDB ceil/floor keep DOUBLE where Spark returns
  * LONG — the oracle SQL casts to Spark's type. DuckDB dayofweek is 0-based
  * (Sunday=0); Spark is 1-based.
  */
object ScalarFnQueries {
  import Tables._

  val queries: Seq[Q] = Seq(

    Q("fn_string",
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  substr(p_name, 1, 4) AS pre4,
        |  CAST(length(p_name) AS INT) AS len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  p_name LIKE '%wid%' AS has_wid,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word_re,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  lpad(p_brand, 10, '*') AS brand_pad,
        |  replace(p_name, ' ', '_') AS snake
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      part(s, d).select($"p_partkey",
          upper($"p_name").as("up_name"),
          substring($"p_name", 1, 4).as("pre4"),
          length($"p_name").as("len"),
          concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
          $"p_name".like("%wid%").as("has_wid"),
          regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word_re"),
          element_at(split($"p_name", " "), 1).as("first_word"),
          lpad($"p_brand", 10, "*").as("brand_pad"),
          regexp_replace($"p_name", " ", "_").as("snake"))
        .orderBy($"p_partkey")
    },

    Q("fn_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      orders(s, d).select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("dom"),
          quarter($"o_orderdate").as("q"),
          dayofweek($"o_orderdate").as("dow"),
          date_trunc("month", $"o_orderdate").cast(DateType).as("month_start"),
          datediff($"o_orderdate".cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"),
          date_add($"o_orderdate".cast(DateType), 30).as("plus30"),
          last_day($"o_orderdate").as("month_end"))
        .orderBy($"o_orderkey")
    },

    Q("fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(abs(CAST(l_tax AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) AS tax_disc_gap,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_orderkey % 7 AS mod7,
        |  l_extendedprice * l_quantity AS prod,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, prod, price_sqrt, tax_disc_gap,
        |  max_rate, min_rate""".stripMargin) { (s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in the generated lineitem
      // (dup pairs carry different measures), so the ORDER BY continues
      // through value columns until the order is total over the output
      // tuple — found at sf1, where tie order diverged between engines
      lineitem(s, d).select($"l_orderkey", $"l_linenumber",
          abs(dec($"l_tax", 2).cast(DecimalType(10, 2)) -
            dec($"l_discount", 2).cast(DecimalType(10, 2))).cast(DoubleType).as("tax_disc_gap"),
          ceil($"l_extendedprice").as("price_ceil"),
          floor($"l_extendedprice").as("price_floor"),
          sqrt($"l_extendedprice").as("price_sqrt"),
          ($"l_orderkey" % 7).as("mod7"),
          ($"l_extendedprice" * $"l_quantity").as("prod"),
          greatest($"l_tax", $"l_discount").as("max_rate"),
          least($"l_tax", $"l_discount").as("min_rate"))
        .orderBy($"l_orderkey", $"l_linenumber", $"prod", $"price_sqrt",
          $"tax_disc_gap", $"max_rate", $"min_rate")
    },

    Q("fn_array",
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e1,
        |  CAST(embedding[64] AS DOUBLE) AS e64,
        |  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |    + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS head4_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      def e(i: Int): Column = element_at($"embedding", i).cast(DoubleType)
      embeddings(s, d).select($"vec_id", $"label",
          size($"embedding").as("dim"),
          e(1).as("e1"),
          e(64).as("e64"),
          (e(1) + e(2) + e(3) + e(4)).as("head4_sum"))
        .orderBy($"vec_id")
    },

    // Generator (explode) over tokenized text: word frequencies.
    Q("fn_explode",
      """SELECT w, count(*) AS n, count(DISTINCT doc_id) AS docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY w""".stripMargin) { (s, d) =>
      documents(s, d)
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .groupBy($"w")
        .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("docs"))
        .orderBy($"w")
    },

    // INTERVAL arithmetic on event time: shift, bucket, and difference —
    // all exact integer microsecond math in both engines (intervals here
    // are fixed day-time lengths; calendar-month arithmetic is the
    // engine-divergent case and deliberately out of scope).
    Q("fn_interval",
      """SELECT event_id,
        |  ts + INTERVAL 90 MINUTE AS ts_plus90m,
        |  ts - INTERVAL 1 DAY AS ts_minus1d,
        |  CAST((epoch_us(ts + INTERVAL 90 MINUTE) - epoch_us(ts)) // 60000000 AS BIGINT)
        |    AS diff_minutes,
        |  date_trunc('week', ts) AS week_start
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      events(s, d).select($"event_id",
          ($"ts" + expr("INTERVAL 90 MINUTES")).as("ts_plus90m"),
          ($"ts" - expr("INTERVAL 1 DAYS")).as("ts_minus1d"),
          expr("(unix_micros(ts + INTERVAL 90 MINUTES) - unix_micros(ts)) div 60000000")
            .as("diff_minutes"),
          date_trunc("week", $"ts").as("week_start"))
        .orderBy($"event_id")
    },

    // explode_outer: rows with EMPTY arrays survive as a NULL element —
    // the generator variant that keeps entity coverage (a doc with no
    // long words still appears in the output). DuckDB mirrors it by
    // substituting [NULL] for the empty list; null ordering is explicit
    // (NULLS FIRST) because the engines' ASC defaults differ.
    Q("fn_explode_outer",
      """SELECT doc_id, w FROM (
        |  SELECT doc_id, unnest(CASE WHEN len(ws) = 0
        |      THEN [CAST(NULL AS VARCHAR)] ELSE ws END) AS w
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
        |          x -> length(x) >= 12) AS ws FROM documents))
        |ORDER BY doc_id, w NULLS FIRST""".stripMargin) { (s, d) =>
      documents(s, d)
        .select($"doc_id",
          explode_outer(filter(split($"text", " "), x => length(x) >= 12)).as("w"))
        .orderBy($"doc_id", $"w".asc_nulls_first)
    },

    Q("fn_map_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      events(s, d).select($"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.k").cast(IntegerType).as("k"),
          from_json($"props", StructType(Seq(StructField("k", IntegerType))))
            .getField("k").multiply(2).as("k2"))
        .orderBy($"event_id")
    },

    // Higher-order array lambdas as a DECLARED surface (they back half the
    // LLM pipeline internally): transform / filter / aggregate(reduce) /
    // exists / forall, mirrored by DuckDB's list_* family.
    Q("fn_lambda",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> length(w) > 5)) AS INT) AS n_long,
        |  array_to_string(list_transform(ws[1:3], w -> upper(w)), ',') AS upper3,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(ws, w -> CAST(length(w) AS BIGINT))),
        |    (a, x) -> a + x) AS INT) AS total_chars,
        |  len(list_filter(ws, w -> w = 'the')) > 0 AS has_the,
        |  len(list_filter(ws, w -> w <> lower(w))) = 0 AS all_lower
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = split($"text", " ")
      documents(s, d).select($"doc_id",
          size(filter(ws, w => length(w) > 5)).as("n_long"),
          concat_ws(",", transform(slice(ws, 1, 3), w => upper(w))).as("upper3"),
          aggregate(ws, lit(0), (a, w) => a + length(w)).as("total_chars"),
          exists(ws, w => w === "the").as("has_the"),
          forall(ws, w => w === lower(w)).as("all_lower"))
        .orderBy($"doc_id")
    },

    // Native MAP column construction and access (distinct from the JSON
    // string path in fn_map_json). DuckDB map extraction returns a LIST, so
    // the oracle takes `[1]` to get the scalar; both engines preserve the
    // literal key order for map_keys.
    Q("fn_map",
      """WITH t AS (SELECT event_id,
        |  map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
        |FROM events)
        |SELECT event_id,
        |  m['type'][1] AS v_type,
        |  m['uid'][1] AS v_uid,
        |  CAST(cardinality(m) AS INT) AS n_keys,
        |  array_to_string(map_keys(m), ',') AS keys_csv
        |FROM t ORDER BY event_id""".stripMargin) { (s, d) =>
      val m = map(lit("type"), $"event_type", lit("uid"), $"user_id".cast(StringType))
      Tables.events(s, d).select($"event_id",
          element_at(m, "type").as("v_type"),
          element_at(m, "uid").as("v_uid"),
          size(m).as("n_keys"),
          concat_ws(",", map_keys(m)).as("keys_csv"))
        .orderBy($"event_id")
    },

    // Binary encode/decode surface: base64 / hex / md5 / sha2 over payload
    // bytes — the codec layer every content-addressed pipeline leans on.
    Q("fn_encode",
      """SELECT doc_id,
        |  base64(CAST(substr(text, 1, 24) AS BLOB)) AS b64,
        |  hex(substr(text, 1, 12)) AS hx,
        |  md5(text) AS md5_hash,
        |  sha256(text) AS sha_hash
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select($"doc_id",
          base64(substring($"text", 1, 24).cast(BinaryType)).as("b64"),
          hex(substring($"text", 1, 12)).as("hx"),
          md5($"text".cast(BinaryType)).as("md5_hash"),
          sha2($"text".cast(BinaryType), 256).as("sha_hash"))
        .orderBy($"doc_id")
    },

    // Scala UDF extension point (deliberately SQL-expressible so the oracle
    // can check it; perf-critical paths use built-ins or Expressions).
    Q("fn_udf",
      """SELECT c_custkey, reverse(upper(c_name)) AS rev_name
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val revUpper = udf((x: String) => if (x == null) null else x.reverse.toUpperCase)
      customer(s, d)
        .select($"c_custkey", revUpper($"c_name").as("rev_name"))
        .orderBy($"c_custkey")
    },

    // Custom typed Aggregator (UDAF): top-3 order totals per priority class.
    // Surfaced as three scalar columns (not the raw ARRAY) so the driver's
    // column-wise hash compare — which cannot hash list cells — can check it.
    Q("agg_topk_udaf",
      """WITH t AS (SELECT o_orderpriority,
        |  (list(o_totalprice ORDER BY o_totalprice DESC))[1:3] AS l
        |FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, l[1] AS top1, l[2] AS top2, l[3] AS top3
        |FROM t ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val top3 = udaf(new graft.functions.TopKAggregator(3))
      orders(s, d).groupBy($"o_orderpriority")
        .agg(top3($"o_totalprice").as("l"))
        .select($"o_orderpriority",
          element_at($"l", 1).as("top1"),
          element_at($"l", 2).as("top2"),
          element_at($"l", 3).as("top3"))
        .orderBy($"o_orderpriority")
    }
  )

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
