package graft.queries

import graft.Caches.TrackedPersist
import graft.Tables
import graft.functions.ParityFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Relational operator surface (SURVEY.md §2.2 Q1, Q6–Q31): scans,
  * projections, filters, every join flavor, hash/rollup/cube aggregation,
  * window functions, sort/top-k, set ops, and the scalar-function families
  * (string/date/math/array/map/json). Each entry is a declarative
  * DataFrame plan (Catalyst handles pushdown/pruning/join selection) with
  * a DuckDB oracle for the driver's hash compare.
  *
  * Determinism rules: aggregates over doubles are round()'ed to fixed
  * scale; every ORDER-sensitive operator has a total tie-break; timestamps
  * leave the engine as epoch-ms BIGINT or formatted strings.
  */
object Relational {

  def defs: ListMap[String, Q] = ListMap(

    // ---- Q1/Q16: parquet scan + hash aggregate (TPC-H Q1 shape; flagship)
    "q01_agg" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      // bench-trimmed (r9 advice #7): PlanSpec pins the shape, sub-second at sf0.1
      headline = false),

    // ---- Q6/Q7: projection + filter with computed columns (pushdown check)
    "q02_filter_project" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1 - l_discount) AS revenue
             |FROM lineitem
             |WHERE l_returnflag = 'R'
             |  AND l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin),
      // bench-trimmed (r9 advice #7): PlanSpec pins the shape, sub-second at sf0.1
      headline = false),

    // ---- Q8: broadcast hash join (small dim broadcast, explicitly hinted)
    "q03_join_broadcast" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val c = Tables(s, d, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_spend"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total_spend
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
      headline = false),

    // ---- Q9: shuffle (sort-merge) join between the two fact tables
    "q04_join_sortmerge" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val o = Tables(s, d, "orders")
        li.hint("merge")
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
             |  round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin),
      headline = true),

    // ---- Q10: left outer join with null-generating side aggregated
    "q05_outer_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |  round(coalesce(sum(o_totalprice), 0), 2) AS spend
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey""".stripMargin),
      // bench-trimmed (r9 advice #7): PlanSpec pins the shape, sub-second at sf0.1
      headline = false),

    // ---- Q11: left semi join (EXISTS)
    "q06_semi_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "O")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin)),

    // ---- Q11: left anti join (NOT EXISTS)
    "q07_anti_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_acctbal"))
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin)),

    // ---- Q12: theta / non-equi join (broadcast nested loop over a tiny
    //      band table — the 3-row side is broadcast so no shuffle)
    "q08_theta_join" -> Q(
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 50000.0),
          ("mid", 50000.0, 150000.0),
          ("high", 150000.0, 1.0e18)).toDF("band", "lo", "hi")
        Tables(s, d, "orders")
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      },
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0), ('high', 150000.0, 1e18))
             |SELECT band, count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
             |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band""".stripMargin)),

    // ---- Q15: cross join
    "q10_cross_join" -> Q(
      (s, d) => {
        Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
          .select(col("r_name"), col("n_name"))
      },
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // ---- Q19: rollup with grouping indicators
    "q11_rollup" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val c = Tables(s, d, "customer")
        val n = Tables(s, d, "nation")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("spend"))
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("n"), col("spend"))
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
             |  coalesce(c_mktsegment, 'ALL') AS segment,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS spend
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin),
      // bench-trimmed (r9 advice #7): PlanSpec pins the shape, sub-second at sf0.1
      headline = false),

    // ---- Q20/Q23: ranking window → per-group top-k
    "q12_window_topk" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(s, d, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(rk AS INT) AS rk FROM (
             |  SELECT o_custkey, o_orderkey, row_number() OVER (
             |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders) WHERE rk <= 3""".stripMargin),
      // bench-trimmed (r9 advice #7): PlanSpec pins the shape, sub-second at sf0.1
      headline = false),

    // ---- Q22: window aggregate with a running frame
    "q13_window_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      },
      Some("""SELECT o_orderkey, round(sum(o_totalprice) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS UNBOUNDED PRECEDING), 2) AS running_spend
             |FROM orders""".stripMargin),
      headline = false),

    // ---- Q21: analytic window functions (lag/lead)
    "q14_lag_lead" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables(s, d, "events")
          .select(col("event_id"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("event_type"), 1).over(w).as("next_type"))
      },
      Some("""SELECT event_id,
             |  lag(value, 1) OVER w AS prev_value,
             |  lead(event_type, 1) OVER w AS next_type
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // ---- Q17: distinct aggregates
    "q15_distinct_agg" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             |  count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- Q18: approximate distinct (HLL). The sketch itself can't
    //      hash-match an exact engine, so the gateable shape emits the
    //      exact count plus a boolean asserting the HLL estimate landed
    //      within 3×rsd of it — the oracle returns the same exact count
    //      with TRUE, so a broken/degenerate sketch flips the row red.
    //      (ApproxDistinctSpec additionally asserts the numeric bound.)
    "q16_approx_distinct" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_n"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
          .select(col("l_returnflag"), col("exact_n"),
            (abs(col("approx") - col("exact_n")).cast("double") <=
              col("exact_n").cast("double") * 0.06).as("approx_within_3rsd"))
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS exact_n,
             |  TRUE AS approx_within_3rsd
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- Q23: global sort + limit (TakeOrderedAndProject)
    "q17_topk_global" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      headline = false),

    // ---- Q24: set operations (distinct semantics in both engines)
    "q18_setops" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        def keys(st: String) =
          o.filter(col("o_orderstatus") === st).select(col("o_custkey"))
        keys("F").intersect(keys("O")).except(keys("P"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin)),

    // ---- Q26: string function family
    "q19_strings" -> Q(
      (s, d) => {
        Tables(s, d, "part").select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_type"), 1, 4).as("type4"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          levenshtein(col("p_brand"), lit("Brand#13")).as("lev"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          col("p_type").like("%ECO%").as("is_eco"))
      },
      Some("""SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc,
             |  substr(p_type, 1, 4) AS type4,
             |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
             |  p_brand || '|' || p_type AS brand_type,
             |  CAST(levenshtein(p_brand, 'Brand#13') AS INT) AS lev,
             |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             |  p_type LIKE '%ECO%' AS is_eco
             |FROM part""".stripMargin)),

    // ---- Q27: date/time function family
    "q20_datetime" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("spend"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS spend
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- Q28: math function family
    "q21_math" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).as("fl_qty"),
            ceil(col("l_tax") * 100).as("ceil_tax"),
            round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
            abs(col("l_discount") - lit(0.05)).as("abs_disc"),
            round(pow(col("l_discount") + 1, 2), 6).as("pow_disc"),
            pmod(col("l_partkey"), lit(7)).as("mod_part"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(floor(l_quantity) AS BIGINT) AS fl_qty,
             |  CAST(ceil(l_tax * 100) AS BIGINT) AS ceil_tax,
             |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
             |  abs(l_discount - 0.05) AS abs_disc,
             |  round(pow(l_discount + 1, 2), 6) AS pow_disc,
             |  l_partkey % 7 AS mod_part
             |FROM lineitem WHERE l_orderkey < 100""".stripMargin)),

    // ---- Q29: array / higher-order function family
    "q22_arrays" -> Q(
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables(s, d, "documents").select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          element_at(toks, 1).as("first_token"),
          size(array_distinct(toks)).as("n_distinct"),
          array_contains(toks, "spark").as("has_spark"),
          array_max(transform(toks, t => length(t))).as("max_token_len"),
          size(filter(toks, t => length(t) > 4)).as("n_long"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |  string_split(text, ' ')[1] AS first_token,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  CAST(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'max') AS INT) AS max_token_len,
             |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT) AS n_long
             |FROM documents""".stripMargin)),

    // ---- Q31: JSON functions over events.props
    "q23_json" -> Q(
      (s, d) => {
        // spread: JSON parsing is per-row CPU, and the fixture's
        // single-row-group parquet would serialize it on one core
        // (at real scale multi-split input makes this a no-op)
        Tables.spread(Tables(s, d, "events"))
          .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
             |FROM events GROUP BY 1""".stripMargin),
      headline = false),

    // ---- Q31 multi-key: ONE schema-pruned from_json parse per row
    //      (a single JsonToStructs in the plan — PlanSpec pins it),
    //      not one get_json_object tree walk per extracted key; keys
    //      absent from the document ("tag") surface as typed NULLs.
    "q103_json_multikey" -> Q(
      (s, d) => {
        Tables.spread(Tables(s, d, "events"))
          .select(from_json(col("props"), "k INT, tag STRING",
            Map.empty[String, String]).as("p"), col("value"))
          .select((col("p.k") % 10).as("kmod"),
            coalesce(col("p.tag"), lit("none")).as("tag"), col("value"))
          .groupBy(col("kmod"), col("tag"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS kmod,
             |  coalesce(json_extract_string(props, '$.tag'), 'none') AS tag,
             |  count(*) AS n, round(sum("value"), 2) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- Q7/Q26: conditionals + null handling
    "q24_conditionals" -> Q(
      (s, d) => {
        val bucket = when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high")
        Tables(s, d, "customer")
          .groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("c_acctbal")), 2).as("avg_bal"),
            count(nullif(col("c_mktsegment"), lit("BUILDING"))).as("n_not_building"))
      },
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
             |  WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
             |  count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal,
             |  count(nullif(c_mktsegment, 'BUILDING')) AS n_not_building
             |FROM customer GROUP BY 1""".stripMargin)),

    // ---- Q19: cube
    "q25_cube" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- Q24: union all preserved duplicates
    "q26_union_all" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"), lit("was_f").as("tag"))
        val b = o.filter(col("o_totalprice") > 300000)
          .select(col("o_custkey"), lit("big").as("tag"))
        a.unionByName(b).groupBy(col("tag")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT tag, count(*) AS n FROM (
             |  SELECT o_custkey, 'was_f' AS tag FROM orders WHERE o_orderstatus = 'F'
             |  UNION ALL
             |  SELECT o_custkey, 'big' AS tag FROM orders WHERE o_totalprice > 300000)
             |GROUP BY tag""".stripMargin)),

    // ---- Q30: map function family (props JSON → MapType, then key/value
    //      ops; map_concat adds a synthetic key to exercise construction)
    "q28_maps" -> Q(
      (s, d) => {
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
        Tables(s, d, "events").select(
          col("event_id"),
          size(map_keys(m)).as("n_keys"),
          array_contains(map_keys(m), "k").as("has_k"),
          element_at(m, "k").as("k_val"),
          // collision-proof synthetic key: with mapKeyDedupPolicy=EXCEPTION
          // (the default) a key already present in props would throw
          size(map_concat(m, map(lit("__graft_x"), lit(-1)))).as("n_concat"))
      },
      Some("""SELECT event_id,
             |  CAST(len(json_keys(props)) AS INT) AS n_keys,
             |  list_contains(json_keys(props), 'k') AS has_k,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
             |  CAST(len(json_keys(props)) + 1 AS INT) AS n_concat
             |FROM events""".stripMargin)),

    // ---- Q19: GROUPING SETS via the SQL surface (rollup/cube's general
    //      form; also exercises spark.sql over registered views)
    "q29_grouping_sets" -> Q(
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                |  coalesce(o_orderpriority, 'ALL') AS priority,
                |  count(*) AS n, round(sum(o_totalprice), 2) AS spend
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS spend
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // ---- R15 generalized: audit-style summary (min/max/first activity)
    "q27_audit_summary" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .filter(col("event_type") === "error")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_err"),
            epochMs(min(col("ts"))).as("first_ms"),
            epochMs(max(col("ts"))).as("last_ms"),
            round(sum(col("value")), 4).as("err_value"))
      },
      Some("""SELECT user_id, count(*) AS n_err,
             |  epoch_ms(min(ts)) AS first_ms, epoch_ms(max(ts)) AS last_ms,
             |  round(sum(value), 4) AS err_value
             |FROM events WHERE event_type = 'error' GROUP BY user_id""".stripMargin)),

    // ---- Q44: typed UDAF via Aggregator (quantity-weighted mean price;
    //      partial aggregation via reduce/merge, so it map-side combines
    //      like any built-in agg)
    "q36_udaf_wavg" -> Q(
      (s, d) => {
        val wavg = udaf(graft.functions.Aggregators.WeightedAvg,
          org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.WPoint])
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      headline = false),

    // ---- Q44: UDTF-style generator via typed Dataset.flatMap (documents
    //      → one row per token with its 1-based position)
    "q37_udtf_tokens" -> Q(
      (s, d) => {
        import s.implicits._
        Tables(s, d, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, text) =>
            text.split(" ").iterator.zipWithIndex.map { case (t, i) => (id, i + 1, t) }
          }
          .toDF("doc_id", "pos", "token")
      },
      Some("""SELECT doc_id,
             |  CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos,
             |  unnest(string_split(text, ' ')) AS token
             |FROM documents""".stripMargin)),

    // ---- Q19 completeness: grouping_id over a cube
    "q67_grouping_id" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("gid"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- Q17 completeness: collect_set (order-canonicalized to a string
    //      so the hash compare is deterministic in both engines)
    "q68_collect_set" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_orderkey") < 200)
          .groupBy(col("l_orderkey"))
          .agg(concat_ws(",",
            sort_array(collect_set(col("l_suppkey")))).as("supp_set"))
      },
      Some("""SELECT l_orderkey,
             |  array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS supp_set
             |FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey""".stripMargin)),

    // ---- exact percentiles (interpolated, same definition as DuckDB's
    //      quantile_cont; deterministic because the sort is total)
    "q75_percentiles" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
            round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
            round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
             |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
             |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- approximate quantile SKETCH, verified against an exact rank
    //      bracket — the 100 TB path for q75 (exact percentile holds a
    //      value→count map per group; the GK sketch is O(1/ε) state).
    //      The q16 pattern: the sketch's answer isn't hash-comparable
    //      (engine-specific), so both engines emit exact integer-cents
    //      order statistics (median + the ±2%-rank bracket endpoints,
    //      derived from the count-of-counts cumulative — q167's idiom;
    //      2-decimal TPC-H prices make cents EXACT BIGINTs, and the
    //      cumulative window runs at distinct-price grain, bounded by
    //      the price DOMAIN, not row count) plus a boolean the oracle
    //      pins TRUE: percentile_approx's answer sits inside the
    //      bracket. GK at accuracy 100 guarantees ≤1% rank error; the
    //      bracket allows 2%, so a degenerate sketch flips the row red
    //      while normal operation has 2× margin. All rank arithmetic is
    //      integer (DIV), never float·N.
    "q170_quantile_sketch" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables(s, d, "orders")
          .select(col("o_orderstatus").as("st"), col("o_totalprice"),
            expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
        // the cents-grain cumulative and the status-grain rank frame
        // persist ONCE: the three rank picks each re-ran the corpus
        // histogram + window before round 16 (duplicate-subtree lint)
        val cc = v.groupBy(col("st"), col("cents")).agg(count(lit(1)).as("cnt"))
        val cum = cc.select(col("st"), col("cents"),
          sum(col("cnt")).over(Window.partitionBy(col("st"))
            .orderBy(col("cents").asc)
            .rowsBetween(Window.unboundedPreceding, 0)).as("cum"))
          .persistTracked
        val tot = v.groupBy(col("st")).agg(count(lit(1)).as("n"))
          .select(col("st"), col("n"),
            expr("greatest(CAST(1 AS BIGINT), n DIV 2 - (n * 2 + 99) DIV 100)").as("r_lo"),
            expr("least(n, (n + 1) DIV 2 + (n * 2 + 99) DIV 100)").as("r_hi"),
            expr("(n + 1) DIV 2").as("r_med"))
          .persistTracked
        def pick(rank: String, out: String) =
          cum.join(broadcast(tot), "st").filter(col("cum") >= col(rank))
            .groupBy(col("st")).agg(min(col("cents")).as(out))
        val approx = v.groupBy(col("st"))
          .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(100)).as("ap"))
          .select(col("st"), expr("CAST(round(ap * 100, 0) AS BIGINT)").as("ap_cents"))
        tot.select(col("st"), col("n"))
          .join(broadcast(pick("r_med", "med_cents")), "st")
          .join(broadcast(pick("r_lo", "lo_cents")), "st")
          .join(broadcast(pick("r_hi", "hi_cents")), "st")
          .join(broadcast(approx), "st")
          .select(col("st"), col("n"), col("med_cents"), col("lo_cents"),
            col("hi_cents"),
            (col("ap_cents") >= col("lo_cents") &&
              col("ap_cents") <= col("hi_cents")).as("sketch_within_rank_eps"))
      },
      Some("""WITH v AS (SELECT o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |cc AS (SELECT st, cents, count(*) AS cnt FROM v GROUP BY 1, 2),
             |cum AS (SELECT st, cents, sum(cnt) OVER (PARTITION BY st
             |    ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum FROM cc),
             |tot AS (SELECT st, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
             |rk AS (SELECT st, n,
             |    greatest(CAST(1 AS BIGINT), n // 2 - (n * 2 + 99) // 100) AS r_lo,
             |    least(n, (n + 1) // 2 + (n * 2 + 99) // 100) AS r_hi,
             |    (n + 1) // 2 AS r_med FROM tot),
             |med AS (SELECT cum.st, CAST(min(cents) AS BIGINT) AS med_cents
             |  FROM cum JOIN rk ON rk.st = cum.st AND cum >= r_med GROUP BY 1),
             |lo AS (SELECT cum.st, CAST(min(cents) AS BIGINT) AS lo_cents
             |  FROM cum JOIN rk ON rk.st = cum.st AND cum >= r_lo GROUP BY 1),
             |hi AS (SELECT cum.st, CAST(min(cents) AS BIGINT) AS hi_cents
             |  FROM cum JOIN rk ON rk.st = cum.st AND cum >= r_hi GROUP BY 1)
             |SELECT rk.st, n, med_cents, lo_cents, hi_cents,
             |  TRUE AS sketch_within_rank_eps
             |FROM rk JOIN med ON med.st = rk.st JOIN lo ON lo.st = rk.st
             |  JOIN hi ON hi.st = rk.st""".stripMargin)),

    // ---- statistical aggregates (rounded to absorb summation-order ulps)
    "q76_stats" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      },
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
             |  round(var_samp(l_quantity), 4) AS var_qty,
             |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
             |  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- Q31 completeness: to_json / json_tuple / schema_of_json
    //      round-trip. Each engine parses its OWN serialization, so the
    //      compare is on parsed values — engine-specific JSON formatting
    //      can't diverge it. schema_of_json is exercised two ways: its
    //      inferred-DDL string is emitted (oracle pins the literal), and
    //      it drives the from_json re-parse whose v2 must equal v.
    "q74_json_roundtrip" -> Q(
      (s, d) => {
        val j = to_json(struct(
          col("event_type").as("t"), pmod(col("user_id"), lit(97)).as("v")))
        val jSchema = schema_of_json(lit("""{"t":"click","v":42}"""))
        Tables(s, d, "events")
          .withColumn("j", j)
          .withColumn("p", from_json(col("j"), jSchema))
          .select(col("event_id"),
            json_tuple(col("j"), "t", "v").as(Seq("t", "v")),
            col("p.v").as("v2"), jSchema.as("j_schema"))
          .select(col("event_id"), col("t"), col("v").cast("long").as("v"),
            col("v2"), col("j_schema"))
      },
      Some("""WITH w AS (SELECT event_id,
             |    to_json(struct_pack(t := event_type, v := user_id % 97)) AS j
             |  FROM events)
             |SELECT event_id, json_extract_string(j, '$.t') AS t,
             |  CAST(json_extract_string(j, '$.v') AS BIGINT) AS v,
             |  CAST(json_extract_string(j, '$.v') AS BIGINT) AS v2,
             |  'STRUCT<t: STRING, v: BIGINT>' AS j_schema
             |FROM w""".stripMargin)),

    // ---- pivot: long → wide with an explicit (deterministic) value list
    "q72_pivot" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus").as("status"),
            coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("unspec"),
            coalesce(col("5-LOW"), lit(0L)).as("low"))
      },
      Some("""SELECT o_orderstatus AS status,
             |  count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
             |  count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
             |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
             |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS unspec,
             |  count(*) FILTER (o_orderpriority = '5-LOW') AS low
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- unpivot/melt: wide → long
    "q73_unpivot" -> Q(
      (s, d) => {
        Tables(s, d, "customer")
          .unpivot(
            Array(col("c_custkey")),
            Array(col("c_acctbal").as("acctbal"), col("c_nationkey").cast("double").as("nation")),
            "metric", "val")
      },
      Some("""SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
             |UNION ALL
             |SELECT c_custkey, 'nation' AS metric, CAST(c_nationkey AS DOUBLE) AS val
             |FROM customer""".stripMargin)),

    // ---- SQL subquery surface: correlated scalar subquery (Catalyst
    //      rewrites it to an aggregate + join under the hood)
    "q82_scalar_subquery" -> Q(
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders_sq")
        s.sql("""SELECT o_orderkey, round(o_totalprice, 2) AS price
                |FROM orders_sq o
                |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders_sq
                |                          WHERE o_orderstatus = o.o_orderstatus)""".stripMargin)
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
             |FROM orders o
             |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders
             |                          WHERE o_orderstatus = o.o_orderstatus)""".stripMargin)),

    // ---- IN / NOT IN subqueries (semi/anti-join rewrites from SQL)
    "q83_in_subquery" -> Q(
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders_in")
        Tables(s, d, "customer").createOrReplaceTempView("customer_in")
        s.sql("""SELECT count(*) AS n_neg_cust_orders,
                |  (SELECT count(*) FROM orders_in
                |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_in)) AS n_orphans
                |FROM orders_in
                |WHERE o_custkey IN (SELECT c_custkey FROM customer_in WHERE c_acctbal < 0)""".stripMargin)
      },
      Some("""SELECT count(*) AS n_neg_cust_orders,
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_orphans
             |FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin)),

    // ---- CTE chain through the SQL surface
    "q84_cte" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_cte")
        // top-25 via ORDER BY + LIMIT (TakeOrderedAndProject — per
        // -partition partial top-k, no global single-partition window);
        // the rank window then runs over only the 25 survivors
        s.sql("""WITH rev AS (
                |  SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS r
                |  FROM lineitem_cte GROUP BY l_orderkey),
                |top AS (
                |  SELECT l_orderkey, r FROM rev ORDER BY r DESC, l_orderkey LIMIT 25)
                |SELECT l_orderkey, round(r, 2) AS revenue,
                |  CAST(row_number() OVER (ORDER BY r DESC, l_orderkey) AS INT) AS rk
                |FROM top""".stripMargin)
      },
      Some("""WITH rev AS (
             |  SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS r
             |  FROM lineitem GROUP BY l_orderkey),
             |ranked AS (
             |  SELECT l_orderkey, r, row_number() OVER (ORDER BY r DESC, l_orderkey) AS rk
             |  FROM rev)
             |SELECT l_orderkey, round(r, 2) AS revenue, CAST(rk AS INT) AS rk
             |FROM ranked WHERE rk <= 25""".stripMargin)),

    // ---- Q24 completeness: INTERSECT ALL / EXCEPT ALL (bag semantics)
    "q80_setops_all" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val a = li.filter(col("l_returnflag") === "A").select(col("l_suppkey"))
        val n = li.filter(col("l_returnflag") === "N").select(col("l_suppkey"))
        a.intersectAll(n).groupBy(col("l_suppkey")).agg(count(lit(1)).as("multiplicity"))
      },
      Some("""SELECT l_suppkey, count(*) AS multiplicity FROM (
             |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
             |  INTERSECT ALL
             |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'N')
             |GROUP BY l_suppkey""".stripMargin)),

    // ---- Q27 extended date/time family
    "q81_datetime2" -> Q(
      (s, d) => {
        Tables(s, d, "orders").filter(col("o_orderkey") <= 500).select(
          col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          quarter(col("o_orderdate")).as("qtr"),
          (dayofweek(col("o_orderdate"))).as("dow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          // months_between semantics (DateTimeUtils.monthsBetween): equal
          // day-of-month ⇒ whole months, else whole months + (d1-d2)/31.0.
          // The anchor's day (15) is not a month end, so the both-last-day
          // branch can't fire; the oracle mirrors the two live branches.
          // k/31 is never within 5e-9 of a .xxxx5 boundary, so round(.,4)
          // agrees across engines despite Spark's internal 8-dp rounding.
          round(months_between(col("o_orderdate"), lit("1995-01-15").cast("date")), 4)
            .as("mon_since"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
             |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             |  CAST(quarter(o_orderdate) AS INT) AS qtr,
             |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  round(CAST((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS DOUBLE)
             |    + CASE WHEN day(o_orderdate) = 15 THEN 0.0
             |           ELSE (day(o_orderdate) - 15) / 31.0 END, 4) AS mon_since
             |FROM orders WHERE o_orderkey <= 500""".stripMargin)),

    // ---- Q26 extended string family
    "q77_strings2" -> Q(
      (s, d) => {
        Tables(s, d, "part").filter(col("p_partkey") <= 500).select(
          col("p_partkey"),
          translate(col("p_brand"), "#", "-").as("brand_t"),
          repeat(col("p_brand"), 2).as("brand2"),
          reverse(col("p_brand")).as("brand_rev"),
          instr(col("p_type"), "BRUSHED").as("pos_brushed"),
          expr("left(p_name, 5)").as("name_l5"),
          expr("right(p_type, 4)").as("type_r4"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
          ltrim(rtrim(concat(lit("  "), col("p_brand"), lit("  ")))).as("brand_trim"))
      },
      Some("""SELECT p_partkey,
             |  translate(p_brand, '#', '-') AS brand_t,
             |  repeat(p_brand, 2) AS brand2,
             |  reverse(p_brand) AS brand_rev,
             |  CAST(instr(p_type, 'BRUSHED') AS INT) AS pos_brushed,
             |  left(p_name, 5) AS name_l5,
             |  right(p_type, 4) AS type_r4,
             |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
             |  ltrim(rtrim('  ' || p_brand || '  ')) AS brand_trim
             |FROM part WHERE p_partkey <= 500""".stripMargin)),

    // ---- bitwise aggregates
    "q78_bit_aggs" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("bit_and(l_linenumber)").as("band"),
            expr("bit_or(l_linenumber)").as("bor"),
            expr("bit_xor(l_linenumber)").as("bxor"))
      },
      Some("""SELECT l_returnflag,
             |  bit_and(l_linenumber) AS band, bit_or(l_linenumber) AS bor,
             |  bit_xor(l_linenumber) AS bxor
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- argmax/argmin + boolean/conditional aggregates (max_by keyed
    //      on the unique o_orderkey so ties cannot occur)
    "q79_arg_aggs" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            max_by(col("o_orderpriority"), col("o_orderkey")).as("last_prio"),
            min_by(col("o_orderpriority"), col("o_orderkey")).as("first_prio"),
            count_if(col("o_totalprice") > 200000).as("n_big"),
            expr("bool_or(o_totalprice > 400000)").as("any_huge"),
            expr("bool_and(o_totalprice > 0)").as("all_positive"))
      },
      Some("""SELECT o_orderstatus,
             |  arg_max(o_orderpriority, o_orderkey) AS last_prio,
             |  arg_min(o_orderpriority, o_orderkey) AS first_prio,
             |  count(*) FILTER (o_totalprice > 200000) AS n_big,
             |  bool_or(o_totalprice > 400000) AS any_huge,
             |  bool_and(o_totalprice > 0) AS all_positive
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- skew mitigation: two-stage salted aggregation. A handful of
    //      hot keys (event_type has ~4 values over the whole corpus)
    //      would hash a 100 TB shuffle onto 4 reducers; salting fans the
    //      partial aggregation over 16×keys reducers, then the final
    //      stage combines 16 rows per key. Result identical to a plain
    //      groupBy (sums reassociate; doubles rounded like every other
    //      aggregate here).
    "q39_salted_agg" -> Q(
      (s, d) => {
        Tables(s, d, "events")
          .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(16)))
          .groupBy(col("event_type"), col("__salt"))
          .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
          .groupBy(col("event_type"))
          .agg(sum(col("pn")).as("n"), round(sum(col("pv")), 4).as("sum_val"))
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_val
             |FROM events GROUP BY event_type""".stripMargin),
      headline = false),

    // ---- skew mitigation, JOIN side (q39's companion): the salted
    //      equi-join rewrite — the skewed fact fans each key over 8
    //      deterministic salt shards (hash of the unique line identity),
    //      the other side replicates 8×, and the hot key's reducer load
    //      drops ~8×. Result is EXACTLY the plain join (the oracle runs
    //      the unsalted SQL); SkewJoinSpec pins the load-spread property
    //      on a planted 50%-hot-key corpus and the AQE skew-split
    //      alternative; ScaleProbe --skew measures both. Aggregated to
    //      order grain so the catalog row count stays bounded.
    "q163_salted_join" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .withColumn("__uid",
            concat(col("l_orderkey"), lit("_"), col("l_linenumber")))
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.SkewJoin.saltedJoin(li, o, "l_orderkey", "__uid", 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin)),

    // ---- Q13: range/interval join — events against literal weekly
    //      windows; the 5-row window table broadcasts so the non-equi
    //      condition never shuffles the fact side
    "q38_range_join" -> Q(
      (s, d) => {
        import s.implicits._
        val wins = (1 to 5).map { i =>
          (s"w$i", s"2024-01-${"%02d".format(1 + (i - 1) * 7)}",
            if (i == 5) "2024-02-01" else s"2024-01-${"%02d".format(1 + i * 7)}")
        }.toDF("win", "lo", "hi")
          .select(col("win"), col("lo").cast("timestamp"), col("hi").cast("timestamp"))
        Tables(s, d, "events")
          .join(broadcast(wins), col("ts") >= col("lo") && col("ts") < col("hi"))
          .groupBy(col("win"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
      },
      Some {
        val rows = (1 to 5).map { i =>
          val lo = "2024-01-%02d".format(1 + (i - 1) * 7)
          val hi = if (i == 5) "2024-02-01" else "2024-01-%02d".format(1 + i * 7)
          s"('w$i', TIMESTAMP '$lo', TIMESTAMP '$hi')"
        }.mkString(", ")
        s"""WITH wins(win, lo, hi) AS (VALUES $rows)
           |SELECT win, count(*) AS n, round(sum(value), 4) AS sum_val
           |FROM events JOIN wins ON ts >= lo AND ts < hi
           |GROUP BY win""".stripMargin
      },
      headline = false),

    // ---- key-skew diagnostic: per candidate shuffle key, the
    //      frequency-distribution stats that decide salting / AQE skew
    //      handling BEFORE a 100 TB join melts a reducer: key count,
    //      row count, hottest-key count, mean, the p99 frequency at
    //      integer-log2-bucket resolution, and skew = max/mean. The p99
    //      is deliberately bucketed (length(bin(c)) — q156's grain):
    //      an EXACT p99 over per-key counts needs a window over up to
    //      #keys distinct frequencies in one partition — itself a skew
    //      hazard — while the log2 bucket caps the window at ≤64 rows
    //      and an order-of-magnitude answer is what the salting
    //      decision reads. 100 TB shape: one key-grain hash-agg per
    //      audited key (map-side combinable), then bucket-grain
    //      everything; exact integer threshold rank ceil(99·K/100) —
    //      no float percentile math.
    "q157_key_skew" -> Q(
      (s, d) => {
        val ev = Tables(s, d, "events")
        def skewOf(key: String): DataFrame = {
          import org.apache.spark.sql.expressions.Window
          val cnt = ev.groupBy(col(key)).agg(count(lit(1)).as("c"))
          // ≤64-bucket histogram persists ONCE per key: totals and the
          // p99 cumulative both re-ran the corpus per-key count before
          // round 16 (duplicate-subtree lint finding)
          val hist = cnt
            .groupBy(expr("CAST(length(bin(c)) AS INT)").as("bits"))
            .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
              max(col("c")).as("max_c"))
            .persistTracked
          val tot = hist.agg(sum(col("n_keys")).as("k"), sum(col("n_rows")).as("r"),
            max(col("max_c")).as("mx"))
          val wc = Window.orderBy(col("bits")).rowsBetween(Window.unboundedPreceding, 0)
          val p99 = hist.crossJoin(broadcast(tot))
            .withColumn("cum", sum(col("n_keys")).over(wc))
            .filter(col("cum") * 100 >= col("k") * 99)
            .agg(min(col("bits")).as("p99_bits"))
          tot.crossJoin(broadcast(p99))
            .select(lit(key).as("key_col"), col("k").as("n_keys"),
              col("r").as("n_rows"), col("mx").as("max_count"),
              (col("r").cast("double") / col("k").cast("double")).as("mean_count"),
              col("p99_bits"),
              (col("mx").cast("double") /
                (col("r").cast("double") / col("k").cast("double"))).as("skew"))
        }
        skewOf("user_id").unionByName(skewOf("event_type"))
      },
      Some {
        def sql(key: String) =
          s"""sk_cnt_$key AS (SELECT $key, CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |sk_hist_$key AS (SELECT CAST(length(bin(CAST(c AS BIGINT))) AS INT) AS bits,
             |    CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
             |    CAST(max(c) AS BIGINT) AS max_c
             |  FROM sk_cnt_$key GROUP BY 1),
             |sk_tot_$key AS (SELECT CAST(sum(n_keys) AS BIGINT) AS k,
             |    CAST(sum(n_rows) AS BIGINT) AS r, CAST(max(max_c) AS BIGINT) AS mx
             |  FROM sk_hist_$key),
             |sk_p99_$key AS (SELECT CAST(min(bits) AS INT) AS p99_bits FROM (
             |    SELECT bits, sum(n_keys) OVER (ORDER BY bits
             |      ROWS UNBOUNDED PRECEDING) AS cum FROM sk_hist_$key)
             |  CROSS JOIN sk_tot_$key WHERE cum * 100 >= k * 99),
             |sk_row_$key AS (SELECT '$key' AS key_col, k AS n_keys, r AS n_rows,
             |    mx AS max_count, CAST(r AS DOUBLE) / CAST(k AS DOUBLE) AS mean_count,
             |    p99_bits,
             |    CAST(mx AS DOUBLE) / (CAST(r AS DOUBLE) / CAST(k AS DOUBLE)) AS skew
             |  FROM sk_tot_$key CROSS JOIN sk_p99_$key)""".stripMargin
        s"""WITH ${sql("user_id")},
           |${sql("event_type")}
           |SELECT * FROM sk_row_user_id
           |UNION ALL SELECT * FROM sk_row_event_type""".stripMargin
      }),

    // ---- ANALYZE-style column profile — the optimizer-statistics verb
    //      (per column: row count, null count, distinct count) every
    //      warehouse collects before planning joins over a new corpus.
    //      Sketch-verified like q170: the 100 TB serving path is the
    //      one-pass mergeable HLL (approx_count_distinct, rsd 5%); the
    //      exact-NDV leg (Spark's multi-distinct Expand, ×#cols row
    //      multiplication) is the fixture-scale verification bracket —
    //      `ndv_ok` pins |HLL − exact| ≤ 15% of exact (3σ of the 5% rsd,
    //      2× margin) in pure BIGINT arithmetic, so a degenerate sketch
    //      flips the row red while the oracle pins TRUE. At 100 TB you
    //      run the HLL leg only and keep the exact leg for audits.
    //      Parity: counts/NDVs are exact BIGINTs in both engines; no
    //      floats anywhere.
    "q177_column_profile" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem").select(ProfileCols.map(col): _*)
        val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
          Seq(count(col(c)).as(s"c_$c"),
            countDistinct(col(c)).as(s"d_$c"),
            approx_count_distinct(col(c)).as(s"a_$c")) }
        val one = li.agg(aggs.head, aggs.tail: _*)
        val rows = array(ProfileCols.map { c =>
          struct(lit(c).as("col_name"), col("n_rows").as("n_rows"),
            (col("n_rows") - col(s"c_$c")).as("n_nulls"),
            col(s"d_$c").as("ndv"),
            (abs(col(s"a_$c") - col(s"d_$c")) * 100 <=
              col(s"d_$c") * NdvEpsPct).as("ndv_ok"))
        }: _*)
        one.select(explode(rows).as("r")).select(col("r.*"))
      },
      Some {
        val per = ProfileCols.map { c =>
          s"CAST(count($c) AS BIGINT) AS c_$c, " +
            s"CAST(count(DISTINCT $c) AS BIGINT) AS d_$c" }
          .mkString(",\n  ")
        val rows = ProfileCols.map { c =>
          s"SELECT '$c' AS col_name, n_rows, n_rows - c_$c AS n_nulls, " +
            s"d_$c AS ndv, TRUE AS ndv_ok FROM prof" }
          .mkString("\nUNION ALL ")
        s"""WITH prof AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  $per
           |FROM lineitem)
           |$rows""".stripMargin
      }),

    // ---- equi-depth histogram, rank-verified — q177's selectivity
    //      sibling (the other half of ANALYZE: NDV says how many values,
    //      the histogram says where they sit for range-predicate
    //      estimates). All HistB−1 boundaries are EXACT integer-cents
    //      order statistics off ONE count-of-counts cumulative (q167's
    //      idiom at distinct-cents grain — on THIS column values are
    //      near-unique, so the exact leg is honestly the fixture-scale
    //      verification harness: exact order statistics over an
    //      unbounded-domain column cost a near-rows single-partition
    //      cumulative, which is exactly WHY the serving path is the
    //      sketch). The one-pass GK multi-quantile array is pinned
    //      inside the exact ±2%-rank bracket at EVERY boundary (q170's
    //      oracle-pins-TRUE pattern at 15 points — a far tighter
    //      degeneracy net). Rank arithmetic is integer DIV throughout.
    //      At 100 TB you run the GK leg only — one corpus pass,
    //      mergeable — and keep the exact leg for sampled audits.
    //      One theta probe (cum ≥ r_lo) against the broadcast 15-row
    //      rank table computes boundary/lo/hi in a single pass.
    "q182_equidepth_hist" -> Q(
      (s, d) => {
        val v = Tables(s, d, "lineitem").select(
          expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("cents"),
          col("l_extendedprice"))
        val cum = v.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
          .select(col("cents"),
            sum(col("cnt")).over(Window.orderBy(col("cents").asc)
              .rowsBetween(Window.unboundedPreceding, 0)).as("cum"))
        val tot = v.agg(count(lit(1)).as("n"))
        // the (HistB−1)-row rank frame persists ONCE: the pick join and
        // the final report both re-ran the corpus count before round 16
        val ranks = tot
          .select(explode(expr(s"sequence(1, ${HistB - 1})")).as("k"), col("n"))
          .select(col("k"), col("n"),
            expr(s"(k * n + ${HistB - 1}) DIV $HistB").as("r_k"))
          .select(col("k"), col("n"), col("r_k"),
            expr("greatest(CAST(1 AS BIGINT), r_k - (n * 2 + 99) DIV 100)")
              .as("r_lo"),
            expr("least(n, r_k + (n * 2 + 99) DIV 100)").as("r_hi"))
          .persistTracked
        val picks = cum.join(broadcast(ranks), col("cum") >= col("r_lo"))
          .groupBy(col("k")).agg(
            min(when(col("cum") >= col("r_k"), col("cents")))
              .as("boundary_cents"),
            min(col("cents")).as("lo_cents"),
            min(when(col("cum") >= col("r_hi"), col("cents"))).as("hi_cents"))
        val qs = (1 until HistB).map(_.toDouble / HistB)
        val approx = v.agg(percentile_approx(col("l_extendedprice"),
            array(qs.map(lit): _*), lit(100)).as("ap"))
          .select(posexplode(col("ap")).as(Seq("pos", "apv")))
          .select((col("pos") + 1).as("k"),
            expr("CAST(round(apv * 100, 0) AS BIGINT)").as("ap_cents"))
        ranks.join(broadcast(picks), "k").join(broadcast(approx), "k")
          .select(col("k"), col("n"), col("r_k"), col("boundary_cents"),
            col("lo_cents"), col("hi_cents"),
            (col("ap_cents") >= col("lo_cents") &&
              col("ap_cents") <= col("hi_cents")).as("sketch_ok"))
      },
      Some(s"""WITH edh_v AS (SELECT
             |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
             |  FROM lineitem),
             |edh_cc AS (SELECT cents, count(*) AS cnt FROM edh_v GROUP BY 1),
             |edh_cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents
             |    ROWS UNBOUNDED PRECEDING) AS cum FROM edh_cc),
             |edh_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM edh_v),
             |edh_rk AS (SELECT CAST(g.k AS INT) AS k, n,
             |    (g.k * n + ${HistB - 1}) // $HistB AS r_k,
             |    greatest(CAST(1 AS BIGINT),
             |      (g.k * n + ${HistB - 1}) // $HistB - (n * 2 + 99) // 100) AS r_lo,
             |    least(n,
             |      (g.k * n + ${HistB - 1}) // $HistB + (n * 2 + 99) // 100) AS r_hi
             |  FROM (SELECT unnest(generate_series(1, ${HistB - 1})) AS k) g
             |  CROSS JOIN edh_tot),
             |edh_p AS (SELECT k,
             |    CAST(min(CASE WHEN cum >= r_k THEN cents END) AS BIGINT)
             |      AS boundary_cents,
             |    CAST(min(cents) AS BIGINT) AS lo_cents,
             |    CAST(min(CASE WHEN cum >= r_hi THEN cents END) AS BIGINT)
             |      AS hi_cents
             |  FROM edh_cum JOIN edh_rk ON cum >= r_lo GROUP BY 1)
             |SELECT edh_rk.k, n, r_k, boundary_cents, lo_cents, hi_cents,
             |  TRUE AS sketch_ok
             |FROM edh_rk JOIN edh_p ON edh_p.k = edh_rk.k""".stripMargin)),

    // ---- join-cardinality calibration — the third optimizer-stats verb
    //      (q177 NDV, q182 histogram, and now the formula they feed):
    //      for each audited join, the TEXTBOOK estimate
    //      |A⨝B| ≈ n_a·n_b / max(ndv_a, ndv_b) from exactly the stats
    //      q177 collects, beside the TRUE size computed WITHOUT
    //      materializing a single joined row — Σ_k a_k·b_k over the
    //      key-grain count tables (two hash-aggs + a key-grain equijoin
    //      whose output is ∝ distinct keys). The ratio is the planner's
    //      calibration error — the number that decides whether stats
    //      are fresh enough to trust for join reordering. All counts,
    //      NDVs, estimates and true sizes are exact BIGINTs; the ratio
    //      is one IEEE division. 100 TB shape: per join, two corpus
    //      hash-aggs at key grain + a key-grain join — never the join
    //      itself (which for the audited FK joins would be corpus-sized
    //      output).
    "q187_join_cardinality" -> Q(
      (s, d) => {
        def audit(tag: String, a: DataFrame, ka: String,
                  b: DataFrame, kb: String): DataFrame = {
          val aCnt = a.groupBy(col(ka).as("k")).agg(count(lit(1)).as("ca"))
          val bCnt = b.groupBy(col(kb).as("k")).agg(count(lit(1)).as("cb"))
          val actual = aCnt.join(bCnt, "k")
            .agg(sum(col("ca") * col("cb")).as("n_actual"))
            .select(coalesce(col("n_actual"), lit(0L)).as("n_actual"))
          val sa = a.agg(count(lit(1)).as("n_a"),
            countDistinct(col(ka)).as("ndv_a"))
          val sb = b.agg(count(lit(1)).as("n_b"),
            countDistinct(col(kb)).as("ndv_b"))
          sa.crossJoin(broadcast(sb)).crossJoin(broadcast(actual))
            .select(lit(tag).as("join_key"), col("n_a"), col("n_b"),
              col("ndv_a"), col("ndv_b"),
              expr("n_a * n_b DIV greatest(ndv_a, ndv_b)").as("n_est"),
              col("n_actual"),
              (col("n_actual").cast("double") /
                expr("CAST(n_a * n_b DIV greatest(ndv_a, ndv_b) AS DOUBLE)"))
                .as("calib_ratio"))
        }
        audit("custkey", Tables(s, d, "orders"), "o_custkey",
            Tables(s, d, "customer"), "c_custkey")
          .unionByName(audit("orderkey", Tables(s, d, "lineitem"),
            "l_orderkey", Tables(s, d, "orders"), "o_orderkey"))
      },
      Some {
        def sql(tag: String, a: String, ka: String, b: String, kb: String) =
          s"""jc_act_$tag AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT)
             |    AS n_actual
             |  FROM (SELECT $ka AS k, CAST(count(*) AS BIGINT) AS ca
             |        FROM $a GROUP BY 1) x
             |  JOIN (SELECT $kb AS k, CAST(count(*) AS BIGINT) AS cb
             |        FROM $b GROUP BY 1) y USING (k)),
             |jc_sa_$tag AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
             |    CAST(count(DISTINCT $ka) AS BIGINT) AS ndv_a FROM $a),
             |jc_sb_$tag AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
             |    CAST(count(DISTINCT $kb) AS BIGINT) AS ndv_b FROM $b),
             |jc_row_$tag AS (SELECT '$tag' AS join_key, n_a, n_b, ndv_a,
             |    ndv_b, n_a * n_b // greatest(ndv_a, ndv_b) AS n_est,
             |    n_actual,
             |    CAST(n_actual AS DOUBLE) /
             |      CAST(n_a * n_b // greatest(ndv_a, ndv_b) AS DOUBLE)
             |      AS calib_ratio
             |  FROM jc_sa_$tag CROSS JOIN jc_sb_$tag CROSS JOIN jc_act_$tag)""".stripMargin
        s"""WITH ${sql("custkey", "orders", "o_custkey", "customer", "c_custkey")},
           |${sql("orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey")}
           |SELECT * FROM jc_row_custkey
           |UNION ALL SELECT * FROM jc_row_orderkey""".stripMargin
      }),

    // ---- the 6-way join: TPC-H Q5 (local-supplier volume) — the
    //      canonical join-ORDERING benchmark the catalog's 2-table
    //      entries don't exercise: customer ⨝ orders ⨝ lineitem ⨝
    //      supplier ⨝ nation ⨝ region with the local-supplier
    //      constraint (c_nationkey = s_nationkey) and region + one-year
    //      date selections. Declarative on purpose: Catalyst must pick
    //      the plan — the four dimension legs broadcast, the ONE
    //      fact-fact edge (lineitem ⨝ orders on orderkey) is the only
    //      shuffle join, the date filter pushes to the orders scan and
    //      the region filter prunes nation keys before any fact is
    //      touched. That plan shape survives 100 TB (dims stay
    //      broadcastable, facts shuffle once); a wrong order (fact ⨝
    //      fact first without the date cut, or a shuffled dim) is what
    //      this entry would catch in a plan diff. Revenue rounds at
    //      the aggregate (the q01 order-insensitivity rule).
    "q188_tpch_q5" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer"); val o = Tables(s, d, "orders")
        val l = Tables(s, d, "lineitem"); val su = Tables(s, d, "supplier")
        val n = Tables(s, d, "nation"); val r = Tables(s, d, "region")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"))
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY n_name""".stripMargin)),

    // ================= TPC-H classics (q189-q199) =================
    // The remaining canonical optimizer shapes the catalog's operator
    // entries exercise only in isolation: semi-reduced star joins with
    // deterministic top-k, correlated EXISTS / NOT-EXISTS, scalar
    // subqueries, having-feeding-join, and outer-join double
    // aggregation. All money math is EXACT integer (q170's cents rule:
    // 2-decimal prices x 100 are exact BIGINTs; revenue in c4 units =
    // cents x (100 - disc100)), so every ORDER BY / threshold compare
    // is bit-stable across engines and each top-k set is deterministic
    // (value desc, key asc total order). Only the tables the fixture
    // carries are used; queries needing partsupp (Q2/Q9/Q11/Q16/Q20)
    // and the commit/receipt dates (Q4/Q12/Q21 verbatim) are adapted to
    // the same plan shape over shipped columns, noted per entry.

    // ---- TPC-H Q3: shipping priority — the semi-reduced fact-fact
    //      join + deterministic global top-k. Customer is filter-only
    //      (LEFT SEMI, broadcast) and cuts orders BEFORE the one
    //      orderkey shuffle; the top-10 is TakeOrderedAndProject (never
    //      a global sort) on the exact-integer revenue with orderkey
    //      tiebreak.
    "q189_tpch_q3" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
        val l = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
          .agg(sum(expr(RevC4)).as("revenue_c4"))
          .orderBy(col("revenue_c4").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |  CAST(sum($RevC4) AS BIGINT) AS revenue_c4
             |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'BUILDING')
             |  AND o_orderdate < TIMESTAMP '1998-07-01'
             |  AND l_shipdate > TIMESTAMP '1998-07-01'
             |GROUP BY 1, 2
             |ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""".stripMargin)),

    // ---- TPC-H Q6: forecast revenue change — the pure-pushdown
    //      entry: every predicate (date band, discount band, quantity
    //      cap) must reach the parquet scan; the answer is one exact
    //      BIGINT. The discount band uses raw-double literals clear of
    //      the representable boundaries (0.049/0.071 brackets the
    //      {0.05,0.06,0.07} domain) so the filter pushes down instead
    //      of hiding behind the cents rounding.
    "q190_tpch_q6" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.049 && col("l_discount") <= 0.071 &&
            col("l_quantity") < 24)
          .agg(sum(expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
              "CAST(round(l_discount * 100, 0) AS BIGINT)")).as("revenue_c4"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
             |           CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
             |         AS revenue_c4,
             |  count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.049 AND l_discount <= 0.071
             |  AND l_quantity < 24""".stripMargin)),

    // ---- TPC-H Q7: volume shipping between two nations. The nation
    //      pair filter is MANUALLY pushed into each dimension leg
    //      (Catalyst cannot infer `a IN (X,Y) AND b IN (X,Y)` from the
    //      disjunctive pair predicate), so the supplier leg cuts the
    //      fact to ~2/25 BEFORE the orderkey shuffle; the cross-pair
    //      exclusion (supp != cust) runs after both broadcasts. The
    //      customer join shuffles on custkey — Q7's irreducible second
    //      exchange at scale.
    "q191_tpch_q7" -> Q(
      (s, d) => {
        // pair chosen to BIND at every sf: NATION_1/NATION_2 has zero
        // qualifying 1997-98 cross-nation lines at sf0.001 (probed),
        // which tripped the rows>0 smoke gate — 19/11 carries 21/114/562
        // lines at sf0.001/0.01/0.1
        val names = Seq("NATION_19", "NATION_11")
        val n1 = Tables(s, d, "nation").filter(col("n_name").isin(names: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables(s, d, "nation").filter(col("n_name").isin(names: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val su = Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val l = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        val c = Tables(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
        l.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(expr(RevC4)).as("revenue_c4"), count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT supp_nation, cust_nation, l_year,
             |  CAST(sum(rev) AS BIGINT) AS revenue_c4,
             |  count(*) AS n_lines
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    year(l_shipdate) AS l_year, $RevC4 AS rev
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE n1.n_name IN ('NATION_19', 'NATION_11')
             |    AND n2.n_name IN ('NATION_19', 'NATION_11')
             |    AND n1.n_name <> n2.n_name
             |    AND l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1999-01-01')
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- TPC-H Q8: national market share — the conditional-aggregate
    //      ratio over a 6-table star. Part is filter-only (broadcast
    //      LEFT SEMI, cuts the fact first), the region constraint
    //      reaches orders as a custkey SEMI against the nation-pruned
    //      customer set, and the share is ONE exactly-rounded IEEE
    //      division of two exact BIGINTs — bit-stable cross-engine
    //      (libm-free, the q160/q180 rule).
    "q192_tpch_q8" -> Q(
      (s, d) => {
        val pEco = Tables(s, d, "part")
          .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
        val su = Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nAll = Tables(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val asiaKeys = Tables(s, d, "nation")
          .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("ank"))
        val cAsia = Tables(s, d, "customer")
          .join(broadcast(asiaKeys), col("c_nationkey") === col("ank"), "left_semi")
          .select(col("c_custkey"))
        val o = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(cAsia, col("o_custkey") === col("c_custkey"), "left_semi")
        Tables(s, d, "lineitem")
          .join(broadcast(pEco), col("l_partkey") === col("p_partkey"), "left_semi")
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nAll), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("n_name") === "NATION_2", expr(RevC4))
              .otherwise(lit(0L))).as("nation_c4"),
            sum(expr(RevC4)).as("total_c4"))
          .select(col("o_year"), col("nation_c4"), col("total_c4"),
            expr("round((CAST(nation_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE)) " +
              "* CAST(100 AS DOUBLE), 6)").as("share_r6"))
      },
      Some(s"""SELECT o_year, nation_c4, total_c4,
             |  round((CAST(nation_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE))
             |        * CAST(100 AS DOUBLE), 6) AS share_r6
             |FROM (
             |  SELECT year(o_orderdate) AS o_year,
             |    CAST(sum(CASE WHEN n_name = 'NATION_2' THEN $RevC4
             |             ELSE 0 END) AS BIGINT) AS nation_c4,
             |    CAST(sum($RevC4) AS BIGINT) AS total_c4
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_partkey IN (SELECT p_partkey FROM part
             |                      WHERE p_type = 'ECONOMY')
             |    AND o_custkey IN (SELECT c_custkey FROM customer
             |                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |                      JOIN region ON n2.n_regionkey = r_regionkey
             |                      WHERE r_name = 'ASIA')
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01'
             |  GROUP BY 1)""".stripMargin)),

    // ---- TPC-H Q10: returned-item reporting — top-20 customers by
    //      lost revenue in one quarter. Return-flag and date filters
    //      cut both facts before the one orderkey shuffle; the custkey
    //      regroup is the second irreducible exchange; nation
    //      broadcasts; the top-20 is TakeOrderedAndProject on exact
    //      BIGINTs with custkey tiebreak.
    "q193_tpch_q10" -> Q(
      (s, d) => {
        val l = Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
        val o = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        val c = Tables(s, d, "customer")
        val n = Tables(s, d, "nation")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
            expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_c"))
          .agg(sum(expr(RevC4)).as("revenue_c4"))
          .orderBy(col("revenue_c4").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
             |  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c,
             |  CAST(sum($RevC4) AS BIGINT) AS revenue_c4
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-07-01'
             |  AND o_orderdate < TIMESTAMP '1997-10-01'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""".stripMargin)),

    // ---- TPC-H Q13: customer order-count distribution — the
    //      OUTER-join double aggregate. The priority filter belongs
    //      INSIDE the outer join (filtering orders BEFORE the join
    //      keeps no-match customers as zero rows — the classic Q13
    //      subtlety; an after-join WHERE would drop them); count(col)
    //      counts only matched rows. Second aggregate runs at
    //      order-count grain (bounded by max orders/customer).
    "q194_tpch_q13" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_custkey"), col("o_orderkey"))
        Tables(s, d, "customer").select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy(col("n_orders"))
          .agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT n_orders, count(*) AS n_cust FROM (
             |  SELECT c_custkey, count(o_orderkey) AS n_orders
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey
             |    AND o_orderpriority <> '4-NOT SPECIFIED'
             |  GROUP BY 1)
             |GROUP BY 1""".stripMargin)),

    // ---- TPC-H Q14: promotion-revenue share for one month — the
    //      conditional-sum ratio with a broadcast part dimension. Both
    //      legs ride ONE scan + ONE broadcast join; the percentage is
    //      the q192 exact-division idiom. 1-ROW grain at a 1/84 date
    //      cut leaves only ~1.3× BIGINT headroom at 100 TB worst case,
    //      so the c4 sums take q218's DECIMAL(38,0) accumulation
    //      (BIGINT output cast — exact while < 2^63, loud past it).
    "q195_tpch_q14" -> Q(
      (s, d) => {
        val p = Tables(s, d, "part").select(col("p_partkey"), col("p_type"))
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              expr(s"CAST($RevC4 AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).cast("long")
              .as("promo_c4"),
            sum(expr(s"CAST($RevC4 AS DECIMAL(38,0))")).cast("long")
              .as("total_c4"))
          .select(col("promo_c4"), col("total_c4"),
            expr("round((CAST(promo_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE)) " +
              "* CAST(100 AS DOUBLE), 6)").as("promo_pct_r6"))
      },
      Some(s"""SELECT promo_c4, total_c4,
             |  round((CAST(promo_c4 AS DOUBLE) / CAST(total_c4 AS DOUBLE))
             |        * CAST(100 AS DOUBLE), 6) AS promo_pct_r6
             |FROM (
             |  SELECT
             |    CAST(sum(CASE WHEN p_type = 'PROMO'
             |             THEN CAST($RevC4 AS DECIMAL(38,0))
             |             ELSE CAST(0 AS DECIMAL(38,0)) END) AS BIGINT)
             |      AS promo_c4,
             |    CAST(sum(CAST($RevC4 AS DECIMAL(38,0))) AS BIGINT) AS total_c4
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
             |    AND l_shipdate < TIMESTAMP '1997-10-01')""".stripMargin)),

    // ---- TPC-H Q18: large-volume customers — the HAVING-feeding-join.
    //      The order-grain quantity aggregate (exact: integral
    //      quantities sum exactly in doubles, cast to BIGINT) filters
    //      to qualifying orders FIRST, and the qualifying set carries
    //      its sum into the join — no second lineitem scan, unlike the
    //      textbook IN-subquery formulation, same semantics. Top-100 by
    //      exact price cents, orderkey tiebreak.
    "q196_tpch_q18" -> Q(
      (s, d) => {
        val big = Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(expr("CAST(round(sum(l_quantity), 0) AS BIGINT)").as("sum_qty"))
          .filter(col("sum_qty") > 180)
        Tables(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
            expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("price_c"),
            col("sum_qty"))
          .orderBy(col("price_c").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey,
             |    CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty
             |  FROM lineitem GROUP BY 1
             |  HAVING CAST(round(sum(l_quantity), 0) AS BIGINT) > 180)
             |SELECT c_name, c_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_c,
             |  sum_qty
             |FROM big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY price_c DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ---- TPC-H Q4 (shape): order-priority checking via correlated
    //      EXISTS. The fixture has no commit/receipt dates, so "late"
    //      is l_shipdate > o_orderdate + 90 days — same correlated
    //      semi-join shape: equi on orderkey PLUS a cross-table
    //      inequality, which Spark plans as a semi join with the
    //      inequality as the join residual (never a per-row subquery).
    "q197_late_exists" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_late_orders"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_late_orders
             |FROM orders o
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
             |GROUP BY 1""".stripMargin)),

    // ---- TPC-H Q21 (shape): suppliers who kept orders waiting — the
    //      EXISTS + NOT-EXISTS double correlation. A supplier's late
    //      line qualifies iff the order has ANOTHER supplier's line
    //      (semi) and NO other supplier was also late (anti); both
    //      correlations are orderkey-equi joins with the
    //      supplier-inequality as residual, so each is one shuffle at
    //      order grain — never a per-row subquery. "Late" adapts Q21's
    //      receipt>commit to shipdate > orderdate + 120d (no
    //      commit/receipt columns in the fixture).
    "q198_sole_delay" -> Q(
      (s, d) => {
        def lines(): DataFrame = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
        val late = lines()
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"))
          .select(col("l_orderkey").as("lk"), col("l_suppkey").as("sk"))
        val others = lines()
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOthers = late
          .select(col("lk").as("lk3"), col("sk").as("sk3"))
        val base = late
          .join(others,
            col("lk") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
          .join(lateOthers,
            col("lk") === col("lk3") && col("sk") =!= col("sk3"), "left_anti")
        base
          .join(broadcast(Tables(s, d, "supplier")), col("sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n_waits"))
          .orderBy(col("n_waits").desc, col("s_name").asc)
          .limit(10)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_shipdate > o_orderdate + INTERVAL 120 DAY)
             |SELECT s_name, count(*) AS n_waits
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY 1
             |ORDER BY n_waits DESC, s_name LIMIT 10""".stripMargin)),

    // ---- TPC-H Q22 (shape): dormant high-balance customers — the
    //      scalar-subquery + anti-join. The positive-balance mean
    //      threshold is applied WITHOUT division: bal*n > total is the
    //      exact integer cross-multiply (no float mean, no boundary
    //      ambiguity), riding a broadcast 1-row cross (q107's shape).
    //      Dormancy = no orders in the trailing window, a custkey
    //      LEFT ANTI against the date-pruned orders scan. The nation
    //      subset stands in for Q22's phone-prefix predicate.
    "q199_dormant_rich" -> Q(
      (s, d) => {
        val sub = Tables(s, d, "customer")
          .filter(col("c_nationkey").isin(3, 8, 13, 18))
          .select(col("c_custkey"), col("c_nationkey"),
            expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_c"))
        val st = sub.filter(col("bal_c") > 0)
          .agg(sum(col("bal_c")).as("tot"), count(lit(1)).as("n_pos"))
        val recent = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-07-01").cast("timestamp"))
          .select(col("o_custkey"))
        sub.crossJoin(broadcast(st))
          .filter(col("bal_c") * col("n_pos") > col("tot"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("total_bal_c"))
      },
      Some("""WITH sub AS (
             |  SELECT c_custkey, c_nationkey,
             |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
             |  FROM customer WHERE c_nationkey IN (3, 8, 13, 18)),
             |st AS (
             |  SELECT CAST(sum(bal_c) AS BIGINT) AS tot, count(*) AS n_pos
             |  FROM sub WHERE bal_c > 0)
             |SELECT c_nationkey, count(*) AS n_cust,
             |  CAST(sum(bal_c) AS BIGINT) AS total_bal_c
             |FROM sub, st
             |WHERE bal_c * n_pos > tot
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = sub.c_custkey
             |                    AND o.o_orderdate >= TIMESTAMP '1999-07-01')
             |GROUP BY 1""".stripMargin)),

    // ---- TPC-H Q1: pricing summary report — the canonical wide hash
    //      aggregate: ONE full-fact scan feeding a 2-key groupBy with
    //      six exact integer sums (quantities are integral; prices/
    //      discounts/taxes carry <= 2 decimals, so cents / c4 / c6
    //      units are exact BIGINTs) and three derived averages, each
    //      ONE IEEE division of exact sums rendered from the shared
    //      Q1Derived template (the q204 OlsDerived discipline — both
    //      engines parse the same text, bit-identical doubles). 100 TB:
    //      map-side combinable all the way, 6-row output. Q1's 6-group
    //      grain makes it the one money aggregate whose per-group row
    //      count is corpus-sized (~1.5e11 rows/group at 100 TB), so
    //      the c4/c6 sums ACCUMULATE in DECIMAL(38,0) — mergeable,
    //      Tungsten-native, Long-sound to 10^38 — and cast to BIGINT
    //      only at output (exact while < 2^63; past that the cast
    //      fails LOUDLY in both engines instead of wrapping silently,
    //      and the output unit moves up — the q212 rescale lesson:
    //      implement the mitigation, don't footnote it). The finer-
    //      grain TPC-H entries (nation/order/customer grain) stay on
    //      plain BIGINT sums with orders of magnitude of headroom.
    "q218_tpch_q1" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            expr("CAST(round(sum(l_quantity), 0) AS BIGINT)").as("sum_qty"),
            sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
              .as("sum_base_c"),
            sum(expr(s"CAST($RevC4 AS DECIMAL(38,0))")).cast("long")
              .as("sum_disc_c4"),
            sum(expr(s"CAST($ChargeC6 AS DECIMAL(38,0))")).cast("long")
              .as("sum_charge_c6"),
            sum(expr("CAST(round(l_discount * 100, 0) AS BIGINT)"))
              .as("sum_disc100"),
            count(lit(1)).as("n_lines"))
          .selectExpr(Seq("l_returnflag", "l_linestatus", "sum_qty",
            "sum_base_c", "sum_disc_c4", "sum_charge_c6", "n_lines")
            ++ Q1Derived: _*)
      },
      Some(s"""WITH m AS (SELECT l_returnflag, l_linestatus,
             |    CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
             |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS sum_base_c,
             |    CAST(sum(CAST($RevC4 AS DECIMAL(38,0))) AS BIGINT)
             |      AS sum_disc_c4,
             |    CAST(sum(CAST($ChargeC6 AS DECIMAL(38,0))) AS BIGINT)
             |      AS sum_charge_c6,
             |    CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT))
             |      AS BIGINT) AS sum_disc100,
             |    count(*) AS n_lines
             |  FROM lineitem
             |  WHERE l_shipdate <= TIMESTAMP '2000-09-01'
             |  GROUP BY 1, 2)
             |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_c,
             |  sum_disc_c4, sum_charge_c6, n_lines,
             |  ${Q1Derived.mkString(",\n             |  ")}
             |FROM m""".stripMargin)),

    // ---- TPC-H Q12 (shape): priority split by line status — the
    //      CASE-count pivot over a fact-fact join. The fixture carries
    //      no l_shipmode / commit / receipt dates, so the pivot key is
    //      l_linestatus and "late" adapts to shipdate > orderdate +
    //      60 days (the q197 adaptation); the shape under test is the
    //      conditional-sum pair inside one aggregate after the one
    //      orderkey shuffle. 100 TB: the year cut pushes to the
    //      lineitem scan, orders projects 3 columns, output is
    //      #statuses rows.
    "q219_tpch_q12" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
             |GROUP BY 1""".stripMargin)),

    // ---- TPC-H Q15: top-revenue supplier — max over a derived table
    //      that is then re-joined to itself (the VIEW + scalar-max
    //      shape). The quarterly revenue aggregate is computed ONCE at
    //      supplier grain; its 1-row max broadcasts back over it (the
    //      q199 broadcast-1-row cross idiom), so the "view" is never
    //      re-evaluated — unlike the textbook formulation, which scans
    //      lineitem twice. Exact-integer revenue makes the max
    //      predicate tie-exact (every tied supplier reports). 100 TB:
    //      one fact scan cut by the pushed date band, one suppkey
    //      shuffle at supplier grain, broadcast max, broadcast name
    //      join.
    "q220_tpch_q15" -> Q(
      (s, d) => {
        val rev = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(expr(RevC4)).as("total_rev_c4"))
        val mx = rev.agg(max(col("total_rev_c4")).as("max_rev_c4"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_rev_c4") === col("max_rev_c4"))
          .join(broadcast(Tables(s, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_c4"))
      },
      Some(s"""WITH rev AS (
             |  SELECT l_suppkey, CAST(sum($RevC4) AS BIGINT) AS total_rev_c4
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, total_rev_c4
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev_c4 = (SELECT max(total_rev_c4) FROM rev)"""
        .stripMargin)),

    // ---- TPC-H Q17: small-quantity-order revenue — the correlated
    //      scalar-AVERAGE subquery (the one subquery class q82/q197/
    //      q198 don't cover: a per-group scalar aggregate correlated
    //      back to the fact row). Decorrelated the only way that
    //      scales: the per-part (count, sum-qty) aggregate joins back
    //      to the fact at part grain — never a per-row subquery. The
    //      0.2·avg threshold compares as the exact integer
    //      cross-multiply qty·5·n < Σqty (no float mean, no boundary
    //      ambiguity — the q199 idiom). Both the fact leg and the
    //      aggregate leg are cut by the broadcast brand filter BEFORE
    //      the partkey shuffle. 100 TB: two scans of the brand-pruned
    //      slice (~1/#brands), one partkey exchange, 1-row output.
    "q221_tpch_q17" -> Q(
      (s, d) => {
        val pb = Tables(s, d, "part")
          .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
        val agg = Tables(s, d, "lineitem")
          .join(broadcast(pb), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy(col("l_partkey").as("pk"))
          .agg(count(lit(1)).as("n_part"),
            expr("CAST(round(sum(l_quantity), 0) AS BIGINT)").as("sq"))
        Tables(s, d, "lineitem")
          .join(broadcast(pb), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .join(agg, col("l_partkey") === col("pk"))
          .filter(expr("CAST(round(l_quantity, 0) AS BIGINT) * 5 * n_part < sq"))
          .agg(count(lit(1)).as("n_lines"),
            sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
              .as("total_c"))
          .selectExpr("n_lines", "total_c",
            "CAST(total_c AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly_c")
      },
      Some("""WITH pb AS (SELECT p_partkey FROM part
             |    WHERE p_brand = 'Brand#3'),
             |agg AS (SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n_part,
             |    CAST(round(sum(l_quantity), 0) AS BIGINT) AS sq
             |  FROM lineitem
             |  WHERE l_partkey IN (SELECT p_partkey FROM pb)
             |  GROUP BY 1)
             |SELECT n_lines, total_c,
             |  CAST(total_c AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly_c
             |FROM (
             |  SELECT CAST(count(*) AS BIGINT) AS n_lines,
             |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS total_c
             |  FROM lineitem JOIN agg ON l_partkey = pk
             |  WHERE l_partkey IN (SELECT p_partkey FROM pb)
             |    AND CAST(round(l_quantity, 0) AS BIGINT) * 5 * n_part < sq)"""
        .stripMargin)),

    // ---- TPC-H Q19: discounted revenue from three disjunctive
    //      brand/size/quantity branches — the OR-of-conjunctions
    //      pushdown test. The disjunction's quantity HULL (1..40) is
    //      stated as a separate conjunct so it reaches the lineitem
    //      parquet scan as a pushed filter (Catalyst does not extract
    //      common ranges from an OR across both join sides), and the
    //      brand/size hull prunes part before the broadcast; the full
    //      disjunction then runs as the join residual. Same predicate
    //      text in the oracle (the hull conjuncts are implied by the
    //      disjunction, so results are unchanged — only the plan
    //      needs them). 100 TB: fact scan reads the hull slice only;
    //      part broadcasts; no second shuffle (1-row output).
    "q222_tpch_q19" -> Q(
      (s, d) => {
        val p = Tables(s, d, "part")
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        Tables(s, d, "lineitem")
          .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 40)))
          .agg(count(lit(1)).as("n_lines"),
            // 1-row grain: DECIMAL(38,0) accumulation (q218's rule —
            // the worst-case c4 mass of the qualifying slice clears
            // 2^63 at 100 TB)
            sum(expr(s"CAST($RevC4 AS DECIMAL(38,0))")).cast("long")
              .as("revenue_c4"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST($RevC4 AS DECIMAL(38,0))) AS BIGINT)
             |    AS revenue_c4
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_quantity >= 1 AND l_quantity <= 40
             |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
             |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             |        AND l_quantity BETWEEN 1 AND 20)
             |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             |        AND l_quantity BETWEEN 10 AND 30)
             |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             |        AND l_quantity BETWEEN 20 AND 40))""".stripMargin)),

    // ---- TPC-H Q20 (shape): suppliers with heavy stock of a part
    //      class — the double-nested semi-join chain. The fixture has
    //      no partsupp, so "availqty > half-year demand" adapts to
    //      "shipped > 80 units of one PROMO part in 1997", preserving
    //      the nesting under test: supplier ←semi← (grouped lineitem
    //      ←semi← filtered part). Each level is an equi semi join —
    //      part broadcasts into the fact BEFORE the (suppkey, partkey)
    //      aggregate, and the qualifying-supplier set (tiny: the
    //      HAVING makes it sparse at every sf, probed 2/1/6) semi-cuts
    //      supplier. 100 TB: one fact scan cut by date + broadcast
    //      part, one 2-key exchange, supplier-grain output.
    "q223_tpch_q20" -> Q(
      (s, d) => {
        val promo = Tables(s, d, "part")
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))
        val heavy = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(promo), col("l_partkey") === col("p_partkey"),
            "left_semi")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(expr("CAST(round(sum(l_quantity), 0) AS BIGINT)").as("sq"))
          .filter(col("sq") > 80)
          .select(col("l_suppkey"))
        Tables(s, d, "supplier")
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem
             |  WHERE l_partkey IN (SELECT p_partkey FROM part
             |                      WHERE p_type = 'PROMO')
             |    AND l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01'
             |  GROUP BY l_suppkey, l_partkey
             |  HAVING CAST(round(sum(l_quantity), 0) AS BIGINT) > 80)"""
        .stripMargin)),

    // ---- TPC-H Q2 (shape): min-cost supplier per part — the
    //      decorrelated correlated-MIN subquery re-joined to its own
    //      aggregate, under a dimension snowflake (supplier→nation→
    //      region), with top-k output. The fixture has no partsupp, so
    //      "supply cost" adapts to the minimum observed line price
    //      (cents) per part among EUROPE-region suppliers; the shape
    //      under test — aggregate-then-rejoin at (key, min) + snowflake
    //      broadcast + TakeOrderedAndProject — is Q2's. Ties at the min
    //      all report (exact-integer cents, the q220 rule). 100 TB: the
    //      region slice of supplier broadcasts; ONE partkey exchange
    //      feeds BOTH the (part, supplier, cost) distinct (partkey
    //      clustering satisfies the wider distinct grouping) AND the
    //      per-partkey window min — the min-then-rejoin of the
    //      correlated subquery collapses to filter-on-window over a
    //      single lineitem scan, never a second distinct subtree
    //      (round-15 verdict: the aggregate-and-rejoin form built the
    //      corpus distinct twice with no ReusedExchange); part joins at
    //      partkey grain (AQE picks BHJ at fixture scale, SMJ past
    //      broadcast size); output is top-100 via TakeOrderedAndProject.
    "q228_tpch_q2" -> Q(
      (s, d) => {
        val eu = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"),
            expr("CAST(round(s_acctbal * 100, 0) AS BIGINT)").as("bal_c"),
            col("n_name"))
        val lines = Tables(s, d, "lineitem")
          .join(broadcast(eu.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"),
            expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
              .as("cost_c"))
          .repartition(col("l_partkey"))
          .distinct()
        lines
          .withColumn("min_cost_c",
            min(col("cost_c")).over(Window.partitionBy(col("l_partkey"))))
          .filter(col("cost_c") === col("min_cost_c"))
          .join(Tables(s, d, "part").filter(col("p_type") === "STANDARD")
            .select(col("p_partkey"), col("p_name")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
          .select(col("bal_c"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("min_cost_c"),
            col("s_suppkey"))
          .orderBy(col("bal_c").desc, col("s_suppkey"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH eu AS (
             |  SELECT s_suppkey, s_name,
             |    CAST(round(s_acctbal * 100, 0) AS BIGINT) AS bal_c, n_name
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |lines AS (
             |  SELECT DISTINCT l_partkey, l_suppkey,
             |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cost_c
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM eu)),
             |mn AS (SELECT l_partkey AS pk, min(cost_c) AS min_cost_c
             |  FROM lines GROUP BY 1)
             |SELECT bal_c, s_name, n_name, p_partkey, p_name, min_cost_c,
             |  s_suppkey
             |FROM lines JOIN mn ON l_partkey = pk AND cost_c = min_cost_c
             |JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
             |JOIN eu ON l_suppkey = s_suppkey
             |ORDER BY bal_c DESC, s_suppkey, p_partkey LIMIT 100"""
        .stripMargin)),

    // ---- TPC-H Q4 (shape): order-priority checking — the correlated
    //      EXISTS semi join whose condition references BOTH sides
    //      (l_shipdate against the outer row's o_orderdate). The
    //      fixture has no commit/receipt dates, so "late" adapts to
    //      shipped > 30 days after order date (q219's adaptation); the
    //      shape under test is the equi semi join with a non-equi
    //      residual, counted per priority. 100 TB: the quarter cut is
    //      a pushed filter on the orders scan; one orderkey exchange
    //      for the semi; output is #priorities rows.
    "q229_tpch_q4" -> Q(
      (s, d) => {
        Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .join(Tables(s, d, "lineitem")
            .select(col("l_orderkey"), col("l_shipdate")),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY 1""".stripMargin)),

    // ---- TPC-H Q9 (shape): product-type profit by nation and year —
    //      the 5-way star join with a SIGNED money measure grouped by
    //      a derived date part. The fixture has no partsupp, so unit
    //      cost adapts to p_retailprice; profit = revenue (c4 units)
    //      minus retail-cents × qty × 100 (same c4 unit), exact per
    //      row, possibly negative. Accumulated in DECIMAL(38,0) and
    //      cast at the boundary (the q218 rule: nation×year grain is
    //      corpus-sized at 100 TB; overflow must fail loudly, not
    //      wrap). 100 TB: the widget cut prunes part before its
    //      partkey join (AQE: BHJ at fixture, SMJ at scale); supplier→
    //      nation broadcasts; ONE orderkey exchange joins orders;
    //      output is #nations × #years rows.
    "q230_tpch_q9" -> Q(
      (s, d) => {
        val pw = Tables(s, d, "part").filter(col("p_name").like("%widget%"))
          .select(col("p_partkey"), col("p_retailprice"))
        val sn = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        Tables(s, d, "lineitem")
          .join(pw, col("l_partkey") === col("p_partkey"))
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .join(Tables(s, d, "orders")
            .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(sum(expr(s"CAST($RevC4 - $CostC4 AS DECIMAL(38,0))"))
            .cast("long").as("sum_profit_c4"))
      },
      Some(s"""SELECT n_name, year(o_orderdate) AS o_year,
             |  CAST(sum(CAST($RevC4 - $CostC4 AS DECIMAL(38,0)))
             |    AS BIGINT) AS sum_profit_c4
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY 1, 2""".stripMargin)),

    // ---- TPC-H Q11 (shape): important stock — per-key value with a
    //      HAVING against a GLOBAL scalar aggregate of the same derived
    //      table. Adapted to per-part revenue from EUROPE-region
    //      suppliers (no partsupp), kept if value > 1.5× the mean part
    //      value — scale-free, unlike Q11's fixed fraction, so the
    //      predicate splits at every sf (probed 14/331/2922 of
    //      200/1984/19960). The threshold compares as the exact
    //      integer cross-multiply value·n·10 > 15·Σvalue in
    //      DECIMAL(38,0) (Σvalue is corpus-sized at 100 TB; the
    //      product's bound 2⁶³·n·10 < 10³⁸ holds to n ≈ 5·10¹⁷ parts).
    //      100 TB: region slice broadcasts into the fact semi; ONE
    //      partkey exchange; the 1-row global frame broadcasts back
    //      over the part-grain aggregate (q220's idiom).
    "q231_tpch_q11" -> Q(
      (s, d) => {
        val eu = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"))
        // part-grain values persist ONCE: the 1-row (Σ, n) frame and the
        // threshold filter both re-ran the lineitem semi+aggregate
        // before round 16 (duplicate-subtree lint finding)
        val v = Tables(s, d, "lineitem")
          .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"),
            "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum(expr(RevC4)).as("value_c4"))
          .persistTracked
        val g = v.agg(
          sum(col("value_c4").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        v.crossJoin(broadcast(g))
          .filter(expr("CAST(value_c4 AS DECIMAL(38,0)) * n * 10 > 15 * s"))
          .select(col("l_partkey"), col("value_c4"))
      },
      Some(s"""WITH eu AS (
             |  SELECT s_suppkey FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |v AS (SELECT l_partkey, CAST(sum($RevC4) AS BIGINT) AS value_c4
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
             |  GROUP BY 1),
             |g AS (SELECT CAST(sum(CAST(value_c4 AS DECIMAL(38,0)))
             |    AS DECIMAL(38,0)) AS s, count(*) AS n FROM v)
             |SELECT l_partkey, value_c4 FROM v, g
             |WHERE CAST(value_c4 AS DECIMAL(38,0)) * n * 10 > 15 * s"""
        .stripMargin)),

    // ---- TPC-H Q16 (shape): supplier count by part attributes — the
    //      NOT-IN exclusion subquery (anti join) + COUNT DISTINCT over
    //      a deduplicated pair set + negated predicates on the dim.
    //      The fixture has no partsupp or s_comment, so the pair set
    //      is the DISTINCT (partkey, suppkey) observed in lineitem and
    //      "complaint" suppliers adapt to names ending in '7' (~10% at
    //      every sf — the negative-acctbal arm is EMPTY at sf0.001, so
    //      it cannot carry the exclusion). 100 TB: ONE pair-grain
    //      distinct exchange (the dominant shuffle, unavoidable — the
    //      measure is defined over distinct pairs), the complaint set
    //      broadcasts into an anti join, part joins at partkey grain,
    //      then a (brand, type, size) count-distinct re-aggregate.
    "q232_tpch_q16" -> Q(
      (s, d) => {
        val bad = Tables(s, d, "supplier")
          .filter(col("s_name").like("%7")).select(col("s_suppkey"))
        Tables(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .join(Tables(s, d, "part")
            .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
            .select(col("p_partkey"), col("p_brand"), col("p_type"),
              col("p_size")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_name LIKE '%7')
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- TPC-H Q21 (shape): suppliers who kept orders waiting — the
    //      EXISTS + NOT-EXISTS self-join pair on the fact table, the
    //      hardest canonical subquery shape. Adapted: a (supplier,
    //      order) pair waits if the order is status 'F', this
    //      supplier shipped > 90 days after the order date, ANOTHER
    //      supplier has a line on the order (semi), and NO other
    //      supplier shipped late on it (anti). Pairs are DISTINCT
    //      before counting (a supplier's multiple late lines on one
    //      order count once). 100 TB: the late set is one orderkey-
    //      residual join cut by the pushed status filter, MATERIALIZED
    //      once (persist, matching the oracle's MATERIALIZED CTE) so
    //      the semi probe base and the anti build side read one
    //      in-memory relation instead of rebuilding the join+distinct
    //      subtree twice (round-15 verdict finding); both self joins
    //      are equi on orderkey with a suppkey≠ residual, never
    //      all-pairs; supplier names broadcast; top-100 via
    //      TakeOrderedAndProject.
    "q233_tpch_q21" -> Q(
      (s, d) => {
        val l1 = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val late = l1
          .join(Tables(s, d, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
          .persistTracked
        val sole = late
          .join(l1.select(col("l_orderkey").as("xo"), col("l_suppkey").as("xs")),
            col("l_orderkey") === col("xo") && col("l_suppkey") =!= col("xs"),
            "left_semi")
          .join(late.select(col("l_orderkey").as("yo"), col("l_suppkey").as("ys")),
            col("l_orderkey") === col("yo") && col("l_suppkey") =!= col("ys"),
            "left_anti")
        sole.groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables(s, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"), col("s_suppkey"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
          .limit(100)
      },
      Some("""WITH late AS MATERIALIZED (
             |  SELECT DISTINCT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'
             |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |SELECT s_name, count(*) AS numwait, s_suppkey
             |FROM late lt JOIN supplier ON s_suppkey = lt.l_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem x
             |              WHERE x.l_orderkey = lt.l_orderkey
             |                AND x.l_suppkey <> lt.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late y
             |                  WHERE y.l_orderkey = lt.l_orderkey
             |                    AND y.l_suppkey <> lt.l_suppkey)
             |GROUP BY s_name, s_suppkey
             |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin)),

    // ---- TPC-H Q22 (shape): global sales opportunity — the
    //      uncorrelated scalar-AVERAGE subquery + NOT-EXISTS anti join
    //      + substring-derived grouping key. Adapted: country code is
    //      the last two digits of c_name (no c_phone), "no orders"
    //      becomes no orders since 1999 (every fixture customer has
    //      SOME order), and the average compares as the exact integer
    //      cross-multiply bal_c·n > Σbal_c over positive balances
    //      (bal_c ≤ 10⁶ cents, so the product is Long-safe to n ≈
    //      9·10¹² customers; Σ accumulates in DECIMAL(38,0)). 100 TB:
    //      the 1-row (Σ, n) frame broadcasts over the customer scan;
    //      the anti join is equi on custkey against the date-pruned
    //      orders projection; output is ≤100 code groups.
    "q234_tpch_q22" -> Q(
      (s, d) => {
        val pos = Tables(s, d, "customer")
          .filter(col("c_acctbal") > 0)
          .select(col("c_custkey"),
            expr("substring(c_name, length(c_name) - 1, 2)").as("cntrycode"),
            expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("bal_c"))
        val g = pos.agg(
          sum(col("bal_c").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        pos.crossJoin(broadcast(g))
          .filter(expr("CAST(bal_c * n AS DECIMAL(38,0)) > s"))
          .join(Tables(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
      },
      Some("""WITH pos AS (
             |  SELECT c_custkey,
             |    substring(c_name, length(c_name) - 1, 2) AS cntrycode,
             |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
             |  FROM customer WHERE c_acctbal > 0),
             |g AS (SELECT CAST(sum(CAST(bal_c AS DECIMAL(38,0)))
             |    AS DECIMAL(38,0)) AS s, count(*) AS n FROM pos)
             |SELECT cntrycode, count(*) AS numcust,
             |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
             |FROM pos, g
             |WHERE CAST(bal_c * n AS DECIMAL(38,0)) > s
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY 1""".stripMargin)),

    // ---- WINSORIZED mean per priority: order value clamped to the
    //      exact per-group [p05, p95] before averaging — the robust
    //      mean every revenue/latency dashboard wants once a single
    //      fat-finger order can drag the raw mean (q236's breakdown
    //      argument applied to the mean instead of the center).
    //      Boundaries are exact LOW-rank order statistics (min v with
    //      cum·20 ≥ n, resp. ≥ 19n — the q182 exact-boundary
    //      technique, no interpolation), the clamped sum accumulates
    //      in DECIMAL(38,0) (clamped cents × corpus-sized groups clear
    //      2⁶³ at 100 TB — the q218 rule), and the mean is ONE IEEE
    //      division. 100 TB: ONE fact scan into a map-side-combinable
    //      (priority, cents) aggregate; cumulative windows and the
    //      clamp run at value-domain grain (#priorities × #distinct
    //      cents), never per-order; boundary tables broadcast.
    "q239_winsorized_mean" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val vc = Tables(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("v"))
          .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
          // value-domain histogram persists ONCE: totals, the cumulative
          // rank chain, and the winsorize join are all re-aggregates of
          // it — pre-round-16 each re-scanned orders (lint finding)
          .persistTracked
        val n = vc.groupBy(col("grp")).agg(sum(col("c")).as("n"))
        val cum = vc.withColumn("cm", sum(col("c"))
            .over(Window.partitionBy(col("grp")).orderBy(col("v"))))
          .join(broadcast(n), "grp")
        val lo = cum.filter(col("cm") * 20 >= col("n"))
          .groupBy(col("grp")).agg(min(col("v")).as("p05"))
        val hi = cum.filter(col("cm") * 20 >= col("n") * 19)
          .groupBy(col("grp")).agg(min(col("v")).as("p95"))
        vc.join(broadcast(lo), "grp").join(broadcast(hi), "grp")
          .select(col("grp"), col("p05"), col("p95"), col("c"),
            when(col("v") < col("p05"), col("p05"))
              .when(col("v") > col("p95"), col("p95"))
              .otherwise(col("v")).as("wv"))
          .groupBy(col("grp"))
          .agg(min(col("p05")).as("p05_c"), min(col("p95")).as("p95_c"),
            sum(expr("CAST(wv * c AS DECIMAL(38,0))")).cast("long")
              .as("wsum_c"),
            sum(col("c")).as("n_rows"))
          .selectExpr("grp", "p05_c", "p95_c", "wsum_c", "n_rows",
            "CAST(wsum_c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS winsor_mean_c")
      },
      Some("""WITH b AS (SELECT o_orderpriority AS grp,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
             |  FROM orders),
             |vc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
             |  FROM b GROUP BY 1, 2),
             |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM vc GROUP BY 1),
             |cum AS (SELECT grp, v, c,
             |    sum(c) OVER (PARTITION BY grp ORDER BY v) AS cm FROM vc),
             |lo AS (SELECT cum.grp, min(v) AS p05
             |  FROM cum JOIN n USING (grp) WHERE cm * 20 >= n GROUP BY 1),
             |hi AS (SELECT cum.grp, min(v) AS p95
             |  FROM cum JOIN n USING (grp) WHERE cm * 20 >= 19 * n GROUP BY 1),
             |w AS (SELECT vc.grp,
             |    CASE WHEN v < p05 THEN p05 WHEN v > p95 THEN p95
             |      ELSE v END AS wv, c, p05, p95
             |  FROM vc JOIN lo ON lo.grp = vc.grp JOIN hi ON hi.grp = vc.grp)
             |SELECT grp, min(p05) AS p05_c, min(p95) AS p95_c,
             |  CAST(sum(CAST(wv * c AS DECIMAL(38,0))) AS BIGINT) AS wsum_c,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(wv * c AS DECIMAL(38,0))) AS DOUBLE)
             |    / CAST(sum(c) AS DOUBLE) AS winsor_mean_c
             |FROM w GROUP BY 1""".stripMargin)),

    // ---- exact-moment OLS calibration: per-returnflag least-squares fit
    //      of line revenue (whole dollars) on quantity — the closed-form
    //      regression every monitoring/calibration pipeline ships (price
    //      elasticity here; token-count vs byte-count calibration on a
    //      corpus is the same kernel). ONE map-side-combinable hash agg
    //      collects the six integer moments (n, Σx, Σy, Σx², Σxy, Σy²)
    //      as exact BIGINTs; slope/intercept/R² are derived AFTER the
    //      agg from those exact sums through the SHARED OlsDerived
    //      expression template — one IEEE tree, textually identical in
    //      both engines, so every double is bit-reproducible cross-engine
    //      (the q189 RevC4 discipline, extended from one division to one
    //      fixed op-DAG). Overflow bound, documented not hoped: y ≤
    //      ~1.05e5 dollars so Σy² < 9.2e18 holds to ~8e8 rows per group
    //      — past that, pre-aggregate at a coarser grain or widen to
    //      DECIMAL(38) inside the agg; the moments stay mergeable either
    //      way (q185's incremental contract applies verbatim).
    "q204_ols_fit" -> Q(
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(col("l_returnflag"),
            expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
            expr("CAST(round(l_extendedprice) AS BIGINT)").as("y"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
            sum(expr("y * y")).as("syy"))
          .selectExpr(Seq("l_returnflag", "n", "sx", "sy", "sxx", "sxy",
            "syy") ++ OlsDerived: _*)
      },
      Some(s"""WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
             |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)
             |           * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)
             |           * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy,
             |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
             |           * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n, sx, sy, sxx, sxy, syy,
             |  ${OlsDerived.mkString(",\n             |  ")}
             |FROM m""".stripMargin))
  )

  /** q204's derived-statistic template: slope / intercept / R² from the
    * six exact integer moments, as SQL expression strings shared verbatim
    * by the Spark plan and the DuckDB oracle (single source of truth —
    * the two IEEE trees cannot drift). Every input is cast to DOUBLE
    * once; each derived value is a fixed sequence of IEEE ops, so both
    * engines produce bit-identical doubles.
    */
  private val OlsDerived: Seq[String] = {
    val (n, sx, sy, sxx, sxy, syy) =
      ("CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)",
        "CAST(sxx AS DOUBLE)", "CAST(sxy AS DOUBLE)", "CAST(syy AS DOUBLE)")
    val cov = s"($n * $sxy - $sx * $sy)"
    val varx = s"($n * $sxx - $sx * $sx)"
    val vary = s"($n * $syy - $sy * $sy)"
    Seq(
      s"$cov / $varx AS slope",
      s"($sy - ($cov / $varx) * $sx) / $n AS intercept",
      s"($cov * $cov) / ($varx * $vary) AS r2")
  }

  /** Exact-integer revenue term shared by the TPC-H classics: cents ×
    * (100 − discount-in-percent), i.e. revenue in 10⁻⁴-dollar units.
    * Exact because the fixture's prices/discounts carry ≤2 decimals
    * (q170's cents rule); sums stay < 2⁶³ far beyond 100 TB. The same
    * text parses in Spark and DuckDB, so the term cannot drift.
    */
  private val RevC4: String =
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"

  /** q230's unit-cost term in RevC4's 10⁻⁴-dollar units: retail cents ×
    * whole-unit quantity × 100. The fixture has no partsupp, so retail
    * price stands in for supply cost; exactness and shared-text
    * discipline are RevC4's. Per-row profit (RevC4 − CostC4) fits a
    * BIGINT with ~7 orders of headroom; the q230 SUM is the part that
    * needs DECIMAL(38,0).
    */
  private val CostC4: String =
    "CAST(round(p_retailprice * 100, 0) AS BIGINT) * " +
      "CAST(round(l_quantity, 0) AS BIGINT) * 100"

  /** q218's charge term: cents × (100 − disc%) × (100 + tax%), i.e.
    * charge in 10⁻⁶-dollar units — exact for the fixture's ≤2-decimal
    * money columns, same shared-text discipline as RevC4. Per-row
    * ceiling ~1e11; q218 accumulates it in DECIMAL(38,0) (see its
    * header) because Q1's 6-group grain makes rows/group corpus-sized.
    */
  private val ChargeC6: String =
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) * " +
      "(100 + CAST(round(l_tax * 100, 0) AS BIGINT))"

  /** q218's derived averages: one IEEE division per average over the
    * exact integer moments, shared verbatim by both engines (the
    * OlsDerived pattern). avg_price is in cents, avg_disc in percent —
    * integer-unit numerators, so no per-row float ever enters.
    */
  private val Q1Derived: Seq[String] = Seq(
    "CAST(sum_qty AS DOUBLE) / CAST(n_lines AS DOUBLE) AS avg_qty",
    "CAST(sum_base_c AS DOUBLE) / CAST(n_lines AS DOUBLE) AS avg_price_c",
    "CAST(sum_disc100 AS DOUBLE) / CAST(n_lines AS DOUBLE) AS avg_disc100")

  /** q182's bucket count: HistB−1 interior boundaries at ranks
    * ceil(k·n/HistB) — the per-column selectivity histogram grain.
    */
  val HistB = 16

  /** q177's profiled column set — pinned so the Spark plan and the
    * generated oracle SQL can never disagree on order or membership.
    */
  val ProfileCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** q177's HLL acceptance band: 3σ of approx_count_distinct's default
    * 5% rsd is 15%; HLL++'s observed error on the fixture NDVs is ≤5%,
    * so the band has ≥2× margin yet a degenerate sketch still fails.
    */
  val NdvEpsPct = 15
}
