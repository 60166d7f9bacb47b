package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Relational
import graft.sources.Tables

/** SURVEY.md §2 relational operator inventory instantiated over the driver
  * testdata (FIXTURES.md §1), each with a DuckDB oracle.
  *
  * Numeric-parity rules used throughout (the driver hash-compares values):
  *  - SUM over double columns is order-dependent in IEEE754, so both sides
  *    sum exact DECIMAL(18,2) and cast the result to DOUBLE — bit-identical
  *    regardless of partitioning/parallelism. MIN/MAX/COUNT are exact as-is.
  *  - Every window/top-k order ends with a unique key (orderkey) so results
  *    are a total order — no ties left to engine choice.
  *  - Ratio-style outputs are returned as integer numerator/denominator or
  *    floor-scaled BIGINTs, never rounded doubles (round() can diverge
  *    across engines at representation boundaries).
  */
object RelationalQueries {
  private val dec = DecimalType(18, 2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/P1: multi-key hash aggregate (reference: src/main.py:103,143 GROUP BY + MIN)
    "q01_group_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
    }),

    // P1-P5/P7/P10: projection with aliases, disjunctive + range + null +
    // prefix filters (reference: sql/3:10, src/benchmark.py:85)
    "q02_filter_project" -> ((s, d) => {
      Tables.orders(s, d)
        .filter((col("o_orderpriority").startsWith("1") || col("o_totalprice") > 150000)
          && col("o_orderdate").isNotNull)
        .select(
          col("o_orderkey").as("okey"),
          col("o_custkey").as("ckey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
    }),

    // J1/P2/P9: flagship multi-way inner equi-join with a constant predicate
    // inside the join ON (reference: src/main.py:130-142). Dims broadcast.
    "q03_join5" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === lit("AMERICA"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast(dec)).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // J2/J5: left outer join with a non-equi ON-term
    // (reference: src/main.py:140 `link_order <= 1`)
    "q04_left_nonequi" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") && col("l_linenumber") <= 1, "left")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_partkey")).as("n_first_lines"), max(col("l_quantity")).as("max_qty"))
    }),

    // J4: 3-hop bounded hierarchy walk + COALESCE (reference: sql/1:8-20).
    // nation is given a synthetic parent edge (parent key = n_regionkey) and a
    // partially-null attribute so the walk genuinely has to climb.
    "q05_hierarchy_walk" -> ((s, d) => {
      val nation = Tables.nation(s, d)
      val attrs = nation.select(
        col("n_nationkey").as("k"),
        when(col("n_nationkey") % 3 === 0, lit(null)).otherwise(lower(col("n_name"))).as("iso"))
      val edges = nation.select(col("n_nationkey").as("c"), col("n_regionkey").cast("int").as("p"))
      Relational.hierarchyCoalesceWalk(
        Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        "c_nationkey", edges, "c", "p", attrs, "k", "iso",
        hops = 3, default = lit("xx"), outCol = "country")
        .select(col("c_custkey"), col("country"))
    }),

    // J6: left semi-join membership test (reference: src/main.py:203 probe)
    "q06_semi_join" -> ((s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      Tables.customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // anti-join complement of q06 (NOT EXISTS)
    "q07_anti_join" -> ((s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      Tables.customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J9/J10: correlated scalar subqueries (COUNT, MIN) decorrelated into one
    // pre-aggregate + left join (reference: src/main.py:104-114,163)
    "q08_decorr_agg" -> ((s, d) => {
      val per = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"), min(col("l_shipdate")).as("mn"))
      Tables.orders(s, d)
        .join(per, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          col("o_orderkey"),
          coalesce(col("cnt"), lit(0L)).as("n_lines"),
          col("mn").as("first_ship"))
    }),

    // J11/A2: grouped collect → deterministic sorted rendering
    // (reference: src/main.py:110,159 array_agg)
    "q09_grouped_collect" -> ((s, d) => {
      Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"))
    }),

    // A3/W1: argmin-per-group, THE reference pattern (src/main.py:242).
    // Explicit pre-projection: topOnePerGroup's aggregate path packs the
    // surviving row into a struct, which Catalyst cannot prune through —
    // selecting the needed columns FIRST keeps the scan at 3 columns
    // (optimization guide §2.3, "project before the exchange").
    "q10_argmin_group" -> ((s, d) => {
      Relational.topOnePerGroup(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
          col("o_orderdate").as("first_date"))
    }),

    // A4: relative-threshold ranking (reference: src/benchmark.py:128-133 —
    // keep candidates ≥ max/10, pick (earliest, then highest score))
    "q11_threshold_rank" -> ((s, d) => {
      Relational.relativeThresholdTopOne(
        Tables.orders(s, d) // pre-projected: same pruning note as q10
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        Seq(col("o_custkey")),
        col("o_totalprice"), 10.0,
        Seq(col("o_orderdate").asc_nulls_last, col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey").as("pick_orderkey"))
    }),

    // A5/S7: deterministic last-write-wins conflict resolution
    // (reference: src/main.py:295-325 upsert; SURVEY §7.4.1)
    "q12_lastwin_dedup" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // the returnflag tiebreak makes the projected output a total order.
      Relational.lastWriteWins(
        Tables.lineitem(s, d) // pre-projected: same pruning note as q10
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_linestatus")),
        Seq(col("l_orderkey")),
        Seq(col("l_linenumber").desc, col("l_returnflag").asc, col("l_linestatus").asc))
        .select(col("l_orderkey"), col("l_linenumber").as("last_line"),
          col("l_returnflag").as("last_flag"))
    }),

    // U1/U2: 4-branch UNION with set semantics (reference: sql/4:4-28)
    "q13_union_distinct" -> ((s, d) => {
      Relational.unionDistinct(Seq(
        Tables.customer(s, d).select(lower(col("c_name")).as("name")),
        Tables.supplier(s, d).select(lower(col("s_name")).as("name")),
        Tables.nation(s, d).select(lower(col("n_name")).as("name")),
        Tables.region(s, d).select(lower(col("r_name")).as("name"))))
    }),

    // A7: DISTINCT projection (reference: src/benchmark.py:71,98)
    "q14_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()),

    // O1/O2/O3: global composite sort + LIMIT with a total order
    // (reference: src/main.py:352; src/benchmark.py:132)
    "q15_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // A8: hierarchical subtotals — ROLLUP(flag, status) with grouping_id to
    // distinguish subtotal NULLs from data NULLs. On a cluster this is one
    // Expand + one hash aggregate (no per-level re-scan).
    "q34_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().as("gid"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // F10-F12: boolean flag derivation + conditional year penalty
    // (reference: src/main.py:51-56, 249-262)
    "q16_flags" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").as("is_urgent"),
        when(col("o_orderdate").isNull, lit(9999L))
          .otherwise(year(col("o_orderdate")).cast("long")
            + when(col("o_orderstatus") === "F", lit(0L)).otherwise(lit(1L)))
          .as("year_value"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | COUNT(*) AS n_rows, MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT o_orderkey AS okey, o_custkey AS ckey, o_orderstatus AS status, o_totalprice AS price
        |FROM orders
        |WHERE (o_orderpriority LIKE '1%' OR o_totalprice > 150000) AND o_orderdate IS NOT NULL""".stripMargin,
    "q03_join5" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |GROUP BY n_name""".stripMargin,
    "q04_left_nonequi" ->
      """SELECT o_orderkey, COUNT(l_partkey) AS n_first_lines, MAX(l_quantity) AS max_qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_linenumber <= 1
        |GROUP BY o_orderkey""".stripMargin,
    "q05_hierarchy_walk" ->
      """WITH attrs AS (
        |  SELECT n_nationkey AS k,
        |         CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE lower(n_name) END AS iso
        |  FROM nation),
        |edges AS (SELECT n_nationkey AS c, CAST(n_regionkey AS INTEGER) AS p FROM nation)
        |SELECT c_custkey, COALESCE(a0.iso, a1.iso, a2.iso, a3.iso, 'xx') AS country
        |FROM customer
        |LEFT JOIN attrs a0 ON a0.k = c_nationkey
        |LEFT JOIN edges e1 ON e1.c = c_nationkey
        |LEFT JOIN attrs a1 ON a1.k = e1.p
        |LEFT JOIN edges e2 ON e2.c = e1.p
        |LEFT JOIN attrs a2 ON a2.k = e2.p
        |LEFT JOIN edges e3 ON e3.c = e2.p
        |LEFT JOIN attrs a3 ON a3.k = e3.p""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q08_decorr_agg" ->
      """SELECT o_orderkey,
        | (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines,
        | (SELECT MIN(l_shipdate) FROM lineitem WHERE l_orderkey = o_orderkey) AS first_ship
        |FROM orders""".stripMargin,
    "q09_grouped_collect" ->
      """SELECT l_orderkey, string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q10_argmin_group" ->
      """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "q11_threshold_rank" ->
      """SELECT o_custkey, o_orderkey AS pick_orderkey
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate NULLS LAST, o_totalprice DESC, o_orderkey) AS rn
        |      FROM (SELECT *, max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx FROM orders) t0
        |      WHERE o_totalprice * 10 >= mx) t
        |WHERE rn = 1""".stripMargin,
    "q12_lastwin_dedup" ->
      """SELECT l_orderkey, l_linenumber AS last_line, l_returnflag AS last_flag
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_returnflag, l_linestatus) AS rn
        |      FROM lineitem) t
        |WHERE rn = 1""".stripMargin,
    "q13_union_distinct" ->
      """SELECT lower(c_name) AS name FROM customer
        |UNION SELECT lower(s_name) FROM supplier
        |UNION SELECT lower(n_name) FROM nation
        |UNION SELECT lower(r_name) FROM region""".stripMargin,
    "q14_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q15_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q34_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q16_flags" ->
      """SELECT o_orderkey,
        | o_orderpriority = '1-URGENT' AS is_urgent,
        | CASE WHEN o_orderdate IS NULL THEN 9999
        |      ELSE CAST(year(o_orderdate) AS BIGINT) + (CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
        | END AS year_value,
        | CASE WHEN o_totalprice > 200000 THEN 'high'
        |      WHEN o_totalprice > 100000 THEN 'mid'
        |      ELSE 'low' END AS price_band
        |FROM orders""".stripMargin)
}
