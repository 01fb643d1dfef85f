package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.TpchGraph

/** S3/S4 "arbitrary query → engine" delegation, completed to the full
  * TPC-H shape catalog (Q1–Q22). The reference ships queries to Neo4j's
  * engine verbatim (`TransactionApiJob.java:56-85`); we ship the same text
  * to Catalyst, and the driver ships it to DuckDB — one dialect-neutral
  * string per query is both the Spark plan and the oracle, which is the
  * strongest possible cross-engine check of the delegation contract.
  *
  * Q1/Q4/Q5/Q6/Q7/Q10/Q12/Q14/Q17/Q19 live in [[SparkEntry]] (rounds 1–2);
  * this file adds the remaining twelve. The synthetic schema has no
  * PARTSUPP/comment columns and a 1995–2001 date range, so Q2/Q9/Q11/Q16/
  * Q20/Q21 are analogs: part-supplier pairs derive from lineitem (the same
  * derivation as the SUPPLIED_BY graph edges), "supplycost" is the observed
  * min unit price, and comment-LIKE filters become name-LIKE filters. Every
  * aggregate double is rounded (2–4 dp) and every ORDER BY carries a full
  * deterministic tie-break, so both engines agree bit-for-bit.
  *
  * Scale notes (100 TB): all joins are equi-joins on key columns — the
  * dimension sides (region/nation/supplier/part slices) broadcast under
  * AQE's threshold; the lineitem-derived `ps` CTE is one hash aggregate
  * reused by name; correlated EXISTS/IN subqueries rewrite to semi/anti
  * hash joins in Catalyst (verified via explain in the spec suite — no
  * nested-loop fallbacks, no cartesian products).
  */
object QueriesTpch {

  /** Min-cost-supplier-per-part, region-scoped (Q2 analog: supplycost =
    * observed min unit price from lineitem; EUROPE; STANDARD/size-15). */
  val SqlQ2: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         round(min(l_extendedprice / l_quantity), 2) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, supplier, ps, nation, region
      |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      |  AND p_size = 15 AND p_type = 'STANDARD'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost = (
      |    SELECT min(ps2.ps_supplycost)
      |    FROM ps ps2, supplier s2, nation n2, region r2
      |    WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Shipping-priority top-10 (Q3). */
  val SqlQ3: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** National market share within a region (Q8). */
  val SqlQ8: String =
    """SELECT o_year,
      |  round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
      |        / sum(volume), 4) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             l_extendedprice * (1 - l_discount) AS volume,
      |             n2.n_name AS nation
      |      FROM part, supplier, lineitem, orders, customer,
      |           nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n1.n_nationkey
      |        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |        AND s_nationkey = n2.n_nationkey
      |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |        AND p_type = 'ECONOMY') t
      |GROUP BY o_year""".stripMargin

  /** Product-type profit by nation and year (Q9 analog: cost = retailprice
    * percentage, name-LIKE product line). The per-row amount quantizes to
    * int64 cents before summing: profit sums mix signs, so cancellation
    * puts the float sum on .005 rounding boundaries where accumulation
    * order flips the last cent — the integer sum is order-free and exact.
    * The outer CAST to DOUBLE matters: Spark parses the `100.0` literal as
    * DECIMAL so the division yields DECIMAL, while DuckDB's division yields
    * DOUBLE — same values, different storage type, and the harness hash is
    * computed over typed values. */
  val SqlQ9: String =
    """SELECT nation, o_year,
      |  CAST(round(sum(amount_cents) / 100.0, 2) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |             CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             CAST(round((l_extendedprice * (1 - l_discount)
      |               - p_retailprice * l_quantity / 100) * 100) AS BIGINT)
      |               AS amount_cents
      |      FROM part, supplier, lineitem, orders, nation
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |        AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      |        AND p_name LIKE '%red%') t
      |GROUP BY nation, o_year""".stripMargin

  /** Important-stock identification (Q11 analog: ps_value = lineitem
    * revenue per part-supplier pair, one nation, 0.1% threshold). */
  val SqlQ11: String =
    """WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |                   sum(l_extendedprice) AS ps_value
      |            FROM lineitem GROUP BY 1, 2)
      |SELECT ps_partkey, round(sum(ps_value), 2) AS value
      |FROM ps, supplier, nation
      |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |GROUP BY ps_partkey
      |HAVING sum(ps_value) > (SELECT sum(ps_value) * 0.001
      |                        FROM ps, supplier, nation
      |                        WHERE ps_suppkey = s_suppkey
      |                          AND s_nationkey = n_nationkey
      |                          AND n_name = 'NATION_3')""".stripMargin

  /** Customer order-count distribution (Q13 analog: priority filter in the
    * outer-join condition instead of the comment LIKE). */
  val SqlQ13: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |           AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** Top supplier by quarterly revenue (Q15 — view + scalar max). */
  val SqlQ15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2)
      |           AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin

  /** Part-supplier relationship count by part attributes (Q16 analog:
    * pairs from lineitem, name-LIKE supplier exclusion). */
  val SqlQ16: String =
    """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
      |                            l_suppkey AS ps_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      |       count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM ps, part
      |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#22'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                         WHERE s_name LIKE '%33%')
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** Large-volume customers (Q18; quantities are integer-valued doubles,
    * so the HAVING threshold is exact in both engines). */
  val SqlQ18: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING sum(l_quantity) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey""".stripMargin

  /** Suppliers with excess shipped volume of a product line (Q20 analog:
    * availqty = shipped quantity per pair in the window year). */
  val SqlQ20: String =
    """SELECT s_suppkey, s_name
      |FROM supplier, nation
      |WHERE s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
      |  AND s_suppkey IN (
      |    SELECT ps_suppkey FROM
      |      (SELECT l_suppkey AS ps_suppkey, l_partkey AS ps_partkey,
      |              sum(l_quantity) AS ps_qty FROM lineitem
      |       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |       GROUP BY 1, 2) ps
      |    WHERE ps_partkey IN (SELECT p_partkey FROM part
      |                         WHERE p_name LIKE '%blue%')
      |      AND ps_qty > 50)""".stripMargin

  /** Suppliers who kept multi-supplier orders waiting (Q21 analog:
    * "late" = shipped >60 days after the order date; sole-late-supplier
    * via EXISTS + NOT EXISTS, the double-correlation shape). */
  val SqlQ21: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Dormant high-balance customers (Q22 analog: cntrycode = nationkey
    * digit, dormant = no orders since 1999 — every synthetic customer has
    * at least one lifetime order). */
  val SqlQ22: String =
    """SELECT cntrycode, count(*) AS numcust,
      |       round(sum(c_acctbal), 2) AS totacctbal
      |FROM (SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
      |             c_acctbal, c_custkey
      |      FROM customer
      |      WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
      |        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                         WHERE c_acctbal > 0.0
      |                           AND c_nationkey % 10 IN (1, 3, 5, 7, 9))
      |        AND NOT EXISTS (SELECT 1 FROM orders
      |                        WHERE o_custkey = c_custkey
      |                          AND o_orderdate >=
      |                              TIMESTAMP '1999-01-01 00:00:00')) t
      |GROUP BY cntrycode""".stripMargin

  private val all: Map[String, String] = Map(
    "sql_q2" -> SqlQ2, "sql_q3" -> SqlQ3, "sql_q8" -> SqlQ8,
    "sql_q9" -> SqlQ9, "sql_q11" -> SqlQ11, "sql_q13" -> SqlQ13,
    "sql_q15" -> SqlQ15, "sql_q16" -> SqlQ16, "sql_q18" -> SqlQ18,
    "sql_q20" -> SqlQ20, "sql_q21" -> SqlQ21, "sql_q22" -> SqlQ22)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => {
        TpchGraph.registerViews(s, dir)
        s.sql(sql)
      })
    }

  def oracles: Map[String, String] = all
}
