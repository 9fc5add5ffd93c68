package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.functions._

/** §2.2 — projection / filter / scalar expressions. Pure narrow
  * transforms: no shuffle, fully whole-stage-codegen'd, scale linearly.
  */
object Projections {
  val queries: Map[String, Q] = Map(
    "project_arith" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          Canon.r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          Canon.r4(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")
    }),
    "filter_predicates" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the fixture — order
      // by the full projection so tied rows are byte-identical.
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R")
          && (col("l_quantity").between(10, 20) || !col("l_linestatus").like("O%"))
          && col("l_shipdate") >= "1997-01-01")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
    }),
    "filter_null_semantics" -> ((s, d) => {
      // No NULLs at rest — manufacture them with nullif and exercise
      // 3-valued logic: count() skips nulls, coalesce fills them.
      Tables.lineitem(s, d)
        .select(expr("nullif(l_returnflag, 'A')").as("rf"))
        .agg(
          count(lit(1)).as("n_total"),
          count(col("rf")).as("n_notnull"),
          sum(when(col("rf").isNull, 1).otherwise(0)).cast("long").as("n_null"),
          countDistinct(coalesce(col("rf"), lit("X"))).as("n_vals"))
    }),
    "case_when_cast" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high").as("band"),
          col("o_totalprice"), col("o_orderkey"))
        .groupBy("band")
        .agg(
          count(lit(1)).as("n"),
          Canon.sumDec(col("o_totalprice"), 2).as("total"),
          max(col("o_orderkey").cast("string")).as("max_key_str"),
          floor(max(col("o_totalprice"))).cast("long").as("max_price_int"))
        .orderBy("band")
    })
  )

  val oracles: Map[String, String] = Map(
    "project_arith" ->
      s"""SELECT l_orderkey, l_linenumber,
        |  ${O.r4("l_extendedprice * (1 - l_discount)")} AS revenue,
        |  ${O.r4("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge""".stripMargin,
    "filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |  AND (l_quantity BETWEEN 10 AND 20 OR NOT (l_linestatus LIKE 'O%'))
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity""".stripMargin,
    "filter_null_semantics" ->
      """SELECT count(*) AS n_total,
        |  count(nullif(l_returnflag, 'A')) AS n_notnull,
        |  CAST(sum(CASE WHEN nullif(l_returnflag, 'A') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT coalesce(nullif(l_returnflag, 'A'), 'X')) AS n_vals
        |FROM lineitem""".stripMargin,
    "case_when_cast" ->
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  count(*) AS n,
        |  ${O.sumDec("o_totalprice", 2)} AS total,
        |  max(CAST(o_orderkey AS VARCHAR)) AS max_key_str,
        |  CAST(floor(max(o_totalprice)) AS BIGINT) AS max_price_int
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin
  )
}
