package graft.operators

import graft.{Canon, Q, Tables}
import graft.Canon.{sql => O}
import org.apache.spark.sql.functions._

/** §2.8 — scalar function surface: string / regex / date / math /
  * json / array functions and the explode (UDTF) shape. All built-ins,
  * all whole-stage-codegen'd; no UDFs in this file.
  */
object Scalars {
  val queries: Map[String, Q] = Map(
    "str_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 4).as("sub"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("tr"),
        length(col("p_name")).cast("long").as("len"),
        expr("replace(p_name, ' ', '_')").as("rep"),
        lpad(col("p_brand"), 10, "*").as("lp"))
        .orderBy("p_partkey")
    }),
    "str_regexp" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        col("c_name").like("%1%").cast("int").as("has1"))
        .orderBy("c_custkey")
    }),
    "date_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mo"))
        .agg(
          count(lit(1)).as("n"),
          Canon.tsStr(min(date_trunc("month", col("l_shipdate")))).as("mon_start"),
          Canon.tsStr(min(col("l_shipdate")) + expr("INTERVAL 30 DAYS")).as("min_plus30"),
          datediff(to_date(min(col("l_shipdate"))), lit("1995-01-01")).cast("long").as("days_since"))
        .orderBy("yr", "mo")
    }),
    "math_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        Canon.r4(sqrt(col("p_retailprice"))).as("sq"),
        floor(col("p_retailprice")).cast("long").as("fl"),
        ceil(col("p_retailprice")).cast("long").as("ce"),
        abs(col("p_size") - 20).cast("long").as("ab"),
        Canon.r4(exp(col("p_size") / lit(10.0))).as("ex"),
        Canon.r4(log(col("p_retailprice"))).as("lnv"),
        Canon.r4(log10(col("p_retailprice"))).as("lg"),
        Canon.r4(pow(col("p_size"), 2)).as("pw"),
        (col("p_partkey") % 7).as("md"))
        .orderBy("p_partkey")
    }),
    "json_extract_props" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("user_id"), col("value"))
        .select(expr("k div 10").as("bucket"), col("user_id"), col("value"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          Canon.sumDec(col("value"), 2).as("sum_val"))
        .orderBy("bucket")
    }),
    "array_funcs" -> ((s, d) => {
      val vocab = array(lit("scan"), lit("column"), lit("window"))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          array_distinct(col("toks")).as("t"))
        .select(col("doc_id"), col("n_tok"),
          size(col("t")).cast("long").as("n_distinct"),
          array_join(slice(sort_array(col("t")), 1, 3), ",").as("first3"),
          element_at(sort_array(col("t")), 2).as("second_tok"),
          size(array_intersect(col("t"), vocab)).cast("long").as("n_inter"),
          size(array_union(col("t"), vocab)).cast("long").as("n_union"))
        .orderBy("doc_id")
    }),
    "split_explode_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .orderBy("doc_id", "token")
    })
  )

  val oracles: Map[String, String] = Map(
    "str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substr(p_name, 1, 4) AS sub,
        |  trim(concat('  ', p_name, '  ')) AS tr,
        |  length(p_name) AS len,
        |  replace(p_name, ' ', '_') AS rep,
        |  lpad(p_brand, 10, '*') AS lp
        |FROM part ORDER BY p_partkey""".stripMargin,
    "str_regexp" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(c_name LIKE '%1%' AS INT) AS has1
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "date_funcs" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
        |       CAST(month(l_shipdate) AS BIGINT) AS mo,
        |  count(*) AS n,
        |  strftime(min(date_trunc('month', l_shipdate)), '%Y-%m-%d %H:%M:%S') AS mon_start,
        |  strftime(min(l_shipdate) + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS min_plus30,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(min(l_shipdate) AS DATE)) AS BIGINT) AS days_since
        |FROM lineitem GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "math_funcs" ->
      s"""SELECT p_partkey,
        |  ${O.r4("sqrt(p_retailprice)")} AS sq,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(abs(p_size - 20) AS BIGINT) AS ab,
        |  ${O.r4("exp(p_size / 10.0)")} AS ex,
        |  ${O.r4("ln(p_retailprice)")} AS lnv,
        |  ${O.r4("log10(p_retailprice)")} AS lg,
        |  ${O.r4("pow(p_size, 2)")} AS pw,
        |  p_partkey % 7 AS md
        |FROM part ORDER BY p_partkey""".stripMargin,
    "json_extract_props" ->
      s"""WITH e AS (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
        |                  user_id, value FROM events)
        |SELECT k // 10 AS bucket, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  ${O.sumDec("value", 2)} AS sum_val
        |FROM e GROUP BY 1 ORDER BY bucket""".stripMargin,
    "array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  list_distinct(string_split(text, ' ')) AS t
        |           FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tok,
        |  len(t) AS n_distinct,
        |  array_to_string(list_sort(t)[1:3], ',') AS first3,
        |  list_sort(t)[2] AS second_tok,
        |  len(list_intersect(t, ['scan','column','window'])) AS n_inter,
        |  len(list_distinct(list_concat(t, ['scan','column','window']))) AS n_union
        |FROM t ORDER BY doc_id""".stripMargin,
    "split_explode_tokens" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, token""".stripMargin
  )
}
