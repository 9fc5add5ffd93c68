package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.7 — set operations. UNION ALL is a zero-shuffle concat;
  * UNION/INTERSECT/EXCEPT hash-partition on the full row — at scale
  * prefer pre-aggregated inputs (as here: already-projected key sets).
  */
object SetOps {
  val queries: Map[String, Q] = Map(
    "set_union_all" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val hi = li.filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), lit("hi").as("tag"))
      val lo = li.filter(col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"), lit("lo").as("tag"))
      hi.unionAll(lo).orderBy("l_orderkey", "l_linenumber", "tag")
    }),
    "set_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .union(o.filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k")
    }),
    "set_intersect" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    }),
    "set_except" -> ((s, d) => {
      // May legitimately be empty — an empty frame is a valid hash-match.
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    })
  )

  val oracles: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT l_orderkey, l_linenumber, 'hi' AS tag FROM lineitem WHERE l_quantity > 45
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'lo' AS tag FROM lineitem WHERE l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber, tag""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
        |ORDER BY k""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin
  )
}
