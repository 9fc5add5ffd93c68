package graft

import graft.functions.Kernels
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for operators whose correctness is not obvious
  * from the oracle compare alone (SURVEY §5.3#2) — as-of ordering,
  * session gaps, top-k group bounds, similarity ordering.
  */
class OperatorSemanticsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("window_topk_per_group: at most 3 rows per customer, price descending") {
    val rows = SparkEntry.queries("window_topk_per_group")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (cust, rs) =>
      assert(rs.length <= 3, s"customer $cust has ${rs.length} rows")
      val byRn = rs.sortBy(_._2).map(_._3)
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b },
        s"customer $cust prices not descending: ${byRn.toSeq}")
    }
  }

  test("join_asof: matched click is the true most recent prior click") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    // NB: SimpleDateFormat cannot format microseconds — use java.time
    val dtf = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    def f(t: java.sql.Timestamp): String =
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(dtf)
    val got = SparkEntry.queries("join_asof")(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toMap
    ev.filter(_._3 == "error").foreach { case (eid, uid, _, ets) =>
      val expected = clicksByUser.getOrElse(uid, Array.empty)
        .map(_._4).filter(!_.after(ets)) match {
        case a if a.isEmpty => None
        case a => Some(f(a.max))
      }
      assert(got(eid) == expected, s"error $eid: got ${got(eid)}, expected $expected")
    }
  }

  test("stream_session_windows: session starts are >30min apart per user and counts add up") {
    val sessions = SparkEntry.queries("stream_session_windows")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val total = sessions.map(_._3).sum
    assert(total == Tables.events(spark, sf).count(), "session counts must cover every event")
    val dtf = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    sessions.groupBy(_._1).foreach { case (uid, ss) =>
      val starts = ss.map(s => java.time.LocalDateTime.parse(s._2, dtf)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).sorted
      starts.zip(starts.tail).foreach { case (a, b) =>
        assert(b - a > 30 * 60 * 1000L, s"user $uid: session starts closer than the gap: $a, $b")
      }
    }
  }

  test("dedup_near_jaccard: emitted pairs really have token-set jaccard >= 0.8") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = SparkEntry.queries("dedup_near_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    pairs.take(500).foreach { case (a, b, jac) =>
      val sa = texts(a).split(" ").distinct.sorted.toSeq
      val sb = texts(b).split(" ").distinct.sorted.toSeq
      val expected = Kernels.jaccardSets(sa, sb)
      assert(expected >= 0.8, s"pair ($a,$b) below threshold: $expected")
      assert(math.abs(jac - math.floor(expected * 10000 + 0.5) / 10000) < 1e-12)
    }
  }

  test("sim_knn_per_query: ranks 1..5 with non-increasing similarity") {
    val rows = SparkEntry.queries("sim_knn_per_query")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"query $qid ranks")
      val sims = rs.sortBy(_._3).map(_._2)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"query $qid order")
    }
  }

  test("set_intersect is contained in both inputs; set_except is disjoint from the right") {
    val inter = SparkEntry.queries("set_intersect")(spark, sf).collect().map(_.getInt(0)).toSet
    val exc = SparkEntry.queries("set_except")(spark, sf).collect().map(_.getInt(0)).toSet
    val custNations = Tables.customer(spark, sf).select("c_nationkey")
      .distinct().collect().map(_.getInt(0)).toSet
    val suppNations = Tables.supplier(spark, sf).select("s_nationkey")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(inter.subsetOf(custNations) && inter.subsetOf(suppNations))
    assert(exc.subsetOf(custNations) && exc.intersect(suppNations).isEmpty)
  }
}
