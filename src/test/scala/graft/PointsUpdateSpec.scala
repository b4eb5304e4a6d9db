package graft

import graft.api.PointsUpdate
import graft.operators.VectorStore

/** The points-UPDATE wire surface: parse round-trips, ordered
  * composition semantics, vector-column patching, and the loud-refusal
  * discipline on every malformed or destructive-without-predicate
  * request. The oracle row (`vs_points_update`) grades the default
  * operations list against DuckDB; these specs pin the semantics the
  * SQL cannot see (op order, has_vector transitions, refusal classes).
  */
class PointsUpdateSpec extends SparkSpecBase {

  private def upd(json: String) = VectorStore.pointsUpdate(spark, sf, json)

  test("parse: the operations list round-trips in order") {
    import PointsUpdate._
    val ops = PointsUpdate.fromJson(SparkEntry.defaultUpdateJson)
    assert(ops.length === 8)
    assert(ops.head.isInstanceOf[Upsert])
    val up = ops.head.asInstanceOf[Upsert]
    assert(up.points.map(_.id) === Seq(900001L, 3L))
    // replace semantics: id 3's payload omits lang → lang is None
    assert(up.points(1).lang.isEmpty && up.points(1).site === Some("wire"))
    assert(ops(1) === SetPayload(Map("lang" -> Right("fr")),
      ByFilter(graft.api.Filters.fromJson(
        """{"must": [{"key": "site", "match": {"value": "src3"}}]}""")),
      overwrite = false))
    assert(ops(2).asInstanceOf[SetPayload].overwrite)
    assert(ops(6) === DeleteVectors(Seq(9L, 10L)))
    assert(ops(7) === UpdateVectors(Seq((12L, Seq(1.0, 0.0)))))
    // a single bare operation object parses as a one-element batch
    assert(PointsUpdate.fromJson(
      """{"delete": {"points": [1, 2]}}""") ===
      Seq(Delete(ByIds(Seq(1L, 2L)))))
  }

  test("the default operations list composes in request order") {
    val out = upd(SparkEntry.defaultUpdateJson).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // upsert replaced id 3 entirely: new tenant, lang cleared by replace
    assert(byId(3L).getLong(1) === 99L && byId(3L).getString(2) === "wire")
    assert(byId(3L).isNullAt(3) && byId(3L).getLong(4) === 1000002L)
    assert(byId(900001L).getString(3) === "xx")
    // overwrite_payload cleared the unprovided clearable keys for 5, 6
    assert(byId(5L).getString(2) === "ow" && byId(5L).isNullAt(3))
    // delete_payload nulled lang only for 7, 8
    assert(byId(7L).isNullAt(3) && !byId(7L).isNullAt(2))
    // clear_payload nulled the whole clearable payload for 11
    assert(byId(11L).isNullAt(2) && byId(11L).isNullAt(3))
    // the filter delete removed tenant 4 — upserted id 3 (now tenant
    // 99) survives; no surviving row carries user_id 4
    assert(!out.exists(_.getLong(1) == 4L))
    assert(!byId.contains(4L) && !byId.contains(24L))
    // has_vector: delete_vectors turned 9/10 off; everything else on
    assert(!byId(9L).getBoolean(5) && !byId(10L).getBoolean(5))
    assert(byId(12L).getBoolean(5) && byId(900001L).getBoolean(5))
  }

  test("op order is the semantics: delete after upsert removes the fresh rows") {
    val out = upd(
      """{"operations": [
        | {"upsert": {"points": [{"id": 800001, "vector": [0.1],
        |   "payload": {"user_id": 77, "seq": 1, "site": "a", "lang": "b"}}]}},
        | {"delete": {"points": [800001]}}]}""".stripMargin).collect()
    assert(!out.exists(_.getLong(0) == 800001L))
    // and the reverse order keeps the row
    val out2 = upd(
      """{"operations": [
        | {"delete": {"points": [800001]}},
        | {"upsert": {"points": [{"id": 800001, "vector": [0.1],
        |   "payload": {"user_id": 77, "seq": 1, "site": "a", "lang": "b"}}]}}]}"""
        .stripMargin).collect()
    assert(out2.exists(_.getLong(0) == 800001L))
  }

  test("update_vectors restores has_vector after delete_vectors") {
    val out = upd(
      """{"operations": [
        | {"delete_vectors": {"points": [2, 12], "vector": ["vector"]}},
        | {"update_vectors": {"points": [{"id": 12, "vector": [0.5, 0.5]}]}}]}"""
        .stripMargin).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(!byId(2L).getBoolean(5) && byId(12L).getBoolean(5))
  }

  test("malformed and destructive requests refuse loudly") {
    // destructive match-all filter (the ADVICE r11 guard on the wire)
    val e1 = intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"delete": {"filter": {"must": []}}}"""))
    assert(e1.getMessage.contains("match-all"))
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"clear_payload": {"filter": {}}}"""))
    // unknown operation / payload key / non-clearable delete_payload key
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"truncate": {}}"""))
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"set_payload": {"payload": {"color": "red"}, "points": [1]}}"""))
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"delete_payload": {"keys": ["seq"], "points": [1]}}"""))
    // typed payload values: a textual seq refuses (zero-coercion guard)
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"set_payload": {"payload": {"seq": "abc"}, "points": [1]}}"""))
    // selector: exactly one of points / filter
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"delete": {"points": [1], "filter": {"must": [
        |  {"key": "lang", "match": {"value": "en"}}]}}}""".stripMargin))
    // upsert: vector and the typed identity columns are required;
    // duplicate ids in one batch refuse
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"upsert": {"points": [{"id": 1,
        |  "payload": {"user_id": 1, "seq": 1}}]}}""".stripMargin))
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"upsert": {"points": [{"id": 1, "vector": [0.1],
        |  "payload": {"site": "a"}}]}}""".stripMargin))
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"upsert": {"points": [
        |  {"id": 1, "vector": [0.1], "payload": {"user_id": 1, "seq": 1}},
        |  {"id": 1, "vector": [0.2], "payload": {"user_id": 1, "seq": 2}}]}}"""
        .stripMargin))
    // delete_vectors serves the stored column only
    intercept[IllegalArgumentException](PointsUpdate.fromJson(
      """{"delete_vectors": {"points": [1], "vector": ["title"]}}"""))
  }

  test("the update wire is reachable from SQL through graft_query") {
    val json = SparkEntry.defaultUpdateJson.replace("'", "''")
      .replace("\n", " ")
    val viaSql = spark.sql(
      s"SELECT * FROM graft_query('vs_points_update', '$sf', " +
        s"map('request', '$json'))")
    assert(viaSql.collect().toSeq.map(_.toSeq) ===
      upd(SparkEntry.defaultUpdateJson).collect().toSeq.map(_.toSeq))
  }
}
