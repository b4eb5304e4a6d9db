package graft.api

/** The Qdrant points-UPDATE wire surface as DATA — the mutation twin
  * of [[QueryRequest]] (VERDICT r12 #1 closed the query side; a
  * wire-porting client mutates through the same HTTP+JSON model:
  * `/points` upsert, `/points/delete`, `/points/payload` set /
  * overwrite / delete / clear, `/points/vectors` update / delete, and
  * the ORDERED `/points/batch` operations list that carries any mix of
  * them in one request — the reference's own insert flow is dict
  * payloads over HTTP, /root/reference/insert.py:60-100).
  *
  * This object is the PARSER only; the dispatch to snapshot
  * transforms lives in [[graft.operators.VectorStore.pointsUpdate]]
  * (each operation is the proven typed shape: upsert = last-write
  * replace, set_payload = broadcast patch + coalesce, delete = filter,
  * vector ops = the [[VectorIndex!.setVectors]] column patch).
  * [[Filters.fromJson]]'s loud-refusal discipline applies throughout:
  * unknown operations, unknown payload keys, untyped values, and the
  * structurally-destructive match-all delete all refuse with a named
  * reason.
  *
  * The collection's payload model (the `points` relation): `site` /
  * `lang` / `text` are the CLEARABLE payload keys (nullable);
  * `user_id` / `seq` are typed identity/version columns — settable,
  * never cleared. Upsert REPLACES a point: the given payload is the
  * whole payload (absent clearable keys come out null), `user_id` and
  * `seq` are required, and the vector is required (Qdrant's upsert
  * contract).
  */
object PointsUpdate {

  /** One fully-specified upsert point (replace semantics). */
  final case class UpsertPoint(id: Long, vector: Seq[Double],
                               userId: Long, seq: Long,
                               site: Option[String], lang: Option[String],
                               text: Option[String])

  /** A points selector: explicit id list or a filter tree. */
  sealed trait Selector extends Serializable
  final case class ByIds(ids: Seq[Long]) extends Selector
  final case class ByFilter(f: Filters.PFilter) extends Selector

  /** One update operation, in request order. */
  sealed trait Op extends Serializable
  final case class Upsert(points: Seq[UpsertPoint]) extends Op
  final case class Delete(sel: Selector) extends Op
  /** `set_payload` (merge, `overwrite = false`) or `overwrite_payload`
    * (the clearable keys not in the patch come out null). Values are
    * typed: `user_id`/`seq` integral, `site`/`lang`/`text` textual.
    */
  final case class SetPayload(fields: Map[String, Either[Long, String]],
                              sel: Selector, overwrite: Boolean) extends Op
  final case class DeletePayload(keys: Seq[String], sel: Selector) extends Op
  final case class ClearPayload(sel: Selector) extends Op
  final case class UpdateVectors(points: Seq[(Long, Seq[Double])]) extends Op
  final case class DeleteVectors(ids: Seq[Long]) extends Op

  import com.fasterxml.jackson.databind.JsonNode
  import scala.jdk.CollectionConverters._

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def fieldNames(n: JsonNode): Seq[String] =
    n.fieldNames().asScala.toSeq

  private def known(n: JsonNode, what: String, keys: Set[String]): Unit = {
    val unknown = fieldNames(n).filterNot(keys)
    require(unknown.isEmpty,
      s"unknown $what keys $unknown — served: ${keys.toSeq.sorted.mkString("/")}")
  }

  private def longOf(n: JsonNode, what: String): Long = {
    require(n != null && n.isIntegralNumber,
      s"$what must be an integer (got $n)")
    n.asLong()
  }

  private def idsOf(n: JsonNode, what: String): Seq[Long] = {
    require(n != null && n.isArray && n.size() > 0,
      s"$what must be a non-empty array of point ids: $n")
    n.elements().asScala.map(longOf(_, s"$what entry")).toSeq
  }

  private def vecOf(n: JsonNode, what: String): Seq[Double] = {
    require(n != null && n.isArray && n.size() > 0,
      s"$what must be a non-empty number array: $n")
    n.elements().asScala.map { e =>
      require(e.isNumber, s"$what element must be a number (got $e)")
      e.asDouble()
    }.toSeq
  }

  /** `points: [ids]` XOR `filter: {…}` — Qdrant's two selector forms.
    * A filter selector in a DESTRUCTIVE position (`delete`,
    * `clear_payload`) refuses the match-all tree
    * ([[Filters.matchesAll]] — the ADVICE r11 guard applies to the
    * wire the same as to the typed calls).
    */
  private def selectorOf(n: JsonNode, what: String,
                         destructive: Boolean): Selector = {
    val hasPts = n.has("points"); val hasF = n.has("filter")
    require(hasPts ^ hasF,
      s"$what takes exactly one of points: [ids] / filter: {…}")
    if (hasPts) {
      val ids = idsOf(n.get("points"), s"$what points")
      ByIds(ids)
    } else {
      val f = Filters.fromJson(n.get("filter").toString)
      if (destructive) require(!Filters.matchesAll(f),
        s"$what with a match-all filter would affect the whole " +
          "collection — name the predicate explicitly")
      ByFilter(f)
    }
  }

  private[graft] val clearableKeys = Set("site", "lang", "text")
  private val payloadKeys = clearableKeys ++ Set("user_id", "seq")

  private def payloadFields(p: JsonNode,
                            what: String): Map[String, Either[Long, String]] = {
    require(p != null && p.isObject && p.size() > 0,
      s"$what payload must be a non-empty object: $p")
    fieldNames(p).map { k =>
      require(payloadKeys(k),
        s"unknown payload key '$k' in $what — this collection's payload " +
          s"model: ${payloadKeys.toSeq.sorted.mkString("/")}")
      val v = p.get(k)
      k -> (k match {
        case "user_id" | "seq" => Left(longOf(v, s"$what payload $k"))
        case _ =>
          require(v.isTextual, s"$what payload $k must be a string (got $v)")
          Right(v.asText())
      })
    }.toMap
  }

  private def upsertPointOf(n: JsonNode): UpsertPoint = {
    require(n.isObject, s"an upsert point must be an object: $n")
    known(n, "upsert point", Set("id", "vector", "payload"))
    val id = longOf(n.get("id"), "upsert point id")
    val vec = vecOf(n.get("vector"),
      s"upsert point $id vector (Qdrant's upsert contract — a point " +
        "carries its vector; vector-less patches go through set_payload)")
    val p = n.get("payload")
    require(p != null && p.isObject,
      s"upsert point $id needs a payload object (upsert REPLACES the " +
        "point — the given payload is the whole payload)")
    val fields = payloadFields(p, s"upsert point $id")
    def str(k: String): Option[String] = fields.get(k).map(_.toOption.get)
    (fields.get("user_id"), fields.get("seq")) match {
      case (Some(Left(u)), Some(Left(q))) =>
        UpsertPoint(id, vec, u, q, str("site"), str("lang"), str("text"))
      case _ => fail(s"upsert point $id payload must carry the typed " +
        "identity/version columns user_id and seq")
    }
  }

  private def parseOp(n: JsonNode): Op = {
    require(n.isObject, s"an update operation must be an object: $n")
    val keys = fieldNames(n)
    require(keys.size == 1,
      s"an update operation carries exactly one operation key, got $keys")
    val body = n.get(keys.head)
    require(body != null && body.isObject,
      s"${keys.head} must carry an object body: $n")
    keys.head match {
      case "upsert" =>
        known(body, "upsert", Set("points"))
        val pts = body.get("points")
        require(pts != null && pts.isArray && pts.size() > 0,
          s"upsert needs a non-empty points array: $body")
        val parsed = pts.elements().asScala.map(upsertPointOf).toSeq
        val dup = parsed.groupBy(_.id).filter(_._2.size > 1).keys
        require(dup.isEmpty,
          s"upsert batch names ids ${dup.toSeq.sorted} more than once — " +
            "last-write order inside one batch is unspecified on the wire")
        Upsert(parsed)
      case "delete" =>
        known(body, "delete", Set("points", "filter"))
        Delete(selectorOf(body, "delete", destructive = true))
      case op @ ("set_payload" | "overwrite_payload") =>
        known(body, op, Set("payload", "points", "filter"))
        SetPayload(payloadFields(body.get("payload"), op),
          selectorOf(body, op, destructive = false),
          overwrite = op == "overwrite_payload")
      case "delete_payload" =>
        known(body, "delete_payload", Set("keys", "points", "filter"))
        val ks = body.get("keys")
        require(ks != null && ks.isArray && ks.size() > 0,
          s"delete_payload needs a non-empty keys array: $body")
        val parsed = ks.elements().asScala.map { k =>
          require(k.isTextual, s"delete_payload key must be a string: $k")
          val key = k.asText()
          require(clearableKeys(key),
            s"payload key '$key' is not clearable — clearable: " +
              s"${clearableKeys.toSeq.sorted.mkString("/")} (user_id/seq " +
              "are typed identity/version columns)")
          key
        }.toSeq.distinct
        DeletePayload(parsed, selectorOf(body, "delete_payload",
          destructive = false))
      case "clear_payload" =>
        known(body, "clear_payload", Set("points", "filter"))
        ClearPayload(selectorOf(body, "clear_payload", destructive = true))
      case "update_vectors" =>
        known(body, "update_vectors", Set("points"))
        val pts = body.get("points")
        require(pts != null && pts.isArray && pts.size() > 0,
          s"update_vectors needs a non-empty points array: $body")
        UpdateVectors(pts.elements().asScala.map { p =>
          require(p.isObject, s"an update_vectors point must be an object: $p")
          known(p, "update_vectors point", Set("id", "vector"))
          (longOf(p.get("id"), "update_vectors id"),
            vecOf(p.get("vector"), "update_vectors vector"))
        }.toSeq)
      case "delete_vectors" =>
        known(body, "delete_vectors", Set("points", "vector"))
        val names = body.get("vector")
        require(names != null && names.isArray &&
          names.elements().asScala.toSeq.map(_.asText()) == Seq("vector"),
          "delete_vectors serves the collection's stored 'vector' — " +
            "pass vector: [\"vector\"] (the 'title' head is a derived " +
            "view, not stored state)")
        DeleteVectors(idsOf(body.get("points"), "delete_vectors points"))
      case other => fail(
        s"unknown update operation '$other' — served: upsert/delete/" +
          "set_payload/overwrite_payload/delete_payload/clear_payload/" +
          "update_vectors/delete_vectors")
    }
  }

  /** Parse a `/points/batch` operations request: `{operations: [{op:
    * {…}}, …]}`, applied in order. A single bare operation object
    * (`{"upsert": {…}}` — the individual endpoints' bodies) parses as
    * a one-element batch, so every update endpoint shares this entry.
    */
  def fromJson(json: String): Seq[Op] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(root != null && root.isObject,
      s"points update JSON must be an object: $json")
    if (root.has("operations")) {
      known(root, "points update", Set("operations"))
      val ops = root.get("operations")
      require(ops != null && ops.isArray && ops.size() > 0,
        "operations must be a non-empty array")
      ops.elements().asScala.map(parseOp).toSeq
    } else Seq(parseOp(root))
  }
}
