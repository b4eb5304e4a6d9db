package graft.api

/** The Qdrant `/points/query` REQUEST object as DATA (VERDICT r12 #1 —
  * the last wire seam: every query MODE existed as a typed Scala call,
  * but the reference is a pure HTTP+JSON client
  * (/root/reference/app.py:36-75 builds dict payloads), so a wire-
  * porting user needs the whole QueryRequest expressible as JSON, not
  * just its `filter:` member).
  *
  * This object is the PARSER only — JSON text to a typed request tree,
  * under [[Filters.fromJson]]'s discipline: unknown keys, malformed
  * values, and request shapes the engine does not serve all refuse
  * LOUDLY (a silently-dropped query member is a wrong answer). The
  * DISPATCH to the proven typed calls lives in
  * [[graft.operators.VectorStore.pointsQuery]] — parser and executor
  * separate, so the request tree is reusable by any collection surface.
  *
  * Parsed members (the public Qdrant QueryRequest):
  *
  *  - `query`: a bare vector / point id, or one of
  *    `{nearest: <vec|id>}`, `{recommend: {positive, negative,
  *    strategy}}`, `{discover: {target, context}}`, `{context:
  *    [{positive, negative}…]}`, `{fusion: "rrf"|"dbsf"}`,
  *    `{formula: <expr>}`, `{sample: "random"}`;
  *  - `prefetch`: nested sub-requests (object or array), recursive;
  *  - `using`: named-vector selector;
  *  - `filter`: the full boolean algebra via [[Filters.fromJson]];
  *  - `limit` / `offset` / `score_threshold`;
  *  - `lookup_from`: recommend-example resolution in another
  *    collection;
  *  - `params: {quantization: {ignore, rescore, oversampling}}`.
  *
  * Formula expressions parse the documented Qdrant forms: number
  * constants, `"$score"` (the prefetch stage's similarity), bare
  * payload-key strings / `{key:}` references, `sum` / `mult` / `div` /
  * `abs` / `neg` / `sqrt` / `exp` / `ln` / `log10` / `pow`, the three
  * decay kernels (`lin_decay` / `exp_decay` / `gauss_decay`, each
  * `{x, target, scale}`), and `geo_distance` (`{origin: {lat, lon},
  * to: "latCol:lonCol"}` — the [[Filters]] geo column-pair key
  * convention). Condition-expressions and `defaults:` are refused with
  * a pointer (not served — refusal beats a silently different score).
  */
object QueryRequest {

  /** One query mode. */
  sealed trait Query extends Serializable

  /** Nearest-neighbor by explicit query vector. */
  final case class NearestVector(vec: Seq[Double]) extends Query

  /** Nearest-neighbor by stored point id (Qdrant resolves the id's
    * vector; the anchor point itself is excluded from results).
    */
  final case class NearestId(id: Long) extends Query

  /** Qdrant MMR diversification of a nearest query (`query: {nearest,
    * mmr: {diversity, candidates_limit}}`): the candidate pool is the
    * plain top-`candidatesLimit` relevance cut, then the page is the
    * greedy maximal-marginal-relevance selection. `diversity` ∈ [0, 1]
    * is Qdrant's knob (0 = pure relevance); classic MMR's λ weights
    * RELEVANCE, so λ = 1 − diversity at dispatch.
    */
  final case class MmrNearest(anchor: Long, diversity: Double,
                              candidatesLimit: Int) extends Query

  /** Qdrant recommend: positive/negative examples — stored POINT IDS
    * and/or RAW VECTORS (both wire forms), plus the published strategy
    * (`average_vector` | `best_score`; raw examples serve
    * average_vector — best_score scores per stored example).
    */
  final case class Recommend(positive: Seq[Long], negative: Seq[Long],
                             strategy: String,
                             positiveVecs: Seq[Seq[Double]] = Nil,
                             negativeVecs: Seq[Seq[Double]] = Nil)
      extends Query

  /** Qdrant discover: target id + (positive, negative) id pairs. */
  final case class Discover(target: Long, pairs: Seq[(Long, Long)])
      extends Query

  /** Qdrant context-only browse: pairs, no target. */
  final case class ContextOnly(pairs: Seq[(Long, Long)]) extends Query

  /** Fusion over the prefetch stages: `rrf` | `dbsf`. */
  final case class Fusion(method: String) extends Query

  /** Formula rescoring of the prefetch stage. */
  final case class FormulaQuery(expr: FormulaExpr) extends Query

  /** `{sample: "random"}`. */
  case object SampleRandom extends Query

  /** A formula expression node. */
  sealed trait FormulaExpr extends Serializable
  final case class Const(v: Double) extends FormulaExpr
  case object ScoreVar extends FormulaExpr
  final case class FieldVar(field: String) extends FormulaExpr
  final case class Sum(terms: Seq[FormulaExpr]) extends FormulaExpr
  final case class Mult(terms: Seq[FormulaExpr]) extends FormulaExpr
  final case class Div(left: FormulaExpr, right: FormulaExpr,
                       byZeroDefault: Option[Double]) extends FormulaExpr
  final case class Unary(op: String, e: FormulaExpr) extends FormulaExpr
  final case class Pow(base: FormulaExpr, exp: FormulaExpr) extends FormulaExpr
  final case class Decay(kind: String, x: FormulaExpr,
                         target: Double, scale: Double) extends FormulaExpr
  final case class GeoDist(lat: Double, lon: Double,
                           latField: String, lonField: String)
      extends FormulaExpr

  /** `params.quantization` — Qdrant's search-time quantization knobs. */
  final case class Quantization(ignore: Boolean, rescore: Boolean,
                                oversampling: Double)

  /** The parsed request. `limit` is None when the stage declares no cut
    * (a formula prefetch reranking the whole filtered slice); top-level
    * requests default to Qdrant's limit = 10 at dispatch.
    */
  final case class Request(query: Query,
                           prefetch: Seq[Request] = Nil,
                           using: Option[String] = None,
                           filter: Option[Filters.PFilter] = None,
                           limit: Option[Int] = None,
                           offset: Int = 0,
                           scoreThreshold: Option[Double] = None,
                           lookupFrom: Option[String] = None,
                           quantization: Option[Quantization] = None)

  import com.fasterxml.jackson.databind.JsonNode

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def num(n: JsonNode, what: String): Double = {
    require(n != null && n.isNumber, s"$what must be a JSON number (got $n)")
    n.asDouble()
  }

  private def id(n: JsonNode, what: String): Long = {
    require(n != null && n.isIntegralNumber,
      s"$what must be an integer point id (got $n) — raw-vector examples " +
        "are not served here; reference the stored point's id")
    n.asLong()
  }

  private def vecOf(n: JsonNode, what: String): Seq[Double] = {
    import scala.jdk.CollectionConverters._
    require(n.isArray && n.size() > 0, s"$what must be a non-empty array: $n")
    n.elements().asScala.map(num(_, s"$what element")).toSeq
  }

  private def pairsOf(n: JsonNode, ctx: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val items = if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    require(items.nonEmpty, s"$ctx needs at least one (positive, negative) pair")
    items.map { p =>
      require(p.isObject && p.has("positive") && p.has("negative"),
        s"$ctx pair needs {positive, negative}: $p")
      val extra = fieldNames(p).filterNot(Set("positive", "negative"))
      require(extra.isEmpty, s"unknown $ctx pair keys $extra")
      (id(p.get("positive"), s"$ctx positive"),
        id(p.get("negative"), s"$ctx negative"))
    }
  }

  private def fieldNames(n: JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    n.fieldNames().asScala.toSeq
  }

  private def idList(n: JsonNode, what: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    require(n != null && n.isArray, s"$what must be an array of point ids: $n")
    n.elements().asScala.map(id(_, s"$what entry")).toSeq
  }

  /** A recommend example list: stored point ids and/or raw vectors
    * (both Qdrant wire forms), partitioned by kind.
    */
  private def exampleList(n: JsonNode,
                          what: String): (Seq[Long], Seq[Seq[Double]]) = {
    import scala.jdk.CollectionConverters._
    require(n != null && n.isArray,
      s"$what must be an array of point ids or vectors: $n")
    val ids = Seq.newBuilder[Long]
    val vecs = Seq.newBuilder[Seq[Double]]
    n.elements().asScala.foreach {
      case e if e.isIntegralNumber => ids += e.asLong()
      case e if e.isArray => vecs += vecOf(e, s"$what vector example")
      case other => fail(
        s"$what entry must be a stored point id or a raw vector: $other")
    }
    (ids.result(), vecs.result())
  }

  private[api] def parseFormula(n: JsonNode): FormulaExpr = {
    if (n.isNumber) Const(n.asDouble())
    else if (n.isTextual) {
      val s = n.asText()
      if (s == "$score") ScoreVar
      else if (s.startsWith("$")) fail(
        s"unknown formula variable '$s' — only $$score is served")
      else FieldVar(s)
    } else if (n.isObject) {
      val keys = fieldNames(n)
      require(keys.size == 1,
        s"a formula expression object carries exactly one operator, got $keys")
      keys.head match {
        case "key" => FieldVar(n.get("key") match {
          case t if t.isTextual => t.asText()
          case other => fail(s"formula key must be a string: $other")
        })
        case "sum" => Sum(vecNodes(n.get("sum"), "sum").map(parseFormula))
        case "mult" => Mult(vecNodes(n.get("mult"), "mult").map(parseFormula))
        case "div" =>
          val d = n.get("div")
          require(d.isObject && d.has("left") && d.has("right"),
            s"div needs {left, right[, by_zero_default]}: $d")
          val extra = fieldNames(d)
            .filterNot(Set("left", "right", "by_zero_default"))
          require(extra.isEmpty, s"unknown div keys $extra")
          Div(parseFormula(d.get("left")), parseFormula(d.get("right")),
            Option(d.get("by_zero_default")).map(num(_, "by_zero_default")))
        case op @ ("abs" | "neg" | "sqrt" | "exp" | "ln" | "log10") =>
          Unary(op, parseFormula(n.get(op)))
        case "pow" =>
          val p = n.get("pow")
          require(p.isObject && p.has("base") && p.has("exponent"),
            s"pow needs {base, exponent}: $p")
          Pow(parseFormula(p.get("base")), parseFormula(p.get("exponent")))
        case kind @ ("lin_decay" | "exp_decay" | "gauss_decay") =>
          val d = n.get(kind)
          require(d.isObject && d.has("x"), s"$kind needs {x, target, scale}: $d")
          val extra = fieldNames(d).filterNot(Set("x", "target", "scale"))
          require(extra.isEmpty,
            s"unknown $kind keys $extra (midpoint is fixed at the " +
              "published 0.5 kernel shape)")
          Decay(kind, parseFormula(d.get("x")),
            Option(d.get("target")).map(num(_, s"$kind target")).getOrElse(0.0),
            Option(d.get("scale")).map(num(_, s"$kind scale")).getOrElse(1.0))
        case "geo_distance" =>
          val g = n.get("geo_distance")
          require(g.isObject && g.has("origin") && g.has("to"),
            s"geo_distance needs {origin: {lat, lon}, to: 'latCol:lonCol'}: $g")
          val o = g.get("origin")
          require(o != null && o.isObject && o.has("lat") && o.has("lon"),
            s"geo_distance origin needs {lat, lon}: $o")
          val to = g.get("to")
          require(to.isTextual, s"geo_distance 'to' must name the column pair: $to")
          to.asText().split(":", 2) match {
            case Array(la, lo) if lo.nonEmpty =>
              GeoDist(num(o.get("lat"), "origin lat"),
                num(o.get("lon"), "origin lon"), la, lo)
            case _ => fail(
              s"geo_distance 'to' must be 'latCol:lonCol' (got '${to.asText()}')")
          }
        case other => fail(
          s"unknown formula operator '$other' — served: key/sum/mult/div/abs/" +
            "neg/sqrt/exp/ln/log10/pow/lin_decay/exp_decay/gauss_decay/" +
            "geo_distance (condition-expressions and defaults: are not served)")
      }
    } else fail(s"formula expression must be a number, string, or object: $n")
  }

  private def vecNodes(n: JsonNode, what: String): Seq[JsonNode] = {
    import scala.jdk.CollectionConverters._
    require(n != null && n.isArray && n.size() > 0,
      s"$what must be a non-empty array: $n")
    n.elements().asScala.toSeq
  }

  private def parseQuery(n: JsonNode): Query = {
    if (n.isArray) NearestVector(vecOf(n, "query vector"))
    else if (n.isIntegralNumber) NearestId(n.asLong())
    else if (n.isObject) {
      val keys = fieldNames(n)
      if (n.has("nearest")) {
        val extra = keys.filterNot(Set("nearest", "mmr"))
        require(extra.isEmpty, s"unknown query keys $extra beside nearest")
        val base = n.get("nearest") match {
          case v if v.isArray => NearestVector(vecOf(v, "nearest vector"))
          case v if v.isIntegralNumber => NearestId(v.asLong())
          case other => fail(s"nearest takes a vector or a point id: $other")
        }
        Option(n.get("mmr")).map { m =>
          require(m.isObject, s"mmr must be an object: $m")
          val mExtra = fieldNames(m)
            .filterNot(Set("diversity", "candidates_limit"))
          require(mExtra.isEmpty, s"unknown mmr keys $mExtra — served: " +
            "diversity/candidates_limit")
          val div = Option(m.get("diversity")).map(num(_, "mmr diversity"))
            .getOrElse(0.5)
          require(div >= 0.0 && div <= 1.0,
            s"mmr diversity must be in [0, 1] (got $div)")
          val cand = Option(m.get("candidates_limit")).map { c =>
            require(c.isIntegralNumber && c.asLong() >= 1,
              s"mmr candidates_limit must be a positive integer: $c")
            c.asInt()
          }.getOrElse(100)
          base match {
            case NearestId(a) => MmrNearest(a, div, cand)
            case _ => fail("mmr diversification is served by stored " +
              "query id (the candidate pool anchors on the corpus)")
          }
        }.getOrElse(base)
      } else if (n.has("recommend")) {
        require(keys == Seq("recommend"), s"unknown query keys $keys")
        val r = n.get("recommend")
        require(r.isObject, s"recommend must be an object: $r")
        val extra = fieldNames(r)
          .filterNot(Set("positive", "negative", "strategy"))
        require(extra.isEmpty, s"unknown recommend keys $extra")
        val strategy = Option(r.get("strategy")).map { s =>
          require(s.isTextual, s"recommend strategy must be a string: $s")
          s.asText()
        }.getOrElse("average_vector")
        require(Set("average_vector", "best_score")(strategy),
          s"unknown recommend strategy '$strategy' — " +
            "average_vector | best_score")
        val (pos, posVecs) = Option(r.get("positive"))
          .map(exampleList(_, "recommend positive")).getOrElse((Nil, Nil))
        val (neg, negVecs) = Option(r.get("negative"))
          .map(exampleList(_, "recommend negative")).getOrElse((Nil, Nil))
        require(pos.nonEmpty || posVecs.nonEmpty,
          "recommend needs at least one positive example")
        Recommend(pos, neg, strategy, posVecs, negVecs)
      } else if (n.has("discover")) {
        require(keys == Seq("discover"), s"unknown query keys $keys")
        val d = n.get("discover")
        require(d.isObject && d.has("target") && d.has("context"),
          s"discover needs {target, context}: $d")
        val extra = fieldNames(d).filterNot(Set("target", "context"))
        require(extra.isEmpty, s"unknown discover keys $extra")
        Discover(id(d.get("target"), "discover target"),
          pairsOf(d.get("context"), "discover context"))
      } else if (n.has("context")) {
        require(keys == Seq("context"), s"unknown query keys $keys")
        ContextOnly(pairsOf(n.get("context"), "context"))
      } else if (n.has("fusion")) {
        require(keys == Seq("fusion"), s"unknown query keys $keys")
        val f = n.get("fusion")
        require(f.isTextual && Set("rrf", "dbsf")(f.asText()),
          s"fusion must be \"rrf\" or \"dbsf\": $f")
        Fusion(f.asText())
      } else if (n.has("formula")) {
        val extra = keys.filterNot(Set("formula"))
        require(extra.isEmpty,
          s"unknown query keys $extra beside formula (defaults: is not " +
            "served — missing payload values fail loudly instead)")
        FormulaQuery(parseFormula(n.get("formula")))
      } else if (n.has("sample")) {
        require(keys == Seq("sample"), s"unknown query keys $keys")
        val sm = n.get("sample")
        require(sm.isTextual && sm.asText() == "random",
          s"sample must be \"random\": $sm")
        SampleRandom
      } else if (n.has("order_by")) {
        fail("order_by queries are not wire-served — use the scroll " +
          "order-by rows (events_scroll_order_by_indexed / vs_scroll_order_by)")
      } else fail(
        s"unknown query form $keys — served: nearest/recommend/discover/" +
          "context/fusion/formula/sample")
    } else fail(s"query must be a vector, a point id, or a mode object: $n")
  }

  private def parseRequest(n: JsonNode, ctx: String): Request = {
    require(n != null && n.isObject, s"$ctx must be a JSON object: $n")
    val known = Set("query", "prefetch", "using", "filter", "limit",
      "offset", "score_threshold", "lookup_from", "params")
    val unknown = fieldNames(n).filterNot(known)
    require(unknown.isEmpty,
      s"unknown $ctx keys $unknown — served: ${known.toSeq.sorted.mkString("/")}" +
        " (with_payload/with_vector are projection: select the columns " +
        "from the returned relation instead)")
    require(n.has("query"), s"$ctx needs a 'query' member")
    val prefetch = Option(n.get("prefetch")).map { p =>
      val stages = if (p.isArray) vecNodes(p, "prefetch") else Seq(p)
      stages.map(parseRequest(_, "prefetch stage"))
    }.getOrElse(Nil)
    val using = Option(n.get("using")).map { u =>
      require(u.isTextual, s"using must be a vector name string: $u")
      u.asText()
    }
    val filter = Option(n.get("filter"))
      .map(f => Filters.fromJson(f.toString))
    val limit = Option(n.get("limit")).map { l =>
      require(l.isIntegralNumber && l.asLong() >= 1,
        s"limit must be a positive integer: $l")
      l.asInt()
    }
    val offset = Option(n.get("offset")).map { o =>
      require(o.isIntegralNumber && o.asLong() >= 0,
        s"offset must be a non-negative integer: $o")
      o.asInt()
    }.getOrElse(0)
    val thr = Option(n.get("score_threshold")).map(num(_, "score_threshold"))
    val lookupFrom = Option(n.get("lookup_from")).map { l =>
      require(l.isTextual, s"lookup_from must be a collection name: $l")
      l.asText()
    }
    val quant = Option(n.get("params")).map { p =>
      require(p.isObject, s"params must be an object: $p")
      val extra = fieldNames(p).filterNot(Set("quantization"))
      require(extra.isEmpty,
        s"unknown params keys $extra — served: quantization")
      val q = p.get("quantization")
      require(q != null && q.isObject,
        s"params.quantization must be an object: $p")
      val qExtra = fieldNames(q)
        .filterNot(Set("ignore", "rescore", "oversampling"))
      require(qExtra.isEmpty, s"unknown quantization keys $qExtra")
      def bool(name: String, dflt: Boolean): Boolean =
        Option(q.get(name)).map { b =>
          require(b.isBoolean, s"quantization.$name must be a boolean: $b")
          b.asBoolean()
        }.getOrElse(dflt)
      Quantization(bool("ignore", dflt = false), bool("rescore", dflt = true),
        Option(q.get("oversampling")).map(num(_, "oversampling")).getOrElse(1.0))
    }
    Request(parseQuery(n.get("query")), prefetch, using, filter, limit,
      offset, thr, lookupFrom, quant)
  }

  /** Parse a `/points/query` request body. Refuses loudly on any
    * member it cannot serve — see the object doc for the served set.
    */
  def fromJson(json: String): Request = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(root != null && root.isObject,
      s"query request JSON must be an object: $json")
    parseRequest(root, "query request")
  }

  // ------------- the sibling /points endpoints as data (same wire
  // ------------- discipline: parse to a typed request, refuse loudly)

  private def rootObj(json: String, what: String): JsonNode = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    require(root != null && root.isObject, s"$what JSON must be an object: $json")
    root
  }

  private def knownKeys(n: JsonNode, what: String, known: Set[String]): Unit = {
    val unknown = fieldNames(n).filterNot(known)
    require(unknown.isEmpty,
      s"unknown $what keys $unknown — served: ${known.toSeq.sorted.mkString("/")}")
  }

  private def filterOf(n: JsonNode): Option[Filters.PFilter] =
    Option(n.get("filter")).map(f => Filters.fromJson(f.toString))

  private def posInt(n: JsonNode, name: String, dflt: Int): Int =
    Option(n.get(name)).map { l =>
      require(l.isIntegralNumber && l.asLong() >= 1,
        s"$name must be a positive integer: $l")
      l.asInt()
    }.getOrElse(dflt)

  /** A `/points/query/groups` request: the grouped-search wire form
    * (`group_by` payload field, `limit` groups × `group_size` hits,
    * optional `with_lookup` record attachment).
    */
  final case class GroupsRequest(query: Query, groupBy: String,
                                 limit: Int, groupSize: Int,
                                 withLookup: Option[String],
                                 filter: Option[Filters.PFilter])

  /** Parse a `/points/query/groups` request body. `filter` is the full
    * boolean algebra (the same member every query mode takes);
    * `with_lookup` takes Qdrant's string or `{collection: …}` object
    * form (the projection members `with_payload`/`with_vectors` refuse
    * — select columns from the returned relation instead).
    */
  def groupsFromJson(json: String): GroupsRequest = {
    val n = rootObj(json, "groups request")
    knownKeys(n, "groups request",
      Set("query", "group_by", "limit", "group_size", "with_lookup",
        "filter"))
    require(n.has("query"), "a groups request needs a 'query' member")
    require(n.has("group_by") && n.get("group_by").isTextual,
      "a groups request needs a 'group_by' payload field name")
    val lookup = Option(n.get("with_lookup")).map {
      case l if l.isTextual => l.asText()
      case l if l.isObject =>
        knownKeys(l, "with_lookup", Set("collection"))
        val c = l.get("collection")
        require(c != null && c.isTextual,
          s"with_lookup.collection must be a string: $l")
        c.asText()
      case other => fail(
        s"with_lookup must be a collection name or {collection: …}: $other")
    }
    GroupsRequest(parseQuery(n.get("query")), n.get("group_by").asText(),
      posInt(n, "limit", 3), posInt(n, "group_size", 2), lookup,
      filterOf(n))
  }

  /** A scroll `order_by` member: key + direction + optional
    * `start_from` value (keyset continuation).
    */
  final case class OrderBy(key: String, direction: String,
                           startFrom: Option[String])

  /** A `/points/scroll` request. `offset` is Qdrant's next-point-id
    * cursor; with `order_by` it serves as the id TIEBREAK within the
    * `start_from` value (the strict keyset extension — Qdrant's own
    * order_by pagination is value-only and can skip/repeat rows on
    * ties; ours cannot).
    */
  final case class ScrollRequest(filter: Option[Filters.PFilter],
                                 limit: Int, offset: Option[Long],
                                 orderBy: Option[OrderBy])

  /** Parse a `/points/scroll` request body. */
  def scrollFromJson(json: String): ScrollRequest = {
    val n = rootObj(json, "scroll request")
    knownKeys(n, "scroll request", Set("filter", "limit", "offset", "order_by"))
    val offset = Option(n.get("offset")).map { o =>
      require(o.isIntegralNumber && o.asLong() >= 0,
        s"scroll offset must be a point-id cursor (non-negative integer): $o")
      o.asLong()
    }
    val orderBy = Option(n.get("order_by")).map {
      case ob if ob.isTextual => OrderBy(ob.asText(), "asc", None)
      case ob if ob.isObject =>
        knownKeys(ob, "order_by", Set("key", "direction", "start_from"))
        val k = ob.get("key")
        require(k != null && k.isTextual, s"order_by.key must be a string: $ob")
        val dir = Option(ob.get("direction")).map { d =>
          require(d.isTextual && Set("asc", "desc")(d.asText()),
            s"order_by.direction must be asc|desc: $d")
          d.asText()
        }.getOrElse("asc")
        val from = Option(ob.get("start_from")).map { f =>
          require(f.isValueNode && !f.isNull,
            s"order_by.start_from must be a scalar value: $f")
          f.asText()
        }
        OrderBy(k.asText(), dir, from)
      case other => fail(s"order_by must be a key name or an object: $other")
    }
    ScrollRequest(filterOf(n), posInt(n, "limit", 10), offset, orderBy)
  }

  /** Parse a `/points/count` request body. `exact: false` (Qdrant's
    * estimated count) refuses — the engine's count is one pruned
    * aggregate either way, and an estimate where the caller can have
    * the exact number is a wrong answer; the planner-side estimate
    * lives in AnnIndex.estimateSelectivity.
    */
  def countFromJson(json: String): Option[Filters.PFilter] = {
    val n = rootObj(json, "count request")
    knownKeys(n, "count request", Set("filter", "exact"))
    Option(n.get("exact")).foreach { e =>
      require(e.isBoolean, s"exact must be a boolean: $e")
      require(e.asBoolean(),
        "exact: false (estimated count) is not served — the filtered " +
          "count is one partition-pruned aggregate; drop the member or " +
          "pass exact: true")
    }
    filterOf(n)
  }

  /** A `/facet` request: value counts of one payload `key` under a
    * filter. Qdrant's `exact` member parses both ways — the served
    * counts are always exact (exact ⊃ approximate; serving better than
    * asked is not a refusal case).
    */
  final case class FacetRequest(key: String, filter: Option[Filters.PFilter],
                                limit: Int)

  /** Parse a `/facet` request body. */
  def facetFromJson(json: String): FacetRequest = {
    val n = rootObj(json, "facet request")
    knownKeys(n, "facet request", Set("key", "filter", "limit", "exact"))
    require(n.has("key") && n.get("key").isTextual,
      "a facet request needs a 'key' payload field name")
    Option(n.get("exact")).foreach(e =>
      require(e.isBoolean, s"exact must be a boolean: $e"))
    FacetRequest(n.get("key").asText(), filterOf(n), posInt(n, "limit", 10))
  }

  /** Parse a `/points/query/batch` request body: `{searches: [request,
    * …]}`, each entry a full [[Request]]. The batch is a bounded client
    * list; dispatch unions the per-request plans into ONE job.
    */
  def batchFromJson(json: String): Seq[Request] = {
    val n = rootObj(json, "batch request")
    knownKeys(n, "batch request", Set("searches"))
    val s = n.get("searches")
    require(s != null && s.isArray && s.size() > 0,
      "a batch request needs a non-empty 'searches' array")
    vecNodes(s, "searches").map(parseRequest(_, "batch search"))
  }

  /** Parse a points-retrieve request body (`GET /points`): `{ids:
    * […]}`. The projection members (`with_payload`/`with_vector`)
    * refuse — select columns from the returned relation instead
    * (missing ids are absent per the documented semantics, no error).
    */
  def retrieveFromJson(json: String): Seq[Long] = {
    val n = rootObj(json, "retrieve request")
    knownKeys(n, "retrieve request", Set("ids"))
    val ids = n.get("ids")
    require(ids != null && ids.isArray && ids.size() > 0,
      "a retrieve request needs a non-empty 'ids' array")
    vecNodes(ids, "ids").map(id(_, "retrieve id"))
  }

  /** Parse a `/points/search/matrix` request body: `{sample, limit}` —
    * the pairwise-similarity matrix over a `sample`-sized member set,
    * `limit` nearest others per member. A `filter` member refuses (the
    * served matrix samples the collection deterministically — the
    * diagnostics contract; filter + matrix composes by materializing
    * the filtered slice as its own collection).
    */
  def matrixFromJson(json: String): (Long, Int) = {
    val n = rootObj(json, "matrix request")
    knownKeys(n, "matrix request", Set("sample", "limit"))
    val sample = Option(n.get("sample")).map { v =>
      require(v.isIntegralNumber && v.asLong() >= 2,
        s"matrix sample must be an integer ≥ 2: $v")
      v.asLong()
    }.getOrElse(10L)
    (sample, posInt(n, "limit", 3))
  }
}
