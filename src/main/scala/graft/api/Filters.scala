package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Qdrant FILTER BOOLEAN ALGEBRA (VERDICT r9 #1) — the full public
  * filter object the reference only ever instantiates conjunctively
  * (`Filter(must=[...])`, /root/reference/search.py:37-49): `must` /
  * `should` / `must_not` clause lists plus `min_should`, over the match
  * conditions of Qdrant's payload model (match value / any / except,
  * full-text match, ranges, geo boxes, `is_empty` / `is_null`), with
  * NESTED filters as conditions. One tree, two physical routes:
  *
  *  - the SCAN route — [[Filters.toColumn]] compiles the tree to one
  *    boolean `Column` over the raw collection (the predicate a
  *    100 TB deployment pushes into any unindexed scan);
  *  - the INDEXED route — [[PayloadIndex!.readFilter]] derives a
  *    PRUNING predicate (partition directories / zone manifests / geo
  *    cells / token postings) alongside the same exact residual, so
  *    the two routes return IDENTICAL rows and differ only in I/O.
  *
  * NULL semantics are Qdrant's, not SQL's: a CONDITION on a missing or
  * NULL payload value simply DOES NOT MATCH (never "unknown"), so every
  * leaf compiles to a total boolean (`coalesce(_, false)`), `must_not`
  * is plain negation (a NULL `lang` row MATCHES `must_not
  * [lang = "de"]`, where SQL three-valued `NOT (lang = 'de')` would
  * drop it), and the clause algebra is ordinary two-valued logic.
  * [[IsNull]] / [[IsEmpty]] are the conditions that MATCH missing
  * values — the Qdrant model's explicit tools for them.
  *
  * Pruning composition (the indexed route's contract — the index only
  * ever PRUNES, never changes rows):
  *
  *  - `must` arms prune CONJUNCTIVELY (each prunable arm narrows the
  *    directory set further; unprunable arms just stay residual-only);
  *  - `should` (and `min_should`, since min ≥ 1) arms prune as the
  *    UNION of their per-arm slices — but only when EVERY arm is
  *    prunable: one unprunable arm makes the union the whole
  *    collection;
  *  - `must_not` NEVER contributes manifest/postings pruning — a
  *    complement is not expressible as "fewer zones" (loudly
  *    documented: an exclusion list is a residual, and callers needing
  *    pruned exclusions should invert the condition). The one
  *    exception falls out for free: a negated KEYWORD condition is
  *    itself a partition-column predicate, and Spark's catalog prunes
  *    directories on any deterministic partition predicate — including
  *    negations — directly from the residual.
  */
object Filters {

  /** One Qdrant filter condition. [[PFilter]] itself is a condition, so
    * trees nest (`must: [Filter(should = [...])]`).
    */
  sealed trait PCond extends Serializable

  /** Keyword/scalar equality (Qdrant `match: {value: v}`). Values are
    * strings; Spark coerces against the column type.
    */
  final case class MatchValue(field: String, value: String) extends PCond

  /** Any-of over keyword/scalar values (Qdrant `match: {any: [...]}`). */
  final case class MatchAny(field: String, values: Seq[String]) extends PCond

  /** None-of over keyword/scalar values (Qdrant `match: {except:
    * [...]}` — the documented logical NOT of [[MatchAny]], so a NULL
    * value MATCHES: none of its values are in the list, vacuously).
    */
  final case class MatchExcept(field: String, values: Seq[String]) extends PCond

  /** Conjunctive whole-word text match (Qdrant `match: {text: "..."}`
    * through a full-text index — every term present as a word).
    */
  final case class MatchText(field: String, terms: Seq[String]) extends PCond

  /** Any-of whole-word text match — at least ONE term present as a
    * word. On the indexed route this is the natural POSTINGS UNION
    * (≥ 1 matching posting instead of one per term).
    */
  final case class MatchTextAny(field: String, terms: Seq[String]) extends PCond

  /** Closed range on an integer payload (Qdrant `range: {gte, lte}`).
    * Equality is `RangeInt(f, v, v)`.
    */
  final case class RangeInt(field: String, lo: Long, hi: Long) extends PCond

  /** Closed range on a float payload. Bounds must be FINITE — see the
    * manifest note on [[PayloadIndex!.read]].
    */
  final case class RangeFloat(field: String, lo: Double, hi: Double) extends PCond

  /** Closed range on a datetime payload, bounds as UTC wall-clock
    * "yyyy-MM-dd HH:mm:ss[.ffffff]" strings (Qdrant `range` on a
    * datetime-schema field).
    */
  final case class RangeTime(field: String, lo: String, hi: String) extends PCond

  /** Geo bounding box over a (lat, lon) column pair (Qdrant
    * `geo_bounding_box`).
    */
  final case class GeoBox(latField: String, lonField: String,
                          latMin: Double, latMax: Double,
                          lonMin: Double, lonMax: Double) extends PCond

  /** Matches rows whose `field` IS NULL (Qdrant `is_null`). */
  final case class IsNull(field: String) extends PCond

  /** Matches rows whose `field` is NULL or an EMPTY ARRAY (Qdrant
    * `is_empty` — missing, null, or `[]`). On the generic scan route
    * this compiles a `size(...) = 0` arm and therefore requires an
    * ARRAY column; [[PayloadIndex!.readFilter]] is schema-aware and
    * rewrites `IsEmpty` over a scalar field to [[IsNull]] (the two
    * coincide there — a scalar has no empty form; Qdrant's "" is NOT
    * empty).
    */
  final case class IsEmpty(field: String) extends PCond

  /** The filter clause object (Qdrant `Filter`): matches a row iff ALL
    * `must` conditions match, AND at least one `should` condition
    * matches (when `should` is non-empty), AND NO `mustNot` condition
    * matches, AND at least `minShould._2` of `minShould._1` match
    * (when present).
    */
  final case class PFilter(must: Seq[PCond] = Nil,
                           should: Seq[PCond] = Nil,
                           mustNot: Seq[PCond] = Nil,
                           minShould: Option[(Seq[PCond], Int)] = None)
      extends PCond {
    require(must.nonEmpty || should.nonEmpty || mustNot.nonEmpty ||
      minShould.nonEmpty, "empty filter — give at least one clause")
    minShould.foreach { case (cs, m) =>
      require(m >= 1 && m <= cs.size,
        s"min_should count must be in [1, ${cs.size}] (got $m) — " +
          "0 is no constraint and > |conditions| is unsatisfiable")
    }
  }

  /** The whole-word terms of a text condition, validated and folded:
    * non-empty, single tokens (a whitespace term can never equal a
    * split-token — it would silently match nothing where the intent
    * was adjacency; phrases go through
    * [[PayloadIndex!.readMatchPhrase]]).
    */
  private def wordTerms(f: String, terms: Seq[String],
                        fold: String => String): Seq[String] = {
    val qts = terms.distinct.filter(_.nonEmpty)
    require(qts.nonEmpty, s"text match on '$f' needs at least one non-empty term")
    val spaced = qts.filter(_.exists(_.isWhitespace))
    require(spaced.isEmpty,
      s"text-match terms must be single tokens (got $spaced) — use " +
        "readMatchPhrase for adjacent-word phrases")
    qts.map(fold).distinct
  }

  /** Compile a condition tree to ONE total boolean `Column` — the scan
    * route, and the indexed route's exact residual. `fold` / `foldCol`
    * carry the text-index case semantics ([[PayloadIndex]] passes its
    * persisted fold; the raw scan route is case-exact).
    */
  def toColumn(cond: PCond,
               fold: String => String = identity,
               foldCol: Column => Column = c => c): Column = cond match {
    case PFilter(must, should, mustNot, minShould) =>
      val parts =
        must.map(toColumn(_, fold, foldCol)) ++
          (if (should.isEmpty) Nil
           else Seq(should.map(toColumn(_, fold, foldCol)).reduce(_ || _))) ++
          mustNot.map(c => !toColumn(c, fold, foldCol)) ++
          minShould.toSeq.map { case (cs, m) =>
            cs.map(c => when(toColumn(c, fold, foldCol), 1).otherwise(0))
              .reduce(_ + _) >= m
          }
      parts.reduce(_ && _)
    case MatchValue(f, v) => coalesce(col(f) === lit(v), lit(false))
    case MatchAny(f, vs) =>
      if (vs.isEmpty) lit(false)
      else coalesce(col(f).isin(vs: _*), lit(false))
    case MatchExcept(f, vs) => // NOT MatchAny — a NULL value matches
      if (vs.isEmpty) lit(true)
      else !coalesce(col(f).isin(vs: _*), lit(false))
    case MatchText(f, ts) =>
      val padded = concat(lit(" "), foldCol(col(f)), lit(" "))
      coalesce(wordTerms(f, ts, fold).map(t => padded.contains(s" $t "))
        .reduce(_ && _), lit(false))
    case MatchTextAny(f, ts) =>
      val padded = concat(lit(" "), foldCol(col(f)), lit(" "))
      coalesce(wordTerms(f, ts, fold).map(t => padded.contains(s" $t "))
        .reduce(_ || _), lit(false))
    case RangeInt(f, lo, hi) =>
      coalesce(col(f) >= lo && col(f) <= hi, lit(false))
    case RangeFloat(f, lo, hi) =>
      require(!lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite,
        s"RangeFloat on '$f' needs finite bounds (got [$lo, $hi])")
      coalesce(col(f) >= lo && col(f) <= hi, lit(false))
    case RangeTime(f, lo, hi) =>
      val (l, h) = (PayloadIndex.utcMicros(lo), PayloadIndex.utcMicros(hi))
      // TIMESTAMP-literal bounds (constant-folded) so the comparison
      // still pushes to a parquet scan — the read() discipline
      coalesce(col(f) >= timestamp_micros(lit(l)) &&
        col(f) <= timestamp_micros(lit(h)), lit(false))
    case GeoBox(la, lo, latMin, latMax, lonMin, lonMax) =>
      coalesce(col(la) >= latMin && col(la) <= latMax &&
        col(lo) >= lonMin && col(lo) <= lonMax, lit(false))
    case IsNull(f) => col(f).isNull
    case IsEmpty(f) => col(f).isNull || coalesce(size(col(f)) === 0, lit(false))
  }
}
