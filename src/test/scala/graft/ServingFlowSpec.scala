package graft

import graft.api.{Aliases, CuratePipeline, SnapshotGc, VectorIndex}
import org.apache.spark.sql.functions._

/** END-TO-END SERVING-ARTIFACT FLOW (VERDICT r5 #8): the blue/green
  * reindex a deployment actually runs, composed from the individually
  * spec'd pieces in one path —
  *
  *   curate → index build → save (committed generation) → alias point
  *   → serve through the alias → re-curate → green build → alias
  *   RE-POINT (the atomic swap) → SnapshotGc (reclaim blue + the
  *   alias registry's own history) → serving never interrupted.
  *
  * The serving client only ever holds (registry, alias) — every swap,
  * rotation, and reclamation happens UNDER it, which is the whole
  * contract this spec pins.
  */
class ServingFlowSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("blue/green reindex: curate -> build -> alias -> re-point -> gc, serving uninterrupted") {
    val reg = tmp("graft-flow-reg-")
    val blueRoot = tmp("graft-flow-blue-") + "/idx"
    val greenRoot = tmp("graft-flow-green-") + "/idx"

    // ---- BLUE: curate the corpus into a served index generation ----
    val blue = CuratePipeline.curateToIndex(spark, sf, tmp("graft-flow-cb-") + "/cur")
    blue.save(s"$blueRoot/${VectorIndex.generationDir(0)}")
    Aliases.set(spark, reg, "prod", blueRoot)

    // the serving client: resolves the alias, searches — knows nothing
    // about generations or curation
    def serve(): Seq[Long] = Aliases.openIndex(spark, reg, "prod")
      .searchText("spark filter join", userId = 3L, k = 5)
      .collect().map(_.getLong(1)).toSeq
    val blueHits = serve()
    assert(blueHits.nonEmpty, "blue index must serve")
    val blueCount = Aliases.openIndex(spark, reg, "prod").points.count()

    // ---- GREEN: re-curate with new chunking, build beside blue ----
    val green = CuratePipeline.curateToIndex(spark, sf,
      tmp("graft-flow-cg-") + "/cur", chunkWords = 30, stride = 25)
    green.save(s"$greenRoot/${VectorIndex.generationDir(0)}")
    val greenCount = VectorIndex.load(spark, greenRoot).points.count()
    assert(greenCount !== blueCount,
      "re-chunked green build should differ from blue (else the swap test is vacuous)")
    // blue keeps serving until the swap — the whole point of building beside
    assert(serve() === blueHits)

    // ---- the SWAP: one alias re-point, clients pick up green ----
    Aliases.set(spark, reg, "prod", greenRoot)
    assert(Aliases.openIndex(spark, reg, "prod").points.count() === greenCount)
    assert(serve().nonEmpty, "green index must serve after the swap")
    // audit trail: both targets, in order
    assert(Aliases.history(spark, reg, "prod").map(_._2) === Seq(blueRoot, greenRoot))

    // ---- ROTATION under the green root: a maintenance rebuild lands
    // gen-1; the alias (and client) never move ----
    green.upsert(green.points.limit(0)) // no-op batch, same contents
      .save(s"$greenRoot/${VectorIndex.generationDir(1)}")
    assert(VectorIndex.generations(spark, greenRoot) === Seq(0L, 1L))
    assert(serve().nonEmpty) // now served from gen-1, same alias

    // a torn writer dies mid-rotation: gen-2 exists, uncommitted —
    // resolution still serves the newest COMMITTED generation
    green.save(s"$greenRoot/${VectorIndex.generationDir(2)}")
    new java.io.File(s"$greenRoot/${VectorIndex.generationDir(2)}/_SUCCESS").delete()
    assert(VectorIndex.resolveSnapshot(spark, greenRoot)
      .endsWith(VectorIndex.generationDir(1)))
    assert(serve().nonEmpty)
    // the next maintenance rotation succeeds past the wreck (gen-3) —
    // now the torn write is superseded AND will age out
    green.save(s"$greenRoot/${VectorIndex.generationDir(3)}")
    assert(serve().nonEmpty)

    // ---- GC: reclaim rotation history + the torn write (superseded +
    // aged out), and the alias registry's own re-point history ----
    new java.io.File(s"$greenRoot/${VectorIndex.generationDir(2)}")
      .setLastModified(System.currentTimeMillis() - 120000)
    val actions = SnapshotGc.run(spark, greenRoot, keepHistory = 0,
      tornRetentionMs = 1000L).map(e => e.generation -> e.action).toMap
    assert(actions(VectorIndex.generationDir(0)) === "delete")
    assert(actions(VectorIndex.generationDir(1)) === "delete")
    assert(actions(VectorIndex.generationDir(2)) === "delete-torn")
    assert(actions(VectorIndex.generationDir(3)) === "keep-live")
    SnapshotGc.run(spark, s"$reg/prod", keepHistory = 0)
    // after ALL reclamation the client still serves, blue history gone
    assert(serve().nonEmpty)
    assert(Aliases.history(spark, reg, "prod").map(_._2) === Seq(greenRoot))
    assert(VectorIndex.generations(spark, greenRoot) === Seq(3L))
  }
}
