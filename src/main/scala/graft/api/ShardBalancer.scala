package graft.api

import org.apache.spark.sql.SparkSession

/** CLUSTER REBALANCE PLANNER — the decision half above
  * [[ShardTransfer]] (Qdrant's move-shard cluster API has exactly this
  * split: an operator reads per-shard telemetry, picks moves, then
  * executes transfers). The deployment model is one collection sharded
  * ACROSS roots ("nodes"), each root owning a DISJOINT set of
  * tenant-hash buckets — the invariant [[ShardTransfer]] enforces
  * (exclusive ownership) is the invariant this planner preserves.
  *
  * `plan` is pure metadata: one per-bucket aggregate per node (the
  * [[ShardTransfer.plan]] manifest), then a driver-side greedy over
  * (node, bucket, points) rows — bounded state, nodes × buckets.
  * Greedy rule: while the most-loaded node exceeds the mean by more
  * than `tolerance`, move its largest bucket that fits to the
  * least-loaded node; stop when no move shrinks the max-min spread.
  * Deterministic throughout (count-desc, bucket-asc tie-breaks), so a
  * re-plan over unchanged data proposes identical moves.
  *
  * `apply` executes the plan with [[ShardTransfer.run]] move by move —
  * each move individually crash-safe (copy-before-prune) and
  * idempotent, so a balancer interrupted mid-plan re-runs to
  * convergence.
  */
object ShardBalancer {

  case class Move(bucket: Int, fromPath: String, toPath: String, nPoints: Long)

  case class Plan(moves: Seq[Move], loadsBefore: Map[String, Long],
                  loadsAfter: Map[String, Long])

  def plan(spark: SparkSession, roots: Seq[String],
           tolerance: Double = 0.10): Plan = {
    require(roots.nonEmpty, "no nodes to balance")
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    // (node, bucket, points) telemetry — one aggregate per node
    val stats: Seq[(String, Int, Long)] = roots.flatMap { r =>
      ShardTransfer.plan(spark, r).collect()
        .map(row => (r, row.getInt(0), row.getLong(1)))
    }
    val owners = stats.groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1)
    require(owners.isEmpty,
      s"buckets owned by multiple nodes (transfer would refuse): ${owners.keys.toSeq.sorted}")

    val load = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    roots.foreach(r => load(r) = 0L) // empty nodes are valid targets
    stats.foreach { case (r, _, n) => load(r) += n }
    val where = scala.collection.mutable.Map[Int, String](
      stats.map(s => s._2 -> s._1): _*)
    val size = stats.map(s => s._2 -> s._3).toMap
    val loadsBefore = load.toMap
    val mean = load.values.sum.toDouble / roots.size

    val moves = scala.collection.mutable.ListBuffer.empty[Move]
    var progress = true
    while (progress && load.values.max > mean * (1 + tolerance)) {
      progress = false
      // most-loaded node, path-asc tie-break
      val from = roots.minBy(r => (-load(r), r))
      val to = roots.minBy(r => (load(r), r))
      // its largest bucket whose move shrinks the from-to spread
      val candidates = where.collect { case (b, r) if r == from => b }.toSeq
        .sortBy(b => (-size(b), b))
      candidates.find(b => load(to) + size(b) < load(from)).foreach { b =>
        moves += Move(b, from, to, size(b))
        load(from) -= size(b); load(to) += size(b); where(b) = to
        progress = true
      }
    }
    Plan(moves.toList, loadsBefore, load.toMap)
  }

  /** Execute a plan IN PLAN ORDER — the greedy may re-home a bucket
    * through an intermediate node (`where(b) = to` lets a later
    * iteration move a bucket from its new owner), so reordering moves
    * would run a leg before its predecessor delivered. Consecutive
    * moves sharing a (from, to) pair batch into one transfer (one
    * generation per side per batch). Returns the moves executed.
    */
  def apply(spark: SparkSession, p: Plan): Seq[Move] = {
    val batches = p.moves.foldLeft(List.empty[List[Move]]) {
      case (acc @ (head :: tail), m)
          if head.nonEmpty && head.head.fromPath == m.fromPath &&
            head.head.toPath == m.toPath =>
        (head :+ m) :: tail
      case (acc, m) => List(m) :: acc
    }.reverse
    val executed = scala.collection.mutable.ListBuffer.empty[Move]
    batches.foreach { ms =>
      // a mid-plan transfer failure must be OBSERVABLE with the executed
      // prefix named (each executed move is individually committed and
      // crash-safe; re-running the same plan converges past it)
      try {
        ShardTransfer.run(spark, ms.head.fromPath, ms.head.toPath,
          ms.map(_.bucket))
        executed ++= ms
      } catch {
        case e: Exception => throw new IllegalStateException(
          s"rebalance stopped after ${executed.size}/${p.moves.size} moves " +
            s"(buckets ${executed.map(_.bucket).mkString(",")} delivered); " +
            "re-running the plan converges", e)
      }
    }
    executed.toList
  }
}
