package graft

import org.apache.spark.sql.graft._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native vector expressions:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   SELECT graft_cosine(a.vec, b.vec) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2"),
      info("graft_l2", classOf[L2Distance]),
      (args: Seq[Expression]) => L2Distance(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineSimilarity]),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_norm"),
      info("graft_norm", classOf[L2Norm]),
      (args: Seq[Expression]) => L2Norm(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_normalize"),
      info("graft_normalize", classOf[Normalize]),
      (args: Seq[Expression]) => Normalize(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_hamming_sign"),
      info("graft_hamming_sign", classOf[HammingSign]),
      (args: Seq[Expression]) => HammingSign(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_sign_pack"),
      info("graft_sign_pack", classOf[SignPack]),
      (args: Seq[Expression]) => SignPack(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_hamming_packed"),
      info("graft_hamming_packed", classOf[HammingPacked]),
      (args: Seq[Expression]) => HammingPacked(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_embed"),
      info("graft_embed", classOf[FeatureHashEmbed]),
      (args: Seq[Expression]) => FeatureHashEmbed(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", classOf[JaccardSorted]),
      (args: Seq[Expression]) => JaccardSorted(args(0), args(1))))
    // whole-operator plan: TopKPerKey (partial-heap → exchange → final-heap)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.plans.TopKPerKeyStrategy)
    // TABLE function: the WHOLE query inventory from SQL —
    //   SELECT * FROM graft_query('q1_pricing_summary', '/data/sf')
    // resolves to the named operator's logical plan over that dataset
    // dir, so a SQL-only client runs every reference-parity query with
    // no Scala. Args must be literals (they select the plan, they
    // don't flow through it).
    ext.injectTableFunction((FunctionIdentifier("graft_query"),
      new ExpressionInfo(classOf[SparkEntry.type].getName, "graft_query"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_query(name, dir) takes 2 literal args, got ${args.length}")
        def lit(e: Expression, what: String): String = e.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_query $what must be a string literal, got $other")
        }
        val name = lit(args(0), "name")
        val dir = lit(args(1), "dir")
        val fn = SparkEntry.queries.getOrElse(name,
          throw new IllegalArgumentException(s"unknown graft query '$name' — " +
            s"valid names: ${SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…"))
        fn(org.apache.spark.sql.SparkSession.active, dir).queryExecution.logical
      }))
  }
}
