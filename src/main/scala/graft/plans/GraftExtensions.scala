package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension installer for graft's Catalyst expressions — lets a
  * cluster set `spark.sql.extensions=graft.plans.GraftExtensions` (or a
  * builder call `.withExtensions(new GraftExtensions)`) and get every
  * graft function in SQL on every session, instead of per-session
  * `VecExprs.register(spark)` calls. Same builders as the registry path,
  * so plans are identical either way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int = e.eval().asInstanceOf[Int]

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => VecExprs.CosineSim(es(0), es(1))),
    "graft_dot" -> (es => VecExprs.DotProd(es(0), es(1))),
    "graft_hash_embed" -> (es => VecExprs.HashEmbed(es(0), intArg(es(1)))),
    "graft_lsh_bucket" -> (es => VecExprs.LshBucket(es(0), intArg(es(1)))),
    "graft_token_codes" -> (es => TextExprs.TokenCodes(es(0), intArg(es(1)).toLong)),
    "graft_shingle_codes" -> (es => TextExprs.ShingleCodes(es(0), intArg(es(1)))),
    "graft_minhash_sig" -> (es => TextExprs.MinHashSig(es(0), intArg(es(1)))),
    "graft_simhash" -> (es => TextExprs.SimHash(es(0), intArg(es(1)))),
    "graft_jaccard_sorted" -> (es => TextExprs.JaccardSorted(es(0), es(1))))

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.GraftExtensions", name),
        builder))
    }
}
