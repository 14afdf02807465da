package graft.plans

import graft.functions.{BottomKSample, CmsEstimate, CosineSim, MinHashSig, SimHashSig, SrpCode, TokenizeExpr, WordNGramsExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Catalyst integration surface: exposes graft's native expressions to
  * SQL (`SELECT cosine_sim(a, b)`, `srp_code(emb, 8, 8)`), both via
  * `SparkSessionExtensions` (for `.withExtensions` /
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session
  * build) and via [[register]] for an already-running session (the
  * driver owns session construction, so Verify/Bench use the latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    e.injectOptimizerRule(_ => AsofJoinFilterPushdown)
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
    e.injectFunction(GraftExtensions.srpCodeDescriptor)
    e.injectFunction(GraftExtensions.minHashSigDescriptor)
    e.injectFunction(GraftExtensions.simHashSigDescriptor)
    e.injectFunction(GraftExtensions.tokenizeDescriptor)
    e.injectFunction(GraftExtensions.wordNGramsDescriptor)
    e.injectFunction(GraftExtensions.bottomKSampleDescriptor)
    e.injectFunction(GraftExtensions.cmsEstimateDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  // `what` carries "function: param" — the helper serves all five
  // registered SQL functions, so the message must name the right one
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[plans] val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (args: Seq[Expression]) => CosineSim(args(0), args(1)))

  private[plans] val srpCodeDescriptor = (
    FunctionIdentifier("srp_code"),
    new ExpressionInfo(classOf[SrpCode].getName, "srp_code"),
    (args: Seq[Expression]) => SrpCode(
      args.head,
      intArg(args(1), "srp_code: tables"),
      intArg(args(2), "srp_code: bits"),
      if (args.length > 3) intArg(args(3), "srp_code: seed").toLong else 0xA11CE5L))

  private[plans] val minHashSigDescriptor = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1), "minhash_sig: k")))

  private[plans] val simHashSigDescriptor = (
    FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
    (args: Seq[Expression]) => SimHashSig(args.head))

  private[plans] val tokenizeDescriptor = (
    FunctionIdentifier("graft_tokenize"),
    new ExpressionInfo(classOf[TokenizeExpr].getName, "graft_tokenize"),
    (args: Seq[Expression]) => TokenizeExpr(args.head))

  private[plans] val wordNGramsDescriptor = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNGramsExpr].getName, "word_ngrams"),
    (args: Seq[Expression]) => WordNGramsExpr(args.head, intArg(args(1), "word_ngrams: n")))

  private[plans] val bottomKSampleDescriptor = (
    FunctionIdentifier("bottomk_sample"),
    new ExpressionInfo(classOf[BottomKSample].getName, "bottomk_sample"),
    (args: Seq[Expression]) => BottomKSample(args.head, intArg(args(1), "bottomk_sample: k")))

  private[plans] val cmsEstimateDescriptor = (
    FunctionIdentifier("cms_estimate"),
    new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
    (args: Seq[Expression]) => CmsEstimate(args(0), args(1)))

  /** Register the functions on a live session (temp functions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", args => CosineSim(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_code",
      args => SrpCode(args.head, intArg(args(1), "srp_code: tables"),
        intArg(args(2), "srp_code: bits"),
        if (args.length > 3) intArg(args(3), "srp_code: seed").toLong else 0xA11CE5L),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      args => MinHashSig(args.head, intArg(args(1), "minhash_sig: k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", args => SimHashSig(args.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", args => TokenizeExpr(args.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams",
      args => WordNGramsExpr(args.head, intArg(args(1), "word_ngrams: n")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_sample",
      args => BottomKSample(args.head, intArg(args(1), "bottomk_sample: k")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate", args => CmsEstimate(args(0), args(1)), "built-in")
  }
}
