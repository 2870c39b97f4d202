package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions._

/** Session extensions registering graft's custom expressions as SQL
  * functions — `spark.sql("SELECT simhash64(...)")` works on any
  * session built `.withExtensions(new GraftExtensions)`, launched with
  * `spark.sql.extensions=graft.GraftExtensions`, or patched at runtime
  * with [[GraftExtensions.registerAll]] (builder extensions don't
  * apply to an already-running session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** Foldable-argument guard: `eval()` with no input row only works on
    * a literal/foldable expression — a column here would surface as an
    * opaque UnsupportedOperation/ClassCast at registration. Rethrow as
    * the same usage error the arity guard raises.
    */
  private def stringArrayArg(name: String, usage: String,
                             e: Expression): Seq[String] =
    try e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
      .map(u => if (u == null) null else u.toString).toSeq
    catch { case ex: RuntimeException =>
      throw new IllegalArgumentException(
        s"$name: the vocab argument must be a constant array literal " +
          s"— usage: $usage", ex)
    }

  /** Foldable numeric-array argument, cast to double elements first so
    * SQL decimal literals (`array(0.1, ...)`) work. */
  private def doubleArrayArg(name: String, usage: String,
                             e: Expression): Array[Double] =
    try org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
      .eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    catch { case ex: RuntimeException =>
      throw new IllegalArgumentException(
        s"$name: mean/axis must be constant numeric array literals " +
          s"— usage: $usage", ex)
    }

  private def arity(name: String, usage: String, exprs: Seq[Expression],
                    n: Int): Unit =
    if (exprs.size != n) throw new IllegalArgumentException(
      s"$name expects $n arguments — usage: $usage")

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rolling_fingerprint",
      "rolling_fingerprint(str) - rolling polynomial hash mod 1e9+7",
      exprs => RollingFingerprint(exprs.head)),
    ("simhash64",
      "simhash64(array<string>) - 64-bit SimHash",
      exprs => SimHash64(exprs.head)),
    ("word_shingles",
      "word_shingles(str, n) - word n-gram shingles",
      exprs => WordShingles(exprs.head, intArg(exprs(1)))),
    ("minhash_sig",
      "minhash_sig(array<string>, k) - k-minima MinHash signature",
      exprs => MinHashSig(exprs.head, intArg(exprs(1)))),
    ("vec_cosine",
      "vec_cosine(array<float>, array<float>) - cosine similarity",
      exprs => VecCosine(exprs.head, exprs(1))),
    ("hyperplane_bucket",
      "hyperplane_bucket(array<float>, planes) - LSH bucket",
      exprs => HyperplaneBucketExpr(exprs.head, intArg(exprs(1)))),
    ("kll_sketch_agg",
      "kll_sketch_agg(double[, k]) - mergeable KLL quantile sketch bytes",
      exprs => KllSketchAgg(exprs.head,
        if (exprs.size > 1) intArg(exprs(1)) else KllFunctions.DefaultK)),
    ("kll_merge_agg",
      "kll_merge_agg(binary[, k]) - merge persisted KLL sketches",
      exprs => KllMergeAgg(exprs.head,
        if (exprs.size > 1) intArg(exprs(1)) else KllFunctions.DefaultK)),
    ("kll_quantiles",
      "kll_quantiles(binary, array<double>) - quantile values at the given ranks",
      exprs => KllQuantiles(exprs.head, exprs(1))),
    ("greedy_tokenize",
      "greedy_tokenize(str, array<string> vocab, maxLen) - greedy longest-match subword tokens",
      exprs => {
        arity("greedy_tokenize",
          "greedy_tokenize(str, array<string> vocab, maxLen)", exprs, 3)
        GreedyTokenize(exprs.head, stringArrayArg("greedy_tokenize",
          "greedy_tokenize(str, array<string> vocab, maxLen)", exprs(1)),
          intArg(exprs(2)))
      }),
    ("greedy_tokenize_text",
      "greedy_tokenize_text(str, array<string> vocab, maxLen) - flat subword stream over all words",
      exprs => {
        arity("greedy_tokenize_text",
          "greedy_tokenize_text(str, array<string> vocab, maxLen)", exprs, 3)
        GreedyTokenizeText(exprs.head, stringArrayArg("greedy_tokenize_text",
          "greedy_tokenize_text(str, array<string> vocab, maxLen)", exprs(1)),
          intArg(exprs(2)))
      }),
    ("vec_project",
      "vec_project(array<float> vec, array<double> mean, array<double> axis, div) - PCA component: sum((v-mean)*axis)/div",
      exprs => {
        val usage = "vec_project(array<float> vec, array<double> mean, " +
          "array<double> axis, div)"
        arity("vec_project", usage, exprs, 4)
        // SQL numeric literals can surface as Decimal — cast first
        val div = org.apache.spark.sql.catalyst.expressions
          .Cast(exprs(3), org.apache.spark.sql.types.DoubleType)
          .eval().asInstanceOf[Double]
        VecProject(exprs.head,
          doubleArrayArg("vec_project", usage, exprs(1)),
          doubleArrayArg("vec_project", usage, exprs(2)), div)
      }))

  /** Patch a LIVE session to the same posture `withExtensions` gives a
    * new one: every SQL function, the top-k planner strategy, AND the
    * top-k rewrite rule — a runtime-patched session must not plan
    * differently from an extension-built one.
    */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TopKRewrite
  }
}
