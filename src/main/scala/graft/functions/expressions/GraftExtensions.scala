package graft.functions.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.operators.TextAnalysis

/** SparkSessionExtensions registration for the engine's native
  * expressions, so SQL-mode models (the fidelity path) can call them
  * by name:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or spark.sql.extensions=graft.functions.expressions.GraftExtensions
  * spark.sql("SELECT minhash_sig(text, 3, 64) FROM documents")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** (name, info, builder) triples shared by both install paths. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(text)       => MinHashSig(text, 3, 64)
        case Seq(text, n, k) => MinHashSig(text, intArg(n, "n"), intArg(k, "k"))
        case _ => throw new IllegalArgumentException(
          "minhash_sig(text[, shingleN, numHashes])")
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text)    => ShingleHashes(text, 3)
        case Seq(text, n) => ShingleHashes(text, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, n])")
      }),
    (FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text)       => WinnowFingerprint(text, 8, 16)
        case Seq(text, k, w) => WinnowFingerprint(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException("winnow_fingerprint(text[, k, w])")
      }),
    (FunctionIdentifier("lang_scores"),
      new ExpressionInfo(classOf[LangScores].getName, "lang_scores"),
      (args: Seq[Expression]) => LangScores(args.head,
        Seq(TextAnalysis.EnStop, TextAnalysis.EsStop,
          TextAnalysis.DeStop, TextAnalysis.FrStop))),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("vec_dot(a, b)")
      }),
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException("vec_cosine(a, b)")
      }),
    (FunctionIdentifier("hyperplane_bits"),
      new ExpressionInfo(classOf[HyperplaneBits].getName, "hyperplane_bits"),
      (args: Seq[Expression]) => args match {
        case Seq(v, p)    => HyperplaneBits(v, intArg(p, "planes"), 0x5eed)
        case Seq(v, p, s) => HyperplaneBits(v, intArg(p, "planes"), intArg(s, "seed"))
        case _ => throw new IllegalArgumentException("hyperplane_bits(v, planes[, seed])")
      }),
    (FunctionIdentifier("fold_accents"),
      new ExpressionInfo(classOf[FoldAccents].getName, "fold_accents"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => FoldAccents(text)
        case _ => throw new IllegalArgumentException("fold_accents(text)")
      }))

  /** Install into a live session (when session construction isn't in
    * your hands — notebooks, shared test sessions). The
    * `spark.sql.extensions` / `withExtensions` path uses the same
    * builders.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
