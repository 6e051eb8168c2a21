package graft.plans

import graft.functions.{CosineSim, HyperplaneLsh, MinHashSig, NgramGenerate, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** The engine's `SparkSessionExtensions` module: what a user installs
  * with `spark.sql.extensions=graft.plans.GraftExtensions` to get the
  * graft kernels as first-class SQL functions plus the graft optimizer
  * rules — the Spark-idiomatic packaging of an engine extension (no
  * fork, no UDF registry, works from pure SQL).
  *
  * Registers:
  *   - `graft_cosine(a, b)`         native codegen'd cosine
  *   - `graft_simhash64(hashes)`    native SimHash fingerprint
  *   - `graft_minhash_sig(h, k)`    single-pass MinHash signature
  *   - `graft_hyperplane_lsh(v, l, b)` multi-table LSH buckets
  *   - `graft_ngrams(tokens, n)`    native n-gram Generator (UDTF)
  *   - [[SelfCosineIsOne]]          optimizer rule: cosine(x, x) ⇒ single-pass self-cosine
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b)")
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(hashes) - 64-bit SimHash of an array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64(hashes)")
        SimHash64(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(hashes, nPerms) - MinHash signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(hashes, nPerms)")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"nPerms must be an integer literal, got $other")
        }
        MinHashSig(args(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_lsh"),
      info("graft_hyperplane_lsh", "graft_hyperplane_lsh(v, nTables, bits) - LSH bucket signatures"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_hyperplane_lsh(v, nTables, bits)")
        (args(1), args(2)) match {
          case (Literal(l: Int, _), Literal(b: Int, _)) => HyperplaneLsh(args(0), l, b)
          case other => throw new IllegalArgumentException(
            s"nTables/bits must be integer literals, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "graft_ngrams(tokens, n) - generator emitting word n-grams as rows"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_ngrams(tokens, n)")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"n must be an integer literal, got $other")
        }
        NgramGenerate(args(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_freq_topk"),
      info("graft_freq_topk",
        "graft_freq_topk(key, capacity) - mergeable Space-Saving heavy-hitters sketch; " +
        "returns array<struct<key,est,err>> sorted by est desc (exact when capacity >= distinct keys)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_freq_topk(key, capacity)")
        val cap = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"capacity must be an integer literal, got $other")
        }
        graft.functions.FreqSketchAgg(args(0), cap).toAggregateExpression()
      }))
    ext.injectOptimizerRule(_ => SelfCosineIsOne)
    // whole-operator extension: per-group top-k physical planning
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

/** Optimizer rule: strength-reduce `graft_cosine(x, x)` to the
  * single-pass [[graft.functions.SelfCosine]] kernel — the pattern
  * shows up when generated similarity matrices include the diagonal.
  * NOT folded to a literal 1.0 (ADVICE r2): the two-argument kernel
  * returns NaN for an all-zero vector, throws on null elements, and
  * is an ulp off 1.0 when sqrt(‖x‖²)² ≠ ‖x‖²; `SelfCosine`
  * reproduces all of that bit-for-bit, so the rewrite is
  * semantics-preserving for every input, degenerate or not. */
object SelfCosineIsOne extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
        graft.functions.SelfCosine(a)
    }
}
