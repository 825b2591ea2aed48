package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, HeavyHitters, NormalizeUnicode, SlidingMedian}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so they are callable from SQL (`SELECT graft_dot(a, b)`)
  * in any session built with
  * `spark.sql.extensions=graft.GraftExtensions`, plus the planner
  * strategy that executes all-sliding-median Window nodes with the
  * streaming O(n log w) operator
  * (graft.plans.SlidingMedianWindowExec). The extension is REQUIRED
  * for the DataFrame API path too: Similarity.dot and
  * SeriesWindows.rollingMedian resolve through the session function
  * registry (`call_function`), so those APIs fail analysis in a
  * session built without this extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.SlidingMedianStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sliding_median"),
      new ExpressionInfo(classOf[SlidingMedian].getName, "graft_sliding_median"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sliding_median takes (value, min_periods)")
        require(children(1).foldable,
          "graft_sliding_median min_periods must be a literal")
        SlidingMedian(children(0),
          children(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeUnicode].getName, "graft_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_normalize takes (text, form) with form a literal")
        require(children(1).foldable,
          "graft_normalize form must be a literal string")
        val form = children(1).eval()
        require(form != null,
          "graft_normalize form must be one of NFC|NFD|NFKC|NFKD, got NULL")
        // membership is validated HERE (and re-checked by the case
        // class's own require), not deferred to checkInputDataTypes:
        // doGenCode interpolates the form into generated Java source,
        // so no constructed instance may ever hold an invalid form
        require(NormalizeUnicode.Forms.contains(form.toString),
          s"graft_normalize form must be one of NFC|NFD|NFKC|NFKD, got '$form'")
        NormalizeUnicode(children(0), form.toString)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_heavy_hitters takes (item, capacity)")
        require(children(1).foldable,
          "graft_heavy_hitters capacity must be a literal")
        HeavyHitters(children(0),
          children(1).eval().asInstanceOf[Number].intValue())
      }))
  }
}
