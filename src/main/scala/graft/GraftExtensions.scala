package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans._

/** Standard Spark library entry point: wire every graft native expression,
  * aggregate, and optimizer rule into a session at build time via
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`). This is
  * the deployment path for clusters where user code never touches the
  * builder — e.g. a shared Thrift/Connect server — and makes every kernel
  * callable from PLAIN SQL (`SELECT graft_simhash_long(text) FROM docs`),
  * not just the Column API. The Column-API helpers (GraftFunctions.dotLong
  * etc.) self-register lazily into the active session and remain the
  * zero-config path for notebook/library use; both routes register the same
  * (name -> builder) pairs idempotently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_],
                 builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanosPredicatePushdown)

    ext.injectFunction(fn(GraftFunctions.DotLongName, classOf[DotProductLong],
      c => DotProductLong(c(0), c(1))))
    ext.injectFunction(fn(GraftFunctions.MisraGriesName, classOf[MisraGriesSketch],
      MisraGriesSketch.fromChildren))
    ext.injectFunction(fn(KmvSketch.Name, classOf[KmvSketch],
      KmvSketch.fromChildren))
    ext.injectFunction(fn(CountMinSketch.Name, classOf[CountMinSketch],
      CountMinSketch.fromChildren))
    ext.injectFunction(fn(GraftFunctions.LshBucketsName, classOf[LshBucketsLong],
      c => LshBucketsLong(c(0), c(1), c(2))))
    ext.injectFunction(fn(GraftFunctions.PqAdcName, classOf[PqAdcLong],
      c => PqAdcLong(c(0), c(1))))
    ext.injectFunction(fn(GraftFunctions.PqAdcDirectName, classOf[PqAdcDirectLong],
      c => PqAdcDirectLong(c(0), c(1), c(2))))
    ext.injectFunction(fn(GraftFunctions.PqEncodeName, classOf[PqEncodeLong],
      c => PqEncodeLong(c(0), c(1))))
    ext.injectFunction(fn(LnFpFunctions.LnMicroName, classOf[LnMicroLong],
      c => LnMicroLong(c(0), c(1))))
    ext.injectFunction(fn(LnFpFunctions.GumbelMicroName, classOf[GumbelMicroLong],
      c => GumbelMicroLong(c(0))))
    ext.injectFunction(fn(Md5PrefixLong.Name, classOf[Md5PrefixLong],
      c => c(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          Md5PrefixLong(c(0), n)
        case other => throw new IllegalArgumentException(
          s"${Md5PrefixLong.Name}: nBytes must be a literal int, got $other")
      }))
    ext.injectFunction(fn(SimhashLong.Name, classOf[SimhashLong],
      c => SimhashLong(c.head)))
    ext.injectFunction(fn(MinhashSigLong.Name, classOf[MinhashSigLong],
      c => MinhashSigLong(c(0), c(1))))
    ext.injectFunction(fn(VectorSumLong.Name, classOf[VectorSumLong],
      c => VectorSumLong(c.head)))
    ext.injectFunction(fn(WinnowLong.Name, classOf[WinnowLong],
      c => (c(1), c(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _),
              org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
          WinnowLong(c(0), k, w)
        case other => throw new IllegalArgumentException(
          s"${WinnowLong.Name} (k, w) arguments must be literal ints, got $other")
      }))
    ext.injectFunction(fn(AhoCorasickCount.Name, classOf[AhoCorasickCount],
      AhoCorasickCount.fromChildren))
    ext.injectFunction(fn(SubwordCount.Name, classOf[SubwordCount],
      c => {
        require(c(1).foldable, s"${SubwordCount.Name} vocab must be a literal array")
        val vocab = c(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
        SubwordCount(c(0), vocab)
      }))
  }
}
