package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension hook: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) registers the
  * engine's native functions into the Catalyst function registry, so SQL
  * text and `expr()` strings can call them alongside the builtins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(QuantizedDot.descriptor)
    ext.injectFunction(JaccardSim.descriptor)
    ext.injectFunction(NfcNormalize.descriptor)
    ext.injectFunction(AlphaSpaceCount.descriptor)
  }
}

object GraftExtensions {

  /** Idempotent runtime registration for sessions the caller doesn't
    * build (the driver owns the Verify/Bench sessions): drops the same
    * descriptors into an existing session's function registry.
    */
  def register(spark: SparkSession): Unit = {
    Seq(QuantizedDot.descriptor, JaccardSim.descriptor,
        NfcNormalize.descriptor, AlphaSpaceCount.descriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
