package graft

import org.apache.spark.sql.SparkSession

import graft.expressions.{CosineSim, HammingDist, JaccardSim, JaroWinkler, MinhashSig, OverlapSim, SimHashBits, Tokenize, WinnowFingerprints, WordShingles, ZOrderKey}

/** SQL-surface registration: exposes the native expressions to
  * `spark.sql(...)` users, so the engine's text primitives are usable
  * from pure SQL exactly like built-ins (`SELECT word_shingles(text, 3)
  * FROM docs`). Idempotent per session. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("tokenize",
      exprs => Tokenize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinhashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("simhash_bits",
      exprs => SimHashBits(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist",
      exprs => HammingDist(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("jaccard_sim",
      exprs => JaccardSim(exprs.head, exprs(1),
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].intValue()
        else 3), "built-in")
    reg.createOrReplaceTempFunction("overlap_sim",
      exprs => OverlapSim(exprs.head, exprs(1),
        if (exprs.length > 2) exprs(2).eval().asInstanceOf[Number].intValue()
        else 3), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler",
      exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("zorder_key",
      exprs => ZOrderKey(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      exprs => WinnowFingerprints(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}
