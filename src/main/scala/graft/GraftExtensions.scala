package graft

import graft.llm.{FeatureHashCountsExpr, HashConstants, MinHashSigExpr, NfcNormalizeExpr, NfkcNormalizeExpr, NgramFoldHashesExpr, PolyHashShingles, PolyHashString, PolyHashTokens, PolyHashTokensNonEmpty, SimHashPackExpr, TextClassStatsExpr, WinnowMinsExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL-surface registration of the engine's custom Catalyst
  * expressions, both as a `SparkSessionExtensions` class
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`) and as a direct
  * registry call for an existing session.
  *
  *   SELECT graft_shingle_hashes(text, 5), graft_fingerprint(text)
  *   FROM documents
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, default: Int): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      if (v < Int.MinValue || v > Int.MaxValue)
        throw new IllegalArgumentException(
          s"integer argument out of range: $v")
      v.toInt
    case _ => default
  }

  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_hashes" -> { args =>
      val n = if (args.length > 1)
        intArg(args(1), HashConstants.shingleSize)
      else HashConstants.shingleSize
      PolyHashShingles(args.head, n)
    },
    "graft_token_hashes" -> (args => PolyHashTokens(args.head)),
    "graft_fingerprint" -> (args => PolyHashString(args.head)),
    // text-in convenience forms, composed exactly like the batch
    // operators: minhash over shingle hashes, simhash over token
    // hashes
    "graft_minhash" -> (args =>
      MinHashSigExpr(
        PolyHashShingles(args.head, HashConstants.shingleSize))),
    "graft_simhash" -> (args =>
      SimHashPackExpr(PolyHashTokens(args.head))),
    "graft_text_stats" -> (args => TextClassStatsExpr(args.head)),
    // bucketed token-hash counts (the feature-hashing featurizer's
    // counting pass) over an array<bigint> of hashes; dim optional
    "graft_feature_hash" -> { args =>
      val dim = if (args.length > 1) intArg(args(1), 32) else 32
      FeatureHashCountsExpr(args.head, dim)
    },
    // non-empty ' '-split token hashes (the content-token form —
    // lowercase upstream with lower())
    "graft_content_token_hashes" -> (args =>
      PolyHashTokensNonEmpty(args.head)),
    // winnowing fingerprints over an array<bigint> of shingle
    // hashes; window optional (default 5)
    "graft_winnow_mins" -> { args =>
      val w = if (args.length > 1) intArg(args(1), 5) else 5
      WinnowMinsExpr(args.head, w)
    },
    // word n-gram fold hashes over an array<bigint> of token hashes;
    // n optional (default 8, the decontamination gram)
    "graft_ngram_hashes" -> { args =>
      val n = if (args.length > 1) intArg(args(1), 8) else 8
      NgramFoldHashesExpr(args.head, n)
    },
    "graft_nfc" -> (args => NfcNormalizeExpr(args.head)),
    "graft_nfkc" -> (args => NfkcNormalizeExpr(args.head)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
