package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimExpr, LshBucketExpr, ParseAnyTimestamp, ShingleMinhashExpr, SimHashExpr, TextProfileExpr, TokenHashesExpr}

/** The engine's native Catalyst expressions as SQL functions, so plain
  * `spark.sql` (or any SQL client on the cluster) can call them —
  * `SELECT simhash(token_hashes(text), 24) FROM docs`. Two entry
  * points:
  *
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (standard SparkSessionExtensions injection at session build);
  *  - runtime: `GraftSqlFunctions.register(spark)` on a live session.
  *
  * All seven are real codegen'd expressions (no UDFs), the same ones
  * the gated queries run — SQL callers get the identical hot path.
  */
object GraftSqlFunctions {

  private def intArg(args: Seq[Expression], i: Int, fn: String): Int = {
    val e = args(i)
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: argument ${i + 1} must be an integer literal")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }
  }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    if (args.size != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.size}")

  /** (name, builder) for every exposed function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "token_hashes" -> { args =>
      arity(args, 1, "token_hashes"); TokenHashesExpr(args.head)
    },
    "shingle_minhash" -> { args =>
      arity(args, 3, "shingle_minhash")
      ShingleMinhashExpr(args.head,
        intArg(args, 1, "shingle_minhash"), intArg(args, 2, "shingle_minhash"))
    },
    "simhash" -> { args =>
      arity(args, 2, "simhash"); SimHashExpr(args.head, intArg(args, 1, "simhash"))
    },
    "cosine_sim" -> { args =>
      arity(args, 2, "cosine_sim"); CosineSimExpr(args.head, args(1))
    },
    "lsh_bucket" -> { args =>
      arity(args, 3, "lsh_bucket")
      LshBucketExpr(args.head, intArg(args, 1, "lsh_bucket"), intArg(args, 2, "lsh_bucket"))
    },
    "text_profile" -> { args =>
      arity(args, 1, "text_profile"); TextProfileExpr(args.head)
    },
    "parse_any_ts" -> { args =>
      arity(args, 1, "parse_any_ts"); ParseAnyTimestamp(args.head)
    },
    // Bloom sketch pair (graft.core.Bloom): `bloom_agg(v[, items])`
    // aggregates values (xxhash64-reduced) into a serialized sketch;
    // probe with `bloom_might_contain((SELECT bloom_agg(v) FROM b), v)`
    // — the SQL subquery is the scalar-subquery form the probe
    // expression requires. Returns an AggregateFunction; the analyzer
    // wraps it like any built-in aggregate.
    "bloom_agg" -> { args =>
      if (args.isEmpty || args.size > 2)
        throw new IllegalArgumentException("bloom_agg expects 1-2 arguments")
      val items =
        if (args.size == 2) intArg(args, 1, "bloom_agg").toLong else 1000000L
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args.head)),
        org.apache.spark.sql.catalyst.expressions.Literal(items),
        org.apache.spark.sql.catalyst.expressions.Literal(
          graft.core.Bloom.numBits(items, 0.01)))
    },
    "bloom_might_contain" -> { args =>
      arity(args, 2, "bloom_might_contain")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args.head,
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))
    },
    "normalize_text" -> { args =>
      arity(args, 1, "normalize_text")
      graft.functions.TextNormalizeExpr(args.head)
    },
    "compress_ratio" -> { args =>
      arity(args, 1, "compress_ratio")
      graft.functions.CompressRatioExpr(args.head)
    },
    // Count-min sketch pair (graft.core.Cms): `cms_agg(v)` aggregates
    // frequencies into a serialized grid; probe with
    // `cms_estimate((SELECT cms_agg(v) FROM t), v)` — the subquery is
    // the scalar-subquery form the probe expression requires.
    "cms_agg" -> { args =>
      arity(args, 1, "cms_agg")
      new org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg(
        args.head,
        org.apache.spark.sql.catalyst.expressions.Literal(0.001d),
        org.apache.spark.sql.catalyst.expressions.Literal(0.99d),
        org.apache.spark.sql.catalyst.expressions.Literal(42))
    },
    "cms_estimate" -> { args =>
      arity(args, 2, "cms_estimate")
      graft.core.CmsEstimate(args.head, args(1))
    }
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftSqlFunctions", name)

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name), builder)
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — injects the function
  * set at session build time on every session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftSqlFunctions", name), builder))
    }
}
