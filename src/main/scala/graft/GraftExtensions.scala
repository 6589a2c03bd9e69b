package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.bridge

import graft.functions.{BoundedTopK, IndelRatio, KmvMerge, KmvSketch, MgCandidates, MinHashSig, Mix64, SimHash64, SortedIntersectCount}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL. Use either at build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  *   (or spark.sql.extensions=graft.GraftExtensions via spark-submit)
  *
  * — or on an existing session with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "indel_ratio" -> { args => IndelRatio(args(0), args(1)) },
    "minhash_sig" -> { args =>
      args.length match {
        case 1 => MinHashSig(args.head, 32, 5)
        case 3 => MinHashSig(args.head, intArg(args(1), "numPerms"),
          intArg(args(2), "k"))
        case n => throw new IllegalArgumentException(
          s"minhash_sig takes 1 or 3 arguments, got $n")
      }
    },
    "simhash64" -> { args => SimHash64(args.head) },
    "sorted_intersect_count" -> { args => SortedIntersectCount(args(0), args(1)) },
    "bounded_topk" -> { args =>
      BoundedTopK(args(0), args(1), intArg(args(2), "k")).toAggregateExpression()
    },
    "kmv_min" -> { args =>
      KmvSketch(args(0), intArg(args(1), "k")).toAggregateExpression()
    },
    "kmv_merge" -> { args =>
      KmvMerge(args(0), intArg(args(1), "k")).toAggregateExpression()
    },
    "mix64" -> { args => Mix64(args.head) },
    "mg_candidates" -> { args =>
      MgCandidates(args(0), intArg(args(1), "capacity")).toAggregateExpression()
    })

  /** Register all functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => bridge.registerFunction(spark, name, b) }
}
