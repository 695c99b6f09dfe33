package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{BpeEncodeExpression, CountInSetExpression,
  Crc32QExpression, DeflateSizeExpression, DotProductExpression,
  JaroWinklerExpression, MinhashAggExpression, SimhashAggExpression,
  TokenSetCountExpression}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use.
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT crc32q(token) FROM batch")
  * spark.sql("SELECT deflate_size(text) * 1000 DIV octet_length(text) ...")
  * spark.sql("SELECT bpe_encode(text, 'l o', 'lo w') FROM docs")
  * spark.sql("SELECT dot_product(a.vec, b.vec) FROM ...")
  * spark.sql("SELECT jaro_winkler(x.name, y.name) FROM ...")
  * spark.sql("SELECT id, minhash_agg(shingle, 64) FROM inv GROUP BY id")
  * spark.sql("SELECT id, simhash_agg(xxhash64(w)) FROM toks GROUP BY id")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(e: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression, clazz: Class[_]): Unit =
    e.injectFunction((new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder))

  private def arity(name: String, n: Int)(children: Seq[Expression]): Unit =
    require(children.size == n,
      s"$name expects exactly $n argument(s), got ${children.size}")

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: point-in-interval theta joins → binned equi-joins
    // (OFF unless spark.graft.rangeJoin.binWidth is set; see
    // [[graft.plans.RangeJoinBinning]])
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)

    register(e, "crc32q", { children =>
      arity("crc32q", 1)(children)
      Crc32QExpression(children.head)
    }, classOf[Crc32QExpression])

    register(e, "deflate_size", { children =>
      arity("deflate_size", 1)(children)
      DeflateSizeExpression(children.head)
    }, classOf[DeflateSizeExpression])

    // bpe_encode(text, 'x y', 'xy z', ...): trailing literals are the
    // rank-ordered merge pairs ("left right")
    register(e, "bpe_encode", { children =>
      require(children.size >= 1,
        s"bpe_encode(text, merge, ...) expects at least 1 argument")
      val merges = children.tail.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          val p = s.toString.split(" ")
          require(p.length == 2, s"merge literal must be 'left right': $s")
          (p(0), p(1))
        case other => throw new IllegalArgumentException(
          s"bpe_encode merges must be STRING literals, got $other")
      }
      BpeEncodeExpression(children.head, merges)
    }, classOf[BpeEncodeExpression])

    register(e, "dot_product", { children =>
      arity("dot_product", 2)(children)
      DotProductExpression(children(0), children(1))
    }, classOf[DotProductExpression])

    register(e, "jaro_winkler", { children =>
      arity("jaro_winkler", 2)(children)
      JaroWinklerExpression(children(0), children(1))
    }, classOf[JaroWinklerExpression])

    register(e, "minhash_agg", { children =>
      require(children.size == 1 || children.size == 2,
        s"minhash_agg(shingle[, k]) expects 1 or 2 arguments, got ${children.size}")
      val k = children.lift(1).map {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"minhash_agg k must be an INT literal (e.g. 64), got $other")
      }.getOrElse(64)
      require(k > 0, s"minhash_agg k must be positive, got $k")
      MinhashAggExpression(children.head, k).toAggregateExpression()
    }, classOf[MinhashAggExpression])

    register(e, "simhash_agg", { children =>
      arity("simhash_agg", 1)(children)
      SimhashAggExpression(children.head).toAggregateExpression()
    }, classOf[SimhashAggExpression])

    // regmax_agg(regs, m): element-wise max of m-long register vectors
    register(e, "regmax_agg", { children =>
      arity("regmax_agg", 2)(children)
      val m = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"regmax_agg m must be an INT literal, got $other")
      }
      graft.functions.RegMaxAggExpression(children.head, m)
        .toAggregateExpression()
    }, classOf[graft.functions.RegMaxAggExpression])

    // topk_agg(struct(v, id), k): top-k (value, id) pairs per group
    register(e, "topk_agg", { children =>
      arity("topk_agg", 2)(children)
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"topk_agg k must be an INT literal, got $other")
      }
      graft.functions.TopKAggExpression(children.head, k)
        .toAggregateExpression()
    }, classOf[graft.functions.TopKAggExpression])

    // word-set arguments arrive as trailing STRING literals:
    //   token_set_count(text, 'the', 'and', 'of')
    //   count_in_set(tokens, 'the', 'and', 'of')
    def wordLits(name: String, children: Seq[Expression]): Seq[String] = {
      require(children.size >= 2,
        s"$name(input, word, ...) expects at least 2 arguments, got ${children.size}")
      children.tail.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$name word arguments must be STRING literals, got $other")
      }
    }
    register(e, "token_set_count", { children =>
      TokenSetCountExpression(children.head,
        wordLits("token_set_count", children))
    }, classOf[TokenSetCountExpression])

    register(e, "count_in_set", { children =>
      CountInSetExpression(children.head,
        wordLits("count_in_set", children))
    }, classOf[CountInSetExpression])
  }
}
