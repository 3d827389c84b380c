package graft.query

/**
 * FT.AGGREGATE pipeline model + command-argument parser (reference:
 * docs/commands/ft.aggregate.md:16-30; parser
 * src/commands/ft_aggregate_parser.cc; stage execution semantics
 * src/commands/ft_aggregate_exec.cc).
 *
 * Stages run strictly in command order over the working record set
 * (ft_aggregate.cc:348-363 ExecuteAggregationStages).
 */
sealed trait AggStage
object AggStage {
  /** LOAD * | LOAD n @field [AS alias]... — project key content into the
    * record (ft_aggregate.cc:48-92; `@__key` loads the doc key). */
  final case class Load(fields: Seq[(String, Option[String])], all: Boolean = false) extends AggStage
  /** APPLY expr AS name — row-wise computed column, may overwrite
    * (ft_aggregate_exec.cc:102-110). */
  final case class Apply(expr: Expr, name: String) extends AggStage
  /** FILTER expr — keep records where IsTrue(expr)
    * (ft_aggregate_exec.cc:112-128). */
  final case class Filter(expr: Expr) extends AggStage
  /** GROUPBY n @field... REDUCE fn m arg... [AS name]...
    * (ft_aggregate_exec.cc:180-236). */
  final case class GroupBy(keys: Seq[String], reducers: Seq[Reducer]) extends AggStage
  /** SORTBY n (@key ASC|DESC)... [MAX m] — MAX default 10 when the
    * clause is present bare (ft_aggregate_parser.h:291). */
  final case class SortBy(keys: Seq[(Expr, Boolean)], max: Option[Int]) extends AggStage
  /** LIMIT offset count (ft_aggregate_exec.cc:80-93). */
  final case class Limit(offset: Int, count: Int) extends AggStage
}

/** One REDUCE clause. Supported fns (ft_aggregate_exec.cc:406-414):
  * COUNT, COUNT_DISTINCT, SUM, MIN, MAX, AVG, STDDEV. */
final case class Reducer(fn: String, args: Seq[Expr], as: Option[String]) {
  /** Output record field name; mirrors Redisearch's `__generated_alias`
    * convention when AS is absent. */
  def name: String = as.getOrElse {
    val argStr = args.map {
      case Expr.FieldRef(f) => f
      case other => other.toString
    }.mkString(",")
    s"__generated_alias${fn.toLowerCase}$argStr"
  }
}

object AggregateParser {
  import AggStage._

  private final class Args(tokens: Seq[String]) {
    private var i = 0
    def hasNext: Boolean = i < tokens.length
    def peek: String = tokens(i)
    def next(): String = { val t = tokens(i); i += 1; t }
    def nextInt(what: String): Int =
      try next().toInt
      catch { case _: NumberFormatException =>
        throw new ExprParseException(s"$what expects an integer") }
    def field(): String = {
      val t = next()
      if (!t.startsWith("@")) throw new ExprParseException(s"Expected @field, got '$t'")
      t.drop(1)
    }
  }

  /**
   * Parse the stage list of an FT.AGGREGATE command (everything after
   * `FT.AGGREGATE index query`), already split into tokens the way the
   * RESP protocol delivers argv.
   */
  def parse(tokens: Seq[String]): Seq[AggStage] = {
    val a = new Args(tokens)
    val stages = Seq.newBuilder[AggStage]
    while (a.hasNext) {
      a.next().toUpperCase match {
        case "LOAD" =>
          val spec = a.next()
          if (spec == "*") stages += Load(Nil, all = true)
          else {
            val n = spec.toIntOption.getOrElse(
              throw new ExprParseException("LOAD expects a count or *"))
            val fields = Seq.newBuilder[(String, Option[String])]
            var consumed = 0
            while (consumed < n) {
              // the reference's LOAD parser strips an OPTIONAL leading @
              // (ft_aggregate_parser.cc:52-64: bare identifiers like
              // `LOAD 1 __key` are valid; "" and "@" error)
              val t = a.next()
              if (t.isEmpty || t == "@")
                throw new ExprParseException("Empty argument in LOAD clause not allowed")
              val f = if (t.startsWith("@")) t.drop(1) else t
              consumed += 1
              if (a.hasNext && a.peek.equalsIgnoreCase("AS")) {
                a.next(); fields += ((f, Some(a.next()))); consumed += 2
              } else fields += ((f, None))
            }
            stages += Load(fields.result())
          }
        case "APPLY" =>
          val expr = ExprParser.parse(a.next())
          if (!a.next().equalsIgnoreCase("AS"))
            throw new ExprParseException("APPLY requires AS name")
          stages += Apply(expr, a.next())
        case "FILTER" =>
          stages += Filter(ExprParser.parse(a.next()))
        case "GROUPBY" =>
          val n = a.nextInt("GROUPBY")
          val keys = (0 until n).map(_ => a.field())
          val reducers = Seq.newBuilder[Reducer]
          while (a.hasNext && a.peek.equalsIgnoreCase("REDUCE")) {
            a.next()
            val fn = a.next().toUpperCase
            val m = a.nextInt("REDUCE")
            val args = (0 until m).map(_ => ExprParser.parse(a.next()))
            val as = if (a.hasNext && a.peek.equalsIgnoreCase("AS")) {
              a.next(); Some(a.next())
            } else None
            reducers += Reducer(fn, args, as)
          }
          stages += GroupBy(keys, reducers.result())
        case "SORTBY" =>
          val n = a.nextInt("SORTBY")
          val keys = Seq.newBuilder[(Expr, Boolean)]
          var consumed = 0
          while (consumed < n) {
            val e = ExprParser.parse(a.next()); consumed += 1
            var asc = true
            if (a.hasNext && (a.peek.equalsIgnoreCase("ASC") || a.peek.equalsIgnoreCase("DESC"))) {
              asc = a.next().equalsIgnoreCase("ASC"); consumed += 1
            }
            keys += ((e, asc))
          }
          // MAX defaults to 10 and ALWAYS truncates — the reference's
          // SortBy stage keeps a max_-bounded heap whether or not MAX
          // was written (ft_aggregate_parser.h:291 max_{10},
          // ft_aggregate_exec.cc:155-161; compat corpus
          // test_aggregate_sortby pins the 10-row default)
          val max = if (a.hasNext && a.peek.equalsIgnoreCase("MAX")) {
            a.next(); Some(a.nextInt("MAX"))
          } else Some(10)
          stages += SortBy(keys.result(), max)
        case "LIMIT" =>
          val off = a.nextInt("LIMIT"); stages += Limit(off, a.nextInt("LIMIT"))
        case other =>
          throw new ExprParseException(s"Unknown aggregate stage: $other")
      }
    }
    stages.result()
  }
}
