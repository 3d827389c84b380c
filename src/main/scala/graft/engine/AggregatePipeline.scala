package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.compile.{ExprCompiler, TypedCol, VTag}
import graft.model._
import graft.query.{AggStage, Expr, ExprParseException, Reducer}

/**
 * FT.AGGREGATE stage executor (reference:
 * src/commands/ft_aggregate_exec.cc; stages run strictly in command
 * order, ft_aggregate.cc:348-363).
 *
 * The reference pushes a `RecordSet` deque through single-threaded
 * stage objects; here each stage is one DataFrame transformation, so
 * the whole pipeline compiles into a single Catalyst plan —
 * partial aggregation, top-k (SORTBY MAX → TakeOrderedAndProject) and
 * whole-stage codegen come for free, and the plan distributes over any
 * number of partitions where the reference is bound to one thread.
 *
 * Record model: the working DataFrame carries BOTH the visible record
 * fields and (until GROUPBY) the underlying document columns, so APPLY/
 * FILTER/GROUPBY can reference schema attributes that were never
 * LOADed. `visible` tracks the record fields in insertion order — the
 * final projection, mirroring the reference's name→index symbol table
 * (ft_aggregate.cc:95-128).
 */
private[engine] final class AggregatePipeline(
    schema: IndexSchema,
    params: Map[String, String],
    emulate: ValkeyVersion = ValkeyVersion.Module) {

  import AggStage._

  /** Record fields in insertion order: alias → static type tag. */
  private val visible = scala.collection.mutable.LinkedHashMap.empty[String, VTag]
  private var grouped = false // post-GROUPBY, doc columns are gone

  private def fieldTag(fd: FieldDef): VTag = fd.ftype match {
    case NumericField => VTag.Num
    case _: TagField | _: TextField => VTag.Str
    case _: VectorField =>
      throw new ExprParseException(
        s"Vector field ${fd.alias} cannot be used in aggregations") // A1, ft_aggregate.cc:73
  }

  /** @name resolution: record field first, then (pre-GROUPBY) any
    * schema attribute straight off the document columns. */
  private def resolve(name: String): Option[TypedCol] =
    visible.get(name).map(t => TypedCol(col(name), t)).orElse {
      if (grouped) None
      else if (name == schema.keyColumn || name == "__key")
        Some(TypedCol(col(schema.keyColumn), VTag.Str))
      else schema.field(name).map(fd => TypedCol(col(fd.alias), fieldTag(fd)))
    }

  private def compiler =
    new ExprCompiler(resolve, params, emulate, Metrics.legacyUsed)

  def run(initial: DataFrame, scoreField: Option[String], stages: Seq[AggStage]): DataFrame = {
    var df = initial
    // Implicit stage-0 record: the KNN score when present — and ONLY
    // that. `__key` enters the record exclusively through an explicit
    // `LOAD ... __key` (reference load_key, ft_aggregate.cc:228-287:
    // "Skip loading of the score and the key, we always get those" —
    // they ride the Neighbor, but the reply record carries them only
    // when requested; compat corpus test_aggregate_load pins it).
    scoreField.foreach(s => visible(s) = VTag.Num)

    stages.foreach {
      case Load(_, true) =>
        // LOAD * = every STORED document attribute (the reference
        // fetches the whole hash: unindexed fields and vector contents
        // included; __key still stays out — corpus `load *` goldens).
        // ON JSON the whole document IS one attribute: the serialized
        // doc under `$` (JSON corpus `load *` goldens carry only the
        // `$` record — FetchAllRecords on the root element,
        // attribute_data_type.cc JsonAttributeDataType).
        if (schema.onJson)
          visible.getOrElseUpdate(graft.model.IndexSchema.DocColumn, VTag.Str)
        else df.columns
          .filterNot(c => c.startsWith("__") || c == schema.keyColumn)
          .foreach { cName =>
            val tag = schema.field(cName).map(_.ftype) match {
              case Some(NumericField) => VTag.Num
              case _ => VTag.Str // tags/text/unindexed/vector contents
            }
            visible.getOrElseUpdate(cName, tag)
          }
      case Load(fields, _) =>
        fields.foreach { case (f, as) =>
          if (schema.field(f).exists(_.ftype.isInstanceOf[VectorField]))
            // ft_aggregate.cc:70-73 — explicit vector LOAD is an error
            // (LOAD * above is the one way vector contents surface)
            throw new ExprParseException(
              s"Loading of vector fields is not supported (field `$f`)")
          val src = resolve(f).getOrElse(
            throw new ExprParseException(s"LOAD: unknown field @$f"))
          val name = as.getOrElse(f)
          if (!visible.contains(name) || as.isDefined) {
            df = df.withColumn(name, src.c)
            visible(name) = src.tag
          }
        }
      case Apply(expr, name) =>
        val c = compiler
        val t = c.compile(expr)
        // Surface Bool as numeric 0/1 (search-expressions.md:103).
        val (surfaced, tag) = t.tag match {
          case VTag.Bool => (t.c.cast(DoubleType), VTag.Num)
          case other => (t.c, other)
        }
        df = df.withColumn(name, surfaced)
        visible(name) = tag // may overwrite — never changes cardinality
      case Filter(expr) =>
        df = df.filter(compiler.compileToPredicate(expr))
      case GroupBy(keys, reducers) =>
        val c = compiler
        val keyCols = keys.map { k =>
          val t = resolve(k).getOrElse(
            throw new ExprParseException(s"GROUPBY: unknown field @$k"))
          (k, t)
        }
        // Materialize group keys under their record names first, so key
        // columns referencing doc columns survive the aggregation.
        keyCols.foreach { case (k, t) => df = df.withColumn(k, t.c) }
        val aggCols = reducers.map(r => reducerColumn(r, c))
        val rTags = reducers.map(r => r.name -> reducerTag(r)) // before visible resets
        df =
          if (aggCols.isEmpty) df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__dummy")).drop("__dummy")
          else df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        visible.clear()
        keyCols.foreach { case (k, t) => visible(k) = t.tag }
        rTags.foreach { case (n, t) => visible(n) = t }
        grouped = true
      case SortBy(keys, max) =>
        val c = compiler
        val sortCols = keys.map { case (e, asc) =>
          val t = c.compile(e)
          // UNORDERED (Nil) keys sort as equal in the reference
          // (ft_aggregate_exec.cc:139-141); nulls-last is our total order.
          if (asc) t.c.asc_nulls_last else t.c.desc_nulls_last
        }
        df = df.orderBy(sortCols: _*)
        max.foreach(m => df = df.limit(m)) // plans as TakeOrderedAndProject
      case Limit(offset, count) =>
        df = (if (offset > 0) df.offset(offset) else df).limit(count)
    }
    df.select(visible.keys.toSeq.map(col): _*)
  }

  /** Reducer table (ft_aggregate_exec.cc:406-414, semantics :238-342). */
  private def reducerColumn(r: Reducer, c: ExprCompiler): Column = {
    def arg: TypedCol = c.compile(r.args.headOption.getOrElse(
      throw new ExprParseException(s"${r.fn} requires an argument")))
    val out = r.fn match {
      case "COUNT" => count(lit(1)).cast(DoubleType)
      case "COUNT_DISTINCT" => // exact; Nil skipped (:332-342)
        count_distinct(c.surface(arg)).cast(DoubleType)
      case "SUM" => // non-numeric skipped; empty → 0 (:287-293)
        coalesce(sum(c.toNum(arg)), lit(0.0))
      case "AVG" => // empty → 0, not NULL (:295-307)
        coalesce(avg(c.toNum(arg)), lit(0.0))
      case "MIN" => min(c.surface(arg)) // Nil skipped; may be a string (:244-261)
      case "MAX" => max(c.surface(arg))
      case "STDDEV" => // sample stddev; n ≤ 1 → 0 (:309-327)
        coalesce(stddev_samp(c.toNum(arg)), lit(0.0))
      case other => throw new ExprParseException(s"Unknown reducer: $other")
    }
    out.as(r.name)
  }

  private def reducerTag(r: Reducer): VTag = r.fn match {
    case "MIN" | "MAX" =>
      r.args.headOption.map {
        case Expr.FieldRef(f) => resolve(f).map(_.tag).getOrElse(VTag.Num)
        case _ => VTag.Num
      }.getOrElse(VTag.Num)
    case _ => VTag.Num
  }
}
