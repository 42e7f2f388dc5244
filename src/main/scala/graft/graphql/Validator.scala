package graft.graphql

import graft.graphql.Ast._

/** Executable-document validation against the generated schema — the
  * role apollo-rs's `document.validate(schema)` plays in the reference
  * (`graphql.rs:280-283`). This is what makes unknown fields/args
  * unreachable before execution. Core rules implemented: field
  * existence, argument existence, required arguments present, scalar
  * argument type compatibility, leaf/composite selection shape,
  * fragment existence + type-condition validity, variable definedness.
  */
object Validator {

  def validate(doc: Document, schema: Schema): Vector[GqlError] = {
    val errs = Vector.newBuilder[GqlError]
    // fragment cycles would make execution non-terminating — reject
    // first (apollo does the same in the reference pipeline)
    findFragmentCycle(doc).foreach { name =>
      errs += GqlError(s"""fragment "$name" spreads itself (cycle)""")
      return errs.result()
    }
    doc.operations.foreach { op =>
      val rootType = op.opType.defaultTypeName
      schema.obj(rootType) match {
        case None =>
          errs += GqlError(s"schema does not support ${rootType.toLowerCase} operations")
        case Some(root) =>
          val declaredVars = op.varDefs.map(_.name).toSet
          validateSet(op.selections, root, schema, doc, declaredVars, errs)
      }
    }
    doc.fragments.values.foreach { frag =>
      // fragments on `__`-meta types (introspection queries) are left
      // to the executor, matching apollo's built-in meta-type awareness
      if (!frag.typeCondition.startsWith("__"))
        schema.obj(frag.typeCondition) match {
          case None => errs += GqlError(
            s"""fragment type condition "${frag.typeCondition}" does not exist""")
          case Some(onType) =>
            validateSet(frag.selections, onType, schema, doc, Set.empty, errs)
        }
    }
    errs.result()
  }

  /** DFS over fragment spreads; Some(name) if any fragment can reach
    * itself. */
  private def findFragmentCycle(doc: Document): Option[String] = {
    def spreads(sels: Vector[Selection]): Vector[String] = sels.flatMap {
      case FragmentSpread(n) => Vector(n)
      case f: FieldSel => spreads(f.selections)
      case InlineFragment(_, s) => spreads(s)
    }
    def reaches(from: String, target: String,
        seen: Set[String]): Boolean =
      doc.fragments.get(from).exists { frag =>
        val next = spreads(frag.selections)
        next.contains(target) ||
          next.exists(n => !seen.contains(n) &&
            reaches(n, target, seen + n))
      }
    doc.fragments.keys.find(n => reaches(n, n, Set(n)))
  }

  private def validateSet(sels: Vector[Selection], onType: ObjectDef,
      schema: Schema, doc: Document, vars: Set[String],
      errs: scala.collection.mutable.Builder[GqlError, Vector[GqlError]])
      : Unit =
    sels.foreach {
      case f: FieldSel if f.name.startsWith("__") =>
        // introspection fields — accept the meta-fields the executor
        // answers (__schema/__type/__typename) and their sub-shapes
        ()
      case f: FieldSel =>
        onType.fields.find(_.name == f.name) match {
          case None =>
            errs += GqlError(
              s"""type "${onType.name}" has no field "${f.name}"""")
          case Some(fd) =>
            // unknown args
            f.args.foreach { case (an, av) =>
              fd.args.find(_.name == an) match {
                case None => errs += GqlError(
                  s"""field "${f.name}" has no argument "$an"""")
                case Some(ad) => checkValue(av, ad.ty, f.name, an, vars, errs)
              }
            }
            // missing required args
            fd.args.filter(a => a.ty.isInstanceOf[NonNull]).foreach { a =>
              if (!f.args.exists(_._1 == a.name))
                errs += GqlError(s"""field "${f.name}" is missing """ +
                  s"""required argument "${a.name}"""")
            }
            // leaf vs composite selection shape
            val inner = fd.ty.innerNamed
            if (schema.isScalar(inner)) {
              if (f.selections.nonEmpty)
                errs += GqlError(s"""field "${f.name}" of scalar type """ +
                  s"""$inner may not have a selection set""")
            } else schema.obj(inner) match {
              case Some(sub) =>
                if (f.selections.isEmpty)
                  errs += GqlError(s"""field "${f.name}" of object type """ +
                    s"""$inner must have a selection set""")
                else validateSet(f.selections, sub, schema, doc, vars, errs)
              case None => () // meta types
            }
        }
      case FragmentSpread(name) =>
        doc.fragments.get(name) match {
          case None =>
            errs += GqlError(s"""fragment "$name" does not exist""")
          case Some(frag) =>
            if (frag.typeCondition != onType.name)
              errs += GqlError(s"""fragment "$name" on type """ +
                s""""${frag.typeCondition}" cannot be spread on type """ +
                s""""${onType.name}"""")
        }
      case InlineFragment(cond, sels2) =>
        cond match {
          case Some(c) if c != onType.name =>
            errs += GqlError(s"""inline fragment on type "$c" cannot be """ +
              s"""spread on type "${onType.name}"""")
          case _ => validateSet(sels2, onType, schema, doc, vars, errs)
        }
    }

  private def checkValue(v: GqlValue, ty: GqlType, field: String,
      arg: String, vars: Set[String],
      errs: scala.collection.mutable.Builder[GqlError, Vector[GqlError]])
      : Unit = v match {
    case VarV(name) =>
      if (!vars.contains(name))
        errs += GqlError(s"""variable "$$$name" is not defined""")
    case NullV =>
      if (ty.isInstanceOf[NonNull])
        errs += GqlError(
          s"""argument "$arg" of field "$field" may not be null""")
    case other =>
      val inner = ty match {
        case NonNull(of) => of
        case t => t
      }
      (inner, other) match {
        case (ListT(elemTy), ListV(items)) =>
          items.foreach(checkValue(_, elemTy, field, arg, vars, errs))
        case (ListT(_), _) => errs += GqlError(
          s"""argument "$arg" of field "$field" expects a list""")
        case (Named("Int"), IntV(_)) => ()
        case (Named("Float"), FloatV(_) | IntV(_)) => ()
        case (Named("String"), StrV(_)) => ()
        case (Named("Boolean"), BoolV(_)) => ()
        case (Named("ID"), StrV(_) | IntV(_)) => ()
        case (Named(n), _) => errs += GqlError(
          s"""argument "$arg" of field "$field" expects type $n""")
        case _ => errs += GqlError(
          s"""argument "$arg" of field "$field" has an invalid value""")
      }
  }
}
