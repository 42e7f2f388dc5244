package graft.graphql

import graft.core.{PrimValue, TrueValue}
import graft.graphql.Ast._

/** GraphQL introspection — `resolve_type_system` /
  * `resolve_type_definition` / `resolve_type` /
  * `resolve_field_definition` (`graphql.rs:444-562`).
  *
  * Shape preserved exactly: `__schema` answers types / queryType /
  * mutationType / null subscriptionType / empty directives; type
  * definitions carry kind OBJECT|SCALAR, null ofType, empty
  * interfaces/enumValues/possibleTypes/inputFields; wrapper types
  * (NON_NULL/LIST) nest via ofType with null name; field definitions
  * carry args (description/defaultValue null), isDeprecated false.
  * Insertion order of the fields matches the reference so serialized
  * output is comparable.
  */
object Introspection {

  private def str(s: String): GValue =
    GScalar(TrueValue.Prim(PrimValue.StrVal(s)))
  private def nul: GValue = GScalar(TrueValue.Null)
  private def emptyArr: GValue = GScalar(TrueValue.Arr(Vector.empty))

  /** The `__schema` record (`graphql.rs:318-327`). */
  def schemaRecord(schema: Schema): GData = GData(Vector(
    "types" -> typeSystem(schema),
    "queryType" -> GObj(typeDefinition(Named("Query"), schema).get),
    "mutationType" -> GObj(typeDefinition(Named("Mutation"), schema).get),
    // non-null since the Subscription capability extension (the
    // reference reports null here because it never executes them)
    "subscriptionType" -> typeDefinition(Named("Subscription"), schema)
      .map(GObj(_): GValue).getOrElse(nul),
    "directives" -> emptyArr))

  private def typeSystem(schema: Schema): GValue =
    GObjs(schema.types.flatMap(t => typeDefinition(Named(t.name), schema)))

  /** `resolve_type_definition`: full Data for a named type; None for
    * `__`-prefixed or unknown names. */
  def typeDefinition(ty: Named, schema: Schema): Option[GData] = {
    if (ty.name.startsWith("__")) return None
    schema.get(ty.name).map { tdef =>
      val head = Vector[(String, GValue)]("name" -> str(ty.name))
      val kindFields = tdef match {
        case ObjectDef(_, fields) => Vector[(String, GValue)](
          "kind" -> str("OBJECT"),
          "description" -> nul,
          "fields" -> GObjs(fields.map(fieldDefinition(_, schema))))
        case ScalarDef(_) => Vector[(String, GValue)](
          "kind" -> str("SCALAR"),
          "description" -> nul,
          "fields" -> nul)
      }
      GData(head ++ kindFields ++ Vector[(String, GValue)](
        "ofType" -> nul,
        "interfaces" -> emptyArr,
        "enumValues" -> emptyArr,
        "possibleTypes" -> emptyArr,
        "inputFields" -> emptyArr))
    }
  }

  /** `resolve_type`: wrapper chain resolution (LIST / NON_NULL). */
  def resolveType(ty: GqlType, schema: Schema): GValue = ty match {
    case n: Named =>
      typeDefinition(n, schema).map(GObj(_): GValue).getOrElse(nul)
    case wrapper =>
      val base = Vector[(String, GValue)](
        "name" -> nul,
        "description" -> nul,
        "fields" -> emptyArr,
        "interfaces" -> emptyArr,
        "possibleTypes" -> emptyArr,
        "enumValues" -> emptyArr,
        "inputFields" -> emptyArr)
      val (kind, of): (String, GqlType) = wrapper match {
        case ListT(inner) => ("LIST", inner)
        case NonNull(inner) => ("NON_NULL", inner)
        case n: Named => throw new MatchError(n) // unreachable
      }
      GObj(GData(base ++ Vector[(String, GValue)](
        "kind" -> str(kind),
        "ofType" -> resolveType(of, schema))))
  }

  /** `resolve_field_definition` → `__Field`. */
  def fieldDefinition(f: FieldDef, schema: Schema): GData = {
    val args = f.args.map { a =>
      GData(Vector[(String, GValue)](
        "name" -> str(a.name),
        "type" -> resolveType(a.ty, schema),
        "description" -> nul,
        "defaultValue" -> nul))
    }
    GData(Vector[(String, GValue)](
      "name" -> str(f.name),
      "description" -> nul,
      "args" -> GObjs(args),
      "type" -> resolveType(f.ty, schema),
      "isDeprecated" -> GScalar(TrueValue.Prim(PrimValue.BoolVal(false))),
      "deprecationReason" -> nul))
  }
}
