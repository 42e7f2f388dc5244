package graft.graphql

import graft.core._
import graft.graphql.Ast._

/** GraphQL schema generation from the model registry — same shape and
  * ordering rules as the reference (`create_schema`,
  * `graphql.rs:188-258`):
  *
  *  - one object type per model, named by the pascal singular name;
  *  - field order: primary key first, the rest alphabetical;
  *  - `!` on required attributes; arrays are `[T!]` (elements non-null);
  *  - `Query { readOne<Model>(pk: T!): Model! }`;
  *  - `Mutation { deleteOne<Model>(pk!), updateOne<Model>(all attrs,
  *    pk required), addOne<Model>(attrs, required ones `!`) }`, with
  *    deleteOne emitted at the pk position and updateOne/addOne after
  *    each model's field loop — reproducing the reference's emission
  *    order inside Query/Mutation.
  *
  * Capability-parity extension (SURVEY §2.1 "declared-but-
  * unimplemented"): `readMany` — the plural-camel model name with no
  * prefix — IS emitted here (`Query { movies: [Movie!]! }`) and
  * resolved by a full scan, where the reference leaves it `todo!()`
  * and unreachable (`graphql.rs:229,382`).
  */
object SchemaGen {

  /** Built-in scalars, spec order, mirroring apollo-compiler's
    * predefined types. */
  val builtinScalars: Vector[ScalarDef] =
    Vector("Int", "Float", "String", "Boolean", "ID").map(ScalarDef)

  private def gqlType(t: AttrType): GqlType = t match {
    case AttrType.Primitive(p) => Named(p.gqlName)
    case AttrType.ArrayOf(p) => ListT(NonNull(Named(p.gqlName)))
  }

  /** pk-first-then-alphabetical attribute order (`graphql.rs:207-216`). */
  def orderedAttrs(m: ModelDefinition): Vector[(String, AttrType)] =
    m.attributes.sortBy { case (n, _) =>
      (if (n == m.primaryKey) "" else n, n != m.primaryKey)
    } match { // pk sorts first via empty-string key; rest alphabetical
      case v => v
    }

  def typeName(m: ModelDefinition): String =
    m.modelName.pascal.singular.raw

  def readManyField(m: ModelDefinition): String = m.modelName.pluralCamel

  def build(reg: Registry): Schema = {
    val objects = reg.all.map { m =>
      ObjectDef(typeName(m), orderedAttrs(m).map { case (n, t) =>
        val base = gqlType(t)
        FieldDef(n, Vector.empty,
          if (m.isRequired(n)) NonNull(base) else base)
      })
    }
    val queryFields = reg.all.flatMap { m =>
      val pkTy = NonNull(gqlType(m.pkType))
      Vector(
        FieldDef(s"readOne${typeName(m)}",
          Vector(ArgDef(m.primaryKey, pkTy)), NonNull(Named(typeName(m)))),
        // readMany extension: plural camel name, full-scan resolver
        FieldDef(readManyField(m), Vector.empty,
          NonNull(ListT(NonNull(Named(typeName(m)))))))
    }
    val mutationFields = reg.all.flatMap { m =>
      val pkTy = NonNull(gqlType(m.pkType))
      val attrs = orderedAttrs(m)
      val retTy = NonNull(Named(typeName(m)))
      Vector(
        FieldDef(s"deleteOne${typeName(m)}",
          Vector(ArgDef(m.primaryKey, pkTy)), retTy),
        FieldDef(s"updateOne${typeName(m)}",
          attrs.map { case (n, t) =>
            ArgDef(n, if (n == m.primaryKey) NonNull(gqlType(t))
              else gqlType(t))
          }, retTy),
        FieldDef(s"addOne${typeName(m)}",
          attrs.map { case (n, t) =>
            ArgDef(n, if (m.isRequired(n)) NonNull(gqlType(t))
              else gqlType(t))
          }, retTy))
    }
    // capability-parity extension (like readMany): one subscription
    // field per model — each changelog event resolves one record of
    // the model; the reference leaves subscription execution todo!()
    // (`graphql.rs:353`)
    val subscriptionFields = reg.all.map { m =>
      FieldDef(readManyField(m), Vector.empty, NonNull(Named(typeName(m))))
    }
    Schema(builtinScalars ++ objects :+
      ObjectDef("Query", queryFields) :+
      ObjectDef("Mutation", mutationFields) :+
      ObjectDef("Subscription", subscriptionFields))
  }

  private def render(t: GqlType): String = t match {
    case Named(n) => n
    case NonNull(of) => render(of) + "!"
    case ListT(of) => s"[${render(of)}]"
  }

  /** SDL text (the reference's compact single-line style). */
  def sdl(schema: Schema): String =
    schema.types.collect { case ObjectDef(name, fields) =>
      val fs = fields.map { f =>
        val args = if (f.args.isEmpty) ""
          else f.args.map(a => s"${a.name}:${render(a.ty)}")
            .mkString("(", " ", ")")
        s" ${f.name}$args:${render(f.ty)}"
      }.mkString
      s"type $name {$fs}"
    }.mkString("\n")
}
