package graft.storage

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.core._
import graft.crud.Records

/** Drop-in reader/writer for the reference's single-file JSON store:
  * `{model → {pk-as-JSON-string → record}}` (`json/mod.rs:45-80`;
  * sample `testing/server/server.data.test.json`).
  *
  * Semantics preserved: missing file ⇒ empty db; empty file ⇒ empty db;
  * non-JSON content ⇒ error. The inner key is the JSON-serialized
  * *typed* primary key, so Integer `1`, String `"1"` and Boolean `true`
  * are distinct keys (`json/mod.rs:85`). Every op is O(file) — kept only
  * for compatibility; `ParquetBackend` is the scale path.
  */
final class GusJsonBackend(spark: SparkSession, storageFile: String)
    extends StorageBackend {

  private def readDb(): Either[String, Map[String, Map[String, JsonNode]]] = {
    val p = Paths.get(storageFile)
    if (!Files.exists(p)) return Right(Map.empty)
    val text = Files.readString(p)
    if (text.trim.isEmpty) return Right(Map.empty)
    JsonUtil.parse(text) match {
      case Left(e) => Left(s"corrupt storage file: $e")
      case Right(root) if !root.isObject => Left("corrupt storage file")
      case Right(root) =>
        Right(root.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala
            .map(r => r.getKey -> r.getValue).toMap
        }.toMap)
    }
  }

  private def modelKey(m: ModelDefinition): String = m.modelName.raw

  /** Decode one stored JSON record (trusted — it was validated on
    * write) to a Row in model-schema order. */
  private def nodeToRow(n: JsonNode, m: ModelDefinition): Row =
    Row.fromSeq(m.attributes.map { case (name, ty) =>
      val v = n.get(name)
      if (v == null || v.isNull) null
      else ty match {
        case AttrType.Primitive(PrimitiveType.PInteger) => v.longValue()
        case AttrType.Primitive(PrimitiveType.PString)  => v.textValue()
        case AttrType.Primitive(PrimitiveType.PBoolean) => v.booleanValue()
        case AttrType.Primitive(PrimitiveType.PFloat)   => v.doubleValue()
        case AttrType.ArrayOf(p) =>
          v.elements().asScala.toVector.map { e => p match {
            case PrimitiveType.PInteger => e.longValue()
            case PrimitiveType.PString  => e.textValue()
            case PrimitiveType.PBoolean => e.booleanValue()
            case PrimitiveType.PFloat   => e.doubleValue()
          }}
      }
    })

  override def table(model: ModelDefinition): DataFrame =
    readDb() match {
      case Left(err) => throw new IllegalStateException(err)
      case Right(db) =>
        val rows = db.getOrElse(modelKey(model), Map.empty).values
          .map(n => nodeToRow(n, model)).toSeq.asJava
        spark.createDataFrame(new java.util.ArrayList(rows), model.schema)
    }

  override def slice(model: ModelDefinition, v: PrimValue): DataFrame =
    table(model) // whole-file backend: the slice is the table

  override def writeSlice(model: ModelDefinition, v: PrimValue,
      df: DataFrame): Unit = overwrite(model, df)

  override def overwrite(model: ModelDefinition, df: DataFrame): Unit = {
    val db = readDb().fold(e => throw new IllegalStateException(e), identity)
    val records = df.collect().map { row =>
      val rec = Records.fromRow(row, model)
      val pk = rec(model.primaryKey) match {
        case TrueValue.Prim(p) => p.jsonKey
        case _ => throw new IllegalStateException("null primary key")
      }
      pk -> Records.toJson(rec, model)
    }
    val others = (db - modelKey(model)).map { case (m, recs) =>
      JsonUtil.quote(m) + ":" + recs.map { case (k, v) =>
        JsonUtil.quote(k) + ":" + v.toString
      }.mkString("{", ",", "}")
    }
    val thisModel = JsonUtil.quote(modelKey(model)) + ":" +
      records.map { case (k, v) => JsonUtil.quote(k) + ":" + v }
        .mkString("{", ",", "}")
    val out = (others.toSeq :+ thisModel).mkString("{", ",", "}")
    val p = Paths.get(storageFile)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(storageFile + ".tmp")
    Files.writeString(tmp, out)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
