package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** The reference's job-request MESSAGE CODECS, wire-real (SURVEY §2.6 C6).
  * These are the byte payloads a Flight client puts in an Action body to
  * submit work; until r9b our action bodies were plain strings, which
  * left C6 "typed Scala arguments, no wire codec". Two codec families
  * exist in the reference and both are implemented here with its exact
  * wire behavior (hand-written — the formats are trivially simple; no
  * Jackson in scope and none needed):
  *
  *  - [[CypherMessage]] — length-prefixed binary: BIG_ENDIAN u16 length
  *    + UTF-8 bytes for (cypher, database, JSON params), in that order
  *    (reference: CypherMessage.java:84-113 serialize,
  *    CypherMessage.java:54-77 deserialize). NOTE the reference's own
  *    doc/code discrepancy: DEVELOPING.md:101-110 says u32 lengths but
  *    the code uses putShort/getShort and the Python client agrees with
  *    the code (neo4j_arrow.py:168-180) — we match the CODE (u16), and
  *    [[CypherMessage.serialize]] rejects fields over 32767 bytes
  *    loudly instead of silently truncating the way a short cast would.
  *
  *  - [[GdsMessage]] — flat JSON with the reference's key vocabulary
  *    (GdsMessage.java:36-45: db, graph, type, filters, properties,
  *    node_id, partitions, batch_size, list_size). A minimal flat-JSON
  *    parser lives here too: the messages are one level deep with
  *    string / int / string-list values only, so a full JSON library
  *    is not warranted.
  */
object ActionMessages {

  /** `cypher.read` / `cypher.write` request body
    * (CypherActionHandler.java:32-36). `paramsJson` is carried verbatim
    * (the reference round-trips it through Jackson; our engine passes
    * parameters positionally through SQL, so the JSON text is opaque). */
  final case class CypherMessage(database: String, cypher: String,
                                 paramsJson: String = "{}") {
    def serialize: Array[Byte] = {
      val c = cypher.getBytes(UTF_8)
      val d = database.getBytes(UTF_8)
      val p = paramsJson.getBytes(UTF_8)
      Seq(c, d, p).foreach { b =>
        require(b.length <= Short.MaxValue,
          s"field exceeds u16 wire limit (${b.length} bytes) — the " +
            "reference's putShort would silently truncate here")
      }
      val buf = ByteBuffer.allocate(c.length + d.length + p.length + 6)
        .order(ByteOrder.BIG_ENDIAN)
      buf.putShort(c.length.toShort); buf.put(c)
      buf.putShort(d.length.toShort); buf.put(d)
      buf.putShort(p.length.toShort); buf.put(p)
      buf.array()
    }
  }
  object CypherMessage {
    def deserialize(bytes: Array[Byte]): CypherMessage = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      def slice(): String = {
        val n = buf.getShort().toInt
        require(n >= 0 && n <= buf.remaining(), s"bad field length $n")
        val b = new Array[Byte](n); buf.get(b)
        new String(b, UTF_8)
      }
      val cypher = slice(); val database = slice(); val params = slice()
      CypherMessage(database, cypher, params)
    }
  }

  /** `gds.read` request body (GdsMessage.java:24-35 request types,
    * :36-45 JSON keys). */
  final case class GdsMessage(db: String, graph: String,
                              requestType: String,
                              properties: Seq[String] = Nil,
                              filters: Seq[String] = Nil,
                              nodeIdProperty: String = "",
                              partitions: Int = 4,
                              batchSize: Int = 1024,
                              listSize: Int = 0) {
    require(Set("node", "relationship", "khop")(requestType),
      s"bad request type: $requestType")
    def serialize: Array[Byte] = {
      def js(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      def arr(xs: Seq[String]) = xs.map(js).mkString("[", ",", "]")
      (s"""{"db":${js(db)},"graph":${js(graph)},""" +
        s""""type":${js(requestType)},"filters":${arr(filters)},""" +
        s""""properties":${arr(properties)},""" +
        s""""node_id":${js(nodeIdProperty)},"partitions":$partitions,""" +
        s""""batch_size":$batchSize,"list_size":$listSize}""").getBytes(UTF_8)
    }
  }
  object GdsMessage {
    def deserialize(bytes: Array[Byte]): GdsMessage = {
      val m = FlatJson.parse(new String(bytes, UTF_8))
      def str(k: String, dflt: String = ""): String = m.get(k) match {
        case Some(s: String) => s
        case None => dflt
        case Some(other) => throw new IllegalArgumentException(
          s"$k: expected string, got $other")
      }
      def int(k: String, dflt: Int): Int = m.get(k) match {
        case Some(l: Long) => l.toInt
        case None => dflt
        case Some(other) => throw new IllegalArgumentException(
          s"$k: expected int, got $other")
      }
      def list(k: String): Seq[String] = m.get(k) match {
        case Some(xs: Seq[_]) => xs.map(_.toString)
        case None => Nil
        case Some(other) => throw new IllegalArgumentException(
          s"$k: expected list, got $other")
      }
      GdsMessage(str("db", "neo4j"), str("graph"), str("type"),
        list("properties"), list("filters"), str("node_id"),
        int("partitions", 4), int("batch_size", 1024), int("list_size", 0))
    }
  }

  /** k-hop request body — carried as the `gds.read` action body when the
    * GdsMessage request type is `khop`; the reference re-parses the same
    * bytes as a KHopMessage to extract k (KHopMessage.java:17-29; the
    * node-id key is literally Neo4jDefaults.ID_FIELD = "ID",
    * Neo4jDefaults.java:8). The reference hardcodes k=2 at execution;
    * ours honors the carried k (KHop.kHopEdges). */
  final case class KHopMessage(db: String, graph: String, k: Int = 2,
                               relProperty: String = "",
                               nodeIdProperty: String = "ID") {
    def serialize: Array[Byte] = {
      def js(x: String) = FlatJson.quote(x)
      (s"""{"db":${js(db)},"graph":${js(graph)},"k":$k,""" +
        s""""rel_property":${js(relProperty)},""" +
        s""""ID":${js(nodeIdProperty)}}""").getBytes(UTF_8)
    }
  }
  object KHopMessage {
    def deserialize(bytes: Array[Byte]): KHopMessage = {
      val m = FlatJson.parse(new String(bytes, UTF_8))
      def str(k: String, d: String) =
        m.get(k).map(_.toString).getOrElse(d)
      KHopMessage(str("db", "neo4j"), str("graph", ""),
        m.get("k").collect { case l: Long => l.toInt }.getOrElse(2),
        str("rel_property", ""), str("ID", "ID"))
    }
  }

  /** `gds.write.nodes` request body (GdsWriteNodeMessage.java:19-34:
    * db, graph, id_field, labels_field). */
  final case class GdsWriteNodeMessage(db: String, graph: String,
                                       idField: String = "ID",
                                       labelsField: String = "LABELS") {
    def serialize: Array[Byte] = {
      def js(x: String) = FlatJson.quote(x)
      (s"""{"db":${js(db)},"graph":${js(graph)},""" +
        s""""id_field":${js(idField)},""" +
        s""""labels_field":${js(labelsField)}}""").getBytes(UTF_8)
    }
  }
  object GdsWriteNodeMessage {
    def deserialize(bytes: Array[Byte]): GdsWriteNodeMessage = {
      val m = FlatJson.parse(new String(bytes, UTF_8))
      def str(k: String, d: String) = m.get(k).map(_.toString).getOrElse(d)
      GdsWriteNodeMessage(str("db", "neo4j"), str("graph", ""),
        str("id_field", "ID"), str("labels_field", "LABELS"))
    }
  }

  /** `gds.write.relationships` request body
    * (GdsWriteRelsMessage.java:18-36: db, graph, source_field,
    * target_field, type_field). */
  final case class GdsWriteRelsMessage(db: String, graph: String,
                                       sourceField: String = "START_ID",
                                       targetField: String = "END_ID",
                                       typeField: String = "TYPE") {
    def serialize: Array[Byte] = {
      def js(x: String) = FlatJson.quote(x)
      (s"""{"db":${js(db)},"graph":${js(graph)},""" +
        s""""source_field":${js(sourceField)},""" +
        s""""target_field":${js(targetField)},""" +
        s""""type_field":${js(typeField)}}""").getBytes(UTF_8)
    }
  }
  object GdsWriteRelsMessage {
    def deserialize(bytes: Array[Byte]): GdsWriteRelsMessage = {
      val m = FlatJson.parse(new String(bytes, UTF_8))
      def str(k: String, d: String) = m.get(k).map(_.toString).getOrElse(d)
      GdsWriteRelsMessage(str("db", "neo4j"), str("graph", ""),
        str("source_field", "START_ID"), str("target_field", "END_ID"),
        str("type_field", "TYPE"))
    }
  }

  /** Minimal FLAT JSON parser for the message vocabulary: one object,
    * values are strings, integers, or arrays of strings — exactly what
    * the reference's messages contain (GdsMessage.java:95-158). Escapes
    * \" \\ \/ \n \r \t \uXXXX are honored; nested objects are rejected
    * (no message uses them). */
  private[sources] object FlatJson {
    def quote(x: String): String = "\"" + x.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    def parse(s: String): Map[String, Any] = {
      var i = 0
      def err(msg: String) =
        throw new IllegalArgumentException(s"json @$i: $msg")
      def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
      def expect(c: Char): Unit = {
        ws(); if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1
      }
      def string(): String = {
        expect('"')
        val sb = new StringBuilder
        while (s(i) != '"') {
          if (s(i) == '\\') {
            i += 1
            s(i) match {
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case '/' => sb += '/'; case 'n' => sb += '\n'
              case 'r' => sb += '\r'; case 't' => sb += '\t'
              case 'u' =>
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case c => err(s"bad escape \\$c")
            }
          } else sb += s(i)
          i += 1
        }
        i += 1
        sb.result()
      }
      def number(): Long = {
        val start = i
        if (s(i) == '-') i += 1
        while (i < s.length && s(i).isDigit) i += 1
        s.substring(start, i).toLong
      }
      def value(): Any = {
        ws()
        s(i) match {
          case '"' => string()
          case '[' =>
            i += 1; ws()
            val acc = Seq.newBuilder[Any]
            if (s(i) == ']') { i += 1 }
            else {
              var more = true
              while (more) {
                acc += value(); ws()
                if (s(i) == ',') { i += 1 }
                else { expect(']'); more = false }
              }
            }
            acc.result()
          case c if c == '-' || c.isDigit => number()
          case '{' => err("nested objects are not part of the message " +
            "vocabulary (GdsMessage.java:95-158)")
          case c => err(s"unexpected '$c'")
        }
      }
      expect('{'); ws()
      val acc = Map.newBuilder[String, Any]
      if (i < s.length && s(i) == '}') return Map.empty
      var more = true
      while (more) {
        ws()
        val k = string()
        expect(':')
        acc += k -> value()
        ws()
        if (i < s.length && s(i) == ',') { i += 1 }
        else { expect('}'); more = false }
      }
      acc.result()
    }
  }
}
