package graft

import scala.io.Source

/** Tiny JSONL reader for the golden fixtures (flat string/int/array values
  * only — avoids a JSON dependency; the goldens are machine-written). */
object GoldenUtil {

  def lines(resource: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/golden/$resource")
    require(in != null, s"missing golden resource $resource")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toVector
    finally src.close()
  }

  /** Extract a string field from one JSON object line. */
  def str(json: String, field: String): String = {
    val key = "\"" + field + "\": "
    val i = json.indexOf(key)
    require(i >= 0, s"field $field not in $json")
    var j = i + key.length
    require(json.charAt(j) == '"', s"$field is not a string")
    j += 1
    val sb = new StringBuilder
    while (json.charAt(j) != '"') {
      val c = json.charAt(j)
      if (c == '\\') {
        json.charAt(j + 1) match {
          case '"'  => sb.append('"'); j += 2
          case '\\' => sb.append('\\'); j += 2
          case 'n'  => sb.append('\n'); j += 2
          case 'r'  => sb.append('\r'); j += 2
          case 't'  => sb.append('\t'); j += 2
          case '/'  => sb.append('/'); j += 2
          case 'u' =>
            sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case other => sb.append(other); j += 2
        }
      } else { sb.append(c); j += 1 }
    }
    sb.toString
  }

  def long(json: String, field: String): Long = {
    val key = "\"" + field + "\": "
    val i = json.indexOf(key)
    require(i >= 0, s"field $field not in $json")
    var j = i + key.length
    val start = j
    while (j < json.length && (json.charAt(j).isDigit || json.charAt(j) == '-')) j += 1
    json.substring(start, j).toLong
  }

  def strArray(json: String, field: String): Seq[String] = {
    val key = "\"" + field + "\": ["
    val i = json.indexOf(key)
    require(i >= 0, s"field $field not in $json")
    var j = i + key.length
    val out = Vector.newBuilder[String]
    while (json.charAt(j) != ']') {
      if (json.charAt(j) == '"') {
        val sb = new StringBuilder
        j += 1
        while (json.charAt(j) != '"') {
          val c = json.charAt(j)
          if (c == '\\') {
            json.charAt(j + 1) match {
              case '"'  => sb.append('"'); j += 2
              case '\\' => sb.append('\\'); j += 2
              case 'n'  => sb.append('\n'); j += 2
              case 'u' =>
                sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
                j += 6
              case o => sb.append(o); j += 2
            }
          } else { sb.append(c); j += 1 }
        }
        out += sb.toString
        j += 1
      } else j += 1
    }
    out.result()
  }

  def intArray(json: String, field: String): Seq[Int] = {
    val key = "\"" + field + "\": ["
    val i = json.indexOf(key)
    require(i >= 0, s"field $field not in $json")
    val end = json.indexOf(']', i)
    val body = json.substring(i + key.length, end).trim
    if (body.isEmpty) Nil
    else body.split(",").map(_.trim.toInt).toVector
  }
}
