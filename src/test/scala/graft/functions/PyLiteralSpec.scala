package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PyLiteralSpec extends AnyFunSuite {

  test("parses the wire envelope: topic, dict payload as JSON, ts") {
    val e = PyLiteral.parseLine(
      "['WeatherData', {'AirTemp': '22.2', 'Rainfall': '0', '_kf': True}, '2025-05-17T14:00:04.128Z']")
    assert(e != null)
    assert(e.topic == "WeatherData")
    assert(e.ts == "2025-05-17T14:00:04.128Z")
    assert(e.payload == """{"AirTemp":"22.2","Rainfall":"0","_kf":true}""")
  }

  test("base64 string payloads stay raw (z topics)") {
    val e = PyLiteral.parseLine("['CarData.z', 'eJxLSk3KBAAD3gGi', '2025-05-17T13:59:20.6797217Z']")
    assert(e.topic == "CarData.z")
    assert(e.payload == "eJxLSk3KBAAD3gGi")
  }

  test("python-specific literals: True/False/None, nested, ints, floats, tuples") {
    assert(PyLiteral.toJson("{'a': True, 'b': False, 'c': None}") ==
      """{"a":true,"b":false,"c":null}""")
    assert(PyLiteral.toJson("{'n': 42, 'f': -3.5, 'l': [1, 2], 't': (7, 8)}") ==
      """{"n":42,"f":-3.5,"l":[1,2],"t":[7,8]}""")
    assert(PyLiteral.toJson("{'x': {'y': {'z': 'deep'}}}") == """{"x":{"y":{"z":"deep"}}}""")
    assert(PyLiteral.toJson("{1: 'intkey'}") == """{"1":"intkey"}""")
  }

  test("string escapes and embedded quotes") {
    assert(PyLiteral.toJson("""{'m': 'it\'s "quoted"', 'nl': 'a\nb'}""") ==
      """{"m":"it's \"quoted\"","nl":"a\nb"}""")
    assert(PyLiteral.toJson("'caf\\xe9'") == "\"café\"")
    assert(PyLiteral.toJson("'\\u0041'") == "\"A\"")
  }

  test("malformed input returns null, never throws (T13)") {
    assert(PyLiteral.parseLine("['truncated', {'a': ") == null)
    assert(PyLiteral.parseLine("not a list") == null)
    assert(PyLiteral.parseLine("['only_two', 'elems']") == null)
    assert(PyLiteral.parseLine("") == null)
    assert(PyLiteral.parseLine(null) == null)
    assert(PyLiteral.toJson("{'unclosed': ") == null)
  }

  test("trailing commas and whitespace tolerated like ast.literal_eval") {
    assert(PyLiteral.toJson("[1, 2, ]") == "[1,2]")
    assert(PyLiteral.toJson("{ 'a' : 1 , }") == """{"a":1}""")
  }
}
