package graft

import org.scalatest.funsuite.AnyFunSuite

class SlidingCliSpec extends AnyFunSuite {
  import SlidingCli.{Config, parse}

  test("positional args parse with defaults") {
    assert(parse(Array("in.txt", "out")) ==
      Config("in.txt", "out", 10, 4, "sum", None))
    assert(parse(Array("in.txt", "out", "16", "4", "min", "0.5")) ==
      Config("in.txt", "out", 16, 4, "min", Some(0.5)))
  }

  test("-D flags parse in the reference's README style and win over defaults") {
    assert(parse(Array("-Dmy.threshold=0.1", "-Dmy.window=37", "-Dmy.reducers=2",
        "in.txt", "out")) ==
      Config("in.txt", "out", 37, 2, "sum", Some(0.1)))
    // flags may come anywhere; positional still fills the rest
    assert(parse(Array("in.txt", "-Dmy.agg=avg", "out", "16")) ==
      Config("in.txt", "out", 16, 4, "avg", None))
  }

  test("missing positional args is a clear usage error") {
    val ex = intercept[IllegalArgumentException] { parse(Array("-Dmy.window=5", "only-input")) }
    assert(ex.getMessage.contains("usage"))
  }
}
