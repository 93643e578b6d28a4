package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ValidationSpec extends AnyFunSuite {
  test("self-intersecting polygon is invalid (crossing edges)") {
    // bowtie: edges (0,0)-(2,2) and (2,0)-(0,2) cross
    val bowtie = Wkt.read("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))", validate = false)
    val err = Validation.findError(bowtie)
    assert(err.isDefined)
    assert(err.get.contains("crosses"))
  }

  test("valid polygon passes") {
    assert(Validation.findError(Wkt.read("POLYGON ((0 0, 1 0, 0 1, 0 0))")).isEmpty)
  }

  test("polygon with hole does not false-positive") {
    val holed = Wkt.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))", validate = false)
    assert(Validation.findError(holed).isEmpty)
  }
}
