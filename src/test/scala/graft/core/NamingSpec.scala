package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NamingSpec extends AnyFunSuite {
  test("snake-cases separators, camelCase, and mixed forms") {
    assert(Naming.toSnakeCase("BA Code") == "ba_code")
    assert(Naming.toSnakeCase("customsDistrictId") == "customs_district_id")
    assert(Naming.toSnakeCase("Region/Country Code") == "region_country_code")
    assert(Naming.toSnakeCase("respondent-name") == "respondent_name")
    assert(Naming.toSnakeCase("value-units") == "value_units")
    assert(Naming.toSnakeCase("period") == "period")
    assert(Naming.toSnakeCase("mineMSHAID") == "mine_mshaid")
  }

  test("idempotent on already-snake-cased names") {
    val names = Seq("ba_code", "customs_district_id", "value_units", "period")
    names.foreach(n => assert(Naming.toSnakeCase(n) == n))
  }
}
