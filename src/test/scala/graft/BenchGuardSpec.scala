package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The Bench startup heap guard (VERDICT r11 task 7): sf1-class runs need
  * the documented 64g driver heap; the guard turns the former
  * mid-run q92-warmup OOM into a startup failure naming the requirement. */
class BenchGuardSpec extends AnyFunSuite with Matchers {
  private val mb = 1L << 20
  private val gb = 1L << 30

  test("heapSufficient: sf0.1 fits the 8g default, sf1 needs 64g") {
    Bench.heapSufficient(18 * mb, 8 * gb) shouldBe true // sf0.1 @ default
    Bench.heapSufficient(175 * mb, 8 * gb) shouldBe false // sf1 @ default
    Bench.heapSufficient(175 * mb, 64 * gb) shouldBe true // sf1 @ documented
  }
}
