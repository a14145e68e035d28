package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Planner

/** Interactive password prompt: triggers once, only for the
  * missing-password PlanError, only when no --password was given, and
  * degrades to the original error headless (no terminal). */
class CliPromptSpec extends AnyFunSuite {
  private val planner = new Planner((_, _) => sys.error("unused"), None)
  private def needPw = planner.PlanError("password required (2nd argument or --password)")

  test("prompts once and retries when the password is missing") {
    var prompted = 0
    val got = Cli.runWithPrompt(None, () => { prompted += 1; Some("hunter2") }) { pw =>
      if (pw.isEmpty) throw needPw else Seq.empty
    }
    assert(prompted == 1 && got.isEmpty)
  }

  test("no terminal (prompt yields None): original error surfaces") {
    val e = intercept[Planner#PlanError] {
      Cli.runWithPrompt(None, () => None)(_ => throw needPw)
    }
    assert(e.msg.contains("password required"))
  }

  test("explicit --password wrong for other reasons: no prompt, error passes through") {
    var prompted = 0
    intercept[Planner#PlanError] {
      Cli.runWithPrompt(Some("pw"), () => { prompted += 1; Some("x") })(_ => throw needPw)
    }
    assert(prompted == 0)
  }

  test("unrelated plan errors never prompt") {
    var prompted = 0
    intercept[Planner#PlanError] {
      Cli.runWithPrompt(None, () => { prompted += 1; Some("x") })(_ =>
        throw planner.PlanError("unknown column"))
    }
    assert(prompted == 0)
  }
}
