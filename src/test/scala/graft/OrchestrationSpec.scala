package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Orchestration._

/** DAG-runner semantics (pure logic, no Spark): dependency order, retry,
  * failure isolation, cycle/unknown-edge validation. */
class OrchestrationSpec extends AnyFunSuite {

  private def stage(name: String, log: scala.collection.mutable.Buffer[String],
                    fail: Int = 0, retries: Int = 0): (Stage, () => Int) = {
    var failures = fail
    val s = Stage(name, () => {
      log += name
      if (failures > 0) { failures -= 1; sys.error(s"$name transient") }
      name.length
    }, retries)
    (s, () => failures)
  }

  test("stages run in dependency order; ties follow declaration order") {
    val log = scala.collection.mutable.Buffer[String]()
    val dag = Dag(
      Seq(stage("a", log)._1, stage("b", log)._1, stage("c", log)._1,
        stage("d", log)._1),
      Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d"))
    assert(dag.topoOrder == Seq("a", "b", "c", "d"))
    val report = dag.run()
    assert(log.toSeq == Seq("a", "b", "c", "d"))
    assert(report.values.forall(_.status == Succeeded))
  }

  test("a transient failure is retried; attempts are reported") {
    val log = scala.collection.mutable.Buffer[String]()
    val dag = Dag(Seq(stage("flaky", log, fail = 1, retries = 2)._1), Nil)
    val report = dag.run()
    assert(report("flaky").status == Succeeded)
    assert(report("flaky").attempts == 2)
    assert(log.toSeq == Seq("flaky", "flaky"))
  }

  test("a stage failing past its retries skips downstream; independent branches run") {
    val log = scala.collection.mutable.Buffer[String]()
    val dag = Dag(
      Seq(stage("root", log)._1,
        stage("bad", log, fail = 99, retries = 1)._1,
        stage("after_bad", log)._1,
        stage("independent", log)._1),
      Seq("root" -> "bad", "root" -> "independent", "bad" -> "after_bad"))
    val report = dag.run()
    assert(report("root").status == Succeeded)
    report("bad").status match {
      case Failed(attempts, _) => assert(attempts == 2)
      case other => fail(s"expected Failed, got $other")
    }
    assert(report("after_bad").status == Skipped("upstream failed: bad"))
    assert(report("independent").status == Succeeded)
    assert(!log.contains("after_bad"))
  }

  test("skip cascades transitively through the whole downstream chain") {
    val log = scala.collection.mutable.Buffer[String]()
    val dag = Dag(
      Seq(stage("bad", log, fail = 99)._1, stage("mid", log)._1,
        stage("leaf", log)._1),
      Seq("bad" -> "mid", "mid" -> "leaf"))
    val report = dag.run()
    assert(report("mid").status.isInstanceOf[Skipped])
    assert(report("leaf").status.isInstanceOf[Skipped])
    assert(log.toSeq == Seq("bad"))
  }

  test("cycles and unknown edge endpoints are rejected at construction") {
    val log = scala.collection.mutable.Buffer[String]()
    val cyclic = intercept[IllegalArgumentException] {
      Dag(Seq(stage("a", log)._1, stage("b", log)._1),
        Seq("a" -> "b", "b" -> "a")).topoOrder
    }
    assert(cyclic.getMessage.contains("cycle"))
    intercept[IllegalArgumentException] {
      Dag(Seq(stage("a", log)._1), Seq("a" -> "ghost"))
    }
  }
}
